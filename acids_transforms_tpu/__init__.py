"""acids_transforms_tpu — TPU-native composable, invertible audio transforms.

A JAX/XLA/Pallas re-architecture of the capabilities of
``domkirke/acids_transforms`` (reference mounted at /root/reference): chainable
forward/invert audio transforms (STFT/DGT analysis, phaseless inversion
incl. PGHI and Griffin-Lim, spectral representations, normalization,
streaming real-time variants), designed TPU-first — batched MXU kernels,
functional pytree transforms, scan-based streaming, mesh sharding.
"""
from . import export, fuse, ops, parallel, serving, streaming, transforms, utils
from .fuse import fuse_fit, fuse_forward
from .streaming import chunk_signal, scan_forward, scan_invert, scan_roundtrip
from .transforms import *  # noqa: F401,F403
from .transforms import __all__ as _transforms_all
from .version import __version__

__all__ = [
    "transforms",
    "ops",
    "utils",
    "streaming",
    "parallel",
    "export",
    "fuse",
    "serving",
    "fuse_forward",
    "fuse_fit",
    "chunk_signal",
    "scan_forward",
    "scan_invert",
    "scan_roundtrip",
    "__version__",
] + list(_transforms_all)
