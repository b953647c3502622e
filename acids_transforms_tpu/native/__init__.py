"""Native (C++) acceleration layer.

Components (built with ``python -m acids_transforms_tpu.native.build``):

* ``pghi_native``  — exact magnitude-ordered heap PGHI (the serial,
  data-dependent phase integration that stays on the host; the TPU path uses
  the parallel LS/scan formulations in ops/pghi.py).
* ``wavio_native`` — WAV decode/encode + polyphase resampling for fast batch
  ingestion.

Everything degrades gracefully to the numpy implementations when the shared
library has not been built.
"""
from . import pghi_native, wavio_native  # noqa: F401

__all__ = ["pghi_native", "wavio_native"]
