"""Multi-chip scaling: mesh construction, batch sharding, sequence-parallel
spectral kernels with ICI halo exchange.

The reference is strictly single-device (SURVEY.md §2, parallelism note);
this subsystem is the new TPU capability: ``jax.sharding`` + ``shard_map``
over a ``Mesh``, with XLA collectives riding the ICI.
"""
from .mesh import local_mesh, make_mesh
from .sharding import (
    data_parallel,
    sequence_parallel_istft,
    sequence_parallel_stft,
    shard_along,
    shard_map_batch,
)

__all__ = [
    "make_mesh",
    "local_mesh",
    "shard_along",
    "data_parallel",
    "shard_map_batch",
    "sequence_parallel_stft",
    "sequence_parallel_istft",
]
