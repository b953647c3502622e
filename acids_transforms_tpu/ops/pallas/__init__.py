"""Pallas TPU kernels for the hot compute paths."""
from .spectral import fused_melspec, fused_melspec_stats

__all__ = ["fused_melspec", "fused_melspec_stats"]
