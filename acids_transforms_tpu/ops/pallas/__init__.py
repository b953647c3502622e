"""Pallas TPU kernels for the hot compute paths."""
from .spectral import fused_melspec

__all__ = ["fused_melspec"]
