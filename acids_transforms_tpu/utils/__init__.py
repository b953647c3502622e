"""Utility layer: audio IO, misc helpers."""
from .misc import import_data

__all__ = ["import_data"]
