"""Shape utilities: Unsqueeze / Squeeze / Transpose / OneHot.

Reference: acids_transforms/transforms/misc.py (minus its stray
``from turtle import forward`` accident, misc.py:1).
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from .base import AudioTransform, NotInvertibleError

__all__ = ["Unsqueeze", "Squeeze", "Transpose", "OneHot"]


class Unsqueeze(AudioTransform):
    """Insert a singleton axis (reference misc.py:8-51)."""

    scriptable = True
    needs_scaling = False

    def __init__(self, sr: int = 44100, dim: int = 1):
        super().__init__(sr=sr)
        self.dim = dim

    @property
    def invertible(self) -> bool:
        return self.dim is not None

    def forward(self, x: jnp.ndarray) -> jnp.ndarray:
        return jnp.expand_dims(x, self.dim)

    def invert(self, x, inversion_mode=None, key=None):
        return jnp.squeeze(x, self.dim)

    def output_frame_axis(self, axis_in=None):
        if axis_in is None:
            return None
        if self.dim is None or self.dim >= 0:
            # front-counted dims: the effect on a negative frame index
            # depends on ndim, unknown here — report unknown
            return None
        return axis_in - 1 if self.dim >= axis_in else axis_in

    def propagate_mask(self, mask, x):
        if mask is None:
            return None
        return self.forward(mask) if mask.ndim == x.ndim else None


class Squeeze(AudioTransform):
    """Drop singleton axes; a full squeeze (``dim=None``) is not invertible
    (reference misc.py:54-111)."""

    scriptable = True
    needs_scaling = False

    def __init__(self, sr: int = 44100, dim: Optional[int] = None):
        super().__init__(sr=sr)
        self.dim = dim

    @property
    def invertible(self) -> bool:
        return self.dim is not None

    def forward(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.dim is None:
            return jnp.squeeze(x)
        # torch semantics: squeezing a non-singleton dim is a no-op
        if x.shape[self.dim] != 1:
            return x
        return jnp.squeeze(x, self.dim)

    def invert(self, x, inversion_mode=None, key=None):
        if self.dim is None:
            raise NotInvertibleError
        return jnp.expand_dims(x, self.dim)

    def output_frame_axis(self, axis_in=None):
        if axis_in is None:
            return None
        if self.dim is None or self.dim >= 0:
            return None  # full squeeze / front-counted dim: not representable
        if self.dim == axis_in:
            return None
        return axis_in + 1 if self.dim > axis_in else axis_in

    def propagate_mask(self, mask, x):
        if mask is None:
            return None
        return self.forward(mask) if mask.shape == x.shape else None


class Transpose(AudioTransform):
    """Swap two axes; self-inverse (reference misc.py:114-153).

    ``contiguous`` is accepted for API parity but is a no-op — XLA owns
    layout.
    """

    scriptable = True
    invertible = True
    needs_scaling = False

    def __init__(self, dims: Tuple[int, int] = (-2, -1), contiguous: bool = True, sr: int = 44100):
        super().__init__(sr=sr)
        self.dims = tuple(dims)
        self.contiguous = bool(contiguous)

    def forward(self, x: jnp.ndarray) -> jnp.ndarray:
        return jnp.swapaxes(x, self.dims[0], self.dims[1])

    def invert(self, x, inversion_mode=None, key=None):
        return self.forward(x)

    def output_frame_axis(self, axis_in=None):
        if axis_in is None:
            return None
        d0, d1 = self.dims
        if d0 >= 0 or d1 >= 0:
            return None  # front-counted dims: not representable without ndim
        if axis_in == d0:
            return d1
        if axis_in == d1:
            return d0
        return axis_in

    def propagate_mask(self, mask, x):
        if mask is None:
            return None
        return self.forward(mask) if mask.ndim == x.ndim else None


class OneHot(AudioTransform):
    """Integer -> one-hot on the last axis; invert via argmax
    (reference misc.py:156-213).

    ``n_classes=-1`` defers the class count to ``scale_data`` (which reads
    ``max + 1`` from data — host-side, hence eager-only; reference
    misc.py:178-180).
    """

    scriptable = True
    invertible = True

    def __init__(self, sr: int = 44100, n_classes: int = -1):
        super().__init__(sr=sr)
        self.n_classes = int(n_classes)

    @property
    def needs_scaling(self) -> bool:
        return self.n_classes == -1

    def scale_data(self, x: jnp.ndarray, mask=None) -> None:
        if mask is not None:
            x = jnp.where(jnp.broadcast_to(mask > 0, x.shape), x, 0)
        self.n_classes = int(jnp.max(x)) + 1

    def fit(self, x: jnp.ndarray, mask=None) -> "OneHot":
        # class count is static config; fitting requires concretization and is
        # therefore eager-only (cannot run under jit).
        if mask is not None:
            x = jnp.where(jnp.broadcast_to(mask > 0, x.shape), x, 0)
        new = self.replace()
        new.n_classes = int(jax.device_get(jnp.max(x))) + 1
        return new

    def forward(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.n_classes < 0:
            raise ValueError("OneHot used before scale_data set n_classes")
        return jax.nn.one_hot(x, self.n_classes, dtype=jnp.int32)

    def invert(self, x, inversion_mode=None, key=None):
        return jnp.argmax(x, axis=-1)

    # ------------------------------------------------------------- test hooks
    def _test_codes(self, x: jnp.ndarray) -> jnp.ndarray:
        """OneHot consumes integer codes — synthesize them
        (reference misc.py:191-199)."""
        key = jax.random.PRNGKey(0)
        return jax.random.randint(key, x.shape[:-1] + (1000,), 0, 256)

    def test_forward(self, x, time=None):
        codes = self._test_codes(x)
        self.scale_data(codes)
        out = self.forward(codes)
        return out if time is None else (out, time)

    def test_inversion(self, x):
        codes = self._test_codes(x)
        self.scale_data(codes)
        return {"inverted": self.invert(self.forward(codes))}
