"""OverlapAdd: the streaming framing / overlap-add state machine.

Reference: acids_transforms/transforms/oadd.py.  TPU-native re-design:

* the ring buffers (``input_buffer`` / ``output_buffer``, reference
  oadd.py:25-30) are an **explicit state pytree** — ``init_state`` /
  ``step`` / ``step_invert`` are pure and scan-compatible; the plain
  ``forward`` / ``invert`` keep state on ``self`` eagerly for reference-style
  usage;
* the OLA inner loop (reference oadd.py:99-101) is the dense shifted-add
  formulation in ops/framing.py:overlap_add;
* ``gain_compensation`` is exactly ``n_fft // hop`` (the interior frame
  multiplicity), so ``invert(forward(x))`` is unity-gain in the steady state.
  The reference calibrates a factor of 2 by round-tripping ones through an
  extra ``overlap/2`` division (oadd.py:30-31, 66-67), leaving its chains
  ~0.75x in amplitude; paired with the dual-window RealtimeSTFT/DGT synthesis
  here, the full streaming chain reconstructs at unity (see
  tests/test_streaming.py).
"""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax.numpy as jnp

from ..ops.framing import frame, overlap_add
from .base import AudioTransform

__all__ = ["OverlapAdd"]


class OverlapAdd(AudioTransform):
    scriptable = True
    invertible = True
    needs_scaling = False

    _volatile = ("_state",)

    def __init__(self, n_fft: int = 1024, hop_length: int = 128, dim: int = -1, sr: int = 44100):
        super().__init__(sr=sr)
        self.n_fft = int(n_fft)
        self.hop_length = int(hop_length)
        if self.n_fft % self.hop_length != 0:
            raise ValueError("OverlapAdd requires hop_length to divide n_fft")
        if int(dim) != -1:
            # the reference accepts `dim` but hardcodes the last axis
            # (reference oadd.py:55-56); reject loudly instead of silently
            # operating on the wrong axis.
            raise ValueError(
                "OverlapAdd only supports dim=-1 (the sample axis); "
                "move your data axis with jnp.moveaxis first"
            )
        self.dim = int(dim)
        self.frames_out = self.n_fft // self.hop_length - 1
        self._state = None

    @property
    def gain_compensation(self) -> float:
        return float(self.n_fft // self.hop_length)

    def output_frame_axis(self, axis_in=None):
        return -2  # (..., frames, n_fft)

    def propagate_mask(self, mask, x):
        # forward prepends the carried ring buffer (previous chunk's tail,
        # assumed valid): frame t starts at t*hop - carry in this chunk
        if mask is None:
            return None
        T = max((self._carry + x.shape[-1] - self.n_fft) // self.hop_length, 0) + 1
        starts = jnp.clip(
            jnp.arange(T) * self.hop_length - self._carry, 0, mask.shape[-1] - 1
        )
        return jnp.take(mask, starts, axis=-1)[..., :, None]

    @property
    def _carry(self) -> int:
        """Ring-buffer length in samples."""
        return self.frames_out * self.hop_length

    # ------------------------------------------------------------------ state
    def init_state(
        self, batch_shape: Tuple[int, ...] = (), mode: Optional[str] = None
    ) -> Dict[str, jnp.ndarray]:
        return {
            "input_buffer": jnp.zeros(tuple(batch_shape) + (self._carry,)),
            "output_buffer": jnp.zeros(tuple(batch_shape) + (self._carry,)),
        }

    def reset(self, batch_shape: Tuple[int, ...] = ()) -> None:
        self._state = self.init_state(tuple(batch_shape))

    # ------------------------------------------------------------- pure steps
    def step(
        self, state: Dict[str, jnp.ndarray], x: jnp.ndarray
    ) -> Tuple[Dict[str, jnp.ndarray], jnp.ndarray]:
        """``(state, chunk (..., C)) -> (state, frames (..., C/hop, n_fft))``.

        Prepends the carried tail of the previous chunk so frames straddle
        chunk boundaries seamlessly (reference oadd.py:33-42, 69-74).
        """
        carry = self._carry
        buf = state["input_buffer"]
        xc = jnp.concatenate([buf, x], axis=-1)
        frames = frame(xc, self.n_fft, self.hop_length, -1)
        new_state = dict(state)
        new_state["input_buffer"] = xc[..., -carry:] if carry > 0 else buf
        return new_state, frames

    def step_invert(
        self,
        state: Dict[str, jnp.ndarray],
        frames: jnp.ndarray,
        inversion_mode: Optional[str] = None,
        key=None,
    ) -> Tuple[Dict[str, jnp.ndarray], jnp.ndarray]:
        """``(state, frames (..., T, n_fft)) -> (state, chunk (..., T*hop))``.

        OLA-recombines with the carried overlap tail (reference oadd.py:90-104)
        and divides by the frame multiplicity.
        """
        carry = self._carry
        ola = overlap_add(frames, self.hop_length)  # (..., (T-1)*hop + n_fft)
        if carry > 0:
            head = ola[..., :carry] + state["output_buffer"]
            ola = jnp.concatenate([head, ola[..., carry:]], axis=-1)
        out = ola[..., :-carry] if carry > 0 else ola
        new_state = dict(state)
        if carry > 0:
            new_state["output_buffer"] = ola[..., -carry:]
        return new_state, out / self.gain_compensation

    # --------------------------------------------------------- eager wrappers
    def _eager_state(self, batch_shape) -> Dict[str, jnp.ndarray]:
        st = getattr(self, "_state", None)
        if st is None or st["input_buffer"].shape[:-1] != tuple(batch_shape):
            st = self.init_state(tuple(batch_shape))
        return st

    def forward(self, x: jnp.ndarray) -> jnp.ndarray:
        state = self._eager_state(x.shape[:-1])
        new_state, frames = self.step(state, x)
        self._state = new_state
        return frames

    def forward_with_time(self, x, time):
        frames = self.forward(x)
        n_chunks = frames.shape[-2]
        shifts = jnp.arange(n_chunks) * (self.hop_length / self.sr)
        return frames, shifts + time[..., None]

    def invert(self, x, inversion_mode=None, key=None):
        state = self._eager_state(x.shape[:-2])
        new_state, out = self.step_invert(state, x)  # preserves input_buffer
        self._state = new_state
        return out
