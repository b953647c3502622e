"""Analysis / synthesis window construction.

Numerics match the torch window builders used by the reference
(``torch.hann_window`` etc. are *periodic* by default — reference
acids_transforms/transforms/stft.py:51-54) and the reference DGT's truncated
Gaussian (reference transforms/dgt.py:108-112).

The canonical dual windows here are computed with a vectorized residue-class
energy sum instead of the reference's O(n_fft * overlap) Python loop
(reference transforms/dgt.py:114-123).
"""
from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np

__all__ = [
    "get_window",
    "hann_window",
    "hamming_window",
    "blackman_window",
    "bartlett_window",
    "kaiser_window",
    "gaussian_dgt_window",
    "dgt_lambda",
    "dgt_gamma",
    "window_envelope",
    "dual_window",
]


def hann_window(n: int, dtype=jnp.float32) -> jnp.ndarray:
    """Periodic Hann window — matches ``torch.hann_window(n)``."""
    k = np.arange(n)
    return jnp.asarray(0.5 - 0.5 * np.cos(2.0 * np.pi * k / n), dtype=dtype)


def hamming_window(n: int, dtype=jnp.float32) -> jnp.ndarray:
    """Periodic Hamming window — matches ``torch.hamming_window(n)``."""
    k = np.arange(n)
    return jnp.asarray(0.54 - 0.46 * np.cos(2.0 * np.pi * k / n), dtype=dtype)


def blackman_window(n: int, dtype=jnp.float32) -> jnp.ndarray:
    """Periodic Blackman window — matches ``torch.blackman_window(n)``."""
    k = np.arange(n)
    w = (
        0.42
        - 0.5 * np.cos(2.0 * np.pi * k / n)
        + 0.08 * np.cos(4.0 * np.pi * k / n)
    )
    return jnp.asarray(w, dtype=dtype)


def bartlett_window(n: int, dtype=jnp.float32) -> jnp.ndarray:
    """Periodic Bartlett window — matches ``torch.bartlett_window(n)``."""
    k = np.arange(n)
    return jnp.asarray(1.0 - np.abs(2.0 * k / n - 1.0), dtype=dtype)


def kaiser_window(n: int, dtype=jnp.float32, beta: float = 12.0) -> jnp.ndarray:
    """Periodic Kaiser window — matches ``torch.kaiser_window(n)`` defaults."""
    k = np.arange(n)
    arg = beta * np.sqrt(np.maximum(0.0, 1.0 - ((k - n / 2.0) / (n / 2.0)) ** 2))
    return jnp.asarray(np.i0(arg) / np.i0(beta), dtype=dtype)


_WINDOWS = {
    "hann": hann_window,
    "hamming": hamming_window,
    "blackman": blackman_window,
    "bartlett": bartlett_window,
    "kaiser": kaiser_window,
}


def get_window(name: str, n: int, dtype=jnp.float32) -> jnp.ndarray:
    """Resolve a window by name (reference resolves ``torch.{name}_window``,
    transforms/stft.py:51-54)."""
    if name not in _WINDOWS:
        raise ValueError("Window %s is not known" % name)
    return _WINDOWS[name](n, dtype=dtype)


def dgt_lambda(n_fft: int) -> float:
    """Gaussian width parameter lambda = sqrt(-n_fft^2 / (8 ln 0.01))
    (reference transforms/dgt.py:109)."""
    return float((-(n_fft ** 2) / (8.0 * math.log(0.01))) ** 0.5)


#: time-frequency ratio constants gamma = c * n_fft^2 for common windows —
#: the effective Gaussian equivalent of each window, enabling PGHI on
#: non-Gaussian STFTs.  hann/hamming/blackman are the published values
#: (Prusa & Sondergaard, "Real-Time Spectrogram Inversion Using Phase
#: Gradient Heap Integration"); kaiser (beta=12, the torch default) and
#: bartlett are derived with the same least-squares Gaussian fit
#: (tools/derive_gammas.py — reproduces the published constants within ~3%,
#: and both derived values sit inside the empirical spectral-convergence
#: basin: kaiser SC-argmin ~0.12-0.18, bartlett ~0.30-0.36 at n_fft=1024).
#: Every entry is exercised end to end by tests/test_dgt.py::
#: test_pghi_all_windows.
_WINDOW_GAMMA_C = {
    "hann": 0.25645,
    "hamming": 0.29794,
    "blackman": 0.17954,
    "kaiser": 0.12808,   # derived (beta=12)
    "bartlett": 0.31743, # derived
}


def window_gamma(name: str, n_fft: int) -> float:
    """Effective PGHI gamma for a named (non-Gaussian) analysis window."""
    if name not in _WINDOW_GAMMA_C:
        raise ValueError("no PGHI gamma constant for window %r" % name)
    return float(_WINDOW_GAMMA_C[name] * n_fft * n_fft)


def dgt_gamma(n_fft: int) -> float:
    """Time-frequency ratio gamma = 2*pi*lambda^2 used by PGHI.

    The reference is inconsistent: offline DGT uses 2*pi*lambda^2
    (transforms/dgt.py:105-106) while RealtimeDGT uses lambda
    (transforms/dgt.py:373-376).  The offline value is the ltfat/tifresi
    convention and empirically reconstructs correctly, so it is used for both
    here.
    """
    lam = dgt_lambda(n_fft)
    return float(2.0 * math.pi * lam * lam)


def gaussian_dgt_window(n_fft: int, dtype=jnp.float32) -> jnp.ndarray:
    """Truncated Gaussian DGT analysis window (reference transforms/dgt.py:108-112).

    Sampled on the odd points of a ``2*n_fft + 1`` grid centred at ``n_fft``:
    ``w[i] = exp(-n_i^2 / (2 (2 lambda)^2))`` with ``n_i in {1-N, 3-N, ...}``,
    hitting ~0.01 at the edges.
    """
    lam = dgt_lambda(n_fft)
    n = np.arange(0, 2 * n_fft + 1) - (2 * n_fft) / 2.0
    w = np.exp(-(n ** 2) / (2.0 * (2.0 * lam) ** 2))
    return jnp.asarray(w[1: 2 * n_fft + 1: 2], dtype=dtype)


def window_envelope(window: np.ndarray, hop: int) -> np.ndarray:
    """Periodic squared-window OLA envelope ``E[r] = sum_{j = r mod hop} w[j]^2``.

    ``sum_k w^2(n - k*hop) = E[n mod hop]`` for any sample n covered by the
    full lattice — the vectorized form of the reference's dual-window
    denominator loop (transforms/dgt.py:114-123).
    """
    w = np.asarray(window, dtype=np.float64)
    n = w.shape[0]
    hop = int(hop)
    n_pad = -(-n // hop) * hop
    w2 = np.zeros(n_pad)
    w2[:n] = w ** 2
    return w2.reshape(-1, hop).sum(axis=0)


def dual_window(window, hop: int, dtype=jnp.float32) -> jnp.ndarray:
    """Canonical dual synthesis window ``d[l] = w[l] / E[l mod hop]``.

    Satisfies the painless-frame condition ``sum_k w(n-k*hop) d(n-k*hop) = 1``,
    i.e. plain (un-normalized) OLA of ``d``-windowed IFFT frames reconstructs
    the ``w``-analyzed signal exactly.  Equivalent to the reference's
    ``_get_dual_window`` (transforms/dgt.py:114-123) without the O(N*overlap)
    loop.
    """
    w = np.asarray(window, dtype=np.float64)
    env = window_envelope(w, hop)
    denom = env[np.arange(w.shape[0]) % int(hop)]
    denom = np.where(denom == 0.0, 1.0, denom)
    return jnp.asarray(w / denom, dtype=dtype)
