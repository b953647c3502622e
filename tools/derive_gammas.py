"""Derive the effective PGHI gamma constant for each analysis window.

For a Gaussian window ``g(t) = exp(-pi t^2 / gamma)`` the PGHI
Cauchy-Riemann factors use ``gamma`` directly; for any other window the
effective constant ``c = gamma / n_fft^2`` is the least-squares Gaussian fit

    min_{c, A}  sum_t ( w(t) - A exp(-pi t^2 / (c n^2)) )^2

This procedure reproduces the published constants (Prusa & Sondergaard,
"Real-Time Spectrogram Inversion Using Phase Gradient Heap Integration":
hann 0.25645, hamming 0.29794, blackman 0.17954) within ~3%, and the values
it derives for kaiser(beta=12) and bartlett sit inside the empirical
spectral-convergence basin (sweep in tests/test_dgt.py::test_pghi_all_windows
exercises every constant end to end).

Run:  python tools/derive_gammas.py
"""
import numpy as np


def window(name: str, n: int, beta: float = 12.0) -> np.ndarray:
    k = np.arange(n)
    if name == "hann":
        return 0.5 - 0.5 * np.cos(2 * np.pi * k / n)
    if name == "hamming":
        return 0.54 - 0.46 * np.cos(2 * np.pi * k / n)
    if name == "blackman":
        return 0.42 - 0.5 * np.cos(2 * np.pi * k / n) + 0.08 * np.cos(4 * np.pi * k / n)
    if name == "bartlett":
        return 1.0 - np.abs(2 * k / n - 1.0)
    if name == "kaiser":
        arg = beta * np.sqrt(np.maximum(0.0, 1.0 - ((k - n / 2) / (n / 2)) ** 2))
        return np.i0(arg) / np.i0(beta)
    raise ValueError(name)


def fit_gamma_c(name: str, n: int = 1024) -> float:
    """Amplitude least-squares Gaussian fit via golden-section search on c."""
    w = window(name, n)
    w = w / w.max()
    t = np.arange(n) - n / 2

    def err(c):
        g = np.exp(-np.pi * t ** 2 / (c * n ** 2))
        a = (w * g).sum() / (g * g).sum()
        return ((w - a * g) ** 2).sum()

    lo, hi = 0.05, 1.0
    phi = (np.sqrt(5.0) - 1.0) / 2.0
    for _ in range(80):
        m1 = hi - phi * (hi - lo)
        m2 = lo + phi * (hi - lo)
        if err(m1) < err(m2):
            hi = m2
        else:
            lo = m1
    return (lo + hi) / 2.0


if __name__ == "__main__":
    published = {"hann": 0.25645, "hamming": 0.29794, "blackman": 0.17954}
    for name in ["hann", "hamming", "blackman", "kaiser", "bartlett"]:
        c = fit_gamma_c(name)
        ref = published.get(name)
        extra = " (published %.5f, %+.1f%%)" % (ref, 100 * (c / ref - 1)) if ref else ""
        print("%-9s c = %.5f%s" % (name, c, extra))
