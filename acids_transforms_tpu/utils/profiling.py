"""Tracing / profiling hooks (SURVEY.md §5 — the reference has none).

``trace`` wraps ``jax.profiler.trace`` for Perfetto/XProf capture;
``annotate`` names pipeline stages so chains read legibly in the trace
viewer; ``device_timeit`` measures steady-state wall time with a value fetch
(on tunneled device backends, ``block_until_ready`` alone may not wait for
completion — see bench.py).
"""
from __future__ import annotations

import contextlib
import time
from typing import Any, Callable

import jax
import jax.numpy as jnp

__all__ = ["trace", "annotate", "device_timeit"]


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a device trace viewable in XProf/Perfetto."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named scope for profiler legibility: ``with annotate("stft"): ...``."""
    return jax.profiler.TraceAnnotation(name)


def device_timeit(
    fn: Callable[..., Any], *args, iters: int = 10, repeats: int = 3
) -> float:
    """Best-of-``repeats`` seconds per call of ``jit(fn)``, forcing completion
    by fetching a scalar reduction of the output."""
    jitted = jax.jit(fn)

    def fetch(out):
        leaves = jax.tree_util.tree_leaves(out)
        acc = 0.0
        for leaf in leaves:
            acc = acc + jnp.sum(jnp.abs(leaf).astype(jnp.float32))
        return float(acc)

    fetch(jitted(*args))  # compile + warm
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = jitted(*args)
        fetch(out)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best
