"""Numerical guards (SURVEY.md §5 — race detection / sanitizer row).

On-device state is functional (scan carries, pytree params) so there is no
aliasing to sanitize; what remains is numerical health.  ``checked`` wraps a
transform function with ``checkify`` so NaN/Inf produced anywhere inside the
jitted computation surfaces as a Python error with a location, instead of
silently propagating.
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax.experimental import checkify

__all__ = ["checked", "assert_finite"]


def assert_finite(x: jnp.ndarray, name: str = "value") -> jnp.ndarray:
    """checkify-traced guard: error out (under ``checked``) if non-finite."""
    checkify.check(jnp.all(jnp.isfinite(x)), f"{name} contains NaN/Inf")
    return x


def checked(fn: Callable, *, jit: bool = True) -> Callable:
    """Wrap ``fn`` so float-error checks (including automatic NaN checks)
    raise eagerly::

        fwd = checked(lambda t, x: t.forward(x))
        y = fwd(chain, x)   # raises on NaN/Inf anywhere inside
    """
    checked_fn = checkify.checkify(fn, errors=checkify.float_checks)
    if jit:
        checked_fn = jax.jit(checked_fn)

    def wrapper(*args, **kwargs):
        err, out = checked_fn(*args, **kwargs)
        err.throw()
        return out

    return wrapper
