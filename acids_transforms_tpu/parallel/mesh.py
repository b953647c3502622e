"""Device-mesh helpers."""
from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh

__all__ = ["make_mesh", "local_mesh"]


def make_mesh(
    shape: Optional[Dict[str, int]] = None,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a named mesh.

    ``shape`` maps axis names to sizes, e.g. ``{"data": 4, "seq": 2}``; by
    default all devices go on one ``"data"`` axis.  Axis order follows dict
    order (outer to inner) so neighbouring ``seq`` shards land on
    ICI-adjacent devices.
    """
    devices = list(devices if devices is not None else jax.devices())
    if shape is None:
        shape = {"data": len(devices)}
    sizes = tuple(shape.values())
    if int(np.prod(sizes)) != len(devices):
        raise ValueError(
            "mesh shape %r does not cover %d devices" % (shape, len(devices))
        )
    arr = np.asarray(devices).reshape(sizes)
    return Mesh(arr, tuple(shape.keys()))


def local_mesh(n: Optional[int] = None, axis: str = "data") -> Mesh:
    """1-D mesh over the first ``n`` local devices (all by default)."""
    devs = jax.devices()
    n = len(devs) if n is None else n
    return make_mesh({axis: n}, devs[:n])
