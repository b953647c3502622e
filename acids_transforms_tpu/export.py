"""Deployment: transform serialization and StableHLO export.

The reference's deploy story is TorchScript — ``torch.jit.script(transform)``
consumed by C++ hosts (reference README.md:58-59, base.py buffer discipline).
The TPU-native equivalents:

* ``save_transform`` / ``load_transform`` — checkpoint a transform (or chain)
  to a single ``.npz``: array leaves plus a JSON manifest of classes/config.
  No pickle; files are portable and inspectable.  This covers the
  reference's ``state_dict``-via-buffers behaviour (SURVEY.md §5 checkpoint
  row) including fitted normalizer statistics.

* ``export_stablehlo`` / ``load_stablehlo`` — ``jax.export`` a jitted
  forward/invert to serialized StableHLO bytes, loadable into any JAX host
  (or compiled by PJRT from C++) without the Python transform classes.
"""
from __future__ import annotations

import importlib
import json
from typing import Any, Callable, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .transforms.base import AudioTransform

__all__ = [
    "save_transform",
    "load_transform",
    "export_stablehlo",
    "load_stablehlo",
    "invert_with_phase_fn",
]


def invert_with_phase_fn(chain: AudioTransform) -> Callable:
    """Jittable, trace-pure ``(y, phase) -> audio`` for a spectral chain.

    The reference's scripted chain carries the forward phase inside the
    TorchScript artifact (``phase_buffer``, reference stft.py:134-143,
    153-161), so a C++ host can do phase-faithful ``keep_input`` magnitude
    inversion out of the box.  Here the phase stash is an eager-only side
    channel by design (transforms/stft.py:_stash_phase) — a deployed
    artifact is trace-pure — so the deploy equivalent is this *explicit*
    entry point: export it alongside the forward and hand the host the
    ``(representation, phase)`` pair.  For a complex spectrogram ``spec``,
    call it as ``fn(abs(spec), angle(spec))`` (the spec->audio form).

    ``chain`` must contain exactly one STFT-family transform (STFT, DGT, or
    their realtime variants); the transforms after it are inverted first
    (denorm / contrast / inverse mel), then ``mag * exp(i * phase)`` goes
    through the spectral inverse and the leading transforms' inverses.
    """
    from .transforms.base import ComposeAudioTransform
    from .transforms.stft import STFT

    ts = (
        list(chain.transforms)
        if isinstance(chain, ComposeAudioTransform)
        else [chain]
    )
    spectral = [i for i, t in enumerate(ts) if isinstance(t, STFT)]
    if len(spectral) != 1:
        raise ValueError(
            "invert_with_phase_fn needs exactly one STFT/DGT in the chain "
            "(got %d)" % len(spectral)
        )
    idx = spectral[0]
    pre, spec_t, post = ts[:idx], ts[idx], ts[idx + 1:]

    def invert(y: jnp.ndarray, phase: jnp.ndarray) -> jnp.ndarray:
        for t in reversed(post):
            y = t.invert(y)
        phase = phase.astype(jnp.float32)
        # mag * (cos + i sin) instead of mag * exp(i phase): the downstream
        # GEMM ISTFT consumes real/imag parts, so XLA cancels the complex
        # wrapper and the exported artifact is complex-free — portable to
        # hosts whose runtimes mis-handle complex transcendentals
        spec = jax.lax.complex(y * jnp.cos(phase), y * jnp.sin(phase))
        x = spec_t.invert(spec)
        for t in reversed(pre):
            x = t.invert(x)
        return x

    return invert


def _encode(obj: Any, arrays: Dict[str, np.ndarray], path: str) -> Any:
    """Recursively encode a transform / pytree into JSON + a flat array dict."""
    if isinstance(obj, AudioTransform):
        cls = type(obj)
        leaves, aux = obj._tree_flatten()
        return {
            "__kind__": "transform",
            "module": cls.__module__,
            "cls": cls.__qualname__,
            "aux": [[k, _jsonable(v)] for k, v in aux],
            "leaves": {
                name: _encode(leaf, arrays, f"{path}/{name}")
                for name, leaf in zip(cls._leaves, leaves)
            },
        }
    if obj is None:
        return {"__kind__": "none"}
    if isinstance(obj, (list, tuple)):
        return {
            "__kind__": "list" if isinstance(obj, list) else "tuple",
            "items": [_encode(v, arrays, f"{path}/{i}") for i, v in enumerate(obj)],
        }
    if isinstance(obj, dict):
        return {
            "__kind__": "dict",
            "items": {k: _encode(v, arrays, f"{path}/{k}") for k, v in obj.items()},
        }
    if isinstance(obj, (jnp.ndarray, np.ndarray)) or np.isscalar(obj):
        arr = np.asarray(obj)
        arrays[path] = arr
        return {"__kind__": "array", "key": path}
    raise TypeError("cannot serialize leaf of type %s" % type(obj))


def _jsonable(v: Any) -> Any:
    """Aux config values are hashable trees; make them JSON-round-trippable."""
    if isinstance(v, tuple):
        return {"__tuple__": [_jsonable(x) for x in v]}
    return v


def _unjsonable(v: Any) -> Any:
    if isinstance(v, dict) and "__tuple__" in v:
        return tuple(_unjsonable(x) for x in v["__tuple__"])
    return v


def _decode(spec: Any, arrays) -> Any:
    kind = spec["__kind__"]
    if kind == "transform":
        mod = importlib.import_module(spec["module"])
        cls = mod
        for part in spec["cls"].split("."):
            cls = getattr(cls, part)
        aux = tuple((k, _unjsonable(v)) for k, v in spec["aux"])
        leaves = tuple(_decode(spec["leaves"][name], arrays) for name in cls._leaves)
        return cls._tree_unflatten(aux, leaves)
    if kind == "none":
        return None
    if kind in ("list", "tuple"):
        items = [_decode(s, arrays) for s in spec["items"]]
        return items if kind == "list" else tuple(items)
    if kind == "dict":
        return {k: _decode(s, arrays) for k, s in spec["items"].items()}
    if kind == "array":
        return jnp.asarray(arrays[spec["key"]])
    raise ValueError("unknown spec kind %r" % kind)


def save_transform(transform: AudioTransform, path: str) -> None:
    """Serialize a transform (or Compose chain) to ``path`` (.npz)."""
    arrays: Dict[str, np.ndarray] = {}
    manifest = _encode(transform, arrays, "root")
    arrays["__manifest__"] = np.frombuffer(
        json.dumps(manifest).encode(), dtype=np.uint8
    )
    np.savez(path if path.endswith(".npz") else path + ".npz", **arrays)


def load_transform(path: str) -> AudioTransform:
    """Load a transform saved by :func:`save_transform`."""
    data = np.load(path if path.endswith(".npz") else path + ".npz")
    manifest = json.loads(bytes(data["__manifest__"].tobytes()).decode())
    return _decode(manifest, data)


def export_stablehlo(
    fn: Callable,
    example_args: Sequence[Any],
    path: Optional[str] = None,
    polymorphic_batch: bool = False,
    in_shardings: Any = None,
) -> bytes:
    """Serialize ``jit(fn)(*example_args)`` to portable StableHLO bytes.

    ``fn`` must be jit-compatible (e.g. ``lambda x: chain.forward(x)`` with a
    fitted chain closed over — its parameters become constants, exactly like
    TorchScript freezing).

    ``polymorphic_batch=True`` exports with a symbolic leading dimension, so
    one artifact serves any batch size (sample-axis lengths stay static —
    bucket them with utils/bucketing.py).

    ``in_shardings`` (e.g. ``NamedSharding(mesh, P("data"))``) exports a
    *multi-chip* program: the sharding annotations are recorded in the
    artifact and the loaded callable runs SPMD on any mesh of the same
    device count (tests/test_parallel.py exercises this on the virtual
    8-CPU mesh; cannot be combined with ``polymorphic_batch``).
    """
    jitted = jax.jit(fn, in_shardings=in_shardings) if in_shardings is not None else jax.jit(fn)
    if polymorphic_batch:
        if in_shardings is not None:
            raise ValueError("polymorphic_batch and in_shardings are exclusive")
        (b,) = jax.export.symbolic_shape("b")
        shapes = [
            jax.ShapeDtypeStruct((b,) + jnp.shape(a)[1:], jnp.asarray(a).dtype)
            for a in example_args
        ]
        exported = jax.export.export(jitted)(*shapes)
    else:
        exported = jax.export.export(jitted)(*example_args)
    blob = exported.serialize()
    if path is not None:
        with open(path, "wb") as f:
            f.write(blob)
    return blob


def load_stablehlo(path_or_bytes) -> Callable:
    """Load serialized StableHLO back into a callable."""
    if isinstance(path_or_bytes, (bytes, bytearray)):
        blob = bytes(path_or_bytes)
    else:
        with open(path_or_bytes, "rb") as f:
            blob = f.read()
    exported = jax.export.deserialize(blob)
    return exported.call
