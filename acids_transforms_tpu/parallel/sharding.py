"""Sharded execution of transform chains.

Two modes (SURVEY.md §5, long-context row):

* **batch (data) parallelism** — the production mode: shard leading batch
  dims over the mesh and ``jit`` the whole chain; XLA inserts no collectives
  at all (embarrassingly parallel), per-chip throughput is the metric.

* **sequence parallelism** — for single long signals: shard the *time* axis,
  exchange the ``n_fft - hop`` halo between neighbouring shards over ICI with
  ``shard_map`` + ``lax.ppermute``, so framing (analysis) and overlap-add
  (synthesis) are exact at shard boundaries.  This is the DSP analogue of
  context parallelism; PGHI stays batch-sharded (its scan is causal over the
  whole frame axis).
"""
from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
try:
    from jax import shard_map
    _CHECK_KW = "check_vma"  # jax>=0.6 spelling
except ImportError:  # older jax: same function, older kwarg spelling
    from jax.experimental.shard_map import shard_map
    _CHECK_KW = "check_rep"
_NO_CHECK = {_CHECK_KW: False}
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.fft import irfft_frames, rfft_frames
from ..ops.framing import frame, overlap_add

__all__ = [
    "shard_along",
    "data_parallel",
    "shard_map_batch",
    "sequence_parallel_stft",
    "sequence_parallel_istft",
]


def shard_along(x: jnp.ndarray, mesh: Mesh, axis_name: str = "data", dim: int = 0):
    """Place ``x`` with dimension ``dim`` sharded over ``axis_name``."""
    spec = [None] * x.ndim
    spec[dim] = axis_name
    return jax.device_put(x, NamedSharding(mesh, P(*spec)))


def data_parallel(
    fn: Callable, mesh: Mesh, axis_name: str = "data", dim: int = 0
) -> Callable:
    """Jit ``fn(transform, x)`` with ``x`` (and the output) batch-sharded.

    The transform's parameter leaves are replicated; the batch dim is split
    over the mesh.  Example::

        fwd = data_parallel(lambda t, x: t.forward(x), mesh)
        y = fwd(chain, x)   # x: (B, ...) with B % mesh.size == 0
    """

    @jax.jit
    def wrapped(t, x):
        spec = [None] * x.ndim
        spec[dim] = axis_name
        x = jax.lax.with_sharding_constraint(x, NamedSharding(mesh, P(*spec)))
        return fn(t, x)

    return wrapped


def shard_map_batch(
    fn: Callable,
    mesh: Mesh,
    axis_name: str = "data",
    keyed: bool = False,
) -> Callable:
    """STRUCTURALLY partition a batch-leading function over ``mesh``.

    Unlike :func:`data_parallel` (plain ``jit`` + a sharding constraint,
    which leaves partitioning of custom calls to GSPMD), this wraps ``fn``
    in ``shard_map``: each device runs ``fn`` on its *local* batch slice,
    so Pallas kernel dispatches inside ``fn`` (fuse.fuse_forward, the
    streaming session kernels) are invoked per shard as ordinary
    single-device calls — the compiled module contains no collectives at
    all for the batch operand (asserted by tests/test_parallel.py's
    HLO inspection and the driver dryrun).

    Leaf rule: every input/output array leaf whose leading dimension
    equals the (global) batch ``B = x.shape[0]`` is split over
    ``axis_name`` on dim 0; every other leaf is passed/returned
    replicated.  This matches the streaming chains' state pytrees (all
    carried buffers are batch-leading) and the fused forwards (audio in,
    features out).  ``B`` must be divisible by the mesh axis size.

    ``keyed=True``: ``fn(x, key)`` — the PRNG key is folded with the
    shard index (``jax.random.fold_in(key, axis_index)``) so shards draw
    independent randomness.  Phaseless streaming draws therefore differ
    from the single-device run (equivalent in distribution and quality,
    not bit-equal) — the multi-chip contract documented in PARITY.md.

    Channel caveat (reference ``Mono`` semantics): a rank-2 ``(B, L)``
    batch whose LOCAL slice has exactly 2 rows is indistinguishable from
    a stereo signal, so channel-ful chains under a mesh must take
    channel-explicit ``(B, 1, L)`` input — the same convention
    ``serving.CompiledTransform`` documents for bucketed batches.
    """
    n = mesh.shape[axis_name]

    def _specs(tree, B):
        def leaf_spec(l):
            shp = getattr(l, "shape", ())
            if len(shp) >= 1 and shp[0] == B:
                return P(*([axis_name] + [None] * (len(shp) - 1)))
            return P()

        return jax.tree_util.tree_map(leaf_spec, tree)

    def _local_shape(l, B):
        """ShapeDtypeStruct of a batch-leaf's per-shard slice (replicated
        leaves pass through with their global shape)."""
        return (
            jax.ShapeDtypeStruct(
                (l.shape[0] // n,) + tuple(l.shape[1:]), l.dtype
            )
            if getattr(l, "ndim", 0) >= 1 and l.shape[0] == B
            else jax.ShapeDtypeStruct(
                getattr(l, "shape", ()), getattr(l, "dtype", jnp.float32)
            )
        )

    # spec derivation runs TWO abstract traces of fn (local + global, the
    # out-spec disambiguation) — memoize per argument shape signature so
    # repeated calls at the same shapes (eager serving loops, bench
    # timing) pay the traces once
    _spec_cache: dict = {}

    def wrapped(x, *rest):
        if getattr(x, "ndim", 0) < 2:
            raise ValueError(
                "shard_map_batch: input must carry an explicit leading "
                "batch axis (rank >= 2); got rank-%d shape %r.  Unbatched "
                "signals cannot be mesh-partitioned — add a batch dim "
                "(x[None]) or drop mesh=." % (getattr(x, "ndim", 0),
                                              tuple(getattr(x, "shape", ())))
            )
        B = x.shape[0]
        if B % n:
            raise ValueError(
                "shard_map_batch: leading batch %d not divisible by mesh "
                "axis %r size %d" % (B, axis_name, n)
            )
        _loc = lambda l: _local_shape(l, B)

        if keyed:
            key, rest_t = rest[0], rest[1:]

            def local(xl, kl, *rl):
                kl = jax.random.fold_in(
                    kl, jax.lax.axis_index(axis_name)
                )
                return fn(xl, kl, *rl)

            args = (x, key) + rest_t
            in_specs = (
                _specs(x, B), P(),
                *(_specs(r, B) for r in rest_t),
            )
            # the key is replicated (in_spec P()) — it must NOT go
            # through the batch-leaf shape heuristic (a legacy uint32
            # key of shape (2,) with B == 2 would be miscut)
            local_args = (
                jax.tree_util.tree_map(_loc, x),
                jax.ShapeDtypeStruct(tuple(key.shape), key.dtype),
                *(jax.tree_util.tree_map(_loc, r) for r in rest_t),
            )
        else:
            local = fn
            args = (x,) + rest
            in_specs = (_specs(x, B), *(_specs(r, B) for r in rest))
            local_args = jax.tree_util.tree_map(_loc, args)

        # out specs: a leaf is batch-sharded iff the GLOBAL trace gives it
        # a leading dim of B and the LOCAL trace gives the matching B//n
        # slice; a leaf identical in both traces is replicated.  Tracing
        # both sides kills the B//n == 1 ambiguity (a replicated leaf with
        # a coincidental leading 1 has leading 1 globally too, not B).
        # Shapes via fn, not local: the keyed fold_in references the mesh
        # axis, which is unbound outside the shard_map context (and does
        # not change any shape).
        leaves, treedef = jax.tree_util.tree_flatten(args)
        sig = (
            treedef,
            tuple(
                (tuple(getattr(l, "shape", ())), str(getattr(l, "dtype", "")))
                for l in leaves
            ),
        )
        out_specs = _spec_cache.get(sig)
        if out_specs is None:
            global_args = jax.tree_util.tree_map(
                lambda l: jax.ShapeDtypeStruct(
                    tuple(getattr(l, "shape", ())),
                    getattr(l, "dtype", jnp.float32),
                ),
                args,
            )
            out_local = jax.eval_shape(fn, *local_args)
            out_global = jax.eval_shape(fn, *global_args)

            def out_spec(lg, ll):
                gs, ls = tuple(lg.shape), tuple(ll.shape)
                if (
                    len(gs) >= 1
                    and gs[0] == B
                    and ls == (B // n,) + gs[1:]
                ):
                    return P(*([axis_name] + [None] * (len(gs) - 1)))
                if gs == ls:
                    return P()
                raise ValueError(
                    "shard_map_batch: output leaf shape %r (global trace) "
                    "vs %r (local trace) is neither batch-sharded nor "
                    "replicated" % (gs, ls)
                )

            out_specs = jax.tree_util.tree_map(out_spec, out_global, out_local)
            _spec_cache[sig] = out_specs
        return shard_map(
            local,
            mesh=mesh,
            in_specs=in_specs,
            out_specs=out_specs,
            **_NO_CHECK,
        )(*args)

    return wrapped


def _halo_from_next(x: jnp.ndarray, halo: int, axis_name: str) -> jnp.ndarray:
    """Fetch the first ``halo`` samples of the *next* shard (zeros on the last)."""
    n = jax.lax.psum(1, axis_name)
    idx = jax.lax.axis_index(axis_name)
    head = x[..., :halo]
    # send my head to my left neighbour: perm maps source -> destination
    perm = [(i, i - 1) for i in range(1, n)]
    received = jax.lax.ppermute(head, axis_name, perm)
    is_last = idx == n - 1
    return jnp.where(is_last, jnp.zeros_like(received), received)


def _halo_to_next(x_tail: jnp.ndarray, axis_name: str) -> jnp.ndarray:
    """Send my tail to the next shard; receive the previous shard's tail
    (zeros on the first shard)."""
    n = jax.lax.psum(1, axis_name)
    idx = jax.lax.axis_index(axis_name)
    perm = [(i, i + 1) for i in range(n - 1)]
    received = jax.lax.ppermute(x_tail, axis_name, perm)
    is_first = idx == 0
    return jnp.where(is_first, jnp.zeros_like(received), received)


def sequence_parallel_stft(
    x: jnp.ndarray,
    n_fft: int,
    hop_length: int,
    window: jnp.ndarray,
    mesh: Mesh,
    axis_name: str = "seq",
    impl: str = "auto",
    batch_axis: Optional[str] = None,
) -> jnp.ndarray:
    """STFT of a time-sharded signal; output frame axis is sharded the same.

    ``x (..., L)`` with ``L`` divisible by ``mesh.shape[axis_name] * hop``;
    no centre padding (``center=False`` semantics — pre-pad globally if
    centred frames are wanted).  Each shard fetches an ``n_fft - hop`` halo
    from its right neighbour over ICI and frames locally; frame counts per
    shard are identical, so the global result is exactly the unsharded STFT
    of ``x`` with ``L // hop`` frames.
    """
    halo = n_fft - hop_length

    def local_fn(xs):
        # xs: (..., L_loc)
        nxt = _halo_from_next(xs, halo, axis_name)
        xc = jnp.concatenate([xs, nxt], axis=-1)
        L_loc = xs.shape[-1]
        n_frames = L_loc // hop_length
        frames = frame(xc, n_fft, hop_length, -1)[..., :n_frames, :]
        return rfft_frames(frames * window, impl=impl)

    n_dims = x.ndim
    lead = [batch_axis] + [None] * (n_dims - 2) if batch_axis else [None] * (n_dims - 1)
    in_spec = P(*(lead + [axis_name]))
    out_spec = P(*(lead + [axis_name, None]))
    return shard_map(
        local_fn, mesh=mesh, in_specs=(in_spec,), out_specs=out_spec
    )(x)


def sequence_parallel_istft(
    spec: jnp.ndarray,
    n_fft: int,
    hop_length: int,
    window: jnp.ndarray,
    mesh: Mesh,
    axis_name: str = "seq",
    impl: str = "auto",
    batch_axis: Optional[str] = None,
) -> jnp.ndarray:
    """Least-squares ISTFT of frame-sharded spectra; output time-sharded.

    Inverse of :func:`sequence_parallel_stft`: each shard synthesizes and
    overlap-adds its frames locally, sends the ``n_fft - hop`` OLA tail to
    its right neighbour over ICI, and divides by the (periodic) squared-
    window envelope.  Exact at shard boundaries.
    """
    halo = n_fft - hop_length

    def _ola_with_halo(frames):
        """Local OLA + boundary tail exchange; returns the exact global OLA
        restricted to this shard's T_loc * hop samples."""
        ola = overlap_add(frames, hop_length)  # (..., (T_loc-1)*hop + n_fft)
        body_len = frames.shape[-2] * hop_length
        tail = ola[..., body_len:]  # length halo, overlaps the next shard
        prev_tail = _halo_to_next(tail, axis_name)
        body = ola[..., :body_len]
        pad = [(0, 0)] * (body.ndim - 1) + [(0, body_len - halo)]
        return body + jnp.pad(prev_tail, pad)

    def local_fn(sp):
        # sp: (..., T_loc, F)
        y_frames = irfft_frames(sp, n_fft=n_fft, impl=impl) * window
        body = _ola_with_halo(y_frames)
        env_frames = jnp.broadcast_to(window[None, :] ** 2, (sp.shape[-2], n_fft))
        env = _ola_with_halo(env_frames)
        tiny = jnp.finfo(body.dtype).tiny
        return body / jnp.where(env > tiny, env, jnp.ones_like(env))

    n_dims = spec.ndim
    lead = [batch_axis] + [None] * (n_dims - 3) if batch_axis else [None] * (n_dims - 2)
    in_spec = P(*(lead + [axis_name, None]))
    out_spec = P(*(lead + [axis_name]))
    return shard_map(
        local_fn, mesh=mesh, in_specs=(in_spec,), out_specs=out_spec
    )(spec)
