"""Core transform protocol: pytree-registered, composable, invertible audio transforms.

TPU-native re-design of the reference ``AudioTransform`` protocol
(reference: acids_transforms/transforms/base.py:13-180).  Differences by design:

* Transforms are **pytrees**, not ``nn.Module``s: array parameters (windows,
  filterbanks, fitted normalizer stats, RNG keys) and nested sub-transforms are
  pytree *children*; everything else (sample rate, mode strings, sizes) is
  static auxiliary data.  Any transform can therefore be passed straight
  through ``jax.jit`` / ``jax.vmap`` / ``jax.lax.scan`` as an argument.
* ``scale_data`` (reference base.py:34-36) exists as an eager, in-place
  convenience, but the jit-safe primitive is the pure ``fit(x) -> transform``.
* ``scriptable`` (TorchScript flag in the reference) means "jit-traceable with
  static shapes" here; the deploy path is ``jax.export`` (see
  acids_transforms_tpu/export.py) instead of ``torch.jit.script``.
* Streaming state is never hidden in buffers: stateful (realtime) transforms
  expose ``init_state`` / ``step`` and compose through ``lax.scan`` carries
  (see transforms/oadd.py, transforms/stft.py:RealtimeSTFT).
"""
from __future__ import annotations

import functools
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

__all__ = [
    "AudioTransform",
    "ComposeAudioTransform",
    "NotInvertibleError",
    "InversionEnumType",
    "apply_transform_to_list",
    "apply_invert_transform_to_list",
]


class NotInvertibleError(Exception):
    """Raised when ``invert`` is called on a non-invertible transform
    (reference: base.py:6-7)."""


#: type of ``inversion_mode`` arguments (reference base.py:10)
InversionEnumType = Optional[str]


def _hashable(value: Any) -> Any:
    """Convert config values to hashable equivalents for pytree aux data."""
    if isinstance(value, list):
        return ("__list__", tuple(_hashable(v) for v in value))
    if isinstance(value, tuple):
        return ("__tuple__", tuple(_hashable(v) for v in value))
    if isinstance(value, dict):
        return ("__dict__", tuple(sorted((k, _hashable(v)) for k, v in value.items())))
    return value


def _unhashable(value: Any) -> Any:
    if isinstance(value, tuple) and len(value) == 2 and value[0] in ("__list__", "__tuple__", "__dict__"):
        tag, payload = value
        if tag == "__list__":
            return [_unhashable(v) for v in payload]
        if tag == "__tuple__":
            return tuple(_unhashable(v) for v in payload)
        return {k: _unhashable(v) for k, v in payload}
    return value


class AudioTransform:
    """Base class for composable, invertible audio transforms.

    Capability flags mirror the reference (base.py:14-16):

    * ``invertible``  — ``invert`` reconstructs the input (possibly phaseless).
    * ``scriptable``  — forward/invert are jit-traceable with static shapes.
    * ``needs_scaling`` — requires a ``fit``/``scale_data`` statistics pass
      before ``forward`` is meaningful.

    Subclasses declare ``_leaves``: the ordered tuple of attribute names that
    are pytree children (jnp arrays, PRNG keys, nested transforms).  All other
    instance attributes must be hashable config and become static aux data.
    """

    invertible: bool = True
    scriptable: bool = True
    needs_scaling: bool = False

    _leaves: Tuple[str, ...] = ()
    #: attribute names excluded from the pytree entirely — eager-only side
    #: state (e.g. the STFT ``keep_input`` phase stash, streaming ring
    #: buffers used by the non-scan convenience path).  They are reset to
    #: ``None`` on unflatten, so jitted code never sees them.
    _volatile: Tuple[str, ...] = ()

    def __init__(self, sr: int = 44100):
        self.sr = int(sr)

    # ------------------------------------------------------------------ pytree
    def __init_subclass__(cls, **kwargs):
        super().__init_subclass__(**kwargs)
        jax.tree_util.register_pytree_node(
            cls, cls._tree_flatten, cls._tree_unflatten
        )

    def _tree_flatten(self):
        cls = type(self)
        leaves = tuple(getattr(self, name) for name in cls._leaves)
        skip = set(cls._leaves) | set(cls._volatile)
        aux = tuple(
            sorted(
                (k, _hashable(v))
                for k, v in self.__dict__.items()
                if k not in skip
            )
        )
        return leaves, aux

    @classmethod
    def _tree_unflatten(cls, aux, leaves):
        obj = object.__new__(cls)
        for k, v in aux:
            object.__setattr__(obj, k, _unhashable(v))
        for name in cls._volatile:
            object.__setattr__(obj, name, None)
        for name, leaf in zip(cls._leaves, leaves):
            object.__setattr__(obj, name, leaf)
        return obj

    # ------------------------------------------------------------------- rng
    def _take_key(self, key: Optional[jax.Array]) -> jax.Array:
        """Resolve a PRNG key for random inversion modes.

        If ``key`` is given, use it.  Otherwise split the transform's own
        ``rng`` leaf; outside of tracing the stored key advances so repeated
        eager calls differ, while under ``jit`` the draw is a deterministic
        function of the transform's key (pass ``key=`` for fresh randomness).
        """
        if key is not None:
            return key
        rng = getattr(self, "rng", None)
        if rng is None:
            return jax.random.PRNGKey(0)
        nxt, sub = jax.random.split(rng)
        if not isinstance(nxt, jax.core.Tracer):
            self.rng = nxt
        return sub

    def replace(self, **updates) -> "AudioTransform":
        """Return a copy of this transform with the given attributes replaced."""
        leaves, aux = self._tree_flatten()
        new = type(self)._tree_unflatten(aux, leaves)
        for k, v in updates.items():
            setattr(new, k, v)
        return new

    # ----------------------------------------------------------------- compose
    def __add__(self, other: "AudioTransform") -> "ComposeAudioTransform":
        # reference: base.py:25-32
        if isinstance(other, ComposeAudioTransform):
            return ComposeAudioTransform(transforms=[self] + list(other.transforms))
        if isinstance(other, AudioTransform):
            return ComposeAudioTransform(transforms=[self, other])
        raise TypeError(
            "AudioTransform cannot be added to type: %s" % type(other)
        )

    # --------------------------------------------------------------------- api
    def forward(self, x: jnp.ndarray) -> jnp.ndarray:
        """Apply the transform (identity by default; reference base.py:38-40)."""
        return x

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return self.forward(x)

    def invert(
        self,
        x: jnp.ndarray,
        inversion_mode: Optional[str] = None,
        key: Optional[jax.Array] = None,
    ) -> jnp.ndarray:
        """Invert the transform (identity by default; reference base.py:45-47)."""
        return x

    def forward_with_time(
        self, x: jnp.ndarray, time: jnp.ndarray
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Forward pass threading per-chunk start times (reference base.py:49-51)."""
        return self.forward(x), time

    # ------------------------------------------------------------------ fitting
    def fit(
        self, x: jnp.ndarray, mask: Optional[jnp.ndarray] = None
    ) -> "AudioTransform":
        """Pure functional fit: return a new transform whose statistics are
        fitted on ``x``.  Default: no parameters to fit.

        ``mask`` (optional, broadcastable to ``x``; 1 = real data) excludes
        padding from the statistics — bucket-padded batches
        (utils/bucketing.py) fit identically to their unpadded originals.
        """
        return self

    def propagate_mask(
        self, mask: Optional[jnp.ndarray], x: jnp.ndarray
    ) -> Optional[jnp.ndarray]:
        """Map a validity mask over this transform: given ``mask``
        (broadcastable to the input ``x``), return the mask of the *output*.

        Default assumes the transform preserves layout.  Framing transforms
        (STFT, Window, OverlapAdd, MFCC) downsample to per-frame masks; shape
        transforms apply the same reshaping; transforms that cannot represent
        the mapping return ``None`` (downstream fits then run unmasked).
        """
        return mask

    def scale_data(
        self, x: jnp.ndarray, mask: Optional[jnp.ndarray] = None
    ) -> None:
        """Eager, in-place fit (API parity with reference base.py:34-36).

        Uses :meth:`fit` and copies the fitted leaves onto ``self``.
        """
        fitted = self.fit(x, mask=mask)
        for name in type(self)._leaves:
            setattr(self, name, getattr(fitted, name))
        for k, v in fitted.__dict__.items():
            if k not in type(self)._leaves:
                setattr(self, k, v)

    # ---------------------------------------------------------------- streaming
    def realtime(self) -> "AudioTransform":
        """Return the streaming variant of this transform (default: self)."""
        return self

    # Scan-composable streaming protocol: stateless transforms carry ``None``
    # and fall back to forward/invert; stateful ones (OverlapAdd, Realtime*)
    # override all three.  The whole chain's state is a pytree, so a chunked
    # loop is just ``lax.scan(chain.step, chain.init_state(...), chunks)``.
    def init_state(
        self, batch_shape: Tuple[int, ...] = (), mode: Optional[str] = None
    ):
        """Fresh streaming state (default: stateless).

        ``mode`` (an inversion-mode name) lets stateful transforms allocate
        only the carry their mode actually needs — see
        ``RealtimeSTFT.init_state``.
        """
        return None

    def step(self, state, x):
        return state, self.forward(x)

    def step_invert(self, state, y, inversion_mode: Optional[str] = None, key=None):
        return state, self.invert(y, inversion_mode=inversion_mode, key=key)

    @property
    def ratio(self) -> int:
        """Per-sample -> per-frame decimation factor (reference base.py:56-58)."""
        return 1

    def output_frame_axis(self, axis_in: Optional[int] = None) -> Optional[int]:
        """Negative axis index of the frame dimension in this transform's
        *output*, given the frame axis of its input (``None`` = no frame axis
        yet / not representable).  Framing transforms (STFT, DGT, Window,
        OverlapAdd) introduce it; layout transforms (Transpose, Squeeze,
        Unsqueeze, stacked representations) relocate it; everything else
        preserves it.  Serving (serving.py) uses the chain-folded value to pad
        and trim the frame axis shape-stably."""
        return axis_in

    def get_inversion_modes(self) -> Optional[List[str]]:
        return None

    #: every inversion-mode name any transform in the library (or a user
    #: subclass) understands — used to distinguish "mode meant for another
    #: child in the chain" from a genuine typo in :meth:`_resolve_mode`.
    #: OPEN registry: user transforms extend it via
    #: :meth:`register_inversion_modes`, and any transform entering a
    #: ComposeAudioTransform auto-registers its own modes, so custom modes
    #: broadcast through a chain without tripping typo protection.
    _KNOWN_INVERSION_MODES = {
        "mono", "stereo", "crop",
        "griffin_lim", "keep_input", "random", "sinebank",
        "pghi", "pghi_bidir", "pghi_exact", "pghi_gl",
    }

    @classmethod
    def register_inversion_modes(cls, *modes: str) -> None:
        """Declare custom inversion-mode names as library-known.

        A mode name must be registered (explicitly here, or implicitly by
        composing the transform that owns it) for Compose chains to broadcast
        it past children that don't handle it; unknown strings raise in
        :meth:`_resolve_mode` as typo protection.
        """
        AudioTransform._KNOWN_INVERSION_MODES.update(str(m) for m in modes)

    def _resolve_mode(self, inversion_mode: Optional[str]) -> Optional[str]:
        """Resolve a requested inversion mode against this transform's own.

        Compose chains broadcast one ``inversion_mode`` to every child
        (reference base.py:162-166); a mode that belongs to a *different*
        transform type (e.g. ``"pghi"`` reaching a ``Mono``) falls back to
        this transform's configured default.  A string no transform in the
        library knows raises immediately (typo protection).
        """
        modes = self.get_inversion_modes() or []
        if inversion_mode is not None:
            if inversion_mode in modes:
                return inversion_mode
            if inversion_mode not in self._KNOWN_INVERSION_MODES:
                raise ValueError(
                    "inversion mode %r not valid (known: %s)"
                    % (inversion_mode, sorted(self._KNOWN_INVERSION_MODES))
                )
        return getattr(self, "inversion_mode", None)

    # -------------------------------------------------------------------- jit
    def jforward(self, x: jnp.ndarray) -> jnp.ndarray:
        """Jit-compiled forward (the transform itself is a traced pytree arg)."""
        return _jit_forward(self, x)

    def jinvert(
        self,
        x: jnp.ndarray,
        inversion_mode: Optional[str] = None,
        key: Optional[jax.Array] = None,
    ) -> jnp.ndarray:
        return _jit_invert(self, x, inversion_mode, key)

    def jfit(self, x: jnp.ndarray, mask: Optional[jnp.ndarray] = None) -> "AudioTransform":
        return _jit_fit(self, x, mask)

    # ------------------------------------------------------------- test hooks
    # Self-describing per-transform smoke hooks, mirroring the reference's
    # discovery-driven test strategy (reference base.py:60-80; SURVEY.md §4).
    # Transforms that need special inputs (complex spectra, framed chunks,
    # integer codes) override these to synthesize them.
    def test_forward(self, x: jnp.ndarray, time: Optional[jnp.ndarray] = None):
        if self.needs_scaling:
            self.scale_data(x)
        if time is None:
            return self.forward(x)
        return self.forward_with_time(x, time)

    def test_inversion(self, x: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        if not self.invertible:
            raise NotImplementedError
        if self.needs_scaling:
            self.scale_data(x)
        y = self.forward(x)
        return {"inverted": self.invert(y)}

    def test_jit_transform(self, x: jnp.ndarray, invert: bool = True):
        """The ``scriptable`` check: forward (and invert) must jit-trace.

        TPU-native equivalent of the reference's
        ``test_scripted_transform`` (base.py:73-80)."""
        if self.needs_scaling:
            self.scale_data(x)
        y = self.jforward(x)
        if invert and self.invertible:
            self.jinvert(y)
        return y

    def __repr__(self):
        cfg = ", ".join(
            f"{k}={v!r}"
            for k, v in self.__dict__.items()
            if k not in type(self)._leaves and not k.startswith("_")
        )
        return f"{type(self).__name__}({cfg})"


@jax.jit
def _jit_forward(t: AudioTransform, x: jnp.ndarray) -> jnp.ndarray:
    return t.forward(x)


@functools.partial(jax.jit, static_argnums=(2,))
def _jit_invert(t, x, inversion_mode, key):
    return t.invert(x, inversion_mode=inversion_mode, key=key)


@jax.jit
def _jit_fit(t, x, mask=None):
    return t.fit(x, mask=mask)


class ComposeAudioTransform(AudioTransform):
    """Chain of transforms built with ``+`` (reference base.py:83-180).

    * capability flags fold over children (AND for invertible/scriptable,
      OR for needs_scaling; reference base.py:85-104)
    * ``forward`` folds left, ``invert`` folds **right** with a shared
      ``inversion_mode`` handed to every child (reference base.py:150-166)
    * ``fit`` is the fit-then-advance cascade (reference base.py:144-148)
    """

    _leaves = ("transforms",)

    def __init__(self, transforms: Sequence[AudioTransform] = (), sr: int = 44100):
        super().__init__(sr=sr)
        self.transforms = list(transforms)
        self._register_child_modes()

    def _register_child_modes(self) -> None:
        # auto-register every child's inversion modes so a shared mode string
        # broadcast by invert() is recognized by siblings that don't own it —
        # keeps the typo-protection registry open to user subclasses.  Called
        # from __init__ AND from invert(): pytree unflattening (jit
        # boundaries, npz checkpoint load in a fresh process) reconstructs
        # chains without running __init__, and the loaded chain must still
        # accept its own custom modes.
        for t in self.transforms:
            try:
                modes = t.get_inversion_modes()
            except Exception:
                modes = None
            if modes:
                AudioTransform._KNOWN_INVERSION_MODES.update(modes)

    @property
    def invertible(self) -> bool:
        return all(t.invertible for t in self.transforms)

    @property
    def scriptable(self) -> bool:
        return all(t.scriptable for t in self.transforms)

    @property
    def needs_scaling(self) -> bool:
        return any(t.needs_scaling for t in self.transforms)

    def __getitem__(self, item):
        return self.transforms[item]

    def __len__(self):
        return len(self.transforms)

    def __add__(self, other):
        if not isinstance(other, AudioTransform):
            raise TypeError(
                "ComposeAudioTransform can only be added to other AudioTransforms"
            )
        if isinstance(other, ComposeAudioTransform):
            return ComposeAudioTransform(list(self.transforms) + list(other.transforms))
        return ComposeAudioTransform(list(self.transforms) + [other])

    def __radd__(self, other):
        if not isinstance(other, AudioTransform):
            raise TypeError(
                "ComposeAudioTransform can only be added to other AudioTransforms"
            )
        if isinstance(other, ComposeAudioTransform):
            return ComposeAudioTransform(list(other.transforms) + list(self.transforms))
        return ComposeAudioTransform([other] + list(self.transforms))

    def realtime(self) -> "ComposeAudioTransform":
        return ComposeAudioTransform(
            transforms=[t.realtime() for t in self.transforms], sr=self.sr
        )

    @property
    def ratio(self) -> int:
        ratio = 1
        for t in self.transforms:
            ratio = ratio * t.ratio
        return ratio

    def output_frame_axis(self, axis_in: Optional[int] = None) -> Optional[int]:
        for t in self.transforms:
            axis_in = t.output_frame_axis(axis_in)
        return axis_in

    def fit(self, x: jnp.ndarray, mask=None) -> "ComposeAudioTransform":
        fitted = []
        for t in self.transforms:
            t = t.fit(x, mask=mask)
            fitted.append(t)
            mask = t.propagate_mask(mask, x)
            x = t.forward(x)
        return ComposeAudioTransform(transforms=fitted, sr=self.sr)

    def propagate_mask(self, mask, x):
        for t in self.transforms:
            mask = t.propagate_mask(mask, x)
            x = t.forward(x)
        return mask

    def scale_data(self, x: jnp.ndarray, mask=None) -> None:
        for t in self.transforms:
            t.scale_data(x, mask=mask)
            mask = t.propagate_mask(mask, x)
            x = t.forward(x)

    def forward(self, x: jnp.ndarray) -> jnp.ndarray:
        for t in self.transforms:
            x = t.forward(x)
        return x

    def forward_with_time(self, x, time):
        for t in self.transforms:
            x, time = t.forward_with_time(x, time)
        return x, time

    def invert(self, x, inversion_mode=None, key=None):
        self._register_child_modes()
        for t in self.transforms[::-1]:
            if key is not None:
                key, sub = jax.random.split(key)
            else:
                sub = None
            x = t.invert(x, inversion_mode=inversion_mode, key=sub)
        return x

    def get_inversion_modes(self, idx: Optional[int] = None):
        if idx is None:
            return [t.get_inversion_modes() for t in self.transforms]
        return self.transforms[idx].get_inversion_modes()

    # ------------------------------------------------------------- streaming
    def init_state(
        self, batch_shape: Tuple[int, ...] = (), mode: Optional[str] = None
    ):
        return [t.init_state(batch_shape, mode=mode) for t in self.transforms]

    def step(self, state, x):
        new_states = []
        for t, st in zip(self.transforms, state):
            st, x = t.step(st, x)
            new_states.append(st)
        return new_states, x

    def step_invert(self, state, y, inversion_mode: Optional[str] = None, key=None):
        self._register_child_modes()
        new_states = list(state)
        for i in range(len(self.transforms) - 1, -1, -1):
            if key is not None:
                key, sub = jax.random.split(key)
            else:
                sub = None
            st, y = self.transforms[i].step_invert(
                state[i], y, inversion_mode=inversion_mode, key=sub
            )
            new_states[i] = st
        return new_states, y

    def __repr__(self):
        inner = ", ".join(repr(t) for t in self.transforms)
        return f"ComposeAudioTransform([{inner}])"


def apply_transform_to_list(transform, data, time=None, **kwargs):
    """Map a transform over a Python list of arrays (reference base.py:183-190)."""
    if time is None:
        return [transform(d, **kwargs) for d in data]
    outs = [transform.forward_with_time(d, t) for d, t in zip(data, time)]
    return [o[0] for o in outs], [o[1] for o in outs]


def apply_invert_transform_to_list(transform, data, time=None, **kwargs):
    """Map a transform's inverse over a list of arrays (reference base.py:193-200)."""
    if time is None:
        return [transform.invert(d, **kwargs) for d in data]
    outs = [transform.invert(d, **kwargs) for d in data]
    return outs, list(time)
