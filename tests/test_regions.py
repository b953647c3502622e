"""Dispatch-region conformance (VERDICT r3 weak #6).

Every numeric auto-dispatch gate lives in ``dispatch_regions.json``
(loaded by ``regions.py``); the planners (``streaming.plan_*``,
``fuse._pallas_preferred`` family) ARE the decisions the dispatchers
execute.  This suite asserts, across the full documented matrix, that
the live decision matches independently-stated expectations — so a code
edit that strands ``auto`` outside its measured win region (or a table
edit that contradicts the code) fails loudly instead of silently
regressing the hot paths (the r2 streaming-regression failure class).

The TPU decisions are exercised by passing ``platform="tpu"`` to the
planners (the perf gates are platform-keyed but platform-independent
logic); the on-chip bench guard keeps watching the headline cases.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from acids_transforms_tpu import transforms as T
from acids_transforms_tpu import regions
from acids_transforms_tpu.streaming import (
    plan_forward,
    plan_invert,
    plan_roundtrip,
)


def _chain(n_fft=1024, hop=256, mode=None, feature=False):
    ch = T.OverlapAdd(n_fft, hop) + T.RealtimeSTFT(
        n_fft=n_fft, hop_length=hop,
        **({"inversion_mode": mode} if mode else {}),
    )
    if feature:
        ch = ch + T.Magnitude(mode=None, contrast="log1p", mel=True, n_fft=n_fft)
    return ch


def test_table_loads_and_values_documented():
    t = regions.table()
    assert t["streaming"]["angle_cap_bytes"] == 1 << 30
    assert t["streaming"]["sinebank_cap_bytes"] == 1 << 30
    assert t["streaming"]["batch_caps"] == {
        "complex": 1, "complex_decode": 1, "encode": 8, "pghi": None,
        "pghi_gl": 32, "random": 128,
    }
    assert t["fuse_fit"]["fullk_n_fft_max"] == 2048
    assert regions.batch_cap("pghi") is None
    assert regions.batch_cap("pghi_gl") == 32


# ---------------------------------------------------------- streaming plans

ROUNDTRIP_BATCH_MATRIX = [
    # (inversion_mode, batch_elems, expected_plan_on_tpu)
    (None, 1, "complex"),       # 1.69x single-stream (r4.5 re-measure)
    (None, 4, "generic"),       # ~0.86x at B>=4: XLA wins (r4.5)
    (None, 128, "generic"),
    ("pghi", 1, "pghi"),
    ("pghi", 256, "pghi"),      # no batch cap: kernel wins at every batch
    ("pghi_gl", 1, "pghi_gl"),
    ("pghi_gl", 32, "pghi_gl"),
    ("pghi_gl", 64, "generic"), # kernel loses at B=64 (0.9x, r3.22b)
    ("random", 1, "random"),
    ("random", 128, "random"),
    ("random", 256, "generic"),
    ("sinebank", 1, "sinebank"),
]


@pytest.mark.parametrize("mode,batch,expected", ROUNDTRIP_BATCH_MATRIX)
def test_roundtrip_plan_matrix(mode, batch, expected):
    ch = _chain(mode=mode)
    shape = (batch, 8 * 4096) if batch > 1 else (8 * 4096,)
    got = plan_roundtrip(ch, shape, 4096, mode, platform="tpu")
    assert got == expected, (mode, batch, got, expected)
    # off-TPU, auto never takes a Pallas kernel (interpret mode would be
    # orders of magnitude slower); the XLA-only sinebank closed form stays
    off = plan_roundtrip(ch, shape, 4096, mode, platform="cpu")
    assert off == ("sinebank" if expected == "sinebank" else "generic")
    # backend='fused' overrides every perf cap (availability permitting)
    if expected != "generic" or mode is not None:
        forced = plan_roundtrip(
            ch, shape, 4096, mode, backend="fused", platform="tpu"
        )
        assert forced != "generic"
    # backend='generic' always wins
    assert (
        plan_roundtrip(ch, shape, 4096, mode, backend="generic",
                       platform="tpu")
        == "generic"
    )


def test_invert_plan_matrix():
    F = 513
    for mode, batch, expected in [
        ("pghi", 8, "pghi"),
        ("pghi_gl", 8, "pghi_gl"),
        ("pghi_gl", 64, "generic"),
        ("random", 8, "random"),
        ("random", 256, "generic"),
        ("sinebank", 8, "sinebank"),
    ]:
        ch = _chain(mode=mode)
        got = plan_invert(
            ch, (batch, 128, F), 16, mode, platform="tpu"
        )
        assert got == expected, (mode, batch, got, expected)
    # complex decode plans on dtype, 2-chain only; parity at B=1,
    # XLA wins beyond (two samples, r4.5) — cap 1
    ch = _chain()
    assert plan_invert(
        ch, (128, F), 16, None, y_is_complex=True, platform="tpu"
    ) == "complex"
    assert plan_invert(
        ch, (4, 128, F), 16, None, y_is_complex=True, platform="tpu"
    ) == "generic"
    assert plan_invert(
        ch, (64, 128, F), 16, None, y_is_complex=True, platform="tpu"
    ) == "generic"
    assert plan_invert(
        _chain(feature=True), (8, 128, F), 16, None, y_is_complex=True,
        platform="tpu",
    ) == "generic"  # Magnitude tail: real features, not complex spectra


def test_encode_plan_matrix():
    ch = _chain()
    assert plan_forward(ch, (8, 8 * 4096), 4096, platform="tpu") == "fused"
    assert plan_forward(ch, (16, 8 * 4096), 4096, platform="tpu") == "generic"
    assert plan_forward(ch, (128, 8 * 4096), 4096, platform="tpu") == "generic"
    assert plan_forward(
        ch, (8, 8 * 4096), 4096, has_state=True, platform="tpu"
    ) == "generic"  # session kernels need a fresh state
    assert plan_forward(ch, (8, 8 * 4096), 4096, platform="cpu") == "generic"
    with pytest.raises(ValueError, match="fused"):
        plan_forward(ch, (8, 8 * 4096), 4096, has_state=True,
                     backend="fused", platform="tpu")


def test_angle_footprint_gate():
    """Oversized phaseless sessions (angle buffer > the table's 1 GiB cap)
    hand auto back to the generic scan; backend='fused' still forces."""
    ch = _chain(mode="pghi")
    # 64 streams x ~8.4M frames x 640 lanes x 4B >> 1 GiB
    big = (64, 2 ** 23, 513)
    assert plan_invert(ch, big, 16, "pghi", platform="tpu") == "generic"
    assert plan_invert(
        ch, big, 16, "pghi", backend="fused", platform="tpu"
    ) == "pghi"
    # roundtrip twin (footprint derived from the signal length)
    big_x = (64, 2 ** 23 * 256)
    assert plan_roundtrip(ch, big_x, 4096, "pghi", platform="tpu") == "generic"


def test_sinebank_footprint_gate():
    """The sinebank closed form materializes (B, T, n_fft) frames; above
    the table cap auto falls back to the generic scan (ADVICE r3)."""
    ch = _chain(mode="sinebank")
    big = (64, 2 ** 21, 513)  # 64 * 2M * 1024 * 4B = 512 GiB >> cap
    assert plan_invert(ch, big, 16, "sinebank", platform="tpu") == "generic"
    assert plan_invert(
        ch, big, 16, "sinebank", backend="fused", platform="tpu"
    ) == "sinebank"
    small = (2, 128, 513)
    assert plan_invert(ch, small, 16, "sinebank", platform="cpu") == "sinebank"


def test_layout_gates_fall_back():
    """Mismatched OLA/STFT layouts are capability failures: auto -> generic
    for the closed form; non-dividing hops decline the session kernels."""
    ch = T.OverlapAdd(1024, 512) + T.RealtimeSTFT(
        n_fft=1024, hop_length=256, inversion_mode="sinebank"
    )
    assert plan_invert(
        ch, (2, 128, 513), 16, "sinebank", platform="tpu"
    ) == "generic"
    ch2 = T.OverlapAdd(1000, 250) + T.RealtimeSTFT(
        n_fft=1000, hop_length=250
    )
    assert plan_roundtrip(ch2, (8, 8000), 4000, None, platform="tpu") == "generic"


# ------------------------------------------------------------- fuse regions

def test_fuse_region_helpers_match_table():
    t = regions.table()["fuse_forward"]
    # taps region boundaries
    r = t["melspec_taps"]
    assert regions.melspec_region_ok(r["n_fft_min"], r["n_fft_min"] // 2, True)
    assert regions.melspec_region_ok(r["n_fft_max"], r["n_fft_max"] // 4, True)
    assert not regions.melspec_region_ok(r["n_fft_min"] // 2, r["n_fft_min"] // 4, True)
    assert not regions.melspec_region_ok(2 * r["n_fft_max"], r["n_fft_max"] // 2, True)
    assert not regions.melspec_region_ok(1024, 1024, True)  # overlap 1
    # full-K region: 2048 in, 4096 out (measured negative)
    assert regions.melspec_region_ok(2048, 512, False)
    assert not regions.melspec_region_ok(4096, 1024, False)
    # phase/imag representations: taps-only, 1024..4096
    assert regions.repr_region_ok(1024, 256, True, "phase")
    assert not regions.repr_region_ok(512, 128, True, "phase")
    assert not regions.repr_region_ok(1024, 256, False, "phase")
    # PolarIF rides the melspec regions incl. full-K
    assert regions.repr_region_ok(1024, 256, False, "if")
    assert regions.repr_region_ok(512, 128, True, "if")
    # mfcc
    assert regions.mfcc_region_ok(1024, 256)
    assert not regions.mfcc_region_ok(8192, 2048)


def test_fuse_auto_consults_regions(monkeypatch):
    """fuse's auto backend resolution flows through regions.py: shrinking
    the table region at runtime changes the decision — proof the code
    consults the table rather than a shadowing constant."""
    from acids_transforms_tpu import fuse

    chain = T.STFT(n_fft=1024, hop_length=256) + T.Magnitude(
        mode="unipolar", contrast="log1p", mel=True, n_fft=1024
    )
    match = fuse._match_melspec(chain, "pallas")
    assert match is not None
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    assert fuse._pallas_preferred(chain)
    shrunk = {
        **regions.table(),
        "fuse_forward": {
            **regions.table()["fuse_forward"],
            "melspec_taps": {"n_fft_min": 512, "n_fft_max": 512,
                             "overlap_min": 2},
        },
    }
    monkeypatch.setattr(regions, "table", lambda: shrunk)
    assert not fuse._pallas_preferred(chain)


def test_fit_fullk_cap_consults_regions():
    """The full-K fit cap comes from the table: a 2048 gaussian chain is
    kernel-fittable, a 4096 one falls back to the exact cascade."""
    from acids_transforms_tpu.fuse import _match_fit

    ok = T.DGT(n_fft=2048, hop_length=512) + T.Magnitude(
        mode="unipolar", contrast="log1p", mel=True, n_fft=2048
    )
    too_big = T.DGT(n_fft=4096, hop_length=1024) + T.Magnitude(
        mode="unipolar", contrast="log1p", mel=True, n_fft=4096
    )
    assert _match_fit(ok) is not None
    assert _match_fit(too_big) is None


# -------------------------------------------------- live-dispatch coherence

def test_scan_apis_execute_their_plan(sig_arr=None):
    """The scan APIs route through the planners (same module-level
    functions), so a decision the planner reports is the decision the jit
    body executes: forcing backend='generic' vs the planned path on CPU
    (where the plan says generic anyway) returns identical values, and
    the CPU sinebank plan ('sinebank') actually takes the closed form
    (bit-different from generic only at ulp level)."""
    rng = np.random.default_rng(11)
    from acids_transforms_tpu.streaming import scan_invert

    ch = _chain(mode="sinebank")
    mag = jnp.asarray(rng.random((2, 48, 513), dtype=np.float32))
    assert plan_invert(ch, mag.shape, 16, "sinebank") == "sinebank"
    y_auto = np.asarray(scan_invert(ch, mag, 16, "sinebank"))
    y_gen = np.asarray(scan_invert(ch, mag, 16, "sinebank",
                                   backend="generic"))
    rel = np.linalg.norm(y_auto - y_gen) / np.linalg.norm(y_gen)
    assert 0 < rel < 5e-3  # closed form taken (ulp-level angle jitter)


def test_planner_fuzz_never_crashes_and_respects_availability():
    """Randomized chains/shapes/modes through the planners: every call
    returns a known label, 'auto' never selects a fused path whose
    availability gate is false, and off-TPU auto only ever picks
    'generic' or the XLA-only sinebank closed form."""
    import itertools

    from acids_transforms_tpu.ops.pallas.stream_step import (
        fused_complex_invert_available,
        fused_roundtrip_available,
    )

    rng = np.random.default_rng(17)
    n_ffts = [256, 512, 1000, 1024, 2048]
    hops = [64, 125, 128, 250, 256, 512]
    modes = [None, "random", "pghi", "pghi_gl", "sinebank"]
    labels_rt = {"complex", "pghi", "pghi_gl", "random", "sinebank", "generic"}
    count = 0
    for n_fft, hop in itertools.product(n_ffts, hops):
        if hop >= n_fft:
            continue
        ola_hop = hop if rng.random() < 0.8 else max(32, hop // 2)
        if n_fft % ola_hop:
            ola_hop = hop
        if n_fft % ola_hop:
            continue  # OverlapAdd requires hop | n_fft
        ch = T.OverlapAdd(n_fft, ola_hop) + T.RealtimeSTFT(
            n_fft=n_fft, hop_length=hop
        )
        for mode in modes:
            B = int(rng.choice([1, 3, 8, 64, 200]))
            L = int(rng.choice([2, 5, 17])) * 4096
            chunk = int(rng.choice([2048, 4096, 5000]))
            shape = (B, L) if B > 1 else (L,)
            for platform in ("tpu", "cpu"):
                got = plan_roundtrip(ch, shape, chunk, mode,
                                     platform=platform)
                assert got in labels_rt, got
                if platform == "cpu":
                    assert got in ("generic", "sinebank")
                if got == "complex":
                    assert fused_roundtrip_available(ch, chunk)
                count += 1
            T_c = max(1, chunk // hop)
            y_shape = shape[:-1] + (128, n_fft // 2 + 1)
            got_i = plan_invert(ch, y_shape, T_c, mode,
                                y_is_complex=mode is None, platform="tpu")
            assert got_i in labels_rt, got_i
            if got_i == "complex":
                assert fused_complex_invert_available(ch, T_c)
            got_f = plan_forward(ch, shape, chunk, platform="tpu")
            assert got_f in ("fused", "generic")
            count += 2
    assert count > 100  # the matrix actually ran
