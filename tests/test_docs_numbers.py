"""Doc perf figures must match the bench JSON (VERDICT r4 weak #4).

Every number-bearing perf claim in README/SERVING/PARITY sits between
``<!--b:metric:fmt-->``/``<!--/b-->`` markers.  This test re-reads each
marked span and asserts it matches the current metric source
(``tools/stamp_perf_docs.py``'s) **within the metric's noise band** —
exact string equality would fail spuriously every time the driver's
end-of-round bench rewrites ``bench_last_full.json`` with values a few
percent off (cross-process tenancy, BENCH_NOTES methodology), while the
r4-style staleness this guards against was 5-18% drift plus missing
markers.  Bands: 15% for throughput/quality figures, 50% for wall-clock
latency (rides the tunneled RPC), matching bench._delta_check's own
classification.  ``python tools/stamp_perf_docs.py`` restores exact
agreement at any time."""
import importlib.util
import os

import pytest

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

#: wall-latency metrics ride the tunnel's RPC jitter — same wide band
#: bench._delta_check gives them
_WIDE_BAND_FMTS = ("ms",)


def _load_stamper():
    spec = importlib.util.spec_from_file_location(
        "stamp_perf_docs", os.path.join(HERE, "tools", "stamp_perf_docs.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def stamper():
    return _load_stamper()


@pytest.fixture(scope="module")
def metrics(stamper):
    try:
        m, tag = stamper.load_metrics()
    except SystemExit:
        pytest.skip("no bench metrics in the repo")
    return m


@pytest.mark.parametrize("rel", ["README.md", "docs/SERVING.md", "PARITY.md",
                                 "BENCH_NOTES.md"])
def test_marked_spans_match_bench(stamper, metrics, rel):
    path = os.path.join(HERE, rel)
    if not os.path.exists(path):
        pytest.skip(rel + " absent")
    with open(path) as f:
        text = f.read()
    stale, missing, unparsable = [], [], []
    for m in stamper._MARK.finditer(text):
        expr, fmt, span = m.group("expr"), m.group("fmt"), m.group("text")
        current = stamper._value(metrics, expr)
        if current is None:
            missing.append(expr)
            continue
        stamped = stamper.parse_stamped(span, fmt)
        if stamped is None:
            unparsable.append((expr, span))
            continue
        band = 0.50 if fmt in _WIDE_BAND_FMTS else 0.15
        # formatting quantization (e.g. "0.003" at f3, "1K" at 1400) can
        # dominate the relative band for small values — allow half a ULP
        # of each display format
        quantum = {
            "M": 0.05e6, "K": 500.0, "x": 0.005, "ms": 0.05,
            "db": 0.5, "int": 0.5,
        }.get(fmt, 0.0)
        if fmt == "e":
            quantum = 0.05 * abs(current)
        elif fmt.startswith("f") and fmt != "f":
            quantum = 0.5 * 10 ** -int(fmt[1:])
        denom = max(abs(current), 1e-12)
        if abs(stamped - current) > band * denom + quantum:
            stale.append((expr, span, current))
    assert not unparsable, (
        "unstampable doc spans in %s (placeholders left behind?): %r"
        % (rel, unparsable)
    )
    assert not stale, (
        "doc figures in %s drifted beyond their noise band from the bench "
        "JSON (run python tools/stamp_perf_docs.py): %r" % (rel, stale)
    )
    assert not missing, (
        "doc markers reference metrics absent from the bench JSON in %s: %r"
        % (rel, missing)
    )


def test_readme_has_marked_headline():
    """The headline claims must actually be under marker control."""
    with open(os.path.join(HERE, "README.md")) as f:
        text = f.read()
    for key in ("pallas_fused_frames_per_sec", "fused_fit_frames_per_sec",
                "deployed_artifact_frames_per_sec",
                "mesh1_fused_frames_per_sec", "session_net_ms_per_4s_b1"):
        assert "<!--b:%s" % key in text, key
