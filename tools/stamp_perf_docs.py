"""Stamp README/SERVING/PARITY perf figures from the current bench JSON.

VERDICT r4 weak #4: hand-copied numbers in three prose files drifted from
the bench by 5-18% across rounds.  Every number-bearing perf claim now
lives between explicit markers::

    <!--b:METRIC_EXPR:FMT-->stamped text<!--/b-->

``METRIC_EXPR`` is a bench metric key (e.g. ``pallas_fused_frames_per_sec``)
or a ratio ``key1/key2``; ``FMT`` one of:

    M    -> "35.1M"      (millions, 1 decimal)
    K    -> "504K"       (thousands, rounded)
    x    -> "2.04x"      (ratio, 2 decimals)
    ms   -> "30.5 ms"
    db   -> "104 dB"
    f3/f4-> "0.013"/"0.0133" (fixed decimals)
    e    -> "4.3e-05"
    int  -> "33012"

Run ``python tools/stamp_perf_docs.py`` after a bench run — it rewrites
the marked spans in place and prints a change summary.  The metric source
is ``bench_last_full.json`` (written by every bench run) when present,
else the latest parseable driver ``BENCH_r{N}.json`` (via bench.py's
recovery).  ``tests/test_docs_numbers.py`` asserts every marked span in
the committed docs matches a fresh stamp — stale docs fail CI instead of
silently drifting.
"""
import json
import os
import re
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

DOC_FILES = ["README.md", "docs/SERVING.md", "PARITY.md", "BENCH_NOTES.md"]

_MARK = re.compile(
    r"<!--b:(?P<expr>[a-z0-9_/]+):(?P<fmt>[A-Za-z0-9]+)-->"
    r"(?P<text>.*?)<!--/b-->",
    re.S,
)


def load_metrics():
    """(metrics dict, source tag) — bench_last_full.json if present, else
    the latest parseable driver BENCH_r{N}.json."""
    full = os.path.join(HERE, "bench_last_full.json")
    if os.path.exists(full):
        with open(full) as f:
            m = json.load(f)
        rnd = m.get("vs_round")
        tag = "r%d bench" % (rnd + 1) if isinstance(rnd, int) else "live bench"
        return m, tag
    import bench

    prev, rnd = bench._previous_round_metrics()
    if prev is None:
        raise SystemExit("no bench metrics found (run python bench.py first)")
    return prev, "r%d bench" % rnd


def _value(metrics, expr):
    if "/" in expr:
        a, b = expr.split("/", 1)
        va, vb = metrics.get(a), metrics.get(b)
        if not isinstance(va, (int, float)) or not isinstance(vb, (int, float)) or vb == 0:
            return None
        return va / vb
    v = metrics.get(expr)
    return v if isinstance(v, (int, float)) else None


def _fmt(v, fmt):
    if fmt == "M":
        return "%.1fM" % (v / 1e6)
    if fmt == "K":
        return "%dK" % round(v / 1e3)
    if fmt == "x":
        return "%.2fx" % v
    if fmt == "ms":
        return "%.1f ms" % v
    if fmt == "db":
        return "%.0f dB" % v
    if fmt.startswith("f"):
        return "%.*f" % (int(fmt[1:]), v)
    if fmt == "e":
        return "%.1e" % v
    if fmt == "int":
        return "%d" % round(v)
    raise ValueError("unknown stamp format %r" % fmt)


def parse_stamped(text, fmt):
    """Numeric value back out of a stamped span (inverse of _fmt);
    None if the span is a placeholder or malformed."""
    t = text.strip()
    try:
        if fmt == "M":
            return float(t.rstrip("M")) * 1e6
        if fmt == "K":
            return float(t.rstrip("K")) * 1e3
        if fmt == "x":
            return float(t.rstrip("x×"))
        if fmt == "ms":
            return float(t.replace("ms", "").strip())
        if fmt == "db":
            return float(t.replace("dB", "").strip())
        if fmt.startswith("f") or fmt in ("e", "int"):
            return float(t)
    except ValueError:
        return None
    return None


def stamp_text(text, metrics):
    """(new_text, [(expr, old, new)] changes, [missing exprs])."""
    changes, missing = [], []

    def sub(m):
        v = _value(metrics, m.group("expr"))
        if v is None:
            missing.append(m.group("expr"))
            return m.group(0)
        new = _fmt(v, m.group("fmt"))
        if new != m.group("text"):
            changes.append((m.group("expr"), m.group("text"), new))
        return "<!--b:%s:%s-->%s<!--/b-->" % (
            m.group("expr"), m.group("fmt"), new
        )

    return _MARK.sub(sub, text), changes, missing


def main():
    metrics, tag = load_metrics()
    print("stamping from", tag)
    for rel in DOC_FILES:
        path = os.path.join(HERE, rel)
        if not os.path.exists(path):
            continue
        with open(path) as f:
            text = f.read()
        new, changes, missing = stamp_text(text, metrics)
        for expr, old, fresh in changes:
            print("  %s: %s: %r -> %r" % (rel, expr, old, fresh))
        for expr in missing:
            print("  %s: %s: METRIC MISSING (left as-is)" % (rel, expr))
        if new != text:
            with open(path, "w") as f:
                f.write(new)
    print("done")


if __name__ == "__main__":
    main()
