"""Consolidated roofline/MFU digest for the five headline kernels.

VERDICT r4 weak #7: the floor analyses existed piecemeal (r3.9 forward
stage budget, r4.3 GL, r4.6 sessions); this emits ONE table — achieved
HBM GB/s vs peak, achieved MXU FLOP/s vs peak, which bound, % of that
bound — computed from the CURRENT bench timings (bench_last_full.json)
and analytic per-frame work constants documented below.  Paste the
output into BENCH_NOTES.md (r5 digest section) after a bench run.

Analytic constants (bench shape n_fft=1024, hop=256, F=513, 4 s @
44.1 kHz, T=690 frames per signal):

* fused melspec forward — explicit MXU work 2.69 MFLOP/frame (chunk
  dots 1.97 + banded square-bank mel 0.72 = the r2 dense 2.46 / 3.4
  banded ratio, both bf16x3 at 640-lane padding; BENCH_NOTES r2
  roofline + r3.9 banded-mel stage delta); HBM traffic per frame =
  hop*4 B in + F*4 B out (square mel keeps F lanes).
* offline PGHI inversion — per frame: windowed iDFT GEMM 2F x n_fft at
  bf16x3 (6.3 MFLOP) + serial VPU fill (not MXU work); HBM = F*4 in +
  hop*4 out.
* fused Griffin-Lim (30 momentum iterations) — per frame per iteration
  one synthesis + one analysis GEMM (2 x 1.05M MACs) at bf16x3 =
  12.6 MFLOP; x30 = 378 MFLOP/frame; HBM = F*4 in + hop*4 out (the
  iterates never leave VMEM/HBM-resident buffers between stages).
* whole-session roundtrip (B=1, net of harness) — analysis + synthesis
  GEMMs 12.6 MFLOP/frame (the r4.6 equal-MACs pair), 704 frames per
  4 s session; HBM = hop*4 in + hop*4 out per frame.
* fused PolarIF representation — chunk-DFT 1.97 MFLOP + two channel
  epilogues (VPU) ~0 MXU; add the magnitude/IF epilogue bytes:
  HBM = hop*4 in + 2*F*4 out (two stacked channels).

v5e peaks: 197 TFLOP/s bf16 MXU, ~819 GB/s HBM.
"""
import json
import os
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

MXU_PEAK = 197e12
HBM_PEAK = 819e9
HOP, F = 256, 513
SESSION_FRAMES, SESSION_S = 704, 4.0


def main():
    path = os.path.join(HERE, "bench_last_full.json")
    if not os.path.exists(path):
        raise SystemExit("run python bench.py first (writes bench_last_full.json)")
    with open(path) as f:
        m = json.load(f)

    rows = []

    def add(name, fps, mflop_per_frame, bytes_per_frame, bound, bound_note):
        if not isinstance(fps, (int, float)):
            rows.append((name, None, None, None, bound, bound_note))
            return
        flops = fps * mflop_per_frame * 1e6
        gbps = fps * bytes_per_frame
        rows.append((name, fps, flops, gbps, bound, bound_note))

    add(
        "fused melspec fwd", m.get("pallas_fused_frames_per_sec"),
        2.69, HOP * 4 + F * 4,
        "DMA+VPU", "91% of its 38M kernel floor (r3.9 stage budget: "
        "chunk dots fully hidden under DMA; VPU combine serialized)",
    )
    add(
        "offline PGHI invert", m.get("pghi_invert_frames_per_sec"),
        6.3, F * 4 + HOP * 4,
        "VPU serial fill", "(8,640) fill ops saturate VPU issue (r3.7); "
        "MXU synthesis is a minority of the time",
    )
    add(
        "fused Griffin-Lim x30", m.get("griffin_lim_frames_per_sec"),
        378.0, F * 4 + HOP * 4,
        "MXU", "projection GEMMs dominate; r4.3: k=1 chain within 2% of "
        "its pure-DMA prefix",
    )
    net_ms = m.get("session_net_ms_per_4s_b1")
    fps_net = (
        SESSION_FRAMES / (net_ms / 1e3)
        if isinstance(net_ms, (int, float)) and net_ms > 0
        else None
    )
    add(
        "session roundtrip B=1 (net)", fps_net,
        12.6, HOP * 4 * 2,
        "dispatch/latency", "within ~2.3x of a bare equal-MACs GEMM pair "
        "(r4.6) — grid-step latency, not throughput, at B=1",
    )
    add(
        "fused PolarIF fwd", m.get("polarif_fused_frames_per_sec"),
        1.97, HOP * 4 + 2 * F * 4,
        "DMA+VPU", "DFT GEMMs + two VPU channel epilogues; the XLA "
        "path's global unwrap cumsum is eliminated",
    )

    print("| kernel | M frames/s | TFLOP/s (%MXU) | HBM GB/s (%peak) | bound | % of bound / note |")
    print("|---|---|---|---|---|---|")
    for name, fps, flops, gbps, bound, note in rows:
        if fps is None:
            print(f"| {name} | (metric missing) | — | — | {bound} | {note} |")
            continue
        print(
            f"| {name} | {fps/1e6:.2f} | {flops/1e12:.1f} "
            f"({100*flops/MXU_PEAK:.0f}%) | {gbps/1e9:.1f} "
            f"({100*gbps/HBM_PEAK:.0f}%) | {bound} | {note} |"
        )


if __name__ == "__main__":
    main()
