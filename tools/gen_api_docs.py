"""Generate docs/API.md from live docstrings.

Usage: ``python tools/gen_api_docs.py``.
"""
import inspect
import io
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def first_para(doc):
    if not doc:
        return ""
    return inspect.cleandoc(doc).split("\n\n")[0].replace("\n", " ")


def main():
    import acids_transforms_tpu as att
    import acids_transforms_tpu.ops.pallas  # noqa: F401 — lazily imported elsewhere
    from acids_transforms_tpu import transforms as T

    out = io.StringIO()
    out.write("# API reference (generated from docstrings)\n\n")
    out.write("Regenerate with `python tools/gen_api_docs.py`.\n")

    out.write("\n## Transforms (`acids_transforms_tpu.transforms`)\n\n")
    for name in T.__all__:
        obj = getattr(T, name)
        if not (inspect.isclass(obj) and issubclass(obj, T.AudioTransform)):
            continue
        out.write(f"### `{name}`\n\n{first_para(obj.__doc__)}\n\n")
        try:
            sig = inspect.signature(obj.__init__)
            params = ", ".join(str(p) for p in list(sig.parameters.values())[1:])
            out.write(f"```python\n{name}({params})\n```\n\n")
        except (ValueError, TypeError):
            pass
        try:
            inst = obj()
        except Exception:
            inst = None
        if inst is not None:
            modes = None
            try:
                modes = inst.get_inversion_modes()
            except TypeError:
                pass
            out.write(
                f"*invertible={inst.invertible}, scriptable={inst.scriptable}, "
                f"needs_scaling={inst.needs_scaling}*"
            )
            if modes:
                out.write(f" — inversion modes: `{'`, `'.join(modes)}`")
            out.write("\n\n")

    sections = [
        ("Ops (`acids_transforms_tpu.ops`)", [
            ("stft", att.ops.fft.stft), ("istft", att.ops.fft.istft),
            ("stft_real", att.ops.fft.stft_real),
            ("taps_for_window", att.ops.fft.taps_for_window),
            ("rfft_frames", att.ops.fft.rfft_frames),
            ("irfft_frames", att.ops.fft.irfft_frames),
            ("set_matmul_precision", att.ops.set_matmul_precision),
            ("frame", att.ops.frame), ("overlap_add", att.ops.overlap_add),
            ("pghi_scan", att.ops.pghi.pghi_scan),
            ("pghi_heap_numpy", att.ops.pghi.pghi_heap_numpy),
            ("phase_gradients", att.ops.pghi.phase_gradients),
            ("griffin_lim", att.ops.griffinlim.griffin_lim),
            ("melscale_fbanks", att.ops.mel.melscale_fbanks),
            ("square_mel_banks", att.ops.mel.square_mel_banks),
            ("mulaw_encode", att.ops.mulaw.mulaw_encode),
            ("mulaw_decode", att.ops.mulaw.mulaw_decode),
            ("unwrap", att.ops.phase.unwrap),
            ("get_window", att.ops.windows.get_window),
            ("dual_window", att.ops.windows.dual_window),
            ("window_gamma", att.ops.windows.window_gamma),
            ("fused_melspec (Pallas)", att.ops.pallas.fused_melspec),
            ("fused_melspec_stats (Pallas)", att.ops.pallas.fused_melspec_stats),
            ("gl_project (Pallas)", __import__("acids_transforms_tpu.ops.pallas.glstep", fromlist=["gl_project"]).gl_project),
        ]),
        ("Streaming (`acids_transforms_tpu.streaming`)", [
            ("chunk_signal", att.chunk_signal),
            ("scan_forward", att.scan_forward),
            ("scan_invert", att.scan_invert),
            ("scan_roundtrip", att.scan_roundtrip),
            ("session_frame_times", att.streaming.session_frame_times),
            ("plan_forward", att.streaming.plan_forward),
            ("plan_invert", att.streaming.plan_invert),
            ("plan_roundtrip", att.streaming.plan_roundtrip),
        ]),
        ("Parallel (`acids_transforms_tpu.parallel`)", [
            ("make_mesh", att.parallel.make_mesh),
            ("local_mesh", att.parallel.local_mesh),
            ("shard_along", att.parallel.shard_along),
            ("data_parallel", att.parallel.data_parallel),
            ("shard_map_batch", att.parallel.shard_map_batch),
            ("sequence_parallel_stft", att.parallel.sequence_parallel_stft),
            ("sequence_parallel_istft", att.parallel.sequence_parallel_istft),
        ]),
        ("Export (`acids_transforms_tpu.export`)", [
            ("save_transform", att.export.save_transform),
            ("load_transform", att.export.load_transform),
            ("export_stablehlo", att.export.export_stablehlo),
            ("load_stablehlo", att.export.load_stablehlo),
        ]),
        ("Serving / utils", [
            ("serving.CompiledTransform", att.serving.CompiledTransform),
            ("serving.StreamingSession", att.serving.StreamingSession),
            ("fuse.fuse_forward", att.fuse_forward),
            ("fuse.fuse_fit", att.fuse_fit),
            ("utils.import_data", att.utils.import_data),
            ("utils.load_wav", att.utils.load_wav),
            ("utils.save_wav", att.utils.save_wav),
            ("utils.resample", att.utils.resample),
            ("utils.pad_to_bucket", att.utils.pad_to_bucket),
            ("utils.checked", att.utils.checked),
            ("utils.trace", att.utils.trace),
            ("utils.device_timeit", att.utils.device_timeit),
        ]),
    ]
    for title, items in sections:
        out.write(f"\n## {title}\n\n")
        for name, fn in items:
            out.write(f"- **`{name}`** — {first_para(fn.__doc__)}\n")

    os.makedirs("docs", exist_ok=True)
    with open("docs/API.md", "w") as f:
        f.write(out.getvalue())
    print("wrote docs/API.md", len(out.getvalue()), "bytes")


if __name__ == "__main__":
    main()
