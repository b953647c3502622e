"""Export a fitted mel-spectrogram chain for the standalone C++ PJRT host.

Produces, in the target directory, a multi-stage artifact described by
``stages.txt`` (one line per stage: ``<name> <n_inputs>``).  Per stage
``<name>``:

* ``<name>.stablehlo.mlir`` — the jitted function as a StableHLO module
  (chain parameters frozen as constants, exactly like TorchScript freezing);
* ``<name>.input<i>.bin`` / ``<name>.input<i>_shape.txt`` — float32 inputs;
* ``<name>.expected.bin`` — the Python-side output the host must reproduce.

Stages exported:

* ``melspec`` — the chain forward, audio -> normalized log-mel magnitude;
* ``melspec_pcm`` — the same forward with an int16 PCM input signature
  (``x / 32768`` conversion baked into the module): the host feeds raw
  wire-format PCM, bit-identical to the float stage on the same audio;
* ``invert_keep_input`` — the phase-faithful inverse ``(y, phase) -> audio``
  (export.invert_with_phase_fn): the deploy equivalent of the reference's
  scripted ``phase_buffer`` keep_input inversion (reference
  stft.py:134-143), with the phase as an explicit artifact input;
* ``invert_pghi`` — PHASELESS inversion ``y -> audio`` (one-pass PGHI
  integration): the deploy equivalent of the reference's scripted
  ``invert_without_phase`` modes running inside a C++ host (reference
  stft.py:130-132).

Usage: python export_artifact.py <out_dir>
"""
import os
import sys

import numpy as np

# runnable from any cwd: the package lives two levels up
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))


def _write_stage(out_dir, name, fn, inputs):
    import jax

    mlir_text = jax.jit(fn).lower(*inputs).as_text()
    with open(os.path.join(out_dir, f"{name}.stablehlo.mlir"), "w") as f:
        f.write(mlir_text)
    for i, a in enumerate(inputs):
        arr = np.asarray(a)
        # int16 stays wire-format (the raw-PCM ingest contract); everything
        # else is the float32 artifact convention
        if arr.dtype != np.int16:
            arr = arr.astype(np.float32)
        arr.tofile(os.path.join(out_dir, f"{name}.input{i}.bin"))
        with open(os.path.join(out_dir, f"{name}.input{i}_shape.txt"), "w") as f:
            f.write(" ".join(str(d) for d in arr.shape))
        with open(os.path.join(out_dir, f"{name}.input{i}_dtype.txt"), "w") as f:
            f.write("s16" if arr.dtype == np.int16 else "f32")
    y = np.asarray(fn(*inputs)).astype(np.float32)
    y.tofile(os.path.join(out_dir, f"{name}.expected.bin"))
    return y


def main(out_dir: str) -> None:
    import jax

    # the artifact is compiled by the C++ *CPU* host; produce it on the CPU
    # backend too (the invert stage's eager complex ops are unimplemented on
    # the tunneled TPU, and the MLIR is platform-neutral StableHLO anyway)
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from acids_transforms_tpu import transforms as T
    from acids_transforms_tpu.export import invert_with_phase_fn
    from acids_transforms_tpu.fuse import fuse_forward

    os.makedirs(out_dir, exist_ok=True)
    sr, n_fft, hop = 44100, 1024, 256
    t = np.arange(sr) / sr
    x = sum(np.sin(2 * np.pi * f * t) / (i + 1) for i, f in enumerate([220, 440, 660]))
    x = np.stack([x, 0.5 * x]).astype(np.float32)  # (2, sr)
    xj = jnp.asarray(x)

    chain = (
        T.STFT(n_fft=n_fft, hop_length=hop)
        + T.Magnitude(mode="unipolar", contrast="log1p", mel=True, n_fft=n_fft)
    ).fit(xj)
    # pin the XLA formulation: backend="auto" would bake the TPU Pallas
    # kernel (a tpu_custom_call) into the artifact, which a CPU host
    # cannot execute — exported modules must be portable StableHLO
    fused = fuse_forward(chain, backend="xla")

    y = _write_stage(out_dir, "melspec", fused, [xj])

    # raw PCM ingest: the SAME fused chain traced with an int16 input
    # signature (fuse._from_pcm: x / 32768, the import_data convention) —
    # the C++ host feeds wire-format PCM buffers with no float conversion.
    # Deploy contract check at export time: bit-identical to pre-converting.
    xi = np.clip(np.round(x * 32768.0), -32768, 32767).astype(np.int16)
    y_pcm = _write_stage(out_dir, "melspec_pcm", fused, [jnp.asarray(xi)])
    assert np.array_equal(
        y_pcm,
        np.asarray(fused(jnp.asarray(xi.astype(np.float32) / 32768.0))),
    ), "PCM stage must be bit-identical to the pre-converted float path"

    # phase-faithful invert: the host reproduces the reference's scripted
    # keep_input capability with (y, phase) as explicit artifact inputs
    phase = jnp.angle(chain[0].forward(xj))
    inv = invert_with_phase_fn(chain)
    rec = _write_stage(out_dir, "invert_keep_input", inv, [jnp.asarray(y), phase])

    # phaseless inversion in the deployed artifact: the scripted reference
    # can run its inversion modes inside TorchScript in a C++ host
    # (reference stft.py:130-132, dgt.py:164-166); the StableHLO artifact
    # ships the flagship one-pass PGHI integration (mag -> audio, no phase
    # input).  The whole path is real-arithmetic by library invariant
    # (ops/phase.py:expi), so the module executes correctly on the host's
    # XLA wheel.  (The 30-iteration GL modes export identically but are
    # CHAOTIC — any ulp difference between compilers amplifies past a
    # bitwise gate, tests/test_gl_parity.py — so the artifact pins the
    # deterministic integrator.)
    def inv_pghi(yy):
        return chain.invert(yy, inversion_mode="pghi")

    _write_stage(out_dir, "invert_pghi", inv_pghi, [jnp.asarray(y)])

    # realtime streaming step: the reference's TorchScript-in-C++ realtime
    # loop (reference stft.py:324-352) with the hidden ring buffers made
    # explicit state arguments — the C++ host threads them chunk to chunk
    rt_chain = T.OverlapAdd(n_fft, hop) + T.RealtimeSTFT(
        n_fft=n_fft, hop_length=hop
    )
    chunk_size = 4 * n_fft
    carry = (n_fft // hop - 1) * hop

    def stream_step(in_buf, out_buf, chunk):
        state = [
            {"input_buffer": in_buf, "output_buffer": out_buf},
            {},  # RealtimeSTFT direct roundtrip: mode-minimal empty state
        ]
        state, spec = rt_chain.step(state, chunk)
        state, rec = rt_chain.step_invert(state, spec)
        return rec, state[0]["input_buffer"], state[0]["output_buffer"]

    s0 = jnp.zeros((carry,), jnp.float32)
    s1 = jnp.zeros((carry,), jnp.float32)
    chunk0 = jnp.asarray(x[0, :chunk_size])
    mlir_text = jax.jit(stream_step).lower(s0, s1, chunk0).as_text()
    with open(os.path.join(out_dir, "stream_step.stablehlo.mlir"), "w") as f:
        f.write(mlir_text)
    n_chunks = x.shape[-1] // chunk_size
    chunks = np.asarray(x[0, : n_chunks * chunk_size], np.float32)
    chunks.tofile(os.path.join(out_dir, "stream_step.stream.bin"))
    np.zeros(carry, np.float32).tofile(
        os.path.join(out_dir, "stream_step.input0.bin")
    )
    np.zeros(carry, np.float32).tofile(
        os.path.join(out_dir, "stream_step.input1.bin")
    )
    with open(os.path.join(out_dir, "stream_step.stream_meta.txt"), "w") as f:
        f.write(f"{n_chunks} {chunk_size} {carry} {carry}")
    # expected: the same loop in Python
    st = (s0, s1)
    recs = []
    step_j = jax.jit(stream_step)
    for c in range(n_chunks):
        rec_c, a, b = step_j(
            st[0], st[1], jnp.asarray(chunks[c * chunk_size: (c + 1) * chunk_size])
        )
        st = (a, b)
        recs.append(np.asarray(rec_c, np.float32))
    np.concatenate(recs).tofile(
        os.path.join(out_dir, "stream_step.expected.bin")
    )

    with open(os.path.join(out_dir, "stages.txt"), "w") as f:
        f.write(
            "melspec 1\nmelspec_pcm 1\ninvert_keep_input 2\n"
            "invert_pghi 1\nstream_step 3\n"
        )

    # round-trip quality of the exported pair (mel pseudo-inverse + exact
    # phase): report it so the artifact's contract is visible at export time
    n = min(x.shape[-1], rec.shape[-1])
    err = float(np.abs(rec[..., :n] - x[..., :n]).max())
    print(
        "exported:", out_dir, "input", x.shape, "->", y.shape,
        "| keep_input round-trip max err vs source audio:", round(err, 4),
    )


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "./artifact")
