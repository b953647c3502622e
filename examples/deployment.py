"""Deployment: fused dispatch, a bucketed server, and a StableHLO artifact.

The TPU-native equivalent of the reference's TorchScript-for-C++ story
(reference README.md:58-59): fit a chain, serve it with shape-stable
precompiled executables, and export a portable compiled artifact.
"""
import numpy as np
import jax.numpy as jnp

import acids_transforms_tpu as att
from acids_transforms_tpu import transforms as T


def main():
    x, _ = att.utils.import_data(
        "/root/reference/test/source_files/additive.wav", sr=44100
    )
    xb = jnp.asarray(x)[..., :44100].reshape(-1, 44100)  # (channels,) -> batch

    chain = T.STFT(n_fft=1024, hop_length=256) + T.Magnitude(
        mode="unipolar", contrast="log1p", mel=True, n_fft=1024
    )

    # 0. fused fit: the normalization statistics reduce inside the kernel
    #    epilogue on TPU (30M vs 17M frames/s for the cascade) — exact same
    #    result as chain.fit(xb)
    chain = att.fuse_fit(chain)(xb)

    # 1. fused forward: recognized melspec chains dispatch to the fastest
    #    backend — on TPU a single Pallas kernel (+21% over the XLA fusion)
    fused = att.fuse_forward(chain)
    y = fused(xb)
    print("fused forward:", y.shape)

    # 2. bucketed server: at most len(buckets) x len(batch_sizes) executables,
    #    inputs padded to the ladder, outputs trimmed to the true frame count
    server = att.serving.CompiledTransform(
        chain, buckets=(44100, 88200), batch_sizes=(2, 8)
    )
    print("warmed up", server.warmup(), "executables")
    print("served:", server.forward(xb).shape)

    # 3. portable artifact: serialize the fused computation to StableHLO bytes
    #    (batch-polymorphic: one artifact serves any batch size).  Pin the
    #    XLA formulation — the Pallas path embeds a TPU-only custom call,
    #    and exported modules should run on any PJRT host
    fused_portable = att.fuse_forward(chain, backend="xla")
    blob = att.export.export_stablehlo(fused_portable, [xb], polymorphic_batch=True)
    restored = att.export.load_stablehlo(blob)
    y2 = restored(jnp.concatenate([xb, xb]))  # different batch, same artifact
    print("stablehlo artifact:", len(blob), "bytes; restored output", y2.shape)
    print("artifact matches fused:", bool(jnp.allclose(y2[: xb.shape[0]], y, atol=1e-4)))

    # 4. phase-faithful invert for the artifact: the reference's scripted
    #    keep_input capability (hidden phase_buffer, reference
    #    stft.py:134-143) as an explicit (y, phase) -> audio entry —
    #    exportable alongside the forward (see examples/cpp_host for the
    #    C++ host executing both, plus a realtime streaming stage)
    inv = att.export.invert_with_phase_fn(chain)
    phase = jnp.angle(chain[0].forward(xb))
    rec = inv(y, phase)
    print("phase-faithful invert:", rec.shape)


if __name__ == "__main__":
    main()
