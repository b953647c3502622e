"""Incremental floor measurement for the factored spectral kernel.

Builds the kernel up stage by stage in a standalone pallas_call with the
SAME grid/specs as the shipped kernel, so each increment's true cost on the
v5e is visible (ablations inside the full kernel can be masked by Mosaic
scheduling).  Stages:

  s0_copy      read input block, write zeros            (infra + DMA floor)
  s1_dots      + 2 single-pass bf16 chunk dots          (MXU floor)
  s2_dots3     3-pass bf16x3 dots                       (precision cost)
  s3_combine   + twiddle combine (sign/swap selects)    (VPU combine)
  s4_taps      + P-tap conv (lane rolls + edge fixes)
  s5_mag       + sqrt magnitude
  s6_mel       + bf16x3 mel GEMM
  s7_full      + log1p + affine (== shipped kernel)

Run: JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache python tools/sweep_kernel_floor.py
"""
import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import numpy as np

from bench import HOP, N_FFT, TPU_BATCH, _device_time, _load_audio

N_ITER = 50


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from acids_transforms_tpu.ops.fft import taps_for_window
    from acids_transforms_tpu.ops.mel import square_mel_banks
    from acids_transforms_tpu.ops.pallas import spectral as S
    from acids_transforms_tpu.ops.windows import get_window

    x = _load_audio()
    xb = jnp.asarray(np.broadcast_to(x, (TPU_BATCH, x.shape[-1])).copy())
    w = get_window("hann", N_FFT)
    taps = taps_for_window(np.asarray(w))
    bank = jnp.asarray(square_mel_banks(N_FFT, 44100)[0])

    overlap = N_FFT // HOP
    x_rows, T, tile_t, halo, n_tiles = S._prepare_rows(xb, N_FFT, HOP, True, None)
    B = x_rows.shape[0]
    F, Fp, CC, CS, TWR, TWI = S._factored_weights(N_FFT, HOP)
    depad = Fp == F - 1
    Fp_mag = Fp + S.LANE if depad else Fp
    Mp = S._round_up(bank.shape[1], S.LANE)
    mel_p = jnp.pad(bank, [(0, Fp_mag - bank.shape[0]), (0, Mp - bank.shape[1])])
    cc_hi, cc_lo = S._split_bf16(CC)
    cs_hi, cs_lo = S._split_bf16(CS)
    basis = S._stack_basis(cc_hi, cc_lo, cs_hi, cs_lo)
    mel_hi, mel_lo = S._split_bf16(mel_p)
    # the shipped kernel skips the square bank's zero 128-blocks (banded,
    # exact) — measure that form at s6/s7 and keep the dense GEMM as the
    # final stage for comparison (it is what the pre-r3 kernel paid).  The
    # banded _mel3 reads the [hi; lo; hi]-interleaved operand (_stack_mel).
    mblocks = S.mel_block_structure(np.asarray(mel_p))
    mel_stacked = S._stack_mel(mel_hi, mel_lo)
    aff = jnp.asarray([[0.0, 1.0]], jnp.float32)
    frames = TPU_BATCH * T
    print(f"device={jax.devices()[0]} tile_t={tile_t} n_tiles={n_tiles} grid={B}x{n_tiles}", flush=True)

    def run(stage):
        banded = stage in (6, 7) and mblocks is not None
        melh_op = mel_stacked if banded else mel_hi

        def kernel(x_ref, basis_r, twr, twi, melh, mell, aff_ref, o_ref):
            if stage == 0:
                o_ref[0, :, :] = jnp.zeros_like(o_ref[0]) + x_ref[0][0, 0]
                return
            if stage == 1:
                Cre, Cim, cnyq = S._chunk_dots(x_ref, basis_r, ablate="dots1", nyq=depad)
            else:
                Cre, Cim, cnyq = S._chunk_dots(x_ref, basis_r, nyq=depad)
            if stage <= 2:
                o_ref[0, :, :Fp] = Cre[:tile_t] + Cim[:tile_t]
                if depad:
                    o_ref[0, :, Fp:] = jnp.zeros_like(o_ref[0, :, Fp:])
                return
            use_taps = taps if stage >= 4 else (taps[0],)
            mag = S._combine_taps_mag(
                Cre, Cim, twr, twi, taps=use_taps, overlap=overlap,
                tile_t=tile_t, n_bins=F,
                power=2.0 if stage <= 4 else 1.0, cnyq=cnyq,
            )
            if stage <= 5:
                o_ref[0, :, :] = mag
                return
            mel = S._mel3(mag, melh, mell,
                          mel_blocks=mblocks if banded else None)
            if stage in (6, 8):
                o_ref[0, :, :] = mel
                return
            o_ref[0, :, :] = (jnp.log1p(mel) - aff_ref[0, 0]) / aff_ref[0, 1]

        out_w = Mp if stage >= 6 else Fp_mag

        def fixed(shape):
            return pl.BlockSpec(shape, lambda b, t: (0, 0), memory_space=pltpu.VMEM)

        f = pl.pallas_call(
            kernel,
            grid=(B, n_tiles),
            in_specs=[S._x_spec(tile_t, halo, HOP)]
            + [fixed(basis.shape)]
            + [fixed((TWR.shape[0], Fp))] * 2
            + [fixed(melh_op.shape), fixed((Fp_mag, Mp)),
               pl.BlockSpec((1, 2), lambda b, t: (0, 0), memory_space=pltpu.SMEM)],
            out_specs=pl.BlockSpec((1, tile_t, out_w), lambda b, t: (b, t, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, n_tiles * tile_t, out_w), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary"),
                vmem_limit_bytes=96 * 1024 * 1024,
            ),
        )
        jf = jax.jit(lambda v: f(v, basis, TWR, TWI, melh_op, mel_lo, aff))
        dt = _device_time(jf, x_rows, N_ITER)
        return dt

    names = ["s0_copy", "s1_dots", "s2_dots3", "s3_combine", "s4_taps",
             "s5_mag", "s6_mel_banded", "s7_full", "s8_mel_dense"]
    prev = 0.0
    for i, name in enumerate(names):
        dt = run(i)
        print(f"{name}: {dt*1e3:.3f} ms  (+{(dt-prev)*1e3:.3f})  {frames/dt/1e6:.2f} M frames/s", flush=True)
        prev = dt


if __name__ == "__main__":
    main()
