"""Training integration: fused mel features as a neural front-end.

The reference library's production role is the analysis front-end of
neural audio models (its transforms feed encoder inputs and decoder
targets).  This example shows the TPU-native training recipe end to end:

* the chain is fitted once with the pure ``fit`` API (no mutation),
* ``fuse.fuse_forward(chain, out_dtype=bfloat16)`` provides the feature
  extractor *inside* the jitted train step — on TPU this is the fused
  Pallas kernel with the bf16 store contract (arithmetic stays f32;
  only the final HBM store rounds), on CPU the same call serves the
  XLA-fused formulation, so this script runs anywhere,
* the batch is sharded over a ``"data"`` device mesh
  (``parallel.make_mesh``) and the train step is jitted over it — XLA
  inserts the gradient ``psum`` over ICI; on a single device the same
  code runs unsharded.

The task is a 2-class toy (harmonic tones vs. filtered noise bursts)
so the script finishes in seconds; the structure is the real one.
"""
import numpy as np
import jax
import jax.numpy as jnp
import optax
from flax import linen as nn
from jax.sharding import NamedSharding, PartitionSpec as P

import acids_transforms_tpu as att
from acids_transforms_tpu import fuse
from acids_transforms_tpu import transforms as T

SR = 16000
N_SAMPLES = 8192
BATCH = 32


def make_dataset(rng: np.random.Generator):
    """(BATCH, 2, N_SAMPLES) stereo audio + integer labels."""
    xs, ys = [], []
    t = np.arange(N_SAMPLES) / SR
    for i in range(BATCH):
        if i % 2 == 0:  # harmonic tone stack, random f0
            f0 = rng.uniform(100.0, 400.0)
            sig = sum(
                np.sin(2 * np.pi * f0 * (h + 1) * t + rng.uniform(0, 2 * np.pi))
                / (h + 1)
                for h in range(3)
            )
            ys.append(0)
        else:  # enveloped noise burst
            sig = rng.standard_normal(N_SAMPLES)
            sig = np.convolve(sig, np.ones(8) / 8.0, mode="same")
            sig = sig * np.exp(-t * rng.uniform(1.0, 6.0))
            ys.append(1)
        sig = 0.7 * sig / (np.abs(sig).max() + 1e-9)
        # slightly decorrelated stereo so Mono's mix path does real work
        left = sig
        right = np.roll(sig, rng.integers(0, 16))
        xs.append(np.stack([left, right]))
    return (
        np.asarray(xs, dtype=np.float32),
        np.asarray(ys, dtype=np.int32),
    )


class MelClassifier(nn.Module):
    hidden: int = 64
    n_classes: int = 2

    @nn.compact
    def __call__(self, feats: jnp.ndarray) -> jnp.ndarray:
        # feats: (B, frames, mels) bfloat16 from the fused front-end;
        # first dense layer upcasts (params are f32)
        x = feats.astype(jnp.float32)
        x = nn.Dense(self.hidden)(x)
        x = nn.relu(x)
        x = x.mean(axis=-2)  # pool over frames
        return nn.Dense(self.n_classes)(x)


def main():
    rng = np.random.default_rng(0)
    audio, labels = make_dataset(rng)

    # front-end chain, fitted with the PURE fit API (returns a new chain)
    chain = T.Mono() + T.STFT(n_fft=512, hop_length=128, sr=SR) + T.Magnitude(
        mode="gaussian", contrast="log1p", mel=True, n_fft=512
    )
    chain = chain.fit(jnp.asarray(audio))

    # fused feature extractor with the bf16 training contract: on TPU a
    # single Pallas kernel (bit-identical to .astype(bfloat16) of the f32
    # features), on CPU the XLA-fused formulation — same call either way
    features_fn = fuse.fuse_forward(chain, out_dtype=jnp.bfloat16)

    model = MelClassifier()
    feat_shape = jax.eval_shape(features_fn, jnp.asarray(audio))
    params = model.init(jax.random.key(0), jnp.zeros(feat_shape.shape, feat_shape.dtype))
    tx = optax.adam(3e-3)
    opt_state = tx.init(params)

    # data-parallel mesh: batch sharded over "data"; with one device this
    # is a no-op, with N it is DP over ICI (gradients psum'd by XLA)
    mesh = att.parallel.make_mesh()
    shard = NamedSharding(mesh, P("data"))
    replicated = NamedSharding(mesh, P())
    audio_d = jax.device_put(jnp.asarray(audio), shard)
    labels_d = jax.device_put(jnp.asarray(labels), shard)
    params = jax.device_put(params, replicated)
    opt_state = jax.device_put(opt_state, replicated)

    def loss_fn(p, x, y):
        feats = features_fn(x)  # front-end runs inside the train step
        logits = model.apply(p, feats)
        return optax.softmax_cross_entropy_with_integer_labels(logits, y).mean()

    @jax.jit
    def train_step(p, opt, x, y):
        loss, grads = jax.value_and_grad(loss_fn)(p, x, y)
        updates, opt = tx.update(grads, opt)
        return optax.apply_updates(p, updates), opt, loss

    losses = []
    for step in range(60):
        params, opt_state, loss = train_step(params, opt_state, audio_d, labels_d)
        losses.append(float(loss))
        if step % 15 == 0:
            print(f"step {step:3d}  loss {losses[-1]:.4f}")

    logits = model.apply(params, features_fn(audio_d))
    acc = float((jnp.argmax(logits, -1) == labels_d).mean())
    print(f"final loss {losses[-1]:.4f}  train accuracy {acc:.2f}")
    assert losses[-1] < losses[0] * 0.5, (losses[0], losses[-1])
    assert acc >= 0.9, acc


if __name__ == "__main__":
    main()
