"""Context-parallel training demo: a Hyena stack at sequence lengths that
exceed one chip's memory, with the sequence sharded across the mesh.

The reference caps sequence length at what a single device's HBM holds (4M;
its conv is never sequence-sharded — SURVEY.md §5.7). Here the mixer's long
conv runs through `parallel/seq_conv.py`: the four-step FFT's outer DFT
becomes two all_to_alls over the mesh, everything else stays device-local
(DESIGN.md "Sequence-sharded convolution"). The task is byte-level language
modeling on a synthetic-but-structured corpus (repeated motifs with long-range
copies), which gives a loss signal any context length can improve on.

Run (8 virtual CPU devices, tiny):
    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python examples/seq_parallel/train_ultra_long.py --l-max 8192 --steps 5

Run (TPU pod slice): the same flags scale; --l-max 33554432 on 8 chips gives
a 32M-token context (8 x 4M chunks).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax
import jax.numpy as jnp
import numpy as np


def get_args():
    p = argparse.ArgumentParser()
    p.add_argument("--l-max", type=int, default=8192)
    p.add_argument("--d_model", type=int, default=32)
    p.add_argument("--n_layers", type=int, default=2)
    p.add_argument("--batch_size", type=int, default=1)
    p.add_argument("--steps", type=int, default=10)
    p.add_argument("--lr", type=float, default=3e-4)
    p.add_argument("--sp", type=int, default=0, help="sequence-axis size; 0 = all devices")
    p.add_argument("--vocab", type=int, default=64)
    p.add_argument("--seed", type=int, default=0)
    return p.parse_args()


def make_batch(rng, b, l, vocab):
    """Byte sequences with long-range copies: the second half repeats the
    first half's motifs, so a model that can see across the whole context
    predicts it near-perfectly. Returns (x, y) both of length l."""
    motif = rng.integers(1, vocab, size=(b, l // 2 + 1), dtype=np.int32)
    seq = np.concatenate([motif, motif], axis=1)  # length l + 2
    return seq[:, :l], seq[:, 1 : l + 1]


def main():
    args = get_args()
    import flax.linen as nn
    import optax

    from flashfftconv_tpu.models.hyena import HyenaOperator
    from flashfftconv_tpu.parallel.mesh import make_mesh
    from jax.sharding import NamedSharding, PartitionSpec as P

    n_dev = len(jax.devices())
    sp = args.sp or n_dev
    mesh = make_mesh((n_dev // sp, sp), ("dp", "sp"))
    print(f"mesh: {dict(mesh.shape)}, devices: {n_dev}", flush=True)

    # l_max must satisfy the seq-conv tiling: 2*l_max/P a power of two, % P == 0.
    l = args.l_max

    class TinyHyenaLM(nn.Module):
        @nn.compact
        def __call__(self, ids, deterministic: bool = True):
            h = nn.Embed(args.vocab, args.d_model, dtype=jnp.float32)(ids)
            for i in range(args.n_layers):
                z = nn.LayerNorm(name=f"norm_{i}")(h)
                z = HyenaOperator(
                    d_model=args.d_model, l_max=l, order=2, filter_order=16,
                    conv_dtype=jnp.float32, impl="xla",
                    seq_mesh=mesh, seq_axis="sp", name=f"mixer_{i}",
                )(z, deterministic=deterministic)
                h = h + z
            h = nn.LayerNorm(name="norm_f")(h)
            return nn.Dense(args.vocab, dtype=jnp.float32, name="head")(h)

    model = TinyHyenaLM()
    rng = np.random.default_rng(args.seed)
    xb, yb = make_batch(rng, args.batch_size, l, args.vocab)
    seq_sh = NamedSharding(mesh, P("dp", "sp"))
    xb = jax.device_put(jnp.asarray(xb), seq_sh)
    yb = jax.device_put(jnp.asarray(yb), seq_sh)

    params = model.init(jax.random.PRNGKey(args.seed), xb)["params"]
    n_params = sum(p.size for p in jax.tree_util.tree_leaves(params))
    print(f"model: {n_params/1e3:.1f}K params, L={l}", flush=True)
    tx = optax.adamw(args.lr)
    opt_state = tx.init(params)

    def loss_fn(params, x, y):
        logits = model.apply({"params": params}, x)
        ls = optax.softmax_cross_entropy_with_integer_labels(logits, y)
        return ls.mean()

    @jax.jit
    def step(params, opt_state, x, y):
        loss, grads = jax.value_and_grad(loss_fn)(params, x, y)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    with mesh:
        for i in range(args.steps):
            t0 = time.time()
            params, opt_state, loss = step(params, opt_state, xb, yb)
            loss = float(loss)
            print(
                f"step {i}: loss {loss:.4f} ({time.time()-t0:.2f}s, "
                f"{args.batch_size * l / max(time.time()-t0, 1e-9):.0f} tok/s)",
                flush=True,
            )
    print(f"final loss: {loss:.4f}", flush=True)


if __name__ == "__main__":
    main()
