"""M2-BERT masked-language-model pretraining on TPU.

Port of the reference M2-BERT example (/root/reference/examples/bert/:
create_bert.py + bert_layers.py + configs/m2-110M-flashfftconv.yaml):
Monarch Mixer BERT with bidirectional gated long-conv mixers and
block-diagonal MLPs, trained with the standard 15% MLM objective. Includes
the tokens/ms + seqs/s forward benchmark of benchmark_fwd.py:64-71.

Data: byte-level over a local corpus (default: this repo's source).

Run:  python examples/bert/train.py --steps 30 --d_model 128 --n_layer 2
      python examples/bert/train.py --benchmark
"""

from __future__ import annotations

import argparse
import glob
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax
import jax.numpy as jnp
import numpy as np

MASK_ID = 256
VOCAB = 257  # bytes + [MASK]


def get_args():
    p = argparse.ArgumentParser()
    p.add_argument("--d_model", default=256, type=int)
    p.add_argument("--n_layer", default=4, type=int)
    p.add_argument("--l_max", default=128, type=int)
    p.add_argument("--batch_size", default=32, type=int)
    p.add_argument("--steps", default=100, type=int)
    p.add_argument("--lr", default=8e-4, type=float)
    p.add_argument("--mask-prob", default=0.15, type=float)
    p.add_argument("--benchmark", action="store_true")
    p.add_argument("--impl", default="auto")
    p.add_argument("--seed", default=0, type=int)
    return p.parse_args()


def load_corpus() -> np.ndarray:
    root = os.path.join(os.path.dirname(__file__), "..", "..")
    chunks = []
    for path in sorted(glob.glob(os.path.join(root, "flashfftconv_tpu/**/*.py"),
                                 recursive=True)):
        with open(path, "rb") as f:
            chunks.append(np.frombuffer(f.read(), np.uint8))
    return np.concatenate(chunks).astype(np.int32)


def mlm_batch(tokens, batch_size, seq_len, mask_prob, rng):
    starts = rng.integers(0, len(tokens) - seq_len, batch_size)
    x = np.stack([tokens[s : s + seq_len] for s in starts])
    labels = x.copy()
    mask = rng.random(x.shape) < mask_prob
    x = np.where(mask, MASK_ID, x)
    labels = np.where(mask, labels, -100)  # ignore index
    return x, labels


def main():
    args = get_args()
    import optax

    from flashfftconv_tpu.models.bert import M2BertForMaskedLM
    from flashfftconv_tpu.utils.metrics import accuracy  # noqa: F401
    from flashfftconv_tpu.utils.train import TrainState, create_train_state

    model = M2BertForMaskedLM(
        vocab_size=VOCAB,
        d_model=args.d_model,
        n_layer=args.n_layer,
        d_inner=4 * args.d_model,
        l_max=args.l_max,
        impl=args.impl,
    )
    rng = jax.random.PRNGKey(args.seed)
    ids = jnp.zeros((args.batch_size, args.l_max), jnp.int32)
    params = model.init(rng, ids)["params"]
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(params))
    print(f"M2-BERT: {n_params/1e6:.2f}M params", flush=True)

    if args.benchmark:
        fwd = jax.jit(lambda p, x: model.apply({"params": p}, x, deterministic=True))
        out = fwd(params, ids)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(10):
            out = fwd(params, ids)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / 10
        toks = args.batch_size * args.l_max
        print(f"fwd: {dt*1e3:.2f} ms | {toks/dt/1e3:.1f} tokens/ms | "
              f"{args.batch_size/dt:.1f} seqs/s", flush=True)
        return

    corpus = load_corpus()
    tx = optax.chain(optax.clip_by_global_norm(1.0),
                     optax.adamw(args.lr, weight_decay=1e-5))
    state = create_train_state(params, tx)

    def step_fn(state, x, labels, rng):
        def loss_fn(p):
            logits = model.apply(
                {"params": p}, x, deterministic=False,
                rngs={"dropout": jax.random.fold_in(rng, state.step)},
            )
            # MLM loss over masked positions only (ignore index -100)
            m = (labels >= 0).astype(jnp.float32)
            logp = jax.nn.log_softmax(logits.astype(jnp.float32))
            nll = -jnp.take_along_axis(logp, jnp.maximum(labels, 0)[..., None], -1)[..., 0]
            loss = (nll * m).sum() / jnp.maximum(m.sum(), 1.0)
            acc = ((logits.argmax(-1) == labels).astype(jnp.float32) * m).sum() / jnp.maximum(m.sum(), 1.0)
            return loss, acc

        (loss, acc), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params_ = optax.apply_updates(state.params, updates)
        return TrainState(state.step + 1, params_, opt_state), loss, acc

    jit_step = jax.jit(step_fn)
    data_rng = np.random.default_rng(args.seed)
    for step in range(args.steps):
        x, labels = mlm_batch(corpus, args.batch_size, args.l_max,
                              args.mask_prob, data_rng)
        state, loss, acc = jit_step(state, jnp.asarray(x), jnp.asarray(labels), rng)
        if step % 10 == 0 or step == args.steps - 1:
            print(f"step {step}: mlm loss {float(loss):.3f} acc {float(acc)*100:.1f}%",
                  flush=True)


if __name__ == "__main__":
    main()
