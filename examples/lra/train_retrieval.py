"""LRA Retrieval-protocol task with the SequenceModel harness — generated
offline.

LRA Retrieval (AAN; Tay et al. 2021) classifies whether two long byte-level
documents are related, with each document encoded INDEPENDENTLY (a two-tower
protocol) and the pooled features compared by a small classifier over
[u, v, u-v, u*v]. The real AAN corpus cannot be fetched here (zero egress),
so this example keeps the exact protocol on generated documents: each
"article" is a sequence from a random Markov chain over a byte-sized vocab;
a positive pair is two independent noisy copies (token substitutions at rate
--noise) of the SAME article, a negative pair is noisy copies of two
DIFFERENT articles. Both classes have identical marginal statistics — the
label is carried only by cross-document content overlap, which is what the
retrieval protocol tests. Random is 50%.

This drives the dual-tower pieces of the harness end-to-end: SequenceModel
with an embedding encoder, the stacked (2B, L, D) batch convention, and
`RetrievalDecoder` (models/sequence.py; reference
src/tasks/decoders.py:179-250).

Run:  python examples/lra/train_retrieval.py --epochs 10 \
          --log-file benchmarks/retrieval_v5e.jsonl
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

VOCAB = 64


def _markov_chain(rng):
    """Row-stochastic transition matrix with sparse support (article style)."""
    trans = rng.dirichlet(np.full(VOCAB, 0.05), size=VOCAB)
    return trans.astype(np.float64)


def _sample_seq(rng, trans, l):
    seq = np.empty(l, np.int32)
    s = int(rng.integers(VOCAB))
    for i in range(l):
        seq[i] = s
        s = int(rng.choice(VOCAB, p=trans[s]))
    return seq


def _noisy(rng, seq, rate):
    out = seq.copy()
    mask = rng.random(len(seq)) < rate
    out[mask] = rng.integers(0, VOCAB, mask.sum())
    return out


def build_dataset(n_pairs: int, l: int, seed: int, noise: float = 0.3,
                  n_chains: int = 8):
    """Returns (x1, x2, y): two (n, l) docs per pair and a 0/1 label.
    All articles in one batch of chains share the chain pool, so negatives
    can come from the same chain (hard negatives) or different chains."""
    rng = np.random.default_rng(seed)
    chains = [_markov_chain(rng) for _ in range(n_chains)]
    x1 = np.empty((n_pairs, l), np.int32)
    x2 = np.empty((n_pairs, l), np.int32)
    y = np.empty((n_pairs,), np.int32)
    for i in range(n_pairs):
        label = i % 2
        c = chains[int(rng.integers(n_chains))]
        src = _sample_seq(rng, c, l)
        if label:
            a, b = _noisy(rng, src, noise), _noisy(rng, src, noise)
        else:
            # hard negative: an independent article from the SAME chain
            other = _sample_seq(rng, c, l)
            a, b = _noisy(rng, src, noise), _noisy(rng, other, noise)
        x1[i], x2[i], y[i] = a, b, label
    perm = rng.permutation(n_pairs)
    return x1[perm], x2[perm], y[perm]


def get_args():
    p = argparse.ArgumentParser()
    p.add_argument("--lr", default=2e-3, type=float)
    p.add_argument("--weight_decay", default=0.05, type=float)
    p.add_argument("--epochs", default=10, type=int)
    p.add_argument("--batch_size", default=32, type=int)
    p.add_argument("--n_layers", default=4, type=int)
    p.add_argument("--d_model", default=96, type=int)
    p.add_argument("--dropout", default=0.1, type=float)
    p.add_argument("--seed", default=0, type=int)
    p.add_argument("--warmup-steps", default=500, type=int)
    p.add_argument("--noise", default=0.3, type=float)
    p.add_argument("--n-train", default=8000, type=int)
    p.add_argument("--n-val", default=1000, type=int)
    p.add_argument("--l-max", default=1024, type=int)
    p.add_argument("--data-cache", default="examples/lra/data/retrieval.npz")
    p.add_argument("--ckpt-dir", default="./checkpoint/retrieval")
    p.add_argument("--log-file", default="")
    return p.parse_args()


def main():
    args = get_args()
    import optax

    from flashfftconv_tpu.models.sequence import SequenceModel
    from flashfftconv_tpu.utils.logging import MetricLogger
    from flashfftconv_tpu.utils.tasks import get_task
    from flashfftconv_tpu.utils.train import (
        auto_save_on_exception,
        create_train_state,
        evaluate,
        save_checkpoint,
    )

    if os.path.exists(args.data_cache):
        z = np.load(args.data_cache)
        x1, x2, y = z["x1"], z["x2"], z["y"]
    else:
        t0 = time.time()
        x1, x2, y = build_dataset(args.n_train + args.n_val, args.l_max,
                                  args.seed, noise=args.noise)
        os.makedirs(os.path.dirname(args.data_cache) or ".", exist_ok=True)
        np.savez_compressed(args.data_cache, x1=x1, x2=x2, y=y)
        print(f"generated {len(y)} pairs in {time.time()-t0:.0f}s", flush=True)
    tr = slice(0, args.n_train)
    va = slice(args.n_train, args.n_train + args.n_val)
    steps_per_epoch = args.n_train // args.batch_size
    print(f"train {x1[tr].shape} x2, val {x1[va].shape}, "
          f"{steps_per_epoch} steps/epoch", flush=True)

    model = SequenceModel(
        d_model=args.d_model,
        n_layers=args.n_layers,
        layer={"mixer": "long-conv",
               "mixer_kwargs": {"l_max": args.l_max, "lam": 0.001}},
        encoder="embedding",
        decoder={"_name_": "retrieval", "n_classes": 2, "mode": "mean"},
        n_tokens=VOCAB,
        l_max=args.l_max,
        dropout=args.dropout,
        dtype=jnp.bfloat16,
    )
    task = get_task("classification")
    rng = jax.random.PRNGKey(args.seed)
    dummy = jnp.zeros((4, args.l_max), jnp.int32)  # stacked 2B=4
    params = model.init(rng, dummy)["params"]
    n_params = sum(p.size for p in jax.tree_util.tree_leaves(params))
    print(f"model: {n_params/1e6:.2f}M params", flush=True)

    total = args.epochs * steps_per_epoch
    if args.warmup_steps:
        sched = optax.warmup_cosine_decay_schedule(
            0.0, args.lr, args.warmup_steps, max(total, args.warmup_steps + 1))
    else:
        sched = optax.cosine_decay_schedule(args.lr, total)
    tx = optax.adamw(sched, weight_decay=args.weight_decay)
    state = create_train_state(params, tx)

    @jax.jit
    def train_step(state, batch, rng):
        from flashfftconv_tpu.utils.train import TrainState

        a, b, labels = batch
        x = jnp.concatenate([a, b], axis=0)  # (2B, L) two-tower stacking
        step_rng = jax.random.fold_in(rng, state.step)

        def loss_fn(p):
            logits = model.apply(
                {"params": p}, x, deterministic=False,
                rngs={"dropout": step_rng})
            return task.loss(logits, labels), logits

        (loss, logits), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        state = TrainState(step=state.step + 1, params=params,
                           opt_state=opt_state)
        return state, {"loss": loss, "acc": task.metrics["acc"](logits, labels)}

    @jax.jit
    def eval_step(params, batch):
        # (a, b, labels) or (a, b, labels, w) — w masks padded rows
        # (utils.train.evaluate pads the final partial batch).
        a, b, labels, *rest = batch
        w = rest[0].astype(jnp.float32) if rest else jnp.ones(
            labels.shape[0], jnp.float32)
        logits = model.apply({"params": params},
                             jnp.concatenate([a, b], axis=0))
        pred = jnp.argmax(logits, -1)
        return {"correct": ((pred == labels).astype(jnp.float32) * w).sum(),
                "total": w.sum()}

    data_rng = np.random.default_rng(args.seed)
    logger = MetricLogger(args.log_file) if args.log_file else None
    best_acc = 0.0
    guard = auto_save_on_exception(os.path.dirname(os.path.abspath(args.ckpt_dir)))
    with guard:
        for epoch in range(args.epochs):
            t0 = time.time()
            perm = data_rng.permutation(args.n_train)
            tot_loss = tot_acc = 0.0
            for i in range(steps_per_epoch):
                idx = perm[i * args.batch_size : (i + 1) * args.batch_size]
                batch = (jnp.asarray(x1[tr][idx]), jnp.asarray(x2[tr][idx]),
                         jnp.asarray(y[tr][idx]))
                state, m = train_step(state, batch, rng)
                tot_loss += float(m["loss"])
                tot_acc += float(m["acc"])
            guard.track(state, extra={"epoch": epoch, "acc": best_acc})

            correct, total = evaluate(
                eval_step, state.params, (x1[va], x2[va], y[va]),
                args.batch_size,
            )
            acc = 100.0 * correct / total
            epoch_s = time.time() - t0
            print(f"epoch {epoch}: train loss {tot_loss/steps_per_epoch:.3f} "
                  f"acc {100*tot_acc/steps_per_epoch:.2f}% | val acc {acc:.2f}% "
                  f"| {epoch_s:.1f}s", flush=True)
            if logger:
                logger.log({"epoch": epoch,
                            "train_loss": tot_loss / steps_per_epoch,
                            "train_acc": 100 * tot_acc / steps_per_epoch,
                            "val_acc": acc, "epoch_s": epoch_s}, step=epoch)
            if acc > best_acc:
                best_acc = acc
                save_checkpoint(os.path.abspath(args.ckpt_dir), state,
                                {"epoch": epoch, "acc": acc})
    print(f"best val acc: {best_acc:.2f}%", flush=True)


if __name__ == "__main__":
    main()
