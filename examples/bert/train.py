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


# base-110M mirrors /root/reference/examples/bert/configs/m2-110M-flashfftconv.yaml:
# 12 layers, hidden 768, max_seq_len 128, batch_size 128, dense MLP
# (use_monarch_mlp: False), GLU off. vocab_size 30522 = bert-base-uncased's
# tokenizer (the data here is bytes, so ids stay < 257, but the embedding
# table and MLM-decoder matmul match the reference's 110M param count).
PRESETS = {
    "base-110M": dict(d_model=768, n_layer=12, l_max=128, batch_size=128,
                      mlp_nblocks=0, vocab_size=30522, tie_mlm_head=True),
}


def get_args():
    p = argparse.ArgumentParser()
    p.add_argument("--preset", default="", choices=[""] + list(PRESETS))
    p.add_argument("--d_model", default=256, type=int)
    p.add_argument("--n_layer", default=4, type=int)
    p.add_argument("--l_max", default=128, type=int)
    p.add_argument("--batch_size", default=32, type=int)
    p.add_argument("--mlp-nblocks", dest="mlp_nblocks", default=4, type=int,
                   help="0 = dense MLP (the 110M config); >0 = BlockdiagLinear")
    p.add_argument("--steps", default=100, type=int)
    p.add_argument("--lr", default=8e-4, type=float)
    p.add_argument("--mask-prob", default=0.15, type=float)
    p.add_argument("--benchmark", action="store_true")
    p.add_argument("--impl", default="auto")
    p.add_argument("--vocab-size", dest="vocab_size", default=VOCAB, type=int)
    p.add_argument("--tie-mlm-head", dest="tie_mlm_head", action="store_true",
                   help="tie MLM decoder to word embeddings (ref bert_layers.py:566)")
    p.add_argument("--log-file", default="", help="JSONL metrics artifact path")
    p.add_argument("--time-steps", action="store_true",
                   help="report per-step wall time (post-compile)")
    p.add_argument("--seed", default=0, type=int)
    args = p.parse_args()
    if args.preset:
        # preset fills fields the user left at their defaults; explicit CLI
        # flags win (e.g. --preset hyena-125M --batch_size 2 on a 16 GB chip)
        for k, v in PRESETS[args.preset].items():
            if getattr(args, k) == p.get_default(k):
                setattr(args, k, v)
    return args


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
    from flashfftconv_tpu.utils.benchmarking import benchmark_forward, benchmark_memory
    from flashfftconv_tpu.utils.logging import MetricLogger
    from flashfftconv_tpu.utils.metrics import accuracy  # noqa: F401
    from flashfftconv_tpu.utils.train import TrainState, create_train_state

    model = M2BertForMaskedLM(
        vocab_size=args.vocab_size,
        d_model=args.d_model,
        n_layer=args.n_layer,
        d_inner=4 * args.d_model,
        l_max=args.l_max,
        mlp_nblocks=args.mlp_nblocks,
        tie_mlm_head=args.tie_mlm_head,
        impl=args.impl,
    )
    rng = jax.random.PRNGKey(args.seed)
    ids = jnp.zeros((args.batch_size, args.l_max), jnp.int32)
    params = jax.jit(model.init)(rng, ids)["params"]
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(params))
    print(f"M2-BERT: {n_params/1e6:.2f}M params", flush=True)
    logger = MetricLogger(args.log_file) if args.log_file else None
    config = dict(preset=args.preset or "custom", vocab_size=args.vocab_size,
                  d_model=args.d_model,
                  n_layer=args.n_layer, l_max=args.l_max, B=args.batch_size,
                  mlp_nblocks=args.mlp_nblocks, n_params=int(n_params),
                  impl=args.impl)

    if args.benchmark:
        fwd = jax.jit(lambda p, x: model.apply({"params": p}, x, deterministic=True))
        t_compile = time.perf_counter()
        mem_mb = benchmark_memory(fwd, params, ids)
        t_compile = time.perf_counter() - t_compile
        ms = benchmark_forward(fwd, params, ids, repeats=10)
        toks = args.batch_size * args.l_max
        print(f"fwd: {ms:.2f} ms | {toks/ms:.1f} tokens/ms | "
              f"{args.batch_size/(ms/1e3):.1f} seqs/s | peak {mem_mb:.0f} MB | "
              f"compile {t_compile:.1f} s", flush=True)
        if logger:
            logger.log({**config, "mode": "fwd_benchmark", "fwd_ms": ms,
                        "tokens_per_ms": toks / ms,
                        "seqs_per_s": args.batch_size / (ms / 1e3),
                        "peak_mem_mb": mem_mb, "compile_s": t_compile})
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
    if args.time_steps:
        x0, l0 = mlm_batch(corpus, args.batch_size, args.l_max,
                           args.mask_prob, data_rng)
        mem_mb = benchmark_memory(jit_step, state, jnp.asarray(x0),
                                  jnp.asarray(l0), rng)
        print(f"train-step peak memory: {mem_mb:.0f} MB", flush=True)
    toks = args.batch_size * args.l_max
    t_prev = time.perf_counter()
    for step in range(args.steps):
        x, labels = mlm_batch(corpus, args.batch_size, args.l_max,
                              args.mask_prob, data_rng)
        state, loss, acc = jit_step(state, jnp.asarray(x), jnp.asarray(labels), rng)
        loss, acc = float(loss), float(acc)  # scalar readback = step sync
        dt = time.perf_counter() - t_prev
        t_prev = time.perf_counter()
        if step % 10 == 0 or step == args.steps - 1 or args.time_steps:
            print(f"step {step}: mlm loss {loss:.3f} acc {acc*100:.1f}% "
                  f"{dt:.2f} s/step {toks/dt:.0f} tokens/s", flush=True)
        if logger:
            rec = {"mlm_loss": loss, "mlm_acc": acc, "step_s": dt,
                   "tokens_per_s": toks / dt}
            if step == 0:
                rec.update(config, mode="train", compile_step_s=dt)
            logger.log(rec, step=step)


if __name__ == "__main__":
    main()
