"""HyenaDNA: genomics language modeling at long sequence lengths on TPU.

Port of the reference HyenaDNA example
(/root/reference/examples/hyena-dna/hyenadna_flashfftconv.py: LMBackbone over
HyenaOperator mixers with a shared FlashFFTConv at
next_power_of_2(l_max) * 2, lines 688-721). Character-level DNA tokenization
(A/C/G/T/N), synthetic genome with planted motifs when no FASTA is given
(zero-egress environment; pass --fasta for real data), forward-throughput
benchmark mode matching benchmark_flash_dna_fwd.py's tokens/ms metric.

Run:  python examples/hyena_dna/train.py --l_max 16384 --steps 20
      python examples/hyena_dna/train.py --benchmark --l_max 65536
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

DNA_VOCAB = {c: i for i, c in enumerate("ACGTN")}


# Reference model configs (hyenadna_flashfftconv.py / huggingface.py:141 —
# "the 1M long sequence model (8 layers, d_model=256)"). The reference
# benchmarks 'hyenadna-large-1m-seqlen' with B=4 fp16 on 80 GB A100s
# (benchmark_flash_dna_fwd.py:18-19); the v5e has 16 GB, so default B=1.
MODEL_CONFIGS = {
    "tiny-1k": dict(d_model=128, n_layer=2, l_max=1024),
    "tiny-16k-d128": dict(d_model=128, n_layer=2, l_max=16384),
    "small-32k": dict(d_model=256, n_layer=4, l_max=32768),
    "medium-160k": dict(d_model=256, n_layer=8, l_max=160_000),
    "medium-450k": dict(d_model=256, n_layer=8, l_max=450_000),
    "large-1m": dict(d_model=256, n_layer=8, l_max=1_048_576),
}


def get_args():
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="", choices=[""] + list(MODEL_CONFIGS),
                   help="reference config preset; overrides d_model/n_layer/l_max")
    p.add_argument("--d_model", default=128, type=int)
    p.add_argument("--n_layer", default=2, type=int)
    p.add_argument("--l_max", default=16384, type=int)
    p.add_argument("--batch_size", default=1, type=int)
    p.add_argument("--steps", default=20, type=int)
    p.add_argument("--lr", default=6e-4, type=float)
    p.add_argument("--fasta", default="", help="path to a FASTA file")
    p.add_argument("--benchmark", action="store_true", help="fwd-only tokens/ms")
    p.add_argument("--impl", default="auto")
    p.add_argument("--remat", action="store_true",
                   help="gradient checkpointing per block (for 1M training)")
    p.add_argument("--scan-blocks", action="store_true",
                   help="lax.scan over blocks (stacked params): with --remat, "
                   "bounds backward memory to one block at a time — required "
                   "for the 1M train step on a 16 GB chip")
    p.add_argument("--conv-h-chunks", default=0, type=int,
                   help="split the long conv into N sequential channel "
                   "blocks (exact; bounds the backward's dk_f accumulator "
                   "memory — use 4 for the 1M train step)")
    p.add_argument("--proj-l-chunks", default=0, type=int,
                   help="L-chunked in_proj/short-filter/out_proj in the "
                   "mixer (exact; use 8 for the 1M train step)")
    p.add_argument("--mlp-l-chunks", default=0, type=int,
                   help="L-chunked MLP (exact; bounds the 2 GB fc1 temp "
                   "at 1M — use 8)")
    p.add_argument("--short-filter-impl", default="",
                   help="'shifts' = K fused padded-slice multiply-adds "
                   "(dense layouts at B=1 — the XLA conv backward pads "
                   "(1,D,L) temps 2x at 1M); 'pallas' pins the Pallas "
                   "kernels")
    p.add_argument("--bf16-filter", action="store_true",
                   help="cast the implicit filter's output (and cotangent) "
                   "to bf16 before the conv (~3 GB of f32 k/dk temps at 1M; "
                   "the kernel spectrum is recomputed from it in f32 either "
                   "way)")
    p.add_argument("--bf16-filter-mlp", action="store_true",
                   help="run the implicit filter MLP in bf16 (params stay "
                   "f32): pointwise in L, so each f32 activation is a "
                   "256 MB backward temp at 1M (x3 layers)")
    p.add_argument("--inner-remat", action="store_true",
                   help="remat the mixer and MLP as separate regions inside "
                   "each block (peak = max of the two backward working sets "
                   "instead of their union; one extra forward recompute)")
    p.add_argument("--bf16-residual", action="store_true",
                   help="carry the residual stream in bf16 instead of f32 "
                   "(halves the per-block residual/cotangent memory at 1M; "
                   "the reference's residual_in_fp32 also defaults off)")
    p.add_argument("--bf16-ln-f", action="store_true",
                   help="bf16 final layer norm: the f32 cast of the (B,L,D) "
                   "stream plus its cotangent is 2 GB at 1M, feeding a head "
                   "that casts back to bf16 anyway")
    p.add_argument("--no-lhs", action="store_true",
                   help="disable XLA's latency-hiding scheduler for the "
                   "train step (memory-minimizing schedule: cuts peak by "
                   "GBs on a barely-fitting 1M step, at some overlap cost)")
    p.add_argument("--log-file", default="", help="JSONL metrics artifact path")
    p.add_argument("--time-steps", action="store_true",
                   help="report per-step wall time (post-compile) when training")
    p.add_argument("--seed", default=0, type=int)
    args = p.parse_args()
    if args.model:
        # preset fills fields left at defaults; explicit CLI flags win
        for k, v in MODEL_CONFIGS[args.model].items():
            if getattr(args, k) == p.get_default(k):
                setattr(args, k, v)
    return args


def load_genome(args) -> np.ndarray:
    if args.fasta and os.path.exists(args.fasta):
        seq = []
        with open(args.fasta) as f:
            for line in f:
                if not line.startswith(">"):
                    seq.append(line.strip().upper())
        s = "".join(seq)
        return np.asarray([DNA_VOCAB.get(c, 4) for c in s], np.int32)
    rng = np.random.default_rng(args.seed)
    # Synthetic genome: random ACGT with planted repeated motifs so the LM
    # has learnable long-range structure.
    n = 2_000_000
    g = rng.integers(0, 4, n).astype(np.int32)
    motif = rng.integers(0, 4, 64).astype(np.int32)
    for start in rng.integers(0, n - 64, 2000):
        g[start : start + 64] = motif
    return g


def main():
    args = get_args()
    import optax

    from flashfftconv_tpu.models.lm import ConvLMHeadModel
    from flashfftconv_tpu.utils.benchmarking import benchmark_forward, benchmark_memory
    from flashfftconv_tpu.utils.data import lm_batches
    from flashfftconv_tpu.utils.logging import MetricLogger
    from flashfftconv_tpu.utils.metrics import cross_entropy
    from flashfftconv_tpu.utils.train import TrainState, create_train_state

    genome = load_genome(args)
    print(f"genome: {len(genome):,} bases", flush=True)

    model = ConvLMHeadModel(
        d_model=args.d_model,
        n_layer=args.n_layer,
        d_inner=4 * args.d_model,
        vocab_size=len(DNA_VOCAB),
        l_max=args.l_max,
        mixer="hyena",
        mixer_kwargs={"impl": args.impl,
                      "filter_args": {
                          "emb_dim": 5,
                          **({"mlp_dtype": jnp.bfloat16}
                             if args.bf16_filter_mlp else {})},
                      "conv_h_chunks": args.conv_h_chunks,
                      "proj_l_chunks": args.proj_l_chunks,
                      "short_filter_impl": args.short_filter_impl or None,
                      "filter_output_dtype":
                          jnp.bfloat16 if args.bf16_filter else None},
        remat=args.remat,
        scan_blocks=args.scan_blocks,
        mlp_l_chunks=args.mlp_l_chunks,
        residual_f32=not args.bf16_residual,
        inner_remat=args.inner_remat,
        ln_f_f32=not args.bf16_ln_f,
        dtype=jnp.bfloat16,
        pad_vocab_size_multiple=8,
    )
    rng = jax.random.PRNGKey(args.seed)
    ids = jnp.zeros((args.batch_size, args.l_max), jnp.int32)
    params = jax.jit(model.init)(rng, ids)["params"]
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(params))
    print(f"model: {n_params/1e6:.2f}M params @ L={args.l_max}", flush=True)
    logger = MetricLogger(args.log_file) if args.log_file else None
    config = dict(model=args.model or "custom", d_model=args.d_model,
                  n_layer=args.n_layer, l_max=args.l_max, B=args.batch_size,
                  n_params=int(n_params), impl=args.impl, remat=args.remat)

    if args.benchmark:
        fwd = jax.jit(lambda p, x: model.apply({"params": p}, x, deterministic=True))
        t_compile = time.perf_counter()
        mem_mb = benchmark_memory(fwd, params, ids)
        t_compile = time.perf_counter() - t_compile
        # benchmark_forward syncs via scalar readback (the axon relay can
        # no-op block_until_ready; see utils/benchmarking._sync).
        ms = benchmark_forward(fwd, params, ids, repeats=10)
        toks = args.batch_size * args.l_max
        # tokens/ms + seqs/s, the reference's printed metrics
        # (benchmark_flash_dna_fwd.py:55-58).
        print(f"fwd: {ms:.2f} ms | {toks/ms:.1f} tokens/ms | "
              f"{args.batch_size/(ms/1e3):.2f} seqs/s | peak {mem_mb:.0f} MB | "
              f"compile {t_compile:.1f} s", flush=True)
        if logger:
            logger.log({**config, "mode": "fwd_benchmark",
                        "fwd_ms": ms, "tokens_per_ms": toks / ms,
                        "seqs_per_s": args.batch_size / (ms / 1e3),
                        "peak_mem_mb": mem_mb, "compile_s": t_compile})
        return

    tx = optax.chain(
        optax.clip_by_global_norm(1.0),
        optax.adamw(args.lr, weight_decay=0.1),
    )
    state = create_train_state(params, tx)

    def step_fn(state, x, y):
        def loss_fn(p):
            logits = model.apply({"params": p}, x, deterministic=True)
            return cross_entropy(logits, y)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(state.step + 1, params, opt_state), loss

    jit_step = jax.jit(step_fn)
    if args.no_lhs:
        # AOT-compile with the memory-minimizing schedule (same pattern as
        # benchmarks/tpu_hdna_mem_probe.py); the compiled object is then
        # called with the same arg structure every step.
        jit_step = jit_step.lower(
            state, ids, jnp.zeros_like(ids)
        ).compile(compiler_options={
            "xla_tpu_enable_latency_hiding_scheduler": "false"})
    batches = lm_batches(genome, args.batch_size, args.l_max,
                         np.random.default_rng(args.seed))
    if args.time_steps:
        if args.no_lhs:
            a = jit_step.memory_analysis()
            mem_mb = (a.temp_size_in_bytes + a.output_size_in_bytes
                      + a.argument_size_in_bytes) / 2**20
        else:
            x0, y0 = next(batches)
            mem_mb = benchmark_memory(jit_step, state,
                                      jnp.asarray(x0), jnp.asarray(y0))
        print(f"train-step peak memory: {mem_mb:.0f} MB", flush=True)
    toks = args.batch_size * args.l_max
    t_prev = time.perf_counter()
    for step in range(args.steps):
        x, y = next(batches)
        state, loss = jit_step(state, jnp.asarray(x), jnp.asarray(y))
        loss = float(loss)  # scalar readback = step sync
        dt = time.perf_counter() - t_prev
        t_prev = time.perf_counter()
        if step % 5 == 0 or step == args.steps - 1 or args.time_steps:
            print(f"step {step}: loss {loss:.4f} "
                  f"(bits/base {loss/np.log(2):.3f}) "
                  f"{dt:.2f} s/step {toks/dt:.0f} tokens/s", flush=True)
        if logger:
            rec = {"loss": loss, "bits_per_base": loss / np.log(2),
                   "step_s": dt, "tokens_per_s": toks / dt}
            if step == 0:
                rec.update(config, mode="train", compile_step_s=dt)
            logger.log(rec, step=step)


if __name__ == "__main__":
    main()
