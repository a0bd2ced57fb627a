"""Causal LM training (Hyena / H3 / M2 mixers) on TPU with data parallelism.

The TPU equivalent of the reference's Hydra+Lightning LM harness
(/root/reference/examples/hyena/: ConvLMHeadModel + DDP/ZeRO training,
SURVEY.md §2.6/§3.5): registry-style model selection, optax AdamW with
cosine schedule + grad clipping, data-parallel batch sharding over a Mesh
(GSPMD inserts the gradient psum — the DDP analog; sharded optimizer state =
the ZeRO-1 analog), fault-tolerant data order, JSONL metrics, orbax
checkpoint/resume, and a generation sample at the end.

Data: byte-level LM over a local text corpus (--data any text file; defaults
to this repository's own source code — no network needed).

Run:  python examples/lm/train.py --steps 50 --mixer hyena --d_model 128
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
import optax


# hyena-125M mirrors the reference's 125M-class Hyena LM
# (examples/hyena/src/models/sequence/long_conv_lm.py:146-301: GPT-Neo-125M
# geometry — 12 layers, d_model 768, d_inner 3072, vocab 50257). Data here is
# bytes (ids < 256) but the embedding/LM-head are sized at the GPT-2 vocab so
# the parameter count and head matmul match the reference scale.
PRESETS = {
    "hyena-125M": dict(mixer="hyena", d_model=768, n_layer=12, l_max=8192,
                       batch_size=4, vocab_size=50257),
}


def get_args():
    p = argparse.ArgumentParser()
    p.add_argument("--config", default="", help="yaml config (registry _name_ keys)")
    p.add_argument("--preset", default="", choices=[""] + list(PRESETS))
    p.add_argument("--mixer", default="hyena", choices=["hyena", "h3", "m2", "mha"])
    p.add_argument("--d_model", default=256, type=int)
    p.add_argument("--n_layer", default=4, type=int)
    p.add_argument("--l_max", default=1024, type=int)
    p.add_argument("--batch_size", default=8, type=int)
    p.add_argument("--steps", default=200, type=int)
    p.add_argument("--lr", default=3e-4, type=float)
    p.add_argument("--weight_decay", default=0.1, type=float)
    p.add_argument("--warmup", default=20, type=int)
    p.add_argument("--clip", default=1.0, type=float)
    p.add_argument("--seed", default=0, type=int)
    p.add_argument(
        "--data",
        default="",
        help="text/token file, or 'pystdlib' for the real Python-stdlib source "
        "corpus (~15 MB, assembled locally); default: repo source",
    )
    p.add_argument("--ckpt-dir", default="")
    p.add_argument("--resume", action="store_true")
    p.add_argument("--log-every", default=10, type=int)
    p.add_argument("--eval-every", default=0, type=int, help="val bits/byte cadence")
    p.add_argument("--run-name", default="")
    p.add_argument("--impl", default="auto")
    p.add_argument("--vocab-size", dest="vocab_size", default=256, type=int)
    p.add_argument("--remat", action="store_true",
                   help="gradient checkpointing per block")
    p.add_argument("--log-file", default="",
                   help="exact JSONL artifact path (default ./logs/<run>.jsonl)")
    p.add_argument("--time-steps", action="store_true",
                   help="print per-step wall time + train-step peak memory")
    args = p.parse_args()
    if args.preset:
        # preset fills fields the user left at their defaults; explicit CLI
        # flags win (e.g. --preset hyena-125M --batch_size 2 on a 16 GB chip)
        for k, v in PRESETS[args.preset].items():
            if getattr(args, k) == p.get_default(k):
                setattr(args, k, v)
    if args.config:
        import yaml

        cfg = yaml.safe_load(open(args.config))
        cli = {a.replace("-", "_") for a in sys.argv[1:] if a.startswith("--")}
        for key, val in cfg.items():
            attr = key.replace("-", "_")
            if hasattr(args, attr) and f"--{key}" not in {a.split("=")[0] for a in sys.argv}:
                setattr(args, attr, val)
        args.model_cfg = cfg.get("model")
    else:
        args.model_cfg = None
    return args


def build_pystdlib_corpus(cache_path: str) -> np.ndarray:
    """Assemble the Python 3.12 stdlib source into a byte corpus — a real
    (non-synthetic) ~15 MB code-text dataset available offline. Deterministic
    file order; test dirs excluded; cached as a flat uint8 file (served via
    the mmap loader like the reference's token corpora)."""
    import sysconfig

    if os.path.exists(cache_path):
        return np.fromfile(cache_path, np.uint8).astype(np.int32)
    stdlib = sysconfig.get_paths()["stdlib"]
    chunks = []
    for path in sorted(glob.glob(os.path.join(stdlib, "**/*.py"), recursive=True)):
        if "test" in path:
            continue
        with open(path, "rb") as f:
            chunks.append(np.frombuffer(f.read(), np.uint8))
    corpus = np.concatenate(chunks)
    os.makedirs(os.path.dirname(cache_path) or ".", exist_ok=True)
    corpus.tofile(cache_path)
    print(f"built pystdlib corpus: {len(corpus):,} bytes -> {cache_path}", flush=True)
    return corpus.astype(np.int32)


def load_bytes(args) -> tuple[np.ndarray, str]:
    """Returns (tokens, backing file path or '')."""
    if args.data == "pystdlib":
        cache = os.path.join(os.path.dirname(__file__), "data", "pystdlib.bin")
        return build_pystdlib_corpus(cache), cache
    if args.data:
        with open(args.data, "rb") as f:
            return np.frombuffer(f.read(), np.uint8).astype(np.int32), args.data
    root = os.path.join(os.path.dirname(__file__), "..", "..")
    chunks = []
    for path in sorted(glob.glob(os.path.join(root, "flashfftconv_tpu/**/*.py"), recursive=True)):
        with open(path, "rb") as f:
            chunks.append(np.frombuffer(f.read(), np.uint8))
    return np.concatenate(chunks).astype(np.int32), ""


def main():
    args = get_args()
    from flashfftconv_tpu.models.lm import ConvLMHeadModel
    from flashfftconv_tpu.parallel.mesh import batch_sharding, make_mesh
    from flashfftconv_tpu.utils.data import lm_batches
    from flashfftconv_tpu.utils.logging import MetricLogger
    from flashfftconv_tpu.utils.metrics import SpeedMonitor, cross_entropy
    from flashfftconv_tpu.utils.train import (
        TrainState,
        create_train_state,
        restore_checkpoint,
        save_checkpoint,
    )

    tokens, data_path = load_bytes(args)
    # Hold out the final 2% as validation (mid-epoch-stable split).
    n_val = max(len(tokens) // 50, args.batch_size * (args.l_max + 1)) if args.eval_every else 0
    val_tokens = tokens[len(tokens) - n_val :] if n_val else None
    tokens = tokens[: len(tokens) - n_val]
    print(f"corpus: {len(tokens):,} train bytes, {n_val:,} val bytes", flush=True)
    if n_val and data_path:
        # The native loader mmaps a file; give it one holding only the
        # train split so val bytes never leak into training.
        train_path = data_path + ".train"
        if not os.path.exists(train_path) or os.path.getsize(train_path) != len(tokens):
            tokens.astype(np.uint8).tofile(train_path)
        data_path = train_path

    if args.model_cfg:
        # Registry config path (the reference's _name_-keyed Hydra registry,
        # examples/hyena/src/utils/registry.py).
        from flashfftconv_tpu.utils.registry import instantiate

        model = instantiate(
            "model", args.model_cfg, l_max=args.l_max, dtype=jnp.bfloat16
        )
    else:
        model = ConvLMHeadModel(
            d_model=args.d_model,
            n_layer=args.n_layer,
            d_inner=4 * args.d_model,
            vocab_size=args.vocab_size,
            l_max=args.l_max,
            mixer=args.mixer,
            mixer_kwargs={"impl": args.impl},
            remat=args.remat,
            dtype=jnp.bfloat16,
        )
    rng = jax.random.PRNGKey(args.seed)
    sample_ids = jnp.zeros((2, args.l_max), jnp.int32)
    params = jax.jit(model.init)(rng, sample_ids)["params"]
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(params))
    print(f"model: {n_params/1e6:.2f}M params, mixer={args.mixer}", flush=True)

    warmup = min(args.warmup, max(args.steps // 2, 1))
    schedule = optax.warmup_cosine_decay_schedule(
        0.0, args.lr, warmup, max(args.steps, warmup + 1)
    )
    tx = optax.chain(
        optax.clip_by_global_norm(args.clip),
        optax.adamw(schedule, weight_decay=args.weight_decay),
    )
    state = create_train_state(params, tx)

    # Data-parallel mesh: batch sharded over all devices; grads psum'd by
    # GSPMD (the DDP analog); replicated params, sharded-by-dp optimizer
    # state is available via parallel.mesh.param_shardings if desired.
    mesh = make_mesh(axis_names=("dp",))
    x_sharding = batch_sharding(mesh, 2, dp_axis="dp")

    start_step = 0
    if args.resume and args.ckpt_dir and os.path.isdir(args.ckpt_dir):
        state, extra = restore_checkpoint(os.path.abspath(args.ckpt_dir), state, {"step": 0})
        start_step = int(extra["step"])
        print(f"resumed at step {start_step}", flush=True)

    def train_step(state, x, y, rng):
        def loss_fn(params):
            logits = model.apply(
                {"params": params}, x, deterministic=False,
                rngs={"dropout": jax.random.fold_in(rng, state.step)},
            )
            return cross_entropy(logits, y)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return (
            TrainState(step=state.step + 1, params=new_params, opt_state=opt_state),
            loss,
        )

    jit_step = jax.jit(train_step)
    if args.time_steps:
        args.log_every = 1  # per-step sync + timing
        from flashfftconv_tpu.utils.benchmarking import benchmark_memory

        x0, y0 = jnp.zeros((2, args.batch_size, args.l_max), jnp.int32)
        mem_mb = benchmark_memory(jit_step, state, x0, y0, rng)
        print(f"train-step peak memory: {mem_mb:.0f} MB", flush=True)
    logger = MetricLogger(
        logdir=args.log_file or "./logs",
        run_name=args.run_name or f"lm-{args.mixer}",
    )
    speed = SpeedMonitor()

    @jax.jit
    def eval_loss(params, x, y):
        logits = model.apply({"params": params}, x, deterministic=True)
        return cross_entropy(logits, y)

    def run_eval(params):
        """Mean val loss over contiguous windows; bits/byte = loss / ln 2."""
        losses = []
        span = args.batch_size * args.l_max
        for off in range(0, len(val_tokens) - span - 1, span):
            xy = val_tokens[off : off + span + 1]
            x = jnp.asarray(xy[:-1].reshape(args.batch_size, args.l_max))
            y = jnp.asarray(xy[1:].reshape(args.batch_size, args.l_max))
            losses.append(float(eval_loss(params, x, y)))
        return float(np.mean(losses)) if losses else float("nan")

    # Prefer the native threaded loader (csrc/dataloader.cpp) — batch
    # assembly overlaps with device steps; fall back to pure Python.
    from flashfftconv_tpu.utils import native_loader

    if data_path and native_loader.available():
        dl = native_loader.NativeLMLoader(
            data_path, args.batch_size, args.l_max, seed=args.seed
        )
        batches = iter(dl)
        print("using native C++ dataloader", flush=True)
    else:
        data_rng = np.random.default_rng(args.seed)
        batches = lm_batches(tokens, args.batch_size, args.l_max, data_rng)

    from flashfftconv_tpu.utils.train import auto_save_on_exception

    guard = auto_save_on_exception(args.ckpt_dir or "./checkpoint/lm")
    with mesh, guard:
        for step in range(start_step, args.steps):
            x_np, y_np = next(batches)
            x = jax.device_put(jnp.asarray(x_np), x_sharding)
            y = jax.device_put(jnp.asarray(y_np), x_sharding)
            state, loss = jit_step(state, x, y, rng)
            if step % args.log_every == 0 or step == args.steps - 1:
                guard.track(state, extra={"step": step})
                m = speed.step(args.batch_size * args.l_max)
                m.update(loss=float(loss), ppl=float(jnp.exp(loss)), step=step)
                logger.log(m, step=step)
                tok_s = m.get("items_per_sec", 0.0)
                print(
                    f"step {step}: loss {float(loss):.3f} ppl {float(jnp.exp(loss)):.1f}"
                    + (f" | {tok_s/1e3:.1f}K tok/s" if tok_s else ""),
                    flush=True,
                )
            if args.eval_every and (
                step % args.eval_every == args.eval_every - 1 or step == args.steps - 1
            ):
                vloss = run_eval(state.params)
                bpb = vloss / float(np.log(2))
                logger.log({"val_loss": vloss, "val_bits_per_byte": bpb}, step=step)
                print(
                    f"step {step}: val loss {vloss:.3f}, {bpb:.3f} bits/byte",
                    flush=True,
                )

    if args.ckpt_dir:
        save_checkpoint(os.path.abspath(args.ckpt_dir), state, {"step": args.steps})
        print(f"saved checkpoint to {args.ckpt_dir}", flush=True)

    # Generation sample (byte-level).
    from flashfftconv_tpu.utils.generation import generate

    prompt = jnp.asarray(tokens[None, :32])
    out = generate(
        model.apply, state.params, prompt, max_new_tokens=32,
        max_length=args.l_max, temperature=0.8, top_k=40, rng=rng,
    )
    txt = bytes(np.asarray(out[0]).clip(0, 255).tolist()).decode("utf-8", "replace")
    print(f"sample: {txt!r}", flush=True)
    logger.finish()


if __name__ == "__main__":
    main()
