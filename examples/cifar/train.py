"""Sequential-CIFAR10 training with the LongConv model on TPU.

Port of the reference's standalone CIFAR example
(/root/reference/standalone_cifar.py): LongConvModel over 1024-step pixel
sequences, AdamW + cosine schedule with a separate no-weight-decay group for
conv kernels, bf16 compute, checkpoint save/resume. The default model
(~d_model 256, 6 layers) reaches ~81% val acc in the reference.

Data: torchvision CIFAR-10 if a local copy exists under --data-dir (this
environment has no network egress, so nothing is downloaded); otherwise a
deterministic synthetic dataset with learnable class structure is used so the
full training loop stays exercisable end to end (--synthetic forces it).

Run:  python examples/cifar/train.py --epochs 2 --synthetic
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
    p.add_argument("--lr", default=1e-3, type=float)
    p.add_argument("--weight_decay", default=0.05, type=float)
    p.add_argument("--epochs", default=300, type=int)
    p.add_argument("--grayscale", action="store_true")
    p.add_argument("--batch_size", default=96, type=int)
    p.add_argument("--n_layers", default=6, type=int)
    p.add_argument("--d_model", default=256, type=int)
    p.add_argument("--dropout", default=0.1, type=float)
    p.add_argument("--kernel_dropout", default=0.2, type=float)
    p.add_argument("--kernel_lr", default=1e-3, type=float)
    p.add_argument("--kernel_lam", default=0.001, type=float)
    p.add_argument("--prenorm", action="store_true")
    p.add_argument("--seed", default=0, type=int)
    p.add_argument("--resume", "-r", action="store_true")
    p.add_argument("--data-dir", default="./data/cifar/")
    p.add_argument("--ckpt-dir", default="./checkpoint/cifar")
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--limit-batches", default=0, type=int, help="debug: cap batches/epoch")
    p.add_argument("--log-file", default="", help="JSONL metrics log path")
    return p.parse_args()


def load_cifar(args):
    """(train_x, train_y, val_x, val_y) as flattened 1024-step sequences."""
    d_input = 1 if args.grayscale else 3
    if not args.synthetic:
        try:
            import torchvision
            import torchvision.transforms as T

            tfm = [T.Grayscale(), T.ToTensor()] if args.grayscale else [T.ToTensor()]
            ds = torchvision.datasets.CIFAR10(
                root=args.data_dir, train=True, download=False,
                transform=T.Compose(tfm),
            )
            xs = np.stack([np.asarray(x).reshape(d_input, 1024).T for x, _ in ds])
            ys = np.asarray([y for _, y in ds])
            mean = xs.mean((0, 1), keepdims=True)
            std = xs.std((0, 1), keepdims=True) + 1e-6
            xs = (xs - mean) / std
            n_val = len(xs) // 10
            return xs[:-n_val], ys[:-n_val], xs[-n_val:], ys[-n_val:]
        except Exception as e:  # dataset not present locally
            print(f"CIFAR-10 unavailable ({e}); using synthetic data", flush=True)
    rng = np.random.default_rng(args.seed)
    n_train, n_val, n_cls = 4096, 512, 10
    protos = rng.standard_normal((n_cls, 1024, d_input)).astype(np.float32)
    ys = rng.integers(0, n_cls, n_train + n_val)
    xs = protos[ys] + 0.5 * rng.standard_normal(
        (n_train + n_val, 1024, d_input)
    ).astype(np.float32)
    return xs[:n_train], ys[:n_train], xs[n_train:], ys[n_train:]


def main():
    args = get_args()
    from flashfftconv_tpu.models.long_conv import LongConvModel
    from flashfftconv_tpu.utils.optim import make_optimizer
    from flashfftconv_tpu.utils.train import (
        create_train_state,
        evaluate,
        make_eval_step,
        make_train_step,
        restore_checkpoint,
        save_checkpoint,
    )

    train_x, train_y, val_x, val_y = load_cifar(args)
    d_input = train_x.shape[-1]
    steps_per_epoch = len(train_x) // args.batch_size
    if args.limit_batches:
        steps_per_epoch = min(steps_per_epoch, args.limit_batches)

    model = LongConvModel(
        d_input=d_input,
        d_output=10,
        d_model=args.d_model,
        n_layers=args.n_layers,
        dropout=args.dropout,
        prenorm=args.prenorm,
        kernel_lam=args.kernel_lam,
        kernel_dropout=args.kernel_dropout,
        l_max=1024,
        conv_dtype=jnp.bfloat16,
    )
    rng = jax.random.PRNGKey(args.seed)
    params = model.init(rng, jnp.zeros((2, 1024, d_input), jnp.float32))["params"]
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(params))
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

    from flashfftconv_tpu.utils.logging import MetricLogger
    from flashfftconv_tpu.utils.train import auto_save_on_exception, latest_checkpoint

    ckpt_path = os.path.abspath(args.ckpt_dir)
    start_epoch, best_acc = 0, 0.0
    if args.resume:
        # Prefer the newer of the regular checkpoint and a crash-time
        # auto-save (reference resume logic, training/src/train.py:69-92).
        newest = latest_checkpoint(
            os.path.dirname(ckpt_path), name=os.path.basename(ckpt_path)
        )
        if newest:
            state, extra = restore_checkpoint(newest, state, {"epoch": 0, "acc": 0.0})
            start_epoch, best_acc = int(extra["epoch"]) + 1, float(extra["acc"])
            print(
                f"resumed {newest} from epoch {start_epoch - 1}, "
                f"best acc {best_acc:.2f}",
                flush=True,
            )

    train_step = jax.jit(make_train_step(model.apply, tx))
    eval_step = jax.jit(make_eval_step(model.apply))
    data_rng = np.random.default_rng(args.seed)
    logger = MetricLogger(args.log_file) if args.log_file else None

    guard = auto_save_on_exception(os.path.dirname(ckpt_path))
    with guard:
        for epoch in range(start_epoch, args.epochs):
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
                save_checkpoint(ckpt_path, state, {"epoch": epoch, "acc": acc})
    print(f"best val acc: {best_acc:.2f}%", flush=True)


if __name__ == "__main__":
    main()
