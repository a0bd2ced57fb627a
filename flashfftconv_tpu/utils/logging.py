"""Experiment logging: JSONL/CSV metric logs + optional wandb.

Lightweight equivalent of the reference's logger zoo (CustomWandbLogger with
retries, csv/tensorboard configs — SURVEY.md §5.5): a MetricLogger that
appends JSONL locally (always works in zero-egress environments) and mirrors
to wandb when available and configured.
"""

from __future__ import annotations

import json
import os
import time
from typing import Any


class MetricLogger:
    def __init__(self, logdir: str = "./logs", run_name: str | None = None,
                 use_wandb: bool = False, config: dict | None = None):
        # `logdir` may also be an exact .jsonl file path (the examples pass
        # --log-file straight through); a directory named "foo.jsonl" with
        # the real log buried inside is never what anyone wants.
        if logdir.endswith(".jsonl"):
            parent = os.path.dirname(logdir)
            if parent:
                os.makedirs(parent, exist_ok=True)
            self.path = logdir
            run_name = run_name or os.path.splitext(os.path.basename(logdir))[0]
        else:
            os.makedirs(logdir, exist_ok=True)
            run_name = run_name or time.strftime("run-%Y%m%d-%H%M%S")
            self.path = os.path.join(logdir, f"{run_name}.jsonl")
        self._wandb = None
        if use_wandb:
            try:
                import wandb

                self._wandb = wandb.init(project="flashfftconv-tpu", name=run_name,
                                         config=config or {})
            except Exception as e:  # offline/zero-egress: degrade to JSONL
                print(f"wandb unavailable ({e}); logging to {self.path} only")
        if config:
            self.log({"_config": config, "step": -1})

    def log(self, metrics: dict[str, Any], step: int | None = None) -> None:
        rec = {k: (float(v) if hasattr(v, "item") else v) for k, v in metrics.items()}
        if step is not None:
            rec["step"] = step
        rec.setdefault("time", time.time())
        with open(self.path, "a") as f:
            f.write(json.dumps(rec) + "\n")
        if self._wandb is not None:
            self._wandb.log({k: v for k, v in rec.items() if not k.startswith("_")})

    def finish(self) -> None:
        if self._wandb is not None:
            self._wandb.finish()
