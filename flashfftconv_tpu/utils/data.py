"""Data-loading utilities: fault-tolerant sampling and simple LM batching.

Port of the reference's fault-tolerant samplers
(/root/reference/examples/hyena/src/dataloaders/fault_tolerant_sampler.py:9-107,
duplicated at training/src/datamodules/fault_tolerant_sampler.py): save/restore
the RNG state and consumed-sample counter so a resumed run continues mid-epoch
without replaying data.
"""

from __future__ import annotations

import dataclasses
from typing import Iterator

import numpy as np


@dataclasses.dataclass
class FaultTolerantSampler:
    """Shuffled index sampler whose state (epoch seed + consumed counter) is
    checkpointable; on restore, iteration continues exactly where it left off."""

    num_samples: int
    seed: int = 0
    epoch: int = 0
    counter: int = 0
    shuffle: bool = True

    def state_dict(self) -> dict:
        return {"epoch": self.epoch, "counter": self.counter, "seed": self.seed}

    def load_state_dict(self, state: dict) -> None:
        self.epoch = int(state["epoch"])
        self.counter = int(state["counter"])
        self.seed = int(state.get("seed", self.seed))

    def _order(self) -> np.ndarray:
        if not self.shuffle:
            return np.arange(self.num_samples)
        rng = np.random.default_rng((self.seed, self.epoch))
        return rng.permutation(self.num_samples)

    def __iter__(self) -> Iterator[int]:
        order = self._order()
        while self.counter < self.num_samples:
            idx = int(order[self.counter])
            self.counter += 1
            yield idx
        self.counter = 0
        self.epoch += 1

    def batches(self, batch_size: int, drop_last: bool = True):
        buf = []
        for idx in self:
            buf.append(idx)
            if len(buf) == batch_size:
                yield np.asarray(buf)
                buf = []
        if buf and not drop_last:
            yield np.asarray(buf)


@dataclasses.dataclass
class ShardedSampler(FaultTolerantSampler):
    """FaultTolerantSampler restricted to one data-parallel shard — the
    FaultTolerantDistributedSampler analog (rank/world from the mesh)."""

    rank: int = 0
    world_size: int = 1

    def _order(self) -> np.ndarray:
        order = super()._order()
        per = len(order) // self.world_size
        return order[self.rank * per : (self.rank + 1) * per]

    def __iter__(self):
        order = self._order()
        n = len(order)
        while self.counter < n:
            idx = int(order[self.counter])
            self.counter += 1
            yield idx
        self.counter = 0
        self.epoch += 1


def lm_batches(tokens: np.ndarray, batch_size: int, seq_len: int, rng: np.random.Generator):
    """Random contiguous (input, target) LM batches from a flat token array."""
    max_start = len(tokens) - seq_len - 1
    while True:
        starts = rng.integers(0, max_start, batch_size)
        x = np.stack([tokens[s : s + seq_len] for s in starts])
        y = np.stack([tokens[s + 1 : s + seq_len + 1] for s in starts])
        yield x, y
