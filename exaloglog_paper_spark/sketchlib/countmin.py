"""Count-Min sketch (Cormode & Muthukrishnan 2005), numpy-vectorized.

Mergeable frequency sketch: ``depth × width`` int64 counter matrix, one
pairwise-independent hash row via double hashing (h1 + i·h2, Kirsch &
Mitzenmacher 2006). Point query overestimates only: err ≤ e/width · N with
probability ≥ 1 - e^-depth. The reference library contains no frequency
sketch; this is a required companion under the same mergeable-UDAF protocol
(BASELINE.json north_rule).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from .bitops import U64, as_u64, splitmix64


@dataclass(frozen=True)
class CountMinConfig:
    width: int = 2048
    depth: int = 5

    @property
    def epsilon(self) -> float:
        return float(np.e) / self.width

    @property
    def state_num_bytes(self) -> int:
        return self.width * self.depth * 8


class CountMin:
    __slots__ = ("cfg", "table")

    def __init__(self, cfg: CountMinConfig, table: np.ndarray | None = None):
        self.cfg = cfg
        self.table = (
            table
            if table is not None
            else np.zeros((cfg.depth, cfg.width), dtype=np.int64)
        )

    def _positions(self, hashes: np.ndarray) -> np.ndarray:
        """(depth, n) column positions via double hashing."""
        h1 = as_u64(hashes)
        h2 = splitmix64(h1) | U64(1)
        rows = np.arange(self.cfg.depth, dtype=np.uint64)[:, None]
        return ((h1[None, :] + rows * h2[None, :]) % U64(self.cfg.width)).astype(
            np.int64
        )

    def add_hashes(self, hashes: np.ndarray, counts: np.ndarray | None = None) -> "CountMin":
        if len(hashes) == 0:
            return self
        pos = self._positions(hashes)
        w = None if counts is None else counts.astype(np.float64)
        for r in range(self.cfg.depth):
            self.table[r] += np.bincount(
                pos[r], weights=w, minlength=self.cfg.width
            ).astype(np.int64)
        return self

    def query(self, hashes: np.ndarray) -> np.ndarray:
        pos = self._positions(hashes)
        ests = np.stack([self.table[r][pos[r]] for r in range(self.cfg.depth)])
        return ests.min(axis=0)

    def merge_(self, other: "CountMin") -> "CountMin":
        if other.cfg != self.cfg:
            raise ValueError("count-min configs differ")
        self.table += other.table
        return self

    @property
    def total(self) -> int:
        return int(self.table[0].sum())

    def serialize(self) -> bytes:
        return self.table.astype("<i8").tobytes()

    @classmethod
    def deserialize(cls, cfg: CountMinConfig, data: bytes) -> "CountMin":
        if len(data) != cfg.state_num_bytes:
            raise ValueError("unexpected state length!")
        table = np.frombuffer(data, dtype="<i8").reshape(cfg.depth, cfg.width).copy()
        return cls(cfg, table)
