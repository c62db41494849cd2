"""KLL quantile sketch (Karnin, Lang & Liberty, FOCS'16), numpy-vectorized.

Mergeable rank/quantile sketch over float64 values: a stack of level
compactors where level i items carry weight 2^i; compaction sorts a level
and keeps every other item (random offset), pushing survivors up. Normalized
rank error is O(1/k) with the (2/3)^depth capacity schedule (see PAPERS.md:
KLL± VLDB'21 builds on the same structure). The reference library has no
quantile sketch; required companion per BASELINE.json north_rule.

Randomness: the compaction coin uses a counter-based splitmix64 stream
seeded from the sketch's own insert count, so a given build is
deterministic for a given input order (tests are reproducible) while
remaining unbiased across levels.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from .bitops import splitmix64

_C = 2.0 / 3.0


@dataclass(frozen=True)
class KLLConfig:
    k: int = 200

    def capacity(self, level: int, num_levels: int) -> int:
        depth = num_levels - level - 1
        return max(int(np.ceil(self.k * (_C**depth))), 8)


class KLL:
    __slots__ = ("cfg", "levels", "n", "_coin")

    def __init__(self, cfg: KLLConfig, levels: list[np.ndarray] | None = None, n: int = 0):
        self.cfg = cfg
        self.levels = levels if levels is not None else [np.empty(0, dtype=np.float64)]
        self.n = n
        self._coin = 0

    def _coin_bit(self) -> int:
        self._coin += 1
        return int(splitmix64(np.array([self.n + self._coin], dtype=np.uint64))[0]) & 1

    def add_values(self, values: np.ndarray) -> "KLL":
        values = np.asarray(values, dtype=np.float64)
        values = values[~np.isnan(values)]
        if len(values) == 0:
            return self
        self.levels[0] = np.concatenate([self.levels[0], values])
        self.n += len(values)
        self._compress()
        return self

    def _total_capacity(self) -> int:
        nl = len(self.levels)
        return sum(self.cfg.capacity(i, nl) for i in range(nl))

    def _compress(self) -> None:
        while sum(len(lv) for lv in self.levels) > self._total_capacity():
            nl = len(self.levels)
            for i in range(nl):
                if len(self.levels[i]) > self.cfg.capacity(i, nl):
                    lv = np.sort(self.levels[i])
                    off = self._coin_bit()
                    promoted = lv[off::2]
                    self.levels[i] = np.empty(0, dtype=np.float64)
                    if i + 1 == len(self.levels):
                        self.levels.append(np.empty(0, dtype=np.float64))
                    self.levels[i + 1] = np.concatenate([self.levels[i + 1], promoted])
                    break
            else:
                break

    def merge_(self, other: "KLL") -> "KLL":
        if other.cfg != self.cfg:
            raise ValueError("KLL configs differ")
        while len(self.levels) < len(other.levels):
            self.levels.append(np.empty(0, dtype=np.float64))
        for i, lv in enumerate(other.levels):
            if len(lv):
                self.levels[i] = np.concatenate([self.levels[i], lv])
        self.n += other.n
        self._compress()
        return self

    def _weighted_items(self) -> tuple[np.ndarray, np.ndarray]:
        items, weights = [], []
        for i, lv in enumerate(self.levels):
            if len(lv):
                items.append(lv)
                weights.append(np.full(len(lv), 1 << i, dtype=np.int64))
        if not items:
            return np.empty(0), np.empty(0, dtype=np.int64)
        it = np.concatenate(items)
        w = np.concatenate(weights)
        order = np.argsort(it, kind="stable")
        return it[order], w[order]

    def quantile(self, q) -> np.ndarray | float:
        """Value(s) at normalized rank(s) q in [0,1]."""
        scalar = np.isscalar(q)
        qs = np.atleast_1d(np.asarray(q, dtype=np.float64))
        it, w = self._weighted_items()
        if len(it) == 0:
            out = np.full(len(qs), np.nan)
            return float(out[0]) if scalar else out
        cum = np.cumsum(w)
        targets = np.clip(qs * self.n, 1, self.n)
        pos = np.searchsorted(cum, targets, side="left")
        out = it[np.minimum(pos, len(it) - 1)]
        return float(out[0]) if scalar else out

    def rank(self, value: float) -> float:
        """Estimated normalized rank of value."""
        it, w = self._weighted_items()
        if len(it) == 0:
            return 0.0
        return float(w[it <= value].sum()) / max(self.n, 1)

    def serialize(self) -> bytes:
        import struct

        parts = [struct.pack("<qiq", self.n, len(self.levels), self.cfg.k)]
        for lv in self.levels:
            parts.append(struct.pack("<i", len(lv)))
            parts.append(lv.astype("<f8").tobytes())
        return b"".join(parts)

    @classmethod
    def deserialize(cls, cfg: KLLConfig, data: bytes) -> "KLL":
        import struct

        n, nl, k = struct.unpack_from("<qiq", data, 0)
        if k != cfg.k:
            raise ValueError("KLL k mismatch")
        off = struct.calcsize("<qiq")
        levels = []
        for _ in range(nl):
            (ln,) = struct.unpack_from("<i", data, off)
            off += 4
            levels.append(np.frombuffer(data, dtype="<f8", count=ln, offset=off).copy())
            off += ln * 8
        return cls(cfg, levels, n)
