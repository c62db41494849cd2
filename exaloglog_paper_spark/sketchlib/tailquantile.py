"""Exact tail order-statistics sketch, numpy-vectorized.

State = the ``m`` smallest and ``m`` largest VALUES seen (sorted
multisets, truncated) plus the exact count ``n``. Any order statistic
whose rank falls within ``m`` of either end is EXACT — at 10^12 rows and
m = 2^16 that's every quantile q <= 6.6e-8 or q >= 1 - 6.6e-8, the
extreme-tail region where rank-error sketches (KLL: additive eps*n rank
error; t-digest: relative but heuristic) are at their weakest. The
intended pairing is KLL/t-digest for the body + this sketch for the
tails (e.g. exact max/min/p99.999 of n_tok to catch degenerate
sequences in a training corpus).

Merge algebra (the distributed-correctness contract): the m smallest of
A ∪ B are each among their side's m smallest, so
``minm(minm(A) ∪ minm(B)) == minm(A ∪ B)`` as MULTISETS, exactly —
order-free, associative, byte-identical serialization under any
partitioning or merge tree (same argument as the theta/KMV kernel,
applied to values instead of distinct hashes, duplicates retained).

Rank convention: ``quantile_disc(q)`` returns the value of rank
``ceil(q*n)`` (1-based, ascending; q=0 maps to rank 1) — identical to
DuckDB's discrete quantile, so oracles hash-match exactly. Ranks deeper
than ``m`` from both ends raise ``OutOfTailError`` rather than guess.

Companion under the same mergeable-UDAF protocol (BASELINE.json
north_rule); the reference library has no order-statistics sketch.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np


class OutOfTailError(ValueError):
    """Requested rank is outside both exact tail windows."""


@dataclass(frozen=True)
class TailQuantileConfig:
    m: int = 4096  # exact values retained per end

    def __post_init__(self):
        if self.m < 1:
            raise ValueError("m must be >= 1")


class TailQuantile:
    __slots__ = ("cfg", "lo", "hi", "n")

    def __init__(self, cfg: TailQuantileConfig):
        self.cfg = cfg
        self.lo = np.empty(0, dtype=np.float64)  # ascending, <= m
        self.hi = np.empty(0, dtype=np.float64)  # ascending, <= m
        self.n = 0

    def _fold(self, values: np.ndarray, count: int) -> "TailQuantile":
        m = self.cfg.m
        self.n += count
        lo = np.sort(np.concatenate([self.lo, values]), kind="stable")[:m]
        hi_all = np.sort(np.concatenate([self.hi, values]), kind="stable")
        self.lo = lo
        self.hi = hi_all[-m:] if len(hi_all) > m else hi_all
        return self

    def add_values(self, values: np.ndarray) -> "TailQuantile":
        values = values.astype(np.float64, copy=False)
        if len(values) == 0:
            return self
        m = self.cfg.m
        # pre-truncate huge batches: only each batch's own m-extremes can
        # survive the fold
        if len(values) > 2 * m:
            part = np.partition(values, (m - 1, len(values) - m))
            ext = np.concatenate([part[:m], part[-m:]])
            return self._fold(ext, len(values))
        return self._fold(values, len(values))

    def merge_(self, other: "TailQuantile") -> "TailQuantile":
        m = self.cfg.m
        self.n += other.n
        self.lo = np.sort(np.concatenate([self.lo, other.lo]), kind="stable")[:m]
        hi_all = np.sort(np.concatenate([self.hi, other.hi]), kind="stable")
        self.hi = hi_all[-m:] if len(hi_all) > m else hi_all
        return self

    # -- queries ---------------------------------------------------------

    def quantile_disc(self, q: float) -> float:
        """Exact value of rank ceil(q*n) (1-based ascending; DuckDB
        quantile_disc convention). Raises OutOfTailError when the rank is
        more than m away from both ends."""
        if self.n == 0:
            raise OutOfTailError("empty sketch")
        rank = max(1, min(self.n, int(np.ceil(q * self.n))))
        if rank <= len(self.lo):
            return float(self.lo[rank - 1])
        from_top = self.n - rank  # 0 = maximum
        if from_top < len(self.hi):
            return float(self.hi[len(self.hi) - 1 - from_top])
        raise OutOfTailError(
            f"rank {rank} of {self.n} is outside both m={self.cfg.m} tails"
        )

    @property
    def min(self) -> float:
        if len(self.lo) == 0:
            raise OutOfTailError("empty sketch")
        return float(self.lo[0])

    @property
    def max(self) -> float:
        if len(self.hi) == 0:
            raise OutOfTailError("empty sketch")
        return float(self.hi[-1])

    # -- serialization -----------------------------------------------------

    def serialize(self) -> bytes:
        import struct

        head = struct.pack("<qii", self.n, len(self.lo), len(self.hi))
        return head + self.lo.astype("<f8").tobytes() + self.hi.astype("<f8").tobytes()

    @classmethod
    def deserialize(cls, cfg: TailQuantileConfig, data: bytes) -> "TailQuantile":
        import struct

        n, nlo, nhi = struct.unpack_from("<qii", data, 0)
        out = cls(cfg)
        out.n = n
        off = 16
        out.lo = np.frombuffer(data, dtype="<f8", count=nlo, offset=off).copy()
        out.hi = np.frombuffer(data, dtype="<f8", count=nhi, offset=off + 8 * nlo).copy()
        return out
