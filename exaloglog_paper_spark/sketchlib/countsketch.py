"""Count sketch / AMS (Charikar-Chen-Farach-Colton 2002; Alon-Matias-Szegedy
1996), numpy-vectorized.

Mergeable LINEAR frequency sketch: a ``depth x width`` int64 counter matrix
where each item lands in one bucket per row with a +/-1 sign. Linearity is
the strongest possible merge algebra — ``merge`` is elementwise vector
addition, so ``state(A ∪ B) == merge(state(A), state(B))`` holds
byte-for-byte under ANY partitioning with no tie-breaking subtleties.

Three estimators ride on the one state:

- **point frequency** (median over rows of ``sign * counter``): UNBIASED
  per row, two-sided error ``|est - f(x)| <= c·sqrt(F2/width)`` — unlike
  count-min's one-sided overcount.
- **F2 / self-join size** (median over rows of ``sum(counter^2)``): the AMS
  second frequency moment, per-row unbiased with
  ``Var <= 2·F2^2/width`` ⇒ relative error ``<= c·sqrt(2/width)``.
- **inner product / equi-join size** (median over rows of the row-wise dot
  product of two same-config sketches): unbiased estimate of
  ``sum_x fA(x)·fB(x) = |A ⋈ B|`` on the sketched key, with
  ``Var <= 2·F2(A)·F2(B)/width`` — join cardinality estimation WITHOUT
  executing the join (classic OLAP optimizer statistic).

The reference library contains no frequency-moment sketch; this is a
companion under the same mergeable-UDAF protocol (BASELINE.json
north_rule), complementing count-min (one-sided) and Misra-Gries
(deterministic bracket) with unbiased two-sided estimates.

Hashing: rows are decorrelated by per-row salts ``splitmix64(r+1)``; the
per-item per-row value is ``v = splitmix64(h ^ salt_r)`` (full
γ-multiplied stream form — see bitops.splitmix64 on why the bare finalizer
is not enough). ``width`` must be a power of two: the bucket uses the LOW
``log2(width)`` bits of ``v`` and the sign uses the TOP bit, so the two are
disjoint bit ranges of one 64-bit hash.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from .bitops import U64, as_u64, splitmix64


@dataclass(frozen=True)
class CountSketchConfig:
    width: int = 8192
    depth: int = 5

    def __post_init__(self):
        if self.width & (self.width - 1) or self.width <= 0:
            raise ValueError("count-sketch width must be a power of two")
        if self.depth < 1:
            raise ValueError("count-sketch depth must be >= 1")

    @property
    def state_num_bytes(self) -> int:
        return self.width * self.depth * 8

    @property
    def rel_f2_error_bound(self) -> float:
        """Median-of-depth AMS F2 relative error used by the bound oracles.

        Per row ``std/F2 <= sqrt(2/width)``; 6 standard deviations on the
        per-row estimate makes the median-of-depth exceedance probability
        negligible (each row must individually stray 6 sigma)."""
        return 6.0 * float(np.sqrt(2.0 / self.width))


_ROW_SALT_CACHE: dict[int, np.ndarray] = {}


def _row_salts(depth: int) -> np.ndarray:
    out = _ROW_SALT_CACHE.get(depth)
    if out is None:
        out = splitmix64(np.arange(1, depth + 1, dtype=np.uint64))
        _ROW_SALT_CACHE[depth] = out
    return out


class CountSketch:
    __slots__ = ("cfg", "table")

    def __init__(self, cfg: CountSketchConfig, table: np.ndarray | None = None):
        self.cfg = cfg
        self.table = (
            table
            if table is not None
            else np.zeros((cfg.depth, cfg.width), dtype=np.int64)
        )

    def _bucket_sign(self, hashes: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """(depth, n) bucket columns and (depth, n) +/-1 signs."""
        h = as_u64(hashes)
        salts = _row_salts(self.cfg.depth)
        v = splitmix64(h[None, :] ^ salts[:, None])
        bucket = (v & U64(self.cfg.width - 1)).astype(np.int64)
        sign = np.where(v >> U64(63), np.int64(1), np.int64(-1))
        return bucket, sign

    def add_hashes(
        self, hashes: np.ndarray, counts: np.ndarray | None = None
    ) -> "CountSketch":
        if len(hashes) == 0:
            return self
        bucket, sign = self._bucket_sign(hashes)
        if counts is None:
            w = sign.astype(np.float64)
        else:
            w = sign * counts[None, :].astype(np.float64)
        for r in range(self.cfg.depth):
            self.table[r] += np.bincount(
                bucket[r], weights=w[r], minlength=self.cfg.width
            ).astype(np.int64)
        return self

    def query(self, hashes: np.ndarray) -> np.ndarray:
        """Unbiased two-sided point-frequency estimates (median over rows)."""
        bucket, sign = self._bucket_sign(hashes)
        ests = np.stack(
            [sign[r] * self.table[r][bucket[r]] for r in range(self.cfg.depth)]
        )
        return np.median(ests, axis=0)

    def f2(self) -> float:
        """AMS second-frequency-moment (self-join size) estimate."""
        row_f2 = np.einsum("rw,rw->r", self.table, self.table).astype(np.float64)
        return float(np.median(row_f2))

    def inner_product(self, other: "CountSketch") -> float:
        """Unbiased equi-join-size estimate sum_x fA(x)·fB(x)."""
        if other.cfg != self.cfg:
            raise ValueError("count-sketch configs differ")
        row_dot = np.einsum("rw,rw->r", self.table, other.table).astype(np.float64)
        return float(np.median(row_dot))

    def merge_(self, other: "CountSketch") -> "CountSketch":
        if other.cfg != self.cfg:
            raise ValueError("count-sketch configs differ")
        self.table += other.table
        return self

    def serialize(self) -> bytes:
        return self.table.astype("<i8").tobytes()

    @classmethod
    def deserialize(cls, cfg: CountSketchConfig, data: bytes) -> "CountSketch":
        if len(data) != cfg.state_num_bytes:
            raise ValueError("unexpected state length!")
        table = (
            np.frombuffer(data, dtype="<i8").reshape(cfg.depth, cfg.width).copy()
        )
        return cls(cfg, table)


def join_size_error_bound(
    cfg: CountSketchConfig, f2_a: float, f2_b: float
) -> float:
    """Absolute error bound for ``inner_product``: 6 per-row standard
    deviations, ``std <= sqrt(2·F2(A)·F2(B)/width)`` (AMS analysis)."""
    return 6.0 * float(np.sqrt(2.0 * f2_a * f2_b / cfg.width))
