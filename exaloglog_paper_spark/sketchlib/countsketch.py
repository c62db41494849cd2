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

Hashing: double hashing (Kirsch-Mitzenmacher 2006, like countmin) —
``v_r = h1 + r·h2`` with ``h1 = splitmix64(h)``, ``h2 = splitmix64(h ^
SALT) | 1`` (full γ-multiplied stream form — see bitops.splitmix64 on why
the bare finalizer is not enough): two hash evaluations total instead of
``depth``, the per-row values are cheap uint64 FMAs. ``width`` must be a
power of two: the bucket uses the LOW ``log2(width)`` bits of ``v_r`` and
the sign uses the bit just above them — so ``sign·w + bucket`` is one
mask, ``v & (2w - 1)``.

Hot path: the unweighted ``add_hashes`` folds row, bucket AND sign into
ONE flat bincount index (``r·2w + (v & (2w-1))``) so the whole batch is
a single integer ``np.bincount`` per 128k cache-resident chunk — no float
weights, no per-row passes (~7x over the naive per-row weighted-bincount
form, 215 -> 31 ns/element; see scripts/microbench.py).
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


# decorrelates h2's input from h1's (any fixed 64-bit constant works;
# this is splitmix64(1) precomputed)
_H2_SALT = U64(0x6E789E6AA1B965F4)


class CountSketch:
    __slots__ = ("cfg", "table")

    def __init__(self, cfg: CountSketchConfig, table: np.ndarray | None = None):
        self.cfg = cfg
        self.table = (
            table
            if table is not None
            else np.zeros((cfg.depth, cfg.width), dtype=np.int64)
        )

    def _row_values(self, hashes: np.ndarray) -> np.ndarray:
        """(depth, n) per-row 64-bit values v_r = h1 + r*h2."""
        h = as_u64(hashes)
        with np.errstate(over="ignore"):
            h1 = splitmix64(h)
            h2 = splitmix64(h ^ _H2_SALT) | U64(1)
            rows = np.arange(self.cfg.depth, dtype=np.uint64)[:, None]
            return h1[None, :] + rows * h2[None, :]

    def _bucket_sign(self, hashes: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """(depth, n) bucket columns and (depth, n) +/-1 signs.

        The sign bit is bit ``log2(width)`` of v (the bit just above the
        bucket bits), so ``sign*width + bucket == v & (2*width - 1)`` — the
        hot path below exploits that to index with a single mask."""
        v = self._row_values(hashes)
        w = U64(self.cfg.width)
        bucket = (v & (w - U64(1))).astype(np.int64)
        sign = np.where(v & w, np.int64(1), np.int64(-1))
        return bucket, sign

    def add_hashes(
        self, hashes: np.ndarray, counts: np.ndarray | None = None
    ) -> "CountSketch":
        if len(hashes) == 0:
            return self
        w2 = self.cfg.width * 2
        if counts is None:
            # fold (row, sign, bucket) into one flat integer bincount cell
            # r*2w + (v & (2w-1)) — a single integer pass, no float weights,
            # built with in-place ops; chunked at 128k so the (depth, chunk)
            # index block stays cache-resident (2x over one giant pass —
            # invisible to the result, the fold is pure addition)
            h = as_u64(hashes)
            rows = np.arange(self.cfg.depth, dtype=np.uint64)[:, None]
            row_off = rows * U64(w2)
            for lo in range(0, len(h), 131072):
                c = h[lo : lo + 131072]
                with np.errstate(over="ignore"):
                    h1 = splitmix64(c)
                    h2 = splitmix64(c ^ _H2_SALT) | U64(1)
                    idx = np.multiply(rows, h2[None, :])
                    idx += h1[None, :]
                idx &= U64(w2 - 1)
                idx += row_off
                flat = np.bincount(
                    # values < depth*2w: the int64 view is exact
                    idx.ravel().view(np.int64),
                    minlength=self.cfg.depth * w2,
                )
                grid = flat.reshape(self.cfg.depth, 2, self.cfg.width)
                self.table += grid[:, 1, :]
                self.table -= grid[:, 0, :]
        else:
            # INTEGER accumulation (np.add.at into the same flat 2-lane
            # grid as the unweighted path): bincount weights are float64,
            # which silently loses integer precision once a bucket's
            # weighted sum exceeds 2^53 — breaking the byte-exact
            # LINEAR-state contract. Chunked like the hot path.
            h = as_u64(hashes)
            cnt = np.asarray(counts, dtype=np.int64)
            rows = np.arange(self.cfg.depth, dtype=np.uint64)[:, None]
            row_off = rows * U64(w2)
            for lo in range(0, len(h), 131072):
                c = h[lo : lo + 131072]
                cc = cnt[lo : lo + 131072]
                with np.errstate(over="ignore"):
                    h1 = splitmix64(c)
                    h2 = splitmix64(c ^ _H2_SALT) | U64(1)
                    idx = np.multiply(rows, h2[None, :])
                    idx += h1[None, :]
                idx &= U64(w2 - 1)
                idx += row_off
                flat = np.zeros(self.cfg.depth * w2, dtype=np.int64)
                np.add.at(
                    flat,
                    idx.ravel().view(np.int64),
                    np.broadcast_to(cc[None, :], idx.shape).ravel(),
                )
                grid = flat.reshape(self.cfg.depth, 2, self.cfg.width)
                self.table += grid[:, 1, :]
                self.table -= grid[:, 0, :]
        return self

    def query(self, hashes: np.ndarray) -> np.ndarray:
        """Unbiased two-sided point-frequency estimates (median over rows)."""
        bucket, sign = self._bucket_sign(hashes)
        ests = np.stack(
            [sign[r] * self.table[r][bucket[r]] for r in range(self.cfg.depth)]
        )
        return np.median(ests, axis=0)

    def f2(self) -> float:
        """AMS second-frequency-moment (self-join size) estimate.

        Accumulates in float64: an int64 einsum would overflow once
        sum(counter^2) exceeds 2^63 — reachable from ~10^10 inserts into
        one row — and numpy wraps silently."""
        t = self.table.astype(np.float64)
        return float(np.median(np.einsum("rw,rw->r", t, t)))

    def inner_product(self, other: "CountSketch") -> float:
        """Unbiased equi-join-size estimate sum_x fA(x)·fB(x) (float64
        accumulation, same overflow rationale as ``f2``)."""
        if other.cfg != self.cfg:
            raise ValueError("count-sketch configs differ")
        row_dot = np.einsum(
            "rw,rw->r",
            self.table.astype(np.float64),
            other.table.astype(np.float64),
        )
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
