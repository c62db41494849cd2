"""Weighted priority sampling (Duffield-Lund-Thorup), numpy-vectorized.

Fixed-size WEIGHT-PROPORTIONAL sampling with unbiased subset-sum
estimation — the training-pipeline complement of the uniform bottom-k
sample: "draw k documents with inclusion probability increasing in
n_tok, and estimate any subset's total token mass from the sample
alone". Priority sampling (Duffield, Lund, Thorup, "Priority sampling
for estimation of arbitrary subset sums", JACM 2007) assigns each item
the priority ``q_i = w_i / u_i`` with ``u_i`` uniform in (0, 1], keeps
the k+1 largest priorities, and estimates every retained item's weight
as ``max(w_i, tau)`` where ``tau`` is the (k+1)-th priority. Subset-sum
estimates are unbiased, and Szegedy (STOC 2006) proved the total's
variance is at most ``W^2 / (k - 1)`` — within a factor of the optimal
off-line scheme.

Determinism contract (what makes the DuckDB oracle exact): ``u_i`` is
key-pure — derived from the first 16 hex chars of ``md5(key)`` as
``u = max(hi/2^32 + lo/2^64, 2^-64)`` — and every arithmetic step is a
single IEEE-754 double operation, so numpy, Spark SQL, and DuckDB all
produce BIT-IDENTICAL priorities (verified by test) and therefore the
identical sample.

Merge algebra (the distributed-correctness contract): the state is the
top-(k+1) (key, weight) pairs under the total order (priority desc, key
asc) plus exact int64 row/weight totals. The top-(k+1) of A ∪ B are each
in their own side's top-(k+1), so truncation commutes with union as
MULTISETS — merges are byte-identical under any partitioning or merge
tree (same argument as theta/KMV and the tail-quantile sketch). Weight
totals are int64 sums (token counts), so no float-order dependence
anywhere in the state.

Companion sketch under the same mergeable-UDAF protocol (BASELINE.json
north_rule); the reference library has no sampling operator.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass

import numpy as np

_LO32 = np.uint64(0xFFFFFFFF)


def priorities(keys: np.ndarray, weights: np.ndarray) -> np.ndarray:
    """q = w / u with u = max(hi/2^32 + lo/2^64, 2^-64) from the uint64
    md5-prefix key. Each step is one IEEE double op — bit-identical in
    numpy / Spark SQL / DuckDB for the same (key, weight)."""
    hi = (keys >> np.uint64(32)).astype(np.float64)
    lo = (keys & _LO32).astype(np.float64)
    u = np.maximum(hi * 2.0**-32 + lo * 2.0**-64, 2.0**-64)
    return weights.astype(np.float64) / u


@dataclass(frozen=True)
class PrioritySampleConfig:
    k: int = 64  # sample size; the state retains k+1 pairs (the threshold)

    def __post_init__(self):
        if self.k < 2:
            raise ValueError("k must be >= 2 (variance bound needs k-1 > 0)")


class PrioritySample:
    """State: parallel arrays ``keys`` (uint64 md5-prefix) and ``weights``
    (int64 > 0), sorted by (priority desc, key asc), length <= k+1; plus
    exact ``n`` (rows seen) and ``sum_w`` (total weight, int64)."""

    __slots__ = ("cfg", "keys", "weights", "n", "sum_w")

    def __init__(self, cfg: PrioritySampleConfig):
        self.cfg = cfg
        self.keys = np.empty(0, dtype=np.uint64)
        self.weights = np.empty(0, dtype=np.int64)
        self.n = 0
        self.sum_w = 0

    def _fold(self, keys: np.ndarray, weights: np.ndarray) -> "PrioritySample":
        keys = np.concatenate([self.keys, keys])
        weights = np.concatenate([self.weights, weights])
        q = priorities(keys, weights)
        # total order (q desc, key asc): ties in q across keys are broken
        # deterministically; equal (q, key) implies equal weight (w <= 2^52
        # makes w -> w/u injective for fixed u), so the truncated multiset
        # is a pure function of the input multiset — exact merge algebra.
        order = np.lexsort((keys, -q))[: self.cfg.k + 1]
        self.keys = keys[order]
        self.weights = weights[order]
        return self

    def add_pairs(self, keys: np.ndarray, weights: np.ndarray) -> "PrioritySample":
        if len(keys) == 0:
            return self
        keys = keys.astype(np.uint64, copy=False)
        weights = weights.astype(np.int64, copy=False)
        # preconditions of the cross-engine bit-exactness / total-order
        # injectivity argument (module docstring): w > 0 keeps q = w/u
        # positive and order-defining; w <= 2^52 keeps w -> w/u injective
        # per key so the (q desc, key asc) total order needs no tie-break
        if weights.min() <= 0 or weights.max() > (1 << 52):
            raise ValueError(
                "priority-sample weights must be in (0, 2^52]: got "
                f"min={int(weights.min())}, max={int(weights.max())}"
            )
        self.n += len(keys)
        self.sum_w += int(weights.sum())
        return self._fold(keys, weights)

    def merge_(self, other: "PrioritySample") -> "PrioritySample":
        self.n += other.n
        self.sum_w += other.sum_w
        return self._fold(other.keys, other.weights)

    # -- queries -----------------------------------------------------------

    @property
    def tau(self) -> float:
        """The (k+1)-th priority — the DLT threshold (0.0 while exact)."""
        if len(self.keys) <= self.cfg.k:
            return 0.0
        return float(priorities(self.keys[-1:], self.weights[-1:])[0])

    def sample(self) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """(keys, weights, w_hat) of the retained sample: the top-k pairs,
        with the DLT weight estimate w_hat = max(w, tau). Unbiased:
        E[sum of w_hat over sample members of any fixed subset] = that
        subset's true total weight."""
        m = min(self.cfg.k, len(self.keys))
        w = self.weights[:m]
        w_hat = np.maximum(w.astype(np.float64), self.tau)
        return self.keys[:m], w, w_hat

    def estimate_total(self) -> float:
        """Estimated total weight. Exact (== sum_w) while <= k items have
        been seen; otherwise the DLT estimator with
        sigma <= W / sqrt(k-1) (Szegedy 2006)."""
        if len(self.keys) <= self.cfg.k:
            return float(self.sum_w)
        return float(self.sample()[2].sum())

    def sigma_bound(self) -> float:
        """One-sigma upper bound on estimate_total's error: W/sqrt(k-1)."""
        return float(self.sum_w) / np.sqrt(self.cfg.k - 1)

    # -- serialization -------------------------------------------------------

    def serialize(self) -> bytes:
        head = struct.pack("<qqi", self.n, self.sum_w, len(self.keys))
        return (
            head
            + self.keys.astype("<u8").tobytes()
            + self.weights.astype("<i8").tobytes()
        )

    @classmethod
    def deserialize(cls, cfg: PrioritySampleConfig, data: bytes) -> "PrioritySample":
        n, sum_w, m = struct.unpack_from("<qqi", data, 0)
        out = cls(cfg)
        out.n, out.sum_w = n, sum_w
        off = 20
        out.keys = np.frombuffer(data, dtype="<u8", count=m, offset=off).copy()
        out.weights = np.frombuffer(data, dtype="<i8", count=m, offset=off + 8 * m).copy()
        return out
