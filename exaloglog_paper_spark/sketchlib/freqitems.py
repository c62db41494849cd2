"""Misra-Gries frequent-items summary, numpy-vectorized.

Deterministic heavy-hitter sketch: at most ``k`` (item, counter) pairs,
with the classic guarantee

    est(x) <= true(x) <= est(x) + err,   err = (n - sum_counters) / (k + 1)

for EVERY item x (absent items have est 0), where ``n`` is the total
stream weight. Unlike count-min (which OVERcounts w.h.p.), Misra-Gries
UNDERcounts deterministically — no failure probability — and any item
with true frequency > n/(k+1) is guaranteed to be present in the summary.

Mergeability (Agarwal, Cormode, Huang, Phillips, Wei, Yi — "Mergeable
Summaries", PODS 2012): summing two summaries' counters and then
subtracting the (k+1)-th largest counter from all (dropping non-positive)
preserves the n/(k+1) bound for the COMBINED stream. The retained counter
SET is order/partitioning-dependent (unlike the register sketches' exact
merge algebra), but the guarantee above is partitioning-invariant — the
same contract the KLL / t-digest companions pin in tests. The tracked
``err`` is data-dependent and usually far tighter than n/(k+1): every
trim removes >= (k+1) units of counter mass per unit of per-item
undercount, so ``(n - sum_counters)/(k+1)`` bounds the undercount under
ANY trim schedule (per-batch, pairwise merge, or k-way fold).

Companion sketch under the same mergeable-UDAF protocol as
count-min/KLL/t-digest/Bloom/theta (BASELINE.json north_rule); the
reference library itself has no frequent-items sketch.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np


@dataclass(frozen=True)
class FreqItemsConfig:
    k: int = 256  # max retained counters

    def __post_init__(self):
        if self.k < 1:
            raise ValueError("k must be >= 1")


class MisraGries:
    """State: parallel arrays ``ids`` (int64, sorted ascending, unique) and
    ``counts`` (int64, all > 0), plus exact total weight ``n``."""

    __slots__ = ("cfg", "ids", "counts", "n")

    def __init__(self, cfg: FreqItemsConfig):
        self.cfg = cfg
        self.ids = np.empty(0, dtype=np.int64)
        self.counts = np.empty(0, dtype=np.int64)
        self.n = 0

    # -- core fold ----------------------------------------------------------

    def _combine(self, ids: np.ndarray, counts: np.ndarray) -> "MisraGries":
        """Sum (ids, counts) into the state, then trim to <= k counters by
        subtracting the (k+1)-th largest counter value from all."""
        if len(ids):
            all_ids = np.concatenate([self.ids, ids])
            all_cnt = np.concatenate([self.counts, counts])
            uniq, inv = np.unique(all_ids, return_inverse=True)
            summed = np.zeros(len(uniq), dtype=np.int64)
            np.add.at(summed, inv, all_cnt)
            self.ids, self.counts = uniq, summed
        k = self.cfg.k
        if len(self.ids) > k:
            # value of the (k+1)-th largest counter; at most k counters
            # strictly exceed it, so the survivors fit.
            c = np.partition(self.counts, len(self.counts) - (k + 1))[
                len(self.counts) - (k + 1)
            ]
            keep = self.counts > c
            self.ids = self.ids[keep]
            self.counts = self.counts[keep] - c
        return self

    def add_ids(
        self, item_ids: np.ndarray, weights: np.ndarray | None = None
    ) -> "MisraGries":
        """Fold a batch of raw int64 item ids; ``weights`` (int64, > 0)
        makes each id count that many times — byte-identical to folding
        the expanded repeats in the same batch (the per-batch histogram
        sums multiplicities either way), so pre-aggregated (id, count)
        histograms are a lossless fast path."""
        item_ids = item_ids.astype(np.int64, copy=False)
        if len(item_ids) == 0:
            return self
        if weights is None:
            self.n += len(item_ids)
            vals, cnts = np.unique(item_ids, return_counts=True)
            return self._combine(vals, cnts.astype(np.int64))
        weights = weights.astype(np.int64, copy=False)
        self.n += int(weights.sum())
        vals, inv = np.unique(item_ids, return_inverse=True)
        cnts = np.zeros(len(vals), dtype=np.int64)
        np.add.at(cnts, inv, weights)
        return self._combine(vals, cnts)

    def merge_(self, other: "MisraGries") -> "MisraGries":
        self.n += other.n
        return self._combine(other.ids, other.counts)

    def merge_many_(self, others) -> "MisraGries":
        """K-way fold: one concatenate + one trim. Removes no more counter
        mass per unit of undercount than the pairwise fold, so the
        (n - sum)/(k+1) bound holds identically (module docstring)."""
        others = list(others)
        if not others:
            return self
        self.n += sum(o.n for o in others)
        ids = np.concatenate([self.ids] + [o.ids for o in others])
        cnts = np.concatenate([self.counts] + [o.counts for o in others])
        self.ids = np.empty(0, dtype=np.int64)
        self.counts = np.empty(0, dtype=np.int64)
        return self._combine(ids, cnts)

    # -- queries --------------------------------------------------------------

    @property
    def err_bound(self) -> float:
        """Max undercount of any item's estimate (0 in exact mode)."""
        return (self.n - int(self.counts.sum())) / (self.cfg.k + 1)

    def estimate(self, item_ids: np.ndarray) -> np.ndarray:
        """Lower-bound count estimates for a batch of item ids (0 if
        absent); truth is within [est, est + err_bound] element-wise."""
        item_ids = item_ids.astype(np.int64, copy=False)
        pos = np.searchsorted(self.ids, item_ids)
        pos_c = np.clip(pos, 0, max(len(self.ids) - 1, 0))
        hit = (
            (pos < len(self.ids)) & (self.ids[pos_c] == item_ids)
            if len(self.ids)
            else np.zeros(len(item_ids), dtype=bool)
        )
        out = np.zeros(len(item_ids), dtype=np.int64)
        out[hit] = self.counts[pos_c[hit]]
        return out

    def top_items(self, limit: int) -> list[tuple[int, int]]:
        """(item, est) sorted by est desc then item asc; est is the
        retained counter (deterministic lower bound)."""
        if len(self.ids) == 0:
            return []
        order = np.lexsort((self.ids, -self.counts))[:limit]
        return [(int(self.ids[i]), int(self.counts[i])) for i in order]

    # -- serialization --------------------------------------------------------

    def serialize(self) -> bytes:
        import struct

        head = struct.pack("<qi", self.n, len(self.ids))
        return head + self.ids.astype("<i8").tobytes() + self.counts.astype("<i8").tobytes()

    @classmethod
    def deserialize(cls, cfg: FreqItemsConfig, data: bytes) -> "MisraGries":
        import struct

        n, m = struct.unpack_from("<qi", data, 0)
        out = cls(cfg)
        out.n = n
        out.ids = np.frombuffer(data, dtype="<i8", count=m, offset=12).copy()
        out.counts = np.frombuffer(data, dtype="<i8", count=m, offset=12 + 8 * m).copy()
        return out
