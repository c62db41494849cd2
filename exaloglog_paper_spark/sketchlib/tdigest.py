"""t-digest quantile sketch (Dunning & Ertl 2019, merging variant).

Mergeable quantile sketch with accuracy concentrated at the tails via the
k1 scale function k(q) = δ/(2π)·asin(2q-1). State = centroid (mean, weight)
arrays + exact min/max. Merge = concatenate + one compaction pass. The
compaction pass is a short Python loop over ≤ ~2δ centroids (never over raw
rows — inserts buffer into numpy arrays and compact wholesale).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np


@dataclass(frozen=True)
class TDigestConfig:
    delta: float = 200.0


class TDigest:
    __slots__ = ("cfg", "means", "weights", "_min", "_max", "_buf")

    def __init__(self, cfg: TDigestConfig):
        self.cfg = cfg
        self.means = np.empty(0, dtype=np.float64)
        self.weights = np.empty(0, dtype=np.float64)
        self._min = np.inf
        self._max = -np.inf
        self._buf: list[np.ndarray] = []

    # scale function k1 and its inverse q-limit logic
    def _k(self, q: np.ndarray) -> np.ndarray:
        return self.cfg.delta / (2 * np.pi) * np.arcsin(2 * q - 1)

    def _k_inv(self, k: np.ndarray) -> np.ndarray:
        return (np.sin(k * 2 * np.pi / self.cfg.delta) + 1) / 2

    def add_values(self, values: np.ndarray) -> "TDigest":
        values = np.asarray(values, dtype=np.float64)
        values = values[~np.isnan(values)]
        if len(values) == 0:
            return self
        self._min = min(self._min, float(values.min()))
        self._max = max(self._max, float(values.max()))
        self._buf.append(values)
        if sum(len(b) for b in self._buf) > 10 * self.cfg.delta:
            self._flush()
        return self

    def _flush(self) -> None:
        if not self._buf:
            return
        new = np.concatenate(self._buf)
        self._buf = []
        means = np.concatenate([self.means, new])
        weights = np.concatenate([self.weights, np.ones(len(new))])
        order = np.argsort(means, kind="stable")
        means, weights = means[order], weights[order]
        total = weights.sum()
        # single greedy pass (Algorithm 1 of Dunning & Ertl)
        out_m, out_w = [], []
        q0 = 0.0
        q_limit = self._k_inv(self._k(np.array([q0]))[0] + 1.0)
        cur_m, cur_w = means[0], weights[0]
        for m, w in zip(means[1:], weights[1:]):
            q = q0 + (cur_w + w) / total
            if q <= q_limit:
                cur_m += (m - cur_m) * w / (cur_w + w)
                cur_w += w
            else:
                out_m.append(cur_m)
                out_w.append(cur_w)
                q0 += cur_w / total
                q_limit = self._k_inv(self._k(np.array([q0]))[0] + 1.0)
                cur_m, cur_w = m, w
        out_m.append(cur_m)
        out_w.append(cur_w)
        self.means = np.array(out_m)
        self.weights = np.array(out_w)

    def merge_(self, other: "TDigest") -> "TDigest":
        if other.cfg != self.cfg:
            raise ValueError("t-digest configs differ")
        other._flush()
        self._flush()
        self._min = min(self._min, other._min)
        self._max = max(self._max, other._max)
        if len(other.means):
            self._buf = []
            means = np.concatenate([self.means, other.means])
            weights = np.concatenate([self.weights, other.weights])
            self.means, self.weights = means, weights
            order = np.argsort(self.means, kind="stable")
            self.means, self.weights = self.means[order], self.weights[order]
            # re-compact via flush machinery
            buf_m, buf_w = self.means, self.weights
            self.means = np.empty(0)
            self.weights = np.empty(0)
            self._merge_weighted(buf_m, buf_w)
        return self

    def _merge_weighted(self, means: np.ndarray, weights: np.ndarray) -> None:
        total = weights.sum()
        if total == 0:
            return
        out_m, out_w = [], []
        q0 = 0.0
        q_limit = self._k_inv(self._k(np.array([q0]))[0] + 1.0)
        cur_m, cur_w = means[0], weights[0]
        for m, w in zip(means[1:], weights[1:]):
            q = q0 + (cur_w + w) / total
            if q <= q_limit:
                cur_m += (m - cur_m) * w / (cur_w + w)
                cur_w += w
            else:
                out_m.append(cur_m)
                out_w.append(cur_w)
                q0 += cur_w / total
                q_limit = self._k_inv(self._k(np.array([q0]))[0] + 1.0)
                cur_m, cur_w = m, w
        out_m.append(cur_m)
        out_w.append(cur_w)
        self.means = np.array(out_m)
        self.weights = np.array(out_w)

    @property
    def n(self) -> float:
        return float(self.weights.sum()) + sum(len(b) for b in self._buf)

    def quantile(self, q) -> float | np.ndarray:
        self._flush()
        scalar = np.isscalar(q)
        qs = np.atleast_1d(np.asarray(q, dtype=np.float64))
        if len(self.means) == 0:
            out = np.full(len(qs), np.nan)
            return float(out[0]) if scalar else out
        total = self.weights.sum()
        cum = np.cumsum(self.weights) - self.weights / 2
        targets = qs * total
        out = np.interp(targets, cum, self.means, left=self._min, right=self._max)
        return float(out[0]) if scalar else out

    def serialize(self) -> bytes:
        import struct

        self._flush()
        hdr = struct.pack("<ddi", self._min, self._max, len(self.means))
        return hdr + self.means.astype("<f8").tobytes() + self.weights.astype("<f8").tobytes()

    @classmethod
    def deserialize(cls, cfg: TDigestConfig, data: bytes) -> "TDigest":
        import struct

        mn, mx, n = struct.unpack_from("<ddi", data, 0)
        off = struct.calcsize("<ddi")
        td = cls(cfg)
        td._min, td._max = mn, mx
        td.means = np.frombuffer(data, dtype="<f8", count=n, offset=off).copy()
        td.weights = np.frombuffer(data, dtype="<f8", count=n, offset=off + 8 * n).copy()
        return td
