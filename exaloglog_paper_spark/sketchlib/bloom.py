"""Bloom filter (Bloom 1970), numpy-vectorized, mergeable by bitwise OR.

k hash positions per element via double hashing (Kirsch & Mitzenmacher
2006): pos_i = (h1 + i·h2) mod m. False-positive rate ≈ (1 - e^{-kn/m})^k;
no false negatives — both properties are tested against the formula.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np

from .bitops import U64, as_u64, splitmix64


@dataclass(frozen=True)
class BloomConfig:
    num_bits: int = 1 << 20
    num_hashes: int = 7

    @classmethod
    def for_capacity(cls, n: int, fpr: float = 0.01) -> "BloomConfig":
        m = int(math.ceil(-n * math.log(fpr) / (math.log(2) ** 2)))
        m = (m + 63) & ~63
        k = max(1, round(m / n * math.log(2)))
        return cls(num_bits=m, num_hashes=k)

    def expected_fpr(self, n: int) -> float:
        return (1 - math.exp(-self.num_hashes * n / self.num_bits)) ** self.num_hashes


class BloomFilter:
    __slots__ = ("cfg", "bits", "n_added")

    def __init__(self, cfg: BloomConfig, bits: np.ndarray | None = None, n_added: int = 0):
        self.cfg = cfg
        self.bits = bits if bits is not None else np.zeros(cfg.num_bits >> 3, dtype=np.uint8)
        self.n_added = n_added

    def _positions(self, hashes: np.ndarray) -> np.ndarray:
        h1 = as_u64(hashes)
        h2 = splitmix64(h1) | U64(1)
        rows = np.arange(self.cfg.num_hashes, dtype=np.uint64)[:, None]
        return ((h1[None, :] + rows * h2[None, :]) % U64(self.cfg.num_bits)).ravel()

    def add_hashes(self, hashes: np.ndarray) -> "BloomFilter":
        if len(hashes) == 0:
            return self
        pos = self._positions(hashes)
        byte_idx = (pos >> U64(3)).astype(np.int64)
        bit = (U64(1) << (pos & U64(7))).astype(np.uint8)
        np.bitwise_or.at(self.bits, byte_idx, bit)
        self.n_added += len(hashes)
        return self

    def contains_hashes(self, hashes: np.ndarray) -> np.ndarray:
        if len(hashes) == 0:
            return np.zeros(0, dtype=bool)
        pos = self._positions(hashes).reshape(self.cfg.num_hashes, len(hashes))
        byte_idx = (pos >> U64(3)).astype(np.int64)
        bit = (U64(1) << (pos & U64(7))).astype(np.uint8)
        hit = (self.bits[byte_idx] & bit) != 0
        return hit.all(axis=0)

    def merge_(self, other: "BloomFilter") -> "BloomFilter":
        if other.cfg != self.cfg:
            raise ValueError("bloom configs differ")
        self.bits |= other.bits
        self.n_added += other.n_added
        return self

    def serialize(self) -> bytes:
        import struct

        return struct.pack("<q", self.n_added) + self.bits.tobytes()

    @classmethod
    def deserialize(cls, cfg: BloomConfig, data: bytes) -> "BloomFilter":
        import struct

        (n_added,) = struct.unpack_from("<q", data, 0)
        bits = np.frombuffer(data, dtype=np.uint8, offset=8).copy()
        if len(bits) != cfg.num_bits >> 3:
            raise ValueError("unexpected state length!")
        return cls(cfg, bits, n_added)
