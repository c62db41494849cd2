"""Vectorized 64-bit integer primitives (numpy 1.26-safe).

These are the numpy counterparts of the bit-twiddling helpers the reference
uses on the JVM (``DistinctCountUtil.java:266-274`` unsignedLongToDouble/pow2,
``Long.numberOfLeadingZeros`` / ``Long.bitCount`` intrinsics). We target
numpy 1.26 where ``np.bitwise_count`` does not exist and scalar/array
promotion of uint64 is finicky, so every constant is pre-wrapped as uint64.

Design rule for the whole sketchlib: *vectors* are ``np.uint64`` arrays and
all bit math happens through the helpers here; *scalars* (solver, config
math) use plain Python ints, which are arbitrary-precision and safe.
"""

from __future__ import annotations

import sys

import numpy as np

# The windowed-gather register unpack fast paths reinterpret byte windows
# via .view(np.uint64), which is only correct little-endian; on a
# (hypothetical) big-endian host they transparently fall back to the
# unpackbits path instead of silently decoding garbage.
_LITTLE_ENDIAN = sys.byteorder == "little"

U64 = np.uint64
MASK64 = U64(0xFFFFFFFFFFFFFFFF)
ZERO = U64(0)
ONE = U64(1)

_M1 = U64(0x5555555555555555)
_M2 = U64(0x3333333333333333)
_M4 = U64(0x0F0F0F0F0F0F0F0F)
_H01 = U64(0x0101010101010101)

# splitmix64 constants (public domain PRNG finalizer; equivalent hash quality
# to the murmur3 the reference benchmarks with, SketchConfig.java:343)
_SM_GAMMA = U64(0x9E3779B97F4A7C15)
_SM_MUL1 = U64(0xBF58476D1CE4E5B9)
_SM_MUL2 = U64(0x94D049BB133111EB)


def as_u64(x) -> np.ndarray:
    """View/convert *x* to a uint64 array without changing bits for int64."""
    a = np.asarray(x)
    if a.dtype == np.uint64:
        return a
    if a.dtype in (np.int64,):
        return a.view(np.uint64)
    return a.astype(np.uint64)


def popcount64(x: np.ndarray) -> np.ndarray:
    """Per-element population count of a uint64 array (SWAR)."""
    x = x - ((x >> ONE) & _M1)
    x = (x & _M2) + ((x >> U64(2)) & _M2)
    x = (x + (x >> U64(4))) & _M4
    return (x * _H01) >> U64(56)


def nlz64(x: np.ndarray) -> np.ndarray:
    """Per-element number of leading zeros of a uint64 array.

    Exact for all 2^64 inputs via the float64 exponent of the value's
    nonzero 32-bit half: uint32 always fits the 53-bit mantissa exactly, so
    the conversion can never round across a power of two (which is what
    makes a naive ``log2`` on the full 64 bits wrong near 2^63). uint32 ->
    float64 is SIMD-vectorized on numpy 1.26 where uint64 -> float64 is a
    scalar loop (~10x slower).
    """
    hi = (x >> U64(32)).astype(np.uint32)
    lo = x.astype(np.uint32)  # truncating cast = low 32 bits
    use_hi = hi != 0
    v = np.where(use_hi, hi, lo)
    # uint32 < 2^53 converts to float64 exactly -> frexp exponent == bit length
    _, e = np.frexp(v.astype(np.float64))
    bitlen = e.astype(np.int64) + (use_hi.astype(np.int64) << 5)
    return (64 - bitlen).astype(np.uint64)


def splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 hash: uniform 64-bit hash of uint64 input.

    Implements the full stream form h(x) = finalize(x·γ + γ) (Vigna 2015,
    public domain), not the bare finalizer: the γ pre-multiplication is what
    decorrelates *consecutive/low-entropy* inputs (counter streams, token
    ids). With the bare finalizer, ExaLogLog estimates over counter streams
    showed a systematic -3% bias; with the γ step the empirical rmse matches
    the reference's published curve (see tests/test_error_simulation.py).
    """
    with np.errstate(over="ignore"):
        z = as_u64(x) * _SM_GAMMA + _SM_GAMMA
        z = (z ^ (z >> U64(30))) * _SM_MUL1
        z = (z ^ (z >> U64(27))) * _SM_MUL2
        return z ^ (z >> U64(31))


def splitmix64_stream(seed: int, n: int, offset: int = 0) -> np.ndarray:
    """Deterministic stream of n 64-bit hashes: splitmix64(seed + i)."""
    idx = np.arange(offset, offset + n, dtype=np.uint64)
    with np.errstate(over="ignore"):
        return splitmix64(idx + U64(seed & 0xFFFFFFFFFFFFFFFF))


def rshift_clamped(v: np.ndarray, s: np.ndarray) -> np.ndarray:
    """``v >>> s`` with Java's shiftRight(s>=64)->0 semantics.

    Mirrors ``ExaLogLog.java:288-294`` (shiftRight). numpy's >> is undefined
    for shifts >= 64, so clamp then mask.
    """
    s_c = np.minimum(s, U64(63)).astype(np.uint64)
    out = v >> s_c
    return np.where(s <= U64(63), out, ZERO)


def lshift_clamped(v: np.ndarray, s: np.ndarray) -> np.ndarray:
    """``v << s`` returning 0 where s >= 64."""
    s_c = np.minimum(s, U64(63)).astype(np.uint64)
    out = v << s_c
    return np.where(s <= U64(63), out, ZERO)


def unsigned_to_double(x: int) -> float:
    """Unsigned 64-bit value -> float, ≙ DistinctCountUtil.java:266-270."""
    return float(x & 0xFFFFFFFFFFFFFFFF)


def pow2(x: int) -> float:
    """Exact power of two, ≙ DistinctCountUtil.java:272-274."""
    import math

    return math.ldexp(1.0, x)


def pack_registers(regs: np.ndarray, width: int) -> bytes:
    """Bit-pack *regs* (uint64, little-endian bit order) at `width` bits each.

    Produces exactly ``((width << p) + 7) >> 3`` bytes for ``m = 2^p``
    registers — the same state size as the reference's PackedArray-backed
    ``getState()`` (``ExaLogLog.java:93,182-185``), preserving its at-rest /
    on-shuffle space advantage.
    """
    m = len(regs)
    shifts = np.arange(width, dtype=np.uint64)
    bits = ((regs[:, None] >> shifts) & ONE).astype(np.uint8)
    packed = np.packbits(bits.ravel(), bitorder="little")
    want = ((width * m) + 7) >> 3
    return packed[:want].tobytes()


def pack_registers_batch(regs2d: np.ndarray, width: int) -> np.ndarray:
    """Batched :func:`pack_registers`: (B, m) uint64 -> (B, nbytes) uint8.

    Word-level pack, no per-bit expansion: register i's bits live at
    bit-position i*width, i.e. OR ``reg << rem`` into output word
    ``(i*width) >> 6`` and the spill ``reg >> (64-rem)`` into the next —
    m in-cache vector ops over the batch instead of m*width expanded bit
    bytes. Little-endian hosts only (enforced below): viewing the uint64
    word array as bytes yields exactly the scalar pack's
    ``packbits(bitorder="little")`` layout — byte-identical rows, pinned
    by test. This is the serialization stage of a high-group-cardinality
    partial flush (16k+ states per emit); ~5x the scalar pack per state.
    Memory-bounded via ~64 MB sub-batches.
    """
    B, m = regs2d.shape
    nbits = m * width
    nwords = (nbits + 63) >> 6
    want = (nbits + 7) >> 3
    if not _LITTLE_ENDIAN:
        return np.stack(
            [np.frombuffer(pack_registers(r, width), np.uint8) for r in regs2d]
        )
    out = np.empty((B, want), np.uint8)
    step = max(1, (1 << 26) // max(1, m * 8))
    for s in range(0, B, step):
        chunk = regs2d[s : s + step]
        R = np.ascontiguousarray(chunk.T)  # (m, b): contiguous per-register rows
        W = np.zeros((nwords + 1, len(chunk)), np.uint64)
        for i in range(m):
            bitpos = i * width
            w = bitpos >> 6
            rem = bitpos & 63
            reg = R[i]
            W[w] |= reg << U64(rem)
            if rem + width > 64:
                W[w + 1] |= reg >> U64(64 - rem)
        packed = np.ascontiguousarray(W[:nwords].T).view(np.uint8)
        out[s : s + step] = packed.reshape(len(chunk), nwords * 8)[:, :want]
    return out


def unpack_registers(data: bytes, width: int, m: int) -> np.ndarray:
    """Inverse of :func:`pack_registers`.

    width <= 57 takes the windowed-gather fast path (8-byte little-endian
    window per register, shift + mask) — ``wrap`` sits on the merge hot path
    of every distributed aggregation, so no per-bit expansion here. The
    fast path requires a little-endian host (enforced, see
    ``_LITTLE_ENDIAN``); otherwise the unpackbits path below is used."""
    raw = np.frombuffer(data, dtype=np.uint8)
    if width <= 57 and _LITTLE_ENDIAN:
        buf = np.concatenate([raw, np.zeros(8, dtype=np.uint8)])
        bitpos = np.arange(m, dtype=np.int64) * width
        byte_off = bitpos >> 3
        bit_rem = (bitpos & 7).astype(np.uint64)
        windows = np.ascontiguousarray(buf[byte_off[:, None] + np.arange(8)])
        w64 = windows.reshape(m * 8).view(np.uint64)  # little-endian platform
        return (w64 >> bit_rem) & ((ONE << U64(width)) - ONE)
    bits = np.unpackbits(raw, count=width * m, bitorder="little")
    weights = ONE << np.arange(width, dtype=np.uint64)
    return (bits.reshape(m, width).astype(np.uint64) * weights).sum(
        axis=1, dtype=np.uint64
    )


def unpack_registers_batch(data2d: "np.ndarray", width: int, m: int) -> "np.ndarray":
    """Batched :func:`unpack_registers`: (B, nbytes) uint8 -> (B, m) uint64.

    Fast path (width <= 57): gather the 8-byte little-endian window covering
    each register and shift/mask — no per-bit expansion, ~100x faster than
    unpackbits at ELL register widths. This is the deserialization stage of
    batched estimation over many group states.
    """
    # width > 57: a 64-bit window can't span bit_rem + width bits;
    # big-endian: the .view(uint64) reinterpretation would be wrong
    if width > 57 or not _LITTLE_ENDIAN:
        return np.stack(
            [unpack_registers(row.tobytes(), width, m) for row in data2d]
        )
    B = len(data2d)
    buf = np.concatenate([data2d, np.zeros((B, 8), dtype=np.uint8)], axis=1)
    bitpos = np.arange(m, dtype=np.int64) * width
    byte_off = bitpos >> 3
    bit_rem = (bitpos & 7).astype(np.uint64)
    windows = np.ascontiguousarray(
        buf[:, byte_off[:, None] + np.arange(8)]
    )  # (B, m, 8) uint8
    w64 = windows.reshape(B, m * 8).view(np.uint64)  # little-endian platform
    return (w64 >> bit_rem) & ((ONE << U64(width)) - ONE)
