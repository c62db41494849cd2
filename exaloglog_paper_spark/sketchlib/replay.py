"""Exact vectorized replay of sequential ExaLogLog streams.

The martingale (HIP) estimator is defined sequentially — every insert that
changes sketch state adds ``1/P`` where P is the current state-change
probability (≙ ExaLogLog.java add(long, MartingaleEstimator) +
MartingaleEstimator.java). A per-element Python loop would be the
forbidden slow path, but the sequential semantics are replayable in bulk:
a register's state can only change at the FIRST arrival of each
(update value k, register idx) pair — duplicates are provably no-ops
(u only grows; a history bit is set at most once per value, and values
below the window can never re-enter it). So the complete trajectory,
including every martingale decrement, is a function of the per-pair
first-hit positions, all recoverable with vectorized numpy:

- first hits: one reversed fancy assignment over the hashed stream
  (last write wins → first occurrence);
- per-register replay: one pass over the K possible update values in
  first-hit order (running max + history bitfield per the add semantics);
- probabilities: each state change's decrement is an EXACT uint64-scaled
  integer (difference of Algorithm-3 register contributions, via lookup
  tables), and P before event i is ``(A_final + Σ_{j≥i} dec_j)·2^-64`` —
  an exact tail-sum identity (the decrements telescope register-wise to
  a(empty) - a(final)), immune to the catastrophic 1-minus-cumsum
  cancellation a naive vectorization hits once P ~ 1e-15.

Equality with the sequential ``martingale.add_hashes_martingale`` loop is
pinned by tests (same stream → same estimate to float tolerance; identical
register bytes). Used by the per-partition martingale query operator and
by the reference-fidelity Monte-Carlo harness (experiments/replay.py).
"""

from __future__ import annotations

import math

import numpy as np

from .bitops import ONE, U64, ZERO, as_u64, rshift_clamped
from .exaloglog import hash_to_idx_k


def _event_luts(t: int, d: int, p: int):
    """Per-update-value lookup tables for the replay.

    - ``pw[k]`` = 2^((-p-φ(k)) & 63): the uint64-scaled probability that a
      random hash produces exactly (k, fixed idx) — the martingale
      decrement of a history-bit set (the bit-set branch of
      ExaLogLog.java add(long, MartingaleEstimator)).
    - ``om[u]`` = omega_scaled(u): the u-dependent term of a register's
      change-probability contribution (Algorithm 3 / contribute_reference).
    - ``factor[k]`` = m·2^φ(k): the geometric scale of a sampled first-hit
      cardinality of (k, idx) (≙ TestUtils.generateTransitions).
    """
    m = 1 << p
    k_max = (65 - p - t) << t

    def phi(k: int) -> int:
        return t if k == 0 else min(t + 1 + ((k - 1) >> t), 64 - p)

    pw = np.zeros(k_max + 1, np.uint64)
    om = np.zeros(k_max + 1, np.uint64)
    factor = np.zeros(k_max + 1, np.float64)
    for k in range(k_max + 1):
        j = phi(k)
        om[k] = ((((1 - t + j) << t) - k) << ((-p - j) & 63)) & 0xFFFFFFFFFFFFFFFF
        if k >= 1:
            pw[k] = 1 << ((-p - j) & 63)
            factor[k] = m * math.ldexp(1.0, j)
    return k_max, pw, om, factor


def _a_scaled(u: np.ndarray, b: np.ndarray, pw: np.ndarray, om: np.ndarray, d: int) -> np.ndarray:
    """uint64-scaled change-probability contribution a(u, B) per register
    (≙ contribute_reference / Algorithm 3): omega(u) plus pw[k] for every
    UNSET history bit of a value k in [max(1, u-d), u-1]. Bounded by
    2^(64-p), so the sum never wraps."""
    a = om[u]
    for off in range(1, d + 1):
        k = u - off
        valid = k >= 1
        unset = (b >> U64(d - off)) & ONE == ZERO
        a = a + np.where(valid & unset, pw[np.maximum(k, 0)], ZERO)
    return a


def _u64_to_f64(x: np.ndarray) -> np.ndarray:
    """Exact uint64 -> float64 via 32-bit halves (uint64 astype float64 is
    a numpy scalar loop — see bitops.nlz64 note)."""
    return (x >> U64(32)).astype(np.uint32).astype(np.float64) * 4294967296.0 + (
        x & U64(0xFFFFFFFF)
    ).astype(np.uint32).astype(np.float64)


def replay_first_hits(
    counts: np.ndarray,  # (R, K) float64 first-hit cardinality of value k=col+1
    t: int,
    d: int,
    p: int,
    luts=None,
    collect_b_deltas: bool = False,
):
    """Replay per-register event streams given per-(register, value)
    first-hit cardinalities (+inf = never hit; such phantom events sort
    after every real one and cannot perturb any earlier P — the tail-sum
    identity telescopes over arbitrary suffixes). Returns
    ``(cs, u_traj, b_traj, dec)``: per-register events sorted by
    cardinality, the register state AFTER each event, and the
    uint64-scaled martingale decrement of each event (0 for no-ops).

    With ``collect_b_deltas=True`` a fifth element is returned: the sparse
    event-deltas of the ML b-histogram (contribute's per-register
    ``b[phi(k)-t-1]`` cells, ≙ exaloglog.contribute_reference), as
    ``(rows, cnts, cells, wgts)`` int64/float64/int16/int8 arrays. The
    b-histogram of the register set at any cardinality c is then the
    EXACT integer sum of the deltas with cnt <= c — each history value's
    cell is added once (direct hit in window, or the old-u entry migrating
    to a history bit, which lands on the same phi cell so the u-entry only
    moves when the value leaves the window) and removed at most once (bit
    shifted out). This turns the per-rung b computation from O(m·rungs)
    register scans into O(events) bookkeeping."""
    if luts is None:
        luts = _event_luts(t, d, p)
    k_max, pw, om, _factor = luts
    R, K = counts.shape
    assert K == k_max
    q = 63 - t - p

    order = np.argsort(counts, axis=1, kind="stable")
    cs = np.take_along_axis(counts, order, axis=1)
    kv = (order + 1).astype(np.int64)

    # cell[k] = phi(k)-t-1 = min((k-1)>>t, q)  (the contribute b index)
    cell_lut = np.minimum((np.arange(k_max + 1, dtype=np.int64) - 1) >> t, q)
    del_rows: list[np.ndarray] = []
    del_cnts: list[np.ndarray] = []
    del_cells: list[np.ndarray] = []
    del_wgts: list[np.ndarray] = []

    def emit(rows_, cnts_, cells_, w):
        del_rows.append(rows_.astype(np.int64, copy=False))
        del_cnts.append(cnts_)
        del_cells.append(cells_.astype(np.int16, copy=False))
        del_wgts.append(
            np.full(len(rows_), w, np.int8) if np.isscalar(w) else w
        )

    u = np.zeros(R, np.int64)
    b = np.zeros(R, np.uint64)
    u_traj = np.empty((R, K), np.int32)
    b_traj = np.empty((R, K), np.uint64)
    dec = np.zeros((R, K), np.uint64)
    # new-max events: defer the a(u,B) evaluations and batch them AFTER the
    # column loop — two _a_scaled calls over all events instead of two per
    # column (the per-column form was ~440 numpy dispatches on ~R-row
    # slices and dominated the whole replay; identical uint64 arithmetic,
    # so the decrements are byte-identical — pinned by the replay-vs-loop
    # tests)
    ev_rows: list[np.ndarray] = []
    ev_cols: list[int] = []
    ev_u_old: list[np.ndarray] = []
    ev_b_old: list[np.ndarray] = []
    ev_u_new: list[np.ndarray] = []
    ev_b_new: list[np.ndarray] = []
    for j in range(K):
        kj = kv[:, j]
        nm = np.flatnonzero(kj > u)
        if nm.size:
            ev_rows.append(nm)
            ev_cols.append(j)
            ev_u_old.append(u[nm])
            ev_b_old.append(b[nm])
            if collect_b_deltas:
                u_old = u[nm]
                b_old = b[nm]
                delta_n = kj[nm] - u_old
                cnt_n = cs[nm, j]
                # new u-entry at cell[k_new]
                emit(nm, cnt_n, cell_lut[kj[nm]], 1)
                # old u-entry: cancels against its new history bit (same
                # phi cell) while u_old stays in the window; emit -1 only
                # when it leaves (delta > d) — or when u_old == 0 (no entry)
                drop = np.flatnonzero((u_old >= 1) & (delta_n > d))
                if drop.size:
                    emit(nm[drop], cnt_n[drop], cell_lut[u_old[drop]], -1)
                # direct history bits shifted out: position pos < delta
                # (value v = u_old-d+pos < k_new-d)
                ones = (
                    ONE << np.minimum(delta_n, d).astype(np.uint64)
                ) - ONE
                lost = b_old & ones
                pos = 0
                while pos < d and (lost != ZERO).any():
                    hit = np.flatnonzero(lost & ONE != ZERO)
                    if hit.size:
                        v = u_old[hit] - d + pos
                        ok = np.flatnonzero(v >= 1)
                        if ok.size:
                            emit(
                                nm[hit[ok]], cnt_n[hit[ok]],
                                cell_lut[v[ok]], -1,
                            )
                    lost >>= ONE
                    pos += 1
            delta = (kj[nm] - u[nm]).astype(np.uint64)
            b[nm] = rshift_clamped((ONE << U64(d)) | b[nm], delta)
            u[nm] = kj[nm]
            ev_u_new.append(u[nm])
            ev_b_new.append(b[nm])
        off = u - kj
        bs = np.flatnonzero((off > 0) & (off <= d))
        if bs.size:
            b[bs] |= ONE << (U64(d) - off[bs].astype(np.uint64))
            dec[bs, j] = pw[kv[bs, j]]
            if collect_b_deltas:
                emit(bs, cs[bs, j], cell_lut[kv[bs, j]], 1)
        u_traj[:, j] = u
        b_traj[:, j] = b
    if ev_rows:
        rows_all = np.concatenate(ev_rows)
        cols_all = np.concatenate(
            [np.full(len(r), c, np.int64) for r, c in zip(ev_rows, ev_cols)]
        )
        a_old_all = _a_scaled(
            np.concatenate(ev_u_old), np.concatenate(ev_b_old), pw, om, d
        )
        a_new_all = _a_scaled(
            np.concatenate(ev_u_new), np.concatenate(ev_b_new), pw, om, d
        )
        dec[rows_all, cols_all] = a_old_all - a_new_all
    if not collect_b_deltas:
        return cs, u_traj, b_traj, dec
    if del_rows:
        bdel = (
            np.concatenate(del_rows),
            np.concatenate(del_cnts),
            np.concatenate(del_cells),
            np.concatenate(del_wgts),
        )
    else:
        bdel = (
            np.empty(0, np.int64), np.empty(0, np.float64),
            np.empty(0, np.int16), np.empty(0, np.int8),
        )
    return cs, u_traj, b_traj, dec, bdel


def martingale_curve(
    cs: np.ndarray,  # (C, E) per-cycle globally count-sorted event cardinalities
    dec: np.ndarray,  # (C, E) uint64 decrements in the same order
    a_final_sum: np.ndarray,  # (C,) uint64 Σ a(final register states) per cycle
) -> np.ndarray:
    """Cumulative martingale estimate after each event, with EXACT change
    probabilities: P before event i is (a_final_sum + Σ_{j>=i} dec_j)·2^-64
    — an exact uint64 tail identity. The all-events sum is 2^64 exactly for
    a saturating replay and wraps to 0 for the first event (P=1)."""
    S = np.cumsum(dec[:, ::-1], axis=1)[:, ::-1]  # uint64, mod 2^64
    P_scaled = S + a_final_sum[:, None]
    Pf = _u64_to_f64(P_scaled) * 2.0**-64
    Pf[:, 0:1] = np.where(P_scaled[:, 0:1] == ZERO, 1.0, Pf[:, 0:1])
    with np.errstate(divide="ignore"):
        inc = np.where(dec > ZERO, 1.0 / Pf, 0.0)
    return np.cumsum(inc, axis=1)


class StreamingFirstHits:
    """Bounded-memory incremental first-hit accumulator for ONE sequential
    hash stream fed in chunks (e.g. the Arrow batches of a Spark
    partition).

    State is O(m·K) — the per-(register, update value) first-hit position
    table — independent of stream length, so a partition-long stream's
    martingale estimate never materializes the partition. Chunking is
    invisible by construction: first-hit positions are a function of the
    concatenated stream only (a pair already hit keeps its earlier
    position), so ``estimate`` after any chunking equals
    :func:`martingale_estimate_stream` on the whole array (pinned by
    tests/test_replay chunk-vs-whole). The sequential semantics stay
    per-stream exactly as the reference prescribes
    (MartingaleEstimator.java javadoc: not for distributed merging) —
    this class bounds MEMORY, it does not merge streams.
    """

    def __init__(self, t: int, d: int, p: int, luts=None):
        if luts is None:
            luts = _event_luts(t, d, p)
        self.t, self.d, self.p = t, d, p
        self.luts = luts
        self.k_max = luts[0]
        self.m = 1 << p
        self.first = np.zeros(self.m * self.k_max, np.float64)
        self._tmp = np.empty(self.m * self.k_max, np.float64)
        self.n = 0

    # internal chunk size: the per-element work (hash_to_idx_k -> key ->
    # scatter) runs ~1.5x faster when the intermediate arrays stay
    # cache-resident (44 -> 30 ns/element at 2M on this box, same curve as
    # add_hashes' 256k chunking); chunking is invisible by construction —
    # first-hit positions depend only on the concatenated stream (pinned by
    # the arbitrary-chunking property test)
    _CHUNK = 512 * 1024

    def update(self, hashes: np.ndarray) -> None:
        h = as_u64(np.asarray(hashes))
        if len(h) > self._CHUNK:
            for s in range(0, len(h), self._CHUNK):
                self._update_chunk(h[s : s + self._CHUNK])
            return
        self._update_chunk(h)

    def _update_chunk(self, h: np.ndarray) -> None:
        if len(h) == 0:
            return
        idx, k = hash_to_idx_k(h, self.t, self.p)
        key = idx.astype(np.int64) * self.k_max + (k.astype(np.int64) - 1)
        # absolute 1-based position in the concatenated stream
        pos = np.arange(self.n + 1, self.n + len(h) + 1, dtype=np.float64)
        tmp = self._tmp
        tmp.fill(0.0)
        tmp[key[::-1]] = pos[::-1]  # last write wins -> first occurrence
        new = (self.first == 0.0) & (tmp > 0.0)
        self.first[new] = tmp[new]
        self.n += len(h)

    def _replay(self):
        t, d, p = self.t, self.d, self.p
        k_max, pw, om, _factor = self.luts
        counts = np.where(self.first > 0, self.first, np.inf).reshape(
            self.m, self.k_max
        )
        cs, u_traj, b_traj, dec = replay_first_hits(counts, t, d, p, self.luts)
        flat_c = cs.ravel()
        flat_d = dec.ravel()
        o = np.argsort(flat_c, kind="stable")
        gcnt = flat_c[o]
        gdec = flat_d[o]
        a_fin = _a_scaled(u_traj[:, -1].astype(np.int64), b_traj[:, -1], pw, om, d)
        a_sum = a_fin.sum(dtype=np.uint64)
        mart = martingale_curve(
            gcnt[None, :], gdec[None, :], np.array([a_sum], np.uint64)
        )[0]
        j = int(np.searchsorted(gcnt, float(self.n), side="right")) - 1
        mart_est = float(mart[j]) if j >= 0 else 0.0
        # register state at prefix n — the trajectory's LAST column also
        # contains phantom (count=+inf, never-hit) events, which are
        # harmless for the martingale tail sums but would saturate the
        # register image; take each register's last REAL event instead
        jj = (cs <= float(self.n)).sum(axis=1) - 1
        jc = np.clip(jj, 0, cs.shape[1] - 1)
        ridx = np.arange(cs.shape[0])
        regs = np.where(
            jj < 0,
            np.uint64(0),
            (u_traj[ridx, jc].astype(np.uint64) << U64(self.d))
            | b_traj[ridx, jc],
        )
        return mart_est, regs

    def martingale_estimate(self) -> float:
        if self.n == 0:
            return 0.0
        return self._replay()[0]

    def estimates(self) -> tuple[float, float]:
        """(martingale HIP estimate, ML estimate) of the stream so far."""
        from .exaloglog import contribute_vec_batch, estimate_from_coefficients

        t, d, p = self.t, self.d, self.p
        if self.n == 0:
            return 0.0, 0.0
        mart_est, regs = self._replay()
        agg, bhist = contribute_vec_batch(regs[None, :], t, d, p)
        ml_est = float(estimate_from_coefficients(agg, bhist, t, d, p)[0])
        return mart_est, ml_est


def martingale_estimate_stream(
    hashes: np.ndarray, t: int, d: int, p: int, luts=None
) -> float:
    """Martingale (HIP) distinct-count estimate of one sequential hash
    stream — the vectorized equivalent of feeding every element through
    ``martingale.add_hashes_martingale`` in order (pinned by tests), at
    batch speed: O(n) hashing + one O(m·K) replay, no per-element Python.

    Order-dependent by definition — per-partition / per-group streams only,
    exactly as the reference prescribes for its martingale estimator
    (MartingaleEstimator.java javadoc: not for distributed merging). For
    streams too large to hold in one array, feed chunks through
    :class:`StreamingFirstHits` instead — identical result by
    construction.
    """
    acc = StreamingFirstHits(t, d, p, luts)
    acc.update(hashes)
    return acc.martingale_estimate()
