"""Theta (KMV — k-th minimum value) sketch, numpy-vectorized.

Mergeable distinct-count sketch whose retained state is the set of the k
SMALLEST 64-bit hash values seen (Bar-Yossef et al. 2002; Beyer et al.
2007; generalized as the theta-sketch framework behind Apache
DataSketches). Unlike register sketches (ExaLogLog/HLL), a KMV state is a
uniform random SAMPLE of the distinct hash universe below a threshold
theta, so SET ALGEBRA is native: intersection and difference estimates
come from sampling the common region below min(theta_A, theta_B), with
error that scales with the INTERSECTION size — where register-sketch
inclusion-exclusion (ops/rollup.estimate_intersection) carries the error
of the UNION and collapses for small overlaps.

The reference library has no set-algebra sketch; this is a companion
under the same mergeable-UDAF protocol (BASELINE.json north_rule), like
count-min/KLL/t-digest/Bloom.

Merge algebra (the distributed-correctness contract): the k smallest of
A ∪ B are each among the k smallest of their own side, so
``kmin_k(kmin_k(A) ∪ kmin_k(B)) == kmin_k(A ∪ B)`` EXACTLY — the state
is a pure order-free function of the input hash SET, and the canonical
serialization (sorted unique ``<u8``) is byte-identical under any
partitioning, chunking, or merge tree.

Estimators (hashes mapped to u = h / 2^64 ∈ [0, 1)):
- exact mode (< k retained): estimate = count (hash-collision-exact).
- saturated: the k-th minimum U_(k) is Beta(k, n-k+1)-distributed;
  E[(k-1)/U_(k)] = n, so ``(k-1) / U_(k)`` is the unbiased KMV
  estimator with RSE 1/sqrt(k-2) (Beyer et al. 2007, Thm. 1).
- intersection/difference: theta = min over operands of (U_(k) if
  saturated else 1); retained common/one-sided hashes strictly below
  theta form a Binomial(n_op, theta) sample, so ``count / theta`` is
  unbiased with var = n_op(1-theta)/theta.
"""

from __future__ import annotations

import numpy as np

_TWO64 = float(2.0**64)


def kmin_update(state: np.ndarray, hashes: np.ndarray, k: int) -> np.ndarray:
    """Fold a batch of uint64 hashes into a KMV state (sorted unique
    ``uint64``, length <= k). Pure set function: any chunking/ordering of
    the input stream yields the identical array."""
    merged = np.union1d(state, hashes.astype(np.uint64, copy=False))
    return merged[:k] if len(merged) > k else merged


def kmin_merge(a: np.ndarray, b: np.ndarray, k: int) -> np.ndarray:
    return kmin_update(a, b, k)


def kmin_merge_many(states, k: int) -> np.ndarray:
    """K-way fold: one concatenate + unique — byte-identical to the
    pairwise fold (union is associative/commutative and trimming to the k
    smallest commutes with union for KMV states)."""
    states = [s for s in states if len(s)]
    if not states:
        return np.empty(0, dtype=np.uint64)
    merged = np.unique(np.concatenate(states))
    return merged[:k] if len(merged) > k else merged


def theta_of(state: np.ndarray, k: int) -> float:
    """Sampling threshold of a state: 1.0 in exact mode, else the k-th
    minimum as a fraction of 2^64 (values >= theta were discarded)."""
    if len(state) < k:
        return 1.0
    return float(state[k - 1]) / _TWO64


def estimate_distinct(state: np.ndarray, k: int) -> float:
    """Unbiased KMV distinct-count estimate."""
    if len(state) < k:
        return float(len(state))
    return (k - 1) / (float(state[k - 1]) / _TWO64)


def estimate_set_ops(a: np.ndarray, b: np.ndarray, k: int) -> dict:
    """Intersection / difference estimates for two same-k KMV states.

    Returns estimates plus one-sigma errors: every retained hash below
    ``theta = min(theta_A, theta_B)`` is an independent theta-probability
    sample of its population, so count/theta is unbiased with
    var = n(1-theta)/theta (exact-mode theta == 1 degenerates to exact
    counts with zero error).
    """
    theta = min(theta_of(a, k), theta_of(b, k))
    thr = np.uint64(int(theta * _TWO64)) if theta < 1.0 else None
    common = np.intersect1d(a, b)
    only_a = np.setdiff1d(a, b)
    if thr is not None:
        common = common[common < thr]
        only_a = only_a[only_a < thr]
    est_inter = len(common) / theta
    est_diff = len(only_a) / theta
    sigma = lambda n_est: float(np.sqrt(max(n_est, 1.0) * (1.0 - theta) / theta))
    return {
        "theta": theta,
        "intersection": est_inter,
        "difference": est_diff,
        "intersection_sigma": sigma(est_inter),
        "difference_sigma": sigma(est_diff),
    }
