"""Maximum-likelihood solver for generalized-HLL coefficient systems.

Maximizes  e^{-x·a} · Π_{j=0..n} (1 - e^{-x/2^j})^{b[j]}  — Algorithm 8 of
the ExaLogLog paper, reimplemented in Python from the published description
(reference: ``DistinctCountUtil.java:61-130``). The closed-form seed plus a
damped Newton iteration with expm1/log1p numerics converges in ~2-4
iterations (observed solver-iteration stats in the reference's
``results/error/*.csv``), so a scalar Python implementation is never a
bottleneck: it runs once per sketch estimate, not per element.
"""

from __future__ import annotations

import math
from typing import Sequence

import numpy as np


def solve_maximum_likelihood_equation(
    a: float,
    b: Sequence[int],
    n: int,
    relative_error_limit: float = 0.0,
    stats: dict | None = None,
) -> float:
    """Returns the x that maximizes the ML expression (see module docstring).

    ``a`` and all ``b[j]`` must be non-negative; ``n < len(b)`` and ``n < 64``.
    """
    sigma0 = 0
    sigma1 = 0.0
    u_min = -1
    u_max = 0
    for j in range(n + 1):
        bj = b[j]
        if bj > 0:
            if u_min < 0:
                u_min = j
            u_max = j
            sigma0 += bj
            sigma1 += math.ldexp(float(bj), -j)
    if u_min < 0:
        return 0.0

    pow_u_max = math.ldexp(1.0, u_max)
    sigma1 *= pow_u_max
    a_pow_u_max = a * pow_u_max
    x = sigma1 / a_pow_u_max if a_pow_u_max != 0 else math.inf

    if u_min < u_max:
        x = math.expm1(math.log1p(x) * (sigma0 / sigma1))

        while True:  # damped Newton iteration
            if stats is not None:
                stats["iterations"] = stats.get("iterations", 0) + 1
            lam = 1.0
            eta = 0.0
            y = x  # may be +inf if a was 0
            u = u_max
            phi = float(b[u_max])
            psi = 0.0
            while True:
                u -= 1
                y_plus_2 = 2.0 + y
                z = 2.0 / y_plus_2  # in [0,1]; 0 if x = +inf
                lam *= z
                eta = eta * (2.0 - z) + (1.0 - z)
                b_lambda = b[u] * lam
                phi += b_lambda
                psi += b_lambda * eta
                if u <= u_min:
                    break
                y *= y_plus_2

            x_prime = a_pow_u_max * x
            if not (phi > x_prime):
                break
            old_x = x
            eps = (phi - x_prime) / (psi + x_prime)
            x += x * eps
            if eps <= relative_error_limit or not (x > old_x):
                break
    return math.log1p(x) * pow_u_max


def solve_ml_equation_batch(
    a: np.ndarray,
    b: np.ndarray,
    n: int,
    relative_error_limit: float = 0.0,
    iters_out: np.ndarray | None = None,
) -> np.ndarray:
    """Vectorized Algorithm 8 over a batch of (a, b-histogram) systems.

    Semantically identical to :func:`solve_maximum_likelihood_equation`
    applied row-wise (pinned by tests against the scalar form); used by the
    exhaustive small-cardinality enumeration (millions of tiny systems) and
    anywhere many sketch estimates are needed at once. Rows are grouped by
    their (u_min, u_max) support window so every numpy op runs over a
    contiguous batch with a fixed-length inner loop.

    ``a``: float64 (N,); ``b``: int (N, >=n+1); returns float64 (N,).
    ``iters_out`` (optional int64 (N,)) receives per-row Newton iteration
    counts — the same counting as the scalar ``stats["iterations"]`` (one
    per damped-Newton pass, 0 when the support window is a single level).
    """
    a = np.asarray(a, dtype=np.float64)
    N = len(a)
    out = np.zeros(N, dtype=np.float64)
    bwin = np.asarray(b)[:, : n + 1]
    nzmask = bwin > 0
    any_nz = nzmask.any(axis=1)
    u_min = np.where(any_nz, nzmask.argmax(axis=1), -1)
    u_max = np.where(any_nz, n - nzmask[:, ::-1].argmax(axis=1), 0)
    key = u_min * 64 + u_max
    for k in np.unique(key):
        if k < 0:
            continue  # all-zero histogram -> 0.0
        rows = np.flatnonzero(key == k)
        umin, umax = int(k) // 64, int(k) % 64
        x, its = _solve_group(
            a[rows], bwin[rows, umin : umax + 1], umin, umax, relative_error_limit
        )
        out[rows] = x
        if iters_out is not None:
            iters_out[rows] = its
    return out


def _solve_group(
    a: np.ndarray, bw: np.ndarray, u_min: int, u_max: int, rel: float
) -> np.ndarray:
    """Newton iteration for one (u_min, u_max) support class; ``bw`` is the
    (M, u_max-u_min+1) histogram window. Mirrors the scalar loop step for
    step, with converged rows masked out of further updates. Returns
    ``(x, iterations)`` per row."""
    bw = bw.astype(np.float64)
    width = u_max - u_min + 1
    js = np.arange(u_min, u_max + 1, dtype=np.int64)
    sigma0 = bw.sum(axis=1)
    sigma1 = (bw * np.ldexp(np.ones(len(js)), -js)).sum(axis=1)
    pow_u_max = math.ldexp(1.0, u_max)
    sigma1 = sigma1 * pow_u_max
    a_pow = a * pow_u_max
    iters = np.zeros(len(a), np.int64)
    with np.errstate(divide="ignore", invalid="ignore", over="ignore"):
        x = np.where(a_pow != 0.0, sigma1 / a_pow, np.inf)
        if u_min == u_max:
            return np.log1p(x) * pow_u_max, iters
        x = np.expm1(np.log1p(x) * (sigma0 / sigma1))
        active = np.arange(len(a))
        while len(active):
            iters[active] += 1
            xs = x[active]
            bws = bw[active]
            lam = np.ones_like(xs)
            eta = np.zeros_like(xs)
            y = xs.copy()
            phi_ = bws[:, width - 1].copy()
            psi = np.zeros_like(xs)
            u = u_max
            while True:
                u -= 1
                y_plus_2 = 2.0 + y
                z = 2.0 / y_plus_2
                lam *= z
                eta = eta * (2.0 - z) + (1.0 - z)
                b_lam = bws[:, u - u_min] * lam
                phi_ += b_lam
                psi += b_lam * eta
                if u <= u_min:
                    break
                y *= y_plus_2
            x_prime = a_pow[active] * xs
            cont = phi_ > x_prime  # False (incl. NaN) -> scalar break-before-update
            eps = np.where(cont, (phi_ - x_prime) / (psi + x_prime), 0.0)
            new_x = np.where(cont, xs + xs * eps, xs)
            x[active] = new_x
            keep = cont & (eps > rel) & (new_x > xs)
            active = active[keep]
    return np.log1p(x) * pow_u_max, iters
