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
