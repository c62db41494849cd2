"""Theoretical ExaLogLog constants, computed on demand with mpmath.

Closed forms from the reference's generator scripts (reimplemented, values
pinned against the published tables in tests):

- ML bias correction:      ln(b)·(1+2x)·ζ(3,1+x)/ζ(2,1+x)²
  (``python/ml_bias_correction_constants.py:33-41``)
- ML theoretical RSE:      sqrt(ln(b)/ζ(2,1+x))
  (``python/ml_theoretical_relative_standard_error_constants.py:33-36``)
- martingale RSE:          sqrt(ln(b)/2·(1+x))
  (``python/martingale_theoretical_relative_standard_error_constants.py:33-36``)

with b = 2^(2^-t) and x = b^-d/(b-1). RSE(t,d,p) = C[t][d]/sqrt(2^p)
(``PrecomputedConstants.java:33-40``). The reference bakes a 59×59 table
(``MLBiasCorrectionConstants.java``); we compute lazily and cache, which is
equivalent and keeps the repo free of a 1900-line generated file.
"""

from __future__ import annotations

import math
from functools import lru_cache


def _params(t: int, d: int):
    from mpmath import mp

    mp.dps = 50
    b = mp.power(2.0, mp.power(2.0, -t))
    x = mp.power(b, -d) / (b - 1.0)
    return mp, b, x


@lru_cache(maxsize=None)
def ml_bias_correction(t: int, d: int) -> float:
    mp, b, x = _params(t, d)
    return float(
        mp.ln(b) * (1.0 + 2.0 * x) * mp.zeta(3.0, 1.0 + x) / mp.power(mp.zeta(2.0, 1.0 + x), 2.0)
    )


@lru_cache(maxsize=None)
def ml_rse_constant(t: int, d: int) -> float:
    mp, b, x = _params(t, d)
    return float(mp.sqrt(mp.ln(b) / mp.zeta(2.0, 1.0 + x)))


@lru_cache(maxsize=None)
def martingale_rse_constant(t: int, d: int) -> float:
    mp, b, x = _params(t, d)
    return float(mp.sqrt((mp.ln(b) / 2) * (1.0 + x)))


def theoretical_rse_ml(t: int, d: int, p: int) -> float:
    """RSE of the ML estimator ≙ PrecomputedConstants.getTheoreticalRelativeErrorML."""
    return ml_rse_constant(t, d) / math.sqrt(1 << p)


def theoretical_rse_martingale(t: int, d: int, p: int) -> float:
    return martingale_rse_constant(t, d) / math.sqrt(1 << p)


@lru_cache(maxsize=None)
def ml_compressed_mvp(t: int, d: int) -> float:
    """Theoretical MVP of an entropy-compressed state: entropy / (log2 ·
    Fisher information) (``python/mvp.py:44-70``). Published values:
    2.206 for (t=2, d=20); 3.044 for HLL."""
    mp, b, x = _params(t, d)
    fisher = mp.zeta(2.0, 1.0 + x) / mp.ln(b)
    i = mp.quad(
        lambda z: mp.power(z, x) * ((1 - z) * mp.log1p(-z) / (z * mp.log(z))),
        [0, 1],
    )
    entropy = (mp.mpf(1) / (1 + x) + i) / (mp.log(2) * mp.ln(b))
    return float(entropy / fisher)


def theoretical_mvp_ml(t: int, d: int, p: int) -> float:
    """Memory-variance product: state bits × relative variance (mvp.py:45-76)."""
    bits = (6 + t + d) * (1 << p)
    rse = theoretical_rse_ml(t, d, p)
    return bits * rse * rse
