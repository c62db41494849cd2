"""Pure-numpy sketch kernels (no Spark imports here)."""

from .exaloglog import (  # noqa: F401
    ExaLogLog,
    ExaLogLogConfig,
    compute_token,
    estimate_distinct_from_tokens,
    is_valid_token,
    reconstruct_hash,
)
from .martingale import MartingaleEstimator, add_hashes_martingale  # noqa: F401
