"""Golden-state fingerprints (cross-version stability — our analog of the
reference's komihash fingerprints, ExaLogLog_2_20Test.java:61-81) and
hypothesis property tests for the merge algebra."""

import hashlib

import numpy as np
from hypothesis import given, settings, strategies as st

from exaloglog_paper_spark.sketchlib.bitops import splitmix64, splitmix64_stream
from exaloglog_paper_spark.sketchlib.exaloglog import (
    ExaLogLog,
    compute_token,
    estimate_distinct_from_tokens,
    reconstruct_hash,
)

GOLDEN = [
    # (t,d,p), state sha256[:32], estimate-stream sha256[:32] over the
    # n ∈ {0,1,2,3,10,100,1000,10000} seed-0x5EED42 grid
    ("2,20,4", "3c142d1b0092c3cb50d1b2487cdbacf9", "3853474f1bf27381228ad8d18b561779"),
    ("2,20,8", "9f912b14a0bf6dd4f4d544e51fdf4eb5", "ac08f4ae5b5f4b6a16d7d7e4f84c2974"),
    ("2,24,8", "7378a92ef1603e94b21068278e6e83e2", "6716a11187d3999846d65b4620553735"),
    ("0,0,11", "85906fb7a428782a6f298bf7ecd9a8a9", "be882f70797d2671183481239985c324"),
]


def test_golden_fingerprints():
    for key, want_state, want_est in GOLDEN:
        t, d, p = map(int, key.split(","))
        h = hashlib.sha256()
        est_h = hashlib.sha256()
        for n in [0, 1, 2, 3, 10, 100, 1000, 10000]:
            sk = ExaLogLog.create(t, d, p).add_hashes(splitmix64_stream(0x5EED42, n))
            h.update(sk.serialize())
            est_h.update(repr(sk.estimate()).encode())
        assert h.hexdigest()[:32] == want_state, key
        assert est_h.hexdigest()[:32] == want_est, key


@settings(max_examples=40, deadline=None)
@given(
    data=st.lists(st.integers(min_value=0, max_value=2**64 - 1), min_size=0, max_size=400),
    cuts=st.lists(st.integers(min_value=0, max_value=400), min_size=0, max_size=4),
    params=st.sampled_from([(2, 20, 6), (1, 9, 4), (0, 4, 5), (3, 12, 8)]),
)
def test_property_arbitrary_partitions_merge_to_same_state(data, cuts, params):
    """Any partitioning of any multiset of hashes merges to the single-build
    state (associativity + commutativity + idempotency in one property)."""
    t, d, p = params
    hashes = np.array(data, dtype=np.uint64)
    full = ExaLogLog.create(t, d, p).add_hashes(hashes)
    bounds = sorted(min(c, len(data)) for c in cuts)
    parts = np.split(hashes, bounds)
    acc = ExaLogLog.create(t, d, p)
    for part in reversed(parts):  # reversed order on purpose
        acc.merge_(ExaLogLog.create(t, d, p).add_hashes(part))
    assert np.array_equal(acc.regs, full.regs)


@settings(max_examples=40, deadline=None)
@given(
    tokens=st.lists(st.integers(min_value=0, max_value=2**32 - 1), min_size=0, max_size=300)
)
def test_property_token_roundtrip_and_dedup(tokens):
    """Valid tokens roundtrip through reconstruct_hash/compute_token
    idempotently; invalid tokens never affect a sketch; the token estimator
    is duplication-invariant."""
    tok = np.array(tokens, dtype=np.uint64)
    from exaloglog_paper_spark.sketchlib.exaloglog import is_valid_token

    valid = tok[is_valid_token(tok)]
    assert np.array_equal(compute_token(reconstruct_hash(valid)), valid)
    a = ExaLogLog.create(2, 20, 6).add_tokens(tok)
    b = ExaLogLog.create(2, 20, 6).add_tokens(np.concatenate([tok, tok]))
    assert np.array_equal(a.regs, b.regs)
    assert estimate_distinct_from_tokens(tok) == estimate_distinct_from_tokens(
        np.concatenate([tok, tok[::-1]])
    )


@settings(max_examples=25, deadline=None)
@given(
    n=st.integers(min_value=0, max_value=3000),
    seed=st.integers(min_value=0, max_value=2**32),
)
def test_property_downsize_commutes_with_build(n, seed):
    hashes = splitmix64_stream(seed, n)
    big = ExaLogLog.create(2, 20, 8).add_hashes(hashes)
    assert np.array_equal(
        big.downsize(16, 5).regs, ExaLogLog.create(2, 16, 5).add_hashes(hashes).regs
    )
