"""Companion sketches: published-bound tests (SURVEY.md §2.4 table)."""

import numpy as np
import pytest

from exaloglog_paper_spark.sketchlib.bitops import splitmix64, splitmix64_stream
from exaloglog_paper_spark.sketchlib.bloom import BloomConfig, BloomFilter
from exaloglog_paper_spark.sketchlib.countmin import CountMin, CountMinConfig
from exaloglog_paper_spark.sketchlib.kll import KLL, KLLConfig
from exaloglog_paper_spark.sketchlib.tdigest import TDigest, TDigestConfig


def zipf_hashes(n, vocab=5000, s=1.1, seed=0):
    """Zipf-distributed item ids + their 64-bit hashes."""
    rng = np.random.default_rng(seed)
    w = 1.0 / np.power(np.arange(1, vocab + 1), s)
    ids = rng.choice(vocab, size=n, p=w / w.sum()).astype(np.int64)
    return ids, splitmix64(ids.view(np.uint64))


# ---------------------------------------------------------------------------
# count-min
# ---------------------------------------------------------------------------


def test_countmin_bound_and_merge():
    cfg = CountMinConfig(width=2048, depth=5)
    ids, hashes = zipf_hashes(200_000)
    cm = CountMin(cfg).add_hashes(hashes)
    # exact counts for the top items
    vals, counts = np.unique(ids, return_counts=True)
    top = np.argsort(-counts)[:50]
    q_ids = vals[top]
    q_hashes = splitmix64(q_ids.view(np.uint64))
    est = cm.query(q_hashes)
    exact = counts[top]
    assert np.all(est >= exact)  # overestimate only
    # err <= eps*N with prob >= 1 - e^-depth; test all 50 within 2*eps*N
    assert np.all(est - exact <= 2 * cfg.epsilon * len(ids))
    # merge == single build
    cm1 = CountMin(cfg).add_hashes(hashes[:100_000])
    cm2 = CountMin(cfg).add_hashes(hashes[100_000:])
    merged = cm1.merge_(cm2)
    assert np.array_equal(merged.table, cm.table)
    assert merged.total == len(ids)
    # serialization
    back = CountMin.deserialize(cfg, merged.serialize())
    assert np.array_equal(back.table, cm.table)


def test_countmin_weighted():
    cfg = CountMinConfig(width=1024, depth=4)
    hashes = splitmix64_stream(5, 100)
    cm = CountMin(cfg).add_hashes(hashes, counts=np.full(100, 7))
    assert np.all(cm.query(hashes) >= 7)


# ---------------------------------------------------------------------------
# KLL
# ---------------------------------------------------------------------------


def test_kll_rank_error_bound():
    cfg = KLLConfig(k=200)
    rng = np.random.default_rng(3)
    data = rng.normal(size=100_000)
    sk = KLL(cfg)
    for chunk in np.array_split(data, 20):
        sk.add_values(chunk)
    qs = np.array([0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99])
    est = sk.quantile(qs)
    data_sorted = np.sort(data)
    for q, e in zip(qs, est):
        true_rank = np.searchsorted(data_sorted, e) / len(data)
        assert abs(true_rank - q) < 0.03, (q, true_rank)


def test_kll_merge_bound():
    cfg = KLLConfig(k=200)
    rng = np.random.default_rng(4)
    data = rng.exponential(size=60_000)
    parts = np.array_split(data, 7)
    sketches = [KLL(cfg).add_values(p) for p in parts]
    merged = sketches[0]
    for s in sketches[1:]:
        merged.merge_(s)
    assert merged.n == len(data)
    data_sorted = np.sort(data)
    for q in [0.1, 0.5, 0.9]:
        e = merged.quantile(q)
        true_rank = np.searchsorted(data_sorted, e) / len(data)
        assert abs(true_rank - q) < 0.04, (q, true_rank)
    # serialization roundtrip preserves answers
    back = KLL.deserialize(cfg, merged.serialize())
    assert back.quantile(0.5) == merged.quantile(0.5)
    assert back.n == merged.n


# ---------------------------------------------------------------------------
# t-digest
# ---------------------------------------------------------------------------


def test_tdigest_quantiles_and_tails():
    cfg = TDigestConfig(delta=200)
    rng = np.random.default_rng(5)
    data = rng.lognormal(0, 1, size=80_000)
    td = TDigest(cfg)
    for chunk in np.array_split(data, 16):
        td.add_values(chunk)
    ds = np.sort(data)
    # exact min/max
    assert td.quantile(0.0) == ds[0]
    assert td.quantile(1.0) == ds[-1]
    # mid + tail quantiles within rank tolerance
    for q, tol in [(0.5, 0.02), (0.9, 0.02), (0.99, 0.005), (0.999, 0.002)]:
        e = td.quantile(q)
        true_rank = np.searchsorted(ds, e) / len(ds)
        assert abs(true_rank - q) < tol, (q, true_rank)
    # monotone quantile function
    qs = np.linspace(0, 1, 101)
    est = td.quantile(qs)
    assert np.all(np.diff(est) >= 0)


def test_tdigest_merge():
    cfg = TDigestConfig(delta=200)
    rng = np.random.default_rng(6)
    data = rng.normal(size=50_000)
    parts = np.array_split(data, 5)
    digs = [TDigest(cfg).add_values(p) for p in parts]
    merged = digs[0]
    for d in digs[1:]:
        merged.merge_(d)
    assert merged.n == pytest.approx(len(data))
    ds = np.sort(data)
    for q in [0.25, 0.5, 0.75]:
        true_rank = np.searchsorted(ds, merged.quantile(q)) / len(ds)
        assert abs(true_rank - q) < 0.03
    back = TDigest.deserialize(cfg, merged.serialize())
    assert back.quantile(0.5) == merged.quantile(0.5)


# ---------------------------------------------------------------------------
# Bloom
# ---------------------------------------------------------------------------


def test_bloom_no_false_negatives_and_fpr():
    n = 20_000
    cfg = BloomConfig.for_capacity(n, fpr=0.01)
    inserted = splitmix64_stream(1, n)
    other = splitmix64_stream(2, 50_000, offset=10_000_000)
    bf = BloomFilter(cfg).add_hashes(inserted)
    assert bf.contains_hashes(inserted).all()  # no false negatives, ever
    fpr = bf.contains_hashes(other).mean()
    expect = cfg.expected_fpr(n)
    assert fpr < 3 * expect, (fpr, expect)


def test_bloom_merge_equals_single_build():
    cfg = BloomConfig(num_bits=1 << 16, num_hashes=5)
    h = splitmix64_stream(9, 5000)
    full = BloomFilter(cfg).add_hashes(h)
    a = BloomFilter(cfg).add_hashes(h[:2500])
    b = BloomFilter(cfg).add_hashes(h[2500:])
    merged = a.merge_(b)
    assert np.array_equal(merged.bits, full.bits)
    back = BloomFilter.deserialize(cfg, merged.serialize())
    assert np.array_equal(back.bits, full.bits)
    assert back.n_added == 5000
