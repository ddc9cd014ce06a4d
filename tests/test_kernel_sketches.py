"""Kernel tests for the companion sketches (HLL, count-min, KLL,
Bloom): accuracy bounds, merge == single-pass build (or within bound),
serialization roundtrips, shape validation."""

import collections

import numpy as np
import pytest

from tdigest_spark.kernel.bloom import Bloom, merge_all_bloom
from tdigest_spark.kernel.countmin import CountMin, merge_all_cm
from tdigest_spark.kernel.hashing import hash_series_py, splitmix64
from tdigest_spark.kernel.hll import HLL, merge_all_hll
from tdigest_spark.kernel.kll import KLL, merge_all_kll


def hashes(values):
    return splitmix64(hash_series_py(np.asarray(values)))


# ----------------------------------------------------------------------
# HLL
# ----------------------------------------------------------------------
@pytest.mark.parametrize("n", [100, 10_000, 1_000_000])
def test_hll_accuracy(n):
    h = hashes(np.arange(n, dtype=np.int64) * 2654435761 + 17)
    s = HLL(14)
    s.add_hashes(h)
    assert abs(s.estimate() / n - 1) < 0.05  # ~6 sigma at p=14


def test_hll_merge_is_exactly_single_pass():
    h = hashes(np.arange(100_000, dtype=np.int64))
    single = HLL(14)
    single.add_hashes(h)
    parts = []
    for i in range(8):
        p = HLL(14)
        p.add_hashes(h[i::8])
        parts.append(p)
    merged = merge_all_hll(parts)
    # register-max merge is lossless: merged state == single-pass state
    assert np.array_equal(merged.regs, single.regs)


def test_hll_duplicates_dont_count():
    h = hashes(np.arange(1000, dtype=np.int64))
    s = HLL(14)
    for _ in range(5):
        s.add_hashes(h)
    assert abs(s.estimate() - 1000) / 1000 < 0.05


def test_hll_roundtrip_and_validation():
    s = HLL(12)
    s.add_hashes(hashes(np.arange(500, dtype=np.int64)))
    t = HLL.from_bytes(s.to_bytes())
    assert t.p == 12 and np.array_equal(t.regs, s.regs)
    with pytest.raises(ValueError):
        HLL.from_bytes(b"XXXX" + s.to_bytes()[4:])
    with pytest.raises(ValueError):
        HLL(3)
    with pytest.raises(ValueError):
        merge_all_hll([HLL(12), HLL(14)])


# ----------------------------------------------------------------------
# count-min
# ----------------------------------------------------------------------
def test_countmin_bounds():
    rng = np.random.RandomState(7)
    keys = (rng.zipf(1.5, 100_000) % 500).astype(np.int64)
    cm = CountMin(2048, 5)
    cm.add_hashes(hashes(keys))
    true = collections.Counter(keys.tolist())
    probes = np.arange(50, dtype=np.int64)
    est = cm.estimate_hashes(hashes(probes))
    for p, e in zip(probes, est):
        t = true[int(p)]
        assert e >= t  # one-sided: never underestimates
        assert e <= t + 3 * cm.epsilon * cm.total


def test_countmin_weighted_and_merge():
    vals = np.array([1, 2, 3], dtype=np.int64)
    cnts = np.array([10, 20, 30], dtype=np.int64)
    cm = CountMin(1024, 4)
    cm.add_hashes(hashes(vals), cnts)
    assert cm.total == 60
    est = cm.estimate_hashes(hashes(vals))
    assert list(est) == [10, 20, 30]  # tiny load → exact
    parts = [CountMin(1024, 4) for _ in range(3)]
    for i, p in enumerate(parts):
        p.add_hashes(hashes(vals[i : i + 1]), cnts[i : i + 1])
    merged = merge_all_cm(parts)
    assert np.array_equal(merged.table, cm.table)
    assert merged.total == cm.total


def test_countmin_roundtrip_and_validation():
    cm = CountMin.from_error(0.01, 0.01)
    cm.add_hashes(hashes(np.arange(100, dtype=np.int64)))
    c2 = CountMin.from_bytes(cm.to_bytes())
    assert np.array_equal(c2.table, cm.table) and c2.total == cm.total
    with pytest.raises(ValueError):
        merge_all_cm([CountMin(1024, 4), CountMin(2048, 4)])


# ----------------------------------------------------------------------
# Bloom
# ----------------------------------------------------------------------
def test_bloom_no_false_negatives_and_fpr():
    members = np.arange(20_000, dtype=np.int64)
    b = Bloom.from_capacity(20_000, 0.01)
    b.add_hashes(hashes(members))
    assert bool(b.contains_hashes(hashes(members)).all())
    non = np.arange(10_000_000, 10_050_000, dtype=np.int64)
    fpr = float(b.contains_hashes(hashes(non)).mean())
    assert fpr < 0.03  # nominal 0.01


def test_bloom_merge_is_single_pass():
    members = np.arange(5_000, dtype=np.int64)
    single = Bloom(1 << 16, 5)
    single.add_hashes(hashes(members))
    parts = []
    for i in range(4):
        p = Bloom(1 << 16, 5)
        p.add_hashes(hashes(members[i::4]))
        parts.append(p)
    merged = merge_all_bloom(parts)
    assert np.array_equal(merged.bits, single.bits)
    assert merged.n_added == 5_000


def test_bloom_roundtrip():
    b = Bloom(1 << 12, 3)
    b.add_hashes(hashes(np.arange(100, dtype=np.int64)))
    b2 = Bloom.from_bytes(b.to_bytes())
    assert np.array_equal(b2.bits, b.bits) and b2.n_added == 100
    with pytest.raises(ValueError):
        merge_all_bloom([Bloom(1 << 12, 3), Bloom(1 << 13, 3)])


# ----------------------------------------------------------------------
# KLL
# ----------------------------------------------------------------------
PS = [0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99]


@pytest.mark.parametrize("k,tol", [(200, 0.015), (800, 0.005)])
def test_kll_rank_error(k, tol):
    rng = np.random.RandomState(11)
    x = rng.rand(300_000)
    s = KLL(k)
    s.add_values(x)
    for p, e in zip(PS, s.quantiles(PS)):
        assert abs((x <= e).mean() - p) < tol


def test_kll_merge_within_bound():
    rng = np.random.RandomState(13)
    x = rng.randn(200_000)
    parts = [KLL(200) for _ in range(16)]
    for i, p in enumerate(parts):
        p.add_values(x[i::16])
    m = merge_all_kll(parts)
    assert m.n == 200_000
    for p, e in zip(PS, m.quantiles(PS)):
        assert abs((x <= e).mean() - p) < 0.02


def test_kll_bounded_size():
    s = KLL(200)
    s.add_values(np.random.RandomState(5).rand(1_000_000))
    assert s._size() < 3 * 200  # O(k) stored items for 1M inputs
    assert s.n == 1_000_000


def test_kll_rank_of_and_roundtrip():
    x = np.arange(10_000, dtype=np.float64)
    s = KLL(400)
    s.add_values(x)
    assert abs(s.rank_of([5000.0])[0] - 0.5) < 0.01
    s2 = KLL.from_bytes(s.to_bytes())
    assert s2.n == s.n
    assert all(np.array_equal(a, b) for a, b in zip(s2.levels, s.levels))
    assert s2.quantile(0.5) == s.quantile(0.5)
    with pytest.raises(ValueError):
        merge_all_kll([KLL(200), KLL(400)])


def test_kll_weight_conservation():
    """No weight silently dropped by compaction (odd-size level rule)."""
    s = KLL(64)
    s.add_values(np.random.RandomState(3).rand(123_457))
    _, wt = s._items_weights()
    # total stored weight equals items ingested
    assert int(wt.sum()) == 123_457
