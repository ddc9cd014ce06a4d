"""Tests for SpaceSaving top-k, reservoir sampling, and the digest
histogram."""

import collections

import numpy as np
import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from tests.conftest import SF_SMALL
from tdigest_spark.kernel.reservoir import Reservoir, merge_all_reservoir
from tdigest_spark.kernel.topk import SpaceSaving, merge_all_topk
from tdigest_spark.kernel.hashing import hash_series_py
from tdigest_spark.spark import functions as TF
from tdigest_spark.spark.tdigest_agg import tdigest
from tdigest_spark.spark.topk_agg import reservoir_sample_hashes, topk, topk_sketch


# ----------------------------------------------------------------------
# kernel: SpaceSaving
# ----------------------------------------------------------------------
def test_spacesaving_exact_when_under_capacity():
    rng = np.random.RandomState(3)
    items = [f"item{i}" for i in rng.zipf(1.5, 10_000) % 100]
    s = SpaceSaving(256)
    s.add_items(items)
    true = collections.Counter(items)
    for item, c, e in s.top(10):
        assert c == true[item] and e == 0
    assert s.n == 10_000


def test_spacesaving_bounds_when_over_capacity():
    rng = np.random.RandomState(4)
    items = [f"k{i}" for i in rng.zipf(1.3, 50_000) % 5000]
    s = SpaceSaving(64)
    s.add_items(items)
    true = collections.Counter(items)
    # every heavy item (> n/m) is retained with one-sided count bounds
    for item, t in true.most_common(5):
        assert t > s.n // s.m
        assert item in s.counts
        est = s.counts[item]
        assert t <= est <= t + s.errors.get(item, 0) + s.n // s.m


def test_spacesaving_merge_exact_under_capacity():
    rng = np.random.RandomState(5)
    items = [f"x{i}" for i in rng.randint(0, 50, 20_000)]
    parts = []
    for i in range(4):
        p = SpaceSaving(256)
        p.add_items(items[i::4])
        parts.append(p)
    m = merge_all_topk(parts)
    true = collections.Counter(items)
    for item, c, e in m.top(50):
        assert c == true[item] and e == 0
    assert m.n == 20_000


def test_spacesaving_roundtrip():
    s = SpaceSaving(16)
    s.add_items(["a", "b", "a", "ü"])  # utf-8 payloads survive
    s2 = SpaceSaving.from_bytes(s.to_bytes())
    assert s2.counts == s.counts and s2.errors == s.errors and s2.n == s.n
    with pytest.raises(ValueError):
        merge_all_topk([SpaceSaving(8), SpaceSaving(16)])


# ----------------------------------------------------------------------
# kernel: reservoir
# ----------------------------------------------------------------------
def test_reservoir_deterministic_and_merge_exact():
    h = hash_series_py(np.arange(100_000, dtype=np.int64)).view(np.int64)
    r1 = Reservoir(50, seed=7)
    r1.add_hashes(h)
    # any split merges to the identical bottom-k sample
    parts = []
    for i in range(8):
        p = Reservoir(50, seed=7)
        p.add_hashes(h[i::8])
        parts.append(p)
    rm = merge_all_reservoir(parts)
    assert np.array_equal(np.sort(rm.sample_hashes()), np.sort(r1.sample_hashes()))
    assert rm.n == r1.n == 100_000
    # roundtrip
    r2 = Reservoir.from_bytes(r1.to_bytes())
    assert np.array_equal(r2.sample_hashes(), r1.sample_hashes())


def test_reservoir_uniformity():
    """Each half of the id space should get ~half the sample."""
    h = hash_series_py(np.arange(50_000, dtype=np.int64)).view(np.int64)
    r = Reservoir(1000, seed=11)
    r.add_hashes(h)
    sample = set(int(x) for x in r.sample_hashes())
    first_half = set(int(x) for x in h[:25_000])
    frac = len(sample & first_half) / 1000
    assert 0.42 < frac < 0.58


# ----------------------------------------------------------------------
# Spark layer
# ----------------------------------------------------------------------
@pytest.fixture(scope="module")
def events(spark):
    return spark.read.parquet(f"{SF_SMALL}/events.parquet").cache()


def test_topk_matches_exact(events):
    res = topk(events, "event_type", 3, m=1024).collect()
    exact = sorted(
        (
            (r["c"], r["event_type"])
            for r in events.groupBy("event_type").agg(F.count("*").alias("c")).collect()
        ),
        key=lambda t: (-t[0], t[1]),
    )[:3]
    got = sorted(res, key=lambda r: r["rank"])
    for row, (c, item) in zip(got, exact):
        assert row["item"] == item and row["count_est"] == c and row["error"] == 0


def test_topk_grouped_and_sketch(events):
    by_day = events.select(
        F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day"),
        "event_type",
    )
    res = topk(by_day, "event_type", 1, keys=["day"], m=64)
    exact = (
        by_day.groupBy("day", "event_type")
        .agg(F.count("*").alias("c"))
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("day").orderBy(F.desc("c"), F.asc("event_type"))
            ),
        )
        .filter("rn = 1")
    )
    got = {r["day"]: (r["item"], r["count_est"]) for r in res.collect()}
    for r in exact.collect():
        assert got[r["day"]] == (r["event_type"], r["c"])
    sk = topk_sketch(by_day, "event_type", keys=["day"], m=64)
    assert sk.count() == len(got)


def test_reservoir_sample_spark(events):
    res = reservoir_sample_hashes(
        events, "event_id", 100, keys=["event_type"], seed=13
    ).collect()
    exact_n = {
        r["event_type"]: r["c"]
        for r in events.groupBy("event_type").agg(F.count("*").alias("c")).collect()
    }
    # sampled ids must be real members: join back on the hash
    hashes = {h for r in res for h in (r["sample_hashes"] or [])}
    member_hashes = {
        r["h"]
        for r in events.select(F.xxhash64("event_id").alias("h")).distinct().collect()
    }
    assert hashes <= member_hashes
    for r in res:
        assert r["n_seen"] == exact_n[r["event_type"]]
        assert len(r["sample_hashes"]) == min(100, exact_n[r["event_type"]])
    # partitioning-independence: same sample under different splits
    res2 = reservoir_sample_hashes(
        events.repartition(13), "event_id", 100, keys=["event_type"], seed=13
    ).collect()
    a = {r["event_type"]: sorted(r["sample_hashes"]) for r in res}
    b = {r["event_type"]: sorted(r["sample_hashes"]) for r in res2}
    assert a == b


def test_tdigest_histogram(events):
    dig = tdigest(events.select("value"), "value", 100)
    row = dig.select(TF.tdigest_histogram("tdigest", 10).alias("h")).collect()[0]
    bounds = row["h"]
    assert len(bounds) == 11
    assert bounds == sorted(bounds)
    vals = np.sort(events.select("value").toPandas()["value"].to_numpy())
    # each bucket holds ~10% of the mass
    for i in range(10):
        lo = np.searchsorted(vals, bounds[i], side="left") / len(vals)
        hi = np.searchsorted(vals, bounds[i + 1], side="right") / len(vals)
        assert hi - lo == pytest.approx(0.1, abs=0.03)
