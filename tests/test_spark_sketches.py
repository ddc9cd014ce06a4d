"""End-to-end Spark tests for HLL / count-min / KLL / Bloom aggregates."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMALL
from tdigest_spark.spark.sketches import (
    bloom_filter,
    bloom_might_contain,
    countmin_estimate,
    countmin_sketch,
    countmin_total,
    hll_cardinality,
    hll_count_distinct,
    hll_sketch,
    hll_union_agg,
    kll_quantile,
    kll_rank,
    kll_sketch,
)


@pytest.fixture(scope="module")
def orders(spark):
    return spark.read.parquet(f"{SF_SMALL}/orders.parquet").cache()


@pytest.fixture(scope="module")
def events(spark):
    return spark.read.parquet(f"{SF_SMALL}/events.parquet").cache()


def test_hll_count_distinct_grouped(orders):
    est = {
        r["o_orderstatus"]: r["approx_distinct"]
        for r in hll_count_distinct(
            orders, "o_custkey", keys=["o_orderstatus"]
        ).collect()
    }
    exact = {
        r["o_orderstatus"]: r["d"]
        for r in orders.groupBy("o_orderstatus")
        .agg(F.countDistinct("o_custkey").alias("d"))
        .collect()
    }
    assert set(est) == set(exact)
    for k in exact:
        assert abs(est[k] / exact[k] - 1) < 0.05, (k, est[k], exact[k])


def test_hll_sketch_rollup(orders):
    per_status = hll_sketch(orders, "o_custkey", keys=["o_orderstatus"])
    rolled = hll_union_agg(per_status, "hll")
    est = rolled.select(hll_cardinality("hll").alias("c")).collect()[0]["c"]
    exact = orders.select(F.countDistinct("o_custkey")).collect()[0][0]
    assert abs(est / exact - 1) < 0.05


def test_countmin_frequencies(events):
    cm = countmin_sketch(events, "event_type").collect()[0]["countmin"]
    exact = {
        r["event_type"]: r["c"]
        for r in events.groupBy("event_type").agg(F.count("*").alias("c")).collect()
    }
    spark = events.sparkSession
    probes = spark.createDataFrame(
        [(t,) for t in exact], ["event_type"]
    ).withColumn("cm", F.lit(bytes(cm)))
    res = probes.select(
        "event_type",
        countmin_estimate(F.col("cm"), F.col("event_type")).alias("est"),
        countmin_total(F.col("cm")).alias("total"),
    ).collect()
    n = sum(exact.values())
    for r in res:
        t = exact[r["event_type"]]
        assert r["est"] >= t
        assert r["est"] <= t + 0.01 * n  # width 2048 → eps*N ≈ 0.13% N
        assert r["total"] == n


def test_bloom_membership(orders, spark):
    bl = bloom_filter(orders, "o_custkey").collect()[0]["bloom"]
    members = orders.select("o_custkey").distinct()
    res = members.withColumn("bf", F.lit(bytes(bl))).select(
        bloom_might_contain(F.col("bf"), F.col("o_custkey")).alias("hit")
    )
    assert res.filter(~F.col("hit")).count() == 0  # no false negatives
    # non-members: shifted keys far outside the domain
    non = members.select((F.col("o_custkey") + 10_000_000).alias("k")).withColumn(
        "bf", F.lit(bytes(bl))
    )
    fp = non.select(bloom_might_contain(F.col("bf"), F.col("k")).alias("hit"))
    fpr = fp.filter(F.col("hit")).count() / max(fp.count(), 1)
    assert fpr < 0.05


def test_kll_quantile_grouped(events):
    est = {
        r["event_type"]: r["quantile"]
        for r in kll_quantile(
            events.select("event_type", "value"), "value", 0.5, keys=["event_type"]
        ).collect()
    }
    pdf = events.select("event_type", "value").toPandas()
    for t, sub in pdf.groupby("event_type"):
        xs = np.sort(sub["value"].to_numpy())
        rank = np.searchsorted(xs, est[t], side="right") / len(xs)
        assert abs(rank - 0.5) < 0.03, (t, est[t], rank)


def test_kll_sketch_and_rank(events):
    sk = kll_sketch(events.select("value"), "value")
    med_rank = sk.select(kll_rank("kll", 15.0).alias("r")).collect()[0]["r"]
    pdf = events.select("value").toPandas()["value"].to_numpy()
    exact = (pdf <= 15.0).mean()
    assert abs(med_rank - exact) < 0.03
