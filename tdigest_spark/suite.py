"""Driver-facing query suite: each entry pairs a Spark query with an
ANSI-SQL oracle DuckDB can run on the same parquet tables.

Pattern (borrowed from the reference's pg_regress suites, SURVEY.md §5):
approximate estimates are validated *inside* the Spark query against an
exactly-computed quantity, and the emitted columns are exact facts
(group keys, counts) plus boolean bound checks — so the oracle SQL is
exact and deterministic, never an approximation race.  Tolerances are
the reference's own (basic.sql:116-185 bands; c=100 → 0.5-1%).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tdigest_spark.spark import functions as TF
from tdigest_spark.spark.tdigest_agg import (
    tdigest,
    tdigest_avg,
    tdigest_percentile,
    tdigest_percentile_digests,
    tdigest_percentile_of,
    tdigest_union_agg,
)


def _read(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _rank_err_ok(data, key, value_col, est, est_col, target, tol):
    """ok := |exact_rank(estimate) - target| < tol, computed in Spark."""
    joined = data.join(F.broadcast(est), key)
    return joined.groupBy(*key).agg(
        F.count("*").alias("n"),
        (
            F.abs(
                F.avg((F.col(value_col) <= F.col(est_col)).cast("double"))
                - F.lit(target)
            )
            < tol
        ).alias("ok"),
    )


# ----------------------------------------------------------------------
# t-digest queries
# ----------------------------------------------------------------------
def q_tdigest_p95(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped p95 within the c=100 rank-error band (basic.sql pattern)."""
    li = _read(spark, sf_dir, "lineitem").select("l_returnflag", "l_extendedprice")
    est = tdigest_percentile(li, "l_extendedprice", 100, 0.95, keys=["l_returnflag"])
    return _rank_err_ok(
        li, ["l_returnflag"], "l_extendedprice", est, "percentile", 0.95, 0.005
    ).orderBy("l_returnflag")


def q_tdigest_docs_p95(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship web-text query: per-language p95 of document length."""
    docs = _read(spark, sf_dir, "documents").select("lang", "n_chars")
    docs = docs.withColumn("n_chars", F.col("n_chars").cast("double"))
    est = tdigest_percentile(docs, "n_chars", 100, 0.95, keys=["lang"])
    return _rank_err_ok(docs, ["lang"], "n_chars", est, "percentile", 0.95, 0.01).orderBy(
        "lang"
    )


def q_tdigest_monotonic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 99-percentile vector must be non-decreasing (basic.sql:129-142)."""
    li = _read(spark, sf_dir, "lineitem").select("l_returnflag", "l_extendedprice")
    qs = [i / 100 for i in range(1, 100)]
    est = tdigest_percentile(li, "l_extendedprice", 100, qs, keys=["l_returnflag"])
    return est.select(
        "l_returnflag",
        F.expr(
            "aggregate(transform(sequence(1, size(percentile) - 1),"
            " i -> CASE WHEN percentile[i] < percentile[i-1] THEN 1 ELSE 0 END),"
            " 0L, (a, x) -> a + x)"
        ).alias("violations"),
    ).orderBy("l_returnflag")


def q_tdigest_percentile_of(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverse CDF vs exact relative rank (rank = P(v<x) + P(v=x)/2)."""
    ev = _read(spark, sf_dir, "events").select("event_type", "value")
    probe = 15.0
    est = tdigest_percentile_of(ev, "value", 100, probe, keys=["event_type"])
    exact = ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        (
            (
                F.sum((F.col("value") < probe).cast("long"))
                + F.sum((F.col("value") == probe).cast("long")) / 2.0
            )
            / F.count("*")
        ).alias("exact_rank"),
    )
    return (
        est.join(exact, "event_type")
        .select(
            "event_type",
            "n",
            (F.abs(F.col("percentile_of") - F.col("exact_rank")) < 0.01).alias("ok"),
        )
        .orderBy("event_type")
    )


def q_tdigest_trimmed_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trimmed mean vs the exact count-window mean (trimmed_aggregates.sql)."""
    li = _read(spark, sf_dir, "lineitem").select("l_linestatus", "l_extendedprice")
    est = tdigest_avg(li, "l_extendedprice", 100, 0.1, 0.9, keys=["l_linestatus"])
    w = Window.partitionBy("l_linestatus").orderBy("l_extendedprice")
    ranked = li.withColumn("rn", F.row_number().over(w) - 1).withColumn(
        "n", F.count("*").over(Window.partitionBy("l_linestatus"))
    )
    exact = (
        ranked.filter(
            (F.col("rn") >= F.floor(F.col("n") * 0.1))
            & (F.col("rn") < F.ceil(F.col("n") * 0.9))
        )
        .groupBy("l_linestatus")
        .agg(F.avg("l_extendedprice").alias("exact_avg"))
    )
    return (
        est.join(exact, "l_linestatus")
        .select(
            "l_linestatus",
            (F.abs(F.col("avg") - F.col("exact_avg")) / F.col("exact_avg") < 0.01).alias(
                "ok"
            ),
        )
        .orderBy("l_linestatus")
    )


def q_tdigest_value_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(value,count) pre-aggregated ingestion on heavily duplicated data
    (value_count_api.sql).  l_quantity has ~50 distinct values, so the
    achievable rank granularity is one value-mass (~2%)."""
    li = _read(spark, sf_dir, "lineitem").select("l_returnflag", "l_quantity")
    vc = li.groupBy("l_returnflag", "l_quantity").agg(F.count("*").alias("cnt"))
    est = tdigest_percentile(
        vc, "l_quantity", 100, 0.5, keys=["l_returnflag"], count_col="cnt"
    )
    return _rank_err_ok(
        li, ["l_returnflag"], "l_quantity", est, "percentile", 0.5, 0.03
    ).orderBy("l_returnflag")


def q_tdigest_reaggregate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre-aggregate digests per (flag, status), re-aggregate to flag —
    the README.md:104-133 rollup pattern; count must be exact."""
    li = _read(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_linestatus", "l_extendedprice"
    )
    dig = tdigest(
        li, "l_extendedprice", 100, keys=["l_returnflag", "l_linestatus"]
    )
    rolled = tdigest_union_agg(dig, "tdigest", keys=["l_returnflag"])
    est = tdigest_percentile_digests(rolled, "tdigest", 0.9, keys=["l_returnflag"])
    counts = rolled.select(
        "l_returnflag", TF.tdigest_count("tdigest").alias("n")
    )
    ok = _rank_err_ok(
        li, ["l_returnflag"], "l_extendedprice", est, "percentile", 0.9, 0.01
    ).select("l_returnflag", "ok")
    return counts.join(ok, "l_returnflag").orderBy("l_returnflag")


def q_tdigest_serialization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """text→parse→text fixpoint and count preservation (copy.sql)."""
    li = _read(spark, sf_dir, "lineitem").select("l_returnflag", "l_extendedprice")
    dig = tdigest(li, "l_extendedprice", 100, keys=["l_returnflag"])
    txt = dig.select(
        "l_returnflag",
        TF.tdigest_to_string("tdigest").alias("t1"),
        TF.tdigest_count("tdigest").alias("n"),
    )
    rt = txt.select(
        "l_returnflag",
        "n",
        (TF.tdigest_to_string(TF.tdigest_parse("t1")) == F.col("t1")).alias(
            "text_stable"
        ),
    )
    return rt.orderBy("l_returnflag")


def q_tdigest_partition_invariance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merge associativity: estimates in-bound under different partition
    splits (BASELINE north_rule; parallel_query.sql equivalence)."""
    li = _read(spark, sf_dir, "lineitem").select("l_returnflag", "l_extendedprice")
    out = None
    for k, name in ((3, "ok_3"), (13, "ok_13")):
        est = tdigest_percentile(
            li.repartition(k), "l_extendedprice", 100, 0.5, keys=["l_returnflag"]
        )
        ok = _rank_err_ok(
            li, ["l_returnflag"], "l_extendedprice", est, "percentile", 0.5, 0.01
        ).select("l_returnflag", F.col("ok").alias(name))
        out = ok if out is None else out.join(ok, "l_returnflag")
    return out.orderBy("l_returnflag")


TDIGEST_QUERIES = {
    "tdigest_p95": q_tdigest_p95,
    "tdigest_docs_p95": q_tdigest_docs_p95,
    "tdigest_monotonic": q_tdigest_monotonic,
    "tdigest_percentile_of": q_tdigest_percentile_of,
    "tdigest_trimmed_avg": q_tdigest_trimmed_avg,
    "tdigest_value_count": q_tdigest_value_count,
    "tdigest_reaggregate": q_tdigest_reaggregate,
    "tdigest_serialization": q_tdigest_serialization,
    "tdigest_partition_invariance": q_tdigest_partition_invariance,
}

TDIGEST_ORACLES = {
    "tdigest_p95": (
        "SELECT l_returnflag, COUNT(*) AS n, TRUE AS ok FROM lineitem "
        "GROUP BY l_returnflag ORDER BY l_returnflag"
    ),
    "tdigest_docs_p95": (
        "SELECT lang, COUNT(*) AS n, TRUE AS ok FROM documents "
        "GROUP BY lang ORDER BY lang"
    ),
    "tdigest_monotonic": (
        "SELECT l_returnflag, CAST(0 AS BIGINT) AS violations FROM lineitem "
        "GROUP BY l_returnflag ORDER BY l_returnflag"
    ),
    "tdigest_percentile_of": (
        "SELECT event_type, COUNT(*) AS n, TRUE AS ok FROM events "
        "GROUP BY event_type ORDER BY event_type"
    ),
    "tdigest_trimmed_avg": (
        "SELECT l_linestatus, TRUE AS ok FROM lineitem "
        "GROUP BY l_linestatus ORDER BY l_linestatus"
    ),
    "tdigest_value_count": (
        "SELECT l_returnflag, COUNT(*) AS n, TRUE AS ok FROM lineitem "
        "GROUP BY l_returnflag ORDER BY l_returnflag"
    ),
    "tdigest_reaggregate": (
        "SELECT l_returnflag, COUNT(*) AS n, TRUE AS ok FROM lineitem "
        "GROUP BY l_returnflag ORDER BY l_returnflag"
    ),
    "tdigest_serialization": (
        "SELECT l_returnflag, COUNT(*) AS n, TRUE AS text_stable FROM lineitem "
        "GROUP BY l_returnflag ORDER BY l_returnflag"
    ),
    "tdigest_partition_invariance": (
        "SELECT l_returnflag, TRUE AS ok_3, TRUE AS ok_13 FROM lineitem "
        "GROUP BY l_returnflag ORDER BY l_returnflag"
    ),
}


def all_queries():
    return dict(TDIGEST_QUERIES)


def all_oracles():
    return dict(TDIGEST_ORACLES)
