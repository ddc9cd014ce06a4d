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
    tdigest_avg_digests,
    tdigest_percentile,
    tdigest_percentile_digests,
    tdigest_percentile_of,
    tdigest_percentile_of_digests,
    tdigest_sum,
    tdigest_sum_digests,
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
    """Grouped p95 within the c=100 rank-error band (basic.sql pattern).

    Also asserts the ``partial_compression`` accuracy knob (build
    partials at c=500, downsample to c=100 at finalize — pays
    partial/final× shuffle bytes for a finer pre-merge resolution):
    its rank error must land the same band AND match-or-beat the plain
    c=100 build per group (measured sf0.01: every group improves, e.g.
    6.4e-4 -> 3.1e-4; the 1e-3 slack absorbs split-boundary jitter)."""
    li = _read(spark, sf_dir, "lineitem").select("l_returnflag", "l_extendedprice")
    est = tdigest_percentile(li, "l_extendedprice", 100, 0.95, keys=["l_returnflag"])
    est_pc = tdigest_percentile(
        li, "l_extendedprice", 100, 0.95, keys=["l_returnflag"],
        partial_compression=500,
    ).select("l_returnflag", F.col("percentile").alias("pc_est"))
    err = (
        li.join(F.broadcast(est), "l_returnflag")
        .join(F.broadcast(est_pc), "l_returnflag")
        .groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n"),
            F.abs(
                F.avg((F.col("l_extendedprice") <= F.col("percentile")).cast("double"))
                - 0.95
            ).alias("e_plain"),
            F.abs(
                F.avg((F.col("l_extendedprice") <= F.col("pc_est")).cast("double"))
                - 0.95
            ).alias("e_pc"),
        )
    )
    # "matches or beats": within slack of the plain build OR inside an
    # absolute 0.002 band (measured e_pc <= 4e-4, so both arms carry
    # >= 5x headroom — a comparative boolean between two
    # partition-order-sensitive builds must not sit on the edge)
    return err.select(
        "l_returnflag",
        "n",
        (F.col("e_plain") < 0.005).alias("ok"),
        (
            (F.col("e_pc") < 0.005)
            & (
                (F.col("e_pc") <= F.col("e_plain") + 0.002)
                | (F.col("e_pc") < 0.002)
            )
        ).alias("pc_ok"),
    ).orderBy("l_returnflag")


def q_tdigest_docs_p95(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship web-text query: per-language p95 of document length."""
    docs = _read(spark, sf_dir, "documents").select("lang", "n_chars")
    docs = docs.withColumn("n_chars", F.col("n_chars").cast("double"))
    est = tdigest_percentile(docs, "n_chars", 100, 0.95, keys=["lang"])
    return _rank_err_ok(docs, ["lang"], "n_chars", est, "percentile", 0.95, 0.01).orderBy(
        "lang"
    )


def q_salted_skew_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salt-based skew mitigation on the hot language (en carries ~44%
    of documents — the north-star hot-key shape): the engine's salt=8
    path splits every key's partials across 8 sub-keys before the
    per-key merge, so no single task ever folds a hot key's whole value
    stream.  Checks that actually bite: the salted digest's COUNT must
    EQUAL the exact group count (a salt bug that drops or double-folds
    a sub-key's partials changes the count even when the percentile
    stays plausible), and the percentile estimated from that digest
    must land the exact-rank band."""
    docs = _read(spark, sf_dir, "documents").select(
        "lang", F.col("n_chars").cast("double").alias("v")
    )
    # ONE salted aggregation; count and percentile both read from the
    # same built digest via §2.1.3 scalars (no second build pass)
    est = tdigest(docs, "v", 100, keys=["lang"], salt=8).select(
        "lang",
        TF.tdigest_count(F.col("tdigest")).alias("n_dig"),
        TF.tdigest_quantile(F.col("tdigest"), 0.95).alias("percentile"),
    )
    checked = docs.join(F.broadcast(est), "lang").groupBy("lang").agg(
        F.count("*").alias("n"),
        F.first("n_dig").alias("n_dig"),
        F.avg((F.col("v") <= F.col("percentile")).cast("double")).alias(
            "rank"
        ),
    )
    return checked.select(
        "lang",
        "n",
        (
            (F.col("n_dig") == F.col("n"))
            & (F.abs(F.col("rank") - 0.95) < 0.01)
        ).alias("ok"),
    ).orderBy("lang")


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


def q_tdigest_trimmed_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trimmed sum — raw values (#13), (value,count) ingestion (#14) —
    plus trimmed avg/sum over stored digests (#20/#21), all vs the exact
    count-window oracle (trimmed_aggregates.sql:29-89)."""
    li = _read(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_linestatus", "l_extendedprice", "l_quantity"
    )
    w = Window.partitionBy("l_linestatus").orderBy("l_extendedprice")
    ranked = li.withColumn("rn", F.row_number().over(w) - 1).withColumn(
        "n", F.count("*").over(Window.partitionBy("l_linestatus"))
    )
    window_rows = ranked.filter(
        (F.col("rn") >= F.floor(F.col("n") * 0.1))
        & (F.col("rn") < F.ceil(F.col("n") * 0.9))
    )
    exact = window_rows.groupBy("l_linestatus").agg(
        F.sum("l_extendedprice").alias("exact_sum"),
        F.avg("l_extendedprice").alias("exact_avg"),
    )
    # #13: trimmed sum over raw values
    est13 = tdigest_sum(li, "l_extendedprice", 100, 0.1, 0.9, keys=["l_linestatus"])
    # #14: trimmed sum over (value, count) pre-aggregated l_quantity
    wq = Window.partitionBy("l_linestatus").orderBy("l_quantity")
    rq = li.withColumn("rn", F.row_number().over(wq) - 1).withColumn(
        "n", F.count("*").over(Window.partitionBy("l_linestatus"))
    )
    exact_q = (
        rq.filter(
            (F.col("rn") >= F.floor(F.col("n") * 0.1))
            & (F.col("rn") < F.ceil(F.col("n") * 0.9))
        )
        .groupBy("l_linestatus")
        .agg(F.sum("l_quantity").alias("exact_qsum"))
    )
    vc = li.groupBy("l_linestatus", "l_quantity").agg(F.count("*").alias("cnt"))
    est14 = tdigest_sum(
        vc, "l_quantity", 100, 0.1, 0.9, keys=["l_linestatus"], count_col="cnt",
        result_col="qsum",
    )
    # #20/#21: trimmed avg/sum over stored digests (built per finer grain)
    dig = tdigest(
        li, "l_extendedprice", 100, keys=["l_linestatus", "l_returnflag"]
    )
    est20 = tdigest_avg_digests(dig, "tdigest", 0.1, 0.9, keys=["l_linestatus"])
    est21 = tdigest_sum_digests(
        dig, "tdigest", 0.1, 0.9, keys=["l_linestatus"], result_col="dsum"
    )
    joined = (
        exact.join(exact_q, "l_linestatus")
        .join(F.broadcast(est13), "l_linestatus")
        .join(F.broadcast(est14), "l_linestatus")
        .join(F.broadcast(est20), "l_linestatus")
        .join(F.broadcast(est21), "l_linestatus")
    )
    return joined.select(
        "l_linestatus",
        (F.abs(F.col("sum") - F.col("exact_sum")) / F.col("exact_sum") < 0.01).alias(
            "ok_sum"
        ),
        (F.abs(F.col("qsum") - F.col("exact_qsum")) / F.col("exact_qsum") < 0.03).alias(
            "ok_sum_vc"
        ),
        (F.abs(F.col("avg") - F.col("exact_avg")) / F.col("exact_avg") < 0.02).alias(
            "ok_avg_digests"
        ),
        (F.abs(F.col("dsum") - F.col("exact_sum")) / F.col("exact_sum") < 0.02).alias(
            "ok_sum_digests"
        ),
    ).orderBy("l_linestatus")


def q_tdigest_vc_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(value, count) ingestion with *array* parameters — quantile
    vector (#4) and hypothetical-value vector (#8) — on the heavily
    duplicated l_quantity column (value_count_api.sql:145-251).
    Tolerance = ~one value-mass (50 distinct values, ~2% each)."""
    li = _read(spark, sf_dir, "lineitem").select("l_returnflag", "l_quantity")
    vc = li.groupBy("l_returnflag", "l_quantity").agg(F.count("*").alias("cnt"))
    qs = [0.25, 0.5, 0.75]
    est4 = tdigest_percentile(
        vc, "l_quantity", 100, qs, keys=["l_returnflag"], count_col="cnt"
    )
    probes = [10.5, 25.5]
    est8 = tdigest_percentile_of(
        vc, "l_quantity", 100, probes, keys=["l_returnflag"], count_col="cnt"
    )
    exact_ranks = li.join(F.broadcast(est4), "l_returnflag").groupBy(
        "l_returnflag"
    ).agg(
        *[
            (
                F.abs(
                    F.avg(
                        (F.col("l_quantity") <= F.col("percentile")[i]).cast("double")
                    )
                    - F.lit(q)
                )
                < 0.03
            ).alias(f"ok_q{int(q * 100)}")
            for i, q in enumerate(qs)
        ],
    )
    exact_pof = li.groupBy("l_returnflag").agg(
        *[
            F.avg((F.col("l_quantity") < p).cast("double")).alias(f"r{i}")
            for i, p in enumerate(probes)
        ]
    )
    pof_ok = est8.join(exact_pof, "l_returnflag").select(
        "l_returnflag",
        *[
            (F.abs(F.col("percentile_of")[i] - F.col(f"r{i}")) < 0.03).alias(
                f"ok_h{i}"
            )
            for i in range(len(probes))
        ],
    )
    # aggregate #7 — the *scalar*-hypothetical (value, count) form —
    # folded in from the standalone tdigest_vc_pof gate (merged to keep
    # the registry inside the driver's 50-row recording window); the
    # original query function stays the single source of that assertion
    pof7_ok = q_tdigest_vc_pof(spark, sf_dir).withColumnRenamed(
        "ok", "ok_h_scalar"
    )
    return (
        exact_ranks.join(pof_ok, "l_returnflag")
        .join(pof7_ok, "l_returnflag")
        .orderBy("l_returnflag")
    )


def q_tdigest_vc_pof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate #7 — ``tdigest_percentile_of(value, count, accuracy,
    hypothetical)`` with a *scalar* hypothetical value over (value,
    count) pre-aggregated rows (value_count_api.sql:145-251): the
    estimated relative rank of the probe must match the exact rank
    computed from the raw rows.  l_quantity has ~50 distinct integer
    values (~2% mass each), so tolerance is one value-mass; the probe
    25.5 falls between values, making the exact rank unambiguous."""
    li = _read(spark, sf_dir, "lineitem").select("l_returnflag", "l_quantity")
    vc = li.groupBy("l_returnflag", "l_quantity").agg(F.count("*").alias("cnt"))
    probe = 25.5
    est = tdigest_percentile_of(
        vc, "l_quantity", 100, probe, keys=["l_returnflag"], count_col="cnt"
    )
    exact = li.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.avg((F.col("l_quantity") < probe).cast("double")).alias("exact_rank"),
    )
    return (
        est.join(exact, "l_returnflag")
        .select(
            "l_returnflag",
            "n",
            (F.abs(F.col("percentile_of") - F.col("exact_rank")) < 0.03).alias("ok"),
        )
        .orderBy("l_returnflag")
    )


def q_tdigest_vc_trimmed_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate #12 — ``tdigest_avg(value, count, accuracy, low,
    high)`` over (value, count) pre-aggregated rows
    (trimmed_aggregates.sql:29-89): trimmed mean of the duplicated
    l_quantity column vs the exact count-window mean on raw rows."""
    li = _read(spark, sf_dir, "lineitem").select("l_linestatus", "l_quantity")
    vc = li.groupBy("l_linestatus", "l_quantity").agg(F.count("*").alias("cnt"))
    est = tdigest_avg(
        vc, "l_quantity", 100, 0.1, 0.9, keys=["l_linestatus"], count_col="cnt"
    )
    w = Window.partitionBy("l_linestatus").orderBy("l_quantity")
    ranked = li.withColumn("rn", F.row_number().over(w) - 1).withColumn(
        "n", F.count("*").over(Window.partitionBy("l_linestatus"))
    )
    exact = (
        ranked.filter(
            (F.col("rn") >= F.floor(F.col("n") * 0.1))
            & (F.col("rn") < F.ceil(F.col("n") * 0.9))
        )
        .groupBy("l_linestatus")
        .agg(F.avg("l_quantity").alias("exact_avg"))
    )
    return (
        est.join(exact, "l_linestatus")
        .select(
            "l_linestatus",
            (
                F.abs(F.col("avg") - F.col("exact_avg")) / F.col("exact_avg") < 0.03
            ).alias("ok"),
        )
        .orderBy("l_linestatus")
    )


def q_tdigest_digest_inputs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Digest-input aggregates with scalar and array parameters:
    percentile array over digests (#16), percentile_of over digests,
    scalar (#17) and array (#18), plus the raw-value percentile_of
    array variant (#6) — vs exact ranks on the events table."""
    ev = _read(spark, sf_dir, "events").select("event_type", "value")
    probes = [5.0, 15.0]
    qs = [0.25, 0.75]
    # #6: raw-value percentile_of with a hypothetical-value array
    est6 = tdigest_percentile_of(ev, "value", 100, probes, keys=["event_type"])
    # stored digests per group, then digest-input aggregates
    dig = tdigest(ev, "value", 100, keys=["event_type"])
    est16 = tdigest_percentile_digests(dig, "tdigest", qs, keys=["event_type"])
    est17 = tdigest_percentile_of_digests(
        dig, "tdigest", probes[1], keys=["event_type"], result_col="pof_scalar"
    )
    est18 = tdigest_percentile_of_digests(
        dig, "tdigest", probes, keys=["event_type"], result_col="pof_arr"
    )
    exact = ev.groupBy("event_type").agg(
        *[
            (
                (
                    F.sum((F.col("value") < p).cast("long"))
                    + F.sum((F.col("value") == p).cast("long")) / 2.0
                )
                / F.count("*")
            ).alias(f"er{i}")
            for i, p in enumerate(probes)
        ],
    )
    rank16 = ev.join(F.broadcast(est16), "event_type").groupBy("event_type").agg(
        *[
            (
                F.abs(
                    F.avg((F.col("value") <= F.col("percentile")[i]).cast("double"))
                    - F.lit(q)
                )
                < 0.01
            ).alias(f"ok16_q{int(q * 100)}")
            for i, q in enumerate(qs)
        ],
    )
    joined = (
        exact.join(F.broadcast(est6), "event_type")
        .join(F.broadcast(est17), "event_type")
        .join(F.broadcast(est18), "event_type")
        .join(rank16, "event_type")
    )
    return joined.select(
        "event_type",
        (F.abs(F.col("percentile_of")[0] - F.col("er0")) < 0.01).alias("ok6_h0"),
        (F.abs(F.col("percentile_of")[1] - F.col("er1")) < 0.01).alias("ok6_h1"),
        "ok16_q25",
        "ok16_q75",
        (F.abs(F.col("pof_scalar") - F.col("er1")) < 0.01).alias("ok17"),
        (
            (F.abs(F.col("pof_arr")[0] - F.col("er0")) < 0.01)
            & (F.abs(F.col("pof_arr")[1] - F.col("er1")) < 0.01)
        ).alias("ok18"),
    ).orderBy("event_type")


def q_tdigest_scalar_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The scalar digest-function surface in one probe (incremental.sql
    :36-81 + cast.sql): incremental build with compact=false, then one
    forced tdigest_union(NULL, d) compaction, must equal the batch
    aggregate *textually*; tdigest_add / tdigest_union counts; json and
    double_array layouts; tdigest_digest_sum == exact sum; and the SQL
    tdigest_union NULL-tolerance (tdigest.c:2543-2576)."""
    from tdigest_spark.spark.sql_registry import register_sql_functions

    register_sql_functions(spark)
    n = 1000
    # the reference's minstd LCG (basic.sql:19-31): deterministic values
    vals = spark.range(1, n + 1, 1, 1).select(
        (F.pmod(F.col("id") * 16807, F.lit(2147483647)) / 2147483647.0).alias("v")
    )
    d_batch = tdigest(vals, "v", 100)
    exact = vals.agg(F.sum("v").alias("exact_sum"))
    # incremental ≡ batch (incremental.sql:36-81): all n values appended
    # with compact=false, then ONE forced compaction via union(NULL, d),
    # must byte-equal the single-shot compacted build of the same array
    arr = F.transform(
        F.sequence(F.lit(1), F.lit(n)),
        lambda i: F.pmod(i.cast("long") * 16807, F.lit(2147483647)) / 2147483647.0,
    )
    incr = spark.range(1).select(
        TF.tdigest_union(
            F.lit(None).cast("binary"),
            TF.tdigest_add(
                F.lit(None).cast("binary"), arr, compression=100, compact=False
            ),
        ).alias("d_incr"),
        TF.tdigest_add(
            F.lit(None).cast("binary"), arr, compression=100, compact=True
        ).alias("d_oneshot"),
    )
    probe = (
        d_batch.crossJoin(incr)
        .crossJoin(exact)
        .select(
            TF.tdigest_count("tdigest").alias("n"),
            (
                TF.tdigest_to_string("d_incr") == TF.tdigest_to_string("d_oneshot")
            ).alias("incr_eq_batch"),
            (TF.tdigest_count(TF.tdigest_add("tdigest", F.lit(0.5))) == n + 1).alias(
                "add_ok"
            ),
            (
                TF.tdigest_count(TF.tdigest_union("tdigest", "tdigest")) == 2 * n
            ).alias("union_ok"),
            TF.tdigest_json("tdigest").contains(f'"count": {n}').alias("json_ok"),
            (
                (TF.tdigest_double_array("tdigest")[1] == F.lit(float(n)))
                & (
                    F.size(TF.tdigest_double_array("tdigest"))
                    == TF.tdigest_double_array("tdigest")[3].cast("int") * 2 + 4
                )
            ).alias("array_ok"),
            (
                F.abs(TF.tdigest_digest_sum("tdigest") - F.col("exact_sum"))
                / F.col("exact_sum")
                < 1e-9
            ).alias("digest_sum_ok"),
            "tdigest",
        )
    )
    probe.createOrReplaceTempView("scalar_probe")
    return spark.sql(
        """
        SELECT n, incr_eq_batch, add_ok, union_ok, json_ok, array_ok,
               digest_sum_ok,
               tdigest_count(tdigest_union(CAST(NULL AS BINARY), tdigest)) = n
                   AND tdigest_count(tdigest_union(tdigest, CAST(NULL AS BINARY))) = n
                   AS sql_union_null_ok
        FROM scalar_probe
        """
    )


# ----------------------------------------------------------------------
# companion sketches (HLL / count-min / KLL / Bloom)
# ----------------------------------------------------------------------
def q_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL approx distinct vs exact COUNT(DISTINCT) within 5% (p=14,
    sigma=0.81%)."""
    from tdigest_spark.spark.sketches import hll_count_distinct

    ord_ = _read(spark, sf_dir, "orders").select("o_orderstatus", "o_custkey")
    est = hll_count_distinct(ord_, "o_custkey", keys=["o_orderstatus"])
    exact = ord_.groupBy("o_orderstatus").agg(
        F.countDistinct("o_custkey").alias("exact_d")
    )
    per_group = (
        est.join(exact, "o_orderstatus")
        .select(
            "o_orderstatus",
            (
                F.abs(F.col("approx_distinct") / F.col("exact_d") - 1.0) < 0.05
            ).alias("ok"),
        )
    )
    # rollup mergeability (was the standalone hll_rollup gate; folded in
    # to keep the registry inside the driver's 50-row window): per-group
    # sketches union-merged must recover the global distinct count
    rollup_ok = q_hll_rollup(spark, sf_dir).select(F.col("ok").alias("rollup_ok"))
    return per_group.crossJoin(F.broadcast(rollup_ok)).orderBy("o_orderstatus")


def q_countmin_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min point estimates: one-sided (est >= exact) and within
    eps*N overestimate for every event type."""
    from tdigest_spark.spark.sketches import countmin_estimate, countmin_sketch

    ev = _read(spark, sf_dir, "events").select("event_type")
    cm = countmin_sketch(ev, "event_type", width=2048, depth=5)
    exact = ev.groupBy("event_type").agg(F.count("*").alias("n"))
    probed = exact.crossJoin(F.broadcast(cm)).select(
        "event_type",
        "n",
        countmin_estimate(F.col("countmin"), F.col("event_type")).alias("est"),
    )
    total = ev.count()
    return probed.select(
        "event_type",
        "n",
        ((F.col("est") >= F.col("n")) & (F.col("est") <= F.col("n") + 0.01 * total)).alias(
            "ok"
        ),
    ).orderBy("event_type")


def q_bloom_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom filter over customer keys: every order's customer must hit
    (no false negatives); shifted non-member keys rarely hit."""
    from tdigest_spark.spark.sketches import bloom_filter, bloom_might_contain

    cust = _read(spark, sf_dir, "customer").select("c_custkey")
    bl = bloom_filter(cust, "c_custkey", m=1 << 20, k=5)
    ord_keys = _read(spark, sf_dir, "orders").select("o_custkey").distinct()
    probed = ord_keys.crossJoin(F.broadcast(bl))
    hits = probed.select(
        bloom_might_contain(F.col("bloom"), F.col("o_custkey")).alias("hit"),
        bloom_might_contain(
            F.col("bloom"), (F.col("o_custkey") + 100_000_000)
        ).alias("fp_hit"),
    )
    return hits.agg(
        F.sum(F.col("hit").cast("long")).alias("n_members_found"),
        (F.sum((~F.col("hit")).cast("long")) == 0).alias("no_false_negatives"),
        (F.avg(F.col("fp_hit").cast("double")) < 0.02).alias("fp_rate_ok"),
    )


def q_kll_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KLL median rank error < 2% AND t-digest/KLL cross-check agree."""
    from tdigest_spark.spark.sketches import kll_quantile

    ev = _read(spark, sf_dir, "events").select("event_type", "value")
    kll_est = kll_quantile(ev, "value", 0.5, keys=["event_type"], k=200)
    td_est = tdigest_percentile(ev, "value", 100, 0.5, keys=["event_type"])
    ranks = (
        ev.join(F.broadcast(kll_est), "event_type")
        .join(F.broadcast(td_est), "event_type")
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.avg((F.col("value") <= F.col("quantile")).cast("double")).alias("kr"),
            F.avg((F.col("value") <= F.col("percentile")).cast("double")).alias("tr"),
        )
    )
    # cross-check slack: the t-digest median sits inside a centroid of
    # ~4π·N·q(1-q)/c values, so its rank granularity floor is ~6/n
    return ranks.select(
        "event_type",
        (F.abs(F.col("kr") - 0.5) < 0.02).alias("kll_ok"),
        (
            F.abs(F.col("kr") - F.col("tr"))
            < F.greatest(F.lit(0.02), 6.0 / F.col("n"))
        ).alias("cross_ok"),
    ).orderBy("event_type")


def q_hll_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL sketches built per group re-aggregate to the global distinct
    (register-max merge is lossless)."""
    from tdigest_spark.spark.sketches import (
        hll_cardinality,
        hll_sketch,
        hll_union_agg,
    )

    ord_ = _read(spark, sf_dir, "orders").select("o_orderstatus", "o_custkey")
    per = hll_sketch(ord_, "o_custkey", keys=["o_orderstatus"])
    rolled = hll_union_agg(per, "hll")
    est = rolled.select(hll_cardinality("hll").alias("est"))
    exact = ord_.agg(F.countDistinct("o_custkey").alias("exact_d"))
    return est.crossJoin(exact).select(
        (F.abs(F.col("est") / F.col("exact_d") - 1.0) < 0.05).alias("ok")
    )


# ----------------------------------------------------------------------
# training-data pipeline operators (dedup / similarity / text)
# ----------------------------------------------------------------------
def _docs_with_copies(spark: SparkSession, sf_dir: str):
    """documents ∪ exact copies (+1M ids) — the planted-duplicates
    fixture used by the dedup queries (the base table has no exact
    duplicates, so we synthesize them deterministically in-query)."""
    docs = _read(spark, sf_dir, "documents").select("doc_id", "text")
    copies = docs.select((F.col("doc_id") + 1_000_000).alias("doc_id"), "text")
    return docs.unionByName(copies)


def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup finds precisely the planted copy pairs."""
    from tdigest_spark.dedup import exact_dup_pairs

    both = _docs_with_copies(spark, sf_dir)
    return exact_dup_pairs(both, "doc_id", "text").orderBy("keep_id", "dup_id")


def q_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH catches planted exact copies (always) and ' zzz'-
    mutated near-dups (Jaccard ≈ 0.9+; 32 bands × 4 rows ⇒ miss prob
    < 1e-10 per pair)."""
    from tdigest_spark.dedup import lsh_candidate_pairs, minhash_signatures

    docs = _read(spark, sf_dir, "documents").select("doc_id", "text")
    copies = docs.select((F.col("doc_id") + 1_000_000).alias("doc_id"), "text")
    mutated = docs.select(
        (F.col("doc_id") + 2_000_000).alias("doc_id"),
        F.concat("text", F.lit(" zzz")).alias("text"),
    )
    all_docs = docs.unionByName(copies).unionByName(mutated)
    sigs = minhash_signatures(all_docs, "doc_id", "text")
    cands = lsh_candidate_pairs(sigs, "doc_id", bands=32, num_hashes=128)
    return cands.agg(
        F.sum(
            ((F.col("id_b") - F.col("id_a") == 1_000_000) & (F.col("id_a") < 1_000_000))
            .cast("long")
        ).alias("exact_caught"),
        F.sum(
            ((F.col("id_b") - F.col("id_a") == 2_000_000) & (F.col("id_a") < 1_000_000))
            .cast("long")
        ).alias("near_caught"),
    )


def q_minhash_word_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word-gram shingle mode (the web-dedup configuration — words
    hashed JVM-side, gram polynomial folded in NumPy): planted exact
    copies always band together; appending one word leaves Jaccard ≈
    grams/(grams+5), so 32×4 banding still catches every mutated
    near-dup (documents here have ≥10 words; shorter docs fold all
    word hashes into one shingle and only match exactly)."""
    from tdigest_spark.dedup import lsh_candidate_pairs, minhash_signatures

    docs = _read(spark, sf_dir, "documents").select("doc_id", "text")
    copies = docs.select((F.col("doc_id") + 1_000_000).alias("doc_id"), "text")
    mutated = docs.select(
        (F.col("doc_id") + 2_000_000).alias("doc_id"),
        F.concat("text", F.lit(" zzz")).alias("text"),
    )
    all_docs = docs.unionByName(copies).unionByName(mutated)
    sigs = minhash_signatures(all_docs, "doc_id", "text", shingle_unit="word")
    cands = lsh_candidate_pairs(sigs, "doc_id", bands=32, num_hashes=128)
    return cands.agg(
        F.sum(
            ((F.col("id_b") - F.col("id_a") == 1_000_000) & (F.col("id_a") < 1_000_000))
            .cast("long")
        ).alias("exact_caught"),
        F.sum(
            ((F.col("id_b") - F.col("id_a") == 2_000_000) & (F.col("id_a") < 1_000_000))
            .cast("long")
        ).alias("near_caught"),
    )


def q_simhash_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash chunk banding: identical docs (Hamming 0) all found."""
    from tdigest_spark.dedup import simhash_candidate_pairs, simhash_fingerprints

    both = _docs_with_copies(spark, sf_dir)
    # bulk form: JVM tokenize+hash, zero-copy Arrow vote (no per-row
    # Python objects)
    sh = simhash_fingerprints(both, "doc_id", "text", result_col="sh")
    # 16-bit chunks: chance chunk-collisions scale as n/65536 instead of
    # n/256, keeping the candidate join small at larger sf tiers
    cands = simhash_candidate_pairs(sh, "doc_id", "sh", n_chunks=4)
    return cands.agg(
        F.sum(
            ((F.col("id_b") - F.col("id_a") == 1_000_000) & (F.col("hamming") == 0))
            .cast("long")
        ).alias("identical_caught")
    )


def q_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact n-gram Jaccard of each doc vs its ' zzz'-mutated twin:
    all pairs similar (>0.5) but none identical (<1)."""
    from tdigest_spark.dedup import ngram_jaccard

    docs = _read(spark, sf_dir, "documents").select("doc_id", "text")
    pairs = docs.select(
        "doc_id",
        ngram_jaccard(F.col("text"), F.concat("text", F.lit(" zzz")), k=5).alias("j"),
    )
    return pairs.agg(
        F.count("*").alias("n_pairs"),
        F.every((F.col("j") > 0.5) & (F.col("j") < 1.0)).alias("all_similar"),
    )


def q_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-3 neighbors of the first 10 vectors —
    exact, verified against DuckDB list_cosine_similarity."""
    from tdigest_spark.similarity import cosine_topk

    emb = _read(spark, sf_dir, "embeddings")
    qrows = emb.filter(F.col("vec_id") < 10).collect()
    queries = [(r["vec_id"], list(r["embedding"])) for r in qrows]
    res = cosine_topk(emb.filter(F.col("vec_id") >= 10), "vec_id", "embedding", queries, k=3)
    return res.select("query_id", "neighbor_id", "rank").orderBy("query_id", "rank")


def q_cosine_threshold_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All embedding pairs with cosine >= 0.4 (exact block matmul)."""
    from tdigest_spark.similarity import cosine_pairs_above

    emb = _read(spark, sf_dir, "embeddings")
    return cosine_pairs_above(emb, "vec_id", "embedding", 0.4).orderBy("id_a", "id_b")


def q_ann_lsh_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-hyperplane LSH candidates cover >= 80% of true pairs
    involving a bounded probe sample (cos >= 0.4); n_true is exact and
    oracle-checkable.

    The truth set is SAMPLE-based (the ``ann_ivf`` pattern): only the
    128 lowest-id vectors are broadcast against the full corpus —
    O(|probe|·n), never the O(n²) full-table self-join, so the recall
    evaluation itself survives a 100× corpus.  Probe ids are the
    global minimum ids, so every probe-involving pair normalizes to
    id_a in the probe set."""
    from tdigest_spark.similarity import (
        cosine_pairs_above,
        rp_lsh_buckets,
        rp_lsh_candidate_pairs,
    )

    emb = _read(spark, sf_dir, "embeddings")
    n_probe = 128
    probe = emb.filter(F.col("vec_id") < n_probe)
    true_pairs = cosine_pairs_above(
        emb, "vec_id", "embedding", 0.4, probe_df=probe
    )
    buckets = rp_lsh_buckets(emb, "vec_id", "embedding", dim=64, n_tables=16, n_bits=4)
    cands = rp_lsh_candidate_pairs(buckets, "vec_id").filter(
        F.col("id_a") < n_probe
    )
    hit = true_pairs.join(cands, ["id_a", "id_b"], "left_semi")
    return true_pairs.agg(F.count("*").alias("n_true")).crossJoin(
        hit.agg(F.count("*").alias("n_hit"))
    ).select(
        "n_true",
        (F.col("n_hit") >= F.col("n_true") * 0.8).alias("recall_ok"),
    )


def q_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-probed ANN: recall@10 of the probed search vs the exact
    brute-force baseline over the same corpus.  Centroids are trained
    deterministically (seeded k-means on a sample), so the result is
    stable; n_queries is exact and oracle-checkable."""
    from tdigest_spark.similarity import cosine_topk, ivf_centroids, ivf_topk

    emb = _read(spark, sf_dir, "embeddings")
    qrows = emb.filter(F.col("vec_id") < 10).collect()
    queries = [(r["vec_id"], list(r["embedding"])) for r in qrows]
    corpus = emb.filter(F.col("vec_id") >= 10)
    cents = ivf_centroids(corpus, "embedding", n_lists=16, order_col="vec_id")
    ivf = ivf_topk(corpus, "vec_id", "embedding", queries, cents, k=10, n_probe=8)
    exact = cosine_topk(corpus, "vec_id", "embedding", queries, k=10)
    hit = exact.select("query_id", "neighbor_id").join(
        ivf.select("query_id", "neighbor_id"), ["query_id", "neighbor_id"], "left_semi"
    )
    return (
        exact.agg(F.count("*").alias("n_exact"))
        .crossJoin(hit.agg(F.count("*").alias("n_hit")))
        .select(
            F.lit(10).cast("long").alias("n_queries"),
            (F.col("n_hit") >= F.col("n_exact") * 0.7).alias("recall_ok"),
        )
    )


def q_ann_ivf_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The STORED bucketed IVF index — the 100 TB ANN layout: write the
    index bucketed by list_id (one assignment pass, centroids trained
    by the DISTRIBUTED Lloyd path), answer probed top-k through Spark's
    bucket pruning, recall@10 >= 0.7 vs the exact brute-force baseline.
    Pruning is asserted twice: the full 10-query probe scan must be
    bounded by its probe set, and a single-query scan (n_probe=6 of 16
    lists) must show ``SelectedBucketsCount`` STRICTLY below the bucket
    total — a check that fails whenever pruning is actually off, which
    the full-probe bound alone cannot guarantee (10 queries × 12 probes
    legitimately cover all 16 lists at this sf).  The whole probe runs
    under ``bucket_pruning_enforced`` so the verdict is independent of
    the session's ``autoBucketedScan`` conf (the r4/r5 driver flip: a
    vanilla session drops the bucketed scan for this shape and pruning
    silently disappears).  The verdict row is materialized eagerly so
    the scratch table can be dropped before returning (the driver
    collects the returned frame lazily)."""
    import contextlib
    import io
    import re
    import shutil
    from urllib.parse import urlparse

    from tdigest_spark.similarity import (
        bucket_pruning_enforced,
        cosine_topk,
        ivf_centroids_distributed,
        ivf_probe_lists,
        ivf_topk_bucketed,
        ivf_write_index,
    )

    def _selected_buckets(scan_df):
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            scan_df.explain("formatted")
        m = re.search(r"SelectedBucketsCount: (\d+) out of (\d+)", buf.getvalue())
        return (int(m.group(1)), int(m.group(2))) if m else (None, None)

    emb = _read(spark, sf_dir, "embeddings")
    qrows = emb.filter(F.col("vec_id") < 10).collect()
    queries = [(r["vec_id"], list(r["embedding"])) for r in qrows]
    corpus = emb.filter(F.col("vec_id") >= 10)
    n_buckets = 16
    cents = ivf_centroids_distributed(
        corpus, "embedding", n_lists=n_buckets, order_col="vec_id",
        init_sample_rows=20_000,
    )

    table = "suite_ivf_index"
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    # clear a stale uncataloged directory under the session's ACTUAL
    # warehouse (a crashed prior run leaves the dir but no catalog
    # entry, so the DROP above is a no-op and saveAsTable would fail) —
    # only when the warehouse is local-filesystem; on an object-store
    # or HDFS warehouse a local rmtree would be meaningless (and the
    # old string-scrub produced a bogus local path from the URI)
    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir"))
    if wh.scheme in ("", "file"):
        warehouse = (wh.path or wh.netloc).replace("//", "/")
        shutil.rmtree(f"{warehouse.rstrip('/')}/{table}", ignore_errors=True)
    try:
        ivf_write_index(
            corpus, "vec_id", "embedding", cents, table, n_buckets=n_buckets
        )
        # 12 of 16 lists: the stored path scores each row against only
        # the queries probing ITS list (true IVF semantics — the
        # work-saving shape at volume), which recalls less than the
        # union-scan q_ann_ivf path at equal n_probe on this tiny
        # corpus (deterministic: seeded distributed Lloyd + tie-broken
        # top-k)
        n_probe = 12
        # the SAME probe selection ivf_topk_bucketed runs (one source
        # of truth), so the plan assertion checks the scan the recall
        # measurement actually executes
        probe_lists = ivf_probe_lists(queries, cents, n_probe)
        probe_one = ivf_probe_lists(queries[:1], cents, 6)
        with bucket_pruning_enforced(spark):
            sel, tot = _selected_buckets(
                spark.table(table).filter(F.col("list_id").isin(probe_lists))
            )
            sel1, tot1 = _selected_buckets(
                spark.table(table).filter(F.col("list_id").isin(probe_one))
            )
        # full-probe scan: pruning applied and bounded by the probed
        # lists (not strict-<: probe coverage of all 16 lists is
        # legitimate here); single-query scan: STRICTLY below the
        # total, so this gate goes red if pruning is off
        pruned_ok = (
            sel is not None
            and sel <= len(probe_lists)
            and tot == n_buckets
            and sel1 is not None
            and sel1 <= len(probe_one)
            and sel1 < tot1
            and tot1 == n_buckets
        )

        ivf = ivf_topk_bucketed(
            spark, table, "vec_id", "embedding", queries, cents,
            k=10, n_probe=n_probe,
        )
        exact = cosine_topk(corpus, "vec_id", "embedding", queries, k=10)
        hit = exact.select("query_id", "neighbor_id").join(
            ivf.select("query_id", "neighbor_id"),
            ["query_id", "neighbor_id"],
            "left_semi",
        )
        # recall@10 with measured headroom: the 0.7 bar is the gate,
        # the 0.8 bar proves the gate is not sitting on the edge (the
        # r04 driver flip was a zero-headroom boolean; measured value
        # here is 0.91 with fully deterministic centroids + tie-broken
        # top-k).  The raw recall value is recorded in BENCH.md; the
        # driver row carries the banded booleans so a one-neighbor
        # float near-tie can never flip the hash.
        verdict = (
            exact.agg(F.count("*").alias("n_exact"))
            .crossJoin(hit.agg(F.count("*").alias("n_hit")))
            .select(
                F.lit(10).cast("long").alias("n_queries"),
                (F.col("n_hit") >= F.col("n_exact") * 0.7).alias("recall_ok"),
                (F.col("n_hit") >= F.col("n_exact") * 0.8).alias("recall_hi"),
                F.lit(pruned_ok).alias("pruned_ok"),
            )
            .collect()
        )
        # ivf_topk_bucketed returns a localCheckpoint-ed (lineage-free)
        # bounded result — nothing to unpersist; the checkpoint RDD is
        # released with the frame
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}")
    return spark.createDataFrame(
        verdict,
        "n_queries long, recall_ok boolean, recall_hi boolean, pruned_ok boolean",
    )


def q_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact whitespace-token totals per language (pure JVM split)."""
    from tdigest_spark.text import token_count

    docs = _read(spark, sf_dir, "documents")
    return (
        docs.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(token_count(F.col("text"))).alias("total_tokens"),
        )
        .orderBy("lang")
    )


def q_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Docs passing the quality gate per source — exact, replicated in
    the DuckDB oracle expression-for-expression."""
    from tdigest_spark.text import quality_pass

    docs = _read(spark, sf_dir, "documents")
    return (
        docs.groupBy("source")
        .agg(F.sum(quality_pass(F.col("text")).cast("long")).alias("n_pass"))
        .orderBy("source")
    )


def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic language-ID accuracy on a deterministic multilingual
    probe corpus (the documents table shares one synthetic vocabulary
    across langs, so real language evidence must be synthesized)."""
    from tdigest_spark.text import lang_id

    samples = [
        (1, "the cat sat on the mat and it was happy with all of this", "en"),
        (2, "der hund und die katze sind in dem haus mit einer maus", "de"),
        (3, "le chat est dans la maison avec un chien et il ne dort pas", "fr"),
        (4, "el perro y el gato están en la casa con un ratón muy pequeño", "es"),
        (5, "o cachorro e o gato estão em uma casa com um rato pequeno", "pt"),
        (6, "de hond en de kat zijn in het huis met een muis en ze slapen", "nl"),
        (7, "il cane e il gatto sono in una casa con un topo che dorme", "it"),
        (8, "这是一个中文句子没有空格也可以检测出来", "zh"),
    ]
    df = spark.createDataFrame(samples, ["id", "txt", "expected"])
    res = lang_id(df, "txt", "id")
    return res.agg(
        F.count("*").alias("n"),
        F.sum((F.col("lang_pred") == F.col("expected")).cast("long")).alias("correct"),
    )


def q_fingerprint_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content fingerprints of planted copies match their originals."""
    from tdigest_spark.text import content_fingerprint

    docs = _read(spark, sf_dir, "documents").select("doc_id", "text")
    fp = docs.select("doc_id", content_fingerprint(F.col("text")).alias("fp"))
    fp_copy = docs.select(
        "doc_id", content_fingerprint(F.concat(F.lit("  "), "text", F.lit(" "))).alias("fp2")
    )
    j = fp.join(fp_copy, "doc_id")
    return j.agg(
        F.count("*").alias("n_docs"),
        F.every(F.col("fp") == F.col("fp2")).alias("normalization_stable"),
    )


def q_winnow_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing fingerprints (Schleimer et al. 2003) as a near-dup
    signal: appending a short suffix to a document changes only the
    windows that see the tail, so the fingerprint sets of original vs
    mutated doc must stay majority-overlapping (Jaccard > 0.5 for
    every doc), while the batch path itself is differential-tested
    against the per-doc reference in pytest."""
    from tdigest_spark.text import winnow_fingerprints

    docs = _read(spark, sf_dir, "documents").select("doc_id", "text")
    orig = docs.select(
        "doc_id", winnow_fingerprints(F.col("text")).alias("w")
    )
    mutated = docs.select(
        "doc_id",
        winnow_fingerprints(
            F.concat("text", F.lit(" zzz appended marker text"))
        ).alias("w2"),
    )
    j = orig.join(mutated, "doc_id").select(
        "doc_id",
        F.size("w").alias("nw"),
        (
            F.size(F.array_intersect("w", "w2"))
            / F.size(F.array_union("w", "w2"))
        ).alias("sim"),
    )
    # a 24-char suffix rewrites a large share of a SHORT doc's few
    # windows (measured sim 0.43 at 3 fingerprints), so the per-doc
    # bound applies where the fingerprint set is big enough to carry
    # a signal; the corpus-average bound covers everything
    return j.agg(
        F.count("*").alias("n_docs"),
        (
            F.every(F.when(F.col("nw") >= 8, F.col("sim") > 0.5).otherwise(F.lit(True)))
            & (F.avg("sim") > 0.7)
        ).alias("near_dup_detected"),
    )


def q_dup_ngram_mass(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level duplicate 5-gram mass over documents — the exact
    substring-duplication measurement; DuckDB oracle replays the same
    n-gram explode + count."""
    from tdigest_spark.dedup import duplicate_ngram_mass

    docs = _read(spark, sf_dir, "documents")
    return duplicate_ngram_mass(docs, "text", n=5)


def q_substring_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring dedup, removal half (Lee et al. 2022): every
    token covered by a corpus-duplicated word 5-gram is cut and the
    survivors reassembled in order; the DuckDB oracle replays the full
    pipeline — gram counts, covered-position explode, anti-join,
    ordered reassembly — and every doc's clean_text must match
    byte-for-byte (fully-duplicated docs come back empty, not
    dropped)."""
    from tdigest_spark.dedup import remove_duplicate_ngrams

    docs = _read(spark, sf_dir, "documents")
    return remove_duplicate_ngrams(docs, "doc_id", "text", n=5).orderBy(
        "doc_id"
    )


def q_word_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition screen: docs whose most frequent token
    exceeds 20% of all tokens, per language (exact wordcount shape)."""
    from tdigest_spark.text import word_repetition

    docs = _read(spark, sf_dir, "documents")
    per = word_repetition(docs, "doc_id", "text", carry=("lang",))
    return (
        per.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum((F.col("top_token_frac") > 0.2).cast("long")).alias("n_repetitive"),
        )
        .orderBy("lang")
    )


def q_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII detect + scrub: plant a deterministic email+phone into every
    third document, count detections per source, verify the scrubbed
    text re-scans clean — oracle replays the same plant/regex/scrub."""
    from tdigest_spark.text import pii_count, scrub_pii

    docs = _read(spark, sf_dir, "documents")
    aug = docs.withColumn(
        "t2",
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(
                F.col("text"),
                F.lit(" contact user"),
                F.col("doc_id").cast("string"),
                F.lit("@example.com or call +1 555-123-4567"),
            ),
        ).otherwise(F.col("text")),
    )
    return (
        aug.groupBy("source")
        .agg(
            F.sum((pii_count(F.col("t2")) > 0).cast("long")).alias("n_docs_with_pii"),
            F.sum(pii_count(F.col("t2")).cast("long")).alias("n_pii_matches"),
            F.sum(pii_count(scrub_pii(F.col("t2"))).cast("long")).alias("residual_pii"),
        )
        .orderBy("source")
    )


def q_boilerplate_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style line-level dedup: plant two boilerplate lines into
    every document, strip lines shared by >= 3 docs, report per-source
    exact removal stats — oracle replays the same split/count/strip."""
    from tdigest_spark.text import strip_boilerplate

    docs = _read(spark, sf_dir, "documents").select("doc_id", "source", "text")
    aug = docs.select(
        "doc_id",
        "source",
        F.concat(
            "text", F.lit("\nSHARE THIS ARTICLE\naccept cookies to continue")
        ).alias("t"),
    )
    cleaned = strip_boilerplate(aug, "doc_id", "t", min_docs=3, carry=("source",))
    total = (
        aug.select("source", F.size(F.split("t", "\n")).alias("nl"))
        .groupBy("source")
        .agg(F.sum("nl").alias("total_lines"))
    )
    per_src = cleaned.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_lines_kept").alias("lines_kept"),
        F.sum(F.length("clean_text")).alias("cleaned_chars"),
    )
    return (
        per_src.join(total, "source")
        .select(
            "source",
            "n_docs",
            (F.col("total_lines") - F.col("lines_kept")).alias("lines_removed"),
            "cleaned_chars",
        )
        .orderBy("source")
    )


def q_url_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization collapses 6 planted crawl-variant styles
    (scheme/host case, www., :443, trailing slash, query order,
    fragment) of 25 pages into 25 clusters of 6.  The probe corpus is
    deterministic, so the oracle is the closed-form expected rows."""
    from tdigest_spark.urls import url_dedup

    n_pages, n_var = 25, 6
    base = spark.range(n_pages * n_var).select(
        "id",
        (F.col("id") % n_pages).cast("string").alias("k"),
        (F.col("id") % n_var).alias("v"),
    )
    q12, q21 = F.lit("?a=1&b=2"), F.lit("?b=2&a=1")
    k = F.col("k")
    url = (
        F.when(F.col("v") == 0, F.concat(F.lit("https://example.com/p"), k, q12))
        .when(F.col("v") == 1, F.concat(F.lit("HTTPS://EXAMPLE.COM/p"), k, q21))
        .when(F.col("v") == 2, F.concat(F.lit("https://www.example.com/p"), k, q12))
        .when(F.col("v") == 3, F.concat(F.lit("https://example.com:443/p"), k, q21))
        .when(F.col("v") == 4, F.concat(F.lit("https://example.com/p"), k, F.lit("/"), q21))
        .otherwise(F.concat(F.lit("https://example.com/p"), k, q12, F.lit("#frag")))
    )
    probe = base.select("id", url.alias("url"))
    return url_dedup(probe, "url", "id").orderBy("keep_id")


def q_sql_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-callable scalar functions over a digest table (the
    reference's SQL surface: tdigest_count / tdigest_digest_avg /
    text roundtrip), full-window trimmed avg == exact AVG."""
    from tdigest_spark.spark.sql_registry import register_sql_functions

    register_sql_functions(spark)
    li = _read(spark, sf_dir, "lineitem").select("l_returnflag", "l_extendedprice")
    dig = tdigest(li, "l_extendedprice", 100, keys=["l_returnflag"])
    dig.createOrReplaceTempView("suite_digests")
    exact = li.groupBy("l_returnflag").agg(F.avg("l_extendedprice").alias("exact_avg"))
    exact.createOrReplaceTempView("suite_exact")
    return spark.sql(
        """
        SELECT d.l_returnflag,
               tdigest_count(d.tdigest) AS n,
               abs(tdigest_digest_avg(d.tdigest) - e.exact_avg)
                   / e.exact_avg < 1e-9 AS avg_ok,
               tdigest_to_string(tdigest_parse(tdigest_to_string(d.tdigest)))
                   = tdigest_to_string(d.tdigest) AS roundtrip_ok
        FROM suite_digests d JOIN suite_exact e USING (l_returnflag)
        ORDER BY d.l_returnflag
        """
    )


_SUITE_TMP_ROOT: str | None = None


def _suite_tmpdir(prefix: str) -> str:
    """Temp dir under ONE per-process root removed at interpreter exit.

    The streaming queries write parquet replicas, checkpoints, and
    sinks; naked mkdtemp calls would leak gigabytes into /tmp across
    repeated gate runs until the disk fills."""
    global _SUITE_TMP_ROOT
    import atexit
    import shutil
    import tempfile

    if _SUITE_TMP_ROOT is None:
        _SUITE_TMP_ROOT = tempfile.mkdtemp(prefix="tdigest_suite_tmp_")
        atexit.register(shutil.rmtree, _SUITE_TMP_ROOT, ignore_errors=True)
    return tempfile.mkdtemp(prefix=prefix, dir=_SUITE_TMP_ROOT)


def _replay_as_stream(spark, df, split_col: str, prefix: str):
    """Replay a DataFrame as 3 parquet micro-batches (split on
    pmod(split_col, 3), one file per trigger) — the streaming queries'
    shared fixture."""
    src = _suite_tmpdir(prefix)
    cols = [c for c in df.columns if c != split_col]
    for i in range(3):
        df.filter(F.pmod(split_col, F.lit(3)) == i).select(*cols).coalesce(
            1
        ).write.mode("append").parquet(src)
    schema = spark.read.parquet(src).schema
    return (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    )


def _run_stream_to_memory(spark, out, prefix: str):
    """Run a streaming DataFrame to completion into a memory sink and
    return its collected update rows."""
    import uuid

    name = f"{prefix}_{uuid.uuid4().hex[:8]}"
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .option("checkpointLocation", _suite_tmpdir(f"{prefix}_ckpt_"))
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(300):
        q.stop()
        raise TimeoutError(f"streaming query {name} did not finish in 300s")
    return spark.sql(f"SELECT * FROM {name}").collect()


def q_streaming_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming heavy hitters with identities: a SpaceSaving sketch
    maintained across 3 replayed micro-batches.  The event stream has
    5 distinct types « m=256 counters, so the sketch is provably EXACT
    — the emitted counts themselves are hash-compared against DuckDB's
    exact GROUP BY counts, with zero error terms and total
    conservation asserted on top."""
    from tdigest_spark.kernel.topk import SpaceSaving
    from tdigest_spark.streaming.digest_stream import streaming_topk

    ev = (
        _read(spark, sf_dir, "events")
        .filter(F.col("event_type").isNotNull())
        .select("event_id", F.lit("all").alias("g"), "event_type")
    )
    stream = _replay_as_stream(spark, ev, "event_id", "suite_stopk_src_")
    rows = _run_stream_to_memory(
        spark, streaming_topk(stream, ["g"], "event_type"), "suite_stopk"
    )
    final = max(rows, key=lambda r: r["n"])  # last update wins
    s = SpaceSaving.from_bytes(bytes(final["topk"]))
    top = s.top(1000)
    exact_and_conserved = all(err == 0 for _, _, err in top) and s.n == sum(
        cnt for _, cnt, _ in top
    )
    return spark.createDataFrame(
        [
            (item, int(cnt), bool(exact_and_conserved))
            for item, cnt, _ in sorted(top)
        ],
        "event_type string, n long, ok boolean",
    )


def q_checkpoint_resume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resumable two-stage build (north rule: "resumable from
    checkpoint with per-partition lineage + metrics"): stage 1 writes
    per-split partial digests + lineage under a _SUCCESS marker;
    lineage must balance exactly (rows consumed == Σ digest counts ==
    exact input rows); a second invocation against a POISONED input
    (values ×1000) must return bit-identical results — only true if it
    resumed from the checkpoint instead of rescanning; and the final
    p95 must land the exact-rank band."""
    import shutil
    import tempfile

    from tdigest_spark.checkpoint import (
        checkpointed_percentile,
        read_partials,
        verify_lineage,
    )

    docs = _read(spark, sf_dir, "documents").select(
        "lang", F.col("n_chars").cast("double").alias("v")
    )
    root = tempfile.mkdtemp(prefix="suite_ckpt_resume_")
    ckpt = f"{root}/digests"
    try:
        r1 = {
            r["lang"]: r["percentile"]
            for r in checkpointed_percentile(
                docs, ["lang"], "v", 100, 0.95, ckpt
            ).collect()
        }
        lin = verify_lineage(read_partials(spark, ckpt), expected_rows=docs.count())
        poisoned = docs.withColumn("v", F.col("v") * 1000)
        r2 = {
            r["lang"]: r["percentile"]
            for r in checkpointed_percentile(
                poisoned, ["lang"], "v", 100, 0.95, ckpt
            ).collect()
        }
        resumed = r1 == r2 and bool(lin["consistent"])
    finally:
        shutil.rmtree(root, ignore_errors=True)
    est = spark.createDataFrame(
        sorted(r1.items()), ["lang", "p95"]
    )
    return (
        docs.join(F.broadcast(est), "lang")
        .groupBy("lang")
        .agg(
            F.count("*").alias("n"),
            F.avg((F.col("v") <= F.col("p95")).cast("double")).alias("rank"),
        )
        .select(
            "lang",
            "n",
            (
                (F.abs(F.col("rank") - 0.95) < 0.01) & F.lit(resumed)
            ).alias("ok"),
        )
        .orderBy("lang")
    )


def q_streaming_windowed_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark-windowed streaming HLL — the state-EXPIRING distinct
    counter (per-window sketches evicted once the watermark passes the
    window end; eviction itself is asserted in
    tests/test_streaming.py::test_streaming_windowed_hll_state_expires
    via the state store's numRowsTotal): per-day distinct event values
    across 3 replayed micro-batches must land the HLL p=14 band vs the
    exact per-day distinct count.  ``pre_ok`` additionally replays the
    same stream through the two-stage JVM pre-reduction
    (``prereduce_windowed_hashes`` → ``packed=True`` fold — the path
    that lifts the per-box O(events) Arrow-exchange term, BENCH.md)
    and asserts its per-window finals are IDENTICAL to the single-stage
    ones — HLL register updates are duplication/order insensitive, so
    byte-equal estimates, not a band."""
    import shutil
    import tempfile

    from tdigest_spark.streaming.digest_stream import (
        prereduce_windowed_hashes,
        read_packed_stream,
        streaming_windowed_hll,
    )

    prev_tz = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    try:
        ev = (
            _read(spark, sf_dir, "events")
            .filter(F.col("value").isNotNull() & ~F.isnan("value"))
            .select("event_id", F.col("ts").cast("timestamp").alias("ts"), "value")
        )
        stream = _replay_as_stream(spark, ev, "event_id", "suite_whll_src_")
        hashed = stream.select("ts", F.xxhash64("value").alias("h"))
        out = streaming_windowed_hll(
            hashed, "ts", "h", window_duration="1 day", watermark_delay="720 hours"
        )
        final: dict = {}
        for r in _run_stream_to_memory(spark, out, "suite_whll"):
            k = r["window_start"]
            # estimates only grow within a window; keep the last/max
            final[k] = max(final.get(k, 0), r["estimate"])

        # same stream through the two-stage pre-reduction: stage 1's
        # pure-Catalyst per-batch compaction, stage 2's packed fold —
        # finals must be byte-identical to the single-stage run's
        stg = tempfile.mkdtemp(prefix="suite_whll_pre_")
        try:
            q1 = prereduce_windowed_hashes(
                _replay_as_stream(spark, ev, "event_id", "suite_whll_src2_")
                .select("ts", F.xxhash64("value").alias("h")),
                "ts", "h", "1 day", stg + "/s", stg + "/ck1",
                availableNow=True,
            )
            if not q1.awaitTermination(300):
                q1.stop()
                raise TimeoutError("prereduce stage did not finish in 300s")
            pre = streaming_windowed_hll(
                read_packed_stream(spark, stg + "/s"),
                "window_start", "h", window_duration="1 day",
                watermark_delay="720 hours", packed=True,
            )
            pre_final: dict = {}
            for r in _run_stream_to_memory(spark, pre, "suite_whll_pre"):
                k = r["window_start"]
                pre_final[k] = max(pre_final.get(k, 0), r["estimate"])
        finally:
            shutil.rmtree(stg, ignore_errors=True)

        est = spark.createDataFrame(
            [
                (k, int(v), pre_final.get(k) == v and len(pre_final) == len(final))
                for k, v in sorted(final.items())
            ],
            ["day_ts", "nd_stream", "pre_ok"],
        )
        exact = (
            ev.select(F.date_trunc("day", F.col("ts")).alias("day_ts"), "value")
            .groupBy("day_ts")
            .agg(F.countDistinct("value").alias("nd_exact"))
        )
        checked = exact.join(F.broadcast(est), "day_ts").select(
            F.date_format("day_ts", "yyyy-MM-dd").alias("day"),
            "nd_exact",
            (
                F.abs(F.col("nd_stream") / F.col("nd_exact") - 1.0) < 0.05
            ).alias("ok"),
            "pre_ok",
        )
        return checked.orderBy("day").localCheckpoint(eager=True)
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev_tz)


def q_streaming_kll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming order statistics: a per-type KLL sketch maintained
    across 3 replayed micro-batches.  The final sketch's item count
    must EQUAL the exact count (compaction preserves total weight) and
    its median must land the exact-rank band — KLL's distribution-free
    guarantee (~1.65/k rank error at k=200 is far inside the 0.05
    tolerance for ~2k values per type)."""
    from tdigest_spark.kernel.kll import KLL
    from tdigest_spark.streaming.digest_stream import streaming_kll

    ev = (
        _read(spark, sf_dir, "events")
        .filter(F.col("event_type").isNotNull())
        .select("event_id", "event_type", "value")
    )
    stream = _replay_as_stream(spark, ev, "event_id", "suite_skll_src_")
    rows = _run_stream_to_memory(
        spark, streaming_kll(stream, ["event_type"], "value"), "suite_skll"
    )
    final: dict = {}
    for r in rows:  # last update per type wins (n only grows)
        if r["event_type"] not in final or r["n"] >= final[r["event_type"]][1]:
            final[r["event_type"]] = (bytes(r["kll"]), r["n"])
    est = spark.createDataFrame(
        [
            (t, int(n), float(KLL.from_bytes(b).quantile(0.5)))
            for t, (b, n) in sorted(final.items())
        ],
        ["event_type", "n_stream", "median"],
    )
    return (
        ev.join(F.broadcast(est), "event_type")
        .groupBy("event_type")
        .agg(
            # count only non-NaN values: the sketch documents NaN/NULL
            # dropping, so the exact side must match that semantics (a
            # NaN in events.value would otherwise fail n_stream == n
            # even though the sketch behaves as documented)
            F.count(F.when(~F.isnan("value"), F.col("value"))).alias("n"),
            F.first("n_stream").alias("n_stream"),
            # rank over non-NaN/non-NULL rows only, same reason: a NaN
            # compares false against the median and would bias the
            # measured rank low by the NaN fraction
            F.avg(
                F.when(
                    ~F.isnan("value"),
                    (F.col("value") <= F.col("median")).cast("double"),
                )
            ).alias("rank"),
        )
        .select(
            "event_type",
            "n",
            (
                (F.col("n_stream") == F.col("n"))
                & (F.abs(F.col("rank") - 0.5) < 0.05)
            ).alias("ok"),
        )
        .orderBy("event_type")
    )


def q_streaming_countmin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming heavy hitters: a per-group count-min maintained across
    3 replayed micro-batches over xxhash64(event_type).  The count-min
    table is a sum — order-independent — and shares the batch engine's
    xxhash64 family, so the final streaming sketch must be
    BYTE-IDENTICAL to the batch-built sketch over the same rows; point
    estimates must be one-sided (est >= exact) within eps·N."""
    from tdigest_spark.kernel.countmin import CountMin  # noqa: F401
    from tdigest_spark.spark.sketches import countmin_estimate, countmin_sketch
    from tdigest_spark.streaming.digest_stream import streaming_countmin

    ev = (
        _read(spark, sf_dir, "events")
        .filter(F.col("event_type").isNotNull())
        .select("event_id", "event_type")
    )
    hashed = ev.select(
        "event_id",
        F.lit("all").alias("g"),
        F.xxhash64("event_type").alias("h"),
    )
    stream = _replay_as_stream(spark, hashed, "event_id", "suite_scm_src_")
    rows = _run_stream_to_memory(
        spark, streaming_countmin(stream, ["g"], "h"), "suite_scm"
    )
    final = max(rows, key=lambda r: r["total"])  # last update wins
    stream_blob = bytes(final["countmin"])
    batch_blob = bytes(
        countmin_sketch(
            ev.select("event_type"), "event_type", width=2048, depth=5
        ).first()["countmin"]
    )
    byte_equal = stream_blob == batch_blob

    exact = ev.groupBy("event_type").agg(F.count("*").alias("n"))
    cmdf = spark.createDataFrame([(stream_blob,)], "countmin binary")
    total = ev.count()
    return (
        exact.crossJoin(F.broadcast(cmdf))
        .select(
            "event_type",
            "n",
            countmin_estimate(F.col("countmin"), F.col("event_type")).alias(
                "est"
            ),
        )
        .select(
            "event_type",
            "n",
            (
                (F.col("est") >= F.col("n"))
                & (F.col("est") <= F.col("n") + 0.01 * total)
                & F.lit(bool(byte_equal))
            ).alias("ok"),
        )
        .orderBy("event_type")
    )


def q_sql_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY-callable aggregate surface (the reference's CREATE
    AGGREGATE forms): build digests and percentiles entirely in SQL,
    verify counts exactly and the p95 rank distributively; the SQL
    union aggregate must preserve the total count.  Also runs the
    SALTED two-level recipe (salt → partial digests → union-merge) and
    asserts it matches the flat form — the executable worked example of
    the partial-merge-shaped SQL path (see README "SQL aggregates at
    scale")."""
    from tdigest_spark.spark.sql_registry import (
        register_sql_aggregates,
        register_sql_functions,
    )

    register_sql_functions(spark)
    register_sql_aggregates(spark)
    li = _read(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_orderkey", "l_extendedprice"
    )
    li.createOrReplaceTempView("sqlagg_li")
    est = spark.sql(
        """
        SELECT l_returnflag,
               tdigest_percentile_agg(l_extendedprice, 100, 0.95) AS p95,
               tdigest_count(tdigest_agg(l_extendedprice, 100)) AS n
        FROM sqlagg_li GROUP BY l_returnflag
        """
    )
    # The salted two-level recipe — the partial-merge-shaped SQL path.
    # The flat forms above stream each group's raw values to ONE task
    # (grouped-agg pandas UDFs have no COMBINEFUNC analogue, see
    # sql_registry docstring); on a hot key that is the scale killer.
    # This is the pattern SQL users should run instead: salt the group
    # key so each task digests ~1/16 of the values, then merge the 16
    # partial digests with the union aggregate — the same two-phase
    # shape the DataFrame engine (arrow_agg) and the reference's
    # PARALLEL SAFE COMBINEFUNC (tdigest--1.0.0.sql:62-70) use.
    salted = spark.sql(
        """
        SELECT l_returnflag,
               tdigest_quantile(tdigest_union_agg(d), 0.95) AS p95_salted,
               tdigest_count(tdigest_union_agg(d)) AS n_salted
        FROM (SELECT l_returnflag,
                     pmod(xxhash64(l_orderkey), 16) AS salt,
                     tdigest_agg(l_extendedprice, 100) AS d
              FROM sqlagg_li GROUP BY l_returnflag, salt)
        GROUP BY l_returnflag
        """
    )
    union_total = spark.sql(
        """
        SELECT tdigest_count(tdigest_union_agg(d)) AS un
        FROM (SELECT l_returnflag, tdigest_agg(l_extendedprice, 100) AS d
              FROM sqlagg_li GROUP BY l_returnflag)
        """
    )
    grand = li.agg(F.count("*").alias("grand_n"))
    checked = (
        li.join(F.broadcast(est), "l_returnflag")
        .join(F.broadcast(salted), "l_returnflag")
        .groupBy("l_returnflag")
        .agg(
            F.first("n").alias("n"),
            F.first("n_salted").alias("n_salted"),
            F.count("*").alias("n_exact"),
            F.avg(
                (F.col("l_extendedprice") <= F.col("p95")).cast("double")
            ).alias("rank"),
            F.avg(
                (F.col("l_extendedprice") <= F.col("p95_salted")).cast("double")
            ).alias("rank_salted"),
        )
    )
    return (
        checked.crossJoin(union_total)
        .crossJoin(grand)
        .select(
            "l_returnflag",
            "n",
            (
                (F.col("n") == F.col("n_exact"))
                & (F.abs(F.col("rank") - 0.95) < 0.01)
                & (F.col("un") == F.col("grand_n"))
                # the salted two-level form must lose no rows and land
                # the same rank bound as the flat form
                & (F.col("n_salted") == F.col("n_exact"))
                & (F.abs(F.col("rank_salted") - 0.95) < 0.01)
            ).alias("ok"),
        )
        .orderBy("l_returnflag")
    )


def q_streaming_digest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structured Streaming stateful digest build over the documents
    table replayed as 3 micro-batches: final per-lang counts must be
    exact and the p50 estimate in-bound."""
    from tdigest_spark.kernel.tdigest import TDigest
    from tdigest_spark.streaming.digest_stream import streaming_tdigest

    docs = _read(spark, sf_dir, "documents").select(
        "doc_id", "lang", F.col("n_chars").cast("double").alias("v")
    )
    stream = _replay_as_stream(spark, docs, "doc_id", "suite_stream_src_")
    # the memory sink holds one small update row per (lang, batch) —
    # driver-side by design; the *verification* below stays distributed
    # (broadcast join + F.avg rank check), never collecting the data
    rows = _run_stream_to_memory(
        spark, streaming_tdigest(stream, ["lang"], "v", compression=100),
        "suite_stream",
    )
    final = {}
    for r in rows:
        if r["lang"] not in final or r["count"] > final[r["lang"]]["count"]:
            final[r["lang"]] = {"count": r["count"], "digest": bytes(r["digest"])}
    est_rows = [
        (
            lang,
            int(f["count"]),
            float(TDigest.from_bytes(f["digest"]).quantile(0.5)),
        )
        for lang, f in sorted(final.items())
    ]
    est = spark.createDataFrame(est_rows, ["lang", "n_stream", "p50"])
    checked = (
        docs.join(F.broadcast(est), "lang")
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_exact"),
            F.first("n_stream").alias("n_stream"),
            F.avg((F.col("v") <= F.col("p50")).cast("double")).alias("rank"),
        )
    )
    return checked.select(
        "lang",
        F.col("n_stream").alias("n"),
        (
            (F.col("n_stream") == F.col("n_exact"))
            & (F.abs(F.col("rank") - 0.5) < 0.03)
        ).alias("ok"),
    ).orderBy("lang")


def q_equidepth_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth histogram from per-group digests (functions.
    tdigest_histogram): k+1 monotone edges at quantiles i/k, the
    digest-native replacement for a full sort when binning features.
    Verified distributively: every inner edge's exact rank within ±0.03
    of i/k, edges monotone, end edges exactly the group min/max."""
    from tdigest_spark.spark.functions import tdigest_histogram
    from tdigest_spark.spark.tdigest_agg import tdigest

    k = 8
    ev = _read(spark, sf_dir, "events").select("event_type", "value")
    dig = tdigest(ev, "value", 100, keys=["event_type"])
    hist = dig.select(
        "event_type", tdigest_histogram(F.col("tdigest"), k).alias("edges")
    )
    joined = ev.join(F.broadcast(hist), "event_type")
    rank_aggs = [
        F.avg((F.col("value") <= F.col("edges")[i]).cast("double")).alias(f"r{i}")
        for i in range(1, k)
    ]
    agg = joined.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.min("value").alias("vmin"),
        F.max("value").alias("vmax"),
        F.first("edges").alias("edges"),
        *rank_aggs,
    )
    ok = (F.col("edges") == F.array_sort("edges")) & (
        F.abs(F.col("edges")[0] - F.col("vmin")) < 1e-9
    ) & (F.abs(F.col("edges")[k] - F.col("vmax")) < 1e-9)
    for i in range(1, k):
        ok = ok & (F.abs(F.col(f"r{i}") - i / k) < 0.03)
    return agg.select("event_type", "n", ok.alias("ok")).orderBy("event_type")


def q_streaming_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming distinct counts: per-source HLL state maintained
    across 3 replayed micro-batches over xxhash64(doc text); the final
    estimate must sit inside the p=14 error band of the exact distinct
    count, and the emitted sketch must merge losslessly with a
    batch-built sketch of the same data (register-max merge)."""
    from tdigest_spark.kernel.hll import HLL
    from tdigest_spark.streaming.digest_stream import streaming_hll_distinct

    docs = _read(spark, sf_dir, "documents").select("doc_id", "source", "text")
    hashed = docs.select(
        "doc_id", "source", F.xxhash64("text").alias("h")
    )
    stream = _replay_as_stream(spark, hashed, "doc_id", "suite_shll_src_")
    rows = _run_stream_to_memory(
        spark, streaming_hll_distinct(stream, ["source"], "h"), "suite_shll"
    )
    final: dict = {}
    for r in rows:  # last update per source wins (estimates only grow)
        if r["source"] not in final or r["estimate"] >= final[r["source"]][1]:
            final[r["source"]] = (bytes(r["hll"]), r["estimate"])
    # register-max merge of a sketch with itself must be the identity
    # (mergeability probe on the emitted wire format)
    self_merge_stable = []
    for src, (b, est) in sorted(final.items()):
        h = HLL.from_bytes(b)
        h.merge(HLL.from_bytes(b))
        self_merge_stable.append(h.to_bytes() == b)
    est_df = spark.createDataFrame(
        [(src, int(est)) for src, (b, est) in sorted(final.items())],
        ["source", "est"],
    )
    exact = docs.groupBy("source").agg(
        F.countDistinct("text").alias("nd_exact")
    )
    return (
        exact.join(F.broadcast(est_df), "source")
        .select(
            "source",
            "nd_exact",
            (
                (F.abs(F.col("est") - F.col("nd_exact"))
                 / F.col("nd_exact") < 0.05)
                & F.lit(bool(all(self_merge_stable)))
            ).alias("ok"),
        )
        .orderBy("source")
    )


def q_streaming_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exact dedup (dropDuplicatesWithinWatermark over content
    fingerprints): documents plus a full copy replayed as micro-batches
    (+1M ids put each copy in a different batch than its original, so
    dedup state must carry across triggers).  Survivors land in a
    parquet sink and are verified distributively: survivor count must
    equal the exact distinct normalized-text count."""
    from tdigest_spark.streaming.dedup_stream import streaming_exact_dedup

    docs = _read(spark, sf_dir, "documents").select("doc_id", "text")
    copies = docs.select((F.col("doc_id") + 1_000_000).alias("doc_id"), "text")
    both = docs.unionByName(copies).withColumn(
        "ts",
        F.timestamp_seconds(F.lit(1_700_000_000) + F.pmod("doc_id", F.lit(1000))),
    )
    stream = _replay_as_stream(spark, both, "doc_id", "suite_sdedup_src_")
    out = streaming_exact_dedup(
        stream, "ts", text_col="text", watermark_delay="24 hours"
    )
    outdir = _suite_tmpdir("suite_sdedup_out_")
    q = (
        out.writeStream.format("parquet")
        .option("path", outdir)
        .option("checkpointLocation", _suite_tmpdir("suite_sdedup_ckpt_"))
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(300):
        q.stop()
        raise TimeoutError("streaming_dedup query did not finish in 300s")
    surv = spark.read.parquet(outdir)
    stats = surv.agg(
        F.count("*").alias("n_out_raw"),
        F.countDistinct("content_fp").alias("n_fp"),
    )
    norm = F.lower(F.regexp_replace(F.trim(F.col("text")), r"\s+", " "))
    base = docs.agg(
        (F.count("*") * 2).alias("n_in_raw"),
        F.countDistinct(norm).alias("n_exact_distinct"),
    )
    return stats.crossJoin(base).select(
        F.col("n_in_raw").alias("n_in"),
        F.col("n_out_raw").alias("n_out"),
        (
            (F.col("n_fp") == F.col("n_out_raw"))
            & (F.col("n_out_raw") == F.col("n_exact_distinct"))
        ).alias("unique_ok"),
    )


def q_multimodal_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal plumbing under the oracle gate: binary payloads with
    typed metadata, deterministic (fake-decoder) feature extraction,
    and frame sampling — every emitted fact is exactly computable in
    SQL from the documents table (payload = utf-8 bytes of text)."""
    from tdigest_spark.multimodal import attach_media, decode_features, frame_sample

    docs = _read(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "utf-8").alias("payload")
    )
    media = attach_media(docs, "payload")
    meta_ok = media.agg(
        F.count("*").alias("n_docs"),
        F.every(
            (F.col("media_meta.n_bytes") == F.length("payload"))
            & (F.col("media_meta.width") >= 0)
            & (F.col("media_meta.width") < 1920)
            & (F.col("media_meta.height") < 1080)
        ).alias("meta_ok"),
    )
    f1 = decode_features(media, "payload", "doc_id", dim=16)
    f2 = decode_features(media, "payload", "doc_id", dim=16).select(
        "doc_id", F.col("features").alias("features2")
    )
    feat_ok = (
        f1.join(f2, "doc_id")
        .agg(
            F.count("*").alias("n_features"),
            F.every(F.size("features") == 16).alias("dim_ok"),
            F.every(F.col("features") == F.col("features2")).alias(
                "deterministic_ok"
            ),
        )
    )
    frames = frame_sample(media, "payload", "doc_id", n_frames=4)
    n_frames = frames.agg(F.count("*").alias("n_frames"))
    return meta_ok.crossJoin(feat_ok).crossJoin(n_frames)


def q_streaming_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark-windowed streaming digests (applyInPandasWithState,
    event-time tumbling windows) replaying the events table as 3
    micro-batches: final per-day counts must be exact and the median
    estimate in-bound.  Watermark spans the full replay so no row is
    late; eviction timing is covered by tests/test_scale_paths.py."""
    from tdigest_spark.kernel.tdigest import TDigest
    from tdigest_spark.streaming.digest_stream import streaming_windowed_tdigest

    # scoped session-tz change: day boundaries must be UTC for the
    # DuckDB oracle; restore the caller's setting afterwards, with the
    # result materialized (eager localCheckpoint) while UTC is active
    prev_tz = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    try:
        # watermarks require TIMESTAMP (LTZ); the testdata parquet carries
        # TIMESTAMP_NTZ — identical instants with the session pinned to UTC
        ev = _read(spark, sf_dir, "events").select(
            "event_id", F.col("ts").cast("timestamp").alias("ts"), "value"
        )
        stream = _replay_as_stream(spark, ev, "event_id", "suite_win_src_")
        out = streaming_windowed_tdigest(
            stream, "ts", "value", window_duration="1 day", watermark_delay="720 hours"
        )
        final = {}
        for r in _run_stream_to_memory(spark, out, "suite_win"):
            k = r["window_start"]
            if k not in final or r["count"] > final[k]["count"]:
                final[k] = {"count": r["count"], "digest": bytes(r["digest"])}
        est_rows = [
            (k, int(v["count"]), float(TDigest.from_bytes(v["digest"]).quantile(0.5)))
            for k, v in sorted(final.items())
        ]
        est = spark.createDataFrame(est_rows, ["day_ts", "n_stream", "p50"])
        days = ev.select(F.date_trunc("day", F.col("ts")).alias("day_ts"), "value")
        checked = (
            days.join(F.broadcast(est), "day_ts")
            .groupBy("day_ts")
            .agg(
                # non-NaN/non-NULL only: the digest drops both, so the
                # exact count must match that semantics, and a NaN row
                # compares false against p50, biasing the rank low
                F.count(F.when(~F.isnan("value"), F.col("value"))).alias(
                    "n_exact"
                ),
                F.first("n_stream").alias("n_stream"),
                F.avg(
                    F.when(
                        ~F.isnan("value"),
                        (F.col("value") <= F.col("p50")).cast("double"),
                    )
                ).alias("rank"),
            )
        )
        return checked.select(
            F.date_format("day_ts", "yyyy-MM-dd").alias("day"),
            F.col("n_stream").alias("n"),
            (
                (F.col("n_stream") == F.col("n_exact"))
                & (
                    F.abs(F.col("rank") - 0.5)
                    < F.greatest(F.lit(0.03), 1.5 / F.col("n_exact"))
                )
            ).alias("ok"),
        ).orderBy("day").localCheckpoint(eager=True)
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev_tz)


def q_windowed_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time tumbling windows (host operator §2.2): daily t-digest
    median of event values, exact counts + rank bound per window.
    ``stream_ok`` certifies the streaming twin over the same windows;
    ``slide_ok`` certifies the SLIDING streaming form (2-day windows
    advancing 1 day — exact per-window counts, rank in band)."""
    # day boundaries must match the DuckDB oracle's (UTC) regardless of
    # the driver session's timezone — scoped: materialize under UTC,
    # then restore the caller's setting
    prev_tz = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    try:
        ev = _read(spark, sf_dir, "events").select(
            F.date_trunc("day", F.col("ts")).alias("day"), "value"
        )
        est = tdigest_percentile(ev, "value", 100, 0.5, keys=["day"])
        checked = (
            ev.join(F.broadcast(est), "day")
            .groupBy("day")
            .agg(
                F.count("*").alias("n"),
                (
                    F.abs(
                        # rank over non-NaN rows only (the digest drops
                        # them; a NaN compares false and biases low)
                        F.avg(
                            F.when(
                                ~F.isnan("value"),
                                (F.col("value") <= F.col("percentile")).cast(
                                    "double"
                                ),
                            )
                        )
                        - 0.5
                    )
                    # rank granularity is 1/n — tiny windows (sf0.001 has
                    # ~25 events/day) can't land closer than ~0.5/n to 0.5
                    < F.greatest(F.lit(0.02), 1.5 / F.count("*"))
                ).alias("ok"),
            )
        )
        batch = checked.select(
            F.date_format("day", "yyyy-MM-dd").alias("day"), "n", "ok"
        ).orderBy("day").localCheckpoint(eager=True)
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev_tz)
    # the streaming twin of the same windows (was the standalone
    # streaming_windowed gate; merged to keep the registry inside the
    # driver's 50-row window): identical day keys, so the watermarked
    # applyInPandasWithState path certifies alongside the batch path
    stream = q_streaming_windowed(spark, sf_dir).select(
        "day", F.col("ok").alias("stream_ok")
    )
    # SLIDING twin (2-day windows advancing 1 day): every event folds
    # into exactly two window sketches via the slide_duration explode;
    # streamed per-window counts must EQUAL the exact sliding counts
    # (computed with Spark's own F.window(ts, d, s) — the start grid is
    # differential-tested in tests/test_streaming.py) and each
    # window's median must land the rank band.  One boolean verdict is
    # crossJoined onto every row: sliding starts include the day
    # BEFORE the first day-row, so a per-day join cannot line up.
    from tdigest_spark.kernel.tdigest import TDigest
    from tdigest_spark.streaming.digest_stream import streaming_windowed_tdigest

    prev_tz = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    try:
        ev = _read(spark, sf_dir, "events").select(
            "event_id", F.col("ts").cast("timestamp").alias("ts"), "value"
        )
        sstream = _replay_as_stream(spark, ev, "event_id", "suite_slide_src_")
        out = streaming_windowed_tdigest(
            sstream, "ts", "value", window_duration="2 days",
            watermark_delay="720 hours", slide_duration="1 day",
        )
        final: dict = {}
        for r in _run_stream_to_memory(spark, out, "suite_slide"):
            k = r["window_start"]
            if k not in final or r["count"] > final[k]["count"]:
                final[k] = {"count": r["count"], "digest": bytes(r["digest"])}
        est_rows = [
            (k, int(v["count"]), float(TDigest.from_bytes(v["digest"]).quantile(0.5)))
            for k, v in sorted(final.items())
        ]
        sest = spark.createDataFrame(est_rows, ["w", "n_stream", "p50"])
        wins = ev.select(
            F.window("ts", "2 days", "1 day")["start"].alias("w"), "value"
        )
        per_win = (
            wins.join(F.broadcast(sest), "w", "full")
            .groupBy("w")
            .agg(
                # non-NaN/non-NULL only — the digest drops both
                F.count(F.when(~F.isnan("value"), F.col("value"))).alias("n_exact"),
                F.first("n_stream").alias("n_stream"),
                F.avg(
                    F.when(
                        ~F.isnan("value"),
                        (F.col("value") <= F.col("p50")).cast("double"),
                    )
                ).alias("rank"),
            )
        )
        count_ok = F.col("n_stream").eqNullSafe(F.col("n_exact")) | (
            # an all-NaN window emits no stream state; exact side sees 0
            (F.col("n_exact") == 0) & F.col("n_stream").isNull()
        )
        rank_bad = F.when(
            F.col("n_exact") > 0,
            F.abs(F.col("rank") - 0.5)
            >= F.greatest(F.lit(0.03), 1.5 / F.col("n_exact")),
        ).otherwise(F.lit(False))
        n_bad = per_win.filter(~count_ok | rank_bad).count()
        n_wins = per_win.count()
        slide_verdict = spark.createDataFrame(
            [(bool(n_bad == 0 and n_wins >= 2),)], "slide_ok boolean"
        ).localCheckpoint(eager=True)
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev_tz)
    return (
        batch.join(stream, "day")
        .crossJoin(F.broadcast(slide_verdict))
        .orderBy("day")
    )


def q_join_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Digest build over a broadcast-joined dimension (host operator
    §2.2 joins): per-region median supplier balance.  The join output
    is not a parquet scan, so this exercises the Catalyst-planned
    (mapInArrow) partial path in the driver gate alongside the native
    split reader used by the flat-scan queries."""
    sup = _read(spark, sf_dir, "supplier").select("s_nationkey", "s_acctbal")
    nat = _read(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    joined = sup.join(
        F.broadcast(nat), sup["s_nationkey"] == nat["n_nationkey"]
    ).select("n_regionkey", "s_acctbal")
    est = tdigest_percentile(joined, "s_acctbal", 100, 0.5, keys=["n_regionkey"])
    checked = (
        joined.join(F.broadcast(est), "n_regionkey")
        .groupBy("n_regionkey")
        .agg(
            F.count("*").alias("n"),
            (
                F.abs(
                    F.avg((F.col("s_acctbal") <= F.col("percentile")).cast("double"))
                    - 0.5
                )
                < F.greatest(F.lit(0.03), 1.5 / F.count("*"))
            ).alias("ok"),
        )
    )
    return checked.orderBy("n_regionkey")


def q_rollup_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS parity: digests built once at the finest grain
    re-aggregate to every coarser grain (digest mergeability == rollup
    composability); counts must match GROUP BY ROLLUP exactly."""
    li = _read(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_linestatus", "l_extendedprice"
    )
    fine = tdigest(li, "l_extendedprice", 100, keys=["l_returnflag", "l_linestatus"])
    lvl2 = fine.select(
        "l_returnflag", "l_linestatus", TF.tdigest_count("tdigest").alias("n")
    )
    lvl1 = tdigest_union_agg(fine, "tdigest", keys=["l_returnflag"]).select(
        "l_returnflag",
        F.lit(None).cast("string").alias("l_linestatus"),
        TF.tdigest_count("tdigest").alias("n"),
    )
    lvl0 = tdigest_union_agg(fine, "tdigest").select(
        F.lit(None).cast("string").alias("l_returnflag"),
        F.lit(None).cast("string").alias("l_linestatus"),
        TF.tdigest_count("tdigest").alias("n"),
    )
    return lvl2.unionByName(lvl1).unionByName(lvl0).orderBy(
        "l_returnflag", "l_linestatus"
    )


def q_topk_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SpaceSaving top-3 event types: exact (m >= #distinct), matches
    the SQL window-rank oracle including counts and tie-breaks."""
    from tdigest_spark.spark.topk_agg import topk

    ev = _read(spark, sf_dir, "events").select("event_type")
    return topk(ev, "event_type", 3, m=1024).select(
        "rank", "item", "count_est"
    ).orderBy("rank")


def q_reservoir_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic bottom-k reservoir: per event type, the sample has
    exactly min(k, n) rows, all of which are real members, and is
    identical under a different partitioning (merge-exactness)."""
    from tdigest_spark.spark.topk_agg import reservoir_sample_hashes

    ev = _read(spark, sf_dir, "events").select("event_type", "event_id")
    res = reservoir_sample_hashes(ev, "event_id", 100, keys=["event_type"], seed=13)
    res2 = reservoir_sample_hashes(
        ev.repartition(13), "event_id", 100, keys=["event_type"], seed=13
    ).select("event_type", F.col("sample_hashes").alias("sample2"))
    # membership check as an anti-join of the (tiny) exploded sample
    # against the streaming member relation — no per-group member
    # arrays (a collect_set of all distinct hashes per type would not
    # survive a 100x events table)
    members = ev.select(
        "event_type", F.xxhash64("event_id").alias("h")
    ).distinct()
    bad = (
        res.select("event_type", F.explode("sample_hashes").alias("h"))
        .join(members, ["event_type", "h"], "left_anti")
        .groupBy("event_type")
        .agg(F.count("*").alias("n_bad"))
    )
    joined = res.join(res2, "event_type").join(bad, "event_type", "left")
    return joined.select(
        "event_type",
        F.col("n_seen").alias("n"),
        F.size("sample_hashes").alias("sample_size"),
        F.coalesce(F.col("n_bad"), F.lit(0)).eqNullSafe(0).alias("all_members"),
        (
            F.sort_array("sample_hashes") == F.sort_array("sample2")
        ).alias("partition_invariant"),
    ).orderBy("event_type")


def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full dedup pipeline: MinHash-LSH candidates → signature-Jaccard
    verification → connected components.  Every original must share a
    cluster with its planted exact copy (natural near-dups in the
    corpus may legitimately join the same cluster)."""
    from tdigest_spark.dedup import (
        dup_clusters,
        lsh_candidate_pairs,
        minhash_jaccard_estimate,
        minhash_signatures,
    )

    both = _docs_with_copies(spark, sf_dir)
    sigs = minhash_signatures(both, "doc_id", "text")
    cands = lsh_candidate_pairs(sigs, "doc_id", bands=32, num_hashes=128)
    a = sigs.select(F.col("doc_id").alias("id_a"), F.col("minhash").alias("sig_a"))
    b = sigs.select(F.col("doc_id").alias("id_b"), F.col("minhash").alias("sig_b"))
    verified = (
        cands.join(a, "id_a").join(b, "id_b")
        .filter(minhash_jaccard_estimate("sig_a", "sig_b") >= 0.8)
        .select("id_a", "id_b")
    )
    clusters = dup_clusters(verified)
    # invariant robust to the corpus's own natural near-dups (the
    # documents table genuinely contains ~25 pairs with Jaccard >= 0.7):
    # every original must land in the same cluster as its exact copy
    orig = clusters.filter(F.col("doc_id") < 1_000_000).select(
        "doc_id", F.col("cluster_id").alias("c_orig")
    )
    copy = clusters.filter(F.col("doc_id") >= 1_000_000).select(
        (F.col("doc_id") - 1_000_000).alias("doc_id"),
        F.col("cluster_id").alias("c_copy"),
    )
    return orig.join(copy, "doc_id").agg(
        F.count("*").alias("n_pairs"),
        F.every(F.col("c_orig") == F.col("c_copy")).alias("copies_clustered"),
    )


# ----------------------------------------------------------------------
# composite gates — the driver records at most 50 query rows per round,
# so the single-operator text/dedup gates are consolidated here with
# every component's assertion columns intact (the per-operator q_*
# functions above stay callable and pytest-covered)
# ----------------------------------------------------------------------
def q_text_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite text-pipeline gate: PII detect+scrub and C4 boilerplate
    removal keep their full per-source rows; Gopher word-repetition
    contributes corpus totals; language-ID contributes its 8-probe
    accuracy.  One driver row certifies all four operators."""
    pii = q_pii_scrub(spark, sf_dir)
    bp = q_boilerplate_removal(spark, sf_dir)
    wr = q_word_repetition(spark, sf_dir).agg(
        F.sum("n_docs").alias("wr_docs"),
        F.sum("n_repetitive").alias("wr_repetitive"),
    )
    lid = q_lang_id(spark, sf_dir).select(
        F.col("n").alias("lid_n"), F.col("correct").alias("lid_correct")
    )
    return (
        pii.join(bp, "source")
        .crossJoin(F.broadcast(wr))
        .crossJoin(F.broadcast(lid))
        .orderBy("source")
    )


def q_dedup_extras(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite content-dedup gate: duplicate n-gram mass, content
    fingerprints, winnowing near-dup signal, URL canonicalization,
    multimodal plumbing, and the full MinHash->cluster pipeline — each
    component's verdict columns survive as one wide 1-row verdict."""
    dm = q_dup_ngram_mass(spark, sf_dir)
    fp = q_fingerprint_dups(spark, sf_dir).select(
        F.col("n_docs").alias("fp_docs"), "normalization_stable"
    )
    wn = q_winnow_dups(spark, sf_dir).select(
        F.col("n_docs").alias("wn_docs"), "near_dup_detected"
    )
    ud = q_url_dedup(spark, sf_dir).agg(
        F.count("*").alias("n_url_clusters"),
        F.every(F.col("n_variants") == 6).alias("url_ok"),
    )
    mm = q_multimodal_pipeline(spark, sf_dir).select(
        F.col("n_docs").alias("mm_docs"),
        "meta_ok",
        "n_features",
        "dim_ok",
        "deterministic_ok",
        "n_frames",
    )
    dc = q_dedup_clusters(spark, sf_dir)
    return (
        dm.crossJoin(fp).crossJoin(wn).crossJoin(ud).crossJoin(mm).crossJoin(dc)
    )


TDIGEST_QUERIES = {
    "tdigest_p95": q_tdigest_p95,
    "salted_skew_percentile": q_salted_skew_percentile,
    "tdigest_docs_p95": q_tdigest_docs_p95,
    "tdigest_monotonic": q_tdigest_monotonic,
    "tdigest_percentile_of": q_tdigest_percentile_of,
    "tdigest_trimmed_avg": q_tdigest_trimmed_avg,
    "tdigest_value_count": q_tdigest_value_count,
    "tdigest_reaggregate": q_tdigest_reaggregate,
    "tdigest_serialization": q_tdigest_serialization,
    "tdigest_partition_invariance": q_tdigest_partition_invariance,
    "tdigest_trimmed_sum": q_tdigest_trimmed_sum,
    "tdigest_vc_array": q_tdigest_vc_array,
    "tdigest_vc_trimmed_avg": q_tdigest_vc_trimmed_avg,
    "tdigest_digest_inputs": q_tdigest_digest_inputs,
    "tdigest_scalar_functions": q_tdigest_scalar_functions,
    "sql_surface": q_sql_surface,
    "sql_aggregates": q_sql_aggregates,
    "streaming_digest": q_streaming_digest,
    "streaming_hll": q_streaming_hll,
    "streaming_countmin": q_streaming_countmin,
    "streaming_kll": q_streaming_kll,
    "streaming_windowed_hll": q_streaming_windowed_hll,
    "checkpoint_resume": q_checkpoint_resume,
    "streaming_topk": q_streaming_topk,
    "streaming_dedup": q_streaming_dedup,
    "windowed_percentile": q_windowed_percentile,
    "join_percentile": q_join_percentile,
    "rollup_counts": q_rollup_counts,
    "equidepth_histogram": q_equidepth_histogram,
    "topk_heavy_hitters": q_topk_heavy_hitters,
    "reservoir_sample": q_reservoir_sample,
}

SKETCH_QUERIES = {
    "hll_distinct": q_hll_distinct,
    "countmin_heavy_hitters": q_countmin_heavy_hitters,
    "bloom_membership": q_bloom_membership,
    "kll_median": q_kll_median,
}

SKETCH_ORACLES = {
    "hll_distinct": (
        "SELECT o_orderstatus, TRUE AS ok, TRUE AS rollup_ok FROM orders "
        "GROUP BY o_orderstatus ORDER BY o_orderstatus"
    ),
    "countmin_heavy_hitters": (
        "SELECT event_type, COUNT(*) AS n, TRUE AS ok FROM events "
        "GROUP BY event_type ORDER BY event_type"
    ),
    "bloom_membership": (
        "SELECT COUNT(DISTINCT o_custkey) AS n_members_found, "
        "TRUE AS no_false_negatives, TRUE AS fp_rate_ok FROM orders"
    ),
    "kll_median": (
        "SELECT event_type, TRUE AS kll_ok, TRUE AS cross_ok FROM events "
        "GROUP BY event_type ORDER BY event_type"
    ),
}

TDIGEST_ORACLES = {
    "tdigest_p95": (
        "SELECT l_returnflag, COUNT(*) AS n, TRUE AS ok, TRUE AS pc_ok"
        " FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"
    ),
    "tdigest_docs_p95": (
        "SELECT lang, COUNT(*) AS n, TRUE AS ok FROM documents "
        "GROUP BY lang ORDER BY lang"
    ),
    "salted_skew_percentile": (
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
    "tdigest_trimmed_sum": (
        "SELECT l_linestatus, TRUE AS ok_sum, TRUE AS ok_sum_vc,"
        " TRUE AS ok_avg_digests, TRUE AS ok_sum_digests FROM lineitem "
        "GROUP BY l_linestatus ORDER BY l_linestatus"
    ),
    "tdigest_vc_array": (
        "SELECT l_returnflag, TRUE AS ok_q25, TRUE AS ok_q50, TRUE AS ok_q75,"
        " TRUE AS ok_h0, TRUE AS ok_h1, COUNT(*) AS n, TRUE AS ok_h_scalar"
        " FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"
    ),
    "tdigest_vc_trimmed_avg": (
        "SELECT l_linestatus, TRUE AS ok FROM lineitem "
        "GROUP BY l_linestatus ORDER BY l_linestatus"
    ),
    "tdigest_digest_inputs": (
        "SELECT event_type, TRUE AS ok6_h0, TRUE AS ok6_h1, TRUE AS ok16_q25,"
        " TRUE AS ok16_q75, TRUE AS ok17, TRUE AS ok18 FROM events "
        "GROUP BY event_type ORDER BY event_type"
    ),
    "tdigest_scalar_functions": (
        "SELECT CAST(1000 AS BIGINT) AS n, TRUE AS incr_eq_batch, TRUE AS add_ok,"
        " TRUE AS union_ok, TRUE AS json_ok, TRUE AS array_ok,"
        " TRUE AS digest_sum_ok, TRUE AS sql_union_null_ok"
    ),
    "sql_surface": (
        "SELECT l_returnflag, COUNT(*) AS n, TRUE AS avg_ok, TRUE AS roundtrip_ok "
        "FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"
    ),
    "sql_aggregates": (
        "SELECT l_returnflag, COUNT(*) AS n, TRUE AS ok FROM lineitem "
        "GROUP BY l_returnflag ORDER BY l_returnflag"
    ),
    "streaming_digest": (
        "SELECT lang, COUNT(*) AS n, TRUE AS ok FROM documents "
        "GROUP BY lang ORDER BY lang"
    ),
    "equidepth_histogram": (
        "SELECT event_type, COUNT(*) AS n, TRUE AS ok FROM events"
        " GROUP BY event_type ORDER BY event_type"
    ),
    "streaming_hll": (
        "SELECT source, COUNT(DISTINCT text) AS nd_exact, TRUE AS ok"
        " FROM documents GROUP BY source ORDER BY source"
    ),
    "streaming_countmin": (
        "SELECT event_type, COUNT(*) AS n, TRUE AS ok FROM events"
        " WHERE event_type IS NOT NULL GROUP BY event_type"
        " ORDER BY event_type"
    ),
    "streaming_kll": (
        "SELECT event_type,"
        " COUNT(CASE WHEN NOT isnan(value) THEN 1 END) AS n, TRUE AS ok"
        " FROM events WHERE event_type IS NOT NULL GROUP BY event_type"
        " ORDER BY event_type"
    ),
    "streaming_windowed_hll": (
        "SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,"
        " COUNT(DISTINCT value) AS nd_exact, TRUE AS ok, TRUE AS pre_ok"
        " FROM events"
        " WHERE value IS NOT NULL AND NOT isnan(value)"
        " GROUP BY 1 ORDER BY 1"
    ),
    "checkpoint_resume": (
        "SELECT lang, COUNT(*) AS n, TRUE AS ok FROM documents "
        "GROUP BY lang ORDER BY lang"
    ),
    "streaming_topk": (
        "SELECT event_type, COUNT(*) AS n, TRUE AS ok FROM events"
        " WHERE event_type IS NOT NULL GROUP BY event_type"
        " ORDER BY event_type"
    ),
    "streaming_dedup": (
        "SELECT CAST(2 * COUNT(*) AS BIGINT) AS n_in,"
        " CAST(COUNT(DISTINCT lower(regexp_replace(trim(text), '\\s+', ' ', 'g')))"
        " AS BIGINT) AS n_out, TRUE AS unique_ok FROM documents"
    ),
    "windowed_percentile": (
        "SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,"
        " COUNT(*) AS n, TRUE AS ok, TRUE AS stream_ok, TRUE AS slide_ok"
        " FROM events GROUP BY 1 ORDER BY 1"
    ),
    "join_percentile": (
        "SELECT n_regionkey, COUNT(*) AS n, TRUE AS ok FROM supplier "
        "JOIN nation ON s_nationkey = n_nationkey "
        "GROUP BY n_regionkey ORDER BY n_regionkey"
    ),
    "rollup_counts": (
        "SELECT l_returnflag, l_linestatus, COUNT(*) AS n FROM lineitem "
        "GROUP BY ROLLUP(l_returnflag, l_linestatus) "
        "ORDER BY l_returnflag, l_linestatus"
    ),
    "topk_heavy_hitters": (
        "WITH c AS (SELECT event_type AS item, COUNT(*) AS count_est"
        " FROM events GROUP BY event_type)"
        " SELECT CAST(ROW_NUMBER() OVER (ORDER BY count_est DESC, item) AS INT)"
        " AS rank, item, count_est FROM c ORDER BY rank LIMIT 3"
    ),
    "reservoir_sample": (
        "SELECT event_type, COUNT(*) AS n,"
        " CAST(LEAST(100, COUNT(*)) AS INT) AS sample_size,"
        " TRUE AS all_members, TRUE AS partition_invariant"
        " FROM events GROUP BY event_type ORDER BY event_type"
    ),
}


PIPELINE_QUERIES = {
    "dedup_exact": q_dedup_exact,
    "minhash_lsh": q_minhash_lsh,
    "minhash_word_lsh": q_minhash_word_lsh,
    "simhash_dups": q_simhash_dups,
    "ngram_jaccard": q_ngram_jaccard,
    "cosine_topk": q_cosine_topk,
    "cosine_threshold_pairs": q_cosine_threshold_pairs,
    "ann_lsh_recall": q_ann_lsh_recall,
    "ann_ivf": q_ann_ivf,
    "ann_ivf_bucketed": q_ann_ivf_bucketed,
    "token_stats": q_token_stats,
    "quality_filter": q_quality_filter,
    "substring_dedup": q_substring_dedup,
    "text_ops": q_text_ops,
    "dedup_extras": q_dedup_extras,
}

# PII regexes: one source of truth in text.py (RE2/Java-compatible
# subset, no quote characters, safe to inline into the oracle SQL)
from tdigest_spark.text import _PII_EMAIL as _PII_EMAIL_SQL  # noqa: E402
from tdigest_spark.text import _PII_PHONE as _PII_PHONE_SQL  # noqa: E402

_QUALITY_SQL = (
    "length(text) >= 100 AND length(text) <= 100000"
    " AND (CASE WHEN length(text) > 0 THEN"
    " CAST(length(regexp_replace(text, '[^.!?,;:]', '', 'g')) AS DOUBLE)"
    " / length(text) ELSE 0 END) <= 0.1"
    " AND (CASE WHEN len(regexp_split_to_array(trim(text), '\\s+')) > 0 THEN"
    " CAST(length(regexp_replace(text, '\\s', '', 'g')) AS DOUBLE)"
    " / len(regexp_split_to_array(trim(text), '\\s+')) ELSE 0 END)"
    " BETWEEN 2.0 AND 12.0"
)

PIPELINE_ORACLES = {
    "dedup_exact": (
        "WITH b AS ("
        " SELECT doc_id, lower(regexp_replace(trim(text), '\\s+', ' ', 'g')) AS t"
        " FROM documents"
        " UNION ALL"
        " SELECT doc_id + 1000000, lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))"
        " FROM documents),"
        " g AS (SELECT t, MIN(doc_id) AS keep_id FROM b GROUP BY t)"
        " SELECT g.keep_id, b.doc_id AS dup_id FROM b JOIN g USING (t)"
        " WHERE b.doc_id <> g.keep_id ORDER BY keep_id, dup_id"
    ),
    "minhash_lsh": (
        "SELECT COUNT(*) AS exact_caught, COUNT(*) AS near_caught FROM documents"
    ),
    "minhash_word_lsh": (
        "SELECT COUNT(*) AS exact_caught, COUNT(*) AS near_caught FROM documents"
    ),
    "simhash_dups": "SELECT COUNT(*) AS identical_caught FROM documents",
    "ngram_jaccard": (
        "SELECT COUNT(*) AS n_pairs, TRUE AS all_similar FROM documents"
    ),
    "cosine_topk": (
        "WITH sims AS ("
        " SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,"
        "  list_cosine_similarity(a.embedding, b.embedding) AS sim"
        " FROM embeddings a, embeddings b"
        " WHERE a.vec_id < 10 AND b.vec_id >= 10),"
        "ranked AS (SELECT query_id, neighbor_id,"
        " CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY sim DESC)"
        " AS INT) AS rank FROM sims) "
        "SELECT query_id, neighbor_id, rank FROM ranked WHERE rank <= 3 "
        "ORDER BY query_id, rank"
    ),
    "cosine_threshold_pairs": (
        "SELECT a.vec_id AS id_a, b.vec_id AS id_b FROM embeddings a, embeddings b"
        " WHERE a.vec_id < b.vec_id"
        " AND list_cosine_similarity(a.embedding, b.embedding) >= 0.4"
        " ORDER BY id_a, id_b"
    ),
    "ann_lsh_recall": (
        "SELECT COUNT(*) AS n_true, TRUE AS recall_ok FROM embeddings a, embeddings b"
        " WHERE a.vec_id < 128 AND a.vec_id < b.vec_id"
        " AND list_cosine_similarity(a.embedding, b.embedding) >= 0.4"
    ),
    "ann_ivf": "SELECT CAST(10 AS BIGINT) AS n_queries, TRUE AS recall_ok",
    "ann_ivf_bucketed": (
        "SELECT CAST(10 AS BIGINT) AS n_queries, TRUE AS recall_ok,"
        " TRUE AS recall_hi, TRUE AS pruned_ok"
    ),
    "token_stats": (
        "SELECT lang, COUNT(*) AS n_docs,"
        " CAST(SUM(CASE WHEN length(trim(text)) = 0 THEN 0"
        " ELSE len(regexp_split_to_array(trim(text), '\\s+')) END) AS BIGINT)"
        " AS total_tokens"
        " FROM documents GROUP BY lang ORDER BY lang"
    ),
    "quality_filter": (
        "SELECT source, CAST(SUM(CASE WHEN " + _QUALITY_SQL + " THEN 1 ELSE 0"
        " END) AS BIGINT) AS n_pass"
        " FROM documents GROUP BY source ORDER BY source"
    ),
    "substring_dedup": (
        "WITH dt AS (SELECT doc_id,"
        " CASE WHEN length(trim(text)) > 0"
        "  THEN regexp_split_to_array(trim(text), '\\s+')"
        "  ELSE CAST([] AS VARCHAR[]) END AS w FROM documents),"
        " g AS (SELECT doc_id, i - 1 AS gpos,"
        "  array_to_string(w[i:i+4], ' ') AS gram"
        "  FROM dt, UNNEST(generate_series(1, len(w) - 4)) AS t(i)"
        "  WHERE len(w) >= 5),"
        " d AS (SELECT gram FROM g GROUP BY gram HAVING COUNT(*) >= 2),"
        " cov AS (SELECT DISTINCT doc_id, tpos FROM"
        "  (SELECT g.doc_id, g.gpos + u.j AS tpos"
        "   FROM g JOIN d USING (gram),"
        "   UNNEST(generate_series(0, 4)) AS u(j))),"
        " tk AS (SELECT doc_id, i - 1 AS tpos, w[i] AS tok"
        "  FROM dt, UNNEST(generate_series(1, len(w))) AS t(i)),"
        " kept AS (SELECT tk.doc_id, tk.tpos, tk.tok FROM tk"
        "  ANTI JOIN cov ON tk.doc_id = cov.doc_id AND tk.tpos = cov.tpos),"
        " a AS (SELECT doc_id, COUNT(*) AS n_kept,"
        "  string_agg(tok, ' ' ORDER BY tpos) AS ct"
        "  FROM kept GROUP BY doc_id)"
        " SELECT dt.doc_id, CAST(len(dt.w) AS BIGINT) AS n_tokens,"
        " CAST(len(dt.w) - COALESCE(a.n_kept, 0) AS BIGINT) AS n_removed,"
        " COALESCE(a.ct, '') AS clean_text"
        " FROM dt LEFT JOIN a USING (doc_id) ORDER BY doc_id"
    ),
    # composite gates: each component's oracle SQL survives as a CTE /
    # cross-joined subquery with the SAME assertion columns it had as a
    # standalone gate
    "text_ops": (
        "WITH pa AS (SELECT source,"
        " CASE WHEN doc_id % 3 = 0 THEN text || ' contact user'"
        "  || CAST(doc_id AS VARCHAR)"
        "  || '@example.com or call +1 555-123-4567'"
        " ELSE text END AS t2 FROM documents),"
        " pp AS (SELECT source,"
        "  len(regexp_extract_all(t2, '" + _PII_EMAIL_SQL + "'))"
        "  + len(regexp_extract_all(t2, '" + _PII_PHONE_SQL + "')) AS c,"
        "  regexp_replace(regexp_replace(t2, '" + _PII_EMAIL_SQL + "',"
        "  '[EMAIL]', 'g'), '" + _PII_PHONE_SQL + "', '[PHONE]', 'g')"
        "  AS scrubbed FROM pa),"
        " pii AS (SELECT source,"
        " CAST(SUM(CASE WHEN c > 0 THEN 1 ELSE 0 END) AS BIGINT)"
        " AS n_docs_with_pii,"
        " CAST(SUM(c) AS BIGINT) AS n_pii_matches,"
        " CAST(SUM(len(regexp_extract_all(scrubbed, '" + _PII_EMAIL_SQL + "'))"
        "  + len(regexp_extract_all(scrubbed, '" + _PII_PHONE_SQL + "')))"
        " AS BIGINT) AS residual_pii"
        " FROM pp GROUP BY source),"
        " baug AS (SELECT doc_id, source,"
        " text || chr(10) || 'SHARE THIS ARTICLE' || chr(10) ||"
        " 'accept cookies to continue' AS t FROM documents),"
        " bp2 AS (SELECT doc_id, source, string_split(t, chr(10)) AS parts"
        "  FROM baug),"
        " bl AS (SELECT doc_id, source, i AS pos, parts[i] AS line"
        "  FROM bp2, UNNEST(generate_series(1, len(parts))) AS u(i)),"
        " bb AS (SELECT line FROM bl WHERE trim(line) <> ''"
        "  GROUP BY line HAVING COUNT(DISTINCT doc_id) >= 3),"
        " bk AS (SELECT * FROM bl WHERE line NOT IN (SELECT line FROM bb)),"
        " bpd AS (SELECT doc_id, source, COUNT(*) AS kept,"
        "  length(string_agg(line, chr(10) ORDER BY pos)) AS clen"
        "  FROM bk GROUP BY doc_id, source),"
        " btot AS (SELECT source, COUNT(*) AS total_lines FROM bl"
        "  GROUP BY source),"
        " bp AS (SELECT bagg.source, bagg.n_docs,"
        " CAST(btot.total_lines - bagg.lines_kept AS BIGINT) AS lines_removed,"
        " bagg.cleaned_chars FROM"
        " (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,"
        "  SUM(kept) AS lines_kept, CAST(SUM(clen) AS BIGINT)"
        "  AS cleaned_chars FROM bpd GROUP BY source) bagg"
        " JOIN btot USING (source)),"
        " wt AS (SELECT doc_id,"
        " unnest(regexp_split_to_array(trim(text), '\\s+')) AS tok"
        " FROM documents WHERE length(trim(text)) > 0),"
        " wc AS (SELECT doc_id, tok, COUNT(*) AS c FROM wt"
        "  GROUP BY doc_id, tok),"
        " wd AS (SELECT doc_id, MAX(c) AS max_c, SUM(c) AS n FROM wc"
        "  GROUP BY doc_id),"
        " wr AS (SELECT CAST(COUNT(*) AS BIGINT) AS wr_docs,"
        " CAST(SUM(CASE WHEN CAST(max_c AS DOUBLE) / n > 0.2 THEN 1 ELSE 0 END)"
        " AS BIGINT) AS wr_repetitive FROM wd),"
        " lid AS (SELECT CAST(8 AS BIGINT) AS lid_n,"
        " CAST(8 AS BIGINT) AS lid_correct)"
        " SELECT pii.source, pii.n_docs_with_pii, pii.n_pii_matches,"
        " pii.residual_pii, bp.n_docs, bp.lines_removed, bp.cleaned_chars,"
        " wr.wr_docs, wr.wr_repetitive, lid.lid_n, lid.lid_correct"
        " FROM pii JOIN bp USING (source) CROSS JOIN wr CROSS JOIN lid"
        " ORDER BY source"
    ),
    "dedup_extras": (
        "WITH w AS (SELECT regexp_split_to_array(trim(text), '\\s+') AS w"
        " FROM documents WHERE length(trim(text)) > 0),"
        " g AS (SELECT array_to_string(w[i:i+4], ' ') AS gram"
        "  FROM w, UNNEST(generate_series(1, len(w) - 4)) AS t(i)"
        "  WHERE len(w) >= 5),"
        " c AS (SELECT gram, COUNT(*) AS cnt FROM g GROUP BY gram),"
        " dm AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n_instances,"
        " CAST(COUNT(*) AS BIGINT) AS n_distinct,"
        " CAST(SUM(CASE WHEN cnt > 1 THEN cnt ELSE 0 END) AS BIGINT)"
        " AS dup_instances FROM c),"
        " fp AS (SELECT COUNT(*) AS fp_docs, TRUE AS normalization_stable"
        "  FROM documents),"
        " wn AS (SELECT CAST(COUNT(*) AS BIGINT) AS wn_docs,"
        "  TRUE AS near_dup_detected FROM documents),"
        " ud AS (SELECT CAST(25 AS BIGINT) AS n_url_clusters, TRUE AS url_ok),"
        " mm AS (SELECT COUNT(*) AS mm_docs, TRUE AS meta_ok,"
        "  COUNT(*) AS n_features, TRUE AS dim_ok, TRUE AS deterministic_ok,"
        "  CAST(SUM(LEAST(4, octet_length(encode(text)))) AS BIGINT) AS n_frames"
        "  FROM documents),"
        " dc AS (SELECT COUNT(*) AS n_pairs, TRUE AS copies_clustered"
        "  FROM documents)"
        " SELECT dm.*, fp.*, wn.*, ud.*, mm.*, dc.* FROM dm"
        " CROSS JOIN fp CROSS JOIN wn CROSS JOIN ud CROSS JOIN mm CROSS JOIN dc"
    ),
}


def all_queries():
    return {**TDIGEST_QUERIES, **SKETCH_QUERIES, **PIPELINE_QUERIES}


def all_oracles():
    return {**TDIGEST_ORACLES, **SKETCH_ORACLES, **PIPELINE_ORACLES}
