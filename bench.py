"""Benchmark harness: headline sketch queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": ..., "value": total_sec, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ..., "rows_per_sec": ...}

The queries here are the *pure* sketch pipelines (no oracle-check
overhead) — the Spark twins of the reference README's 10M-row
grouped-percentile experiment and scripts/bechmark.sql grid.
"""

from __future__ import annotations

import json
import os
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def bench_queries(spark, sf_dir):
    """name -> (fn, rows_processed_fn). Each fn triggers a full action."""
    from pyspark.sql import functions as F

    from tdigest_spark.spark.tdigest_agg import (
        tdigest,
        tdigest_avg,
        tdigest_percentile,
        tdigest_percentile_digests,
        tdigest_percentile_of,
        tdigest_union_agg,
    )

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_returnflag", "l_linestatus", "l_extendedprice", "l_quantity"
    )
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("lang", F.col("n_chars").cast("double").alias("n_chars"))
    )
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select("event_type", "value")

    def q_build_p95_grouped():
        return tdigest_percentile(
            li, "l_extendedprice", 100, 0.95, keys=["l_returnflag"]
        ).collect()

    def q_docs_p95_by_lang():
        return tdigest_percentile(docs, "n_chars", 100, 0.95, keys=["lang"]).collect()

    def q_percentile_vector_global():
        qs = [i / 100 for i in range(1, 100)]
        return tdigest_percentile(li, "l_extendedprice", 100, qs).collect()

    def q_percentile_of_grouped():
        return tdigest_percentile_of(
            ev, "value", 100, 15.0, keys=["event_type"]
        ).collect()

    def q_trimmed_avg():
        return tdigest_avg(
            li, "l_extendedprice", 100, 0.1, 0.9, keys=["l_linestatus"]
        ).collect()

    def q_value_count_ingest():
        vc = li.groupBy("l_returnflag", "l_quantity").agg(F.count("*").alias("cnt"))
        return tdigest_percentile(
            vc, "l_quantity", 100, 0.5, keys=["l_returnflag"], count_col="cnt"
        ).collect()

    def q_preagg_then_rollup():
        dig = tdigest(li, "l_extendedprice", 100, keys=["l_returnflag", "l_linestatus"])
        rolled = tdigest_union_agg(dig, "tdigest", keys=["l_returnflag"])
        return tdigest_percentile_digests(
            rolled, "tdigest", 0.9, keys=["l_returnflag"]
        ).collect()

    n_li = li.count()
    n_docs = docs.count()
    n_ev = ev.count()
    return {
        "build_p95_grouped": (q_build_p95_grouped, n_li),
        "docs_p95_by_lang": (q_docs_p95_by_lang, n_docs),
        "percentile_vector_global": (q_percentile_vector_global, n_li),
        "percentile_of_grouped": (q_percentile_of_grouped, n_ev),
        "trimmed_avg": (q_trimmed_avg, n_li),
        "value_count_ingest": (q_value_count_ingest, n_li),
        "preagg_then_rollup": (q_preagg_then_rollup, n_li),
    }


def main() -> None:
    from tdigest_spark.spark.session import get_spark

    spark = get_spark("tdigest-bench", cores=CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    qs = bench_queries(spark, SF_DIR)

    # warmup: JVM + python worker pool + parquet footer cache
    next(iter(qs.values()))[0]()

    timings: dict[str, float] = {}
    total_rows = 0
    total_time = 0.0
    for name, (fn, rows) in qs.items():
        t0 = time.time()
        fn()
        dt = time.time() - t0
        timings[name] = round(dt, 4)
        total_rows += rows
        total_time += dt

    # headline accuracy + throughput, aligned with the BASELINE metric
    # (relative-rank error vs exact + docs/sec sketch-build throughput)
    from pyspark.sql import functions as F

    from tdigest_spark.spark.tdigest_agg import tdigest_percentile

    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").select(
        "l_returnflag", "l_extendedprice"
    )
    n_rows = li.count()
    t0 = time.time()
    est = tdigest_percentile(li, "l_extendedprice", 100, 0.95, keys=["l_returnflag"])
    rows = est.collect()
    build_sec = time.time() - t0
    ranks = (
        li.join(F.broadcast(est), "l_returnflag")
        .groupBy("l_returnflag")
        .agg(
            F.avg((F.col("l_extendedprice") <= F.col("percentile")).cast("double")).alias(
                "r"
            )
        )
        .collect()
    )
    max_rank_err = max(abs(r["r"] - 0.95) for r in ranks)
    _ = rows

    # apples-to-apples rerun of the reference README's experiment
    # (10M rows (a int, b int, c double), grouped p95; PG: 2873.116 ms
    # single backend / 893.538 ms at 4 workers — README.md:138-154)
    readme = {}
    try:
        import subprocess

        here = os.path.dirname(os.path.abspath(__file__))
        for cores in (1, 4):
            out = subprocess.run(
                [sys.executable, os.path.join(here, "scripts", "readme_bench.py"),
                 "--cores", str(cores)],
                capture_output=True, text=True, timeout=900, check=True,
            )
            readme[f"local{cores}_ms"] = json.loads(
                out.stdout.strip().splitlines()[-1]
            )["ms"]
        readme["pg_1worker_ms"] = 2873.116
        readme["pg_4worker_ms"] = 893.538
        readme["vs_pg_1w"] = round(readme["local1_ms"] / 2873.116, 3)
        readme["vs_pg_4w"] = round(readme["local4_ms"] / 893.538, 3)
    except Exception as exc:  # noqa: BLE001 — bench must still emit its line
        readme = {"error": str(exc)[:200]}

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    result = {
        "metric": "tdigest_suite_total_time",
        "value": round(total_time, 4),
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "cpus": CPUS,
        "rows_per_sec": int(total_rows / total_time) if total_time > 0 else None,
        "p95_rel_rank_error": round(max_rank_err, 6),
        "flagship_docs_per_sec": int(n_rows / build_sec) if build_sec else None,
        "readme_10m_grouped_p95": readme,
        "scaling_efficiency_note": "see BENCH.md scaling table",
    }
    print(json.dumps(result))


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    main()
