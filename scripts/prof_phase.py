"""Phase-level profiling of the bench queries (guide §1: measure first).

Times, for each headline query at $SPARK_GRAFT_SF_DIR:
  - floor:    an empty 32-task job (scheduler + python-worker round trip)
  - catalyst: the equivalent plain Catalyst aggregate (avg) on same input
  - plan:     _native_parquet_splits driver-side planning time
  - partial:  materializing the partial-phase DataFrame via noop sink
  - full:     the full query via .collect()

Run ALONE.  Prints one JSON line per measurement.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def t(fn, reps=3):
    best = None
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return round(best, 4)


def main():
    from pyspark.sql import functions as F

    from tdigest_spark.spark.session import get_spark, warm_workers
    from tdigest_spark.spark import arrow_agg
    from tdigest_spark.spark.tdigest_agg import (
        tdigest, tdigest_percentile, tdigest_avg, tdigest_percentile_of,
        tdigest_union_agg, tdigest_percentile_digests,
    )

    spark = get_spark("prof-phase", cores=CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    warm_workers(spark)
    sc = spark.sparkContext

    out = {}

    # --- floors ---------------------------------------------------------
    def empty_job():
        sc.parallelize(range(CPUS), CPUS).map(lambda x: x).collect()

    empty_job()
    out["floor_32task_rdd_job"] = t(empty_job)

    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").select(
        "l_returnflag", "l_linestatus", "l_extendedprice", "l_quantity"
    )

    def catalyst_agg():
        li.groupBy("l_returnflag").agg(F.avg("l_extendedprice")).collect()

    catalyst_agg()
    out["catalyst_groupby_avg"] = t(catalyst_agg)

    def catalyst_appx():
        li.groupBy("l_returnflag").agg(
            F.percentile_approx("l_extendedprice", 0.95, 10000)
        ).collect()

    catalyst_appx()
    out["catalyst_percentile_approx"] = t(catalyst_appx)

    # --- native split planning -----------------------------------------
    dfp = li.select("l_returnflag", "l_extendedprice")

    def plan():
        arrow_agg._native_parquet_splits(dfp, ["l_returnflag", "l_extendedprice"])

    plan()
    out["native_split_planning"] = t(plan)
    res = arrow_agg._native_parquet_splits(dfp, ["l_returnflag", "l_extendedprice"])
    out["n_splits"] = len(res[0]) if res else None

    # --- partial phase only (noop) -------------------------------------
    from tdigest_spark.kernel.tdigest import TDigest
    from tdigest_spark.spark.tdigest_agg import _fold_values, _serialize_td
    from pyspark.sql.types import BinaryType, StructField, StructType

    splits, col_map, predicate, pred_part, pred_data = res
    pschema = StructType(
        [dfp.schema["l_returnflag"]] + [StructField("__sketch__", BinaryType(), True)]
    )

    def partial_noop():
        p = arrow_agg._native_partials(
            spark, splits, col_map, ["l_returnflag"], ["l_extendedprice"],
            True, lambda: TDigest(100), _fold_values("l_extendedprice"),
            _serialize_td, pschema,
            predicate=predicate, pred_part=pred_part, pred_data=pred_data,
        )
        p.write.format("noop").mode("overwrite").save()

    partial_noop()
    out["partial_noop"] = t(partial_noop)

    # raw scan+fold cost without Spark: single process, all splits
    def local_scan():
        from tdigest_spark.spark.arrow_agg import (
            fold_group_batches, iter_bundle_batches, native_scan_ops,
        )
        needed = ["l_returnflag", "l_extendedprice"]
        ops, sources = native_scan_ops(col_map, needed, pred_data)
        states = {}
        for bundle in splits:
            fold_group_batches(
                iter_bundle_batches(bundle, needed, ops, sources, predicate,
                                    pred_part, pred_data),
                ["l_returnflag"], ["l_extendedprice"],
                lambda: TDigest(100), _fold_values("l_extendedprice"),
                states=states,
            )
        return states

    local_scan()
    out["local_singleproc_scan_fold"] = t(local_scan, reps=2)

    # --- full queries ---------------------------------------------------
    def q_build():
        tdigest_percentile(li, "l_extendedprice", 100, 0.95,
                           keys=["l_returnflag"]).collect()

    q_build()
    out["full_build_p95_grouped"] = t(q_build)

    qs = [i / 100 for i in range(1, 100)]

    def q_vec():
        tdigest_percentile(li, "l_extendedprice", 100, qs).collect()

    q_vec()
    out["full_percentile_vector_global"] = t(q_vec)

    def q_preagg():
        dig = tdigest(li, "l_extendedprice", 100,
                      keys=["l_returnflag", "l_linestatus"])
        rolled = tdigest_union_agg(dig, "tdigest", keys=["l_returnflag"])
        tdigest_percentile_digests(rolled, "tdigest", 0.9,
                                   keys=["l_returnflag"]).collect()

    q_preagg()
    out["full_preagg_then_rollup"] = t(q_preagg)

    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
