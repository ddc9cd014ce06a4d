"""Micro-floors: where does the ~350ms empty-job overhead come from?"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def t(fn, reps=5):
    best = None
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return round(best, 4)


def main():
    from pyspark.sql import functions as F
    from pyspark.sql.types import StructType, StructField, LongType

    from tdigest_spark.spark.session import get_spark, warm_workers

    spark = get_spark("prof-floor", cores=CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    warm_workers(spark)
    sc = spark.sparkContext

    out = {}

    def jvm_job():
        spark.range(0, CPUS, 1, CPUS).selectExpr("sum(id)").collect()

    jvm_job()
    out["jvm_32task_job"] = t(jvm_job)

    for n in (1, 4, 32, 64):
        def rdd_job(n=n):
            sc.parallelize(range(n), n).map(lambda x: x).collect()
        rdd_job()
        out[f"pyrdd_{n}task_job"] = t(rdd_job)

    # mapInArrow DataFrame job with n partitions
    schema = StructType([StructField("x", LongType(), True)])

    def mia(it):
        for b in it:
            yield b

    for n in (1, 32):
        df = spark.range(0, n, 1, n).select(F.col("id").alias("x"))
        dfm = df.mapInArrow(mia, schema)

        def mia_job(dfm=dfm):
            dfm.write.format("noop").mode("overwrite").save()
        mia_job()
        out[f"mapinarrow_{n}task_noop"] = t(mia_job)

    # shuffle round trip: range -> repartition(key) -> mapInArrow
    df = spark.range(0, 32, 1, 32).select(F.col("id").alias("x"))
    dfr = df.repartition("x").mapInArrow(mia, schema)

    def shuffle_job():
        dfr.write.format("noop").mode("overwrite").save()
    shuffle_job()
    out["shuffle_mapinarrow_noop"] = t(shuffle_job)

    # createDataFrame from python-RDD (the partial-phase shape), + shuffle
    rdd = sc.parallelize([(i,) for i in range(32)], 32)
    dfp = spark.createDataFrame(rdd, schema, verifySchema=False)
    chain = dfp.repartition("x").mapInArrow(mia, schema)

    def rdd_df_chain():
        chain.write.format("noop").mode("overwrite").save()
    rdd_df_chain()
    out["pyrdd_to_df_shuffle_mapinarrow"] = t(rdd_df_chain)

    # AQE off comparison for the same chain
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    rdd_df_chain()
    out["pyrdd_to_df_shuffle_mapinarrow_noAQE"] = t(rdd_df_chain)
    out["shuffle_mapinarrow_noop_noAQE"] = t(shuffle_job)
    spark.conf.set("spark.sql.adaptive.enabled", "true")

    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
