"""Operator-family timing sweep for the optimization round's checklist.

Times representative dedup/text/url/similarity operators at
$SPARK_GRAFT_SF_DIR with the noop sink (guide §1.4).  Run ALONE.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def t(spark, name, df, reps=3):
    spark.sparkContext.setJobDescription(name)
    best = None
    for _ in range(reps):
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    spark.sparkContext.setJobDescription(None)
    return round(best, 3)


def main():
    from pyspark.sql import functions as F

    from tdigest_spark import dedup, text, urls
    from tdigest_spark.spark.session import get_spark, warm_workers

    spark = get_spark("prof-operators", cores=CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    warm_workers(spark)

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id", "text")
    out = {}

    # warm the docs scan once
    docs.write.format("noop").mode("overwrite").save()

    out["exact_dedup"] = t(spark, "exact_dedup", dedup.exact_dedup(docs, "doc_id", "text"))
    sigs = dedup.minhash_signatures(docs, "doc_id", "text", num_hashes=64)
    out["minhash_signatures"] = t(spark, "minhash_sigs", sigs)
    out["simhash_fingerprints"] = t(
        spark, "simhash", dedup.simhash_fingerprints(docs, "doc_id", "text")
    )
    out["dup_ngram_mass"] = t(
        spark, "dup_ngram_mass", dedup.duplicate_ngram_mass(docs, "text", n=5)
    )
    out["token_quality"] = t(
        spark,
        "token_quality",
        docs.select(
            "doc_id",
            text.token_count(F.col("text")).alias("tc"),
            text.quality_metrics(F.col("text")).alias("q"),
        ),
    )
    out["lang_id"] = t(spark, "lang_id", text.lang_id(docs, "doc_id", "text"))
    out["strip_boilerplate"] = t(
        spark, "boilerplate", text.strip_boilerplate(docs, "doc_id", "text")
    )
    u = docs.select(
        "doc_id",
        F.concat(
            F.lit("https://Example.COM:443/a/b/../c?z=1&a=2#frag"),
            F.col("doc_id").cast("string"),
        ).alias("url"),
    )
    out["url_dedup"] = t(spark, "url_dedup", urls.url_dedup(u, "url", "doc_id"))

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    from tdigest_spark import similarity as sim

    cols = emb.columns
    out["_emb_cols"] = cols[:4]
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
