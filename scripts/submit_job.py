"""spark-submit entrypoint: the flagship web-scale sketch job.

Usage (local sandbox):
    spark-submit --driver-memory 8g --py-files tdigest_spark.zip \
        scripts/submit_job.py --generate 2000000 \
        --workdir /tmp/tdigest_job --salt 8

(--driver-memory matters: under spark-submit the JVM is already up
before Python runs, so the in-code spark.driver.memory default cannot
apply; local-mode executors share the driver heap.)

On a cluster the same invocation works with --master yarn/k8s; the
package zip ships via --py-files (no cluster-side install).  Build the
zip with: python scripts/make_pyfiles.py

Pipeline:
    1. materialize (or read) the Common-Crawl-style pages table,
       partitioned by lang
    2. stage 1: per-split partial digests of length(text) per lang,
       checkpointed with lineage (resumable — rerun skips the scan)
    3. stage 2: salted merge + p50/p95/p99 per lang
    4. print lineage summary + results as JSON lines
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", help="existing pages parquet dir")
    ap.add_argument("--generate", type=int, default=0, help="generate N pages")
    ap.add_argument("--workdir", default="/tmp/tdigest_job")
    ap.add_argument("--compression", type=int, default=100)
    ap.add_argument("--salt", type=int, default=8)
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from tdigest_spark.checkpoint import (
        build_partial_digests,
        finalize_percentile,
        lineage_summary,
        verify_lineage,
    )
    from tdigest_spark.pages import write_pages
    from tdigest_spark.spark.session import get_spark

    spark = get_spark("tdigest-submit-job", cores=args.cpus)
    spark.sparkContext.setLogLevel("ERROR")

    pages_path = args.input or os.path.join(args.workdir, "pages")
    if not args.input:
        if not os.path.exists(os.path.join(pages_path, "_SUCCESS")):
            n = args.generate or 1_000_000
            write_pages(spark, pages_path, n, partitions=args.cpus * 2)

    pages = spark.read.parquet(pages_path)
    feats = pages.select("lang", F.length("text").cast("double").alias("text_len"))

    ckpt = os.path.join(args.workdir, f"partials_c{args.compression}")
    t0 = time.time()
    partials = build_partial_digests(
        feats, ["lang"], "text_len", args.compression, ckpt
    )
    t_build = time.time() - t0

    t0 = time.time()
    result = finalize_percentile(
        partials, ["lang"], [0.5, 0.95, 0.99], salt=args.salt
    ).collect()
    t_merge = time.time() - t0

    n_rows = pages.count()
    lineage = verify_lineage(partials, expected_rows=n_rows)
    print(json.dumps({"lineage": lineage, "build_sec": round(t_build, 2),
                      "merge_sec": round(t_merge, 2),
                      "docs_per_sec": int(n_rows / t_build) if t_build else None}))
    for row in sorted(result, key=lambda r: r["lang"]):
        print(json.dumps({"lang": row["lang"], "percentiles": row["percentile"]}))
    for row in lineage_summary(partials).orderBy("split_id").collect()[:5]:
        print(json.dumps({"split": row.asDict()}))


if __name__ == "__main__":
    main()
