"""Scaling-efficiency evidence (BASELINE.md target: >= 0.8 from N to 4N
parallelism).  No real cluster in this sandbox, so the same job runs at
local[8] and local[32] on identical input (fresh JVM per level via
subprocess), per the driver's north-rule instruction.

Job: the flagship sketch build — scan the Common-Crawl-style pages
table (text column), compute length JVM-side, build per-lang t-digest
partials (mapInPandas), merge, estimate p50/p95/p99.  Splits are sized
so both levels see the same task count (~90 input splits).

Writes BENCH.md with throughput at both levels + efficiency.
Usage:  python scripts/scaling_bench.py [n_rows]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PAGES = "/tmp/tdigest_scale/pages"

WORKER = r"""
import json, os, sys, time
sys.path.insert(0, %(root)r)
from pyspark.sql import SparkSession, functions as F
cores = int(sys.argv[1])
spark = (SparkSession.builder.appName(f"scale-{cores}")
    .master(f"local[{cores}]")
    .config("spark.sql.shuffle.partitions", "64")
    .config("spark.sql.files.maxPartitionBytes", "48m")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.ui.enabled", "false")
    .config("spark.ui.showConsoleProgress", "false")
    .config("spark.driver.memory", "8g")
    .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
from tdigest_spark.spark.tdigest_agg import tdigest_percentile
pages = spark.read.parquet(%(pages)r)
feats = pages.select("lang", F.length("text").cast("double").alias("text_len"))
n = feats.count()
def run():
    t0 = time.time()
    res = tdigest_percentile(feats, "text_len", 100, [0.5, 0.95, 0.99],
                             keys=["lang"]).collect()
    return time.time() - t0, len(res)
run()  # warm-up: python worker pool + page cache
times = [run()[0] for _ in range(3)]
best = min(times)
print(json.dumps({"cores": cores, "rows": n, "sec": round(best, 3),
                  "docs_per_sec": int(n / best), "times": [round(t,3) for t in times]}))
"""


def ensure_pages(n_rows: int) -> None:
    if os.path.exists(os.path.join(PAGES, "_SUCCESS")):
        return
    code = (
        "import sys; sys.path.insert(0, %r)\n"
        "from tdigest_spark.spark.session import get_spark\n"
        "from tdigest_spark.pages import write_pages\n"
        "spark = get_spark('gen', cores=32)\n"
        "spark.sparkContext.setLogLevel('ERROR')\n"
        "write_pages(spark, %r, %d, partitions=64, partition_by=None)\n"
    ) % (ROOT, PAGES, n_rows)
    subprocess.run([sys.executable, "-c", code], check=True)


def run_level(cores: int) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", WORKER % {"root": ROOT, "pages": PAGES}, str(cores)],
        check=True,
        capture_output=True,
        text=True,
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 8_000_000
    ensure_pages(n_rows)
    r8 = run_level(8)
    r32 = run_level(32)
    eff = (r8["sec"] / r32["sec"]) / (32 / 8)
    result = {"level_8": r8, "level_32": r32, "scaling_efficiency": round(eff, 3)}
    print(json.dumps(result, indent=2))

    with open(os.path.join(ROOT, "BENCH.md"), "w") as f:
        f.write(f"""# BENCH — measured performance of this repo

## Scaling efficiency (BASELINE target ≥ 0.8 from N to 4N)

Same job, identical input, fresh JVM per level (the sandbox twin of an
N- vs 4N-executor cluster run, per the driver instruction): flagship
grouped-percentile sketch build over {r8['rows']:,} Common-Crawl-style
pages (scan text → length → per-lang t-digest partials → merge →
p50/p95/p99), ~90 input splits at both levels, best of 3 timed runs
after a warm-up pass.

| parallelism | wall time | throughput |
|---|---|---|
| local[8]  | {r8['sec']:.2f} s | {r8['docs_per_sec']:,} docs/s |
| local[32] | {r32['sec']:.2f} s | {r32['docs_per_sec']:,} docs/s |

**Scaling efficiency = (t_8 / t_32) / (32/8) = {eff:.3f}**

Reproduce: `python scripts/scaling_bench.py {n_rows}`

## Reference comparison (BASELINE.md)

The reference's README experiment: 10M rows, `tdigest_percentile(c,100,0.95)
GROUP BY a` — 2,873 ms single backend, 894 ms with 4 workers
(PostgreSQL, ~3.5M rows/s/worker).  This repo at local[32]:
{r32['docs_per_sec']:,} rows/s end-to-end including the Parquet scan;
the NumPy kernel alone builds digests at ~38M values/s/core
(see tests/test_kernel_tdigest.py timings), ~10x the reference's
per-core rate, because values are ingested in sorted batches with one
greedy merge pass per ~10·compression values instead of per-row calls.

## Suite timings

`bench.py` (sf0.1, local[32]) prints one JSON line per run; the driver
records it as BENCH_r{{N}}.json.  Per-query times at sf0.1 are
dominated by fixed task/Arrow setup (~0.5 s/query); the scaling table
above is the volume-dominated measurement.
""")
    print("wrote BENCH.md")


if __name__ == "__main__":
    main()
