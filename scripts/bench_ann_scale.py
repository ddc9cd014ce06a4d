"""ANN volume evidence: stored bucketed IVF index at >= 1M vectors.

Usage:
    python scripts/bench_ann_scale.py [n_vecs] [cpus]   # default 1_000_000 32

Generates a deterministic synthetic embedding corpus (mixture of
``N_CENTERS`` unit-ball clusters + noise, so the IVF quantizer has real
structure to learn — pure-uniform vectors make every inverted list
equidistant and recall meaningless), builds the STORED bucketed IVF
index (``ivf_write_index``: one assignment pass, table bucketed by
``list_id``), then measures:

  * index build rate (vectors/sec, including centroid training)
  * bucket-pruned probe latency (100 queries, top-10, n_probe of
    n_lists) and that the probed scan actually prunes
    (``SelectedBucketsCount`` < total)
  * recall@10 vs the exact brute-force truth over the SAME corpus

Corpus + index cache under /tmp/tdigest_ann so re-runs measure the
probe path alone.  ONE JSON line on stdout; progress on stderr.
"""

from __future__ import annotations

import contextlib
import io
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from pyspark.sql import functions as F

CACHE = "/tmp/tdigest_ann"
DIM = 64
N_CENTERS = 256
N_QUERIES = 100
K = 10


def _counter_normals(counter: np.ndarray) -> np.ndarray:
    """Counter-based standard normals (SplitMix64 bit-mix -> uniforms ->
    Box-Muller): a pure function of the counter value, so generation is
    byte-deterministic regardless of partitioning AND Arrow batch
    boundaries (a sequential RNG stream seeded per batch is not — the
    noise then depends on where maxRecordsPerBatch slices the rows)."""

    def mix(x):
        x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return x ^ (x >> np.uint64(31))

    c = counter.astype(np.uint64)
    gamma = np.uint64(0x9E3779B97F4A7C15)
    with np.errstate(over="ignore"):
        a = mix((c * np.uint64(2) + np.uint64(1)) * gamma)
        b = mix((c * np.uint64(2) + np.uint64(2)) * gamma)
    u1 = (a >> np.uint64(11)).astype(np.float64) / float(1 << 53)
    u2 = (b >> np.uint64(11)).astype(np.float64) / float(1 << 53)
    u1 = np.maximum(u1, 1e-300)  # Box-Muller pole at u1=0
    return np.sqrt(-2.0 * np.log(u1)) * np.cos(2.0 * np.pi * u2)


def ensure_corpus(spark, n_vecs: int) -> str:
    path = f"{CACHE}/vecs_{n_vecs}_v2"
    if os.path.exists(os.path.join(path, "_SUCCESS")):
        return path
    import pandas as pd

    rng = np.random.RandomState(7)
    centers = rng.randn(N_CENTERS, DIM) * 3.0
    bc = spark.sparkContext.broadcast(centers)

    def gen(batches):
        C = bc.value
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            # per-row counter noise: vec i is a pure function of i
            counter = ids[:, None] * np.int64(DIM) + np.arange(DIM)
            vecs = C[ids % N_CENTERS] + _counter_normals(counter)
            yield pd.DataFrame(
                {"vec_id": ids, "embedding": list(vecs.astype(np.float64))}
            )

    df = spark.range(n_vecs, numPartitions=64).mapInPandas(
        gen, "vec_id long, embedding array<double>"
    )
    df.write.mode("overwrite").parquet(path)
    return path


def main() -> None:
    n_vecs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    n_lists = int(sys.argv[3]) if len(sys.argv) > 3 else 256
    trainer = sys.argv[4] if len(sys.argv) > 4 else "driver"

    from tdigest_spark.spark.session import get_spark, warm_workers
    from tdigest_spark.similarity import (
        cosine_topk,
        ivf_centroids,
        ivf_centroids_distributed,
        ivf_probe_lists,
        ivf_topk_bucketed,
        ivf_write_index,
    )

    spark = get_spark("ann-bench", cores=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    warm_workers(spark)
    out: dict = {
        "n_vecs": n_vecs, "dim": DIM, "cpus": cpus,
        "n_lists": n_lists, "trainer": trainer,
    }

    path = ensure_corpus(spark, n_vecs)
    emb = spark.read.parquet(path)
    print(json.dumps({"corpus": path}), file=sys.stderr, flush=True)

    qrows = emb.filter(F.col("vec_id") < N_QUERIES).collect()
    queries = [(r["vec_id"], list(r["embedding"])) for r in qrows]
    corpus = emb.filter(F.col("vec_id") >= N_QUERIES)

    # n_probe scales with n_lists to hold the scanned fraction at
    # 16/256 = 1/16 of the corpus, so recall is comparable across
    # n_lists settings
    n_probe = max(4, n_lists // 16)
    table = f"ann_bench_ivf_{n_vecs}_{n_lists}"

    # ---- index build (centroid training + assignment + bucketed write)
    t0 = time.time()
    if trainer == "distributed":
        # the path past the driver-sample cap: seeded init on a bounded
        # sample, Lloyd iterations as full distributed passes (mini-
        # batched at 30% per iteration to bound scan cost)
        cents = ivf_centroids_distributed(
            corpus, "embedding", n_lists=n_lists, order_col="vec_id",
            iters=6, sample_fraction=0.3,
        )
    else:
        cents = ivf_centroids(
            corpus, "embedding", n_lists=n_lists, sample_rows=20_000,
            order_col="vec_id",
        )
    t_train = time.time() - t0
    out["centroid_train_sec"] = round(t_train, 1)
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    ivf_write_index(
        corpus, "vec_id", "embedding", cents, table, n_buckets=n_lists
    )
    t_build = time.time() - t0
    out["index_build_sec"] = round(t_build, 1)
    out["index_build_vecs_per_sec"] = int(n_vecs / t_build)
    print(json.dumps({"build": out["index_build_sec"]}), file=sys.stderr, flush=True)

    # ---- plan check: the probe scan must bucket-prune
    probe_lists = ivf_probe_lists(queries, cents, n_probe)
    scan = spark.table(table).filter(F.col("list_id").isin(probe_lists))
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        scan.explain("formatted")
    m = re.search(r"SelectedBucketsCount: (\d+) out of (\d+)", buf.getvalue())
    out["buckets_selected"] = int(m.group(1)) if m else None
    out["buckets_total"] = int(m.group(2)) if m else None
    out["pruned"] = bool(m) and int(m.group(1)) < int(m.group(2))

    # ---- probe latency (median of 3 after warmup)
    def probe():
        t0 = time.time()
        rows = ivf_topk_bucketed(
            spark, table, "vec_id", "embedding", queries, cents,
            k=K, n_probe=n_probe,
        ).collect()
        return time.time() - t0, rows

    probe()
    times, rows = zip(*(probe() for _ in range(3)))
    t_probe = sorted(times)[1]
    out["probe_sec"] = round(t_probe, 2)
    out["probe_ms_per_query"] = round(1000 * t_probe / N_QUERIES, 1)
    ivf_set = {(r["query_id"], r["neighbor_id"]) for r in rows[-1]}

    # ---- small-batch probe: 100 queries at n_probe=16/256 union
    # ~every list (batched amortization is the compute win there); a
    # 5-query batch is where BUCKET PRUNING carries the latency —
    # typical online-serving shape
    small = queries[:5]
    one = queries[:1]
    small_lists = ivf_probe_lists(small, cents, n_probe)
    out["small_batch_lists"] = len(small_lists)

    def probe_small():
        t0 = time.time()
        ivf_topk_bucketed(
            spark, table, "vec_id", "embedding", small, cents,
            k=K, n_probe=n_probe,
        ).collect()
        return time.time() - t0

    probe_small()
    out["probe5_sec"] = round(sorted(probe_small() for _ in range(3))[1], 2)

    def probe_one():
        t0 = time.time()
        ivf_topk_bucketed(
            spark, table, "vec_id", "embedding", one, cents,
            k=K, n_probe=n_probe,
        ).collect()
        return time.time() - t0

    out["probe1_lists"] = n_probe
    probe_one()
    out["probe1_sec"] = round(sorted(probe_one() for _ in range(3))[1], 2)

    # ---- exact truth over the same corpus (also timed, same protocol
    # as the probe — warmup + median of 3: the brute-force baseline the
    # probe is supposed to beat)
    def run_exact(qs):
        t0 = time.time()
        rows = cosine_topk(corpus, "vec_id", "embedding", qs, k=K).collect()
        return time.time() - t0, rows

    run_exact(queries)
    ts, exact_rows = zip(*(run_exact(queries) for _ in range(3)))
    out["exact_sec"] = round(sorted(ts)[1], 2)
    out["exact5_sec"] = round(sorted(run_exact(small)[0] for _ in range(3))[1], 2)
    exact_set = {(r["query_id"], r["neighbor_id"]) for r in exact_rows[-1]}
    out["recall_at_10"] = round(len(exact_set & ivf_set) / len(exact_set), 4)
    out["speedup_vs_exact"] = round(out["exact_sec"] / t_probe, 1)
    out["speedup5_vs_exact"] = round(out["exact5_sec"] / out["probe5_sec"], 1)

    spark.sql(f"DROP TABLE IF EXISTS {table}")
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
