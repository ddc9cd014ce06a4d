"""Micro-bench: vectorized SimHash / MinHash vs the round-2 per-doc
Python baselines (kept inline here for comparison only).

Measures fingerprint / signature throughput over the sf documents
table; prints one JSON line.  Run:

    python scripts/bench_dedup_vec.py [sf_dir] [cpus]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, LongType

from tdigest_spark.dedup import (
    _MERSENNE,
    _perm_coeffs,
    _shingle_hashes,
    minhash_signatures,
    simhash64,
    simhash_fingerprints,
)
from tdigest_spark.spark.session import get_spark, warm_workers


def _hash_token_blake2b(tok: str) -> int:
    import hashlib

    return int.from_bytes(
        hashlib.blake2b(tok.encode("utf-8"), digest_size=8).digest(), "little"
    )


def simhash64_r2(text):
    """Round-2 baseline: per-token Python blake2b with a batch cache."""

    @pandas_udf(LongType())
    def f(s: pd.Series) -> pd.Series:
        cache: dict = {}
        bitcols = np.arange(64, dtype=np.uint64)
        weights = np.uint64(1) << bitcols
        out = []
        for t in s:
            if t is None:
                out.append(None)
                continue
            toks = t.lower().split()
            if not toks:
                out.append(0)
                continue
            hs = np.empty(len(toks), dtype=np.uint64)
            for i, tok in enumerate(toks):
                v = cache.get(tok)
                if v is None:
                    v = cache[tok] = _hash_token_blake2b(tok)
                hs[i] = v
            bits = (hs[:, None] >> bitcols[None, :]) & np.uint64(1)
            votes = bits.sum(axis=0) * 2 > len(toks)
            val = int(weights[votes].sum(dtype=np.uint64))
            out.append(val - (1 << 64) if val >= (1 << 63) else val)
        return pd.Series(out, dtype="object")

    return f(text)


def minhash_signatures_r2(df, id_col, text_col, num_hashes=128, shingle_k=5):
    """Round-2 COST-MODEL baseline: per-doc permutation matrix in a
    Python loop with the mod-Mersenne fold (multiply + add + modulo +
    min per element, the arithmetic shape r2 shipped).  NOTE: the
    coefficients come from the current full-range-uint64 family, so the
    hash VALUES are not the r2 family's (products wrap mod 2^64 before
    the Mersenne reduction) — this baseline exists to time the fold,
    not to reproduce r2 signatures, and the published speedups compare
    wall time only."""
    a, b = _perm_coeffs(num_hashes)

    @pandas_udf(ArrayType(LongType()))
    def sig(s: pd.Series) -> pd.Series:
        out = []
        for t in s:
            if t is None:
                out.append(None)
                continue
            sh = _shingle_hashes(t, shingle_k) % _MERSENNE
            with np.errstate(over="ignore"):
                m = ((sh[:, None] * a[None, :] + b[None, :]) % _MERSENNE).min(axis=0)
            out.append(m.view(np.int64).tolist())
        return pd.Series(out)

    return df.select(F.col(id_col), sig(F.col(text_col)).alias("minhash"))


def synth_docs(spark, n_docs=100_000, tokens_per_doc=150, vocab=500_000, parts=16):
    """Deterministic web-like corpus: large vocabulary with a skewed
    (power-law-ish) frequency profile, generated executor-side from
    splitmix64 streams.  The sf documents fixture shares a ~31-word
    vocabulary, which makes any per-token cache unrealistically
    perfect; web text is heavy-tailed with a huge tail."""
    from pyspark.sql.types import LongType as LT
    from pyspark.sql.types import StringType, StructField, StructType

    from tdigest_spark.kernel.hashing import splitmix64

    schema = StructType(
        [StructField("doc_id", LT()), StructField("text", StringType())]
    )

    def gen(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy(dtype=np.int64)
            texts = []
            for i in ids:
                seeds = splitmix64(
                    np.arange(tokens_per_doc, dtype=np.uint64)
                    + np.uint64(int(i) * 1_000_003)
                )
                frac = (seeds >> np.uint64(11)).astype(np.float64) / float(1 << 53)
                wids = (frac**2 * vocab).astype(np.int64)  # skewed to low ids
                texts.append(" ".join(f"w{w}" for w in wids))
            yield pd.DataFrame({"doc_id": ids, "text": texts})

    return (
        spark.range(0, n_docs, 1, parts)
        .mapInPandas(gen, schema)
        .cache()
    )


def timed(fn, reps=3):
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else int(
        os.environ.get("SPARK_GRAFT_CPUS", "8")
    )
    spark = get_spark("bench-dedup-vec", cores=cpus, shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    warm_workers(spark)

    def measure(docs):
        n = docs.count()
        r = {"n_docs": n}
        t = timed(
            lambda: docs.select(simhash64(F.col("text")).alias("sh")).agg(
                F.sum(F.pmod("sh", F.lit(997)))
            ).collect()
        )
        r["simhash_docs_per_sec"] = round(n / t)
        t = timed(
            lambda: simhash_fingerprints(docs, "doc_id", "text").agg(
                F.sum(F.pmod("simhash", F.lit(997)))
            ).collect()
        )
        r["simhash_bulk_docs_per_sec"] = round(n / t)
        t_old = timed(
            lambda: docs.select(simhash64_r2(F.col("text")).alias("sh")).agg(
                F.sum(F.pmod("sh", F.lit(997)))
            ).collect()
        )
        r["simhash_r2_docs_per_sec"] = round(n / t_old)
        r["simhash_speedup"] = round(
            r["simhash_docs_per_sec"] / r["simhash_r2_docs_per_sec"], 2
        )
        r["simhash_bulk_speedup"] = round(
            r["simhash_bulk_docs_per_sec"] / r["simhash_r2_docs_per_sec"], 2
        )
        t = timed(
            lambda: minhash_signatures(docs, "doc_id", "text").agg(
                F.sum(F.pmod(F.element_at("minhash", 1), F.lit(997)))
            ).collect()
        )
        r["minhash_docs_per_sec"] = round(n / t)
        t_old = timed(
            lambda: minhash_signatures_r2(docs, "doc_id", "text").agg(
                F.sum(F.pmod(F.element_at("minhash", 1), F.lit(997)))
            ).collect()
        )
        r["minhash_r2_docs_per_sec"] = round(n / t_old)
        r["minhash_speedup"] = round(t_old / t, 2)
        return r

    fixture = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    ).cache()
    web = synth_docs(spark, parts=cpus * 2)
    print(
        json.dumps(
            {
                "metric": "dedup_vectorization_microbench",
                "cpus": cpus,
                "web_like_500k_vocab": measure(web),
                "sf_documents_31_word_vocab": measure(fixture),
            }
        )
    )


if __name__ == "__main__":
    main()
