"""Deduplication operators for web-scale training-data pipelines.

Five families, each designed around Spark's shuffle model:

* exact         — hash-groupBy on a JVM md5 of normalized text; shuffle
                  carries (hash, id) only, never the text
* MinHash + LSH — per-doc signatures (Arrow-batched NumPy), banded into
                  (band, band_hash) keys; candidate generation is a
                  groupBy on band buckets, so cost scales with bucket
                  sizes, not n²
* SimHash       — 64-bit token-vote fingerprint; Hamming-ball candidate
                  lookup via 8×8-bit chunk banding (pigeonhole: any pair
                  with Hamming distance ≤ 7 shares a chunk)
* n-gram Jaccard— exact verifier for candidate pairs
* embedding     — cosine near-dup via normalized dot products; exact
                  block-matmul for verification, random-hyperplane LSH
                  as the 100 TB path (see similarity.py)
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, DoubleType, LongType

from tdigest_spark.kernel.hashing import splitmix64

# ----------------------------------------------------------------------
# exact dedup
# ----------------------------------------------------------------------
def _norm_text(text: Column) -> Column:
    return F.lower(F.regexp_replace(F.trim(text), r"\s+", " "))


def exact_dup_pairs(
    df: DataFrame, id_col: str, text_col: str, normalize: bool = True
) -> DataFrame:
    """All (keep_id, dup_id) pairs of exact duplicates; keep_id is the
    smallest id of the content group.  Shuffles only (md5, id)."""
    t = _norm_text(F.col(text_col)) if normalize else F.col(text_col)
    hashed = df.select(F.md5(t).alias("__h__"), F.col(id_col))
    # min-per-hash + join back: both sides stream (map-side partial
    # agg, no per-group arrays), so a boilerplate text duplicated 10^8
    # times costs one counter on one reducer, not one 10^8-element
    # array (the collect_list formulation OOMs on such groups)
    keepers = hashed.groupBy("__h__").agg(F.min(id_col).alias("keep_id"))
    # null-safe equality: rows with NULL text hash to NULL and still
    # form one duplicate group (as the former groupBy semantics did)
    return (
        hashed.join(
            keepers.withColumnRenamed("__h__", "__hk__"),
            F.col("__h__").eqNullSafe(F.col("__hk__")),
        )
        .filter(F.col(id_col) != F.col("keep_id"))
        .select("keep_id", F.col(id_col).alias("dup_id"))
    )


def exact_dedup(
    df: DataFrame, id_col: str, text_col: str, normalize: bool = True
) -> DataFrame:
    """Keep one row (smallest id) per distinct content."""
    t = _norm_text(F.col(text_col)) if normalize else F.col(text_col)
    w = Window.partitionBy(F.md5(t)).orderBy(F.col(id_col))
    return df.withColumn("__rn__", F.row_number().over(w)).filter(
        F.col("__rn__") == 1
    ).drop("__rn__")


# ----------------------------------------------------------------------
# MinHash signatures + LSH banding
# ----------------------------------------------------------------------
_MERSENNE = np.uint64((1 << 61) - 1)


def _shingle_hashes(text: str, k: int) -> np.ndarray:
    data = np.frombuffer(text.lower().encode("utf-8"), dtype=np.uint8)
    n = data.size - k + 1
    if n <= 0:
        data = np.pad(data, (0, k - data.size), constant_values=32)
        n = 1
    with np.errstate(over="ignore"):
        powers = np.empty(k, dtype=np.uint64)
        powers[0] = np.uint64(1)
        for i in range(1, k):
            powers[i] = powers[i - 1] * np.uint64(1000003)
        win = np.lib.stride_tricks.sliding_window_view(data, k).astype(np.uint64)
        h = (win * powers[::-1]).sum(axis=1, dtype=np.uint64)
    return np.unique(splitmix64(h))


def _perm_coeffs(num_hashes: int) -> tuple[np.ndarray, np.ndarray]:
    seeds = np.arange(1, num_hashes + 1, dtype=np.uint64)
    a = splitmix64(seeds) % (_MERSENNE - np.uint64(1)) + np.uint64(1)
    b = splitmix64(seeds + np.uint64(10_000)) % _MERSENNE
    return a, b


def minhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 128,
    shingle_k: int = 5,
    result_col: str = "minhash",
) -> DataFrame:
    """(id, minhash signature array<long>) per document."""
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
                # (a*s + b) mod p for all perms; min over shingles
                m = ((sh[:, None] * a[None, :] + b[None, :]) % _MERSENNE).min(axis=0)
            out.append(m.view(np.int64).tolist())
        return pd.Series(out)

    return df.select(F.col(id_col), sig(F.col(text_col)).alias(result_col))


def lsh_candidate_pairs(
    sig_df: DataFrame,
    id_col: str,
    sig_col: str = "minhash",
    bands: int = 32,
    max_bucket: int | None = 10_000,
) -> DataFrame:
    """Banded LSH: split signatures into ``bands``, hash each band,
    group by (band_idx, band_hash), emit candidate pairs (id_a < id_b).
    Shuffle carries (band key, id); bucket sizes bound pair blowup.

    ``max_bucket`` drops degenerate buckets (e.g. a boilerplate band
    value shared by millions of pages would otherwise emit O(n²) pairs
    from one reducer).  Pairs inside a dropped bucket are still found
    through their other ``bands-1`` bands unless they collide on nothing
    else — the standard web-dedup guardrail.  Set None to disable."""
    n_hashes = len(sig_df.select(sig_col).first()[0])
    rows_per_band = n_hashes // bands
    banded = sig_df.select(
        F.col(id_col),
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda i: F.xxhash64(
                    F.slice(F.col(sig_col), i * rows_per_band + 1, rows_per_band)
                ),
            )
        ).alias("band_idx", "band_hash"),
    )
    buckets = (
        banded.groupBy("band_idx", "band_hash")
        .agg(F.sort_array(F.collect_list(id_col)).alias("ids"))
        .filter(F.size("ids") > 1)
    )
    if max_bucket is not None:
        buckets = buckets.filter(F.size("ids") <= max_bucket)
    pairs = buckets.select(
        F.explode(
            F.expr(
                "flatten(transform(ids, (x, i) ->"
                " transform(slice(ids, i + 2, size(ids)), y -> struct(x, y))))"
            )
        ).alias("p")
    )
    return pairs.select(
        F.col("p.x").alias("id_a"), F.col("p.y").alias("id_b")
    ).distinct()


def minhash_jaccard_estimate(sig_a: Column, sig_b: Column) -> Column:
    """Estimated Jaccard = fraction of equal signature slots (JVM)."""
    return F.aggregate(
        F.zip_with(sig_a, sig_b, lambda x, y: (x == y).cast("int")),
        F.lit(0),
        lambda acc, v: acc + v,
    ) / F.size(sig_a)


# ----------------------------------------------------------------------
# exact n-gram Jaccard (verifier)
# ----------------------------------------------------------------------
def ngram_jaccard(text_a: Column, text_b: Column, k: int = 5) -> Column:
    """Exact character-k-gram Jaccard similarity of two documents."""

    @pandas_udf(DoubleType())
    def f(sa: pd.Series, sb: pd.Series) -> pd.Series:
        out = []
        for ta, tb in zip(sa, sb):
            if ta is None or tb is None:
                out.append(None)
                continue
            ha = _shingle_hashes(ta, k)
            hb = _shingle_hashes(tb, k)
            inter = np.intersect1d(ha, hb, assume_unique=True).size
            union = ha.size + hb.size - inter
            out.append(inter / union if union else 1.0)
        return pd.Series(out)

    return f(text_a, text_b)


# ----------------------------------------------------------------------
# SimHash
# ----------------------------------------------------------------------
def hash_token(tok: str) -> int:
    """Deterministic 64-bit token hash (blake2b, C-speed)."""
    import hashlib

    return int.from_bytes(
        hashlib.blake2b(tok.encode("utf-8"), digest_size=8).digest(), "little"
    )


def simhash64(text: Column) -> Column:
    """64-bit SimHash over whitespace tokens: per-bit majority vote of
    token hashes.  Token hashes are cached per Arrow batch (web text
    has a heavy-tailed vocabulary, so the cache hit rate is high)."""

    @pandas_udf(LongType())
    def f(s: pd.Series) -> pd.Series:
        cache: dict[str, int] = {}
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
                    v = cache[tok] = hash_token(tok)
                hs[i] = v
            bits = (hs[:, None] >> bitcols[None, :]) & np.uint64(1)
            votes = bits.sum(axis=0) * 2 > len(toks)
            val = int(weights[votes].sum(dtype=np.uint64))
            out.append(val - (1 << 64) if val >= (1 << 63) else val)
        return pd.Series(out, dtype="object")

    return f(text)


def simhash_candidate_pairs(
    df: DataFrame, id_col: str, simhash_col: str, n_chunks: int = 8,
    max_bucket: int | None = 10_000,
) -> DataFrame:
    """Candidates for Hamming distance ≤ n_chunks-1 via chunk banding:
    any pair within that distance shares at least one identical chunk
    (pigeonhole)."""
    bits_per = 64 // n_chunks
    mask = (1 << bits_per) - 1
    chunks = df.select(
        F.col(id_col),
        F.col(simhash_col),
        F.posexplode(
            F.expr(
                f"transform(sequence(0, {n_chunks - 1}), i ->"
                f" shiftrightunsigned({simhash_col}, cast(i * {bits_per} as int))"
                f" & {mask}L)"
            )
        ).alias("chunk_idx", "chunk_val"),
    )
    buckets = (
        chunks.groupBy("chunk_idx", "chunk_val")
        .agg(F.sort_array(F.collect_list(F.struct(id_col, simhash_col))).alias("xs"))
        .filter(F.size("xs") > 1)
    )
    if max_bucket is not None:
        buckets = buckets.filter(F.size("xs") <= max_bucket)
    pairs = buckets.select(
        F.explode(
            F.expr(
                "flatten(transform(xs, (x, i) ->"
                " transform(slice(xs, i + 2, size(xs)), y -> struct(x, y))))"
            )
        ).alias("p")
    )
    return pairs.select(
        F.col(f"p.x.{id_col}").alias("id_a"),
        F.col(f"p.y.{id_col}").alias("id_b"),
        hamming64(F.col(f"p.x.{simhash_col}"), F.col(f"p.y.{simhash_col}")).alias(
            "hamming"
        ),
    ).distinct()


def dup_clusters(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iters: int = 20,
) -> DataFrame:
    """Connected components over duplicate pairs → (doc_id, cluster_id)
    with cluster_id = min id of the component (transitive dedup groups:
    A≈B, B≈C ⇒ {A,B,C} share one representative).

    Iterative min-label propagation: each round every node adopts the
    smallest label in its neighborhood; converges in O(component
    diameter) rounds (near-dup clusters are shallow, so a handful).
    Each round is one groupBy shuffle on node id — no driver-side graph.
    """
    edges = (
        pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
        .union(pairs.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst")))
        .distinct()
    )
    # labels: (node, label); localCheckpoint breaks lineage so the
    # round's joins against `edges` are never ambiguous self-joins
    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iters):
        neighbor_min = (
            edges.join(labels, edges["dst"] == labels["node"], "inner")
            .select(F.col("src").alias("nm_node"), F.col("label").alias("nm_label"))
            .groupBy("nm_node")
            .agg(F.min("nm_label").alias("nlabel"))
        )
        updated = (
            labels.join(neighbor_min, labels["node"] == neighbor_min["nm_node"], "left")
            .select(
                "node",
                F.col("label").alias("old_label"),
                F.least(
                    F.col("label"), F.coalesce(F.col("nlabel"), F.col("label"))
                ).alias("label"),
            )
            .localCheckpoint(eager=True)
        )
        changed = updated.filter(F.col("label") != F.col("old_label")).limit(1).count()
        labels = updated.drop("old_label")
        if changed == 0:
            break
    return labels.select(
        F.col("node").alias("doc_id"), F.col("label").alias("cluster_id")
    )


def hamming64(a, b) -> Column:
    """Hamming distance between two 64-bit fingerprints (JVM bit_count)."""
    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b
    return F.bit_count(ca.bitwiseXOR(cb))
