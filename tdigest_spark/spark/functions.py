"""Scalar functions over serialized t-digest columns (SURVEY.md §2.1.3).

Arrow-batched pandas UDFs — vectorized across rows, the centroid-array
loop lives inside the NumPy kernel.  These mirror the reference's
non-aggregate SQL functions:

    tdigest_count        — tdigest.c:2941-2947
    tdigest_add          — tdigest_add_double_increment, tdigest.c:2422-2533
    tdigest_union        — tdigest_union_double_increment, tdigest.c:2543-2576
    tdigest_json         — tdigest_to_json, tdigest.c:2964-3021
    tdigest_double_array — tdigest_to_array, tdigest.c:3039-3081
    tdigest_digest_sum   — tdigest.c:3433-3452
    tdigest_digest_avg   — tdigest.c:3457-3476
    tdigest_to_string / tdigest_parse — tdigest_out/tdigest_in text I/O
    tdigest_quantile / tdigest_quantile_of — single-digest estimators
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    LongType,
    StringType,
)

from tdigest_spark.kernel.tdigest import TDigest


def _load(blob) -> TDigest | None:
    return None if blob is None else TDigest.from_bytes(bytes(blob))


def tdigest_count(digest: Column) -> Column:
    @pandas_udf(LongType())
    def f(s: pd.Series) -> pd.Series:
        return s.map(lambda b: None if b is None else _load(b).count)

    return f(digest)


def tdigest_quantile(digest: Column, q: float) -> Column:
    qv = float(q)

    @pandas_udf(DoubleType())
    def f(s: pd.Series) -> pd.Series:
        return s.map(lambda b: None if b is None else _load(b).quantile(qv))

    return f(digest)


def sql_null(v) -> bool:
    """SQL NULL as a pandas UDF sees it: None, or NaN — Arrow coerces a
    nullable numeric column to float64, delivering NULLs as NaN, so a
    bare ``is None`` check never fires for scalar numeric args.  (The
    flip side: a genuine NaN literal is indistinguishable from NULL
    here and is treated as NULL; the reference C rejects NaN inputs
    outright, so no valid reference workload observes the difference.)"""
    return v is None or (isinstance(v, float) and v != v)


def tdigest_quantile_of(digest: Column, value: float) -> Column:
    vv = float(value)

    @pandas_udf(DoubleType())
    def f(s: pd.Series) -> pd.Series:
        return s.map(lambda b: None if b is None else _load(b).quantile_of(vv))

    return f(digest)


def tdigest_add(
    digest: Column, value: Column, compression: int | None = None, compact: bool = True
) -> Column:
    """Incremental update: add value(s) to a stored digest.  A NULL
    digest with ``compression`` given creates a new digest
    (tdigest.c:2422-2467).  ``value`` may be a double column or an
    array<double> column (the batch variant, tdigest.c:2480-2533)."""

    @pandas_udf(BinaryType())
    def f(ds: pd.Series, vs: pd.Series) -> pd.Series:
        out = []
        for blob, v in zip(ds, vs):
            if sql_null(v):
                out.append(None if blob is None else bytes(blob))
                continue
            d = _load(blob)
            if d is None:
                if compression is None:
                    raise ValueError(
                        "NULL digest requires an explicit compression to create one"
                    )
                d = TDigest(compression)
            vals = v if hasattr(v, "__len__") else [v]
            d.add_values(vals, compact_threshold=None if compact else 1 << 62)
            out.append(d.to_bytes(compact=compact))
        return pd.Series(out)

    return f(digest, value)


def tdigest_union(d1: Column, d2: Column, compact: bool = True) -> Column:
    """Merge two digests; NULL-tolerant (returns the other side);
    tdigest_union(NULL, d) forces a compaction per the reference
    README's documented idiom (README.md:238-248).  This diverges
    byte-wise from the reference C code's NULL fast path, which returns
    the non-NULL digest unchanged without compacting
    (tdigest.c:2543-2576); the README behavior is authoritative here."""

    @pandas_udf(BinaryType())
    def f(s1: pd.Series, s2: pd.Series) -> pd.Series:
        return pd.Series([union_pair_bytes(b1, b2, compact) for b1, b2 in zip(s1, s2)])

    return f(d1, d2)


def union_pair_bytes(b1, b2, compact: bool = True) -> bytes | None:
    """Row-level union of two serialized digests — the ONE code path
    behind both tdigest_union (DataFrame) and the SQL-registered
    tdigest_union, so the two surfaces can never drift byte-wise."""
    a, b = _load(b1), _load(b2)
    if a is None and b is None:
        return None
    if a is None:
        a, b = b, None
    if b is not None:
        a.add_centroids(*b.centroid_arrays(), compact_threshold=1 << 62)
    if compact:
        # the reference re-compacts the whole merged state, and
        # union(NULL, d) is its documented force-compaction idiom
        a.recompact()
    return a.to_bytes(compact=compact)


def tdigest_json(digest: Column) -> Column:
    @pandas_udf(StringType())
    def f(s: pd.Series) -> pd.Series:
        return s.map(lambda b: None if b is None else _load(b).to_json())

    return f(digest)


def tdigest_double_array(digest: Column) -> Column:
    @pandas_udf(ArrayType(DoubleType()))
    def f(s: pd.Series) -> pd.Series:
        return s.map(
            lambda b: None if b is None else _load(b).to_double_array().tolist()
        )

    return f(digest)


def tdigest_digest_sum(digest: Column, low: float = 0.0, high: float = 1.0) -> Column:
    lo, hi = float(low), float(high)

    @pandas_udf(DoubleType())
    def f(s: pd.Series) -> pd.Series:
        return s.map(lambda b: None if b is None else _load(b).trimmed_sum(lo, hi))

    return f(digest)


def tdigest_digest_avg(digest: Column, low: float = 0.0, high: float = 1.0) -> Column:
    lo, hi = float(low), float(high)

    @pandas_udf(DoubleType())
    def f(s: pd.Series) -> pd.Series:
        return s.map(lambda b: None if b is None else _load(b).trimmed_avg(lo, hi))

    return f(digest)


def tdigest_histogram(digest: Column, k: int) -> Column:
    """Equi-depth histogram boundaries derived from a digest: k+1
    monotone values at quantiles i/k (bucket i holds ~1/k of the
    mass).  The digest-native replacement for a full-data sort when
    binning features at scale."""
    kk = int(k)
    qs = [i / kk for i in range(kk + 1)]

    @pandas_udf(ArrayType(DoubleType()))
    def f(s: pd.Series) -> pd.Series:
        return s.map(
            lambda b: None if b is None else _load(b).quantiles(qs).tolist()
        )

    return f(digest)


def tdigest_to_string(digest: Column) -> Column:
    @pandas_udf(StringType())
    def f(s: pd.Series) -> pd.Series:
        return s.map(lambda b: None if b is None else _load(b).to_string())

    return f(digest)


def tdigest_parse(text: Column) -> Column:
    @pandas_udf(BinaryType())
    def f(s: pd.Series) -> pd.Series:
        return s.map(lambda t: None if t is None else TDigest.from_string(t).to_bytes())

    return f(text)
