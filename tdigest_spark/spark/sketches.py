"""Companion sketch aggregates: HLL, count-min, KLL, Bloom.

Same two-phase skeleton as the t-digest aggregates (agg.py).  Row
hashing happens JVM-side with ``F.xxhash64`` inside whole-stage
codegen — Python only folds pre-hashed int64 columns into NumPy
register arrays, so there is no per-row Python anywhere.

NULL semantics follow SQL aggregates: NULL values are skipped (the
hash column is masked to NULL before the UDF and dropped inside).
"""

from __future__ import annotations

from collections.abc import Sequence

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import (
    BinaryType,
    BooleanType,
    DoubleType,
    LongType,
    StructField,
)

from tdigest_spark.kernel.bloom import Bloom, merge_all_bloom
from tdigest_spark.kernel.countmin import CountMin, merge_all_cm
from tdigest_spark.kernel.hll import HLL, merge_all_hll
from tdigest_spark.kernel.kll import KLL, merge_all_kll
from tdigest_spark.spark.arrow_agg import sketch_groupby_arrow

_HASH_COL = "__h64__"


def _with_hash(df: DataFrame, col: str, keep: Sequence[str] = ()) -> DataFrame:
    """JVM-side xxhash64, masked to NULL where the input is NULL so the
    sketch skips missing values (SQL aggregate semantics).  Projects to
    keep-cols + hash only, so the Arrow boundary never ships the raw
    value column (or anything wider the caller passed)."""
    hashed = df.withColumn(
        _HASH_COL, F.when(F.col(col).isNotNull(), F.xxhash64(F.col(col)))
    )
    return hashed.select(*dict.fromkeys([*keep, _HASH_COL]))


def _hash_np(col) -> np.ndarray:
    """pyarrow int64 (nullable) → exact int64 NumPy, nulls dropped.
    Never routes int64 through float64 (which would corrupt hashes
    above 2^53) and never through pandas (arrownp)."""
    from tdigest_spark.kernel.arrownp import arrow_ints

    return arrow_ints(col.drop_null())


# ----------------------------------------------------------------------
# HLL
# ----------------------------------------------------------------------
def _fold_hll(st, **cols):
    st.add_hashes(_hash_np(cols[_HASH_COL]))


def hll_sketch(
    df: DataFrame, col: str, keys: Sequence[str] = (), p: int = 14,
    result_col: str = "hll", salt: int | None = None,
) -> DataFrame:
    """Build a serialized HLL per group (mergeable, re-aggregatable)."""
    df = _with_hash(df, col, keep=keys)
    return sketch_groupby_arrow(
        df, keys, [_HASH_COL], lambda: HLL(p), _fold_hll,
        lambda s: s.to_bytes(),
        lambda blobs: (merge_all_hll(HLL.from_bytes(b) for b in blobs).to_bytes()
                       if blobs else None,),
        [StructField(result_col, BinaryType(), True)],
        salt=salt,
        merge_bytes=lambda blobs: merge_all_hll(
            HLL.from_bytes(b) for b in blobs
        ).to_bytes(),
    )


def hll_count_distinct(
    df: DataFrame, col: str, keys: Sequence[str] = (), p: int = 14,
    result_col: str = "approx_distinct", salt: int | None = None,
) -> DataFrame:
    """Approximate COUNT(DISTINCT col) per group; σ ≈ 1.04/√(2^p)."""
    df = _with_hash(df, col, keep=keys)

    def fin(blobs):
        m = merge_all_hll(HLL.from_bytes(b) for b in blobs) if blobs else None
        return (int(m.cardinality()) if m else 0,)

    return sketch_groupby_arrow(
        df, keys, [_HASH_COL], lambda: HLL(p), _fold_hll,
        lambda s: s.to_bytes(), fin,
        [StructField(result_col, LongType(), True)],
        salt=salt,
        merge_bytes=lambda blobs: merge_all_hll(
            HLL.from_bytes(b) for b in blobs
        ).to_bytes(),
    )


def hll_cardinality(sketch: Column) -> Column:
    @pandas_udf(LongType())
    def f(s: pd.Series) -> pd.Series:
        return s.map(
            lambda b: None if b is None else HLL.from_bytes(bytes(b)).cardinality()
        )

    return f(sketch)


def hll_union_agg(
    df: DataFrame, sketch_col: str, keys: Sequence[str] = (),
    result_col: str = "hll",
) -> DataFrame:
    """Re-aggregate stored HLL sketches (rollup path)."""

    class Acc:
        __slots__ = ("s",)

        def __init__(self):
            self.s = None

    def fold(st, **cols):
        for blob in cols[sketch_col].to_pylist():
            if blob is None:
                continue
            h = HLL.from_bytes(bytes(blob))
            if st.s is None:
                st.s = h
            else:
                st.s.merge(h)

    return sketch_groupby_arrow(
        df, keys, [sketch_col], Acc, fold,
        lambda st: st.s.to_bytes() if st.s is not None else None,
        lambda blobs: (merge_all_hll(HLL.from_bytes(b) for b in blobs).to_bytes()
                       if blobs else None,),
        [StructField(result_col, BinaryType(), True)],
    )


# ----------------------------------------------------------------------
# count-min
# ----------------------------------------------------------------------
def _cm_fold(count_col):
    import pyarrow.compute as pc

    def fold(st, **cols):
        h = cols[_HASH_COL]
        if count_col is None:
            st.add_hashes(_hash_np(h))
            return
        from tdigest_spark.kernel.arrownp import arrow_bools, arrow_ints

        valid = arrow_bools(pc.is_valid(h))
        hv = arrow_ints(h, fill=0)
        cv = arrow_ints(cols[count_col], fill=0)
        st.add_hashes(hv[valid], cv[valid])

    return fold


def countmin_sketch(
    df: DataFrame, col: str, keys: Sequence[str] = (),
    width: int = 2048, depth: int = 5, count_col: str | None = None,
    result_col: str = "countmin", salt: int | None = None,
) -> DataFrame:
    """Build a serialized count-min sketch of value frequencies per
    group.  Point estimates are one-sided: est >= true, est <= true +
    (e/width)·N with prob 1-(1/e)^depth."""
    df = _with_hash(df, col, keep=[*keys, *([count_col] if count_col else [])])
    inputs = [_HASH_COL] + ([count_col] if count_col else [])
    return sketch_groupby_arrow(
        df, keys, inputs, lambda: CountMin(width, depth), _cm_fold(count_col),
        lambda s: s.to_bytes(),
        lambda blobs: (merge_all_cm(CountMin.from_bytes(b) for b in blobs).to_bytes()
                       if blobs else None,),
        [StructField(result_col, BinaryType(), True)],
        salt=salt,
        merge_bytes=lambda blobs: merge_all_cm(
            CountMin.from_bytes(b) for b in blobs
        ).to_bytes(),
    )


def _lookup_sketch(cache: dict, last: list, blob, from_bytes):
    """Per-row sketch resolution without hashing the whole blob each
    row: consecutive rows almost always carry the same (large) sketch
    blob, so an identity/equality check against the previous row's blob
    skips both the ``bytes()`` copy and the dict hash of ~10-100 KB."""
    if last[0] is not None and (blob is last[0] or blob == last[0]):
        return last[1]
    bb = bytes(blob)
    sk = cache.get(bb)
    if sk is None:
        sk = cache[bb] = from_bytes(bb)
    last[0], last[1] = blob, sk
    return sk


def countmin_estimate(sketch: Column, probe: Column) -> Column:
    """Estimated frequency of ``probe`` (any type) in the sketch.
    The probe is hashed JVM-side with the same xxhash64."""
    # the hash column must be NON-nullable: a single null in a pandas
    # batch turns the int64 series into float64, silently rounding
    # 63-bit hashes (≈all of them exceed 2^53) to wrong bit positions.
    # Nulls are carried as a separate boolean mask instead.
    probe_hash = F.coalesce(F.xxhash64(probe), F.lit(0))

    @pandas_udf(LongType())
    def f(s: pd.Series, h: pd.Series, isnull: pd.Series) -> pd.Series:
        cache: dict[bytes, CountMin] = {}
        last: list = [None, None]
        hv_arr = h.to_numpy(dtype=np.int64)  # exact: no nulls by construction
        out = []
        for i, (blob, nul) in enumerate(zip(s, isnull)):
            if blob is None or nul:
                out.append(None)
                continue
            cm = _lookup_sketch(cache, last, blob, CountMin.from_bytes)
            out.append(int(cm.estimate_hashes(hv_arr[i : i + 1])[0]))
        return pd.Series(out, dtype="object")

    return f(sketch, probe_hash, probe.isNull())


def countmin_total(sketch: Column) -> Column:
    @pandas_udf(LongType())
    def f(s: pd.Series) -> pd.Series:
        return s.map(lambda b: None if b is None else CountMin.from_bytes(bytes(b)).total)

    return f(sketch)


# ----------------------------------------------------------------------
# Bloom
# ----------------------------------------------------------------------
def bloom_filter(
    df: DataFrame, col: str, keys: Sequence[str] = (),
    m: int = 1 << 20, k: int = 5,
    result_col: str = "bloom", salt: int | None = None,
) -> DataFrame:
    """Build a serialized Bloom filter of the values per group."""
    df = _with_hash(df, col, keep=keys)

    def fold(st, **cols):
        st.add_hashes(_hash_np(cols[_HASH_COL]))

    return sketch_groupby_arrow(
        df, keys, [_HASH_COL], lambda: Bloom(m, k), fold,
        lambda s: s.to_bytes(),
        lambda blobs: (merge_all_bloom(Bloom.from_bytes(b) for b in blobs).to_bytes()
                       if blobs else None,),
        [StructField(result_col, BinaryType(), True)],
        salt=salt,
        merge_bytes=lambda blobs: merge_all_bloom(
            Bloom.from_bytes(b) for b in blobs
        ).to_bytes(),
    )


def bloom_might_contain(sketch: Column, probe: Column) -> Column:
    """Membership probe (no false negatives).  Hash column kept
    non-nullable + separate null mask — see countmin_estimate for why
    (float64 coercion would corrupt hashes and break the no-false-
    negative contract)."""
    probe_hash = F.coalesce(F.xxhash64(probe), F.lit(0))

    @pandas_udf(BooleanType())
    def f(s: pd.Series, h: pd.Series, isnull: pd.Series) -> pd.Series:
        cache: dict[bytes, Bloom] = {}
        last: list = [None, None]
        hv_arr = h.to_numpy(dtype=np.int64)
        out = []
        for i, (blob, nul) in enumerate(zip(s, isnull)):
            if blob is None or nul:
                out.append(None)
                continue
            bl = _lookup_sketch(cache, last, blob, Bloom.from_bytes)
            out.append(bool(bl.contains_hashes(hv_arr[i : i + 1])[0]))
        return pd.Series(out, dtype="object")

    return f(sketch, probe_hash, probe.isNull())


# ----------------------------------------------------------------------
# KLL
# ----------------------------------------------------------------------
def _numeric_check(df, col):
    from pyspark.sql.types import BooleanType, NumericType

    dt = df.schema[col].dataType
    if not isinstance(dt, NumericType) or isinstance(dt, BooleanType):
        raise TypeError(
            f"column {col!r} has type {dt.simpleString()}; KLL ingests "
            "numeric values only (cast explicitly)"
        )


def _kll_fold(value_col):
    def fold(st, **cols):
        from tdigest_spark.kernel.arrownp import arrow_floats

        st.add_values(arrow_floats(cols[value_col]))

    return fold


def kll_sketch(
    df: DataFrame, value_col: str, keys: Sequence[str] = (), k: int = 200,
    result_col: str = "kll", salt: int | None = None,
) -> DataFrame:
    _numeric_check(df, value_col)
    return sketch_groupby_arrow(
        df, keys, [value_col], lambda: KLL(k), _kll_fold(value_col),
        lambda s: s.to_bytes(),
        lambda blobs: (merge_all_kll(KLL.from_bytes(b) for b in blobs).to_bytes()
                       if blobs else None,),
        [StructField(result_col, BinaryType(), True)],
        salt=salt,
        merge_bytes=lambda blobs: merge_all_kll(
            KLL.from_bytes(b) for b in blobs
        ).to_bytes(),
    )


def kll_quantile(
    df: DataFrame, value_col: str, q: float, keys: Sequence[str] = (),
    k: int = 200, result_col: str = "quantile", salt: int | None = None,
) -> DataFrame:
    """Approximate quantile with uniform rank error ~O(1/k) — the
    cross-check estimator next to tdigest_percentile."""

    _numeric_check(df, value_col)

    def fin(blobs):
        m = merge_all_kll(KLL.from_bytes(b) for b in blobs) if blobs else None
        return (float(m.quantile(q)) if m and m.n else None,)

    return sketch_groupby_arrow(
        df, keys, [value_col], lambda: KLL(k), _kll_fold(value_col),
        lambda s: s.to_bytes(), fin,
        [StructField(result_col, DoubleType(), True)],
        salt=salt,
        # without merge_bytes, salt raised at plan time and the
        # ungrouped bounded fan-in tree merge was disabled
        merge_bytes=lambda blobs: merge_all_kll(
            KLL.from_bytes(b) for b in blobs
        ).to_bytes(),
    )


def kll_rank(sketch: Column, value: float) -> Column:
    vv = float(value)

    @pandas_udf(DoubleType())
    def f(s: pd.Series) -> pd.Series:
        return s.map(
            lambda b: None
            if b is None
            else float(KLL.from_bytes(bytes(b)).rank_of([vv])[0])
        )

    return f(sketch)


def kll_quantile_of_sketch(sketch: Column, q: float) -> Column:
    qq = float(q)

    @pandas_udf(DoubleType())
    def f(s: pd.Series) -> pd.Series:
        return s.map(
            lambda b: None if b is None else KLL.from_bytes(bytes(b)).quantile(qq)
        )

    return f(sketch)
