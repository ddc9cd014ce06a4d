"""t-digest aggregates as DataFrame operations.

Maps the reference's 21 aggregate definitions (SURVEY.md §2.1.1/§2.1.2,
tdigest--1.0.0.sql + upgrades) onto the two-phase Arrow pipeline in
``agg.py``.  Every aggregate is a parameterization of ONE
build+merge+finalize skeleton, exactly like the reference reuses five
final functions across its 21 aggregates.

Raw-value aggregates (reference SFUNC tdigest_add_double &c.):
    tdigest_percentile, tdigest_percentile_of, tdigest, tdigest_avg,
    tdigest_sum — all accept ``count_col`` for the pre-aggregated
    (value, count) ingestion variants and ``keys`` for GROUP BY.

Digest re-aggregation (SFUNC tdigest_add_digest &c., tdigest.c:1437-1518):
    the same entry points with ``digest_col`` input via the
    ``*_digests`` functions.
"""

from __future__ import annotations

from collections.abc import Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    LongType,
    StructField,
)

from tdigest_spark.kernel.tdigest import (
    TDigest,
    buffer_size,
    check_compression,
    check_percentiles,
    check_trim,
    generate_counts,
    merge_all,
)
from tdigest_spark.spark.agg import sketch_groupby

# expansion chunk bound for the (value, count) ingestion path
_EXPAND_CHUNK = 1 << 20


def _consume_values(keys: Sequence[str], value_col: str, compression: int):
    """Batch consumer: fold one Arrow batch into per-group TDigests."""
    keys = list(keys)

    def consume(pdf: pd.DataFrame, acc: dict) -> None:
        if not keys:
            groups = [((0,), pdf)]
        else:
            groups = (
                (k if isinstance(k, tuple) else (k,), sub)
                for k, sub in pdf.groupby(keys, sort=False, dropna=False)
            )
        for key, sub in groups:
            d = acc.get(key)
            if d is None:
                d = acc[key] = TDigest(compression)
            vals = sub[value_col].to_numpy(dtype=np.float64, na_value=np.nan)
            d.add_values(vals)

    return consume


def _consume_value_counts(
    keys: Sequence[str], value_col: str, count_col: str, compression: int
):
    """(value, count) ingestion — tdigest_add_double_count semantics
    (tdigest.c:1152-1255): huge counts go through the closed-form
    generate fast path, small counts are expanded to unit weights so
    centroid sizing near the tails stays correct."""
    keys = list(keys)
    bufsz = buffer_size(compression)

    def consume(pdf: pd.DataFrame, acc: dict) -> None:
        if not keys:
            groups = [((0,), pdf)]
        else:
            groups = (
                (k if isinstance(k, tuple) else (k,), sub)
                for k, sub in pdf.groupby(keys, sort=False, dropna=False)
            )
        for key, sub in groups:
            d = acc.get(key)
            if d is None:
                d = acc[key] = TDigest(compression)
            vals = sub[value_col].to_numpy(dtype=np.float64, na_value=np.nan)
            cnts = sub[count_col].to_numpy(dtype=np.int64, na_value=1)
            ok = ~np.isnan(vals)
            vals, cnts = vals[ok], cnts[ok]
            if np.any(cnts <= 0):
                raise ValueError("invalid count value, must be a positive value")
            huge = cnts > bufsz
            for v, c in zip(vals[huge], cnts[huge]):
                gc = generate_counts(compression, int(c))
                d.add_centroids(np.full(gc.size, v), gc)
            vals, cnts = vals[~huge], cnts[~huge]
            # expand in bounded chunks to cap memory
            start = 0
            n = vals.size
            while start < n:
                end = start
                total = 0
                while end < n and total + cnts[end] <= _EXPAND_CHUNK:
                    total += cnts[end]
                    end += 1
                end = max(end, start + 1)
                d.add_values(np.repeat(vals[start:end], cnts[start:end]))
                start = end

    return consume


def _consume_digests(keys: Sequence[str], digest_col: str, compression: int | None):
    """Digest re-aggregation — tdigest_add_digest (tdigest.c:1437-1518).
    Compression of the first digest wins unless overridden."""
    keys = list(keys)

    def consume(pdf: pd.DataFrame, acc: dict) -> None:
        if not keys:
            groups = [((0,), pdf)]
        else:
            groups = (
                (k if isinstance(k, tuple) else (k,), sub)
                for k, sub in pdf.groupby(keys, sort=False, dropna=False)
            )
        for key, sub in groups:
            for blob in sub[digest_col]:
                if blob is None:
                    continue
                incoming = TDigest.from_bytes(bytes(blob))
                d = acc.get(key)
                if d is None:
                    d = acc[key] = TDigest(compression or incoming.compression)
                d.merge_digest(incoming)

    return consume


def _serialize_partial(d: TDigest) -> bytes | None:
    return d.to_bytes() if d.count > 0 else None


def _merged(sketches: list[bytes]) -> TDigest | None:
    return merge_all(TDigest.from_bytes(s) for s in sketches)


# ----------------------------------------------------------------------
# finalizers (reference FINALFUNCs, tdigest.c:2064-2191, 3364-3428)
# ----------------------------------------------------------------------
def _fin_percentile(q: float):
    def fin(sketches):
        d = _merged(sketches)
        return (float(d.quantile(q)),) if d else (None,)

    return fin


def _fin_percentile_array(qs):
    qs = list(qs)

    def fin(sketches):
        d = _merged(sketches)
        return (d.quantiles(qs).tolist(),) if d else (None,)

    return fin


def _fin_percentile_of(v: float):
    def fin(sketches):
        d = _merged(sketches)
        return (float(d.quantile_of(v)),) if d else (None,)

    return fin


def _fin_percentile_of_array(vs):
    vs = list(vs)

    def fin(sketches):
        d = _merged(sketches)
        return (d.quantiles_of(vs).tolist(),) if d else (None,)

    return fin


def _fin_digest(sketches):
    d = _merged(sketches)
    return (d.to_bytes(),) if d else (None,)


def _fin_count(sketches):
    d = _merged(sketches)
    return (int(d.count),) if d else (0,)


def _fin_trimmed(low: float, high: float, want_avg: bool):
    def fin(sketches):
        d = _merged(sketches)
        if d is None:
            return (None,)
        return ((d.trimmed_avg(low, high) if want_avg else d.trimmed_sum(low, high)),)

    return fin


# ----------------------------------------------------------------------
# public aggregates over raw values
# ----------------------------------------------------------------------
def _run(
    df,
    keys,
    consume,
    fin,
    fields,
    salt=None,
    needed_cols=(),
):
    # prune to keys + inputs before the Arrow boundary: mapInPandas ships
    # every column of its input through Arrow, so a wide caller DataFrame
    # must not reach it (and the projection pushes column pruning into
    # the scan)
    cols = list(dict.fromkeys([*keys, *needed_cols]))
    if cols:
        df = df.select(*cols)
    return sketch_groupby(
        df,
        keys,
        consume,
        _serialize_partial,
        fin,
        fields,
        salt=salt,
    )


def _consume_for(df, keys, value_col, count_col, compression):
    check_compression(compression)  # fail at plan time, not in the executor
    if count_col is None:
        return _consume_values(keys, value_col, compression)
    return _consume_value_counts(keys, value_col, count_col, compression)


def tdigest_percentile(
    df: DataFrame,
    value_col: str,
    compression: int,
    quantiles,
    keys: Sequence[str] = (),
    count_col: str | None = None,
    result_col: str = "percentile",
    salt: int | None = None,
) -> DataFrame:
    """tdigest_percentile(value [, count], accuracy, quantile[s]) —
    SURVEY §2.1.1 #1-4."""
    if np.isscalar(quantiles):
        check_percentiles([quantiles])
        fin = _fin_percentile(float(quantiles))
        fields = [StructField(result_col, DoubleType(), True)]
    else:
        check_percentiles(quantiles)
        fin = _fin_percentile_array(quantiles)
        fields = [StructField(result_col, ArrayType(DoubleType()), True)]
    consume = _consume_for(df, keys, value_col, count_col, compression)
    needed = [value_col] + ([count_col] if count_col else [])
    return _run(df, keys, consume, fin, fields, salt, needed_cols=needed)


def tdigest_percentile_of(
    df: DataFrame,
    value_col: str,
    compression: int,
    values,
    keys: Sequence[str] = (),
    count_col: str | None = None,
    result_col: str = "percentile_of",
    salt: int | None = None,
) -> DataFrame:
    """tdigest_percentile_of(value [, count], accuracy, hypothetical[s])
    — SURVEY §2.1.1 #5-8 (relative rank / inverse CDF)."""
    if np.isscalar(values):
        fin = _fin_percentile_of(float(values))
        fields = [StructField(result_col, DoubleType(), True)]
    else:
        fin = _fin_percentile_of_array(values)
        fields = [StructField(result_col, ArrayType(DoubleType()), True)]
    consume = _consume_for(df, keys, value_col, count_col, compression)
    needed = [value_col] + ([count_col] if count_col else [])
    return _run(df, keys, consume, fin, fields, salt, needed_cols=needed)


def tdigest(
    df: DataFrame,
    value_col: str,
    compression: int,
    keys: Sequence[str] = (),
    count_col: str | None = None,
    result_col: str = "tdigest",
    salt: int | None = None,
) -> DataFrame:
    """tdigest(value [, count], accuracy) → serialized digest column —
    SURVEY §2.1.1 #9-10; the pre-aggregation workhorse."""
    consume = _consume_for(df, keys, value_col, count_col, compression)
    fields = [StructField(result_col, BinaryType(), True)]
    needed = [value_col] + ([count_col] if count_col else [])
    return _run(df, keys, consume, _fin_digest, fields, salt, needed_cols=needed)


def tdigest_avg(
    df: DataFrame,
    value_col: str,
    compression: int,
    low: float,
    high: float,
    keys: Sequence[str] = (),
    count_col: str | None = None,
    result_col: str = "avg",
    salt: int | None = None,
) -> DataFrame:
    """tdigest_avg(value [, count], accuracy, low, high) — trimmed mean,
    SURVEY §2.1.1 #11-12."""
    check_trim(low, high)
    consume = _consume_for(df, keys, value_col, count_col, compression)
    fields = [StructField(result_col, DoubleType(), True)]
    needed = [value_col] + ([count_col] if count_col else [])
    return _run(df, keys, consume, _fin_trimmed(low, high, True), fields, salt, needed_cols=needed)


def tdigest_sum(
    df: DataFrame,
    value_col: str,
    compression: int,
    low: float,
    high: float,
    keys: Sequence[str] = (),
    count_col: str | None = None,
    result_col: str = "sum",
    salt: int | None = None,
) -> DataFrame:
    """tdigest_sum(value [, count], accuracy, low, high) — trimmed sum,
    SURVEY §2.1.1 #13-14."""
    check_trim(low, high)
    consume = _consume_for(df, keys, value_col, count_col, compression)
    fields = [StructField(result_col, DoubleType(), True)]
    needed = [value_col] + ([count_col] if count_col else [])
    return _run(df, keys, consume, _fin_trimmed(low, high, False), fields, salt, needed_cols=needed)


# ----------------------------------------------------------------------
# aggregates over pre-built digest columns (§2.1.2)
# ----------------------------------------------------------------------
def tdigest_percentile_digests(
    df: DataFrame,
    digest_col: str,
    quantiles,
    keys: Sequence[str] = (),
    result_col: str = "percentile",
    compression: int | None = None,
    salt: int | None = None,
) -> DataFrame:
    """tdigest_percentile(tdigest, quantile[s]) — SURVEY §2.1.2 #15-16."""
    consume = _consume_digests(keys, digest_col, compression)
    if np.isscalar(quantiles):
        check_percentiles([quantiles])
        fin = _fin_percentile(float(quantiles))
        fields = [StructField(result_col, DoubleType(), True)]
    else:
        check_percentiles(quantiles)
        fin = _fin_percentile_array(quantiles)
        fields = [StructField(result_col, ArrayType(DoubleType()), True)]
    return _run(df, keys, consume, fin, fields, salt, needed_cols=[digest_col])


def tdigest_percentile_of_digests(
    df: DataFrame,
    digest_col: str,
    values,
    keys: Sequence[str] = (),
    result_col: str = "percentile_of",
    compression: int | None = None,
    salt: int | None = None,
) -> DataFrame:
    """tdigest_percentile_of(tdigest, hypothetical[s]) — §2.1.2 #17-18."""
    consume = _consume_digests(keys, digest_col, compression)
    if np.isscalar(values):
        fin = _fin_percentile_of(float(values))
        fields = [StructField(result_col, DoubleType(), True)]
    else:
        fin = _fin_percentile_of_array(values)
        fields = [StructField(result_col, ArrayType(DoubleType()), True)]
    return _run(df, keys, consume, fin, fields, salt, needed_cols=[digest_col])


def tdigest_union_agg(
    df: DataFrame,
    digest_col: str,
    keys: Sequence[str] = (),
    result_col: str = "tdigest",
    compression: int | None = None,
    salt: int | None = None,
) -> DataFrame:
    """tdigest(tdigest) — digest-union aggregate, the tree-merge
    primitive (§2.1.2 #19)."""
    consume = _consume_digests(keys, digest_col, compression)
    fields = [StructField(result_col, BinaryType(), True)]
    return _run(df, keys, consume, _fin_digest, fields, salt, needed_cols=[digest_col])


def tdigest_avg_digests(
    df: DataFrame,
    digest_col: str,
    low: float,
    high: float,
    keys: Sequence[str] = (),
    result_col: str = "avg",
    compression: int | None = None,
    salt: int | None = None,
) -> DataFrame:
    """tdigest_avg(tdigest, low, high) — §2.1.2 #20."""
    check_trim(low, high)
    consume = _consume_digests(keys, digest_col, compression)
    fields = [StructField(result_col, DoubleType(), True)]
    return _run(df, keys, consume, _fin_trimmed(low, high, True), fields, salt, needed_cols=[digest_col])


def tdigest_sum_digests(
    df: DataFrame,
    digest_col: str,
    low: float,
    high: float,
    keys: Sequence[str] = (),
    result_col: str = "sum",
    compression: int | None = None,
    salt: int | None = None,
) -> DataFrame:
    """tdigest_sum(tdigest, low, high) — §2.1.2 #21."""
    check_trim(low, high)
    consume = _consume_digests(keys, digest_col, compression)
    fields = [StructField(result_col, DoubleType(), True)]
    return _run(df, keys, consume, _fin_trimmed(low, high, False), fields, salt, needed_cols=[digest_col])


def tdigest_count_agg(
    df: DataFrame,
    value_col: str | None = None,
    compression: int = 100,
    keys: Sequence[str] = (),
    digest_col: str | None = None,
    count_col: str | None = None,
    result_col: str = "count",
) -> DataFrame:
    """Total item count of the (merged) digest — scalar
    tdigest_count (tdigest.c:2941-2947) lifted to an aggregate."""
    if digest_col is not None:
        consume = _consume_digests(keys, digest_col, None)
    else:
        consume = _consume_for(df, keys, value_col, count_col, compression)
    fields = [StructField(result_col, LongType(), True)]
    needed = [digest_col] if digest_col is not None else (
        [value_col] + ([count_col] if count_col else []))
    return _run(df, keys, consume, _fin_count, fields, needed_cols=needed)
