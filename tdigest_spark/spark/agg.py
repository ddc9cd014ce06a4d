"""Two-phase Arrow aggregation pipeline for mergeable sketches.

This is the Spark-side counterpart of PostgreSQL's partial-aggregate
protocol that the reference relies on (PARALLEL SAFE aggregates with
COMBINEFUNC/SERIALFUNC, tdigest--1.0.0.sql:62-70; plan shape
``Finalize Aggregate ← Gather ← Partial Aggregate``,
test/expected/parallel_query.out:46-57):

* **partial** — ``df.mapInPandas``: every executor core consumes its
  partition's Arrow batches and emits ONE serialized sketch per
  (partition × group).  All heavy work happens here, vectorized in
  NumPy; shuffle volume is bounded by #partitions × #groups × sketch
  size (≤ 16 B × 10·compression for a t-digest), never by the data.
* **merge+finalize** — ``groupBy(keys).applyInPandas``: deserialize,
  fold the per-partition sketches (associative merge), run the final
  estimator.

The same skeleton serves every sketch in this library (t-digest, HLL,
count-min, KLL, Bloom): plug in a builder factory and a finalizer.

Scale notes (100 TB / 1000 executors):
* Filters/column pruning stay ahead of ``mapInPandas`` — callers pass a
  pre-projected DataFrame, so Parquet scans read only key+value columns.
* Skewed group keys cost nothing in the partial phase (each partition
  builds its own sketch regardless of key distribution).  For the merge
  phase with very many partitions, ``salt=k`` inserts an intermediate
  merge round keyed by (keys, partition_id % k) so no single reducer
  sees more than #partitions/k sketches.
* For global (no-key) aggregation over huge partition counts,
  :func:`tree_merge` folds sketches in log-rounds instead of a single
  reducer.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence
from typing import Any

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import BinaryType, StructField, StructType

GROUP_SENTINEL = "__sketch_group__"
SKETCH_COL = "__sketch__"


def _key_schema(df: DataFrame, keys: Sequence[str]) -> list[StructField]:
    by_name = {f.name: f for f in df.schema.fields}
    return [by_name[k] for k in keys]


def sketch_groupby(
    df: DataFrame,
    keys: Sequence[str],
    consume_batch: Callable[[pd.DataFrame, dict], None],
    partial_serialize: Callable[[Any], bytes | None],
    finalize_fn: Callable[[list[bytes]], tuple],
    result_fields: Sequence[StructField],
    salt: int | None = None,
    merge_bytes: Callable[[list[bytes]], bytes | None] | None = None,
) -> DataFrame:
    """Generic partial→merge→finalize pipeline.

    ``consume_batch(pdf, acc)`` folds one Arrow batch into the per-group
    accumulator dict ``acc`` (key tuple → sketch state).
    ``partial_serialize(state)`` turns one accumulator into bytes (or
    None for an empty group).  ``finalize_fn(list_of_sketch_bytes)``
    produces the result row tail for one group.
    """
    keys = list(keys)
    grouped = bool(keys)
    if not grouped:
        df = df.withColumn(GROUP_SENTINEL, F.lit(0))
        keys = [GROUP_SENTINEL]

    partial_schema = StructType(
        _key_schema(df, keys) + [StructField(SKETCH_COL, BinaryType(), True)]
    )

    def run_partial(batches):
        acc: dict[tuple, Any] = {}
        for pdf in batches:
            consume_batch(pdf, acc)
        rows: dict[str, list] = {k: [] for k in partial_schema.fieldNames()}
        for key, state in acc.items():
            for kname, kval in zip(keys, key):
                rows[kname].append(kval)
            rows[SKETCH_COL].append(partial_serialize(state))
        yield pd.DataFrame(rows)

    partials = df.mapInPandas(run_partial, partial_schema)

    result_schema = StructType(_key_schema(df, keys) + list(result_fields))

    def merge_finalize(pdf: pd.DataFrame) -> pd.DataFrame:
        sketches = [s for s in pdf[SKETCH_COL] if s is not None]
        tail = finalize_fn(sketches)
        out = {k: [pdf[k].iloc[0]] for k in keys}
        for field, val in zip(result_fields, tail):
            out[field.name] = [val]
        return pd.DataFrame(out)

    if salt and salt > 1:
        # intermediate merge round: cap reducer fan-in for hot groups
        mb = merge_bytes or _merge_bytes

        def merge_only(pdf: pd.DataFrame) -> pd.DataFrame:
            sketches = [s for s in pdf[SKETCH_COL] if s is not None]
            out = {k: [pdf[k].iloc[0]] for k in keys}
            out[SKETCH_COL] = [mb(sketches) if sketches else None]
            return pd.DataFrame(out)

        salted = partials.withColumn(
            "__salt__", F.pmod(F.spark_partition_id(), F.lit(salt))
        )
        partials = salted.groupBy(*keys, "__salt__").applyInPandas(
            lambda pdf: merge_only(pdf.drop(columns="__salt__")), partial_schema
        )

    result = partials.groupBy(*keys).applyInPandas(merge_finalize, result_schema)
    if not grouped:
        result = result.drop(GROUP_SENTINEL)
    return result


def _merge_bytes(sketches: list[bytes]) -> bytes | None:
    """Merge serialized t-digests (used by the salted intermediate
    round and tree_merge)."""
    from tdigest_spark.kernel.tdigest import TDigest, merge_all

    merged = merge_all(TDigest.from_bytes(s) for s in sketches)
    return merged.to_bytes() if merged is not None else None


def tree_merge(
    partials: DataFrame,
    sketch_col: str,
    merge_bytes: Callable[[list[bytes]], bytes | None] = _merge_bytes,
    fanout: int = 64,
) -> bytes | None:
    """treeAggregate-style global fold of serialized sketches.

    Each round shrinks the row count by ``fanout`` by merging within
    hash buckets, so no single task ever folds more than ``fanout``
    sketches.  Use for global aggregation when #partitions is very
    large (e.g. 10^5 file splits of a 100 TB table); for grouped
    aggregation prefer ``salt=`` in :func:`sketch_groupby`.
    """
    schema = StructType([StructField(sketch_col, BinaryType(), True)])

    def merge_partition(batches):
        buf: list[bytes] = []
        for pdf in batches:
            buf.extend(s for s in pdf[sketch_col] if s is not None)
        yield pd.DataFrame({sketch_col: [merge_bytes(buf)] if buf else []})

    df = partials.select(sketch_col)
    n = df.count()
    while n > fanout:
        n_buckets = max(1, int(np.ceil(n / fanout)))
        df = df.repartition(n_buckets).mapInPandas(merge_partition, schema)
        n = df.count()
    rows = df.collect()
    sketches = [r[sketch_col] for r in rows if r[sketch_col] is not None]
    return merge_bytes(sketches) if sketches else None
