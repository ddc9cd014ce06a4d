"""Top-k heavy hitters + reservoir sampling as Spark aggregates.

Same Arrow two-phase skeleton.  For SpaceSaving the per-batch work is a
C-level ``pyarrow.compute.value_counts`` (one Python loop iteration per
DISTINCT item per batch, never per row); for the reservoir the per-row
path is pure NumPy over JVM-hashed ids.
"""

from __future__ import annotations

from collections.abc import Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    LongType,
    StringType,
    StructField,
)

from tdigest_spark.kernel.reservoir import Reservoir, merge_all_reservoir
from tdigest_spark.kernel.topk import SpaceSaving, merge_all_topk
from tdigest_spark.spark.arrow_agg import sketch_groupby_arrow

_HASH_COL = "__h64__"


# ----------------------------------------------------------------------
# SpaceSaving top-k
# ----------------------------------------------------------------------
def _topk_fold(item_col: str):
    def fold(st: SpaceSaving, **cols) -> None:
        col = cols[item_col].drop_null()
        if len(col) == 0:
            return
        vc = pc.value_counts(col)  # C-level distinct+count
        items = vc.field("values").to_pylist()
        counts = vc.field("counts").to_pylist()
        st.add_items([str(i) for i in items], counts)

    return fold


def topk_sketch(
    df: DataFrame, item_col: str, keys: Sequence[str] = (), m: int = 256,
    result_col: str = "topk", salt: int | None = None,
) -> DataFrame:
    """Serialized SpaceSaving sketch of item frequencies per group.
    Exact while #distinct <= m; otherwise error <= N/m one-sided."""
    df = df.select(*dict.fromkeys([*keys, item_col])).withColumn(
        item_col, F.col(item_col).cast("string")
    )
    return sketch_groupby_arrow(
        df, keys, [item_col], lambda: SpaceSaving(m), _topk_fold(item_col),
        lambda s: s.to_bytes(),
        lambda blobs: (merge_all_topk(SpaceSaving.from_bytes(b) for b in blobs).to_bytes()
                       if blobs else None,),
        [StructField(result_col, BinaryType(), True)],
        salt=salt,
        merge_bytes=lambda blobs: merge_all_topk(
            SpaceSaving.from_bytes(b) for b in blobs
        ).to_bytes(),
    )


def topk(
    df: DataFrame, item_col: str, k: int, keys: Sequence[str] = (),
    m: int = 256, salt: int | None = None,
) -> DataFrame:
    """Top-k items per group: (keys..., rank int, item string,
    count_est long, error long), rank by (count desc, item asc)."""
    df = df.select(*dict.fromkeys([*keys, item_col])).withColumn(
        item_col, F.col(item_col).cast("string")
    )

    def fin(blobs):
        s = merge_all_topk(SpaceSaving.from_bytes(b) for b in blobs) if blobs else None
        if s is None:
            return (None, None, None)
        rows = s.top(k)
        return (
            [it for it, _, _ in rows],
            [int(c) for _, c, _ in rows],
            [int(e) for _, _, e in rows],
        )

    fields = [
        StructField("items", ArrayType(StringType()), True),
        StructField("counts", ArrayType(LongType()), True),
        StructField("errors", ArrayType(LongType()), True),
    ]
    packed = sketch_groupby_arrow(
        df, keys, [item_col], lambda: SpaceSaving(m), _topk_fold(item_col),
        lambda s: s.to_bytes(), fin, fields, salt=salt,
        merge_bytes=lambda blobs: merge_all_topk(
            SpaceSaving.from_bytes(b) for b in blobs
        ).to_bytes(),
    )
    exploded = packed.select(
        *keys,
        F.posexplode(F.arrays_zip("items", "counts", "errors")).alias("idx", "z"),
    )
    return exploded.select(
        *keys,
        (F.col("idx") + 1).cast("int").alias("rank"),
        F.col("z.items").alias("item"),
        F.col("z.counts").alias("count_est"),
        F.col("z.errors").alias("error"),
    )


# ----------------------------------------------------------------------
# reservoir sample
# ----------------------------------------------------------------------
def _reservoir_fold():
    def fold(st: Reservoir, **cols) -> None:
        from tdigest_spark.kernel.arrownp import arrow_ints

        st.add_hashes(arrow_ints(cols[_HASH_COL].drop_null()))

    return fold


def reservoir_sample_hashes(
    df: DataFrame, col: str, k: int, keys: Sequence[str] = (),
    seed: int = 42, result_col: str = "sample_hashes",
) -> DataFrame:
    """Deterministic uniform k-sample per group, returned as the
    xxhash64 ids of the sampled rows (join back on xxhash64(col) to
    materialize payloads).  Bottom-k construction → merge-exact and
    partitioning-independent."""
    hashed = df.withColumn(
        _HASH_COL, F.when(F.col(col).isNotNull(), F.xxhash64(F.col(col)))
    ).select(*dict.fromkeys([*keys, _HASH_COL]))

    def fin(blobs):
        r = merge_all_reservoir(Reservoir.from_bytes(b) for b in blobs) if blobs else None
        if r is None:
            return (None, 0)
        return ([int(h) for h in r.sample_hashes()], int(r.n))

    fields = [
        StructField(result_col, ArrayType(LongType()), True),
        StructField("n_seen", LongType(), True),
    ]
    return sketch_groupby_arrow(
        hashed, keys, [_HASH_COL], lambda: Reservoir(k, seed), _reservoir_fold(),
        lambda s: s.to_bytes(), fin, fields,
        merge_bytes=lambda blobs: merge_all_reservoir(
            Reservoir.from_bytes(b) for b in blobs
        ).to_bytes(),
    )
