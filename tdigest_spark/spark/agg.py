"""Cross-stage merge utilities for serialized sketches.

(The partial-aggregation engine itself lives in ``arrow_agg.py`` —
mapInArrow with dictionary-encoded keys; this module keeps the global
tree-merge fold used when a no-key aggregation must combine sketches
from very many partitions.)
"""

from __future__ import annotations

from collections.abc import Callable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import BinaryType, StructField, StructType


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
