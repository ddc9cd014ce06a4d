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

    Round count is fixed from the *partition* count at plan time — no
    ``df.count()`` actions inside the pipeline.  Each pass collapses
    every partition to one sketch (folding incrementally so at most
    ``fanout`` serialized sketches are held at once), then repartitions
    ``fanout``× narrower, so no task ever receives more than ``fanout``
    upstream rows.  Use for global aggregation when #partitions is very
    large (e.g. 10^5 file splits of a 100 TB table); for grouped
    aggregation prefer ``salt=`` in :func:`sketch_groupby_arrow`.
    """
    schema = StructType([StructField(sketch_col, BinaryType(), True)])

    def merge_partition(batches):
        buf: list[bytes] = []
        for pdf in batches:
            # fold INSIDE the extend loop: appending a whole Arrow
            # batch first would hold up to maxRecordsPerBatch (65k)
            # serialized sketches before the bound check ran
            for s in pdf[sketch_col]:
                if s is None:
                    continue
                buf.append(s)
                if len(buf) > fanout:  # bound working-set memory
                    buf = [merge_bytes(buf)]
        yield pd.DataFrame({sketch_col: [merge_bytes(buf)] if buf else []})

    df = partials.select(sketch_col)
    # collapse each input partition to one sketch (narrow, no shuffle),
    # then halve-by-fanout until at most `fanout` rows remain
    width = max(1, df.rdd.getNumPartitions())
    df = df.mapInPandas(merge_partition, schema)
    while width > fanout:
        width = int(np.ceil(width / fanout))
        df = df.repartition(width).mapInPandas(merge_partition, schema)
    rows = df.collect()
    sketches = [r[sketch_col] for r in rows if r[sketch_col] is not None]
    return merge_bytes(sketches) if sketches else None
