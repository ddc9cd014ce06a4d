"""Checkpointed, resumable sketch builds with per-partition lineage.

The 100 TB failure model: a multi-hour scan must not restart from zero.
Stage 1 (the expensive scan → partial digests) writes its output as a
Parquet table whose rows carry lineage — split id, rows consumed,
centroid count, serialized size — plus a ``_SUCCESS`` marker from
Spark's committer.  Stage 2 (merge + finalize) reads only that table.
Re-running the job with the same checkpoint dir skips straight to
stage 2 (resume); deleting the dir rebuilds.  Because digests merge
associatively, the final result is independent of how the build was
split or resumed (SURVEY.md §7, BASELINE north_rule: "resumable from
checkpoint with per-partition lineage + metrics").
"""

from __future__ import annotations

import os
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

from tdigest_spark.kernel.tdigest import TDigest

LINEAGE_COLS = ["split_id", "n_rows", "n_centroids", "n_bytes"]


def _success_marker(path: str) -> str:
    return os.path.join(path, "_SUCCESS")


def is_complete(path: str, spark: SparkSession | None = None) -> bool:
    """True when the checkpoint's _SUCCESS marker exists.  Resolved
    through the Hadoop FileSystem API so resume detection works on
    HDFS/S3/GCS paths, not just the local filesystem; falls back to
    os.path only when no SparkSession is available."""
    spark = spark or SparkSession.getActiveSession()
    if spark is None:
        return os.path.exists(_success_marker(path))
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(_success_marker(path))
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return bool(fs.exists(hpath))


def build_partial_digests(
    df: DataFrame,
    keys: Sequence[str],
    value_col: str,
    compression: int,
    checkpoint_dir: str,
    overwrite: bool = False,
) -> DataFrame:
    """Stage 1: one digest per (input split × group), written to
    ``checkpoint_dir`` with lineage columns.  Returns the checkpoint
    table (from disk).  No-op if the checkpoint is already complete."""
    spark = df.sparkSession
    if is_complete(checkpoint_dir, spark) and not overwrite:
        return read_partials(spark, checkpoint_dir)

    keys = list(keys)
    # key fields in KEYS order — the native scan path yields row tuples
    # positionally, so schema order must match the key order exactly
    by_name = {f.name: f for f in df.schema.fields}
    key_fields = [by_name[k] for k in keys]
    schema = StructType(
        key_fields
        + [
            StructField("digest", BinaryType(), True),
            StructField("split_id", IntegerType(), False),
            StructField("n_rows", LongType(), False),
            StructField("n_centroids", IntegerType(), False),
            StructField("n_bytes", LongType(), False),
        ]
    )

    def fold_batches(batches):
        import numpy as np
        import pyarrow as pa

        from tdigest_spark.spark.arrow_agg import _group_slices

        acc: dict[tuple, TDigest] = {}
        rows_seen: dict[tuple, int] = {}
        for batch in batches:
            vcol = batch.column(batch.schema.get_field_index(value_col))
            for gkey, rows in _group_slices(batch, keys):
                d = acc.get(gkey)
                if d is None:
                    d = acc[gkey] = TDigest(compression)
                    rows_seen[gkey] = 0
                sliced = vcol.take(pa.array(rows)) if rows is not None else vcol
                from tdigest_spark.kernel.arrownp import arrow_floats

                arr = arrow_floats(sliced)
                d.add_values(arr)
                # count only rows the digest actually ingested —
                # add_values drops NaN/NULL, and the lineage invariant
                # (sum n_rows == sum digest counts) must hold with them
                rows_seen[gkey] += int(np.count_nonzero(~np.isnan(arr)))
        for gkey, d in acc.items():
            blob = d.to_bytes() if d.count > 0 else None
            yield gkey, blob, rows_seen[gkey], len(d.means)

    def build(batches):
        import pyarrow as pa

        from pyspark import TaskContext
        from pyspark.sql.pandas.types import to_arrow_schema

        out_schema = to_arrow_schema(schema)
        split_id = TaskContext.get().partitionId()
        out: dict[str, list] = {f.name: [] for f in schema.fields}
        for gkey, blob, n_rows, n_cent in fold_batches(batches):
            for kname, kval in zip(keys, gkey):
                out[kname].append(kval)
            out["digest"].append(blob)
            out["split_id"].append(split_id)
            out["n_rows"].append(n_rows)
            out["n_centroids"].append(n_cent)
            out["n_bytes"].append(len(blob) if blob else 0)
        from tdigest_spark.spark.arrow_agg import record_batch_exact

        yield record_batch_exact(out, out_schema)

    from tdigest_spark.spark.arrow_agg import (
        NATIVE_SCAN,
        _native_parquet_splits,
        iter_bundle_batches,
        native_scan_ops,
    )

    projected = df.select(*keys, value_col)
    needed = [*keys, value_col]
    native = _native_parquet_splits(projected, needed) if NATIVE_SCAN else None
    if native is not None:
        splits, col_map, predicate, pred_part, pred_data = native
        ops, sources = native_scan_ops(col_map, needed, pred_data)

        def scan_build(indexed_bundles):
            for split_id, bundle in indexed_bundles:
                batches = iter_bundle_batches(
                    bundle, needed, ops, sources, predicate, pred_part, pred_data
                )
                for gkey, blob, n_rows, n_cent in fold_batches(batches):
                    if not keys:
                        # ungrouped: _group_slices yields the sentinel
                        # (0,) key, which has no schema field — emitting
                        # it would shift every column right by one
                        gkey = ()
                    yield (
                        *gkey,
                        bytearray(blob) if blob is not None else None,
                        split_id,
                        n_rows,
                        n_cent,
                        len(blob) if blob else 0,
                    )

        if splits:
            rdd = spark.sparkContext.parallelize(
                list(enumerate(splits)), len(splits)
            ).mapPartitions(scan_build)
            partials_df = spark.createDataFrame(rdd, schema, verifySchema=False)
        else:
            partials_df = spark.createDataFrame([], schema)
    else:
        partials_df = projected.mapInArrow(build, schema)
    partials_df.write.mode("overwrite").parquet(checkpoint_dir)
    return read_partials(spark, checkpoint_dir)


def read_partials(spark: SparkSession, checkpoint_dir: str) -> DataFrame:
    return spark.read.parquet(checkpoint_dir)


def lineage_summary(partials: DataFrame) -> DataFrame:
    """Per-split audit: rows consumed, digest sizes — the metrics rows
    the north rule requires alongside the checkpoint."""
    return partials.groupBy("split_id").agg(
        F.count("*").alias("n_groups"),
        F.sum("n_rows").alias("rows_consumed"),
        F.sum("n_centroids").alias("centroids"),
        F.sum("n_bytes").alias("bytes"),
    )


def finalize_percentile(
    partials: DataFrame,
    keys: Sequence[str],
    quantiles,
    salt: int | None = None,
) -> DataFrame:
    """Stage 2: merge checkpointed digests per group and estimate."""
    from tdigest_spark.spark.tdigest_agg import tdigest_percentile_digests

    return tdigest_percentile_digests(
        partials, "digest", quantiles, keys=list(keys), salt=salt
    )


def checkpointed_percentile(
    df: DataFrame,
    keys: Sequence[str],
    value_col: str,
    compression: int,
    quantiles,
    checkpoint_dir: str,
    salt: int | None = None,
) -> DataFrame:
    """End-to-end: resumable stage-1 build + stage-2 merge/estimate."""
    partials = build_partial_digests(df, keys, value_col, compression, checkpoint_dir)
    return finalize_percentile(partials, keys, quantiles, salt=salt)


def verify_lineage(partials: DataFrame, expected_rows: int | None = None) -> dict:
    """Consistency checks over the checkpoint: Σ n_rows == Σ digest
    counts == expected input rows (when known).  Fully distributed —
    per-row digest counts are decoded executor-side and summed with
    F.sum, so a 10^6-split checkpoint never materializes on the
    driver."""
    from tdigest_spark.spark import functions as TF

    rows = partials.agg(
        F.sum("n_rows").alias("rows"),
        F.count("*").alias("groups"),
        F.sum(TF.tdigest_count(F.col("digest"))).alias("dcount"),
    ).collect()[0]
    total_count = int(rows["dcount"] or 0)
    total_rows = int(rows["rows"] or 0)  # SUM over zero rows is NULL
    ok = total_count == total_rows and (
        expected_rows is None or total_rows == expected_rows
    )
    return {
        "rows_consumed": int(total_rows),
        "digest_total_count": int(total_count),
        "n_partial_digests": int(rows["groups"]),
        "consistent": bool(ok),
    }
