"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query (per-language p95 of document length,
the Spark twin of the reference README's grouped-percentile experiment)
on sf0.001.  ``queries()``/``oracle_sql()`` — one entry per implemented
operator from SURVEY.md §2; oracles are exact DuckDB SQL (approximate
estimates are bound-checked inside the Spark query, reference-style).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from tdigest_spark.suite import q_tdigest_docs_p95

    return q_tdigest_docs_p95(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from tdigest_spark.suite import all_queries

    return all_queries()


def oracle_sql() -> dict[str, str]:
    from tdigest_spark.suite import all_oracles

    return all_oracles()
