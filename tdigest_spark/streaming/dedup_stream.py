"""Streaming exact dedup with bounded state.

Training-data ingestion streams re-crawl the same page repeatedly; the
streaming twin of ``dedup.exact_dedup`` drops a row when its dedup key
was already seen within the watermark horizon.  Built on Spark's
``dropDuplicatesWithinWatermark``: operator state holds one entry per
distinct key whose event time is still inside the horizon and is
evicted as the watermark advances — state is bounded by
(arrival rate × horizon), not by stream length, which is the only
shape that survives an unbounded 10^12-document crawl stream.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tdigest_spark.text import content_fingerprint


def streaming_exact_dedup(
    stream_df: DataFrame,
    ts_col: str,
    text_col: str | None = None,
    subset: Sequence[str] | None = None,
    watermark_delay: str = "2 hours",
    fp_col: str = "content_fp",
) -> DataFrame:
    """Drop duplicate rows within the watermark horizon.

    Exactly one of ``text_col``/``subset`` selects the dedup key:
    ``text_col`` keys on the 64-bit content fingerprint of
    whitespace/case-normalized text (``text.content_fingerprint``,
    JVM xxhash64 — the fingerprint column is kept in the output);
    ``subset`` keys on those columns directly.  The first arrival of a
    key is emitted, later arrivals inside the horizon are dropped;
    after the watermark passes ``event_ts + watermark_delay`` the key's
    state is evicted and a re-arrival would be treated as new — the
    standard bounded-state trade-off.
    """
    if (text_col is None) == (subset is None):
        raise ValueError("pass exactly one of text_col / subset")
    out = stream_df.withWatermark(ts_col, watermark_delay)
    if text_col is not None:
        out = out.withColumn(fp_col, content_fingerprint(F.col(text_col)))
        return out.dropDuplicatesWithinWatermark([fp_col])
    return out.dropDuplicatesWithinWatermark(list(subset))
