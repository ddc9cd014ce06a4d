"""Deterministic Common-Crawl-style web-page generator + text extractor.

Schema (BASELINE.json input_hint): ``url string, warc_ts timestamp,
html binary, text string, lang string``.

Guarantees:
* fully deterministic per url id — the same id yields byte-identical
  html/text on any executor, partitioning, or run (seeded splitmix64
  chains, no wall-clock, no Python ``hash``)
* per-url invariant: ``extract_text(html) == text`` byte-identically —
  the html is markup wrapped around the text, and the extractor strips
  it back out; tested as the reference-parity invariant
* ``lang`` is drawn from a skewed distribution (en ≈ 55 %) so grouped
  aggregations exercise hot-key/salting paths

Generation is distributed: ``spark.range(n)`` → ``mapInPandas``; no
driver-side materialization, so the generator scales to any row count
the cluster can hold.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from tdigest_spark.kernel.hashing import splitmix64

_VOCAB = np.array(
    (
        "the of and to a in is it you that he was for on are with as his they be "
        "at one have this from or had by word but not what all were we when your "
        "can said there use an each which she do how their if will up other about "
        "out many then them these so some her would make like him into time has "
        "look two more write go see number no way could people my than first water "
        "been call who oil its now find long down day did get come made may part "
        "data spark table query column row batch merge hash join filter group "
        "window order value index scan shuffle partition cluster node executor"
    ).split()
)
_LANGS = np.array(["en", "zh", "es", "de", "fr", "ru", "pt", "ja", "it", "nl"])
_LANG_CDF = np.cumsum(
    np.array([0.55, 0.12, 0.08, 0.06, 0.05, 0.04, 0.04, 0.03, 0.02, 0.01])
)
_TLDS = np.array(["com", "org", "net", "io", "edu", "gov", "co", "info"])
_EPOCH_2024 = 1_704_067_200  # 2024-01-01T00:00:00Z

PAGES_SCHEMA = StructType(
    [
        StructField("url", StringType(), False),
        StructField("warc_ts", TimestampType(), False),
        StructField("html", BinaryType(), False),
        StructField("text", StringType(), False),
        StructField("lang", StringType(), False),
    ]
)


def _rand_stream(ids: np.ndarray, salt: int) -> np.ndarray:
    """Deterministic uniform [0,1) per id for a given salt."""
    with np.errstate(over="ignore"):
        h = splitmix64(ids.view(np.uint64) + np.uint64(salt) * np.uint64(0x9E3779B9))
    return (h >> np.uint64(11)).astype(np.float64) / float(1 << 53)


def _make_batch(ids: np.ndarray) -> pd.DataFrame:
    n = ids.size
    u_lang = _rand_stream(ids, 1)
    lang = _LANGS[np.searchsorted(_LANG_CDF, u_lang, side="right").clip(0, 9)]

    # document length: log-normal-ish heavy tail, 20..~2000 words
    u_len = _rand_stream(ids, 2)
    n_words = (20 + np.floor(np.exp(u_len * 4.2) * 8)).astype(np.int64)

    # word indices: one flat hash stream, reshaped per doc
    doc_of = np.repeat(np.arange(n), n_words)
    pos = np.concatenate([np.arange(k) for k in n_words])
    with np.errstate(over="ignore"):
        widx = splitmix64(
            ids.view(np.uint64)[doc_of] * np.uint64(1_000_003) + pos.view(np.uint64)
        ) % np.uint64(_VOCAB.size)
    words = _VOCAB[widx.astype(np.int64)]

    texts = []
    start = 0
    for k in n_words:
        texts.append(" ".join(words[start : start + k]))
        start += k

    hosts = splitmix64(ids.view(np.uint64) + np.uint64(7)) % np.uint64(100_000)
    tlds = _TLDS[
        (splitmix64(ids.view(np.uint64) + np.uint64(11)) % np.uint64(8)).astype(int)
    ]
    urls = [
        f"https://site{h}.{t}/page/{i}"
        for h, t, i in zip(hosts.astype(int), tlds, ids)
    ]
    ts = pd.to_datetime(
        _EPOCH_2024 + (splitmix64(ids.view(np.uint64) + np.uint64(13)) % np.uint64(31_536_000)).astype(np.int64),
        unit="s",
    )
    htmls = [
        render_html(u, t, lg) for u, t, lg in zip(urls, texts, lang)
    ]
    return pd.DataFrame(
        {"url": urls, "warc_ts": ts, "html": htmls, "text": texts, "lang": lang}
    )


def render_html(url: str, text: str, lang: str) -> bytes:
    """Wrap the text in deterministic markup. ``extract_text`` inverts
    this exactly (the per-url byte-identity invariant)."""
    title = text[:40]
    body = text.replace(". ", ".</p>\n<p>")
    return (
        f'<html lang="{lang}"><head><meta charset="utf-8">'
        f'<title>{title}</title><link rel="canonical" href="{url}"></head>\n'
        f"<body>\n<p>{body}</p>\n</body></html>"
    ).encode("utf-8")


_TAG_RE = re.compile(rb"<[^>]*>")
_HEAD_RE = re.compile(rb"<head>.*?</head>", re.DOTALL)


def extract_text(html: bytes) -> str:
    """Byte-deterministic text extraction: drop <head>, strip tags,
    normalize the paragraph breaks render_html introduced."""
    body = _HEAD_RE.sub(b"", html)
    no_tags = _TAG_RE.sub(b"", body)
    return no_tags.replace(b".\n", b". ").strip().decode("utf-8")


def generate_pages(
    spark: SparkSession, n_rows: int, partitions: int | None = None
) -> DataFrame:
    """Distributed deterministic pages table."""
    base = spark.range(0, n_rows, numPartitions=partitions)

    def gen(batches):
        for pdf in batches:
            yield _make_batch(pdf["id"].to_numpy(dtype=np.int64))

    return base.mapInPandas(gen, PAGES_SCHEMA)


def extract_text_col(html_col) -> "F.Column":
    """extract_text as an Arrow-batched column function (for re-deriving
    text from stored html and asserting the invariant at scale)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(StringType())
    def f(s: pd.Series) -> pd.Series:
        return s.map(lambda b: None if b is None else extract_text(bytes(b)))

    return f(html_col)


def write_pages(
    spark: SparkSession,
    path: str,
    n_rows: int,
    partitions: int | None = None,
    partition_by: str | None = "lang",
    table_format: str = "parquet",
) -> None:
    """Materialize the pages table (partitioned parquet; 'iceberg' is
    accepted when an Iceberg catalog is configured on the session)."""
    df = generate_pages(spark, n_rows, partitions)
    writer = df.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(partition_by)
    if table_format == "iceberg":
        try:
            writer.format("iceberg").save(path)
            return
        except Exception as exc:  # noqa: BLE001
            raise RuntimeError(
                "iceberg runtime jar not on the classpath; use "
                "table_format='parquet' (same layout, partitioned by lang)"
            ) from exc
    writer.parquet(path)
