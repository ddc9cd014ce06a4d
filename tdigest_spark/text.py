"""Text-analysis operators for training-data pipelines.

Everything except winnowing stays JVM-side (split/regexp/broadcast-join
inside whole-stage codegen) — no per-row Python in the hot path:

* token counting      — whitespace and BPE-ish regex token counts
* quality scoring     — length / punctuation / word-shape metrics + filter
* language ID         — stopword broadcast-join voting + CJK char classes
* fingerprinting      — content hash (xxhash64) JVM-side; winnowing
                        (k-gram rolling hash, window minimum) as an
                        Arrow-batched pandas UDF
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, LongType

# ----------------------------------------------------------------------
# tokens
# ----------------------------------------------------------------------
_BPE_ISH = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def token_count(text: Column) -> Column:
    """Whitespace token count (0 for empty/blank strings)."""
    t = F.trim(text)
    return F.when(F.length(t) == 0, F.lit(0)).otherwise(F.size(F.split(t, r"\s+")))


def bpe_ish_token_count(text: Column) -> Column:
    """Count of BPE-ish units: letter runs, digit runs, single symbols."""
    return F.coalesce(F.regexp_count(text, F.lit(_BPE_ISH)), F.lit(0))


def tokens(text: Column) -> Column:
    return F.split(F.lower(F.trim(text)), r"\s+")


# ----------------------------------------------------------------------
# quality
# ----------------------------------------------------------------------
def quality_metrics(text: Column):
    """Struct of cheap quality signals (all JVM expressions)."""
    n_chars = F.length(text)
    n_words = token_count(text)
    n_punct = F.length(F.regexp_replace(text, r"[^.!?,;:]", ""))
    n_nonspace = F.length(F.regexp_replace(text, r"\s", ""))
    mean_word_len = F.when(n_words > 0, n_nonspace / n_words).otherwise(F.lit(0.0))
    punct_ratio = F.when(n_chars > 0, n_punct / n_chars).otherwise(F.lit(0.0))
    return F.struct(
        n_chars.alias("n_chars"),
        n_words.alias("n_words"),
        punct_ratio.alias("punct_ratio"),
        mean_word_len.alias("mean_word_len"),
    )


def quality_pass(
    text: Column,
    min_chars: int = 100,
    max_chars: int = 100_000,
    max_punct_ratio: float = 0.1,
    min_mean_word_len: float = 2.0,
    max_mean_word_len: float = 12.0,
) -> Column:
    """Gopher-style keep/drop filter from the metrics above."""
    m = quality_metrics(text)
    return (
        (m["n_chars"] >= min_chars)
        & (m["n_chars"] <= max_chars)
        & (m["punct_ratio"] <= max_punct_ratio)
        & (m["mean_word_len"] >= min_mean_word_len)
        & (m["mean_word_len"] <= max_mean_word_len)
    )


# ----------------------------------------------------------------------
# language identification
# ----------------------------------------------------------------------
_STOPWORDS = {
    "en": "the of and to in is you that it he was for on are as with his they at be this have from or one had by word but not what all were we when your can said there use an each which she do how their if",
    "de": "der die und in den von zu das mit sich des auf für ist im dem nicht ein eine als auch es an werden aus er hat dass sie nach wird bei einer um am sind noch wie einem über",
    "fr": "le de un être et à il avoir ne je son que se qui ce dans en du elle au pour pas vous par sur faire plus dire me on mon lui nous comme mais",
    "es": "de la que el en y a los del se las por un para con no una su al lo como más pero sus le ya o este sí porque esta entre cuando muy sin",
    "it": "di e il la che è per un in una sono mi si lo ma ho non con se come io questo qui hai del più al",
    "pt": "de a o que e do da em um para é com não uma os no se na por mais as dos como mas foi ao ele das tem à seu sua ou ser quando muito",
    "nl": "de het een van ik te dat die in en zij is niet op aan met als voor had er maar om hem dan zou of wat mijn men dit zo door over ze",
}


def _stopword_df(spark):
    rows = [
        (lang, tok) for lang, words in _STOPWORDS.items() for tok in words.split()
    ]
    return spark.createDataFrame(rows, ["__lang__", "__tok__"])


def lang_id(
    df: DataFrame, text_col: str, id_col: str, result_col: str = "lang_pred"
) -> DataFrame:
    """Heuristic language ID: explode tokens → broadcast-join a stopword
    table → vote per document; CJK script detection overrides (no
    whitespace-token stopwords in zh/ja).  Returns df + prediction
    column ('und' when no evidence).  All JVM-side."""
    spark = df.sparkSession
    toks = df.select(id_col, F.explode(tokens(F.col(text_col))).alias("__tok__"))
    votes = (
        toks.join(F.broadcast(_stopword_df(spark)), "__tok__")
        .groupBy(id_col, "__lang__")
        .agg(F.count("*").alias("__votes__"))
    )
    w = Window.partitionBy(id_col).orderBy(
        F.desc("__votes__"), F.asc("__lang__")
    )
    best = (
        votes.withColumn("__rn__", F.row_number().over(w))
        .filter(F.col("__rn__") == 1)
        .select(id_col, F.col("__lang__").alias("__best__"))
    )
    cjk = F.coalesce(
        F.regexp_count(F.col(text_col), F.lit(r"[一-鿿]")), F.lit(0)
    )
    return (
        df.join(best, id_col, "left")
        .withColumn(
            result_col,
            F.when(cjk * 2 > F.length(F.col(text_col)), F.lit("zh")).otherwise(
                F.coalesce(F.col("__best__"), F.lit("und"))
            ),
        )
        .drop("__best__")
    )


# ----------------------------------------------------------------------
# boilerplate line removal (C4-style line-level dedup)
# ----------------------------------------------------------------------
def line_doc_frequency(
    df: DataFrame, id_col: str, text_col: str, line_col: str = "line"
) -> DataFrame:
    """(line, n_docs): in how many distinct documents each non-blank
    line occurs — wordcount-shaped (explode → countDistinct), the
    measurement half of boilerplate removal."""
    lines = df.select(
        id_col, F.explode(F.split(F.col(text_col), "\n")).alias(line_col)
    )
    return (
        lines.filter(F.trim(F.col(line_col)) != "")
        .groupBy(line_col)
        .agg(F.countDistinct(id_col).alias("n_docs"))
    )


def strip_boilerplate(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_docs: int = 3,
    carry: tuple[str, ...] = (),
    result_col: str = "clean_text",
) -> DataFrame:
    """C4-style boilerplate removal: drop every line that appears in at
    least ``min_docs`` distinct documents (cookie banners, share
    buttons, nav text), reassembling the remaining lines in order.

    Plan shape: explode lines → count distinct docs per line (map-side
    combinable) → anti-join → ordered reassembly via array_sort over
    (pos, line) structs.  Two shuffles on line / id — the same shape at
    any corpus size; no Python in the pipeline.  Documents whose every
    line is boilerplate drop out of the result (nothing left to keep).
    Returns ``(id, *carry, n_lines_kept, clean_text)``."""
    cols = [id_col, *carry]
    lines = df.select(
        *cols, F.posexplode(F.split(F.col(text_col), "\n")).alias("pos", "__line__")
    )
    boiler = (
        lines.filter(F.trim("__line__") != "")
        .groupBy("__line__")
        .agg(F.countDistinct(id_col).alias("__nd__"))
        .filter(F.col("__nd__") >= min_docs)
        .select("__line__")
    )
    kept = lines.join(boiler, "__line__", "left_anti")
    return (
        kept.groupBy(*cols)
        .agg(
            F.array_sort(F.collect_list(F.struct("pos", "__line__"))).alias("__ps__"),
            F.count("*").alias("n_lines_kept"),
        )
        .select(
            *cols,
            "n_lines_kept",
            F.concat_ws(
                "\n", F.transform("__ps__", lambda s: s["__line__"])
            ).alias(result_col),
        )
    )


# ----------------------------------------------------------------------
# PII detection / scrubbing
# ----------------------------------------------------------------------
# Patterns restricted to syntax shared by Java regex (Spark) and RE2
# (DuckDB oracle): no backreferences, no lookaround.
_PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PII_PHONE = r"\+[0-9]{1,3}[ -][0-9]{3}[ -][0-9]{3}[ -][0-9]{4}"


def pii_count(text: Column) -> Column:
    """Number of PII matches (emails + international-format phone
    numbers) in a document.  Pure JVM ``regexp_count``."""
    return F.coalesce(F.regexp_count(text, F.lit(_PII_EMAIL)), F.lit(0)) + F.coalesce(
        F.regexp_count(text, F.lit(_PII_PHONE)), F.lit(0)
    )


def scrub_pii(
    text: Column, email_token: str = "[EMAIL]", phone_token: str = "[PHONE]"
) -> Column:
    """Replace every PII match with a redaction token (JVM
    ``regexp_replace`` replaces all occurrences)."""
    return F.regexp_replace(
        F.regexp_replace(text, _PII_EMAIL, email_token), _PII_PHONE, phone_token
    )


# ----------------------------------------------------------------------
# repetition (Gopher-style "fraction of tokens in the most common word")
# ----------------------------------------------------------------------
def word_repetition(
    df: DataFrame,
    id_col: str,
    text_col: str,
    carry: tuple[str, ...] = (),
    result_col: str = "top_token_frac",
) -> DataFrame:
    """Per-document repetition stats: ``(id, *carry, max_token_count,
    n_tokens, top_token_frac)``.  Wordcount-shaped plan — explode →
    two map-side-combinable groupBys — entirely JVM-side; blank
    documents are dropped (no tokens, frac undefined)."""
    cols = [id_col, *carry]
    toks = (
        df.filter(F.length(F.trim(F.col(text_col))) > 0)
        .select(*cols, F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("__tok__"))
    )
    per_tok = toks.groupBy(*cols, "__tok__").agg(F.count("*").alias("__c__"))
    per_doc = per_tok.groupBy(*cols).agg(
        F.max("__c__").alias("max_token_count"),
        F.sum("__c__").alias("n_tokens"),
    )
    return per_doc.withColumn(
        result_col, F.col("max_token_count") / F.col("n_tokens")
    )


# ----------------------------------------------------------------------
# fingerprinting
# ----------------------------------------------------------------------
def content_fingerprint(text: Column) -> Column:
    """64-bit whole-document fingerprint of whitespace-normalized,
    lowercased text (JVM xxhash64)."""
    normalized = F.lower(F.regexp_replace(F.trim(text), r"\s+", " "))
    return F.xxhash64(normalized)


def _winnow_one(text: str, k: int, window: int) -> list[int]:
    """Single-document winnowing (Schleimer et al. 2003): k-gram
    rolling polynomial hashes (kernel.hashing.kgram_poly_hashes — the
    core shared with MinHash shingling), keep the minimum of each
    sliding window, dedup consecutive.  Kept as the differential
    reference for ``_winnow_batch`` (the hot path)."""
    from tdigest_spark.kernel.hashing import kgram_poly_hashes

    data = np.frombuffer(text.lower().encode("utf-8"), dtype=np.uint8)
    hashes = kgram_poly_hashes(data, k)
    if hashes.size == 0:
        return []
    if hashes.size <= window:
        return [int(hashes.min().view(np.int64))]
    mins = np.lib.stride_tricks.sliding_window_view(hashes, window).min(axis=1)
    keep = np.concatenate(([True], np.diff(mins) != 0))
    return [int(v) for v in mins[keep].view(np.int64)]


_WINNOW_CHUNK_BYTES = 1 << 16  # concatenation block; 2^16 measured best
# (2^14: 2.27s, 2^16: 1.97s, 2^18: 2.38s, 2^20: 2.94s on 50k×1.1KB docs —
# small enough that the k+window passes stay cache-resident)


def _winnow_batch(
    bufs: list[np.ndarray | None], k: int, window: int
) -> list[list[int] | None]:
    """Winnowing for a whole Arrow batch, vectorized ACROSS documents
    (the ``_minhash_block`` pattern), processed in ~64 KB concatenated
    chunks: within a chunk there is ONE rolling-hash pass and ONE
    sliding-window-min over the chunk's concatenated bytes — the chunk
    bound keeps the k+window passes inside the CPU cache (a whole-batch
    concatenation streams the multi-hundred-MB accumulator from RAM on
    every pass and forfeits the win).  Windows that straddle document
    boundaries are masked out by offset arithmetic; per-document Python
    work shrinks to result slicing."""
    out: list = [None] * len(bufs)
    chunk: list[int] = []
    chunk_bytes = 0
    for i, b in enumerate(bufs):
        if b is None:
            continue
        chunk.append(i)
        chunk_bytes += b.size
        if chunk_bytes >= _WINNOW_CHUNK_BYTES:
            _winnow_chunk(bufs, chunk, k, window, out)
            chunk, chunk_bytes = [], 0
    if chunk:
        _winnow_chunk(bufs, chunk, k, window, out)
    return out


def _winnow_chunk(
    bufs: list, idxs: list[int], k: int, window: int, out: list
) -> None:
    """One cross-document winnowing pass over ``bufs[i] for idxs``
    (all non-None); results land in ``out[i]``."""
    from tdigest_spark.kernel.hashing import kgram_poly_hashes

    live = np.asarray(idxs, dtype=np.int64)
    lens = np.fromiter(
        (bufs[i].size for i in live), dtype=np.int64, count=live.size
    )
    cnts = np.maximum(lens - k + 1, 0)  # valid k-grams per doc
    for i in live[cnts == 0]:
        out[i] = []
    total = int(cnts.sum())
    if total == 0:
        return
    buf = np.concatenate([bufs[i] for i in live])
    hashes_full = kgram_poly_hashes(buf, k)  # includes cross-doc grams
    B = np.concatenate(([0], np.cumsum(lens)[:-1]))  # doc byte offsets
    C = np.concatenate(([0], np.cumsum(cnts)[:-1]))  # doc hash offsets
    # gather each doc's in-bounds grams out of the concatenated pass
    gather = (
        np.arange(total, dtype=np.int64) - np.repeat(C, cnts)
    ) + np.repeat(B, cnts)
    H = hashes_full[gather]

    nonempty = cnts > 0
    # per-doc global min in one reduceat (C[nonempty] tile H exactly)
    seg_min = np.minimum.reduceat(H, C[nonempty]).view(np.int64)
    small = nonempty & (cnts <= window)
    for i, v in zip(live[small], seg_min[cnts[nonempty] <= window]):
        out[i] = [int(v)]

    big = cnts > window
    if big.any():
        # iterated pairwise minimum (window passes over a contiguous
        # buffer) — no strided (n, window) reduction
        n_w = H.size - window + 1
        W = H[:n_w].copy()
        for j in range(1, window):
            np.minimum(W, H[j : j + n_w], out=W)
        Cb, cb = C[big], cnts[big]
        # valid-window mask: start s belongs to doc i iff
        # C_i <= s <= C_i + cnt_i - window (no boundary straddle)
        delta = np.zeros(W.size + 1, dtype=np.int8)
        delta[Cb] = 1
        delta[Cb + cb - window + 1] -= 1
        valid = np.cumsum(delta[:-1]) > 0
        first = np.zeros(W.size, dtype=bool)
        first[Cb] = True
        diff = np.empty(W.size, dtype=bool)
        diff[0] = True
        np.not_equal(W[1:], W[:-1], out=diff[1:])
        keep = valid & (first | diff)  # dedup consecutive, reset per doc
        counts_kept = np.add.reduceat(keep.astype(np.int64), Cb)
        parts = np.split(
            W[keep].view(np.int64), np.cumsum(counts_kept)[:-1]
        )
        for i, arr in zip(live[big], parts):
            out[i] = arr.tolist()


def winnow_fingerprints(text: Column, k: int = 8, window: int = 16) -> Column:
    """array<long> winnowing fingerprint of a document; identical
    documents share identical fingerprint arrays, near-identical
    documents share most elements.  Lowercasing happens JVM-side; the
    pandas UDF sees raw UTF-8 bytes and folds the whole Arrow batch in
    one vectorized pass (``_winnow_batch``)."""

    @pandas_udf(ArrayType(LongType()))
    def f(s: pd.Series) -> pd.Series:
        bufs = [
            None if b is None else np.frombuffer(b, dtype=np.uint8) for b in s
        ]
        return pd.Series(_winnow_batch(bufs, k, window), index=s.index)

    return f(F.encode(F.lower(text), "UTF-8"))
