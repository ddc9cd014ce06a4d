"""URL normalization + dedup for web-crawl pipelines.

Common-Crawl-style corpora key documents by URL; harvest variants of
the same page (scheme/host case, ``www.`` prefix, default ports,
trailing slashes, query-parameter order, fragments) must collapse to
one canonical key before document-level dedup.  Everything here is
pure Catalyst expressions (regexp + array ops inside whole-stage
codegen) — no Python in the hot path, so the normalizer runs at scan
throughput on a 10^12-row url column.

Normalization rules (superset of RFC 3986 §6.2 syntax-based
normalization; percent-decoding is deliberately NOT applied so the
transform never conflates %2F with '/'):

* scheme and host lowercased; leading ``www.`` stripped
* default ports dropped (``:80`` for http, ``:443`` for https)
* fragment dropped (stripped before query extraction — '?' is legal
  inside a fragment)
* empty path normalized to ``/`` (RFC 3986 §6.2.3), then the trailing
  ``/`` of any non-root path dropped (``/a/`` == ``/a``)
* query parameters sorted bytewise; empty query dropped
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.-]*)://"
_AUTHORITY_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)"
_PATH_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)"


def normalize_url(url: Column) -> Column:
    """Canonical form of an absolute http(s) URL (see module rules).

    URLs without a ``scheme://`` prefix pass through trimmed-only, so
    the column is total (never NULL for non-NULL input)."""
    u = F.trim(url)
    # strip the fragment FIRST: '?' is legal inside a fragment
    # (RFC 3986 §3.5), so query extraction must only see the pre-'#'
    # part or '#sec?x=1' would fabricate a query
    pre = F.regexp_extract(u, r"^([^#]*)", 1)
    scheme = F.lower(F.regexp_extract(pre, _SCHEME_RE, 1))
    host = F.lower(F.regexp_extract(pre, _AUTHORITY_RE, 1))
    # strip ALL leading www. prefixes in one pass so the normalizer is
    # idempotent — re-normalizing a stored canonical key must be a
    # no-op, and one-at-a-time stripping would move 'www.www.x.com'
    # on every application
    host = F.regexp_replace(host, r"^(www\.)+", "")
    host = F.when(scheme == "http", F.regexp_replace(host, r":80$", "")).otherwise(
        F.when(scheme == "https", F.regexp_replace(host, r":443$", "")).otherwise(host)
    )
    path = F.regexp_extract(pre, _PATH_RE, 1)
    # empty path ≡ '/' for http(s) (RFC 3986 §6.2.3) — normalize to '/'
    # so 'https://a.com' and 'https://a.com/' share one key, then strip
    # the trailing slash of any non-root path
    path = F.when(path == "", F.lit("/")).otherwise(path)
    path = F.when(path != "/", F.regexp_replace(path, r"/$", "")).otherwise(path)
    query = F.regexp_extract(pre, r"\?([^#]*)", 1)
    query = F.array_join(F.array_sort(F.split(query, "&")), "&")
    canonical = F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(query != "", F.concat(F.lit("?"), query)).otherwise(F.lit("")),
    )
    return F.when(scheme == "", u).otherwise(canonical)


def url_dedup(
    df: DataFrame,
    url_col: str,
    id_col: str,
    canon_col: str = "canonical_url",
    keep_col: str = "keep_id",
) -> DataFrame:
    """One row per canonical URL: ``(canonical_url, keep_id, n_variants)``
    where ``keep_id`` is the smallest id in the cluster.  Same
    min-per-key + groupBy shape as ``dedup.exact_dedup`` — map-side
    combinable, no per-group arrays, scales to 10^12 urls."""
    canon = df.select(
        F.col(id_col), normalize_url(F.col(url_col)).alias(canon_col)
    )
    return canon.groupBy(canon_col).agg(
        F.min(id_col).alias(keep_col), F.count("*").alias("n_variants")
    )
