"""URL operators for web-corpus pipelines: normalization, dedup-by-
canonical-url, per-domain stats.

Every large crawl pipeline dedups by canonical URL before content dedup
(the same page is fetched under case-variant hosts, default ports,
tracking params, fragments). Normalization follows the standard
canonicalization subset (WHATWG-style, documented):

  * scheme and host lowercased
  * default ports stripped (http:80, https:443)
  * fragment dropped
  * tracking params dropped (utm_*, gclid, fbclid, msclkid), other
    params kept IN ORDER
  * empty query -> no '?'
  * path preserved byte-for-byte ('' stays '', no trailing-slash edits)

The normalizer is an Arrow kernel over ``urllib.parse`` (string
surgery in pure Column expressions can't express param filtering
without lookbehind, which RE2 lacks); it is a pure map — no shuffle.
``url_dedup`` adds the one hash-groupBy shuffle; ``domain_stats`` is a
pure-Column host extraction (codegen) + partial-agg groupBy.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F

_TRACKING_PREFIXES = ("utm_",)
_TRACKING_EXACT = frozenset(["gclid", "fbclid", "msclkid"])


def normalize_url(url: str) -> str:
    """Pure-Python canonicalizer (shared by the Spark kernel, tests,
    and oracles)."""
    from urllib.parse import urlsplit, urlunsplit

    if not url:
        return ""
    try:
        parts = urlsplit(url.strip())
    except ValueError:
        return url.strip()
    scheme = parts.scheme.lower()
    host = (parts.hostname or "").lower()
    port = parts.port
    if port is not None and not (
        (scheme == "http" and port == 80) or (scheme == "https" and port == 443)
    ):
        host = f"{host}:{port}"
    userinfo = ""
    if parts.username:
        userinfo = parts.username
        if parts.password:
            userinfo += f":{parts.password}"
        userinfo += "@"
    kept = []
    for pair in parts.query.split("&") if parts.query else []:
        key = pair.split("=", 1)[0]
        kl = key.lower()
        if kl in _TRACKING_EXACT or any(
            kl.startswith(p) for p in _TRACKING_PREFIXES
        ):
            continue
        kept.append(pair)
    return urlunsplit(
        (scheme, userinfo + host, parts.path, "&".join(kept), "")
    )


def _normalize_kernel():
    from pyspark.sql.types import StringType

    @F.pandas_udf(StringType())
    def _norm(urls: pd.Series) -> pd.Series:
        return urls.map(lambda u: normalize_url(u) if u is not None else None)

    return _norm


def normalize_urls(
    docs: DataFrame, url_col: str = "url", out_col: str = "url_norm"
) -> DataFrame:
    """Append the canonical-url column (map-only Arrow kernel)."""
    return docs.withColumn(out_col, _normalize_kernel()(F.col(url_col)))


def url_dedup(
    docs: DataFrame, url_col: str = "url", id_col: str = "doc_id"
) -> DataFrame:
    """Groups of documents sharing a canonical URL: one partial-agg
    shuffle on the normalized url — uniform keys, no join."""
    n = normalize_urls(docs.select(id_col, url_col), url_col)
    return (
        n.groupBy(F.col("url_norm"))
        .agg(
            F.count("*").alias("dup_count"),
            F.min(id_col).alias("keep_doc_id"),
        )
        .where(F.col("dup_count") > 1)
    )


def host_col(url: Column) -> Column:
    """Lowercased host from a URL — pure Column regex (whole-stage
    codegen; the same RE2-compatible pattern works in the oracle)."""
    return F.lower(F.regexp_extract(url, r"^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/?#@]*@)?([^/?#:]*)", 1))


def domain_stats(docs: DataFrame, url_col: str = "url") -> DataFrame:
    """Docs per host — pure-Column extraction + partial-agg groupBy
    (the crawl-pipeline per-site histogram)."""
    return (
        docs.select(host_col(F.col(url_col)).alias("host"))
        .where(F.length("host") > 0)
        .groupBy("host")
        .agg(F.count("*").alias("n_docs"))
    )


def filter_blocked_hosts(
    docs: DataFrame, blocklist: DataFrame, url_col: str = "url"
) -> DataFrame:
    """Drop documents whose URL host is on a blocklist — the standard
    crawl-hygiene stage. The blocklist (thousands-to-millions of hosts)
    is tiny next to the corpus, so this is an explicit BROADCAST
    left-anti join: the doc side never shuffles, the filter runs
    map-side in every scan task (plan asserted in tests). ``blocklist``
    must have a ``host`` column (lowercase)."""
    hosts = blocklist.select(F.lower(F.col("host")).alias("host")).distinct()
    return docs.join(
        F.broadcast(hosts),
        host_col(F.col(url_col)) == F.col("host"),
        "left_anti",
    )
