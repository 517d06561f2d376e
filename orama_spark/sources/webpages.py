"""Synthetic Common-Crawl-style web-pages corpus + HTML extractor.

Input contract (BASELINE.json input_hint): a table with columns
``(url:string, warc_ts:timestamp, html:binary, text:string, lang:string)``.

Everything is generated deterministically from (seed, row id) using a
splitmix64 counter hash — no RNG state, so generation is embarrassingly
parallel and identical regardless of partitioning (the property that
matters on a 1000-executor cluster: re-running a lost task regenerates
byte-identical rows).

Invariant (pytest-gated): ``extract_text(render_html(text)) == text``
byte-for-byte per url; the extractor inverts the renderer exactly, which
mirrors the reference's "byte-identical extracted text per url" rule.

Term frequencies are Zipf-distributed to exercise posting-list skew
(stopword-like hot terms) at any scale.
"""

from __future__ import annotations

import math
from typing import Iterator

import numpy as np
import pandas as pd

MASK64 = (1 << 64) - 1


def splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer — a counter-based hash."""
    z = (x + np.uint64(0x9E3779B97F4A7C15)) & np.uint64(MASK64)
    z = ((z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)) & np.uint64(MASK64)
    z = ((z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)) & np.uint64(MASK64)
    return z ^ (z >> np.uint64(31))


def _hash_u01(key: np.ndarray) -> np.ndarray:
    """uint64 keys -> uniform floats in [0, 1)."""
    return (splitmix64(key) >> np.uint64(11)).astype(np.float64) / float(1 << 53)


# ------------------------------------------------------------------ vocab
# A mixed vocabulary: real English (exercises stemming + stopwords) plus
# generated CVC syllable words (long tail). Zipf-ranked.
_REAL_WORDS = (
    "the of and to in a is that it for on was with as are be this have from "
    "or by one had not but what all were when we there can an your which "
    "their said if do will each about how up out them then she many some so "
    "these would other into has more her two like him see time could no make "
    "than first been its who now people my made over did down only way find "
    "use may water long little very after words called just where most know "
    "search engine index query document token term rank score vector filter "
    "facet group sort page crawl web link text title body language english "
    "data table spark shuffle partition cluster executor driver memory disk "
    "join aggregate window stream batch merge compress encode decode block "
    "running jumped quickly beautiful national international generation "
    "optimization distributed computing science research analysis testing "
    "fox dog cat bird fish horse mouse house garden river mountain ocean "
    "quick brown lazy happy bright dark light heavy fast slow early late"
).split()

_CONSONANTS = "bcdfghjklmnpqrstvwz"
_VOWELS = "aeiou"


def build_vocab(size: int = 4000, seed: int = 42) -> list[str]:
    vocab = list(dict.fromkeys(_REAL_WORDS))
    ids = np.arange(len(vocab), size + len(vocab), dtype=np.uint64)
    h1 = splitmix64(ids + np.uint64(seed * 1315423911))
    h2 = splitmix64(h1)
    h3 = splitmix64(h2)
    seen = set(vocab)
    for a_, b_, c_ in zip(h1, h2, h3):
        a, b, c = int(a_), int(b_), int(c_)
        w = (
            _CONSONANTS[a % 19] + _VOWELS[(a >> 8) % 5]
            + _CONSONANTS[b % 19] + _VOWELS[(b >> 8) % 5]
            + _CONSONANTS[c % 19]
        )
        if (c >> 8) % 3 == 0:
            w += _VOWELS[(c >> 16) % 5] + _CONSONANTS[(c >> 24) % 19]
        if w not in seen:
            seen.add(w)
            vocab.append(w)
        if len(vocab) >= size:
            break
    return vocab


def zipf_cdf(n: int, s: float = 1.07) -> np.ndarray:
    w = 1.0 / np.power(np.arange(1, n + 1, dtype=np.float64), s)
    cdf = np.cumsum(w)
    return cdf / cdf[-1]


_LANGS = ["en", "en", "en", "en", "en", "en", "en", "en", "en", "de", "fr", "es"]


def html_escape(text: str) -> str:
    return text.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")


def html_unescape(text: str) -> str:
    return text.replace("&gt;", ">").replace("&lt;", "<").replace("&amp;", "&")


def render_html(text: str, title: str) -> bytes:
    return (
        "<html><head><title>"
        + html_escape(title)
        + "</title></head><body><p>"
        + html_escape(text)
        + "</p></body></html>"
    ).encode("utf-8")


def extract_text(html: bytes) -> str:
    """Inverse of render_html — byte-identical text per url (pytest gate)."""
    s = html.decode("utf-8")
    start = s.index("<body><p>") + len("<body><p>")
    end = s.rindex("</p></body>")
    return html_unescape(s[start:end])


class CorpusGenerator:
    """Deterministic per-id page generator (pure function of seed+id)."""

    def __init__(self, seed: int = 42, vocab_size: int = 4000,
                 min_words: int = 20, max_words: int = 180):
        self.seed = np.uint64(seed)
        self.vocab = np.array(build_vocab(vocab_size, seed), dtype=object)
        self.cdf = zipf_cdf(len(self.vocab))
        self.min_words = min_words
        self.max_words = max_words

    def page(self, doc_id: int) -> dict:
        rows = self.batch(np.array([doc_id], dtype=np.int64))
        return {k: v[0] for k, v in rows.items()}

    def batch(self, ids: np.ndarray) -> dict:
        """Vectorized generation for a batch of int64 row ids."""
        ids_u = ids.astype(np.uint64)
        base = splitmix64(ids_u * np.uint64(0x9E3779B97F4A7C15) + self.seed)
        n_words = (
            self.min_words
            + (splitmix64(base + np.uint64(1)) % np.uint64(self.max_words - self.min_words))
        ).astype(np.int64)
        lang_idx = (splitmix64(base + np.uint64(2)) % np.uint64(len(_LANGS))).astype(np.int64)
        langs = [_LANGS[i] for i in lang_idx]
        # timestamps in a fixed 2024 range, seconds resolution
        ts = 1704067200 + (splitmix64(base + np.uint64(3)) % np.uint64(31536000)).astype(np.int64)

        texts = []
        total = int(n_words.sum())
        # word choices: key = doc base hash + word position
        for i, (b, nw) in enumerate(zip(base, n_words)):
            keys = b + np.arange(100, 100 + nw, dtype=np.uint64)
            u = _hash_u01(keys)
            idx = np.searchsorted(self.cdf, u, side="right")
            texts.append(" ".join(self.vocab[idx]))
        urls = [
            f"https://example.org/{langs[i]}/{int(ids[i]):012d}"
            for i in range(len(ids))
        ]
        htmls = [
            render_html(texts[i], texts[i][:48])
            for i in range(len(ids))
        ]
        return {
            "url": urls,
            "warc_ts": pd.to_datetime(ts, unit="s"),
            "html": htmls,
            "text": texts,
            "lang": langs,
        }


def corpus_df(spark, n_rows: int, seed: int = 42, partitions: int | None = None):
    """Distributed deterministic corpus as a Spark DataFrame.

    ``spark.range`` + ``mapInPandas``: each task generates its id range
    with the counter-based hash, so output is identical under any
    partitioning / retry — the distributed-determinism property a
    100 TB ingest needs.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.types import (
        BinaryType, LongType, StringType, StructField, StructType, TimestampType,
    )

    schema = StructType(
        [
            StructField("doc_id", LongType(), False),
            StructField("url", StringType(), False),
            StructField("warc_ts", TimestampType(), False),
            StructField("html", BinaryType(), False),
            StructField("text", StringType(), False),
            StructField("lang", StringType(), False),
        ]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        g = CorpusGenerator(seed=seed)
        for pdf in batches:
            ids = pdf["id"].to_numpy(dtype=np.int64)
            cols = g.batch(ids)
            out = pd.DataFrame({"doc_id": ids, **cols})
            yield out

    parts = partitions or max(1, math.ceil(n_rows / 50_000))
    return spark.range(0, n_rows, numPartitions=parts).mapInPandas(gen, schema)
