"""Text-analysis operators: token counts, quality scoring, language ID,
document fingerprinting (winnowing). All pure Column expressions —
whole-stage-codegen JVM math, no UDFs — so they pipeline into any scan.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F

from ..kernel.stopwords_en import STOPWORDS_EN

# small frozen subsets usable as literal arrays in expressions
_EN_TOP_STOPWORDS = [
    "the", "of", "and", "to", "in", "a", "is", "that", "it", "for", "on",
    "was", "with", "as", "are", "be", "this", "have", "from", "or", "by",
]


def ws_tokens(col: Column) -> Column:
    """Whitespace tokens of trimmed text (empty text -> empty array)."""
    t = F.regexp_replace(F.trim(col), r"\s+", " ")
    return F.when(F.length(t) == 0, F.array().cast("array<string>")).otherwise(
        F.split(t, " ")
    )


def token_stats(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(id, n_tokens, n_unique_tokens, mean_token_len, max_token_len)."""
    toks = ws_tokens(F.col(text_col))
    return docs.select(
        F.col(id_col).alias("id"),
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_unique_tokens"),
        F.round(
            F.aggregate(toks, F.lit(0).cast("long"), lambda a, x: a + F.length(x))
            .cast("double")
            / F.greatest(F.size(toks), F.lit(1)),
            4,
        ).alias("mean_token_len"),
        F.aggregate(toks, F.lit(0), lambda a, x: F.greatest(a, F.length(x))).alias(
            "max_token_len"
        ),
    )


def quality_features(col: Column) -> dict[str, Column]:
    """Deterministic quality signals on a text column (C4/Gopher-style):
    length, word stats, stopword ratio, punctuation/digit/uppercase
    ratios, type-token ratio."""
    toks = ws_tokens(col)
    n_tok = F.size(toks)
    n_chars = F.length(col)
    stop_lit = F.array(*[F.lit(w) for w in _EN_TOP_STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda x: F.array_contains(stop_lit, F.lower(x))))
    n_punct = n_chars - F.length(F.regexp_replace(col, r"[^\w\s]", ""))
    n_digit = n_chars - F.length(F.regexp_replace(col, r"[0-9]", ""))
    n_upper = n_chars - F.length(F.regexp_replace(col, r"[A-Z]", ""))
    safe_tok = F.greatest(n_tok, F.lit(1)).cast("double")
    safe_chars = F.greatest(n_chars, F.lit(1)).cast("double")
    return {
        "n_chars": n_chars.cast("long"),
        "n_tokens": n_tok.cast("long"),
        "stopword_ratio": n_stop / safe_tok,
        "punct_ratio": n_punct / safe_chars,
        "digit_ratio": n_digit / safe_chars,
        "upper_ratio": n_upper / safe_chars,
        "type_token_ratio": F.size(F.array_distinct(toks)) / safe_tok,
        "mean_word_len": (n_chars - (n_tok - 1)) / safe_tok,
    }


def quality_score(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(id, quality plus the underlying features). quality in [0,1]:
    a fixed, documented linear blend — deterministic and SQL-replicable."""
    f = quality_features(F.col(text_col))
    length_ok = F.when((f["n_tokens"] >= 10) & (f["n_tokens"] <= 100000), 1.0).otherwise(0.0)
    word_len_ok = F.when((f["mean_word_len"] >= 3) & (f["mean_word_len"] <= 12), 1.0).otherwise(0.0)
    stop_ok = F.when(f["stopword_ratio"] >= 0.05, 1.0).otherwise(0.0)
    not_noisy = F.greatest(F.lit(0.0), F.lit(1.0) - 2.0 * f["punct_ratio"] - 2.0 * f["digit_ratio"])
    quality = F.round(
        0.3 * length_ok + 0.2 * word_len_ok + 0.2 * stop_ok + 0.3 * not_noisy, 6
    )
    return docs.select(
        F.col(id_col).alias("id"),
        quality.alias("quality"),
        f["n_tokens"].alias("n_tokens"),
        F.round(f["stopword_ratio"], 6).alias("stopword_ratio"),
        F.round(f["type_token_ratio"], 6).alias("type_token_ratio"),
        F.round(f["mean_word_len"], 6).alias("mean_word_len"),
    )


# tiny per-language marker lexicons for the heuristic language ID
_LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is", "in", "that", "it", "was", "for"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "auf", "zu"],
    "fr": ["le", "la", "les", "et", "est", "dans", "pour", "que", "une", "des"],
    "es": ["el", "la", "los", "las", "es", "en", "que", "por", "con", "una"],
    "it": ["il", "la", "che", "di", "è", "per", "con", "non", "una", "sono"],
}


def lang_id(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(id, lang_pred, lang_conf): marker-word hit-rate argmax — the
    classic cheap n-gram/stopword heuristic, pure expressions. Returns
    'und' (undetermined) when no marker hits."""
    toks = F.transform(ws_tokens(F.col(text_col)), F.lower)
    n = F.greatest(F.size(toks), F.lit(1)).cast("double")
    rates = []
    for lang, markers in _LANG_MARKERS.items():
        lit = F.array(*[F.lit(m) for m in markers])
        rate = F.size(F.filter(toks, lambda x: F.array_contains(lit, x))) / n
        rates.append(F.struct(rate.alias("rate"), F.lit(lang).alias("lang")))
    best = F.array_max(F.array(*rates))
    return docs.select(
        F.col(id_col).alias("id"),
        F.when(best["rate"] > 0, best["lang"]).otherwise(F.lit("und")).alias("lang_pred"),
        F.round(best["rate"], 6).alias("lang_conf"),
    )


def winnowing_fingerprints(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    window: int = 4,
) -> DataFrame:
    """(id, fingerprints: sorted distinct array<bigint>) — winnowing
    (Schleimer et al., SIGMOD'03): k-gram hashes; keep the min hash of
    every ``window`` consecutive hashes. Pure expressions: transform to
    k-gram hashes, then transform over window starts + array_min."""
    from pyspark.sql.types import ArrayType, LongType

    t = F.regexp_replace(F.trim(F.col(text_col)), r"\s+", " ")
    n_grams = F.length(t) - F.lit(k - 1)
    hashes = F.when(
        n_grams >= 1,
        F.transform(
            F.sequence(F.lit(1), n_grams), lambda i: F.xxhash64(t.substr(i, F.lit(k)))
        ),
    ).otherwise(F.array().cast("array<bigint>"))

    # sliding-window minimum as ONE Arrow kernel (numpy stride trick):
    # per-window slice+array_min higher-order expressions hit the codegen
    # fallback and evaluate interpreted, ~100x slower
    @F.pandas_udf(ArrayType(LongType()))
    def _winnow(hs: pd.Series) -> pd.Series:
        import numpy as np

        def one(arr):
            if arr is None or len(arr) < window:
                return []
            x = np.asarray(arr, dtype=np.int64)
            sw = np.lib.stride_tricks.sliding_window_view(x, window)
            return np.unique(sw.min(axis=1)).tolist()  # sorted distinct

        return hs.map(one)

    return docs.select(F.col(id_col).alias("id"), _winnow(hashes).alias("fingerprints"))
