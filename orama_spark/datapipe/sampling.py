"""Deterministic sampling for training-data pipelines.

Random `df.sample()` is not reproducible across retries/partitionings;
pipelines that mix corpora need CONTENT-KEYED sampling: a row is in or
out as a pure function of its key, stable under re-runs, scale-out,
and incremental appends. The standard construction: portable hash of
the key -> bucket in [0, buckets) -> keep iff bucket < rate * buckets.

Uses the repo's portable codepoint FNV-1a (datapipe.portable_hash),
which has a bit-exact DuckDB SQL twin — so sampling decisions are
value-level verifiable in the driver gate. The hash runs in one Arrow
kernel; the filter is codegen. Map-only: no shuffle at any scale.

``stratified_sample`` applies a per-stratum rate (e.g. per source /
language quota — the mixing knob), implemented as the same kernel plus
a broadcast rate lookup: still map-only.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F

from .portable_hash import fnv1a64

BUCKETS = 1_000_000
_MASK64 = (1 << 64) - 1  # fnv1a64 returns signed int64; bucket on the
                         # UNSIGNED value so the DuckDB HUGEINT-mod
                         # oracle matches (2**64 % BUCKETS != 0)


def _bucket_kernel():
    from pyspark.sql.types import LongType

    @F.pandas_udf(LongType())
    def _bucket(keys: pd.Series) -> pd.Series:
        return keys.map(
            lambda k: (fnv1a64("" if k is None else str(k)) & _MASK64) % BUCKETS
        )

    return _bucket


def with_sample_bucket(
    docs: DataFrame, key_col: str = "doc_id", out_col: str = "sample_bucket"
) -> DataFrame:
    """Append the deterministic [0, BUCKETS) bucket of the row key."""
    return docs.withColumn(
        out_col, _bucket_kernel()(F.col(key_col).cast("string"))
    )


def hash_sample(
    docs: DataFrame, rate: float, key_col: str = "doc_id"
) -> DataFrame:
    """Keep a deterministic ``rate`` fraction of rows by key hash."""
    cut = int(rate * BUCKETS)
    return (
        with_sample_bucket(docs, key_col)
        .where(F.col("sample_bucket") < cut)
        .drop("sample_bucket")
    )


def stratified_sample(
    docs: DataFrame,
    rates: dict[str, float],
    strata_col: str,
    key_col: str = "doc_id",
    default_rate: float = 0.0,
) -> DataFrame:
    """Per-stratum deterministic sampling (corpus-mixing quotas):
    keep iff bucket(key) < rate[stratum] * BUCKETS. The rate lookup is
    a literal CASE (codegen); unknown strata get ``default_rate``."""
    cut: Column = F.lit(int(default_rate * BUCKETS))
    for value, rate in sorted(rates.items()):
        cut = F.when(
            F.col(strata_col) == value, F.lit(int(rate * BUCKETS))
        ).otherwise(cut)
    return (
        with_sample_bucket(docs, key_col)
        .where(F.col("sample_bucket") < cut)
        .drop("sample_bucket")
    )
