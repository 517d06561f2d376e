"""Streaming analytics over document/event streams (SURVEY §2.12 —
Spark-native extension; the reference is batch-only).

Three patterns a web-scale ingest pipeline needs, each late-data-safe:

  * windowed term counts   — watermark + tumbling-window aggregation
                             (state evicted once the watermark passes)
  * streaming exact dedup  — dropDuplicatesWithinWatermark on the
                             canonical text hash: bounded state, the
                             streaming twin of datapipe.exact_duplicates
  * running term df        — applyInPandasWithState: cumulative
                             document frequency per term as a custom
                             stateful operator (the surface for any
                             accumulating sketch: HLL, CMS, ...)

All three consume a stream with (doc_id, text, event_ts) — the shape
`readStream` yields from a documents table/queue — and emit append/
update streams suitable for `writeStream` into parquet/Iceberg.
"""

from __future__ import annotations

from typing import Iterable

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import StructType

from ..build.tokenize import tokens_udf
from ..config import IndexConfig
from ..datapipe.dedup import canonical_text


def windowed_term_counts(
    stream_df: DataFrame,
    config: IndexConfig,
    text_col: str = "text",
    ts_col: str = "event_ts",
    window: str = "10 minutes",
    watermark: str = "5 minutes",
) -> DataFrame:
    """(window, term, n_docs) per tumbling window, tolerant of events up
    to ``watermark`` late; aggregation state is evicted past the
    watermark (bounded state at any stream length)."""
    toks = tokens_udf(config.tokenizer, text_col)(F.col(text_col).cast("string"))
    return (
        stream_df.withWatermark(ts_col, watermark)
        .select(F.col(ts_col), F.explode(toks).alias("term"))
        .groupBy(F.window(ts_col, window).alias("window"), "term")
        .agg(F.count("*").alias("n_docs"))
    )


def streaming_exact_dedup(
    stream_df: DataFrame,
    text_col: str = "text",
    ts_col: str = "event_ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """First occurrence of each canonical text within the watermark
    horizon — the streaming twin of exact dedup. State (one hash per
    distinct text) is dropped once older than the watermark, so a
    10^12-doc stream never accumulates unbounded dedup state (the batch
    job handles cross-horizon duplicates during compaction)."""
    hashed = stream_df.withColumn(
        "__text_hash", F.md5(canonical_text(F.col(text_col)))
    ).withWatermark(ts_col, watermark)
    return hashed.dropDuplicatesWithinWatermark(["__text_hash"]).drop("__text_hash")


_DF_STATE_SCHEMA = StructType.fromJson(
    {"type": "struct", "fields": [
        {"name": "df", "type": "long", "nullable": False, "metadata": {}}
    ]}
)
_DF_OUT_SCHEMA = "term string, df long"


def _df_update(key, pdfs: Iterable[pd.DataFrame], state: GroupState):
    """Cumulative document frequency for one term (custom stateful op)."""
    n = 0
    for pdf in pdfs:
        n += len(pdf)
    (prev,) = state.get if state.exists else (0,)
    total = prev + n
    state.update((total,))
    yield pd.DataFrame({"term": [key[0]], "df": [total]})


def running_term_df(
    stream_df: DataFrame,
    config: IndexConfig,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(term, df) UPDATE stream: cumulative number of (doc, term)
    insertions per term across the whole stream — the
    applyInPandasWithState surface for accumulating per-key statistics
    (swap the state/update fn for HLL or count-min sketches). Emits one
    row per term per micro-batch the term appears in."""
    toks = tokens_udf(config.tokenizer, text_col)(F.col(text_col).cast("string"))
    pairs = stream_df.select(
        F.col(id_col).alias("docid"), F.explode(toks).alias("term")
    )
    return pairs.groupBy("term").applyInPandasWithState(
        _df_update,
        outputStructType=_DF_OUT_SCHEMA,
        stateStructType=_DF_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
