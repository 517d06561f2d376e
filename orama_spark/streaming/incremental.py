"""Structured Streaming incremental index ingestion.

The reference has NO streaming surface (strictly synchronous batch per
call — SURVEY.md §2.12); this is the Spark-native extension of its
``insertMultiple`` batch loop (methods/insert.ts:269-392): a stream of
document batches folds into the same durable index tables through the
incremental-maintenance path, with exactly-once bookkeeping delegated to
the streaming checkpoint + the builder's idempotent manifest stages.

Pattern: readStream -> foreachBatch(fold_batch). The first micro-batch
bootstraps a full build; subsequent batches append via
insert_documents() (tombstone/delta mechanics, no rewrite of existing
postings). At scale the micro-batch cadence amortizes the per-batch
dictionary/stats updates; compact() runs on whatever maintenance window
the deployment chooses.
"""

from __future__ import annotations

import os
from typing import Optional

from pyspark.sql import DataFrame, SparkSession

from ..build.indexer import IndexBuilder
from ..build.maintenance import insert_documents
from ..config import IndexConfig


class StreamingIndexWriter:
    """foreachBatch sink folding document micro-batches into an index."""

    def __init__(self, config: IndexConfig, index_dir: str,
                 postings_partitions: Optional[int] = None):
        self.config = config
        self.index_dir = index_dir
        self.postings_partitions = postings_partitions

    def _bootstrapped(self) -> bool:
        return os.path.exists(os.path.join(self.index_dir, "stats.json"))

    def fold_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        if not self._bootstrapped():
            IndexBuilder(
                self.config, postings_partitions=self.postings_partitions
            ).build(batch_df, self.index_dir, input_id=f"stream-batch-{batch_id}")
        else:
            insert_documents(
                batch_df.sparkSession, self.index_dir, self.config, batch_df
            )

    def start(self, stream_df: DataFrame, checkpoint_dir: str,
              trigger_available_now: bool = True):
        """Attach to a streaming DataFrame; returns the StreamingQuery."""
        writer = stream_df.writeStream.foreachBatch(self.fold_batch).option(
            "checkpointLocation", checkpoint_dir
        )
        if trigger_available_now:
            writer = writer.trigger(availableNow=True)
        return writer.start()


def index_stream(
    spark: SparkSession,
    source_dir: str,
    index_dir: str,
    checkpoint_dir: str,
    config: IndexConfig,
    schema=None,
):
    """Convenience: file-source stream of parquet document batches ->
    incremental index. Blocks until the available data is folded."""
    reader = spark.readStream
    if schema is not None:
        reader = reader.schema(schema)
    else:
        static = spark.read.parquet(source_dir)
        reader = reader.schema(static.schema)
    stream = reader.parquet(source_dir)
    q = StreamingIndexWriter(config, index_dir).start(stream, checkpoint_dir)
    q.awaitTermination()
    return q
