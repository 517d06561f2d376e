"""Structured Streaming incremental ingestion: stream batches fold into
an index that is rank-identical with a one-shot batch build of the same
corpus (scores too — the maintenance recurrences telescope exactly)."""

import os

import pytest

from orama_spark.build.indexer import IndexBuilder
from orama_spark.config import IndexConfig
from orama_spark.query.engine import SearchIndex
from orama_spark.streaming.incremental import index_stream

SCHEMA = {"t": "string", "cat": "enum"}
ROWS = [
    {"docid": i, "t": txt, "cat": c}
    for i, (txt, c) in enumerate(
        [
            ("alpha beta gamma", "x"),
            ("alpha beta", "x"),
            ("alpha delta epsilon zeta", "y"),
            ("beta delta", "y"),
            ("alpha alpha omega", "z"),
            ("omega gamma beta", "z"),
        ]
    )
]


def test_stream_matches_batch_build(spark, tmp_path):
    cfg = IndexConfig(schema=SCHEMA)
    src = str(tmp_path / "src")
    # two source files = at least one bootstrap batch + appended data
    spark.createDataFrame(ROWS[:3]).coalesce(1).write.mode("overwrite").parquet(src)
    spark.createDataFrame(ROWS[3:]).coalesce(1).write.mode("append").parquet(src)

    stream_idx_dir = str(tmp_path / "stream_idx")
    index_stream(spark, src, stream_idx_dir, str(tmp_path / "ckpt"), cfg)

    batch_idx_dir = str(tmp_path / "batch_idx")
    IndexBuilder(cfg, postings_partitions=2).build(
        spark.createDataFrame(ROWS), batch_idx_dir, input_id="b"
    )

    s_idx = SearchIndex.load(spark, stream_idx_dir, cfg)
    b_idx = SearchIndex.load(spark, batch_idx_dir, cfg)
    for term in ["alpha", "beta delta", "omega"]:
        got = [(r["docid"], r["score"]) for r in s_idx.search(term=term).top_df().collect()]
        want = [(r["docid"], r["score"]) for r in b_idx.search(term=term).top_df().collect()]
        assert [g[0] for g in got] == [w[0] for w in want], term
        for (gi, gs), (wi, ws) in zip(got, want):
            assert gs == pytest.approx(ws, rel=1e-9)
    assert s_idx.stats["docs_count"] == len(ROWS)


def test_map_only_datapipe_ops_stream_equals_batch(spark, tmp_path):
    """The map-only datapipe operators (pii_stats, gopher_rules,
    repetition_stats) are stateless transforms, so they must run
    unchanged on a readStream source and produce exactly the batch
    result — the property that lets the same scrub/filter code serve
    both the backfill and the live ingest path."""
    from orama_spark.datapipe.pii import pii_stats
    from orama_spark.datapipe.text_quality import gopher_rules

    rows = [
        {"doc_id": 0, "text": "mail me at a@b.io or 10.1.2.3"},
        {"doc_id": 1, "text": "the quick brown fox " * 20},
        {"doc_id": 2, "text": ""},
    ]
    src = str(tmp_path / "src")
    spark.createDataFrame(rows).write.mode("overwrite").parquet(src)
    schema = spark.read.parquet(src).schema

    for op in (pii_stats, gopher_rules):
        stream_in = spark.readStream.schema(schema).parquet(src)
        out_dir = str(tmp_path / f"out_{op.__name__}")
        q = (
            op(stream_in)
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", str(tmp_path / f"ck_{op.__name__}"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = {
            tuple(r) for r in spark.read.parquet(out_dir).collect()
        }
        want = {tuple(r) for r in op(spark.createDataFrame(rows)).collect()}
        assert got == want, op.__name__
