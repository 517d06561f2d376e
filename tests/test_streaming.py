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
