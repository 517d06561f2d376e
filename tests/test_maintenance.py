"""Incremental maintenance parity: remove/insert/update on the Spark
index vs the Python oracle (the oracle ports Orama's removal recurrence
exactly), plus tombstone-compose and compaction invariants."""

import pytest

from orama_spark.build.indexer import IndexBuilder
from orama_spark.build.maintenance import (
    compact,
    insert_documents,
    remove_documents,
    update_documents,
)
from orama_spark.config import IndexConfig
from orama_spark.oracle.engine import OramaOracle
from orama_spark.query.engine import SearchIndex

SCHEMA = {"t": "string", "cat": "enum"}
ROWS = [
    {"docid": 1, "t": "alpha beta gamma", "cat": "x"},
    {"docid": 2, "t": "alpha beta", "cat": "x"},
    {"docid": 3, "t": "alpha delta epsilon zeta", "cat": "y"},
    {"docid": 4, "t": "beta delta", "cat": "y"},
    {"docid": 5, "t": "alpha alpha omega", "cat": "z"},
]


def build(spark, out):
    cfg = IndexConfig(schema=SCHEMA)
    df = spark.createDataFrame(ROWS)
    IndexBuilder(cfg, postings_partitions=2).build(df, out, input_id="m")
    return cfg


def oracle():
    db = OramaOracle(SCHEMA)
    for r in ROWS:
        db.insert({k: v for k, v in r.items() if k != "docid"}, docid=r["docid"])
    return db


def assert_match(idx, orc, term, **kw):
    got = [(r["docid"], r["score"]) for r in idx.search(term=term, **kw).top_df().collect()]
    want = [(h["id"], h["score"]) for h in orc.search(term=term, **kw)["hits"]]
    assert [g[0] for g in got] == [w[0] for w in want]
    for (gi, gs), (wi, ws) in zip(got, want):
        assert gs == pytest.approx(ws, rel=1e-9)


def test_remove_then_search_parity(spark, tmpdir_index):
    cfg = build(spark, tmpdir_index)
    orc = oracle()
    remove_documents(spark, tmpdir_index, cfg,
                     spark.createDataFrame([(2,), (5,)], "docid long"))
    orc.remove(2)
    orc.remove(5)
    idx = SearchIndex.load(spark, tmpdir_index, cfg)
    assert_match(idx, orc, "alpha")
    assert_match(idx, orc, "beta delta", threshold=0.0)
    assert idx.search(term="alpha").count() == 2


def test_insert_then_search_parity(spark, tmpdir_index):
    cfg = build(spark, tmpdir_index)
    orc = oracle()
    new = [{"docid": 10, "t": "alpha nu xi", "cat": "w"},
           {"docid": 11, "t": "omega omicron", "cat": "w"}]
    insert_documents(spark, tmpdir_index, cfg, spark.createDataFrame(new))
    for r in new:
        orc.insert({k: v for k, v in r.items() if k != "docid"}, docid=r["docid"])
    idx = SearchIndex.load(spark, tmpdir_index, cfg)
    assert_match(idx, orc, "alpha")
    assert_match(idx, orc, "omega")


def test_duplicate_insert_rejected(spark, tmpdir_index):
    cfg = build(spark, tmpdir_index)
    with pytest.raises(ValueError, match="DOCUMENT_ALREADY_EXISTS"):
        insert_documents(
            spark, tmpdir_index, cfg,
            spark.createDataFrame([{"docid": 1, "t": "dup", "cat": "x"}]),
        )


def test_update_parity(spark, tmpdir_index):
    cfg = build(spark, tmpdir_index)
    orc = oracle()
    update_documents(
        spark, tmpdir_index, cfg,
        spark.createDataFrame([{"docid": 3, "t": "alpha beta beta", "cat": "y"}]),
    )
    orc.update({"t": "alpha beta beta", "cat": "y"}, docid=3)
    idx = SearchIndex.load(spark, tmpdir_index, cfg)
    assert_match(idx, orc, "alpha")
    assert_match(idx, orc, "beta")
    assert idx.search(term="epsilon").count() == 0


def test_compaction_preserves_results(spark, tmpdir_index):
    cfg = build(spark, tmpdir_index)
    remove_documents(spark, tmpdir_index, cfg,
                     spark.createDataFrame([(1,)], "docid long"))
    insert_documents(
        spark, tmpdir_index, cfg,
        spark.createDataFrame([{"docid": 9, "t": "alpha sigma", "cat": "q"}]),
    )
    idx_before = SearchIndex.load(spark, tmpdir_index, cfg)
    before = [(r["docid"], round(r["score"], 9))
              for r in idx_before.search(term="alpha").top_df().collect()]
    compact(spark, tmpdir_index, cfg)
    idx_after = SearchIndex.load(spark, tmpdir_index, cfg)
    after = [(r["docid"], round(r["score"], 9))
             for r in idx_after.search(term="alpha").top_df().collect()]
    assert before == after
    import os
    assert not os.path.exists(f"{tmpdir_index}/tombstones")


def test_build_resume_skips_completed_stages(spark, tmpdir_index):
    cfg = build(spark, tmpdir_index)
    from orama_spark.build.manifest import BuildManifest

    df = spark.createDataFrame(ROWS)
    entries = IndexBuilder(cfg, postings_partitions=2).build(df, tmpdir_index, input_id="m")
    assert all(e.get("skipped") for e in entries.values()), "resume must skip all"
