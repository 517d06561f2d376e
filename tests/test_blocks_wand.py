"""Posting-block codec + block-max WAND: codec roundtrip, block bounds,
and WAND rank-identity vs the plain engine path."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from orama_spark.build.blocks import (
    BLOCK_SIZE, bm25_for_fl, varint_decode, varint_encode,
)
from orama_spark.build.indexer import IndexBuilder
from orama_spark.config import IndexConfig
from orama_spark.kernel import TokenizerConfig
from orama_spark.query.engine import SearchIndex
from orama_spark.query.wand import BlockIndex
from orama_spark.sources.webpages import CorpusGenerator


class TestVarint:
    def test_roundtrip_random(self):
        rng = np.random.default_rng(0)
        for _ in range(20):
            n = int(rng.integers(0, 300))
            vals = rng.integers(0, 1 << 62, size=n, dtype=np.uint64)
            assert list(varint_decode(varint_encode(vals))) == list(vals)

    def test_roundtrip_boundaries(self):
        vals = np.array(
            [0, 1, 127, 128, 129, 16383, 16384, (1 << 35) - 1, (1 << 63) - 1],
            dtype=np.uint64,
        )
        assert list(varint_decode(varint_encode(vals))) == list(vals)

    def test_empty(self):
        assert varint_encode(np.array([], dtype=np.uint64)) == b""
        assert len(varint_decode(b"")) == 0

    def test_small_deltas_compress(self):
        vals = np.ones(128, dtype=np.uint64)
        assert len(varint_encode(vals)) == 128  # 1 byte per small delta


N_DOCS = 600
CFG = IndexConfig(
    schema={"text": "string", "lang": "enum"}, tokenizer=TokenizerConfig.full()
)


@pytest.fixture(scope="module")
def indexes(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("wandidx"))
    g = CorpusGenerator(seed=42)
    cols = g.batch(np.arange(N_DOCS, dtype=np.int64))
    rows = [
        {"docid": i, "text": cols["text"][i], "lang": cols["lang"][i]}
        for i in range(N_DOCS)
    ]
    df = spark.createDataFrame(rows)
    IndexBuilder(CFG, postings_partitions=3).build(df, out, input_id="w")
    plain = SearchIndex.load(spark, out, CFG)
    blocks = BlockIndex.build(spark, out, CFG)
    return plain, blocks


class TestBlocks:
    def test_blocks_cover_all_postings(self, indexes):
        plain, blocks = indexes
        n_postings = plain.postings.count()
        n_in_blocks = blocks.blocks.agg(F.sum("n")).collect()[0][0]
        assert n_in_blocks == n_postings

    def test_block_size_respected(self, indexes):
        _, blocks = indexes
        assert blocks.blocks.agg(F.max("n")).collect()[0][0] <= BLOCK_SIZE

    def test_max_score_is_upper_bound(self, indexes):
        plain, blocks = indexes
        # exact per-posting scores for one hot term must never exceed the
        # block bound
        term = "the"  # stemmed/stopworded profile: pick an indexed term
        term = plain.dictionary.orderBy(F.desc("df")).first()["term"]
        stats = plain.stats
        bm = CFG.bm25
        df_val = plain.dictionary.where(F.col("term") == term).first()["df"]
        posts = plain.postings.where(F.col("term") == term).collect()
        avg = stats["fields"]["text"]["avg_field_length"]
        bmax = {
            (r["first_docid"]): r["max_score"]
            for r in blocks.blocks.where(F.col("term") == term).collect()
        }
        overall_max = max(bmax.values())
        scores = bm25_for_fl(
            np.array([p["field_len"] for p in posts], dtype=np.float64),
            float(df_val), float(stats["docs_count"]), avg, bm,
        )
        assert scores.max() <= overall_max + 1e-12


class TestWand:
    @pytest.mark.parametrize(
        "term",
        ["fox", "search engine", "distributed computing science", "river mountain"],
    )
    def test_rank_identity_vs_plain(self, indexes, term):
        # plain exact mode = exact term match + case-sensitive post-filter
        # (search-fulltext.ts:88-115); WAND takes the same filter as its
        # keep_ids mask, so the two paths must be rank-identical.
        plain, blocks = indexes
        want = [
            (r["docid"], r["score"])
            for r in plain.search(term=term, exact=True, limit=10).top_df().collect()
        ]
        keep = plain.exact_filter_ids(term)
        got = [
            (r["docid"], r["score"])
            for r in blocks.wand_topk(term, k=10, keep_ids=keep).collect()
        ]
        assert [g[0] for g in got] == [w[0] for w in want], term
        for (gi, gs), (wi, ws) in zip(got, want):
            assert gs == pytest.approx(ws, rel=1e-9)

    def test_missing_term(self, indexes):
        _, blocks = indexes
        assert blocks.wand_topk("zzzznotaword", k=5).collect() == []

    def test_pruning_actually_prunes(self, indexes):
        _, blocks = indexes
        st = blocks.pruning_stats("fox dog quick", k=10)
        assert st["blocks_total"] > 0
        assert st["blocks_kept"] <= st["blocks_total"]

    def test_driver_and_distributed_sweeps_identical(self, indexes):
        """wand_topk without keep_ids takes the bounded driver-sweep
        fast path; forcing driver_sweep_max_blocks=0 exercises the
        distributed bucketed sweep on the same query — both phase-1
        implementations must agree exactly."""
        _, blocks = indexes
        forced = BlockIndex(
            blocks.spark, CFG, blocks.blocks, blocks.dictionary,
            blocks.stats, champions=blocks.champions,
            driver_sweep_max_blocks=0,
        )
        for term in ["fox", "search engine", "river mountain"]:
            a = [(r["docid"], round(r["score"], 9))
                 for r in blocks.wand_topk(term, k=10).collect()]
            b = [(r["docid"], round(r["score"], 9))
                 for r in forced.wand_topk(term, k=10).collect()]
            assert a == b and a, term
