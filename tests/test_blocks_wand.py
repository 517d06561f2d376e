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

    def test_batched_matches_single(self, indexes):
        # wand_topk_many: N queries, one champions collect + one
        # metadata collect + one decode job; per-qid rank identity
        # with the single-query path
        _, blocks = indexes
        queries = {
            "q1": "fox",
            "q2": "search engine",
            "q3": "distributed computing science",
            "q4": "zzzznotaword",
        }
        got = blocks.wand_topk_many(queries, k=10).collect()
        by_qid: dict = {}
        for r in got:
            by_qid.setdefault(r["qid"], []).append((r["docid"], r["score"]))
        assert "q4" not in by_qid
        for qid, text in list(queries.items())[:3]:
            want = [
                (r["docid"], r["score"])
                for r in blocks.wand_topk(text, k=10).collect()
            ]
            have = by_qid.get(qid, [])
            assert [h[0] for h in have] == [w[0] for w in want], qid
            for (hi, hs), (wi, ws) in zip(have, want):
                assert hs == pytest.approx(ws, rel=1e-9)

    def test_batched_fallback_without_champions(self, indexes):
        _, blocks = indexes
        import copy

        nochamp = copy.copy(blocks)
        nochamp.champions = None
        got = nochamp.wand_topk_many({"a": "fox"}, k=5).collect()
        want = blocks.wand_topk("fox", k=5).collect()
        assert [(r["docid"],) for r in got] == [(r["docid"],) for r in want]

    def test_pruning_actually_prunes(self, indexes):
        _, blocks = indexes
        st = blocks.pruning_stats("fox dog quick", k=10)
        assert st["blocks_total"] > 0
        assert st["blocks_kept"] <= st["blocks_total"]

    def test_cold_query_is_two_jobs_warm_is_one(self, indexes, spark):
        """The θ-seed (champions) and block-metadata collects are folded
        into ONE tagged-union driver job (r5): a cold single query runs
        2 Spark jobs total (fetch + final top-k), a warm one runs 1.
        Fixed per-query driver latency is THE WAND bottleneck on short
        queries (SCALE_r04), so the job count is a graded invariant."""
        _, blocks = indexes
        fresh = BlockIndex(
            blocks.spark, CFG, blocks.blocks, blocks.dictionary,
            blocks.stats, champions=blocks.champions,
        )
        sc = spark.sparkContext
        tracker = sc.statusTracker()

        def n_jobs(fn) -> int:
            before = len(tracker.getJobIdsForGroup(None) or [])
            import uuid

            group = f"wandjobs-{uuid.uuid4().hex[:8]}"
            sc.setJobGroup(group, "count")
            try:
                fn()
            finally:
                sc.setJobGroup(None, None)
            return len(tracker.getJobIdsForGroup(group) or [])

        cold = n_jobs(lambda: fresh.wand_topk("river mountain", k=10).collect())
        warm = n_jobs(lambda: fresh.wand_topk("river mountain", k=10).collect())
        assert cold == 2, cold
        assert warm == 1, warm

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


class TestWandAllowDuplicates:
    """Blocks carry per-posting tf numerators, so block-max pruning now
    covers allow_duplicates (tf = occ/fl) — previously routed to the
    plain path. Bound stays achieved (max of exact scores)."""

    @pytest.fixture(scope="class")
    def dup_indexes(self, spark, tmp_path_factory):
        out = str(tmp_path_factory.mktemp("wanddupidx"))
        cfg = IndexConfig(
            schema={"text": "string", "lang": "enum"},
            tokenizer=TokenizerConfig(
                stemming=True,
                stopwords=TokenizerConfig.full().stopwords,
                allow_duplicates=True,
            ),
        )
        n = 2400  # enough docs that hot terms span many 128-posting blocks
        g = CorpusGenerator(seed=7)
        cols = g.batch(np.arange(n, dtype=np.int64))
        rows = [
            {"docid": i, "text": cols["text"][i], "lang": cols["lang"][i]}
            for i in range(n)
        ]
        IndexBuilder(cfg, postings_partitions=3).build(
            spark.createDataFrame(rows), out, input_id="wd"
        )
        return SearchIndex.load(spark, out, cfg), BlockIndex.build(spark, out, cfg), cfg

    @pytest.mark.parametrize("term", ["fox", "search engine", "river mountain"])
    def test_rank_identity_vs_plain(self, dup_indexes, term):
        plain, blocks, _ = dup_indexes
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

    def test_pruning_nonzero_under_duplicates(self, dup_indexes):
        # query two hot POSITIVE-idf terms (df well under N — df counts
        # occurrences under allow_duplicates, so the very hottest terms
        # go idf-negative and soundly disengage pruning) spanning many
        # blocks — pruning must DROP some (θ > 0, kept < total), the
        # property that was vacuous while allow_duplicates routed to
        # the plain path
        _, blocks, _ = dup_indexes
        n = blocks.stats["docs_count"]
        hot = [
            r["term"]
            for r in blocks.dictionary.where(F.col("df") < 0.4 * n)
            .orderBy(F.desc("df")).limit(2).collect()
        ]
        st = blocks.pruning_stats(" ".join(hot), k=10)
        assert st["blocks_total"] >= 8
        assert 0 < st["blocks_kept"] < st["blocks_total"]
        assert st["theta"] > 0

    def test_negative_idf_query_disengages_but_stays_exact(self, dup_indexes):
        # the single hottest term has df > N (idf < 0): θ ≤ 0 disengages
        # pruning, and the result must still equal the plain path
        plain, blocks, _ = dup_indexes
        hot = blocks.dictionary.orderBy(F.desc("df")).first()["term"]
        want = [
            (r["docid"], r["score"])
            for r in plain.search(term=hot, exact=True, limit=10).top_df().collect()
        ]
        keep = plain.exact_filter_ids(hot)
        got = [
            (r["docid"], r["score"])
            for r in blocks.wand_topk(hot, k=10, keep_ids=keep).collect()
        ]
        assert [g[0] for g in got] == [w[0] for w in want]
        for (gi, gs), (wi, ws) in zip(got, want):
            assert gs == pytest.approx(ws, rel=1e-9)

    @pytest.mark.parametrize("term", ["fox fox", "fox fox river"])
    def test_duplicate_token_rank_identity(self, dup_indexes, term):
        # r4 ADVICE: the reference scores each query-token OCCURRENCE
        # ('fox fox' counts fox twice) — θ seed, sweep upper bounds and
        # phase-2 scores must all weight duplicates identically, or the
        # final score≥θ filter drops true top-k hits.
        plain, blocks, _ = dup_indexes
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
        assert got, term
        for (gi, gs), (wi, ws) in zip(got, want):
            assert gs == pytest.approx(ws, rel=1e-9)

    def test_duplicate_token_batch_matches_single(self, dup_indexes):
        # r4 ADVICE follow-up: wand_topk_many used set(toks), silently
        # deduping where the single path weights — per-qid identity must
        # hold for duplicate-token queries too
        _, blocks, _ = dup_indexes
        queries = {"a": "fox fox", "b": "river fox fox", "c": "fox"}
        got = blocks.wand_topk_many(queries, k=10).collect()
        by_qid: dict = {}
        for r in got:
            by_qid.setdefault(r["qid"], []).append((r["docid"], r["score"]))
        for qid, text in queries.items():
            want = [
                (r["docid"], r["score"])
                for r in blocks.wand_topk(text, k=10).collect()
            ]
            have = by_qid.get(qid, [])
            assert [h[0] for h in have] == [w[0] for w in want], qid
            for (hi, hs), (wi, ws) in zip(have, want):
                assert hs == pytest.approx(ws, rel=1e-9)

    def test_duplicate_token_sweeps_identical(self, dup_indexes):
        # weighted driver sweep ≡ weighted distributed sweep
        _, blocks, cfg = dup_indexes
        forced = BlockIndex(
            blocks.spark, cfg, blocks.blocks, blocks.dictionary,
            blocks.stats, champions=blocks.champions,
            driver_sweep_max_blocks=0,
        )
        for term in ["fox fox", "fox fox river"]:
            a = [(r["docid"], round(r["score"], 9))
                 for r in blocks.wand_topk(term, k=10).collect()]
            b = [(r["docid"], round(r["score"], 9))
                 for r in forced.wand_topk(term, k=10).collect()]
            assert a == b and a, term

    def test_tfns_materialized(self, dup_indexes):
        # duplicate-bearing blocks must carry non-empty tfn payloads
        _, blocks, _ = dup_indexes
        n_nontrivial = blocks.blocks.where(F.length("tfns") > 0).count()
        assert n_nontrivial > 0
