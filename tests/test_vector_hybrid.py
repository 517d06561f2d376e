"""Vector & hybrid search parity: Spark plans vs the Python oracle
(which ports trees/vector.ts + search-hybrid.ts exactly, float32
values / float64 accumulation)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from orama_spark.build.indexer import IndexBuilder
from orama_spark.config import IndexConfig
from orama_spark.kernel import TokenizerConfig
from orama_spark.oracle.engine import OramaOracle
from orama_spark.query.engine import SearchIndex
from orama_spark.query.vector import hybrid_merge, vector_search

SCHEMA = {"t": "string", "emb": "vector[8]"}


def _rows(n=60, seed=9):
    rng = np.random.default_rng(seed)
    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta"]
    rows = []
    for i in range(n):
        k = 3 + int(rng.integers(0, 5))
        text = " ".join(words[int(j)] for j in rng.integers(0, len(words), k))
        rows.append({"docid": i, "t": text, "emb": rng.standard_normal(8).tolist()})
    return rows


@pytest.fixture(scope="module")
def corpus(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("vecidx"))
    rows = _rows()
    cfg = IndexConfig(schema=SCHEMA)
    df = spark.createDataFrame(rows)
    IndexBuilder(cfg, postings_partitions=2).build(df, out, input_id="v")
    idx = SearchIndex.load(spark, out, cfg)
    orc = OramaOracle(SCHEMA)
    for r in rows:
        orc.insert({"t": r["t"], "emb": r["emb"]}, docid=r["docid"])
    return idx, orc, rows


def test_vector_search_parity(corpus):
    idx, orc, rows = corpus
    q = rows[0]["emb"]
    got = [
        (r["docid"], r["score"])
        for r in vector_search(
            idx.docs, q, vector_col="emb", docid_col="docid", similarity=0.1
        ).orderBy(F.desc("score"), F.asc("docid")).collect()
    ]
    want = [(h["id"], h["score"]) for h in orc.search_vector(q, "emb", similarity=0.1, limit=100)["hits"]]
    assert [g[0] for g in got] == [w[0] for w in want]
    for (gi, gs), (wi, ws) in zip(got, want):
        assert gs == pytest.approx(ws, rel=1e-9)


def test_vector_default_similarity_thresholds(corpus):
    idx, orc, rows = corpus
    q = rows[5]["emb"]
    got = vector_search(idx.docs, q, vector_col="emb", docid_col="docid").collect()
    want = orc.search_vector(q, "emb", limit=100)["hits"]
    assert {r["docid"] for r in got} == {h["id"] for h in want}
    assert any(r["docid"] == 5 for r in got)  # self sim == 1 >= 0.8


def test_hybrid_parity(corpus):
    idx, orc, rows = corpus
    q = rows[3]["emb"]
    text_scored = idx.search(term="alpha beta").scored
    vec_scored = vector_search(
        idx.docs, q, vector_col="emb", docid_col="docid", similarity=0.1
    )
    merged = hybrid_merge(text_scored, vec_scored)
    got = [
        (r["docid"], r["score"])
        for r in merged.orderBy(F.desc("score"), F.asc("docid")).limit(10).collect()
    ]
    want_all = orc.search_hybrid("alpha beta", q, "emb", similarity=0.1, limit=10)
    want = [(h["id"], h["score"]) for h in want_all["hits"]]
    assert [g[0] for g in got] == [w[0] for w in want]
    for (gi, gs), (wi, ws) in zip(got, want):
        assert gs == pytest.approx(ws, rel=1e-9)
