"""Nested dot-path properties (components/index.ts:159-165): struct
columns indexed/filtered/faceted by dotted paths, engine vs oracle."""

import pytest

from orama_spark.build.indexer import IndexBuilder
from orama_spark.config import IndexConfig
from orama_spark.oracle.engine import OramaOracle
from orama_spark.query.engine import SearchIndex

NESTED_SCHEMA = {"quote": "string", "meta.tag": "string", "meta.fav": "boolean"}
ORACLE_SCHEMA = {"quote": "string", "meta": {"tag": "string", "fav": "boolean"}}

ROWS = [
    {"docid": 1, "quote": "be the change you wish to see", "meta": {"tag": "inspirational", "fav": True}},
    {"docid": 2, "quote": "i have not failed just found ways that work", "meta": {"tag": "inspirational", "fav": True}},
    {"docid": 3, "quote": "it does not matter how slowly you go", "meta": {"tag": "wisdom", "fav": False}},
    {"docid": 4, "quote": "the only way to do great work is to love it", "meta": {"tag": "inspirational", "fav": False}},
]


@pytest.fixture(scope="module")
def nested(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("nestidx"))
    cfg = IndexConfig(schema=NESTED_SCHEMA)
    df = spark.createDataFrame(ROWS)
    IndexBuilder(cfg, postings_partitions=2).build(df, out, input_id="n")
    idx = SearchIndex.load(spark, out, cfg)
    orc = OramaOracle(ORACLE_SCHEMA)
    for r in ROWS:
        orc.insert({k: v for k, v in r.items() if k != "docid"}, docid=r["docid"])
    return idx, orc


def test_search_nested_string_prop_scored(nested):
    idx, orc = nested
    # 'inspirational' matches via the meta.tag property index
    got = [(r["docid"], r["score"]) for r in idx.search(term="inspirational").top_df().collect()]
    want = [(h["id"], h["score"]) for h in orc.search(term="inspirational")["hits"]]
    assert [g[0] for g in got] == [w[0] for w in want]
    for (gi, gs), (wi, ws) in zip(got, want):
        assert gs == pytest.approx(ws, rel=1e-9)


def test_multi_prop_scoring_sums(nested):
    idx, orc = nested
    got = [(r["docid"], r["score"]) for r in idx.search(term="work").top_df().collect()]
    want = [(h["id"], h["score"]) for h in orc.search(term="work")["hits"]]
    assert [g[0] for g in got] == [w[0] for w in want]
    for (gi, gs), (wi, ws) in zip(got, want):
        assert gs == pytest.approx(ws, rel=1e-9)


def test_nested_bool_filter(nested):
    idx, orc = nested
    got = idx.search(term="work", where={"meta.fav": True}).count()
    want = orc.search(term="work", where={"meta.fav": True})["count"]
    assert got == want


def test_nested_facets(nested):
    idx, orc = nested
    sr = idx.search(term="work")
    got = {r["facet_value"]: r["facet_count"] for r in idx.facets_df(sr, "meta.tag").collect()}
    want = orc.search(term="work", facets={"meta.tag": {}})["facets"]["meta.tag"]["values"]
    assert got == want
