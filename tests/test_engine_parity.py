"""Spark engine vs Python oracle: rank-identical top-k, scores at
rtol 1e-9, across the full operator surface (the north-star invariant).

Corpus: the deterministic synthetic web corpus (Zipf term skew) with the
"full" profile (stemming + stopwords), plus a typed mini corpus for
filters/facets/groups.
"""

import math

import pytest

from orama_spark.config import IndexConfig
from orama_spark.build.indexer import IndexBuilder
from orama_spark.kernel import TokenizerConfig
from orama_spark.oracle.engine import OramaOracle
from orama_spark.query.engine import SearchIndex
from orama_spark.sources.webpages import CorpusGenerator

N_DOCS = 400


def _web_rows():
    g = CorpusGenerator(seed=42)
    import numpy as np

    cols = g.batch(np.arange(N_DOCS, dtype=np.int64))
    rows = []
    for i in range(N_DOCS):
        rows.append(
            {
                "docid": i,
                "url": cols["url"][i],
                "text": cols["text"][i],
                "lang": cols["lang"][i],
            }
        )
    return rows


WEB_CONFIG = IndexConfig(
    schema={"text": "string", "lang": "enum", "url": "enum"},
    tokenizer=TokenizerConfig.full(),
)


@pytest.fixture(scope="module")
def web_index(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("webidx"))
    rows = _web_rows()
    df = spark.createDataFrame(rows)
    IndexBuilder(WEB_CONFIG, postings_partitions=4).build(df, out, input_id="t")
    return SearchIndex.load(spark, out, WEB_CONFIG)


@pytest.fixture(scope="module")
def web_oracle():
    db = OramaOracle(
        {"text": "string", "lang": "enum", "url": "enum"},
        tokenizer=TokenizerConfig.full(),
    )
    for r in _web_rows():
        db.insert({"text": r["text"], "lang": r["lang"], "url": r["url"]}, docid=r["docid"])
    return db


def assert_rank_identical(spark_result, oracle_result, k=10):
    got = [(r["docid"], r["score"]) for r in spark_result.top_df().collect()]
    want = [(h["id"], h["score"]) for h in oracle_result["hits"]]
    assert [g[0] for g in got] == [w[0] for w in want], (
        f"rank mismatch:\n spark={got}\n oracle={want}"
    )
    for (gid, gs), (wid, ws) in zip(got, want):
        assert gs == pytest.approx(ws, rel=1e-9), f"score mismatch doc {gid}"
    assert spark_result.count() == oracle_result["count"]


QUERIES = [
    dict(term="fox"),
    dict(term="search engine"),
    dict(term="the quick brown fox"),          # stopword dropped
    dict(term="distributed computing", threshold=0.0),
    dict(term="spark shuffle partition", threshold=0.0),
    dict(term="data table spark", threshold=0.5),
    dict(term="optimiz"),                      # prefix
    dict(term="sprk", tolerance=1),            # fuzzy
    dict(term="shufle", tolerance=2),          # fuzzy
    dict(term="engine", exact=True),           # exact + post-filter
    dict(term="nonexistenttermxyz"),
    dict(term="river mountain ocean", limit=25),
    dict(term="index", limit=5, offset=5),
]


@pytest.mark.parametrize("q", QUERIES, ids=lambda q: q["term"][:24] + f"-t{q.get('threshold', 1)}-tol{q.get('tolerance', 0)}-x{q.get('exact', 0)}")
def test_rank_identity(web_index, web_oracle, q):
    limit = q.get("limit", 10)
    offset = q.get("offset", 0)
    sr = web_index.search(
        term=q["term"],
        exact=q.get("exact", False),
        tolerance=q.get("tolerance", 0),
        threshold=q.get("threshold", 1.0),
        limit=limit,
        offset=offset,
    )
    orc = web_oracle.search(
        term=q["term"],
        exact=q.get("exact", False),
        tolerance=q.get("tolerance", 0),
        threshold=q.get("threshold", 1.0),
        limit=limit,
        offset=offset,
    )
    assert_rank_identical(sr, orc)


def test_rank_identity_with_filter(web_index, web_oracle):
    sr = web_index.search(term="search engine", where={"lang": {"eq": "en"}})
    orc = web_oracle.search(term="search engine", where={"lang": {"eq": "en"}})
    assert_rank_identical(sr, orc)


def test_boost(web_index, web_oracle):
    sr = web_index.search(term="fox dog", boost={"text": 2.0})
    orc = web_oracle.search(term="fox dog", boost={"text": 2.0})
    assert_rank_identical(sr, orc)


def test_filter_only_query(web_index, web_oracle):
    sr = web_index.search(where={"lang": {"eq": "de"}}, limit=1000)
    orc = web_oracle.search(where={"lang": {"eq": "de"}}, limit=1000)
    assert_rank_identical(sr, orc)


def test_facets(web_index, web_oracle):
    sr = web_index.search(term="search")
    orc = web_oracle.search(term="search", facets={"lang": {}})
    got = {
        r["facet_value"]: r["facet_count"]
        for r in web_index.facets_df(sr, "lang").collect()
    }
    assert got == orc["facets"]["lang"]["values"]


# ---------------------------------------------------------- typed corpus
TYPED_ROWS = [
    {"docid": 1, "title": "Blue t-shirt slim fit", "rating": 5.0, "avail": True, "genres": ["casual", "summer"], "cat": "shirt"},
    {"docid": 2, "title": "Blue t-shirt oversize fit", "rating": 3.5, "avail": False, "genres": ["casual"], "cat": "shirt"},
    {"docid": 3, "title": "Red t-shirt v-neck cut", "rating": 4.2, "avail": True, "genres": ["summer", "party"], "cat": "shirt"},
    {"docid": 4, "title": "Colored t-shirt slim fit", "rating": 2.1, "avail": True, "genres": ["party"], "cat": "shirt"},
    {"docid": 5, "title": "Red running shoes", "rating": 4.9, "avail": False, "genres": ["sport"], "cat": "shoe"},
    {"docid": 6, "title": "Blue running shoes slim", "rating": 4.0, "avail": True, "genres": ["sport", "summer"], "cat": "shoe"},
]

TYPED_SCHEMA = {
    "title": "string",
    "rating": "number",
    "avail": "boolean",
    "genres": "enum[]",
    "cat": "enum",
}
TYPED_CONFIG = IndexConfig(schema=TYPED_SCHEMA)


@pytest.fixture(scope="module")
def typed_index(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("typedidx"))
    df = spark.createDataFrame(TYPED_ROWS)
    IndexBuilder(TYPED_CONFIG, postings_partitions=2).build(df, out, input_id="t")
    return SearchIndex.load(spark, out, TYPED_CONFIG)


@pytest.fixture(scope="module")
def typed_oracle():
    db = OramaOracle(TYPED_SCHEMA)
    for r in TYPED_ROWS:
        db.insert({k: v for k, v in r.items() if k != "docid"}, docid=r["docid"])
    return db


FILTER_CASES = [
    {"rating": {"gt": 4.0}},
    {"rating": {"between": [3.0, 4.5]}},
    {"avail": True},
    {"cat": {"eq": "shoe"}},
    {"cat": {"in": ["shirt"]}},
    {"cat": {"nin": ["shirt"]}},
    {"genres": {"containsAll": ["summer", "party"]}},
    {"genres": {"containsAny": ["sport", "party"]}},
    {"and": [{"rating": {"gte": 4.0}}, {"avail": True}]},
    {"or": [{"rating": {"lt": 3.0}}, {"cat": {"eq": "shoe"}}]},
    {"not": {"avail": True}},
    {"title": "slim"},
]


@pytest.mark.parametrize("where", FILTER_CASES, ids=[str(i) for i in range(len(FILTER_CASES))])
def test_filters_parity(typed_index, typed_oracle, where):
    sr = typed_index.search(term="t-shirt shoes running", where=where, limit=20)
    orc = typed_oracle.search(term="t-shirt shoes running", where=where, limit=20)
    assert_rank_identical(sr, orc)


def test_groups(typed_index, typed_oracle):
    sr = typed_index.search(term="shirt shoes", limit=20)
    orc = typed_oracle.search(term="shirt shoes", group_by={"properties": ["cat"], "maxResult": 2}, limit=20)
    got = {}
    for r in typed_index.groups_df(sr, ["cat"], max_result=2).collect():
        got.setdefault(r["cat"], []).append(r["docid"])
    want = {g["values"][0]: [h["id"] for h in g["result"]] for g in orc["groups"]}
    assert got == want


def test_distinct_on(typed_index, typed_oracle):
    sr = typed_index.search(term="slim", limit=20)
    orc = typed_oracle.search(term="slim", distinct_on="cat", limit=20)
    got = [r["docid"] for r in typed_index.distinct_df(sr, "cat").orderBy("__gn" if False else "docid").collect()]
    want = sorted(h["id"] for h in orc["hits"])
    assert sorted(got) == want


def test_sort_by(typed_index, typed_oracle):
    sr = typed_index.search(term="shirt shoes", limit=20)
    orc = typed_oracle.search(term="shirt shoes", sort_by={"property": "rating", "order": "DESC"}, limit=20)
    got = [r["docid"] for r in typed_index.sorted_hits_df(sr, "rating", "DESC", limit=20).collect()]
    want = [h["id"] for h in orc["hits"]]
    assert got == want


def test_number_facets(typed_index, typed_oracle):
    ranges = [{"from": 0, "to": 3}, {"from": 3, "to": 4.5}, {"from": 4, "to": 5}]
    sr = typed_index.search(term="shirt shoes", limit=20)
    orc = typed_oracle.search(term="shirt shoes", facets={"rating": {"ranges": ranges}}, limit=20)
    got = {
        r["facet_value"]: r["facet_count"]
        for r in typed_index.facets_df(sr, "rating", {"ranges": ranges}).collect()
    }
    assert got == orc["facets"]["rating"]["values"]
