"""Match-highlight parity (plugin-match-highlight/src/index.ts:36-135):
engine positions vs oracle port, prefix + tolerance matching."""

import pytest

from orama_spark.build.indexer import IndexBuilder
from orama_spark.config import IndexConfig
from orama_spark.oracle.engine import OramaOracle, match_positions
from orama_spark.query.engine import SearchIndex
from orama_spark.query.highlight import match_positions_df

SCHEMA = {"title": "string", "body": "string"}
ROWS = [
    {"docid": 1, "title": "The quick brown fox", "body": "foxes jump over lazy dogs"},
    {"docid": 2, "title": "Quick sort algorithm", "body": "quicksort is quick, quite quick!"},
    {"docid": 3, "title": "Lazy evaluation", "body": "a lazy fox and a lazy dog"},
    {"docid": 4, "title": "Nothing here", "body": "unrelated words only"},
]


@pytest.fixture(scope="module")
def pair(spark):
    import shutil
    import tempfile

    d = tempfile.mkdtemp(prefix="orama_spark_hl_")
    cfg = IndexConfig(schema=SCHEMA)
    IndexBuilder(cfg, postings_partitions=2).build(
        spark.createDataFrame(ROWS), d, input_id="hl"
    )
    idx = SearchIndex.load(spark, d, cfg)
    orc = OramaOracle(SCHEMA)
    for r in ROWS:
        orc.insert({k: v for k, v in r.items() if k != "docid"}, docid=r["docid"])
    yield idx, orc
    shutil.rmtree(d, ignore_errors=True)


def _compare(idx, orc, term, tolerance=0):
    sr = idx.search(term=term, tolerance=tolerance, limit=10)
    got = sorted(
        (r["docid"], r["prop"], r["token"], r["start"], r["length"])
        for r in match_positions_df(idx, sr, term, tolerance=tolerance).collect()
    )
    hits = orc.search(term=term, tolerance=tolerance, limit=10)["hits"]
    want = sorted(match_positions(orc, hits, term, tolerance=tolerance))
    assert got == want
    return got


def test_prefix_positions(pair):
    idx, orc = pair
    got = _compare(idx, orc, "quick")
    # 'quick' prefix-matches quick, quicksort, quite? no ('quite' does
    # not start with 'quick'); doc2 body has quicksort@0, quick@13, quick@26
    assert (2, "body", "quicksort", 0, 9) in got
    assert (2, "body", "quick", 13, 5) in got
    assert (1, "title", "quick", 4, 5) in got


def test_tolerance_positions(pair):
    idx, orc = pair
    got = _compare(idx, orc, "lazi", tolerance=1)
    assert any(t == "lazy" for _, _, t, _, _ in got)


def test_multi_token_query(pair):
    idx, orc = pair
    _compare(idx, orc, "fox dog")


def test_positions_only_for_page_docs(pair):
    idx, orc = pair
    got = _compare(idx, orc, "unrelated")
    assert {d for d, *_ in got} == {4}
