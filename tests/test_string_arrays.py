"""string[] searchable fields: per-element insert semantics
(components/index.ts:260-301), fixtures from tests/array.test.ts,
engine vs oracle score parity at rtol 1e-9."""

import pytest

from orama_spark.build.indexer import IndexBuilder
from orama_spark.config import IndexConfig
from orama_spark.oracle.engine import OramaOracle
from orama_spark.query.engine import SearchIndex

SCHEMA = {"name": "string[]"}

# tests/array.test.ts:4-21 (docids = insertion order, 1-based)
ROWS = [
    (1, ["Albus", "Percival", "Wulfric", "Brian"]),
    (2, ["Harry", "James", "Potter"]),
    (3, ["James", "Potter"]),
    (4, ["Lily", "Lily", "Lily", "Lily", "Evans", "Potter"]),
]


@pytest.fixture(scope="module")
def pair(spark):
    import shutil
    import tempfile

    d = tempfile.mkdtemp(prefix="orama_spark_arr_")
    cfg = IndexConfig(schema=SCHEMA)
    df = spark.createDataFrame(ROWS, "docid long, name array<string>")
    IndexBuilder(cfg, postings_partitions=2).build(df, d, input_id="arr")
    idx = SearchIndex.load(spark, d, cfg)
    orc = OramaOracle(SCHEMA)
    for i, name in ROWS:
        orc.insert({"name": name}, docid=i)
    yield idx, orc
    shutil.rmtree(d, ignore_errors=True)


def _ids(idx, term, **kw):
    return [r["docid"] for r in idx.search(term=term, **kw).top_df().collect()]


# reference expectations (array.test.ts:22-27); tokens are lowercased
@pytest.mark.parametrize(
    "term,expect",
    [
        ("Albus", [1]),
        ("Harry", [2]),
        ("James", [2, 3]),
        ("Potter", [2, 3, 4]),
        ("P", [1, 2, 3, 4]),  # prefix
        ("foo", []),
    ],
)
def test_reference_search_terms(pair, term, expect):
    idx, orc = pair
    got = _ids(idx, term)
    want = [h["id"] for h in orc.search(term=term)["hits"]]
    assert got == want
    assert sorted(got) == sorted(expect)


def test_score_parity_with_oracle(pair):
    idx, orc = pair
    for term in ["James", "Potter", "Lily", "P"]:
        got = [
            (r["docid"], r["score"])
            for r in idx.search(term=term).top_df().collect()
        ]
        want = [(h["id"], h["score"]) for h in orc.search(term=term)["hits"]]
        assert [g[0] for g in got] == [w[0] for w in want], term
        for (_, gs), (_, ws) in zip(got, want):
            assert gs == pytest.approx(ws, rel=1e-9), term


def test_where_filter_on_string_array(pair):
    idx, orc = pair
    # string filter tokenizes and exact-matches (array.test.ts:29-42):
    # prefix 'P' matches nothing as a filter
    for val, expect in [
        ("Albus", [1]),
        ("James", [2, 3]),
        (["Percival", "Evans"], [1, 4]),
        ("P", []),
        ("foo", []),
    ]:
        got = sorted(
            r["docid"]
            for r in idx.search(where={"name": val}, limit=100).scored.collect()
        )
        assert got == expect, val
        assert got == sorted(orc.search_by_where_clause({"name": val}))


def test_last_element_wins_stats(pair):
    """fieldLengths/tf are overwritten per element (index.ts:88-90):
    doc 4's stored field_len must be the LAST element set's length."""
    idx, orc = pair
    metas = {
        r["docid"]: r["field_len"]
        for r in idx.postings.where("term = 'potter'").collect()
    }
    # doc 4's last element is ['Potter'] -> tokenized ['potter'], len 1
    assert metas[4] == 1
    assert orc.field_lengths["name"][4] == 1
    # df counts occurrences across all elements
    assert {
        r["df"] for r in idx.dictionary.where("term = 'lily'").collect()
    } == {4}
    assert orc.token_occurrences["name"]["lily"] == 4


def test_avg_field_length_recurrence_parity(pair):
    idx, orc = pair
    assert idx.stats["fields"]["name"]["avg_field_length"] == pytest.approx(
        orc.avg_field_length["name"], rel=1e-12
    )


def test_maintenance_accepts_string_arrays(spark, pair, tmpdir_index):
    """Round 3: incremental maintenance supports string[] (per-element
    semantics; exact parity + the NaN-poisoning removal quirk live in
    test_maintenance)."""
    from orama_spark.build.maintenance import insert_documents
    from orama_spark.query.engine import SearchIndex

    cfg = IndexConfig(schema=SCHEMA)
    df = spark.createDataFrame(ROWS, "docid long, name array<string>")
    IndexBuilder(cfg, postings_partitions=2).build(df, tmpdir_index, input_id="arr2")
    insert_documents(
        spark, tmpdir_index, cfg,
        spark.createDataFrame([(9, ["Neville"])], "docid long, name array<string>"),
    )
    idx = SearchIndex.load(spark, tmpdir_index, cfg)
    assert 9 in [r["docid"] for r in idx.search(term="neville").top_df().collect()]
