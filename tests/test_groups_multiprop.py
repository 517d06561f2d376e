"""Multi-property groupBy with maxResult (groups.ts:100-106 per-property
pre-intersection cap) + facet count (facets.ts:115-117): engine vs
oracle parity."""

import pytest

from orama_spark.build.indexer import IndexBuilder
from orama_spark.config import IndexConfig
from orama_spark.oracle.engine import OramaOracle
from orama_spark.query.engine import SearchIndex

SCHEMA = {"t": "string", "cat": "enum", "shop": "enum", "price": "number"}
ROWS = [
    {"docid": 1, "t": "red shoe", "cat": "shoe", "shop": "a", "price": 10.0},
    {"docid": 2, "t": "red shoe deluxe", "cat": "shoe", "shop": "a", "price": 20.0},
    {"docid": 3, "t": "red shoe classic", "cat": "shoe", "shop": "b", "price": 30.0},
    {"docid": 4, "t": "red boot", "cat": "boot", "shop": "a", "price": 40.0},
    {"docid": 5, "t": "red boot tall", "cat": "boot", "shop": "b", "price": 50.0},
    {"docid": 6, "t": "red boot short", "cat": "boot", "shop": "b", "price": 15.0},
    {"docid": 7, "t": "red sandal", "cat": "sandal", "shop": "a", "price": 25.0},
]


@pytest.fixture(scope="module")
def pair(spark):
    import shutil
    import tempfile

    d = tempfile.mkdtemp(prefix="orama_spark_grp_")
    cfg = IndexConfig(schema=SCHEMA)
    IndexBuilder(cfg, postings_partitions=2).build(
        spark.createDataFrame(ROWS), d, input_id="grp"
    )
    idx = SearchIndex.load(spark, d, cfg)
    orc = OramaOracle(SCHEMA)
    for r in ROWS:
        orc.insert({k: v for k, v in r.items() if k != "docid"}, docid=r["docid"])
    yield idx, orc
    shutil.rmtree(d, ignore_errors=True)


def _engine_groups(idx, term, props, max_result):
    sr = idx.search(term=term, limit=100)
    rows = idx.groups_df(sr, props, max_result=max_result).collect()
    groups: dict[tuple, list[int]] = {}
    for r in sorted(rows, key=lambda r: r["group_rank"]):
        groups.setdefault(tuple(r[p] for p in props), []).append(r["docid"])
    return groups


def _oracle_groups(orc, term, props, max_result):
    res = orc.search(term=term, limit=100, group_by={"properties": props, "maxResult": max_result})
    return {
        tuple(g["values"]): [h["id"] for h in g["result"]] for g in res["groups"]
    }


@pytest.mark.parametrize("max_result", [1, 2, 3])
def test_multiprop_group_cap_parity(pair, max_result):
    idx, orc = pair
    got = _engine_groups(idx, "red", ["cat", "shop"], max_result)
    want = _oracle_groups(orc, "red", ["cat", "shop"], max_result)
    assert got == want
    # the per-property cap can EXCLUDE a doc from a combination even
    # when the combination itself has room (pre-intersection semantics)
    if max_result == 1:
        # rank order: equal scores -> docid asc per ('red' tf/fl);
        # verify no combination exceeds 1 member
        assert all(len(v) == 1 for v in got.values())


def test_single_prop_group_still_exact(pair):
    idx, orc = pair
    got = _engine_groups(idx, "red", ["cat"], 2)
    want = _oracle_groups(orc, "red", ["cat"], 2)
    assert got == want


def test_groups_custom_reduce(pair):
    """applyInPandas custom reducer (types.ts:170-180) vs a Python
    reduce over the oracle's group members."""
    import pandas as pd

    idx, orc = pair
    sr = idx.search(term="red", limit=100)

    def reducer(key, pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            [[key[0], len(pdf), float(pdf["score"].max()), float(pdf["price"].sum())]],
            columns=["cat", "n", "best_score", "total_price"],
        )

    got = {
        r["cat"]: (r["n"], round(r["best_score"], 9), r["total_price"])
        for r in idx.groups_reduce_df(
            sr, ["cat"], reducer,
            "cat string, n long, best_score double, total_price double",
            max_result=2,
        ).collect()
    }
    res = orc.search(term="red", limit=100, group_by={"properties": ["cat"], "maxResult": 2})
    want = {}
    for g in res["groups"]:
        docs = g["result"]
        want[g["values"][0]] = (
            len(docs),
            round(max(h["score"] for h in docs), 9),
            sum(h["document"]["price"] for h in docs),
        )
    assert got == want


def test_facet_count_string_enum(pair):
    idx, orc = pair
    sr = idx.search(term="red", limit=100)
    got = idx.facet_count_df(sr, "cat").collect()[0]["facet_count"]
    scored = [(h["id"], h["score"]) for h in orc.search(term="red", limit=100)["hits"]]
    want = orc.get_facets(scored, {"cat": {}})["cat"]["count"]
    assert got == want == 3


def test_facet_count_number_ranges(pair):
    idx, orc = pair
    sr = idx.search(term="red", limit=100)
    cfg = {"ranges": [{"from": 0, "to": 20}, {"from": 20, "to": 45}, {"from": 100, "to": 200}]}
    got = idx.facet_count_df(sr, "price", cfg).collect()[0]["facet_count"]
    scored = [(h["id"], h["score"]) for h in orc.search(term="red", limit=100)["hits"]]
    want = orc.get_facets(scored, {"price": cfg})["price"]["count"]
    # scalar number facets pre-seed every range: count = len(ranges)
    assert got == want == 3
