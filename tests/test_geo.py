"""Geosearch parity: radius/polygon filters + distance-ranked geo-only
queries, fixtures ported from the reference's own test suite
(tests/search.geo.test.ts) and cross-checked engine vs oracle."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType, LongType, StringType, StructField, StructType,
)

from orama_spark.build.indexer import IndexBuilder
from orama_spark.config import IndexConfig
from orama_spark.oracle.engine import OramaOracle
from orama_spark.query.engine import SearchIndex

SCHEMA = {"name": "string", "location": "geopoint"}

_ROW_SCHEMA = StructType(
    [
        StructField("docid", LongType()),
        StructField("name", StringType()),
        StructField(
            "location",
            StructType([StructField("lat", DoubleType()), StructField("lon", DoubleType())]),
        ),
    ]
)


def _build(spark, tmpdir_index, points):
    """points: list of (docid, name, lat, lon)."""
    cfg = IndexConfig(schema=SCHEMA)
    rows = [(i, n, (la, lo)) for i, n, la, lo in points]
    df = spark.createDataFrame(rows, _ROW_SCHEMA)
    IndexBuilder(cfg, postings_partitions=2).build(df, tmpdir_index, input_id="geo")
    idx = SearchIndex.load(spark, tmpdir_index, cfg)
    orc = OramaOracle(SCHEMA)
    for i, n, la, lo in points:
        orc.insert({"name": n, "location": {"lat": la, "lon": lo}}, docid=i)
    return idx, orc


def _assert_parity(idx, orc, where, expect_ids=None):
    got = [
        (r["docid"], r["score"])
        for r in idx.search(where=where, limit=100).top_df().collect()
    ]
    want = [(h["id"], h["score"]) for h in orc.search(where=where, limit=100)["hits"]]
    assert [g[0] for g in got] == [w[0] for w in want]
    for (_, gs), (_, ws) in zip(got, want):
        assert gs == pytest.approx(ws, rel=1e-9)
    if expect_ids is not None:
        assert [g[0] for g in got] == expect_ids
    return got


# fixtures from tests/search.geo.test.ts:5-51
def test_radius_inside_sorted_by_distance(spark, tmpdir_index):
    idx, orc = _build(
        spark, tmpdir_index,
        [(1, "p1", 9.0814233, 45.2623823), (2, "p2", 9.0979028, 45.1995182)],
    )
    where = {
        "location": {
            "radius": {
                "coordinates": {"lat": 9.1418481, "lon": 45.2324096},
                "unit": "km", "value": 10, "inside": True,
            }
        }
    }
    # reference asserts count 2 and order ['2', '1'] (closer first)
    _assert_parity(idx, orc, where, expect_ids=[2, 1])


# tests/search.geo.test.ts:53-88
def test_radius_outside(spark, tmpdir_index):
    pts = [
        (1, "a", -72.1928787, 42.9309292),
        (2, "b", -72.1928787, 42.929908),
        (3, "c", -72.1912479, 42.9302222),
        (4, "d", -72.1917844, 42.9312277),
        (5, "e", -72.1928787, 42.9309292),
        (6, "f", -10.2328721, 20.9385112),
    ]
    idx, orc = _build(spark, tmpdir_index, pts)
    where = {
        "location": {
            "radius": {
                "coordinates": {"lat": -10.2328758, "lon": 20.938517},
                "value": 10, "unit": "km", "inside": False,
            }
        }
    }
    got = _assert_parity(idx, orc, where)
    assert sorted(g[0] for g in got) == [1, 2, 3, 4, 5]


_POLY_PTS = [
    (1, "a", -50.6964111, 70.2120854),
    (2, "b", -50.7403564, 70.1823094),
    (3, "c", -51.2512207, 70.1123535),
    (4, "d", -50.8639526, 70.0796264),
    (5, "e", -50.6167603, 70.0973989),
]


# tests/search.geo.test.ts:90-125
def test_polygon_inside(spark, tmpdir_index):
    idx, orc = _build(spark, tmpdir_index, _POLY_PTS)
    where = {
        "location": {
            "polygon": {
                "coordinates": [
                    {"lat": -51.3693237, "lon": 70.4082687},
                    {"lat": -51.5643311, "lon": 69.8623282},
                    {"lat": -49.9822998, "lon": 69.8273124},
                    {"lat": -49.7543335, "lon": 70.3787763},
                    {"lat": -51.3693237, "lon": 70.4082687},
                ]
            }
        }
    }
    got = _assert_parity(idx, orc, where)
    assert sorted(g[0] for g in got) == [1, 2, 3, 4, 5]


# tests/search.geo.test.ts:127-161
def test_polygon_outside(spark, tmpdir_index):
    idx, orc = _build(spark, tmpdir_index, _POLY_PTS)
    where = {
        "location": {
            "polygon": {
                "coordinates": [
                    {"lat": -52.6779842, "lon": 71.5489379},
                    {"lat": -52.9086971, "lon": 71.2828433},
                    {"lat": -51.8759823, "lon": 71.208667},
                    {"lat": -51.5024471, "lon": 71.4932231},
                    {"lat": -52.6779842, "lon": 71.5489379},
                ],
                "inside": False,
            }
        }
    }
    got = _assert_parity(idx, orc, where)
    assert sorted(g[0] for g in got) == [1, 2, 3, 4, 5]


# tests/search.geo.test.ts:163-222 (highPrecision = vincenty)
def test_high_precision_vincenty(spark, tmpdir_index):
    idx, orc = _build(spark, tmpdir_index, _POLY_PTS)
    where = {
        "location": {
            "radius": {
                "coordinates": {"lat": -50.7403564, "lon": 70.1823094},
                "value": 10, "unit": "km", "inside": True, "highPrecision": True,
            }
        }
    }
    _assert_parity(idx, orc, where, expect_ids=[2, 1])


# tests/search.geo.test.ts:226+ (issue #547: distance-ranked geo-only)
def test_geo_only_distance_ranking(spark, tmpdir_index):
    pts = [
        (1, "Far Point", 45.5, 9.5),
        (2, "Close Point", 45.05, 9.05),
        (3, "Medium Point", 45.2, 9.2),
    ]
    idx, orc = _build(spark, tmpdir_index, pts)
    where = {
        "location": {
            "radius": {
                "coordinates": {"lat": 45.0, "lon": 9.0},
                "value": 100, "unit": "km",
            }
        }
    }
    got = _assert_parity(idx, orc, where, expect_ids=[2, 3, 1])
    # closer = strictly higher score; farthest scores exactly 1.0
    scores = [s for _, s in got]
    assert scores == sorted(scores, reverse=True)
    assert scores[-1] == pytest.approx(1.0)


def test_geo_as_filter_with_term(spark, tmpdir_index):
    """geo combined with a term: acts as a filter mask, BM25 scores."""
    pts = [
        (1, "alpha beta", 45.05, 9.05),
        (2, "alpha", 45.5, 9.5),
        (3, "alpha beta", 48.0, 11.0),
    ]
    idx, orc = _build(spark, tmpdir_index, pts)
    where = {
        "location": {
            "radius": {"coordinates": {"lat": 45.0, "lon": 9.0}, "value": 100, "unit": "km"}
        }
    }
    got = [
        (r["docid"], r["score"])
        for r in idx.search(term="alpha", where=where).top_df().collect()
    ]
    want = [(h["id"], h["score"]) for h in orc.search(term="alpha", where=where)["hits"]]
    assert [g[0] for g in got] == [w[0] for w in want] == [2, 1]
    for (_, gs), (_, ws) in zip(got, want):
        assert gs == pytest.approx(ws, rel=1e-9)


def test_geo_predicate_is_pushdown_plan(spark, tmpdir_index):
    """The radius filter must compile to one Column predicate over the
    docs scan (no join, no UDF for the default haversine path)."""
    idx, _ = _build(spark, tmpdir_index, _POLY_PTS)
    where = {
        "location": {
            "radius": {"coordinates": {"lat": -50.7, "lon": 70.2}, "value": 10, "unit": "km"}
        }
    }
    plan = idx._where.docids(where)._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan and "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEval" not in plan
