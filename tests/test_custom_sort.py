"""sortBy custom sorter surface (types.ts:260-265): a vectorized sort
KEY — Column expression or Arrow-batched Python function — replaces the
reference's sequential JS comparator. Verified against a driver-side
Python sort of the same hits."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from orama_spark.config import IndexConfig
from orama_spark.build.indexer import IndexBuilder
from orama_spark.kernel import TokenizerConfig
from orama_spark.query.engine import SearchIndex

ROWS = [
    {"docid": 1, "t": "alpha beta gamma", "rank_hint": 5},
    {"docid": 2, "t": "alpha beta", "rank_hint": 2},
    {"docid": 3, "t": "alpha delta epsilon", "rank_hint": None},
    {"docid": 4, "t": "alpha omega", "rank_hint": 9},
    {"docid": 5, "t": "alpha", "rank_hint": 2},
]


@pytest.fixture(scope="module")
def idx(spark, tmp_path_factory):
    cfg = IndexConfig(schema={"t": "string", "rank_hint": "number"})
    out = str(tmp_path_factory.mktemp("csidx"))
    IndexBuilder(cfg, postings_partitions=2).build(
        spark.createDataFrame(ROWS), out, input_id="cs"
    )
    return SearchIndex.load(spark, out, cfg)


def _expected(key_fn, order, hits=ROWS):
    present = [r for r in hits if key_fn(r) is not None]
    missing = [r for r in hits if key_fn(r) is None]
    rev = order == "DESC"
    present.sort(
        key=lambda r: (key_fn(r), -r["docid"] if rev else r["docid"]),
        reverse=rev,
    )
    return [r["docid"] for r in present + missing]


def test_python_key_function(idx):
    res = idx.search(term="alpha")
    got = [
        r["docid"]
        for r in idx.sorted_hits_by_key_df(
            res,
            lambda pdf: pd.Series(
                [None if v is None else -float(v) for v in pdf["rank_hint"]],
                dtype="float64",
            ),
        ).collect()
    ]
    assert got == _expected(
        lambda r: None if r["rank_hint"] is None else -r["rank_hint"], "ASC"
    )


def test_column_key_and_desc(idx):
    res = idx.search(term="alpha")
    got = [
        r["docid"]
        for r in idx.sorted_hits_by_key_df(
            res, F.length("t").cast("double"), order="DESC"
        ).collect()
    ]
    assert got == _expected(lambda r: len(r["t"]), "DESC")


def test_nulls_last_both_directions(idx):
    res = idx.search(term="alpha")
    for order in ("ASC", "DESC"):
        got = [
            r["docid"]
            for r in idx.sorted_hits_by_key_df(
                res, F.col("rank_hint").cast("double"), order=order
            ).collect()
        ]
        assert got[-1] == 3, (order, got)  # null rank_hint always last
