"""Lifecycle hooks (SURVEY §2.11, components/hooks.ts): batch-DataFrame
transform hooks distribute as plans; search hooks run per query."""

import pytest
from pyspark.sql import functions as F

from orama_spark.build.indexer import IndexBuilder
from orama_spark.build.maintenance import remove_documents
from orama_spark.config import IndexConfig
from orama_spark.hooks import Hooks
from orama_spark.query.engine import SearchIndex

ROWS = [
    {"docid": 1, "t": "alpha beta", "spam": False},
    {"docid": 2, "t": "alpha gamma", "spam": True},
    {"docid": 3, "t": "beta delta", "spam": False},
]


def test_insert_transform_search_rewrite_and_observers(spark, tmpdir_index):
    calls = {"create": 0, "after_insert": 0, "after_remove": 0}

    def drop_spam(df):          # before_insert_multiple: a TRANSFORM —
        return df.where(~F.col("spam"))  # distributes like any plan

    def count_create(cfg):
        calls["create"] += 1

    def count_insert(df, results):
        calls["after_insert"] += 1

    def rewrite_query(params, index):  # before_search
        if params["term"] == "forbidden":
            params = dict(params, term="beta")
        return params

    def cap_limit(result, index):      # after_search
        result.limit = min(result.limit, 2)
        return result

    def count_remove(ids_df, stats):
        calls["after_remove"] += 1

    hooks = Hooks(
        after_create=[count_create],
        before_insert_multiple=[drop_spam],
        after_insert_multiple=[count_insert],
        before_search=[rewrite_query],
        after_search=[cap_limit],
        before_remove_multiple=[],
        after_remove_multiple=[count_remove],
    )
    cfg = IndexConfig(schema={"t": "string", "spam": "boolean"}, hooks=hooks)
    IndexBuilder(cfg, postings_partitions=2).build(
        spark.createDataFrame(ROWS), tmpdir_index, input_id="hooks"
    )
    idx = SearchIndex.load(spark, tmpdir_index, cfg)
    # the spam doc never entered the index
    assert idx.stats["docs_count"] == 2
    assert idx.search(term="alpha", limit=10).count() == 1
    # before_search rewrote the term; after_search capped the page
    sr = idx.search(term="forbidden", limit=10)
    assert sorted(r["docid"] for r in sr.scored.collect()) == [1, 3]
    assert sr.limit == 2
    # observers fired
    remove_documents(spark, tmpdir_index, cfg,
                     spark.createDataFrame([(1,)], "docid long"))
    assert calls == {"create": 1, "after_insert": 1, "after_remove": 1}
