"""String sortBy uses ICU locale collation, not binary order.

The reference sorts string properties with ``a.localeCompare(b, lang)``
(components/sorter.ts:166-172).  The golden orders below are PINNED
from Node 'string'.localeCompare (ICU — the very backend the reference
runs on):

  node -e 'const de=[...]; de.sort((a,b)=>a.localeCompare(b,"de"))'

Spark 4's ``F.collate(col, "de")`` was verified to reproduce them
exactly; this test keeps that parity pinned.
"""

import pytest
from pyspark.sql import functions as F

from orama_spark.build.indexer import IndexBuilder
from orama_spark.config import IndexConfig
from orama_spark.kernel import TokenizerConfig
from orama_spark.query.engine import SearchIndex, icu_collation_for

pytestmark = pytest.mark.skipif(
    not hasattr(F, "collate"), reason="Spark without collation support"
)

# node localeCompare(…, "de") order of the raw list
DE_WORDS = ["Äpfel", "apfel", "Zebra", "zange", "Öl", "oase", "über",
            "Uhr", "straße", "Strasse", "élan", "Elan", "banane"]
DE_GOLDEN = ["apfel", "Äpfel", "banane", "Elan", "élan", "oase", "Öl",
             "Strasse", "straße", "über", "Uhr", "zange", "Zebra"]

# node localeCompare(…, "tr") — dotted/dotless i, ç/ş ordering
TR_WORDS = ["ışık", "irmak", "Iğdır", "İstanbul", "istanbul", "cam",
            "çam", "şeker", "seker", "ucuz", "üzüm", "zeytin", "ağaç"]
TR_GOLDEN = ["ağaç", "cam", "çam", "Iğdır", "ışık", "irmak", "istanbul",
             "İstanbul", "seker", "şeker", "ucuz", "üzüm", "zeytin"]


def _build(spark, tmp_path_factory, words, language, tag):
    cfg = IndexConfig(
        schema={"t": "string", "name": "string"},
        tokenizer=TokenizerConfig(language=language, stemming=False),
    )
    rows = [
        {"docid": i + 1, "t": "wort", "name": w}
        for i, w in enumerate(words)
    ]
    out = str(tmp_path_factory.mktemp(f"locsort_{tag}"))
    IndexBuilder(cfg, postings_partitions=2).build(
        spark.createDataFrame(rows), out, input_id=tag
    )
    return SearchIndex.load(spark, out, cfg)


@pytest.fixture(scope="module")
def idx_de(spark, tmp_path_factory):
    return _build(spark, tmp_path_factory, DE_WORDS, "german", "de")


@pytest.fixture(scope="module")
def idx_tr(spark, tmp_path_factory):
    return _build(spark, tmp_path_factory, TR_WORDS, "turkish", "tr")


def _names(idx, **kw):
    sr = idx.search(term="wort")
    return [
        r["name"]
        for r in idx.sorted_hits_df(sr, "name", limit=50, **kw).collect()
    ]


class TestLocaleCollation:
    def test_german_asc_matches_localeCompare(self, idx_de):
        assert _names(idx_de) == DE_GOLDEN

    def test_german_desc_is_reverse(self, idx_de):
        assert _names(idx_de, order="DESC") == DE_GOLDEN[::-1]

    def test_turkish_asc_matches_localeCompare(self, idx_tr):
        assert _names(idx_tr) == TR_GOLDEN

    def test_binary_optout_differs(self, idx_de):
        """collation=None keeps raw binary order — documented escape
        hatch, and proof the collation path actually changes the plan."""
        raw = _names(idx_de, collation=None)
        assert raw == sorted(DE_WORDS)
        assert raw != DE_GOLDEN

    def test_every_language_maps_to_a_collation(self):
        from orama_spark.kernel.tokenizer import SPLITTERS

        for lang in SPLITTERS:
            assert icu_collation_for(lang), lang

    def test_plan_stays_takeordered(self, idx_de):
        """F.collate is JVM-side: the collated sort must keep the
        TakeOrdered pagination (no single-partition window, no
        EvalPython)."""
        sr = idx_de.search(term="wort")
        plan = (
            idx_de.sorted_hits_df(sr, "name", limit=5)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "Exchange SinglePartition" not in plan
        assert "EvalPython" not in plan
