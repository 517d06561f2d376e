"""M1 gates: extractor byte-identity + distributed determinism of the
synthetic web corpus (BASELINE.json input_hint invariant)."""

import numpy as np
import pytest

from orama_spark.sources.webpages import (
    CorpusGenerator,
    corpus_df,
    extract_text,
    html_escape,
    html_unescape,
    render_html,
)


class TestExtractor:
    def test_roundtrip_byte_identity(self):
        g = CorpusGenerator(seed=42)
        cols = g.batch(np.arange(200, dtype=np.int64))
        for html, text in zip(cols["html"], cols["text"]):
            assert extract_text(html) == text

    def test_roundtrip_with_markup_chars(self):
        for text in [
            "a < b & b > c",
            "&amp; already escaped",
            "<p>nested</p>",
            "",
            "unicode café 世界 ß",
            "</p></body> sneaky terminator",
        ]:
            assert extract_text(render_html(text, text[:10])) == text

    def test_escape_unescape_inverse(self):
        s = "&<>&amp;&lt;x"
        assert html_unescape(html_escape(s)) == s


class TestDeterminism:
    def test_same_ids_same_rows(self):
        a = CorpusGenerator(seed=42).batch(np.array([5, 99, 1234], dtype=np.int64))
        b = CorpusGenerator(seed=42).batch(np.array([5, 99, 1234], dtype=np.int64))
        assert a["text"] == b["text"]
        assert a["url"] == b["url"]

    def test_batch_independent_of_grouping(self):
        g = CorpusGenerator(seed=42)
        whole = g.batch(np.arange(10, dtype=np.int64))
        parts = [g.page(i) for i in range(10)]
        assert [p["text"] for p in parts] == list(whole["text"])

    def test_url_sorted_order_equals_docid_order(self):
        # docid tie-break contract: sorted url == sorted doc_id
        # (SURVEY.md §1.3) — urls embed the zero-padded id
        g = CorpusGenerator(seed=42)
        cols = g.batch(np.arange(500, dtype=np.int64))
        keyed = sorted(range(500), key=lambda i: cols["url"][i].split("/")[-1])
        assert keyed == list(range(500))

    def test_zipf_skew_present(self):
        g = CorpusGenerator(seed=42)
        cols = g.batch(np.arange(300, dtype=np.int64))
        from collections import Counter

        c = Counter(w for t in cols["text"] for w in t.split())
        counts = [n for _, n in c.most_common()]
        # hot term dominates the median term by >20x (posting skew real)
        assert counts[0] > 20 * counts[len(counts) // 2]

    def test_spark_generation_matches_local(self, spark):
        df = corpus_df(spark, 50, partitions=4).orderBy("doc_id")
        rows = df.collect()
        g = CorpusGenerator(seed=42)
        local = g.batch(np.arange(50, dtype=np.int64))
        assert [r["text"] for r in rows] == list(local["text"])
        assert [bytes(r["html"]) for r in rows] == list(local["html"])
        for r in rows:
            assert extract_text(bytes(r["html"])) == r["text"]
