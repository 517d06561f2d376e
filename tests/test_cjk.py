"""@orama/tokenizers (japanese / mandarin) coverage.

Ports the reference package's own test suites
(packages/tokenizers/tests/japanese.test.ts, mandarin.test.ts) against
the oracle engine, then proves Spark-engine rank identity on the same
corpora. Segmentation backend is script-run + han bigrams (see
kernel/cjk.py for the documented ICU divergence) — every search-level
assertion in the reference suites holds because query and document text
share the segmenter.
"""

import pytest

from orama_spark.config import IndexConfig
from orama_spark.build.indexer import IndexBuilder
from orama_spark.kernel import TokenizerConfig
from orama_spark.kernel.cjk import segment_bigram
from orama_spark.kernel.tokenizer import Tokenizer
from orama_spark.oracle.engine import OramaOracle
from orama_spark.query.engine import SearchIndex

JA_DOCS = ["東京", "大阪", "京都", "横浜", "札幌", "仙台", "広島",
           "東京大学", "京都大学", "大阪大学"]
ZH_DOCS = ["北京", "上海", "广州", "深圳", "成都", "杭州", "南京",
           "北京大学", "上海交通大学", "广州中医药大学"]

# (term, expected hit names in rank order) — the reference assertions
JA_CASES = [
    ("東京", ["東京", "東京大学"]),
    ("大阪", ["大阪", "大阪大学"]),
    ("京都", ["京都", "京都大学"]),
    ("横浜", ["横浜"]),
    ("札幌", ["札幌"]),
    ("仙台", ["仙台"]),
    ("広島", ["広島"]),
    ("大学", ["東京大学", "京都大学", "大阪大学"]),
]
ZH_CASES = [
    ("北京", ["北京", "北京大学"]),
    ("上海", ["上海", "上海交通大学"]),
    ("广州", ["广州", "广州中医药大学"]),
    ("深圳", ["深圳"]),
    ("成都", ["成都"]),
    ("南", ["南京"]),
]


class TestSegmenter:
    def test_han_bigrams(self):
        assert segment_bigram("東京大学") == ["東京", "京大", "大学"]
        assert segment_bigram("東") == ["東"]
        assert segment_bigram("") == []

    def test_script_runs_mixed(self):
        # kana runs whole, han runs bigram, punctuation dropped
        assert segment_bigram("東京で、勉強。") == ["東京", "で", "勉強"]
        # katakana incl. prolonged mark stays one run
        assert segment_bigram("カード") == ["カード"]

    def test_latin_case_preserved(self):
        # the reference wrapper never lowercases (no normalizeToken on
        # the regular path)
        assert segment_bigram("東京Apple123店") == ["東京", "Apple123", "店"]

    def test_tokenizer_dedupe_and_skip(self):
        tok = Tokenizer(TokenizerConfig(language="japanese"))
        # dict segmenter (default): 東京東京 -> 東京|東京, deduped;
        # the bigram fallback's 東京|京東 is pinned via segment_bigram
        assert tok.tokenize("東京東京") == ["東京"]
        tok_dup = Tokenizer(
            TokenizerConfig(language="japanese", allow_duplicates=True)
        )
        assert tok_dup.tokenize("東京 東京") == ["東京", "東京"]
        assert segment_bigram("東京東京") == ["東京", "京東", "東京"]


def _oracle(lang, names):
    db = OramaOracle({"name": "string"}, TokenizerConfig(language=lang))
    for n in names:
        db.insert({"name": n})
    return db


class TestReferenceSuites:
    @pytest.mark.parametrize("term,expected", JA_CASES)
    def test_japanese(self, term, expected):
        db = _oracle("japanese", JA_DOCS)
        res = db.search(term=term, threshold=0)
        assert res["count"] == len(expected)
        names = [h["document"]["name"] for h in res["hits"]]
        assert names == expected

    @pytest.mark.parametrize("term,expected", ZH_CASES)
    def test_mandarin(self, term, expected):
        db = _oracle("mandarin", ZH_DOCS)
        res = db.search(term=term, threshold=0)
        assert res["count"] == len(expected)
        names = [h["document"]["name"] for h in res["hits"]]
        assert names == expected


@pytest.fixture(scope="module")
def ja_index(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("jaidx"))
    cfg = IndexConfig(
        schema={"name": "string"},
        tokenizer=TokenizerConfig(language="japanese"),
    )
    rows = [{"docid": i + 1, "name": n} for i, n in enumerate(JA_DOCS)]
    IndexBuilder(cfg, postings_partitions=2).build(
        spark.createDataFrame(rows), out, input_id="ja"
    )
    return SearchIndex.load(spark, out, cfg)


class TestSparkParity:
    @pytest.mark.parametrize("term,expected", JA_CASES)
    def test_rank_identity(self, ja_index, term, expected):
        db = _oracle("japanese", JA_DOCS)
        ores = db.search(term=term, threshold=0)
        rows = ja_index.search(term=term, threshold=0).top_df().collect()
        assert [r["docid"] for r in rows] == [h["id"] for h in ores["hits"]]
        for r, h in zip(rows, ores["hits"]):
            assert r["score"] == pytest.approx(h["score"], rel=1e-9)
        assert [JA_DOCS[r["docid"] - 1] for r in rows] == expected


class TestSegmenterProperties:
    """Property-based hardening (hypothesis): the segmenter must never
    crash, never emit empty tokens, and preserve the word-like
    character stream in order."""

    def test_properties(self):
        from hypothesis import given, settings, strategies as st

        from orama_spark.kernel.cjk import _cls, segment_bigram

        mixed = st.text(
            alphabet=st.one_of(
                st.characters(min_codepoint=0x20, max_codepoint=0x7E),
                st.characters(min_codepoint=0x3040, max_codepoint=0x30FF),
                st.characters(min_codepoint=0x4E00, max_codepoint=0x4FFF),
                st.characters(min_codepoint=0xAC00, max_codepoint=0xACFF),
            ),
            max_size=60,
        )

        @given(mixed)
        @settings(max_examples=300, deadline=None)
        def check(text):
            toks = segment_bigram(text)
            assert all(toks), "no empty tokens"
            # non-han tokens appear verbatim in the input; han bigrams
            # are 1-2 chars of adjacent input han chars
            for t in toks:
                if _cls(t[0]) == "han":
                    assert 1 <= len(t) <= 2 and t in text
                else:
                    assert t in text
            # every emitted character is word-like (punctuation and
            # whitespace never leak into tokens)
            for t in toks:
                for ch in t:
                    assert _cls(ch) is not None

        check()

    def test_tokenizer_never_crashes_on_weird_input(self):
        from orama_spark.kernel.tokenizer import Tokenizer
        from orama_spark.kernel import TokenizerConfig

        tok = Tokenizer(TokenizerConfig(language="mandarin"))
        for s in ["", " ", "\x00", "á", "🦀🦀", "￿", "ー", "々"]:
            out = tok.tokenize(s)
            assert isinstance(out, list)
