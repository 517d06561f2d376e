"""Oracle vs the reference's own published test expectations.

Fixtures ported verbatim from:
  * smoke corpus    /root/reference/packages/orama/tests/smoke/smoke.test.ts:7-38
  * threshold       /root/reference/packages/orama/tests/threshold.test.ts
  * boosting        /root/reference/packages/orama/tests/boosting.test.ts:6-49
All use Orama's `create({schema})` default tokenizer profile
(no stemming, no stopwords) and default BM25 params.
"""

import pytest

from orama_spark.kernel import TokenizerConfig
from orama_spark.oracle.engine import OramaOracle


@pytest.fixture
def smoke_db():
    # search.test.ts:64-110 — stemming + English stopwords profile.
    # (tests/smoke/smoke.test.ts has stale pre-#866 expectations; the
    # maintained search.test.ts:87-93 notes exact is "now case-sensitive".)
    db = OramaOracle(
        {"quote": "string", "author": "string"},
        tokenizer=TokenizerConfig.full(),
    )
    db.insert({"quote": "the quick, brown fox jumps over the lazy dog. What a fox!", "author": "John Doe"})
    db.insert({"quote": "Foxes are nice animals. But I prefer having a dog.", "author": "John Doe"})
    db.insert({"quote": "I like dogs. They are the best.", "author": "Jane Doe"})
    db.insert({"quote": "I like cats. They are the best.", "author": "Jane Doe"})
    return db


class TestSmoke:
    def test_exact_case_sensitive_post_filter(self, smoke_db):
        # index matches stems fox/dog, then the case-sensitive \b post
        # filter drops "Foxes" (doc2) and "dogs" (doc3)
        assert smoke_db.search(term="fox", exact=True)["count"] == 1
        assert smoke_db.search(term="dog", exact=True)["count"] == 2

    def test_prefix(self, smoke_db):
        assert smoke_db.search(term="fox")["count"] == 2
        assert smoke_db.search(term="dog")["count"] == 3

    def test_tolerance(self, smoke_db):
        # 'dg'~'doe' is distance 2: the author field matches all 4 docs
        assert smoke_db.search(term="fx", tolerance=1)["count"] == 2
        assert smoke_db.search(term="dg", tolerance=2)["count"] == 4


class TestThreshold:
    def test_and_semantics_single_property(self):
        db = OramaOracle({"title": "string"})
        for t in [
            "Blue t-shirt slim fit",
            "Blue t-shirt oversize fit",
            "Red t-shirt v-neck cut",
            "Colored t-shirt slim fit",
            "Red t-shirt slim fit",
        ]:
            db.insert({"title": t})
        assert db.search(term="blue t-shirt", threshold=0)["count"] == 2
        assert db.search(term="red t-shirt", threshold=0)["count"] == 2
        assert db.search(term="slim fit", threshold=0)["count"] == 3
        assert db.search(term="red fit", threshold=0)["count"] == 1

    def test_and_semantics_two_properties(self):
        db = OramaOracle({"title": "string", "description": "string"})
        db.insert({"title": "Blue t-shirt", "description": "Beautiful blue t-shirt, slim fit. Wears well with jeans and sneakers."})
        db.insert({"title": "Blue t-shirt", "description": "Beautiful blue t-shirt. A bit oversize."})
        db.insert({"title": "Red t-shirt v-neck cut", "description": "Great t-shirt for a night out."})
        db.insert({"title": "Colored t-shirt slim fit", "description": "Colorful t-shirt, slim fit."})
        db.insert({"title": "Green t-shirt", "description": "Green t-shirt, oversize fit."})
        assert db.search(term="blue t-shirt", threshold=0)["count"] == 2
        assert db.search(term="red t-shirt", threshold=0)["count"] == 1
        assert db.search(term="slim fit", threshold=0)["count"] == 2
        assert db.search(term="oversize fit", threshold=0)["count"] == 1

    def test_threshold_one_returns_all(self):
        db = OramaOracle({"title": "string"})
        for t in [
            "Blue t-shirt slim fit",
            "Blue t-shirt oversize fit",
            "Red t-shirt v-neck cut",
            "Colored t-shirt slim fit",
        ]:
            db.insert({"title": t})
        assert db.search(term="blue t-shirt", threshold=1)["count"] == 4
        assert db.search(term="slim fit", threshold=1)["count"] == 3

    def test_fractional_threshold(self):
        db = OramaOracle({"title": "string"})
        for t in [
            "Blue t-shirt slim fit",
            "Blue t-shirt oversize fit",
            "Red t-shirt v-neck cut",
            "Colored t-shirt slim fit",
        ]:
            db.insert({"title": t})
        assert db.search(term="blue t-shirt", threshold=0.6)["count"] == 4
        assert db.search(term="slim fit", threshold=0.7)["count"] == 3

    def test_issue_911_prefix_with_threshold_zero(self):
        db = OramaOracle({"title": "string"})
        db.insert({"title": "Phone, phonogram"})
        db.insert({"title": "Bet, better"})
        db.insert({"title": "Some random sentence"})
        db.insert({"title": "The quick brown fox jumps over the lazy dog"})
        cases = [
            ("p", 1), ("ph", 1), ("pho", 1), ("phone", 1), ("phono", 1),
            ("b", 2), ("be", 1), ("bet", 1), ("bett", 1), ("bet hi", 0),
            ("s", 1), ("r", 1), ("se", 1), ("so", 1),
            ("some random se", 1), ("some random stuff", 0),
            ("the qui", 1), ("the quick brown dog", 1),
        ]
        for term, expected in cases:
            got = db.search(term=term, threshold=0)["count"]
            assert got == expected, f"term={term!r}: {got} != {expected}"


class TestBoosting:
    def _db(self):
        db = OramaOracle({"id": "string", "title": "string", "description": "string"})
        db.insert({
            "id": "1",
            "title": "Powerful computer with 16GB RAM",
            "description": "A powerful computer with 16GB RAM and a 1TB SSD, perfect for gaming and video editing.",
        })
        db.insert({
            "id": "2",
            "title": "PC with 8GB RAM. Good for gaming and browsing the web.",
            "description": "A personal computer with 8GB RAM and a 500GB SSD, perfect for browsing the web and watching movies. This computer is also great for kids.",
        })
        return db

    def test_boost_raises_score(self):
        db = self._db()
        h1 = db.search(term="computer for browsing and movies")["hits"]
        h2 = db.search(term="computer for browsing and movies", boost={"title": 2.5})["hits"]
        assert h1[0]["score"] < h2[0]["score"]

    def test_invalid_boost(self):
        db = self._db()
        with pytest.raises(ValueError):
            db.search(term="computer", boost={"title": 0})


class TestFacetsReference:
    def test_nested_schema_facets(self):
        # facets.test.ts:5-90 (verbatim corpus + expectations)
        db = OramaOracle(
            {
                "author": "string",
                "quote": "string",
                "meta": {"tag": "string", "isFavorite": "boolean"},
            }
        )
        db.insert({"author": "Mahatma Gandhi", "quote": "Be the change you wish to see in the world", "meta": {"tag": "inspirational", "isFavorite": True}})
        db.insert({"author": "Thomas A. Edison", "quote": "I have not failed. I've just found 10,000 ways that won't work.", "meta": {"tag": "inspirational", "isFavorite": True}})
        db.insert({"author": "Confucius", "quote": "It does not matter how slowly you go as long as you do not stop.", "meta": {"tag": "inspirational", "isFavorite": False}})
        db.insert({"author": "Helen Keller", "quote": "The best and most beautiful things in the world cannot be seen or even touched - they must be felt with the heart.", "meta": {"tag": "love", "isFavorite": True}})
        db.insert({"author": "Steve Jobs", "quote": "Your time is limited, so don't waste it living someone else's life.", "meta": {"tag": "inspirational", "isFavorite": False}})
        db.insert({"author": "Steve Jobs", "quote": "The only way to do great work is to love what you do.", "meta": {"tag": "inspirational", "isFavorite": False}})
        r = db.search(
            term="work time",
            facets={"meta.isFavorite": {}, "meta.tag": {}, "author": {}},
        )
        assert r["facets"]["meta.isFavorite"]["count"] == 2
        assert r["facets"]["meta.isFavorite"]["values"] == {"true": 1, "false": 2}
        assert r["facets"]["meta.tag"]["count"] == 1
        assert r["facets"]["meta.tag"]["values"] == {"inspirational": 3}
        assert r["facets"]["author"]["count"] == 2
        assert r["facets"]["author"]["values"] == {"Steve Jobs": 2, "Thomas A. Edison": 1}


class TestSearchBasics:
    def test_empty_term_returns_all_docs_score_zero(self):
        # search.test.ts:9-31 — empty term returns all docs with score 0
        db = OramaOracle({"quote": "string"})
        db.insert({"quote": "a"})
        db.insert({"quote": "b"})
        r = db.search(term="")
        assert r["count"] == 2
        assert all(h["score"] == 0 for h in r["hits"])

    def test_pagination(self):
        db = OramaOracle({"t": "string"})
        for i in range(25):
            db.insert({"t": f"common word{i}"})
        r = db.search(term="common", limit=10, offset=20)
        assert r["count"] == 25
        assert len(r["hits"]) == 5

    def test_tie_break_by_docid(self):
        db = OramaOracle({"t": "string"})
        db.insert({"t": "same text here"})
        db.insert({"t": "same text here"})
        r = db.search(term="same")
        assert [h["id"] for h in r["hits"]] == [1, 2]

    def test_filters_semijoin_masks_scoring(self):
        db = OramaOracle({"t": "string", "n": "number", "flag": "boolean"})
        db.insert({"t": "alpha beta", "n": 1, "flag": True})
        db.insert({"t": "alpha gamma", "n": 5, "flag": False})
        db.insert({"t": "alpha delta", "n": 10, "flag": True})
        assert db.search(term="alpha", where={"n": {"gt": 3}})["count"] == 2
        assert db.search(term="alpha", where={"n": {"between": [0, 6]}})["count"] == 2
        assert db.search(term="alpha", where={"flag": True})["count"] == 2
        assert db.search(term="alpha", where={"and": [{"n": {"gt": 3}}, {"flag": True}]})["count"] == 1
        assert db.search(term="alpha", where={"or": [{"n": {"lt": 2}}, {"n": {"gt": 8}}]})["count"] == 2
        assert db.search(term="alpha", where={"not": {"flag": True}})["count"] == 1

    def test_filter_only_query_scores_zero(self):
        db = OramaOracle({"t": "string", "n": "number"})
        db.insert({"t": "x", "n": 1})
        db.insert({"t": "y", "n": 9})
        r = db.search(where={"n": {"gte": 5}})
        assert r["count"] == 1 and r["hits"][0]["score"] == 0

    def test_distinct_on(self):
        db = OramaOracle({"t": "string", "cat": "enum"})
        db.insert({"t": "w w w", "cat": "a"})   # 1
        db.insert({"t": "w", "cat": "a"})       # 2
        db.insert({"t": "w w", "cat": "b"})     # 3
        r = db.search(term="w", distinct_on="cat")
        assert r["count"] == 3
        assert sorted(h["document"]["cat"] for h in r["hits"]) == ["a", "b"]

    def test_facets_string_and_number(self):
        db = OramaOracle({"t": "string", "cat": "enum", "n": "number", "lang": "string"})
        db.insert({"t": "w", "cat": "a", "n": 5, "lang": "en"})
        db.insert({"t": "w", "cat": "b", "n": 15, "lang": "en"})
        db.insert({"t": "w", "cat": "a", "n": 25, "lang": "fr"})
        r = db.search(
            term="w",
            facets={
                "lang": {},
                "n": {"ranges": [{"from": 0, "to": 10}, {"from": 10, "to": 20}, {"from": 0, "to": 30}]},
            },
        )
        assert r["facets"]["lang"]["values"] == {"en": 2, "fr": 1}
        # a doc counts in EVERY overlapping range (facets.ts:139-157)
        assert r["facets"]["n"]["values"] == {"0-10": 1, "10-20": 1, "0-30": 3}

    def test_groups_single_property(self):
        db = OramaOracle({"t": "string", "cat": "enum"})
        db.insert({"t": "w w w w", "cat": "a"})  # highest score
        db.insert({"t": "w", "cat": "a"})
        db.insert({"t": "w w", "cat": "b"})
        r = db.search(term="w", group_by={"properties": ["cat"], "maxResult": 1})
        groups = {tuple(g["values"]): [h["id"] for h in g["result"]] for g in r["groups"]}
        assert groups[("a",)] == [1]
        assert groups[("b",)] == [3]

    def test_sort_by_property(self):
        db = OramaOracle({"t": "string", "n": "number"})
        db.insert({"t": "w", "n": 5})
        db.insert({"t": "w", "n": 1})
        db.insert({"t": "w"})  # missing n goes LAST (sorter.ts:268-277)
        r = db.search(term="w", sort_by={"property": "n", "order": "ASC"})
        assert [h["id"] for h in r["hits"]] == [2, 1, 3]
        r = db.search(term="w", sort_by={"property": "n", "order": "DESC"})
        assert [h["id"] for h in r["hits"]] == [1, 2, 3]

    def test_exact_post_filter_case_sensitive(self):
        # issue #866 semantics (search-fulltext.ts:88-115)
        db = OramaOracle({"t": "string"})
        db.insert({"t": "The War of the Worlds"})
        db.insert({"t": "war never changes"})
        r = db.search(term="war", exact=True)
        assert [h["id"] for h in r["hits"]] == [2]

    def test_enum_filters(self):
        db = OramaOracle({"t": "string", "cat": "enum", "tags": "enum[]"})
        db.insert({"t": "w", "cat": "a", "tags": ["x", "y"]})
        db.insert({"t": "w", "cat": "b", "tags": ["y", "z"]})
        db.insert({"t": "w", "cat": "c", "tags": ["z"]})
        assert db.search(term="w", where={"cat": {"eq": "a"}})["count"] == 1
        assert db.search(term="w", where={"cat": {"in": ["a", "b"]}})["count"] == 2
        assert db.search(term="w", where={"cat": {"nin": ["a"]}})["count"] == 2
        assert db.search(term="w", where={"tags": {"containsAll": ["y", "z"]}})["count"] == 1
        assert db.search(term="w", where={"tags": {"containsAny": ["x", "z"]}})["count"] == 3
