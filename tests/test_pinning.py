"""Pinning (components/pinning.ts + pinning-manager.ts): rule matching,
splice positions, promoted-from-outside docs, engine vs oracle parity."""

import pytest

from orama_spark.oracle.engine import OramaOracle
from orama_spark.query.pinning import (
    BASE_PIN_SCORE, PinCondition, PinRule, PinningStore, apply_pinning_rules,
)


def _store(rules):
    s = PinningStore()
    for r in rules:
        s.add_rule(r)
    return s


class TestRuleMatching:
    def test_anchoring(self):
        s = _store([
            PinRule("r1", [PinCondition("is", "Shoes ")], [(1, 0)]),
            PinRule("r2", [PinCondition("starts_with", "sho")], [(2, 1)]),
            PinRule("r3", [PinCondition("contains", "oe")], [(3, 2)]),
        ])
        assert {r.id for r in s.matching_rules("shoes")} == {"r1", "r2", "r3"}
        assert {r.id for r in s.matching_rules("shoelace")} == {"r2", "r3"}
        assert {r.id for r in s.matching_rules("canoe")} == {"r3"}
        assert s.matching_rules("") == []
        assert s.matching_rules(None) == []

    def test_all_conditions_and_logic(self):
        s = _store([
            PinRule("r", [PinCondition("starts_with", "a"), PinCondition("contains", "z")], [(1, 0)])
        ])
        assert s.matching_rules("az") and not s.matching_rules("ab")

    def test_duplicate_rule_id(self):
        s = _store([PinRule("r", [PinCondition("is", "x")], [(1, 0)])])
        with pytest.raises(ValueError):
            s.add_rule(PinRule("r", [], []))


class TestApply:
    RANKED = [(10, 5.0), (11, 4.0), (12, 3.0), (13, 2.0)]

    def test_pin_existing_doc_to_top(self):
        s = _store([PinRule("r", [PinCondition("is", "q")], [(12, 0)])])
        out = apply_pinning_rules(s, list(self.RANKED), "q")
        assert [i for i, _ in out] == [12, 10, 11, 13]
        assert out[0][1] == BASE_PIN_SCORE - 0

    def test_pin_outside_doc_scores_zero(self):
        s = _store([PinRule("r", [PinCondition("is", "q")], [(99, 1)])])
        out = apply_pinning_rules(s, list(self.RANKED), "q", existing_docids={99, 10, 11, 12, 13})
        assert [i for i, _ in out] == [10, 99, 11, 12, 13]
        assert dict(out)[99] == 0.0

    def test_missing_doc_skipped(self):
        s = _store([PinRule("r", [PinCondition("is", "q")], [(99, 0)])])
        out = apply_pinning_rules(s, list(self.RANKED), "q", existing_docids={10, 11, 12, 13})
        assert [i for i, _ in out] == [10, 11, 12, 13]

    def test_position_conflict_first_wins(self):
        s = _store([
            PinRule("a", [PinCondition("is", "q")], [(12, 0), (13, 0)]),
        ])
        out = apply_pinning_rules(s, list(self.RANKED), "q")
        assert out[0][0] == 12
        assert 13 in [i for i, _ in out]  # 13 stays at its organic rank

    def test_doc_promoted_twice_keeps_lower_position(self):
        s = _store([
            PinRule("a", [PinCondition("is", "q")], [(12, 3), (12, 1)]),
        ])
        out = apply_pinning_rules(s, list(self.RANKED), "q")
        assert out[1][0] == 12

    def test_position_beyond_results_appended(self):
        s = _store([PinRule("r", [PinCondition("is", "q")], [(12, 50)])])
        out = apply_pinning_rules(s, list(self.RANKED), "q")
        assert [i for i, _ in out] == [10, 11, 13, 12]

    def test_no_match_no_change(self):
        s = _store([PinRule("r", [PinCondition("is", "other")], [(12, 0)])])
        assert apply_pinning_rules(s, list(self.RANKED), "q") == self.RANKED


class TestOracleIntegration:
    def test_search_with_pinning(self):
        db = OramaOracle({"t": "string"})
        db.insert({"t": "alpha one"})      # 1
        db.insert({"t": "alpha two"})      # 2
        db.insert({"t": "alpha three"})    # 3
        db.insert({"t": "beta only"})      # 4
        store = _store([PinRule("r", [PinCondition("is", "alpha")], [(4, 0)])])
        r = db.search(term="alpha", pinning=store)
        ids = [h["id"] for h in r["hits"]]
        assert ids[0] == 4 and set(ids) == {1, 2, 3, 4}


def test_engine_parity(spark, tmp_path_factory):
    from orama_spark.build.indexer import IndexBuilder
    from orama_spark.config import IndexConfig
    from orama_spark.query.engine import SearchIndex

    rows = [
        {"docid": 1, "t": "alpha one"},
        {"docid": 2, "t": "alpha two"},
        {"docid": 3, "t": "alpha three"},
        {"docid": 4, "t": "beta only"},
        {"docid": 5, "t": "alpha four five"},
    ]
    cfg = IndexConfig(schema={"t": "string"})
    out = str(tmp_path_factory.mktemp("pinidx"))
    IndexBuilder(cfg, postings_partitions=2).build(
        spark.createDataFrame(rows), out, input_id="p"
    )
    idx = SearchIndex.load(spark, out, cfg)
    orc = OramaOracle({"t": "string"})
    for r in rows:
        orc.insert({"t": r["t"]}, docid=r["docid"])

    store = _store([
        PinRule("r1", [PinCondition("starts_with", "alp")], [(4, 1), (3, 0)]),
    ])
    sr = idx.search(term="alpha", limit=10)
    got = sr.pinned_page(store, "alpha")
    want = [(h["id"], h["score"]) for h in orc.search(term="alpha", pinning=store, limit=10)["hits"]]
    assert [g[0] for g in got] == [w[0] for w in want]
    for (gi, gs), (wi, ws) in zip(got, want):
        assert gs == pytest.approx(ws, rel=1e-9)
