"""Pinning: term-matched rules splice documents into fixed result
positions before pagination.

Exact port of /root/reference/packages/orama/src/components/pinning.ts
and pinning-manager.ts:13-139. This is deliberately driver-side list
manipulation: pinning operates on the (already tiny) ranked top-k page —
there is nothing distributed about it, the reference applies it to the
full ranked array and we apply it to the collected top slice (callers
must collect at least max(pinned position)+limit rows, which
``SearchResult.pinned_page`` handles).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional


@dataclass
class PinCondition:
    anchoring: str  # 'is' | 'starts_with' | 'contains'
    pattern: str


@dataclass
class PinRule:
    id: str
    conditions: list[PinCondition]
    promote: list[tuple] = field(default_factory=list)  # [(doc_id, position)]


class PinningStore:
    """create/addRule/updateRule/removeRule/getMatchingRules
    (pinning.ts:28-102)."""

    def __init__(self):
        self.rules: dict[str, PinRule] = {}

    def add_rule(self, rule: PinRule) -> None:
        if rule.id in self.rules:
            raise ValueError(f"PINNING_RULE_ALREADY_EXISTS: {rule.id}")
        self.rules[rule.id] = rule

    def update_rule(self, rule: PinRule) -> None:
        if rule.id not in self.rules:
            raise ValueError(f"PINNING_RULE_NOT_FOUND: {rule.id}")
        self.rules[rule.id] = rule

    def remove_rule(self, rule_id: str) -> bool:
        return self.rules.pop(rule_id, None) is not None

    @staticmethod
    def _matches_condition(term: str, condition: PinCondition) -> bool:
        """pinning.ts:66-79 (case-insensitive, trimmed)."""
        t = term.lower().strip()
        p = condition.pattern.lower().strip()
        if condition.anchoring == "is":
            return t == p
        if condition.anchoring == "starts_with":
            return t.startswith(p)
        if condition.anchoring == "contains":
            return p in t
        return False

    def matching_rules(self, term: Optional[str]) -> list[PinRule]:
        """AND across conditions (pinning.ts:80-102)."""
        if not term:
            return []
        return [
            r
            for r in self.rules.values()
            if all(self._matches_condition(term, c) for c in r.conditions)
        ]


BASE_PIN_SCORE = 1_000_000  # pinning-manager.ts:76


def apply_pinning_rules(
    store: PinningStore,
    ranked: list[tuple[int, float]],
    term: Optional[str],
    existing_docids: Optional[set] = None,
) -> list[tuple[int, float]]:
    """Port of applyPinningRules (pinning-manager.ts:13-139).

    ``ranked``: the ranked (docid, score) list. ``existing_docids``: the
    set of live docids (a promoted doc outside the result set must exist
    in the corpus; defaults to "assume exists").
    """
    rules = store.matching_rules(term)
    if not rules:
        return ranked

    promotions = [p for r in rules for p in r.promote]
    promotions.sort(key=lambda p: p[1])

    pinned_ids: set = set()
    promo_pos: dict = {}
    positions_taken: set[int] = set()
    for doc_id, position in promotions:
        if doc_id in promo_pos:
            if position < promo_pos[doc_id]:
                promo_pos[doc_id] = position
            continue
        if position in positions_taken:
            continue
        pinned_ids.add(doc_id)
        promo_pos[doc_id] = position
        positions_taken.add(position)

    if not promo_pos:
        return ranked

    unpinned = [(i, s) for i, s in ranked if i not in pinned_ids]
    in_results = {i for i, _ in ranked}

    pinned_results = []
    for doc_id, position in promo_pos.items():
        if doc_id in in_results:
            pinned_results.append((doc_id, BASE_PIN_SCORE - position))
        else:
            if existing_docids is None or doc_id in existing_docids:
                pinned_results.append((doc_id, 0.0))  # PR #251 behavior

    pinned_results.sort(key=lambda t: promo_pos.get(t[0], float("inf")))
    by_position = {promo_pos[i]: (i, s) for i, s in pinned_results}

    final: list[tuple[int, float]] = []
    unpinned_idx = 0
    pos = 0
    while pos < len(unpinned) + len(pinned_results):
        if pos in by_position:
            final.append(by_position[pos])
            pos += 1
        elif unpinned_idx < len(unpinned):
            final.append(unpinned[unpinned_idx])
            unpinned_idx += 1
            pos += 1
        else:
            break
    for position, item in by_position.items():
        if position >= len(final):
            final.append(item)
    return final
