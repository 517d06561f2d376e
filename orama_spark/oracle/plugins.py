"""Pure-Python oracle for the alternative scorer plugins.

PT15 (plugin-pt15/src/algorithm.ts:22-199): 15 position buckets, every
token prefix stored at the token's scaled position, score = sum of
positions of stored prefixes equal to a query token, merged across
properties (boost per property).
"""

from __future__ import annotations

from typing import Optional

from ..kernel.tokenizer import Tokenizer, TokenizerConfig

MAX_POSITION = 15


def _get_position(n: int, total: int) -> int:
    if total < MAX_POSITION:
        return n
    return (n * MAX_POSITION) // total


class PT15Oracle:
    def __init__(self, schema: dict, tokenizer: TokenizerConfig | None = None):
        self.schema = schema
        self.tokenizer = Tokenizer(tokenizer or TokenizerConfig())
        # prop -> [15 x {prefix: [docid, ...]}]
        self.storage: dict[str, list[dict[str, list[int]]]] = {
            p: [dict() for _ in range(MAX_POSITION)]
            for p, t in schema.items()
            if t in ("string", "string[]")
        }

    def insert(self, doc: dict, docid: int) -> None:
        for prop, storage in self.storage.items():
            value = doc.get(prop)
            values = value if isinstance(value, list) else [value]
            for v in values:
                if not isinstance(v, str):
                    continue
                tokens = self.tokenizer.tokenize(v, prop)
                n = len(tokens)
                for i, token in enumerate(tokens):
                    pos = MAX_POSITION - _get_position(i, n) - 1
                    bucket = storage[pos]
                    for j in range(len(token), 0, -1):
                        bucket.setdefault(token[:j], []).append(docid)

    def search(
        self,
        term: str,
        boost: Optional[dict[str, float]] = None,
        limit: int = 10,
    ) -> list[tuple[int, float]]:
        boost = boost or {}
        tokens = self.tokenizer.tokenize(term)
        ret: dict[int, float] = {}
        for prop, storage in self.storage.items():
            b = boost.get(prop, 1.0)
            for token in tokens:
                for i in range(MAX_POSITION):
                    for docid in storage[i].get(token, []):
                        ret[docid] = ret.get(docid, 0.0) + i * b
        out = sorted(ret.items(), key=lambda kv: (-kv[1], kv[0]))
        return out[:limit]


class QPSOracle:
    """QPS port (plugin-qps/src/algorithm.ts:76-215) with the SAME
    documented deterministic accumulation order as query/qps.py
    (property order, then term lexicographic)."""

    BIT_MASK_20 = (1 << 20) - 1

    def __init__(self, schema: dict, tokenizer: TokenizerConfig | None = None):
        self.schema = schema
        self.tokenizer = Tokenizer(tokenizer or TokenizerConfig())
        self.props = [p for p, t in schema.items() if t == "string"]
        # prop -> docid -> token -> (occ, mask); prop -> docid -> tokens_len
        self.quantums: dict[str, dict[int, dict[str, tuple[int, int]]]] = {
            p: {} for p in self.props
        }
        self.tokens_len: dict[str, dict[int, int]] = {p: {} for p in self.props}

    def insert(self, doc: dict, docid: int) -> None:
        from ..query.qps import token_quantums

        for prop in self.props:
            v = doc.get(prop)
            if not isinstance(v, str):
                continue
            q, n = token_quantums(v, self.tokenizer, prop)
            self.quantums[prop][docid] = q
            self.tokens_len[prop][docid] = n

    def search(
        self,
        term: str,
        exact: bool = False,
        tolerance: int = 0,
        boost: Optional[dict[str, float]] = None,
        limit: int = 10,
    ) -> list[tuple[int, float]]:
        from ..kernel.levenshtein import is_bounded

        boost = boost or {}
        qtokens = self.tokenizer.tokenize(term)
        qset = set(qtokens)

        def matches(word: str) -> bool:
            for t in qtokens:
                if exact:
                    if word == t:
                        return True
                elif tolerance:
                    if is_bounded(t, word, tolerance):
                        return True
                elif word.startswith(t):
                    return True
            return False

        # per doc: ordered (prop, term) matched entries, then the
        # reference's fold (algorithm.ts:186-207)
        per_doc: dict[int, list[tuple]] = {}
        for prop in self.props:
            b = boost.get(prop, 1.0)
            for docid, q in self.quantums[prop].items():
                for word, (occ, mask) in q.items():
                    if matches(word):
                        per_doc.setdefault(docid, []).append((prop, word, occ, mask, b))
        out = []
        order = {p: i for i, p in enumerate(self.props)}
        for docid, entries in per_doc.items():
            entries.sort(key=lambda e: (order[e[0]], e[1]))
            total, acc = 0.0, 0
            for prop, word, occ, mask, b in entries:
                mask &= self.BIT_MASK_20
                n = self.tokens_len[prop][docid]
                score = (occ * occ / n + (1 if word in qset else 0)) * b
                total += bin(acc & mask).count("1") * 2 + score
                acc |= mask
            out.append((docid, total))
        out.sort(key=lambda kv: (-kv[1], kv[0]))
        return out[:limit]
