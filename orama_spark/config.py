"""Engine configuration: schema + tokenizer profile + BM25 params.

Mirrors Orama's ``create({schema, components: {tokenizer}})``
(methods/create.ts:76-218): the schema declares which properties are
searchable (string-typed) vs filter-only, and the tokenizer profile is
fixed per index (tokenization must be identical at build and query time,
tokenizer/index.ts:57-93).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from .hooks import Hooks
from .kernel.bm25 import BM25Params, DEFAULT_BM25
from .kernel.tokenizer import TokenizerConfig

_STRING_TYPES = ("string", "string[]")


@dataclass
class IndexConfig:
    """Schema: property -> Orama type ('string', 'number', 'boolean',
    'enum', 'string[]', 'enum[]', 'number[]', 'boolean[]').

    Only string-typed properties are indexed for full-text search
    (search-fulltext.ts:35-45); the rest are filterable/facetable
    columns that stay native Spark predicates."""

    schema: dict[str, str]
    tokenizer: TokenizerConfig = field(default_factory=TokenizerConfig)
    bm25: BM25Params = DEFAULT_BM25
    docid_col: str = "docid"
    # lifecycle hooks (hooks.py): batch-DataFrame transforms + search
    # callbacks; NOT hashed into the build fingerprint (callables) —
    # reflect data-changing insert hooks in build(input_id=...)
    hooks: Hooks = field(default_factory=Hooks)

    @property
    def searchable_fields(self) -> list[str]:
        return [p for p, t in self.schema.items() if t in _STRING_TYPES]

    def validate(self) -> None:
        if not self.searchable_fields:
            raise ValueError("schema has no string-typed searchable property")
