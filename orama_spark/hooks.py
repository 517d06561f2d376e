"""Lifecycle hooks (SURVEY §2.11 — components/hooks.ts + the 19 hook
types in types.ts), mapped to Spark's execution model.

The reference runs per-document driver callbacks (runSingleHook /
runMultipleHook). Per-document Python callbacks are the one thing a
distributed engine must NOT offer (a 10^12-doc build cannot call back
into the driver per row), so the Spark-native mapping is:

  * batch hooks get the whole micro-batch DATAFRAME — a hook that
    wants per-doc behavior expresses it as a DataFrame transform
    (filter/withColumn/...), which then distributes like any plan
  * search hooks run on the driver per QUERY (queries are driver-side
    anyway): before_search may rewrite the params dict, after_search
    may wrap/replace the result

Hook points:
  after_create(config)                            hooks.ts AfterCreate
  before_insert_multiple(df) -> df | None         runMultipleHook
  after_insert_multiple(df, results)              runMultipleHook
  before_remove_multiple(ids_df) -> df | None
  after_remove_multiple(ids_df, stats)
  before_search(index, params) -> params | None   BeforeSearch
  after_search(index, params, result) -> result | None   AfterSearch
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable


@dataclass
class Hooks:
    after_create: list[Callable] = field(default_factory=list)
    before_insert_multiple: list[Callable] = field(default_factory=list)
    after_insert_multiple: list[Callable] = field(default_factory=list)
    before_remove_multiple: list[Callable] = field(default_factory=list)
    after_remove_multiple: list[Callable] = field(default_factory=list)
    before_search: list[Callable] = field(default_factory=list)
    after_search: list[Callable] = field(default_factory=list)

    def run_transform(self, name: str, value: Any, *extra: Any) -> Any:
        """Run hooks that may REPLACE the value (None = keep)."""
        for fn in getattr(self, name):
            out = fn(value, *extra)
            if out is not None:
                value = out
        return value

    def run_observe(self, name: str, *args: Any) -> None:
        for fn in getattr(self, name):
            fn(*args)
