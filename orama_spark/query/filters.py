"""Where-clause compilation: Orama filter dicts -> Spark plans.

Reference: searchByWhereClause (components/index.ts:594-771).
Semantics: implicit AND across filter keys; and/or/not combinators;
exactly one operator per number/enum property (index.ts:713-715);
string filters tokenize the value and exact-match each token, unioning
doc sets (index.ts:699-709).

Compilation strategy (scale-first):
  * a tree whose leaves are all plain-column predicates (number / bool /
    enum) compiles to ONE Column expression — Catalyst pushes it into
    the docs parquet scan (predicate pushdown + row-group pruning), and
    the filter mask costs a single scan.
  * string-typed leaves need the postings table (tokens are not stored
    on docs); those become docid-set DataFrames combined with
    semi-join set algebra. Mixed trees fall back to set algebra with
    column-leaf subtrees still compiled to single predicates.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import Column, DataFrame, functions as F

from ..config import IndexConfig

_NUM_OPS = ("gt", "gte", "lt", "lte", "eq", "between")


def _has_string_leaf(config: IndexConfig, where: dict) -> bool:
    for key, val in where.items():
        if key in ("and", "or"):
            if any(_has_string_leaf(config, w) for w in val):
                return True
        elif key == "not":
            if _has_string_leaf(config, val):
                return True
        elif config.schema.get(key) in ("string", "string[]"):
            return True
    return False


def _leaf_predicate(config: IndexConfig, prop: str, operation) -> Column:
    typ = config.schema.get(prop)
    if typ is None:
        raise ValueError(f"UNKNOWN_FILTER_PROPERTY: {prop}")
    col = F.col(prop)
    is_array = typ.endswith("[]")

    if typ in ("boolean", "boolean[]"):
        if is_array:
            return F.array_contains(col, bool(operation))
        return col.isNotNull() & (col == bool(operation))

    if typ in ("enum", "enum[]"):
        if not isinstance(operation, dict) or len(operation) != 1:
            raise ValueError(f"INVALID_FILTER_OPERATION: {operation}")
        op, val = next(iter(operation.items()))
        if is_array:
            # trees/flat.ts:95-126
            if op == "containsAll":
                if not val:
                    return F.lit(False)
                pred = F.lit(True)
                for v in val:
                    pred = pred & F.array_contains(col, v)
                return pred
            if op == "containsAny":
                if not val:
                    return F.lit(False)
                return F.arrays_overlap(col, F.array(*[F.lit(v) for v in val]))
            raise ValueError(f"INVALID_FILTER_OPERATION: {op}")
        # trees/flat.ts:50-93
        if op == "eq":
            return col.isNotNull() & (col == val)
        if op == "in":
            return col.isNotNull() & col.isin(list(val))
        if op == "nin":
            # docs that HAVE the property with a value outside the list
            return col.isNotNull() & ~col.isin(list(val))
        raise ValueError(f"INVALID_FILTER_OPERATION: {op}")

    if typ == "geopoint":
        from .geo import geo_predicate

        return geo_predicate(prop, operation)

    if typ in ("number", "number[]"):
        if not isinstance(operation, dict) or len(operation) != 1:
            raise ValueError(f"INVALID_FILTER_OPERATION: {operation}")
        op, val = next(iter(operation.items()))
        if op not in _NUM_OPS:
            raise ValueError(f"INVALID_FILTER_OPERATION: {op}")

        def scalar_pred(c: Column) -> Column:
            if op == "gt":
                return c > val
            if op == "gte":
                return c >= val
            if op == "lt":
                return c < val
            if op == "lte":
                return c <= val
            if op == "eq":
                return c == val
            return (c >= val[0]) & (c <= val[1])

        if is_array:
            return F.exists(col, scalar_pred)
        return col.isNotNull() & scalar_pred(col)

    raise ValueError(f"filter on unsupported type {typ} ({prop})")


def compile_column_predicate(config: IndexConfig, where: dict) -> Column:
    """Whole-tree compilation to one Column (no string leaves)."""
    preds: list[Column] = []
    for key, val in where.items():
        if key == "and":
            if not val:
                preds.append(F.lit(False))  # empty and -> empty set (index.ts:603-605)
            else:
                p = compile_column_predicate(config, val[0])
                for w in val[1:]:
                    p = p & compile_column_predicate(config, w)
                preds.append(p)
        elif key == "or":
            if not val:
                preds.append(F.lit(False))
            else:
                p = compile_column_predicate(config, val[0])
                for w in val[1:]:
                    p = p | compile_column_predicate(config, w)
                preds.append(p)
        elif key == "not":
            preds.append(~compile_column_predicate(config, val))
        else:
            preds.append(_leaf_predicate(config, key, val))
    out = preds[0]
    for p in preds[1:]:
        out = out & p  # implicit AND across keys (index.ts:770)
    return out


class WhereCompiler:
    """Compiles a where tree against (docs, postings) into a docid set."""

    def __init__(self, config: IndexConfig, docs: DataFrame, postings: DataFrame, tokenizer):
        self.config = config
        self.docs = docs
        self.postings = postings
        self.tokenizer = tokenizer
        self.docid = config.docid_col

    def docids(self, where: dict) -> DataFrame:
        """DataFrame with one column ``docid`` = the filter-passing set."""
        if not _has_string_leaf(self.config, where):
            pred = compile_column_predicate(self.config, where)
            return self.docs.where(pred).select(F.col(self.docid).alias("docid"))
        return self._set_algebra(where)

    def _set_algebra(self, where: dict) -> DataFrame:
        sets: list[DataFrame] = []
        for key, val in where.items():
            if key == "and":
                if not val:
                    return self._empty()
                cur = self._set_algebra(val[0])
                for w in val[1:]:
                    cur = cur.join(self._set_algebra(w), "docid", "left_semi")
                sets.append(cur)
            elif key == "or":
                if not val:
                    return self._empty()
                cur = self._set_algebra(val[0])
                for w in val[1:]:
                    cur = cur.unionByName(self._set_algebra(w))
                sets.append(cur.distinct())
            elif key == "not":
                universe = self.docs.select(F.col(self.docid).alias("docid"))
                sets.append(universe.join(self._set_algebra(val), "docid", "left_anti"))
            elif self.config.schema.get(key) in ("string", "string[]"):
                vals = val if isinstance(val, list) else [val]
                tokens: list[str] = []
                for raw in vals:
                    tokens.extend(self.tokenizer.tokenize(raw, key))
                if not tokens:
                    sets.append(self._empty())
                else:
                    sets.append(
                        self.postings.where(
                            (F.col("field") == key) & F.col("term").isin(tokens)
                        )
                        .select("docid")
                        .distinct()
                    )
            else:
                pred = _leaf_predicate(self.config, key, val)
                sets.append(
                    self.docs.where(pred).select(F.col(self.docid).alias("docid"))
                )
        out = sets[0]
        for s in sets[1:]:
            out = out.join(s, "docid", "left_semi")
        return out

    def _empty(self) -> DataFrame:
        return self.docs.select(F.col(self.docid).alias("docid")).where(F.lit(False))
