"""Pure-Python oracle: a single-process engine with Orama-exact semantics.

This is the golden reference the distributed Spark engine is tested
against (rank-identical top-k, scores at rtol 1e-9). It ports, faithfully
and cited per method:

  * insert-side stats     components/index.ts:79-119
  * term matching         trees/radix.ts:240-303 (exact/prefix),
                          components/levenshtein.ts:10-96 (fuzzy)
  * full-text search      components/index.ts:408-592
  * where-clause filters  components/index.ts:594-771, trees/flat.ts:50-126
  * threshold semantics   components/index.ts:542-591
  * exact post-filter     methods/search-fulltext.ts:88-115
  * tie-breaking          utils.ts:184-190 (score DESC, docid ASC)
  * facets                components/facets.ts:28-174
  * groups                components/groups.ts:46-195
  * distinctOn            methods/search.ts:43-99
  * pagination            methods/search.ts:101-137

Term matching uses flat-dictionary semantics: fuzzy matches are all
indexed words accepted by the reference's own ``syncBoundedLevenshtein``
(including its prefix special cases). The reference's trie walk
(trees/radix.ts:174-238) can in rare shapes *miss* a bounded word due to
path-compressed-edge traversal quirks; both this oracle and the Spark
engine use the complete flat-accept set, so they agree with each other
by construction and with the reference on its published test vectors
(see tests/test_oracle_reference_fixtures.py).
"""

from __future__ import annotations

import math
import re
from typing import Any, Callable, Optional

from ..kernel.bm25 import BM25Params, DEFAULT_BM25, bm25
from ..kernel.levenshtein import is_bounded
from ..kernel.tokenizer import Tokenizer, TokenizerConfig

_STRING_TYPES = ("string", "string[]")
_NUMBER_TYPES = ("number", "number[]")
_BOOL_TYPES = ("boolean", "boolean[]")
_ENUM_TYPES = ("enum", "enum[]")


def _flatten_schema(schema: dict, prefix: str = "") -> dict[str, str]:
    """Dot-path flattening of nested schema (components/index.ts:159-165)."""
    out: dict[str, str] = {}
    for key, val in schema.items():
        path = f"{prefix}{key}"
        if isinstance(val, dict):
            out.update(_flatten_schema(val, prefix=f"{path}."))
        else:
            out[path] = val
    return out


def _get_nested(doc: dict, path: str):
    """Dot-path property extraction (utils.ts:232-273 getNested)."""
    value: Any = doc
    for key in path.split("."):
        if isinstance(value, dict) and key in value:
            value = value[key]
        else:
            return None
    return value


class OramaOracle:
    """In-memory engine with the reference's exact scoring semantics."""

    def __init__(
        self,
        schema: dict,
        tokenizer: TokenizerConfig | None = None,
        bm25_params: BM25Params = DEFAULT_BM25,
    ):
        self.schema = _flatten_schema(schema)
        self.tokenizer = Tokenizer(tokenizer or TokenizerConfig())
        self.bm25_params = bm25_params
        self.docs: dict[int, dict] = {}
        self._insert_order: list[int] = []
        # per string property (components/index.ts:42-77)
        self.terms: dict[str, dict[str, list[int]]] = {}   # prop -> term -> docids
        self.frequencies: dict[str, dict[int, dict[str, float]]] = {}
        self.token_occurrences: dict[str, dict[str, int]] = {}
        self.field_lengths: dict[str, dict[int, int]] = {}
        self.avg_field_length: dict[str, float] = {}
        self._sorted_terms_cache: dict[str, list[str]] = {}
        for prop, typ in self.schema.items():
            if typ in _STRING_TYPES:
                self.terms[prop] = {}
                self.frequencies[prop] = {}
                self.token_occurrences[prop] = {}
                self.field_lengths[prop] = {}
                self.avg_field_length[prop] = 0.0

    # ------------------------------------------------------------ insert
    def insert(self, doc: dict, docid: Optional[int] = None) -> int:
        """Port of the insert path (methods/insert.ts:13-37 +
        components/index.ts:79-119). ``docid`` defaults to dense
        insertion order; callers must supply monotonically increasing
        ids when providing their own (ids are the ranking tie-break)."""
        if docid is None:
            docid = len(self._insert_order) + 1
        if docid in self.docs:
            raise ValueError(f"DOCUMENT_ALREADY_EXISTS: {docid}")
        self.docs[docid] = doc
        self._insert_order.append(docid)

        for prop, typ in self.schema.items():
            if typ not in _STRING_TYPES:
                continue
            value = _get_nested(doc, prop)
            if value is None:
                continue
            values = value if isinstance(value, list) else [value]
            for v in values:
                self._insert_string(prop, docid, str(v))
        self._sorted_terms_cache.clear()
        return docid

    def _insert_string(self, prop: str, docid: int, value: str) -> None:
        tokens = self.tokenizer.tokenize(value, prop)
        # insertDocumentScoreParameters (components/index.ts:79-91):
        # running mean over number of inserted docs (count includes this one)
        count = len(self._insert_order)
        prev_avg = self.avg_field_length[prop]
        self.avg_field_length[prop] = (prev_avg * (count - 1) + len(tokens)) / count
        self.field_lengths[prop][docid] = len(tokens)
        # insertTokenScoreParameters (components/index.ts:93-119).
        # NOTE the reference wipes frequencies[prop][docid] per inserted
        # value (index.ts:90) — for string[] props each array element
        # resets the dict, so the last element's tfs win; replicated.
        self.frequencies[prop][docid] = {}
        freq = self.frequencies[prop][docid]
        n = len(tokens)
        for token in tokens:
            tf = tokens.count(token) / n if n else 0.0
            freq[token] = tf
            self.token_occurrences[prop][token] = self.token_occurrences[prop].get(token, 0) + 1
            # radix node docs are a Set (trees/radix.ts:22): one posting
            # per (word, doc) even when allowDuplicates keeps the token
            # multiple times (tf/df still count occurrences above)
            ids = self.terms[prop].setdefault(token, [])
            if not ids or ids[-1] != docid:
                ids.append(docid)

    # ----------------------------------------------------------- remove
    def remove(self, docid: int) -> None:
        """Port of remove (methods/remove.ts:10-318): reverse of insert —
        postings dropped, df decremented (index.ts:134-136), avg field
        length updated by the removal recurrence (index.ts:121-132)."""
        if docid not in self.docs:
            raise ValueError(f"DOCUMENT_DOES_NOT_EXIST: {docid}")
        doc = self.docs[docid]
        count = len(self._insert_order)
        for prop, typ in self.schema.items():
            if typ not in _STRING_TYPES:
                continue
            fl = self.field_lengths[prop].pop(docid, None)
            if fl is None:
                continue
            if count > 1:
                self.avg_field_length[prop] = (
                    self.avg_field_length[prop] * count - fl
                ) / (count - 1)
            else:
                self.avg_field_length[prop] = 0.0
            value_for_quirk = _get_nested(doc, prop)
            if isinstance(value_for_quirk, list) and len(value_for_quirk) >= 2:
                # reference quirk (index.ts:383-405): remove calls
                # removeDocumentScoreParameters once PER ELEMENT; the
                # first call clears fieldLengths[id], so the second
                # computes (avg*N - undefined)/(N-1) = NaN — the field
                # average is poisoned until a rebuild
                self.avg_field_length[prop] = float("nan")
            self.frequencies[prop].pop(docid, {})
            # the reference re-tokenizes the stored value and decrements
            # tokenOccurrences once per OCCURRENCE (index.ts:341-344 —
            # the tokens array keeps duplicates under allowDuplicates)
            value = _get_nested(doc, prop)
            values = value if isinstance(value, list) else [value]
            for v in values:
                if v is None:
                    continue
                for token in self.tokenizer.tokenize(str(v), prop):
                    self.token_occurrences[prop][token] -= 1
                    ids = self.terms[prop].get(token)
                    if ids is not None and docid in ids:
                        ids.remove(docid)
                        if not ids:
                            del self.terms[prop][token]
        del self.docs[docid]
        self._insert_order.remove(docid)
        self._sorted_terms_cache.clear()

    def update(self, doc: dict, docid: int) -> int:
        """update = remove + insert (methods/update.ts:8-49)."""
        self.remove(docid)
        return self.insert(doc, docid=docid)

    # --------------------------------------------------- term matching
    def find_words(self, prop: str, token: str, exact: bool, tolerance: int) -> list[str]:
        """Matched index words for one query token.

        exact (radix.ts:54-56 via findAllWords): word == token.
        prefix (radix.ts:240-303 default): word startswith token.
        fuzzy (tolerance>0, not exact): syncBoundedLevenshtein accept set
        (levenshtein.ts:10-96 incl. prefix special cases)."""
        vocab = self.terms.get(prop, {})
        if exact:
            return [token] if token in vocab else []
        if tolerance:
            return [w for w in self._sorted_terms(prop) if is_bounded(token, w, tolerance)]
        return [w for w in self._sorted_terms(prop) if w.startswith(token)]

    def _sorted_terms(self, prop: str) -> list[str]:
        cached = self._sorted_terms_cache.get(prop)
        if cached is None:
            cached = sorted(self.terms.get(prop, {}))
            self._sorted_terms_cache[prop] = cached
        return cached

    # ----------------------------------------------------------- search
    def search(
        self,
        term: Optional[str] = None,
        properties: Optional[list[str]] = None,
        exact: bool = False,
        tolerance: int = 0,
        boost: Optional[dict[str, float]] = None,
        relevance: Optional[BM25Params] = None,
        threshold: float = 1.0,
        where: Optional[dict] = None,
        limit: int = 10,
        offset: int = 0,
        facets: Optional[dict] = None,
        group_by: Optional[dict] = None,
        sort_by: Optional[dict] = None,
        distinct_on: Optional[str] = None,
        preflight: bool = False,
        pinning=None,
    ) -> dict:
        """Port of fullTextSearch (methods/search-fulltext.ts:23-252)."""
        boost = boost or {}
        params = relevance or self.bm25_params
        searchable = [p for p, t in self.schema.items() if t in _STRING_TYPES]
        props = searchable
        if properties is not None:
            for p in properties:
                if p not in searchable:
                    raise ValueError(f"UNKNOWN_INDEX: {p}")
            props = [p for p in searchable if p in properties]

        where_ids: Optional[set[int]] = None
        if where:
            where_ids = self.search_by_where_clause(where)

        if term or properties is not None:
            scored = self._index_search(
                term or "", props, exact, tolerance, boost, params, where_ids, threshold
            )
            if exact and term:
                scored = self._exact_post_filter(scored, term, props)
        else:
            if where is not None and where != {}:
                geo = self._geo_only_scored(where)
                if geo is not None:
                    scored = geo
                else:
                    ids = sorted(where_ids or set())
                    scored = [(i, 0.0) for i in ids]
            else:
                scored = [(i, 0.0) for i in self._insert_order]

        # sortBy or default (score DESC, id ASC) (search-fulltext.ts:172-190)
        if sort_by:
            scored = self._sort_by(scored, sort_by)
        else:
            scored.sort(key=lambda t: (-t[1], t[0]))

        # pinning after sorting, before pagination (search-fulltext.ts:193)
        if pinning is not None:
            from ..query.pinning import apply_pinning_rules

            scored = apply_pinning_rules(
                pinning, scored, term, existing_docids=set(self.docs)
            )

        result: dict[str, Any] = {"count": len(scored)}

        if not preflight:
            if distinct_on:
                result["hits"] = self._fetch_distinct(scored, offset, limit, distinct_on)
            else:
                result["hits"] = [
                    {"id": i, "score": s, "document": self.docs[i]}
                    for i, s in scored[offset : offset + limit]
                ]
        else:
            result["hits"] = []

        if facets:
            result["facets"] = self.get_facets(scored, facets)
        if group_by:
            result["groups"] = self.get_groups(scored, group_by)
        return result

    def _index_search(
        self,
        term: str,
        props: list[str],
        exact: bool,
        tolerance: int,
        boost: dict[str, float],
        params: BM25Params,
        where_ids: Optional[set[int]],
        threshold: float,
    ) -> list[tuple[int, float]]:
        """Port of index.search (components/index.ts:457-592)."""
        tokens = self.tokenizer.tokenize(term)
        keywords_count = len(tokens) or 1
        docs_count = len(self._insert_order)

        keyword_matches: dict[int, dict[str, int]] = {}
        token_found: dict[str, bool] = {}
        results_map: dict[int, float] = {}

        if not tokens and not term:
            tokens = [""]

        for prop in props:
            boost_per_property = boost.get(prop, 1.0)
            if boost_per_property <= 0:
                raise ValueError(f"INVALID_BOOST_VALUE: {boost_per_property}")
            for token in tokens:
                words = self.find_words(prop, token, exact, tolerance)
                if words:
                    token_found[token] = True
                for word in words:
                    self._score_word(
                        prop, word, docs_count, params, results_map,
                        boost_per_property, where_ids, keyword_matches,
                    )

        # (components/index.ts:534-536) score-desc sort; we add docid-asc
        # as the deterministic stable tie-break (JS relies on stable sort
        # over first-encounter order; with dense insertion ids the two
        # agree on all reference fixtures)
        results = sorted(results_map.items(), key=lambda t: (-t[1], t[0]))
        if not results:
            return []
        if threshold == 1:
            return results
        if threshold == 0:
            if keywords_count == 1:
                return results
            for token in tokens:
                if not token_found.get(token):
                    return []
            return [
                (i, s)
                for i, s in results
                if any(m == keywords_count for m in keyword_matches.get(i, {}).values())
            ]
        full = [
            (i, s)
            for i, s in results
            if any(m == keywords_count for m in keyword_matches.get(i, {}).values())
        ]
        if full:
            full_ids = {i for i, _ in full}
            remaining = [(i, s) for i, s in results if i not in full_ids]
            additional = math.ceil(len(remaining) * threshold)
            return full + remaining[:additional]
        return results

    def _score_word(
        self,
        prop: str,
        word: str,
        docs_count: int,
        params: BM25Params,
        results_map: dict[int, float],
        boost_per_property: float,
        where_ids: Optional[set[int]],
        keyword_matches: dict[int, dict[str, int]],
    ) -> None:
        """Port of calculateResultScores (components/index.ts:408-455)."""
        ids = self.terms[prop].get(word, [])
        avg_fl = self.avg_field_length[prop]
        fls = self.field_lengths[prop]
        df = self.token_occurrences[prop].get(word, 0)
        freqs = self.frequencies[prop]
        for docid in ids:
            if where_ids is not None and docid not in where_ids:
                continue
            pm = keyword_matches.setdefault(docid, {})
            pm[prop] = pm.get(prop, 0) + 1
            tf = freqs.get(docid, {}).get(word, 0.0)
            score = bm25(tf, df, docs_count, fls[docid], avg_fl, params)
            results_map[docid] = results_map.get(docid, 0.0) + score * boost_per_property

    def _exact_post_filter(
        self, scored: list[tuple[int, float]], term: str, props: list[str]
    ) -> list[tuple[int, float]]:
        """Case-sensitive whole-word post-filter
        (methods/search-fulltext.ts:88-115, issue #866)."""
        search_terms = term.strip().split()
        out = []
        for docid, score in scored:
            doc = self.docs.get(docid)
            if not doc:
                continue
            for prop in props:
                value = _get_nested(doc, prop)
                if isinstance(value, str):
                    if all(
                        re.search(r"\b" + re.escape(t) + r"\b", value)
                        for t in search_terms
                    ):
                        out.append((docid, score))
                        break
        return out

    # ---------------------------------------------------------- filters
    def search_by_where_clause(self, filters: dict) -> set[int]:
        """Port of searchByWhereClause (components/index.ts:594-771)."""
        if "and" in filters:
            clauses = filters["and"]
            if not clauses:
                return set()
            sets = [self.search_by_where_clause(c) for c in clauses]
            return set.intersection(*sets)
        if "or" in filters:
            clauses = filters["or"]
            if not clauses:
                return set()
            out: set[int] = set()
            for c in clauses:
                out |= self.search_by_where_clause(c)
            return out
        if "not" in filters:
            universe = set(self._insert_order)
            return universe - self.search_by_where_clause(filters["not"])

        result_sets: list[set[int]] = []
        for prop, operation in filters.items():
            typ = self.schema.get(prop)
            if typ is None:
                raise ValueError(f"UNKNOWN_FILTER_PROPERTY: {prop}")
            ids: set[int] = set()
            if typ in _BOOL_TYPES:
                ids = {
                    i
                    for i in self._insert_order
                    if self._filter_value_matches_bool(i, prop, operation)
                }
            elif typ in _STRING_TYPES and isinstance(operation, (str, list)):
                # tokenize each value; exact-match each token; union
                # (components/index.ts:699-709)
                vals = operation if isinstance(operation, list) else [operation]
                for raw in vals:
                    for t in self.tokenizer.tokenize(raw, prop):
                        ids |= set(self.terms[prop].get(t, []))
            elif typ in _ENUM_TYPES:
                ids = self._filter_enum(prop, operation, typ == "enum[]")
            elif typ in _NUMBER_TYPES:
                ids = self._filter_number(prop, operation)
            elif typ == "geopoint":
                ids = {i for i, _ in self._geo_matches(prop, operation)}
            else:
                raise ValueError(f"INVALID_FILTER_OPERATION on {prop}")
            result_sets.append(ids)
        if not result_sets:
            return set()
        return set.intersection(*result_sets)

    # -------------------------------------------------------------- geo
    def _geo_matches(self, prop: str, operation: dict) -> list[tuple[int, float]]:
        """(docid, distance-to-center) pairs passing the geo filter —
        port of searchByRadius/searchByPolygon (trees/bkd.ts:182-260) +
        the components/index.ts:664-697 dispatch."""
        from ..query.geo import (
            convert_distance_to_meters, polygon_centroid, vincenty_py,
        )

        def haversine(lat1, lon1, lat2, lon2):
            p = math.pi / 180
            dlat = (lat2 - lat1) * p
            dlon = (lon2 - lon1) * p
            a = (
                math.sin(dlat / 2) ** 2
                + math.cos(lat1 * p) * math.cos(lat2 * p) * math.sin(dlon / 2) ** 2
            )
            return 6371e3 * 2 * math.atan2(math.sqrt(a), math.sqrt(1 - a))

        if "radius" in operation:
            op = operation["radius"]
            center = op["coordinates"]
            r = convert_distance_to_meters(op["value"], op.get("unit", "m"))
            dist = vincenty_py if op.get("highPrecision") else haversine
            inside = op.get("inside", True)
            out = []
            for i in self._insert_order:
                pt = _get_nested(self.docs[i], prop)
                if pt is None:
                    continue
                d = dist(pt["lat"], pt["lon"], center["lat"], center["lon"])
                if (d <= r) if inside else (d > r):
                    out.append((i, d))
            return out
        if "polygon" in operation:
            op = operation["polygon"]
            poly = op["coordinates"]
            inside = op.get("inside", True)
            centroid = polygon_centroid(poly)
            dist = vincenty_py if op.get("highPrecision") else haversine

            def in_poly(lat, lon):
                # ray casting (trees/bkd.ts:312-330)
                ins = False
                n = len(poly)
                j = n - 1
                for k in range(n):
                    xi, yi = poly[k]["lon"], poly[k]["lat"]
                    xj, yj = poly[j]["lon"], poly[j]["lat"]
                    if (yi > lat) != (yj > lat) and lon < (xj - xi) * (lat - yi) / (yj - yi) + xi:
                        ins = not ins
                    j = k
                return ins

            out = []
            for i in self._insert_order:
                pt = _get_nested(self.docs[i], prop)
                if pt is None:
                    continue
                if in_poly(pt["lat"], pt["lon"]) == inside:
                    out.append(
                        (i, dist(pt["lat"], pt["lon"], centroid["lat"], centroid["lon"]))
                    )
            return out
        raise ValueError(f"Invalid operation {operation}")

    def _geo_only_scored(self, where: dict) -> Optional[list[tuple[int, float]]]:
        """Geosearch-only distance ranking (createGeoTokenScores,
        components/index.ts:945-976): score = maxDist - dist + 1."""
        if len(where) != 1:
            return None
        prop, op = next(iter(where.items()))
        if self.schema.get(prop) != "geopoint" or not isinstance(op, dict):
            return None
        if "radius" not in op and "polygon" not in op:
            return None
        matches = self._geo_matches(prop, op)
        if not matches:
            return []
        dmax = max(d for _, d in matches)
        return [(i, dmax - d + 1) for i, d in matches]

    def _filter_value_matches_bool(self, docid: int, prop: str, want: bool) -> bool:
        value = _get_nested(self.docs[docid], prop)
        if isinstance(value, list):
            return want in value
        return value is not None and value == want

    def _filter_enum(self, prop: str, operation: dict, is_array: bool) -> set[int]:
        """Port of FlatTree.filter/filterArr (trees/flat.ts:50-126)."""
        if not isinstance(operation, dict) or len(operation) != 1:
            raise ValueError(f"INVALID_FILTER_OPERATION: {operation}")
        op, val = next(iter(operation.items()))

        def doc_values(docid: int) -> list:
            v = _get_nested(self.docs[docid], prop)
            if v is None:
                return []
            return v if isinstance(v, list) else [v]

        have = {i for i in self._insert_order if doc_values(i)}
        if is_array:
            if op == "containsAll":
                return {i for i in have if all(x in doc_values(i) for x in val)} if val else set()
            if op == "containsAny":
                return {i for i in have if any(x in doc_values(i) for x in val)} if val else set()
            raise ValueError(f"INVALID_FILTER_OPERATION: {op}")
        if op == "eq":
            return {i for i in have if val in doc_values(i)}
        if op == "in":
            return {i for i in have if any(x in doc_values(i) for x in val)}
        if op == "nin":
            # docs that HAVE the property with some value outside the list
            # (trees/flat.ts:78-88)
            return {i for i in have if any(x not in val for x in doc_values(i))}
        raise ValueError(f"INVALID_FILTER_OPERATION: {op}")

    def _filter_number(self, prop: str, operation: dict) -> set[int]:
        """Port of the AVL dispatch (components/index.ts:729-766);
        exactly one operator per property (index.ts:713-715)."""
        if not isinstance(operation, dict) or len(operation) != 1:
            raise ValueError(f"INVALID_FILTER_OPERATION: {operation}")
        op, val = next(iter(operation.items()))
        preds: dict[str, Callable[[float], bool]] = {
            "gt": lambda x: x > val,
            "gte": lambda x: x >= val,
            "lt": lambda x: x < val,
            "lte": lambda x: x <= val,
            "eq": lambda x: x == val,
            "between": lambda x: val[0] <= x <= val[1],
        }
        if op not in preds:
            raise ValueError(f"INVALID_FILTER_OPERATION: {op}")
        pred = preds[op]
        out = set()
        for docid in self._insert_order:
            v = _get_nested(self.docs[docid], prop)
            if v is None:
                continue
            vals = v if isinstance(v, list) else [v]
            if any(x is not None and pred(x) for x in vals):
                out.add(docid)
        return out

    # ----------------------------------------------------------- facets
    def get_facets(self, scored: list[tuple[int, float]], facets_config: dict) -> dict:
        """Port of getFacets (components/facets.ts:28-174)."""
        out: dict[str, Any] = {}
        for facet, cfg in facets_config.items():
            typ = self.schema[facet]
            values: dict[str, int] = {}
            if typ == "number":
                for r in cfg.get("ranges", []):
                    values[f"{r['from']}-{r['to']}"] = 0
            for docid, _ in scored:
                value = _get_nested(self.docs[docid], facet)
                if typ in ("number", "number[]"):
                    vals = value if isinstance(value, list) else [value]
                    seen: set[str] = set()
                    for v in vals:
                        if v is None:
                            continue
                        for r in cfg.get("ranges", []):
                            key = f"{r['from']}-{r['to']}"
                            if key in seen:
                                continue
                            if r["from"] <= v <= r["to"]:
                                if typ == "number[]":
                                    # dedupe only for arrays (facets.ts:77-85)
                                    seen.add(key)
                                values[key] = values.get(key, 0) + 1
                else:
                    vals = value if isinstance(value, list) else [value]
                    seen = set()
                    for v in vals:
                        if v is None:
                            continue
                        key = str(v).lower() if isinstance(v, bool) else str(v)
                        if key in seen:
                            continue
                        if isinstance(value, list):
                            seen.add(key)
                        values[key] = values.get(key, 0) + 1
            entry: dict[str, Any] = {"count": len(values), "values": values}
            if typ == "string":
                order = cfg.get("sort", "desc").lower()
                items = sorted(
                    values.items(),
                    key=lambda kv: kv[1],
                    reverse=(order != "asc"),
                )
                lo = cfg.get("offset", 0)
                hi = cfg.get("limit", 10)
                entry["values"] = dict(items[lo:hi])
            out[facet] = entry
        return out

    # ----------------------------------------------------------- groups
    def get_groups(self, scored: list[tuple[int, float]], group_by: dict) -> list[dict]:
        """Port of getGroups (components/groups.ts:46-175): per-property
        value -> rank-ordered doc indexes capped at maxResult, cartesian
        combination, intersection, rank order."""
        properties: list[str] = group_by["properties"]
        max_result = group_by.get("maxResult") or float("inf")
        list_of_values: list[list] = []
        per_prop: dict[str, dict[Any, list[int]]] = {}
        for prop in properties:
            per_value: dict[Any, list[int]] = {}
            values_in_order: list = []
            for j, (docid, _) in enumerate(scored):
                value = _get_nested(self.docs[docid], prop)
                if value is None:
                    continue
                key = str(value).lower() if isinstance(value, bool) else value
                bucket = per_value.setdefault(key, [])
                if len(bucket) >= max_result:
                    continue
                bucket.append(j)
                if key not in values_in_order:
                    values_in_order.append(key)
            list_of_values.append(values_in_order)
            per_prop[prop] = per_value

        def combos(idx: int) -> list[list]:
            if idx + 1 == len(list_of_values):
                return [[v] for v in list_of_values[idx]]
            return [
                [v] + rest for v in list_of_values[idx] for rest in combos(idx + 1)
            ]

        groups = []
        if not list_of_values or any(not lv for lv in list_of_values):
            combinations = [] if len(properties) > 1 else [[v] for v in (list_of_values[0] if list_of_values else [])]
        else:
            combinations = combos(0)
        for combination in combinations:
            sets = [
                per_prop[properties[j]].get(combination[j], [])
                for j in range(len(combination))
            ]
            common = set(sets[0])
            for s in sets[1:]:
                common &= set(s)
            indexes = sorted(common)
            if not indexes:
                continue
            groups.append(
                {
                    "values": list(combination),
                    "result": [
                        {
                            "id": scored[j][0],
                            "score": scored[j][1],
                            "document": self.docs[scored[j][0]],
                        }
                        for j in indexes
                    ],
                }
            )
        return groups

    # --------------------------------------------------------- sort_by
    def _sort_by(self, scored: list[tuple[int, float]], sort_by: dict) -> list[tuple[int, float]]:
        """Port of sorter.sortBy semantics (components/sorter.ts:239-283):
        docs lacking the property go LAST regardless of direction."""
        prop = sort_by["property"]
        descending = str(sort_by.get("order", "ASC")).upper() == "DESC"
        with_val = []
        without_val = []
        for docid, score in scored:
            v = _get_nested(self.docs[docid], prop)
            if v is None:
                without_val.append((docid, score))
            else:
                with_val.append((docid, score, v))
        with_val.sort(key=lambda t: (t[2], t[0]), reverse=descending)
        return [(d, s) for d, s, _ in with_val] + without_val

    # ------------------------------------------------- vector & hybrid
    def search_vector(
        self,
        vector,
        prop: str,
        similarity: float = 0.8,
        where: Optional[dict] = None,
        limit: int = 10,
        offset: int = 0,
    ) -> dict:
        """Port of innerVectorSearch + searchVector
        (methods/search-vector.ts:13-56, trees/vector.ts:77-111):
        float32 values, float64 accumulation, keep sim >= similarity,
        sort (score DESC, id ASC)."""
        import numpy as np

        q = np.asarray(vector, dtype=np.float32).astype(np.float64)
        qmag = math.sqrt(float((q * q).sum()))
        where_ids = self.search_by_where_clause(where) if where else None
        scored = []
        for docid in self._insert_order:
            if where_ids is not None and docid not in where_ids:
                continue
            v = _get_nested(self.docs[docid], prop)
            if v is None:
                continue
            a = np.asarray(v, dtype=np.float32).astype(np.float64)
            dot = 0.0
            for i in range(len(a)):
                dot += q[i] * a[i]
            mag = math.sqrt(float((a * a).sum()))
            sim = dot / (qmag * mag)
            if sim >= similarity:
                scored.append((docid, sim))
        scored.sort(key=lambda t: (-t[1], t[0]))
        return {
            "count": len(scored),
            "hits": [
                {"id": i, "score": s, "document": self.docs[i]}
                for i, s in scored[offset : offset + limit]
            ],
        }

    def search_hybrid(
        self,
        term: str,
        vector,
        vector_prop: str,
        similarity: float = 0.8,
        text_weight: float = 0.5,
        vector_weight: float = 0.5,
        where: Optional[dict] = None,
        limit: int = 10,
        offset: int = 0,
        **fulltext_kw,
    ) -> dict:
        """Port of innerHybridSearch + mergeAndRankResults
        (methods/search-hybrid.ts:19-157): each side normalized by its
        own max, weighted sum, missing side contributes 0."""
        ft = self.search(term=term, where=where, limit=len(self.docs), **fulltext_kw)
        vs = self.search_vector(
            vector, vector_prop, similarity=similarity, where=where,
            limit=len(self.docs),
        )
        t_scores = {h["id"]: h["score"] for h in ft["hits"]}
        v_scores = {h["id"]: h["score"] for h in vs["hits"]}
        t_max = max(t_scores.values()) if t_scores else 1.0
        v_max = max(v_scores.values()) if v_scores else 1.0
        merged: dict[int, float] = {}
        for i, s in t_scores.items():
            merged[i] = (s / t_max if t_max else 0.0) * text_weight
        for i, s in v_scores.items():
            merged[i] = merged.get(i, 0.0) + (s / v_max if v_max else 0.0) * vector_weight
        scored = sorted(merged.items(), key=lambda t: (-t[1], t[0]))
        return {
            "count": len(scored),
            "hits": [
                {"id": i, "score": s, "document": self.docs[i]}
                for i, s in scored[offset : offset + limit]
            ],
        }

    # ------------------------------------------------------ distinct_on
    def _fetch_distinct(
        self, scored: list[tuple[int, float]], offset: int, limit: int, distinct_on: str
    ) -> list[dict]:
        """Port of fetchDocumentsWithDistinct (methods/search.ts:43-99)."""
        seen: set = set()
        hits = []
        count = 0
        for docid, score in scored:
            value = _get_nested(self.docs[docid], distinct_on)
            if value is None or value in seen:
                continue
            seen.add(value)
            count += 1
            if count <= offset:
                continue
            hits.append({"id": docid, "score": score, "document": self.docs[docid]})
            if count >= offset + limit:
                break
        return hits


def match_positions(
    oracle: "OramaOracle", hits: list[dict], term: str, tolerance: int = 0
) -> list[tuple]:
    """Pure-Python port of plugin-match-highlight (index.ts:36-135):
    (docid, prop, token, start, length) rows for each hit document,
    filtered to tokens matching a query token (prefix, or bounded
    Levenshtein when tolerance is set)."""
    import re as _re

    word_re = _re.compile(r"(?:[^\W\d_]|[0-9_'-])+")
    qtokens = oracle.tokenizer.tokenize(term)
    out: list[tuple] = []
    for hit in hits:
        docid = hit["id"]
        doc = oracle.docs[docid]
        for prop, typ in oracle.schema.items():
            if typ != "string":
                continue
            text = _get_nested(doc, prop)
            if not isinstance(text, str):
                continue
            for m in word_re.finditer(text):
                toks = oracle.tokenizer.tokenize(m.group(0).lower())
                token = toks[0] if toks else None
                if token is None:
                    continue
                matched = False
                for qt in qtokens:
                    if tolerance:
                        if is_bounded(token, qt, tolerance):
                            matched = True
                            break
                    elif token.startswith(qt):
                        matched = True
                        break
                if matched:
                    out.append((docid, prop, token, m.start(), len(m.group(0))))
    return out
