"""Reference-shaped tree dumps: build and walk the per-property index
structures exactly as the reference serializes them.

Shapes (all pinned from the reference source):

- Radix node  {w, s, e, k, d: [ids], c: [[char, node], ...]}
  (trees/radix.ts:405-414; node field semantics radix.ts:14-45:
  ``k`` = first char of the edge label ``s``, ``w`` = accumulated word,
  ``e`` = end-of-word, ``d`` = doc-id set at end nodes)
- AVL        {root: {k, v: [ids], l, r, h}, insertCount}
  (trees/avl.ts:47-63,96-108; leaf height = 1, avl.ts:10)
- Flat       {numberToDocumentId: [[key, [ids]], ...]}  (trees/flat.ts:128-145)
- Bool       {true: [ids], false: [ids]}                 (trees/bool.ts:30-42)
- BKD        {root: {point: {lon, lat}, docIDs, left, right}}
  (trees/bkd.ts:39-58,263-267)
- Vector     {size, vectors: [[id, [magnitude, [floats]]], ...]}
  (trees/vector.ts:43-65)

The builders here produce a VALID instance of each shape — the exact
node set a reference instance would hold for the same keys (radix
structure is insertion-order independent), with deterministic child
order (sorted keys) and balanced BST/kd layouts for AVL/BKD (any valid
tree round-trips through ``fromJSON``; the reference never relies on a
specific rotation history). The walkers accept ANY valid instance,
including ones a real reference instance saved.
"""

from __future__ import annotations

import math
from typing import Any, Iterable


# ------------------------------------------------------------- radix

def build_radix(term_docs: Iterable[tuple[str, list[int]]]) -> dict:
    """Path-compressed radix tree over (term, sorted internal ids),
    serialized in the reference node shape. ``term_docs`` must be
    sorted by term so sibling order is deterministic."""
    root = {"w": "", "s": "", "e": False, "k": "", "d": [], "c": {}}
    for term, ids in term_docs:
        _radix_insert(root, term, ids)
    return _radix_json(root)


def _radix_insert(node: dict, word: str, ids: list[int]) -> None:
    i, n = 0, len(word)
    while i < n:
        ch = word[i]
        child = node["c"].get(ch)
        if child is None:
            node["c"][ch] = {
                "w": node["w"] + word[i:], "s": word[i:], "e": True,
                "k": ch, "d": list(ids), "c": {},
            }
            return
        label = child["s"]
        j = 0
        while j < len(label) and i + j < n and label[j] == word[i + j]:
            j += 1
        if j == len(label):
            node = child
            i += j
            if i == n:
                child["e"] = True
                child["d"].extend(ids)
                return
            continue
        # split the edge at the common prefix (radix.ts:129-155)
        common, rest_old, rest_new = label[:j], label[j:], word[i + j:]
        mid = {
            "w": node["w"] + common, "s": common, "e": False,
            "k": common[0], "d": [], "c": {},
        }
        node["c"][common[0]] = mid
        child["s"] = rest_old
        child["k"] = rest_old[0]
        child["w"] = mid["w"] + rest_old
        _radix_rewords(child)
        mid["c"][rest_old[0]] = child
        if rest_new:
            mid["c"][rest_new[0]] = {
                "w": mid["w"] + rest_new, "s": rest_new, "e": True,
                "k": rest_new[0], "d": list(ids), "c": {},
            }
        else:
            mid["e"] = True
            mid["d"] = list(ids)
        return
    node["e"] = True
    node["d"].extend(ids)


def _radix_rewords(node: dict) -> None:
    for ch in node["c"].values():
        ch["w"] = node["w"] + ch["s"]
        _radix_rewords(ch)


def _radix_json(node: dict) -> dict:
    return {
        "w": node["w"], "s": node["s"], "e": node["e"], "k": node["k"],
        "d": sorted(node["d"]),
        "c": [[k, _radix_json(v)] for k, v in sorted(node["c"].items())],
    }


def walk_radix(node: dict, out: list) -> list:
    """All (word, doc-ids) pairs at end nodes of a reference radix dump."""
    if node.get("e") and node.get("d"):
        out.append((node["w"], list(node["d"])))
    for _, child in node.get("c") or []:
        walk_radix(child, out)
    return out


# --------------------------------------------------------------- avl

def build_avl(items: list[tuple[Any, list[int]]]) -> dict:
    """Height-balanced BST from (key, ids) sorted by key, in the
    reference AVL dump shape (leaf h=1)."""
    def rec(lo: int, hi: int):
        if lo >= hi:
            return None
        mid = (lo + hi) // 2
        left = rec(lo, mid)
        right = rec(mid + 1, hi)
        h = 1 + max(left["h"] if left else 0, right["h"] if right else 0)
        k, v = items[mid]
        return {"k": k, "v": sorted(v), "l": left, "r": right, "h": h}

    return {"root": rec(0, len(items)), "insertCount": len(items)}


def walk_avl(dump: dict, out: list) -> list:
    def rec(n):
        if not n:
            return
        rec(n.get("l"))
        out.append((n["k"], list(n["v"])))
        rec(n.get("r"))

    rec(dump.get("root"))
    return out


# -------------------------------------------------------- flat / bool

def build_flat(items: list[tuple[Any, list[int]]]) -> dict:
    return {"numberToDocumentId": [[k, sorted(v)] for k, v in items]}


def walk_flat(dump: dict) -> list:
    return [(k, list(v)) for k, v in dump.get("numberToDocumentId") or []]


def build_bool(true_ids: list[int], false_ids: list[int]) -> dict:
    return {"true": sorted(true_ids), "false": sorted(false_ids)}


# --------------------------------------------------------------- bkd

def build_bkd(points: list[tuple[float, float, list[int]]]) -> dict:
    """Balanced kd-tree over (lon, lat, ids), alternating split axis by
    depth (lon at even depths — bkd.ts insert order)."""
    def rec(pts: list, depth: int):
        if not pts:
            return None
        axis = depth % 2
        pts = sorted(pts, key=lambda p: p[axis])
        mid = len(pts) // 2
        lon, lat, ids = pts[mid]
        return {
            "point": {"lon": lon, "lat": lat}, "docIDs": sorted(ids),
            "left": rec(pts[:mid], depth + 1),
            "right": rec(pts[mid + 1:], depth + 1),
        }

    return {"root": rec(points, 0)}


def walk_bkd(dump: dict, out: list) -> list:
    def rec(n):
        if not n:
            return
        out.append((n["point"]["lon"], n["point"]["lat"], list(n["docIDs"])))
        rec(n.get("left"))
        rec(n.get("right"))

    rec(dump.get("root"))
    return out


# ------------------------------------------------------------- vector

def build_vector(size: int, id_vectors: list[tuple[int, list[float]]]) -> dict:
    """Vector index dump with float32 magnitudes (vector.ts:43-54,68-74:
    magnitude computed over the Float32Array, so each component is
    rounded to f32 before squaring)."""
    import numpy as np

    vectors = []
    for iid, vec in id_vectors:
        v32 = np.asarray(vec, dtype=np.float32)
        mag = float(math.sqrt(float(np.sum(v32.astype(np.float64) ** 2))))
        vectors.append([iid, [mag, [float(x) for x in v32]]])
    return {"size": size, "vectors": vectors}
