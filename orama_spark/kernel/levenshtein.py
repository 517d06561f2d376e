"""Bounded Levenshtein — exact port of the reference's non-standard metric.

Reference: /root/reference/packages/orama/src/components/levenshtein.ts:10-96

Non-standard prefix special cases (they change fuzzy match sets vs the
textbook metric):
  * if ``term`` starts with ``word``  -> distance = len(term) - len(word)
  * if ``word`` starts with ``term``  -> distance = 0 (any completion of
    the query token matches at distance 0)
Returns -1 when the distance exceeds the tolerance.

``bounded_levenshtein_batch`` is the numpy-vectorized variant used inside
Arrow UDFs for dictionary-scan fuzzy expansion at scale.
"""

from __future__ import annotations

import numpy as np


def bounded_levenshtein(term: str, word: str, tolerance: int) -> int:
    """Port of ``_boundedLevenshtein`` (levenshtein.ts:10-73).

    Returns the distance, or -1 if it exceeds ``tolerance``.
    """
    if tolerance < 0:
        return -1
    if term == word:
        return 0

    m = len(term)
    n = len(word)

    if m == 0:
        return n if n <= tolerance else -1
    if n == 0:
        return m if m <= tolerance else -1

    diff = abs(m - n)
    # Prefix special cases (levenshtein.ts:26-36)
    if term.startswith(word):
        return diff if diff <= tolerance else -1
    if word.startswith(term):
        return 0

    if diff > tolerance:
        return -1

    # DP with per-row early exit (levenshtein.ts:41-72)
    prev = list(range(n + 1))
    for i in range(1, m + 1):
        cur = [i] + [0] * n
        row_min = float("inf")
        tc = term[i - 1]
        for j in range(1, n + 1):
            if tc == word[j - 1]:
                cur[j] = prev[j - 1]
            else:
                cur[j] = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + 1)
            if cur[j] < row_min:
                row_min = cur[j]
        if row_min > tolerance:
            return -1
        prev = cur

    return prev[n] if prev[n] <= tolerance else -1


def is_bounded(term: str, word: str, tolerance: int) -> bool:
    """Port of ``syncBoundedLevenshtein(...).isBounded`` (levenshtein.ts:90-96)."""
    return bounded_levenshtein(term, word, tolerance) >= 0


def bounded_levenshtein_batch(term: str, words: np.ndarray, tolerance: int) -> np.ndarray:
    """Vectorized ``bounded_levenshtein(term, w, tolerance) >= 0`` over a
    numpy object array of candidate words.

    Used by the fuzzy term-expansion scan over the ``dictionary`` table:
    the per-word work is O(|term| * |word|) only for candidates that pass
    the cheap prefix / length-band screens.
    """
    out = np.zeros(len(words), dtype=bool)
    if tolerance < 0:
        return out
    tlen = len(term)
    for idx, w in enumerate(words):
        wlen = len(w)
        if term == w:
            out[idx] = True
            continue
        # empty-string cases precede the prefix shortcuts (levenshtein.ts:19-20)
        if tlen == 0 or wlen == 0:
            out[idx] = abs(tlen - wlen) <= tolerance
            continue
        # cheap screens: prefix cases and the length band (levenshtein.ts:26-39)
        if w.startswith(term) or (term.startswith(w) and tlen - wlen <= tolerance):
            out[idx] = True
            continue
        if abs(tlen - wlen) > tolerance:
            continue
        out[idx] = bounded_levenshtein(term, w, tolerance) >= 0
    return out
