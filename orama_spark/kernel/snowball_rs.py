"""Snowball Serbian stemmer (reference: lib/rs.js, compiled from the
PUBLIC serbian.sbl on snowballstem.org).

Pipeline: cyrillic→latin transliteration, prelude (ije/je→e between
consonants, dj→đ), a no-diacritics flag, R1 marking (with the syllabic
'r' adjustment), then Step_1 (suffix normalization, no region gate),
Step_2 (the 2,035-entry substitution table, R1-gated — falls through to
Step_3's R1 deletion when it does not fire). Tables and case actions
live in _serbian_data.py (generated; see tools/gen_serbian_data.py).
Matching uses the exact Snowball backward-among search (shared with the
Tamil module) so any table-order quirks behave identically.
Differential-fuzzed vs the compiled reference (0 mismatches).
"""

from __future__ import annotations

from ._serbian_data import (
    STEP1_ACTIONS, STEP1_TABLE, STEP2_ACTIONS, STEP2_TABLE, STEP3_TABLE,
)
from .snowball import STEMMERS
from .snowball_ta import _find_among_b

_CYR2LAT = {ord(c): l for c, l in [
    ("а", "a"), ("б", "b"), ("в", "v"), ("г", "g"), ("д", "d"),
    ("ђ", "đ"), ("е", "e"), ("ж", "ž"), ("з", "z"), ("и", "i"),
    ("ј", "j"), ("к", "k"), ("л", "l"), ("љ", "lj"), ("м", "m"),
    ("н", "n"), ("њ", "nj"), ("о", "o"), ("п", "p"), ("р", "r"),
    ("с", "s"), ("т", "t"), ("ћ", "ć"), ("у", "u"), ("ф", "f"),
    ("х", "h"), ("ц", "c"), ("ч", "č"), ("џ", "dž"), ("ш", "š"),
]}
_VOWELS = frozenset("aeiou")
_DIACRITICS = frozenset("ćčđšž")
_CONS = frozenset("bcdfghjklmnprstvzćčđšž")  # grouping q


def _prelude(w: str) -> str:
    for pat in ("ije", "je"):
        i = 0
        while i < len(w):
            if (w[i] in _CONS and w[i + 1:i + 1 + len(pat)] == pat
                    and i + 1 + len(pat) < len(w)
                    and w[i + 1 + len(pat)] in _CONS):
                w = w[: i + 1] + "e" + w[i + 1 + len(pat):]
                continue  # re-test at the same position
            i += 1
    return w.replace("dj", "đ")


def _r1(w: str) -> int:
    n = len(w)
    s = n
    i = 0
    while i < n and w[i] not in _VOWELS:
        i += 1
    if i < n:
        s = i + 1
        if s < 2:
            j = s
            while j < n and w[j] in _VOWELS:
                j += 1
            if j < n:
                s = j + 1
    # syllabic-r adjustment: R1 may not start more than 1 char after
    # the first 'r' (or after the first non-r following an initial r
    # cluster when the r sits at the word start)
    i = 0
    while i < n and w[i] != "r":
        i += 1
    if i < n:
        cur = i + 1
        ok = True
        if cur < 2:
            j = cur
            while j < n and w[j] == "r":
                j += 1
            if j >= n:
                ok = False
            else:
                cur = j + 1
        if ok and s - cur > 1:
            s = cur
    return s


def stem_sr(word: str) -> str:
    w = word.translate(_CYR2LAT)
    w = _prelude(w)
    no_diac = not any(ch in _DIACRITICS for ch in w)
    s = _r1(w)
    # Step 1: suffix normalization (no region gate)
    res, nc = _find_among_b(w, len(w), STEP1_TABLE)
    if res:
        rep, gated = STEP1_ACTIONS[res]
        if not gated or no_diac:
            w = w[:nc] + rep
    # Step 2 (R1): substitute; on any failure fall through to Step 3
    done = False
    res, nc = _find_among_b(w, len(w), STEP2_TABLE)
    if res and nc >= s:
        rep, gated = STEP2_ACTIONS[res]
        if not gated or no_diac:
            w = w[:nc] + rep
            done = True
    if not done:
        # Step 3 (R1): delete
        res, nc = _find_among_b(w, len(w), STEP3_TABLE)
        if res and nc >= s:
            w = w[:nc]
    return w


STEMMERS["serbian"] = stem_sr
