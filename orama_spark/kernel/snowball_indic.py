"""Snowball stemmers for the Indic languages the reference ships:
Hindi (lib/in.js), Nepali (lib/np.js), Tamil (lib/ta.js).

Implemented from the PUBLIC Snowball algorithm descriptions
(snowballstem.org/algorithms/) — suffix inventories are the published
algorithms' data — and differential-fuzzed against the reference's
compiled stemmers via tools/fuzz_stemmers.py (0 mismatches required).

Each ``stem_xx(word)`` expects a lowercased word (Indic scripts have no
case, so this is a no-op for native text).
"""

from __future__ import annotations

from .snowball import STEMMERS

# ------------------------------------------------------------------ Hindi
# Snowball hindi: protect the first character, then delete the longest
# matching suffix; suffixes marked True additionally require the
# preceding character to be a Devanagari consonant (क..ह, ़, क़..य़)
# that is itself not the protected first character.
_HI_CONSONANT = frozenset(
    [chr(c) for c in range(0x0915, 0x093A)]
    + ["़"]
    + [chr(c) for c in range(0x0958, 0x0960)]
)

_HI_SUFFIXES: list[tuple[str, bool]] = [
    ("आँ", False), ("ाँ", False), ("इयाँ", False), ("आइयाँ", False),
    ("ाइयाँ", False), ("ियाँ", False), ("आं", False), ("उआं", False),
    ("ुआं", False), ("ईं", False), ("आईं", False), ("ाईं", False),
    ("एं", False), ("आएं", False), ("उएं", False), ("ाएं", False),
    ("ताएं", True), ("अताएं", False), ("नाएं", True), ("अनाएं", False),
    ("ुएं", False), ("ओं", False), ("आओं", False), ("उओं", False),
    ("ाओं", False), ("ताओं", True), ("अताओं", False), ("नाओं", True),
    ("अनाओं", False), ("ुओं", False), ("ां", False), ("इयां", False),
    ("आइयां", False), ("ाइयां", False), ("ियां", False), ("ीं", False),
    ("तीं", True), ("अतीं", False), ("आतीं", False), ("ातीं", False),
    ("ें", False), ("ों", False), ("इयों", False), ("आइयों", False),
    ("ाइयों", False), ("ियों", False), ("अ", False), ("आ", False),
    ("इ", False), ("ई", False), ("आई", False), ("ाई", False),
    ("उ", False), ("ऊ", False), ("ए", False), ("आए", False),
    ("इए", False), ("आइए", False), ("ाइए", False), ("ाए", False),
    ("िए", False), ("ओ", False), ("आओ", False), ("ाओ", False),
    ("कर", True), ("अकर", False), ("आकर", False), ("ाकर", False),
    ("ा", False), ("ऊंगा", False), ("आऊंगा", False), ("ाऊंगा", False),
    ("ूंगा", False), ("एगा", False), ("आएगा", False), ("ाएगा", False),
    ("ेगा", False), ("ता", True), ("अता", False), ("आता", False),
    ("ाता", False), ("ना", True), ("अना", False), ("आना", False),
    ("ाना", False), ("आया", False), ("ाया", False), ("ि", False),
    ("ी", False), ("ऊंगी", False), ("आऊंगी", False), ("ाऊंगी", False),
    ("एंगी", False), ("आएंगी", False), ("ाएंगी", False), ("ूंगी", False),
    ("ेंगी", False), ("एगी", False), ("आएगी", False), ("ाएगी", False),
    ("ओगी", False), ("आओगी", False), ("ाओगी", False), ("ेगी", False),
    ("ोगी", False), ("ती", True), ("अती", False), ("आती", False),
    ("ाती", False), ("नी", True), ("अनी", False), ("ु", False),
    ("ू", False), ("े", False), ("एंगे", False), ("आएंगे", False),
    ("ाएंगे", False), ("ेंगे", False), ("ओगे", False), ("आओगे", False),
    ("ाओगे", False), ("ोगे", False), ("ते", True), ("अते", False),
    ("आते", False), ("ाते", False), ("ने", True), ("अने", False),
    ("आने", False), ("ाने", False), ("ो", False), ("्", False),
]
# longest-first: find_among_b picks the longest entry whose condition
# holds (failing entries defer to their longest matching sub-suffix,
# which suffix containment makes equivalent to this scan)
_HI_BY_LEN = sorted(_HI_SUFFIXES, key=lambda t: -len(t[0]))


def stem_hi(word: str) -> str:
    n = len(word)
    if n <= 1:
        return word
    for suf, need_cons in _HI_BY_LEN:
        start = n - len(suf)
        if start < 1 or not word.endswith(suf):
            continue
        if need_cons:
            # preceding char must be a consonant AND lie inside the
            # stemmable region (index >= 1 — in_grouping_b respects the
            # backward limit set by the protected first character)
            if start - 1 < 1 or word[start - 1] not in _HI_CONSONANT:
                continue
        return word[:start]
    return word


STEMMERS["indian"] = stem_hi


# ----------------------------------------------------------------- Nepali
# Snowball nepali: strip one postposition (category 1; the क-series
# deletes UNLESS preceded by ए or े), then repeat { conditionally drop a
# trailing ँ/ं (only after यौ/छौ/नौ/थे) or ै (only after त्र); strip the
# longest category-3 verbal suffix } until no category-3 suffix matches.
_NE_CAT1 = [
    ("लाइ", 1), ("लाई", 1), ("सँग", 1), ("संग", 1), ("मार्फत", 1),
    ("रत", 1), ("का", 2), ("मा", 1), ("द्वारा", 1), ("कि", 2),
    ("पछि", 1), ("की", 2), ("ले", 1), ("कै", 2), ("सँगै", 1),
    ("मै", 1), ("को", 2),
]
_NE_CAT1_BY_LEN = sorted(_NE_CAT1, key=lambda t: -len(t[0]))
_NE_CAT3 = [
    "थिए", "छ", "इछ", "एछ", "िछ", "ेछ", "नेछ", "हुनेछ", "इन्छ",
    "िन्छ", "हुन्छ", "एका", "इएका", "िएका", "ेका", "नेका", "दा",
    "इदा", "िदा", "देखि", "माथि", "एकी", "इएकी", "िएकी", "ेकी",
    "देखी", "थी", "दी", "छु", "एछु", "ेछु", "नेछु", "नु", "हरु",
    "हरू", "छे", "थे", "ने", "एकै", "ेकै", "नेकै", "दै", "इदै",
    "िदै", "एको", "इएको", "िएको", "ेको", "नेको", "दो", "इदो",
    "िदो", "यो", "इयो", "भयो", "ियो", "थियो", "दियो", "थ्यो",
    "छौ", "इछौ", "एछौ", "िछौ", "ेछौ", "नेछौ", "यौ", "थियौ",
    "छ्यौ", "थ्यौ", "छन्", "इछन्", "एछन्", "िछन्", "ेछन्",
    "नेछन्", "लान्", "छिन्", "थिन्", "पर्", "इस्", "थिइस्",
    "छस्", "इछस्", "एछस्", "िछस्", "ेछस्", "नेछस्", "िस्",
    "थिस्", "छेस्", "होस्",
]
_NE_CAT3_BY_LEN = sorted(_NE_CAT3, key=len, reverse=True)


def stem_ne(word: str) -> str:
    w = word
    # category 1 (longest match decides the case; a blocked case-2
    # deletion does NOT fall back to shorter suffixes)
    for suf, kind in _NE_CAT1_BY_LEN:
        if w.endswith(suf):
            if kind == 1 or not w[: -len(suf)].endswith(("ए", "े")):
                w = w[: -len(suf)]
            break
    while True:
        # category 2: conditional single-character removal
        if w.endswith(("ँ", "ं")):
            if w[:-1].endswith(("यौ", "छौ", "नौ", "थे")):
                w = w[:-1]
        elif w.endswith("ै") and w[:-1].endswith("त्र"):
            w = w[:-1]
        # category 3: longest-suffix delete; loop while it deletes
        for suf in _NE_CAT3_BY_LEN:
            if w.endswith(suf):
                w = w[: -len(suf)]
                break
        else:
            break
    return w


STEMMERS["nepali"] = stem_ne
