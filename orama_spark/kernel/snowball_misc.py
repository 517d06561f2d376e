"""Snowball stemmers: Indonesian (lib/id.js), Irish (lib/ie.js),
Lithuanian (lib/lt.js), Armenian (lib/am.js).

Implemented from the PUBLIC Snowball algorithm descriptions
(snowballstem.org/algorithms/) and differential-fuzzed against the
reference's compiled stemmers via tools/fuzz_stemmers.py.

Each ``stem_xx(word)`` expects a lowercased word.
"""

from __future__ import annotations

from .snowball import STEMMERS

# ------------------------------------------------------------- Indonesian
# Snowball indonesian: the measure is the word's vowel count; every
# removal step decrements it and each subsequent step requires it to
# stay > 2. Prefix removal records a prefix type `t` that gates which
# suffixes may be removed (derivational pairing rules).
_ID_VOWELS = frozenset("aeiou")


def _id_first_prefix(w: str) -> tuple[str, int, bool, int]:
    """Remove one first-order prefix. Returns (word, t, removed, limit)
    where limit = chars at the front the suffix step may not touch
    (1 after a p/s substitution — the Snowball cursor lands after the
    replacement and becomes the backward limit)."""
    n = len(w)
    if w.startswith("meny"):
        if n > 4 and w[4] in _ID_VOWELS:
            return "s" + w[4:], 1, True, 1
        # condition failed -> among falls back to its longest proper
        # prefix in the table: 'men'
        return w[3:], 1, True, 0
    if w.startswith("meng"):
        return w[4:], 1, True, 0
    if w.startswith("peny"):
        if n > 4 and w[4] in _ID_VOWELS:
            return "s" + w[4:], 3, True, 1
        return w[3:], 3, True, 0
    if w.startswith("peng"):
        return w[4:], 3, True, 0
    if w.startswith("mem"):
        if n > 3 and w[3] in _ID_VOWELS:
            return "p" + w[3:], 1, True, 1
        return w[3:], 1, True, 0
    if w.startswith("men"):
        return w[3:], 1, True, 0
    if w.startswith("pem"):
        if n > 3 and w[3] in _ID_VOWELS:
            return "p" + w[3:], 3, True, 1
        return w[3:], 3, True, 0
    if w.startswith("pen"):
        return w[3:], 3, True, 0
    if w.startswith("ter"):
        return w[3:], 1, True, 0
    if w.startswith("di"):
        return w[2:], 1, True, 0
    if w.startswith("ke"):
        return w[2:], 3, True, 0
    if w.startswith("me"):
        return w[2:], 1, True, 0
    return w, 0, False, 0


def _id_second_prefix(w: str, t: int) -> tuple[str, int, bool]:
    if w.startswith("pelajar"):
        return "ajar" + w[7:], t, True
    if w.startswith("belajar"):
        return "ajar" + w[7:], 4, True
    if w.startswith("ber"):
        return w[3:], 4, True
    if w.startswith("per"):
        return w[3:], 2, True
    if w.startswith("be") and len(w) > 4 and w[2] not in _ID_VOWELS \
            and w[3:5] == "er":
        return w[2:], 4, True
    if w.startswith("pe"):
        return w[2:], 2, True
    return w, t, False


def _id_suffix(w: str, t: int, limit: int) -> tuple[str, bool]:
    n = len(w)
    if w.endswith("kan") and n - 3 >= limit:
        if t not in (2, 3):
            return w[:-3], True
        # fall back to 'an'
        if t != 1:
            return w[:-2], True
        return w, False
    if w.endswith("an") and n - 2 >= limit:
        if t != 1:
            return w[:-2], True
        return w, False
    if w.endswith("i") and n - 1 >= limit:
        preceded_by_s = n - 2 >= limit and n >= 2 and w[n - 2] == "s"
        if t <= 2 and not preceded_by_s:
            return w[:-1], True
        return w, False
    return w, False


def stem_id(word: str) -> str:
    s = sum(1 for ch in word if ch in _ID_VOWELS)
    if s <= 2:
        return word
    w = word
    for suf in ("kah", "lah", "pun"):  # particle
        if w.endswith(suf):
            w = w[:-3]
            s -= 1
            break
    if s <= 2:
        return w
    for suf in ("nya", "ku", "mu"):  # possessive pronoun
        if w.endswith(suf):
            w = w[: -len(suf)]
            s -= 1
            break
    if s <= 2:
        return w
    w2, t, removed, limit = _id_first_prefix(w)
    if removed:
        w = w2
        s -= 1
        if s > 2:
            w2, sufok = _id_suffix(w, t, limit)
            if sufok:
                w = w2
                s -= 1
                if s > 2:
                    # the second-order prefix matches from AFTER a p/s
                    # substitution (the Snowball cursor sits past the
                    # replacement), so the substituted char is immune
                    head, tail = w[:limit], w[limit:]
                    tail, t, removed2 = _id_second_prefix(tail, t)
                    if removed2:
                        w = head + tail
                        s -= 1
    else:
        w, t, removed2 = _id_second_prefix(w, t)
        if removed2:
            s -= 1
        if s > 2:
            w2, sufok = _id_suffix(w, t, 0)
            if sufok:
                w = w2
                s -= 1
    return w


STEMMERS["indonesian"] = stem_id
