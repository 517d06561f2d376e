"""Snowball Arabic stemmer (reference: lib/ar.js, compiled from the
PUBLIC arabic.sbl on snowballstem.org).

Pipeline: noun/verb/definite flags from the article prefix (checked on
the RAW word), char-level normalization (diacritics out, Arabic-Indic
digits to ASCII, presentation forms folded), backward suffix stripping
(verb path, else noun path, else alef-maqsura fix), forward prefix
stripping, then post-normalization of hamza carriers.

All length gates test the CURRENT word length at check time, exactly as
the reference does. Differential-fuzzed vs the compiled reference
(0 mismatches). ``stem_ar(word)`` — Arabic has no case.
"""

from __future__ import annotations

from .snowball import STEMMERS

# ---- normalize_pre: single-char fold (str.translate) ----
_PRE_MAP: dict[int, str] = {}
for ch in "ـًٌٍَُِّْ":
    _PRE_MAP[ord(ch)] = ""                      # tatweel + harakat
for i in range(10):                              # ٠..٩ -> 0..9
    _PRE_MAP[0x0660 + i] = str(i)
_PRESENTATION = {
    "ء": ["ﺀ"],
    "آ": ["ﺁ", "ﺂ"],
    "أ": ["ﺃ", "ﺄ"],
    "ؤ": ["ﺅ", "ﺆ"],
    "إ": ["ﺇ", "ﺈ"],
    "ئ": ["ﺉ", "ﺊ", "ﺋ", "ﺌ"],
    "ا": ["ﺍ", "ﺎ"],
    "ب": ["ﺏ", "ﺐ", "ﺑ", "ﺒ"],
    "ة": ["ﺓ", "ﺔ"],
    "ت": ["ﺕ", "ﺖ", "ﺗ", "ﺘ"],
    "ث": ["ﺙ", "ﺚ", "ﺛ", "ﺜ"],
    "ج": ["ﺝ", "ﺞ", "ﺟ", "ﺠ"],
    "ح": ["ﺡ", "ﺢ", "ﺣ", "ﺤ"],
    "خ": ["ﺥ", "ﺦ", "ﺧ", "ﺨ"],
    "د": ["ﺩ", "ﺪ"],
    "ذ": ["ﺫ", "ﺬ"],
    "ر": ["ﺭ", "ﺮ"],
    "ز": ["ﺯ", "ﺰ"],
    "س": ["ﺱ", "ﺲ", "ﺳ", "ﺴ"],
    "ش": ["ﺵ", "ﺶ", "ﺷ", "ﺸ"],
    "ص": ["ﺹ", "ﺺ", "ﺻ", "ﺼ"],
    "ض": ["ﺽ", "ﺾ", "ﺿ", "ﻀ"],
    "ط": ["ﻁ", "ﻂ", "ﻃ", "ﻄ"],
    "ظ": ["ﻅ", "ﻆ", "ﻇ", "ﻈ"],
    "ع": ["ﻉ", "ﻊ", "ﻋ", "ﻌ"],
    "غ": ["ﻍ", "ﻎ", "ﻏ", "ﻐ"],
    "ف": ["ﻑ", "ﻒ", "ﻓ", "ﻔ"],
    "ق": ["ﻕ", "ﻖ", "ﻗ", "ﻘ"],
    "ك": ["ﻙ", "ﻚ", "ﻛ", "ﻜ"],
    "ل": ["ﻝ", "ﻞ", "ﻟ", "ﻠ"],
    "م": ["ﻡ", "ﻢ", "ﻣ", "ﻤ"],
    "ن": ["ﻥ", "ﻦ", "ﻧ", "ﻨ"],
    "ه": ["ﻩ", "ﻪ", "ﻫ", "ﻬ"],
    "و": ["ﻭ", "ﻮ"],
    "ى": ["ﻯ", "ﻰ"],
    "ي": ["ﻱ", "ﻲ", "ﻳ", "ﻴ"],
    "لآ": ["ﻵ", "ﻶ"],
    "لأ": ["ﻷ", "ﻸ"],
    "لإ": ["ﻹ", "ﻺ"],
    "لا": ["ﻻ", "ﻼ"],
}
for target, sources in _PRESENTATION.items():
    for s in sources:
        _PRE_MAP[ord(s)] = target

# normalize_post char fold (after the final-hamza rule)
_POST_MAP = {ord("آ"): "ا", ord("أ"): "ا", ord("إ"): "ا",
             ord("ؤ"): "و", ord("ئ"): "ي"}

_CHECKS_DEFINITE = ["بال", "كال", "ال", "لل"]  # longest-first

def _amg(pairs):
    return sorted(pairs, key=lambda t: -len(t[0]))

# (suffix, min_len): the word length at check time must be >= min_len
_S_NOUN_TAA = [("\u0629", 4)]                    # T: taa marbuta
_S_NOUN_2A = _amg([("\u0643\u0645\u0627", 6), ("\u0647\u0645\u0627", 6),
                   ("\u0646\u0627", 5), ("\u0647\u0627", 5),
                   ("\u0643", 4), ("\u0643\u0645", 5), ("\u0647\u0645", 5),
                   ("\u0647\u0646", 5), ("\u0647", 4), ("\u064a", 4)])  # O
_S_NOUN_2B = [("\u0627", 5), ("\u0648", 5), ("\u064a", 5)]   # M: len>4
_S_NOUN_NUN = [("\u0646", 6)]                    # N: len>5
_S_NOUN_AAT = [("\u0627\u062a", 5)]             # P
_S_NOUN_TA = [("\u062a", 4)]                     # Q
_S_NOUN_YA = [("\u064a", 3)]                     # U: Step3
_S_VERB_1 = _amg([("ا", 4), ("تا", 5), ("تما", 6), ("نا", 5), ("ت", 4),
                  ("ن", 4), ("ان", 6), ("تن", 5), ("ون", 6), ("ين", 6),
                  ("ي", 4)])                                       # S
_S_VERB_2A = _amg([("كما", 6), ("هما", 6), ("نا", 5), ("ها", 5), ("ك", 4),
                   ("كم", 5), ("هم", 5), ("كن", 5), ("هن", 5), ("ه", 4),
                   ("كمو", 6), ("ني", 5)])                          # R
_S_VERB_2B = _amg([("وا", 5), ("تم", 5)])                           # V
_S_VERB_2C = _amg([("و", 4), ("تمو", 6)])                           # I

_P_STEP1 = _amg([("أأ", "أ"), ("أآ", "آ"), ("أؤ", "أ"), ("أإ", "إ"),
                 ("أا", "ا")])                                      # len>3
_P_3A = _amg([("بال", 5), ("كال", 5), ("ال", 4), ("لل", 4)])  # H: len> n
_P_3B = _amg([("با", None), ("بب", "ب"), ("كك", "ك"), ("ب", "")])  # G: len>3
_P_4V = _amg([("سأ", "أ"), ("ست", "ت"), ("سن", "ن"), ("سي", "ي")])  # E: len>4
_P_X = ("تست", "نست", "يست")                                       # x: len>4


def _match(w: str, cur: int, table) -> tuple[str, int] | None:
    """Longest suffix of w[:cur] from table -> (suffix, meta)."""
    for suf, meta in table:
        if cur >= len(suf) and w[cur - len(suf):cur] == suf:
            return suf, meta
    return None


def _del_if(w: str, table, min_len_override=None) -> tuple[str, bool]:
    """Backward delete at end when the table's per-entry (or overridden)
    min-length gate passes."""
    m = _match(w, len(w), table)
    if m is None:
        return w, False
    suf, min_len = m
    need = min_len_override if min_len_override is not None else min_len
    if len(w) < need:
        return w, False
    return w[: len(w) - len(suf)], True


def _verb_suffixes(w: str) -> tuple[str, bool]:
    """Backward verb path. Returns (word, handled)."""
    # repeat Suffix_Verb_Step2a
    any2a = False
    while True:
        w2, ok = _del_if(w, _S_VERB_2A)
        if not ok:
            break
        w = w2
        any2a = True
    if any2a:
        w2, ok = _del_if(w, _S_VERB_1)
        if ok:
            return w2, True
        w2, ok = _del_if(w, _S_VERB_2C)
        if ok:
            return w2, True
        if len(w) > 0:
            # mandatory skip of one char (Snowball `next`), no deletion
            return w, True
        # at limit: fall through to 2b / step1 on the 2a-stripped word
    w2, ok = _del_if(w, _S_VERB_2B)
    if ok:
        return w2, True
    w2, ok = _del_if(w, _S_VERB_1)
    if ok:
        return w2, True
    return w, False


def _noun_suffixes(w: str, defined: bool) -> tuple[str, bool]:
    """Backward noun path. Returns (word, ya_deleted) — a True flag
    skips the alef-maqsura fallback."""
    cur_off = 0  # chars at the end excluded from the final-ya match
    while True:  # single pass; `break` = reach the final-ya step
        w2, ok = _del_if(w, _S_NOUN_TAA)
        if ok:
            w = w2
            break
        if not defined:
            m = _match(w, len(w), _S_NOUN_2A)
            if m is not None and len(w) >= m[1]:
                w = w[: len(w) - len(m[0])]
                w2, ok = _del_if(w, _S_NOUN_2B)
                if ok:
                    w = w2
                    break
                w2, ok = _del_if(w, _S_NOUN_AAT)
                if ok:
                    w = w2
                    break
                w2, ok = _del_if(w, _S_NOUN_TA)
                if ok:
                    w = w2
                    break
                if len(w) > 0:
                    cur_off = 1  # Snowball `next`: ya matches 1 short
                    break
                # at limit: keep the 2a deletion, continue cascading
        m = _match(w, len(w), _S_NOUN_NUN)
        if m is not None and len(w) >= m[1]:
            w = w[: len(w) - 1]
            w2, ok = _del_if(w, _S_NOUN_2B)
            if ok:
                w = w2
                break
            w2, ok = _del_if(w, _S_NOUN_AAT)
            if ok:
                w = w2
                break
            w2, ok = _del_if(w, _S_NOUN_TA)
            if ok:
                w = w2
                break
            # none matched: keep the nun deletion, continue cascading
        if not defined:
            w2, ok = _del_if(w, _S_NOUN_2B)
            if ok:
                w = w2
                break
        w2, ok = _del_if(w, _S_NOUN_AAT)
        if ok:
            w = w2
        break
    # final ya (Suffix_Noun_Step3) at (end - cur_off)
    cur = len(w) - cur_off
    m = _match(w, cur, _S_NOUN_YA)
    if m is not None and len(w) >= 3:
        return w[: cur - 1] + w[cur:], True
    return w, False


def stem_ar(word: str) -> str:
    w = word
    # Checks_1 on the RAW word
    is_noun = is_verb = True
    defined = False
    for pre in _CHECKS_DEFINITE:
        if w.startswith(pre):
            need = 4 if pre in ("بال", "كال") else 3
            if len(w) > need:
                is_noun, is_verb, defined = True, False, True
            break
    # normalize_pre
    w = w.translate(_PRE_MAP)

    # backward suffix section
    handled = False
    if is_verb:
        w, handled = _verb_suffixes(w)
    if not handled and is_noun:
        w, handled = _noun_suffixes(w, defined)
    if not handled:
        if w.endswith("ى"):
            w = w[:-1] + "ي"

    # forward prefix section — steps run at a RUNNING cursor: each
    # successful step leaves the cursor after its replacement, and the
    # next step matches from there (e.g. the conjunction step strips a
    # waw at position 1 after the hamza step replaced a 2-char prefix).
    pos = 0
    for pre, rep in _P_STEP1:
        if w.startswith(pre, pos):
            if len(w) > 3:
                w = w[:pos] + rep + w[pos + len(pre):]
                pos += len(rep)
            break
    if len(w) > 3 and pos < len(w) and w[pos] in "\u0641\u0648" \
            and not w.startswith("\u0627", pos + 1):
        w = w[:pos] + w[pos + 1:]
    step3_done = False
    for pre, need in _P_3A:
        if w.startswith(pre, pos):
            if len(w) > need:
                w = w[:pos] + w[pos + len(pre):]
                step3_done = True
            break
    if not step3_done and is_noun:
        for pre, rep in _P_3B:
            if w.startswith(pre, pos):
                if rep is None:
                    step3_done = True          # matches without change
                elif len(w) > 3:
                    w = w[:pos] + rep + w[pos + len(pre):]
                    step3_done = True
                break
    if not step3_done and is_verb:
        npos = pos
        for pre, rep in _P_4V:
            if w.startswith(pre, pos):
                if len(w) > 4:
                    w = w[:pos] + rep + w[pos + len(pre):]
                    npos = pos + len(rep)
                break
        for pre in _P_X:
            if w.startswith(pre, npos) and len(w) > 4:
                w = w[:npos] + "\u0627\u0633\u062a" + w[npos + len(pre):]
                break

    # normalize_post
    if w and w[-1] in "آأؤإئ":
        w = w[:-1] + "ء"
    w = w.translate(_POST_MAP)
    return w


STEMMERS["arabic"] = stem_ar
