"""English Porter stemmer — exact port of the reference implementation.

Reference: /root/reference/packages/orama/src/components/tokenizer/english-stemmer.ts:56-192

This is a *behavioral* port of the reference's JS stemmer, including its
known quirk at english-stemmer.ts:161: in the step-4 ``-ion`` branch the
expression ``stem = fp?.[1] ?? '' + fp?.[2] ?? ''`` binds as
``fp[1] ?? (('' + fp[2]) ?? '')`` due to operator precedence, so the stem
is ``fp[1]`` alone — the trailing ``s``/``t`` is dropped (e.g.
``adoption -> adop``, where textbook Porter yields ``adopt``). We
reproduce that exactly; golden vectors are generated from the reference
source via node (tests/vectors/).
"""

from __future__ import annotations

import re

_STEP2_LIST = {
    "ational": "ate",
    "tional": "tion",
    "enci": "ence",
    "anci": "ance",
    "izer": "ize",
    "bli": "ble",
    "alli": "al",
    "entli": "ent",
    "eli": "e",
    "ousli": "ous",
    "ization": "ize",
    "ation": "ate",
    "ator": "ate",
    "alism": "al",
    "iveness": "ive",
    "fulness": "ful",
    "ousness": "ous",
    "aliti": "al",
    "iviti": "ive",
    "biliti": "ble",
    "logi": "log",
}

_STEP3_LIST = {
    "icate": "ic",
    "ative": "",
    "alize": "al",
    "iciti": "ic",
    "ical": "ic",
    "ful": "",
    "ness": "",
}

# Consonant / vowel character classes (english-stemmer.ts:39-45).
# Note: uppercase 'Y' (the marker for a word-initial y) matches the
# consonant classes and not the vowel classes, exactly as in the JS
# source where the classes are case-sensitive.
_c = "[^aeiou]"
_v = "[aeiouy]"
_C = _c + "[^aeiouy]*"
_V = _v + "[aeiou]*"

_MGR0 = re.compile("^(" + _C + ")?" + _V + _C)
_MEQ1 = re.compile("^(" + _C + ")?" + _V + _C + "(" + _V + ")?$")
_MGR1 = re.compile("^(" + _C + ")?" + _V + _C + _V + _C)
_S_V = re.compile("^(" + _C + ")?" + _v)

_RE_SSES = re.compile(r"^(.+?)(ss|i)es$")
_RE_S = re.compile(r"^(.+?)([^s])s$")
_RE_EED = re.compile(r"^(.+?)eed$")
_RE_ED_ING = re.compile(r"^(.+?)(ed|ing)$")
_RE_AT_BL_IZ = re.compile(r"(at|bl|iz)$")
_RE_DOUBLE = re.compile(r"([^aeiouylsz])\1$")
_RE_CVC = re.compile("^" + _C + _v + "[^aeiouwxy]$")
_RE_Y = re.compile(r"^(.+?)y$")
_RE_STEP2 = re.compile(
    r"^(.+?)(ational|tional|enci|anci|izer|bli|alli|entli|eli|ousli|"
    r"ization|ation|ator|alism|iveness|fulness|ousness|aliti|iviti|biliti|logi)$"
)
_RE_STEP3 = re.compile(r"^(.+?)(icate|ative|alize|iciti|ical|ful|ness)$")
_RE_STEP4 = re.compile(
    r"^(.+?)(al|ance|ence|er|ic|able|ible|ant|ement|ment|ent|ou|ism|ate|"
    r"iti|ous|ive|ize)$"
)
_RE_ION = re.compile(r"^(.+?)(s|t)(ion)$")
_RE_E = re.compile(r"^(.+?)e$")
_RE_LL = re.compile(r"ll$")


def stem(w: str) -> str:
    """Port of ``stemmer(w)`` (english-stemmer.ts:56-192)."""
    if len(w) < 3:
        return w

    firstch = w[0]
    if firstch == "y":
        w = "Y" + w[1:]

    # Step 1a
    m = _RE_SSES.match(w)
    if m:
        w = m.group(1) + m.group(2)
    else:
        m = _RE_S.match(w)
        if m:
            w = m.group(1) + m.group(2)

    # Step 1b
    m = _RE_EED.match(w)
    if m:
        if _MGR0.search(m.group(1)):
            w = w[:-1]
    else:
        m = _RE_ED_ING.match(w)
        if m:
            stem_ = m.group(1)
            if _S_V.search(stem_):
                w = stem_
                if _RE_AT_BL_IZ.search(w):
                    w = w + "e"
                elif _RE_DOUBLE.search(w):
                    w = w[:-1]
                elif _RE_CVC.search(w):
                    w = w + "e"

    # Step 1c
    m = _RE_Y.match(w)
    if m:
        stem_ = m.group(1)
        if stem_ and _S_V.search(stem_):
            w = stem_ + "i"

    # Step 2
    m = _RE_STEP2.match(w)
    if m:
        stem_, suffix = m.group(1), m.group(2)
        if stem_ and _MGR0.search(stem_):
            w = stem_ + _STEP2_LIST[suffix]

    # Step 3
    m = _RE_STEP3.match(w)
    if m:
        stem_, suffix = m.group(1), m.group(2)
        if stem_ and _MGR0.search(stem_):
            w = stem_ + _STEP3_LIST[suffix]

    # Step 4
    m = _RE_STEP4.match(w)
    if m:
        stem_ = m.group(1)
        if stem_ and _MGR1.search(stem_):
            w = stem_
    else:
        m = _RE_ION.match(w)
        if m:
            # Reference quirk (english-stemmer.ts:161): operator
            # precedence makes stem = fp[1] alone, dropping the s/t.
            stem_ = m.group(1)
            if _MGR1.search(stem_):
                w = stem_

    # Step 5
    m = _RE_E.match(w)
    if m:
        stem_ = m.group(1)
        if stem_ and (
            _MGR1.search(stem_)
            or (_MEQ1.search(stem_) and not _RE_CVC.search(stem_))
        ):
            w = stem_

    if _RE_LL.search(w) and _MGR1.search(w):
        w = w[:-1]

    if firstch == "y":
        w = "y" + w[1:]

    return w
