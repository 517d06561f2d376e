"""Non-Snowball light stemmers shipped by the reference:

* Bulgarian — Lucene's BulgarianStemmer (BUIR light-stemming paper), as
  compiled to JS in ``packages/stemmers/lib/bg.js``.
* Sanskrit — suffix-strip light stemmer (``lib/sk.js``).
* Ukrainian — the Drupal-lineage regex stemmer (``lib/uk.js``).

All three are re-implemented from the public algorithms, then
differential-fuzzed against the reference's JS (tools/fuzz_stemmers.py)
— including the reference's own bugs, which are load-bearing for
ranking parity:

QUIRK (bg, researched): the JS port writes ``s[i] = 'н'`` on a *string*
— in an ES module (strict mode) that THROWS TypeError, so the
reference's Bulgarian stemmer CRASHES the tokenizer on any word hitting
a letter-substitution branch (ен→н, ъN→N, ци→к, зи→г, си→х, еXи→яX,
еве→йN; ``tokenizer/index.ts:36`` has no try/catch). There is no
reference output to match on those words, so we implement the
upstream-correct Lucene behavior (substitutions applied to a char
list); on every word the reference does NOT crash on, we match it
exactly (differential fuzz, tools/fuzz_stemmers.py).
"""

from __future__ import annotations

import re

from .snowball import STEMMERS

# --------------------------------------------------------------- Sanskrit
_SK_SUFFIXES = (
    "aḥ", "āḥ", "iḥ", "īḥ", "uḥ", "ūḥ", "am", "ām", "im", "īm", "um",
    "ūm", "an", "ān", "in", "īn", "un", "ūn", "as", "ās", "is", "īs",
    "us", "ūs",
)


def stem_sk(word: str) -> str:
    for suf in _SK_SUFFIXES:
        if word.endswith(suf):
            return word[: -len(suf)]
    return word


# -------------------------------------------------------------- Bulgarian
def _bg_ends(s: list, ln: int, suf: str) -> bool:
    return ln >= len(suf) and "".join(s[ln - len(suf):ln]) == suf


def _bg_remove_article(s: list, ln: int) -> int:
    if ln > 6 and _bg_ends(s, ln, "ият"):
        return ln - 3
    if ln > 5 and any(
        _bg_ends(s, ln, x) for x in ("ът", "то", "те", "та", "ия")
    ):
        return ln - 2
    if ln > 4 and _bg_ends(s, ln, "ят"):
        return ln - 2
    return ln


def _bg_remove_plural(s: list, ln: int) -> int:
    if ln > 6:
        if _bg_ends(s, ln, "овци"):
            return ln - 3
        if _bg_ends(s, ln, "ове"):
            return ln - 3
        if _bg_ends(s, ln, "еве"):
            s[ln - 3] = "й"  # reference crashes here (see QUIRK)
            return ln - 2
    if ln > 5:
        if _bg_ends(s, ln, "ища"):
            return ln - 3
        if _bg_ends(s, ln, "та"):
            return ln - 2
        if _bg_ends(s, ln, "ци"):
            s[ln - 2] = "к"
            return ln - 1
        if _bg_ends(s, ln, "зи"):
            s[ln - 2] = "г"
            return ln - 1
        if s[ln - 3] == "е" and s[ln - 1] == "и":
            s[ln - 3] = "я"
            return ln - 1
    if ln > 4:
        if _bg_ends(s, ln, "си"):
            s[ln - 2] = "х"
            return ln - 1
        if _bg_ends(s, ln, "и"):
            return ln - 1
    return ln


def stem_bg(word: str) -> str:
    s = list(word)
    ln = len(s)
    if ln < 4:
        return word
    if ln > 5 and _bg_ends(s, ln, "ища"):
        return word[: ln - 3]
    ln = _bg_remove_article(s, ln)
    ln = _bg_remove_plural(s, ln)
    if ln > 3:
        if _bg_ends(s, ln, "я"):
            ln -= 1
        if any(_bg_ends(s, ln, x) for x in ("а", "о", "е")):
            ln -= 1
    if ln > 4 and _bg_ends(s, ln, "ен"):
        s[ln - 2] = "н"
        ln -= 1
    if ln > 5 and s[ln - 2] == "ъ":
        s[ln - 2] = s[ln - 1]
        ln -= 1
    return "".join(s[:ln])


# -------------------------------------------------------------- Ukrainian
_UK_VOWEL = re.compile("[аеиоуюяіїє]")
_UK_PERFECTIVE = re.compile(
    "(?:[иы]в(?:ши(?:сь)?)?|(?<=[ая])(?:в(?:ши(?:сь)?)?))$"
)
_UK_REFLEXIVE = re.compile("с[яьи]$")
_UK_ADJECTIVE = re.compile(
    "(?:[аеєуюя]|еє|ем|єє|ий|их|іх|ів|ій|ім|їй|ім|им|ими|іми|йми|ої|ою|"
    "ова|ове|ого|ому)$"
)
_UK_PARTICIPLE = re.compile("(?:[аіу]|ій|ий|им|ім|их|йми|ого|ому|ою)$")
_UK_VERB = re.compile(
    "(?:[еєую]|ав|али|ати|вши|ив|ити|ме|сь|ся|ши|учи|яти|ячи|ать|ять)$"
)
_UK_NOUN = re.compile(
    "(?:[аеєіїийоуыьюя]|ам|ах|ами|ев|еві|еи|ей|ем|ею|єм|єю|ів|їв|ий|ием|"
    "ию|ия|иям|иях|ов|ові|ой|ом|ою|ью|ья|ям|ями|ях)$"
)
_UK_DERIVATIONAL = re.compile(
    "[^аеиоуюяіїє][аеиоуюяіїє]+[^аеиоуюяіїє]+[аеиоуюяіїє].*(?<=о)сть?$"
)
_UK_STEP2 = re.compile("и$")
_UK_STEP3 = re.compile("ость$")
_UK_STEP41 = re.compile("ь$")
_UK_STEP42 = re.compile("ейше$")
_UK_STEP43 = re.compile("нн$")


def stem_uk(word: str) -> str:
    """Quirk-faithful port of lib/uk.js: the first-vowel scan runs on the
    ORIGINAL (pre-lowercase) input, so a word whose only vowels are
    uppercase returns unchanged."""
    lowered = word.lower()
    m = _UK_VOWEL.search(word)
    if m is None:
        return word
    idx = m.start()
    head, rest = lowered[: idx + 1], lowered[idx + 1:]
    if rest == "":
        return word

    def sub(rx: re.Pattern, repl: str = "") -> bool:
        nonlocal rest
        new = rx.sub(repl, rest)
        changed = new != rest
        rest = new
        return changed

    # step 1
    if not sub(_UK_PERFECTIVE):
        sub(_UK_REFLEXIVE)
        if sub(_UK_ADJECTIVE):
            sub(_UK_PARTICIPLE)
        elif not sub(_UK_VERB):
            sub(_UK_NOUN)
    # step 2
    sub(_UK_STEP2)
    # step 3
    if _UK_DERIVATIONAL.search(rest):
        sub(_UK_STEP3)
    # step 4
    if not sub(_UK_STEP41):
        sub(_UK_STEP42)
        sub(_UK_STEP43, "н")
    return head + rest


STEMMERS["bulgarian"] = stem_bg
STEMMERS["sanskrit"] = stem_sk
STEMMERS["ukrainian"] = stem_uk


# Reference quirk (languages.ts:25): `slovenian: 'ru'` — Slovenian is
# wired to the RUSSIAN stemmer. Replicated verbatim: a Latin-script
# Slovenian word passes through the Cyrillic-suffix rules untouched,
# exactly as in the reference.
STEMMERS["slovenian"] = STEMMERS["russian"]
