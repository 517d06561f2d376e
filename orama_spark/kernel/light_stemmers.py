"""Non-Snowball light stemmers shipped by the reference:

* Bulgarian — Lucene's BulgarianStemmer (BUIR light-stemming paper), as
  compiled to JS in ``packages/stemmers/lib/bg.js``.
* Sanskrit — suffix-strip light stemmer (``lib/sk.js``).
* Ukrainian — the Drupal-lineage regex stemmer (``lib/uk.js``).

All three are re-implemented from the public algorithms, then
differential-fuzzed against the reference's JS (tools/fuzz_stemmers.py)
— including the reference's own bugs, which are load-bearing for
ranking parity:

QUIRK (bg): the JS port writes ``s[i] = 'н'`` on a *string* — a silent
no-op in JavaScript (strings are immutable; Lucene's Java original used
a char[]). The reference therefore never performs the letter
substitutions (ен→н, ъN→N, ци→к, зи→г, си→х, еXи→яX, еве→йе), only the
length truncations. We replicate truncation-only behavior exactly.
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
def _bg_ends(w: str, ln: int, suf: str) -> bool:
    return ln >= len(suf) and w[ln - len(suf):ln] == suf


def _bg_remove_article(w: str, ln: int) -> int:
    if ln > 6 and _bg_ends(w, ln, "ият"):
        return ln - 3
    if ln > 5 and any(
        _bg_ends(w, ln, s) for s in ("ът", "то", "те", "та", "ия")
    ):
        return ln - 2
    if ln > 4 and _bg_ends(w, ln, "ят"):
        return ln - 2
    return ln


def _bg_remove_plural(w: str, ln: int) -> int:
    if ln > 6:
        if _bg_ends(w, ln, "овци"):
            return ln - 3
        if _bg_ends(w, ln, "ове"):
            return ln - 3
        if _bg_ends(w, ln, "еве"):
            return ln - 2  # 'й' substitution is a JS no-op (see QUIRK)
    if ln > 5:
        if _bg_ends(w, ln, "ища"):
            return ln - 3
        if _bg_ends(w, ln, "та"):
            return ln - 2
        if _bg_ends(w, ln, "ци"):
            return ln - 1  # 'к' substitution no-op
        if _bg_ends(w, ln, "зи"):
            return ln - 1  # 'г' substitution no-op
        if w[ln - 3] == "е" and w[ln - 1] == "и":
            return ln - 1  # 'я' substitution no-op
    if ln > 4:
        if _bg_ends(w, ln, "си"):
            return ln - 1  # 'х' substitution no-op
        if _bg_ends(w, ln, "и"):
            return ln - 1
    return ln


def stem_bg(word: str) -> str:
    ln = len(word)
    if ln < 4:
        return word
    if ln > 5 and _bg_ends(word, ln, "ища"):
        return word[: ln - 3]
    ln = _bg_remove_article(word, ln)
    ln = _bg_remove_plural(word, ln)
    if ln > 3:
        if _bg_ends(word, ln, "я"):
            ln -= 1
        if any(_bg_ends(word, ln, s) for s in ("а", "о", "е")):
            ln -= 1
    if ln > 4 and _bg_ends(word, ln, "ен"):
        ln -= 1  # 'н' substitution no-op
    if ln > 5 and word[ln - 2] == "ъ":
        ln -= 1  # ъN→N substitution no-op
    return word[:ln]


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
