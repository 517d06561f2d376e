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


# ------------------------------------------------------------------ Irish
# Snowball irish: undo initial mutation (eclipsis/lenition), compute
# RV/R1/R2, then three sequential backward steps — noun suffixes,
# derivational suffixes (with stem substitutions), verb endings.
_IE_VOWELS = frozenset("aeiouáéíóú")

# longest-prefix-first mutation table: (prefix, replacement)
_IE_MUTATIONS = [
    ("d'fh", "f"), ("bhf", "f"),
    ("b'", ""), ("bh", "b"), ("bp", "p"), ("ch", "c"), ("d'", ""),
    ("dh", "d"), ("dt", "t"), ("fh", "f"), ("gc", "c"), ("gh", "g"),
    ("h-", ""), ("m'", ""), ("mb", "b"), ("mh", "m"), ("n-", ""),
    ("nd", "d"), ("ng", "g"), ("ph", "p"), ("sh", "s"), ("t-", ""),
    ("th", "t"), ("ts", "s"),
]
_IE_MUTATIONS.sort(key=lambda t: -len(t[0]))

_IE_NOUN = [  # (suffix, case): 1 = delete in R1, 2 = delete in R2
    ("íochta", 1), ("aíochta", 1), ("ire", 2), ("aire", 2), ("abh", 1),
    ("eabh", 1), ("ibh", 1), ("aibh", 1), ("amh", 1), ("eamh", 1),
    ("imh", 1), ("aimh", 1), ("íocht", 1), ("aíocht", 1), ("irí", 2),
    ("airí", 2),
]
_IE_NOUN.sort(key=lambda t: -len(t[0]))

_IE_DERIV = [  # (suffix, case); case 1 deletes in R2, others substitute
    ("óideacha", 6), ("patacha", 5), ("achta", 1), ("arcachta", 2),
    ("eachta", 1), ("grafaíochta", 4), ("paite", 5), ("ach", 1),
    ("each", 1), ("óideach", 6), ("gineach", 3), ("patach", 5),
    ("grafaíoch", 4), ("pataigh", 5), ("óidigh", 6), ("achtúil", 1),
    ("eachtúil", 1), ("gineas", 3), ("ginis", 3), ("acht", 1),
    ("arcacht", 2), ("eacht", 1), ("grafaíocht", 4), ("arcachtaí", 2),
    ("grafaíochtaí", 4),
]
_IE_DERIV.sort(key=lambda t: -len(t[0]))
_IE_DERIV_SUB = {2: "arc", 3: "gin", 4: "graf", 5: "paite", 6: "óid"}

_IE_VERB = [  # (suffix, case): 1 = delete in RV, 2 = delete in R1
    ("imid", 1), ("aimid", 1), ("ímid", 1), ("aímid", 1), ("adh", 2),
    ("eadh", 2), ("faidh", 1), ("fidh", 1), ("áil", 2), ("ain", 2),
    ("tear", 2), ("tar", 2),
]
_IE_VERB.sort(key=lambda t: -len(t[0]))


def _ie_regions(w: str) -> tuple[int, int, int]:
    """(rv, r1, r2) as absolute offsets; len(w) when absent. rv = after
    the first vowel; r1/r2 = after the first/second vowel→non-vowel."""
    n = len(w)
    rv = r1 = r2 = n
    i = 0
    while i < n and w[i] not in _IE_VOWELS:
        i += 1
    if i < n:
        rv = i + 1
        i += 1
        while i < n and w[i] in _IE_VOWELS:
            i += 1
        if i < n:
            r1 = i + 1
            i += 1
            while i < n and w[i] not in _IE_VOWELS:
                i += 1
            if i < n:
                i += 1
                while i < n and w[i] in _IE_VOWELS:
                    i += 1
                if i < n:
                    r2 = i + 1
    return rv, r1, r2


def stem_ie(word: str) -> str:
    w = word
    for pre, rep in _IE_MUTATIONS:
        if w.startswith(pre):
            w = rep + w[len(pre):]
            break
    rv, r1, r2 = _ie_regions(w)
    for suf, kind in _IE_NOUN:
        if w.endswith(suf):
            pos = len(w) - len(suf)
            if (kind == 1 and r1 <= pos) or (kind == 2 and r2 <= pos):
                w = w[:pos]
            break
    for suf, kind in _IE_DERIV:
        if w.endswith(suf):
            pos = len(w) - len(suf)
            if kind == 1:
                if r2 <= pos:
                    w = w[:pos]
            else:
                w = w[:pos] + _IE_DERIV_SUB[kind]
            break
    for suf, kind in _IE_VERB:
        if w.endswith(suf):
            pos = len(w) - len(suf)
            if (kind == 1 and rv <= pos) or (kind == 2 and r1 <= pos):
                w = w[:pos]
            break
    return w


STEMMERS["irish"] = stem_ie


# ------------------------------------------------------------- Lithuanian
# Snowball lithuanian: R1 (scan skips the initial 'a' of >6-char words),
# then: normalize conflicting endings (aite->aitė etc.), delete one case
# ending in R1, fix č/dž palatalization, repeatedly delete derivational
# endings in R1, fix č/dž again, and collapse final 'gd' -> 'g'.
_LT_VOWELS = frozenset("aeiouyąėęįūų")

_LT_CONFLICTS = [  # (suffix, replacement), longest-first
    ("okatės", "okatė"), ("ojime", "ojimas"), ("ėjime", "ėjimas"),
    ("avime", "avimas"), ("okate", "okatė"), ("asius", "asys"),
    ("aitės", "aitė"), ("uotės", "uotė"), ("aite", "aitė"),
    ("uote", "uotė"), ("esiu", "esys"),
]
_LT_CASE = [
    "tumeisi", "tumėmės", "tumėtės", "iuosna", "tumėme", "tumėte",
    "siuosi", "čiausi", "telėti", "terėti", "tumeis", "enimis",
    "iosna", "uosna", "enyje", "eryje", "iuose", "enyse", "eryse",
    "eriai", "tumei", "erimi", "siesi", "ėjosi", "iuosi", "iuoti",
    "iauti", "inėti", "eniui", "tumėm", "iomis", "enims", "erims",
    "iamės", "kimės", "simės", "iatės", "sitės", "tumėt", "eria",
    "osna", "ysna", "ėsna", "enie", "erie", "ioje", "iuje", "iame",
    "sime", "iose", "uose", "iate", "kite", "site", "tute", "iumi",
    "iasi", "iesi", "aisi", "eisi", "uisi", "uosi", "ausi", "tųsi",
    "enti", "inti", "ioti", "uoti", "auti", "enio", "iais", "imis",
    "omis", "umis", "ėmis", "enis", "asis", "ysis", "iams", "iems",
    "ioms", "iuos", "iaus", "enys", "erys", "amės", "imės", "omės",
    "ėmės", "atės", "otės", "ėtės", "čiau", "eniu", "oje", "uje",
    "yje", "ėje", "ame", "ome", "ėme", "ose", "yse", "ėse", "ate",
    "ite", "ote", "ėte", "iai", "imi", "umi", "asi", "esi", "isi",
    "osi", "usi", "ąsi", "ėsi", "ųsi", "oti", "yti", "ėti", "iui",
    "iam", "iem", "sim", "tum", "ion", "iun", "ėjo", "ias", "ies",
    "ais", "ams", "ims", "oms", "ums", "ėms", "ens", "ios", "uos",
    "ers", "aus", "ius", "iąs", "tųs", "iat", "sit", "iau", "siu",
    "enį", "erį", "erų", "ia", "ie", "ai", "ei", "ki", "si", "ti",
    "ui", "oj", "ėj", "am", "im", "om", "ėm", "an", "on", "un",
    "ėn", "io", "uo", "as", "es", "is", "os", "us", "ys", "ąs",
    "ės", "įs", "ūs", "at", "it", "ot", "ėt", "au", "iu", "ią",
    "ių", "a", "e", "i", "k", "o", "s", "u", "y", "ą", "ė", "ę",
    "į", "ų",
]

_LT_DERIV = [
    "utėait", "uliuk", "učiuk", "siant", "iuoj", "zgan", "iais",
    "iuos", "iaus", "iant", "iuot", "ykšt", "ykšč", "ing", "iaj",
    "iej", "ioj", "uoj", "auj", "iąj", "iųj", "iok", "iuk", "išk",
    "iul", "dam", "jam", "ain", "esn", "iop", "ias", "ies", "ais",
    "ios", "uos", "aus", "iąs", "ant", "int", "uot", "iau", "dav",
    "ėję", "aj", "oj", "ąj", "ėj", "ųj", "ok", "yl", "ėl", "am",
    "op", "os", "ąs", "ęs", "ot", "yt", "ėt", "sv", "šv", "ę",
]


def _lt_r1(w: str) -> int:
    n = len(w)
    i = 1 if w.startswith("a") and n > 6 else 0
    while i < n and w[i] not in _LT_VOWELS:
        i += 1
    if i >= n:
        return n
    i += 1
    while i < n and w[i] in _LT_VOWELS:
        i += 1
    if i >= n:
        return n
    return i + 1


def _lt_fix_chdz(w: str) -> str:
    if w.endswith("č"):
        return w[:-1] + "t"
    if w.endswith("dž"):
        return w[:-2] + "d"
    return w


def stem_lt(word: str) -> str:
    w = word
    r1 = _lt_r1(w)
    for suf, rep in _LT_CONFLICTS:
        if w.endswith(suf):
            w = w[: -len(suf)] + rep
            break
    if len(w) >= r1:
        for suf in _LT_CASE:
            pos = len(w) - len(suf)
            if pos >= r1 and w.endswith(suf):
                w = w[:pos]
                break
    w = _lt_fix_chdz(w)
    while len(w) >= r1:
        for suf in _LT_DERIV:
            pos = len(w) - len(suf)
            if pos >= r1 and w.endswith(suf):
                w = w[:pos]
                break
        else:
            break
    w = _lt_fix_chdz(w)
    if w.endswith("gd"):
        w = w[:-2] + "g"
    return w


STEMMERS["lithuanian"] = stem_lt


# --------------------------------------------------------------- Armenian
# Snowball armenian: R1/R2 over the Armenian vowels; all matching is
# limited to R1; four sequential longest-suffix deletes — case endings
# (R2-gated), verb endings, adjective suffixes, noun suffixes.
_AM_VOWELS = frozenset("աեէըիուօ")

_AM_ENDING = sorted([  # delete when the suffix starts in R2
    "սա", "վա", "ամբ", "դ", "անդ", "ությանդ", "վանդ", "ոջդ", "երդ",
    "ներդ", "ուդ", "ը", "անը", "ությանը", "վանը", "ոջը", "երը",
    "ները", "ի", "վի", "երի", "ների", "անում", "երում", "ներում",
    "ն", "ան", "ության", "վան", "ին", "երին", "ներին", "ությանն",
    "երն", "ներն", "ուն", "ոջ", "ությանս", "վանս", "ոջս", "ով",
    "անով", "վով", "երով", "ներով", "եր", "ներ", "ց", "ից",
    "վանից", "ոջից", "վից", "երից", "ներից", "ցից", "ոց", "ուց",
], key=len, reverse=True)

_AM_VERB = sorted([
    "ա", "ացա", "եցա", "վե", "ացրի", "ացի", "եցի", "վեցի", "ալ",
    "ըալ", "անալ", "ենալ", "ացնալ", "ել", "ըել", "նել", "ցնել",
    "եցնել", "չել", "վել", "ացվել", "եցվել", "տել", "ատել", "ոտել",
    "կոտել", "ված", "ում", "վում", "ան", "ցան", "ացան", "ացրին",
    "ացին", "եցին", "վեցին", "ալիս", "ելիս", "ավ", "ացավ", "եցավ",
    "ալով", "ելով", "ար", "ացար", "եցար", "ացրիր", "ացիր", "եցիր",
    "վեցիր", "աց", "եց", "ացրեց", "ալուց", "ելուց", "ալու", "ելու",
    "աք", "ցաք", "ացաք", "ացրիք", "ացիք", "եցիք", "վեցիք", "անք",
    "ցանք", "ացանք", "ացրինք", "ացինք", "եցինք", "վեցինք",
], key=len, reverse=True)

_AM_ADJ = sorted([
    "րորդ", "երորդ", "ալի", "ակի", "որակ", "եղ", "ական", "արան",
    "են", "եկեն", "երեն", "որէն", "ին", "գին", "ովին", "լայն",
    "վուն", "պես", "իվ", "ատ", "ավետ", "կոտ", "բար",
], key=len, reverse=True)

_AM_NOUN = sorted([
    "որդ", "ույթ", "ուհի", "ցի", "իլ", "ակ", "յակ", "անակ", "իկ",
    "ուկ", "ան", "պան", "ստան", "արան", "եղէն", "յուն", "ություն",
    "ածո", "իչ", "ուս", "ուստ", "գար", "վոր", "ավոր", "ոց", "անօց",
    "ու", "ք", "չեք", "իք", "ալիք", "անիք", "վածք", "ույք", "ենք",
    "ոնք", "ունք", "մունք", "իչք", "արք",
], key=len, reverse=True)


def _am_regions(w: str) -> tuple[int, int]:
    """(pv, r2): pv = after the FIRST VOWEL (the backward limit — all
    suffix matching happens in [pv:]); r2 = after the subsequent
    non-vowel → vowel → non-vowel sequence (gates the ending table)."""
    n = len(w)
    i = 0
    while i < n and w[i] not in _AM_VOWELS:
        i += 1
    if i >= n:
        return n, n
    pv = i + 1
    i = pv
    while i < n and w[i] in _AM_VOWELS:
        i += 1
    if i >= n:
        return pv, n
    i += 1
    while i < n and w[i] not in _AM_VOWELS:
        i += 1
    if i >= n:
        return pv, n
    i += 1
    while i < n and w[i] in _AM_VOWELS:
        i += 1
    if i >= n:
        return pv, n
    return pv, i + 1


def stem_am(word: str) -> str:
    w = word
    r1, r2 = _am_regions(w)
    if len(w) < r1:
        return w
    for table, need_r2 in (
        (_AM_ENDING, True), (_AM_VERB, False), (_AM_ADJ, False),
        (_AM_NOUN, False),
    ):
        for suf in table:
            pos = len(w) - len(suf)
            if pos >= r1 and w.endswith(suf):
                if not need_r2 or pos >= r2:
                    w = w[:pos]
                break
    return w


STEMMERS["armenian"] = stem_am
