"""Snowball Turkish stemmer (reference: lib/tr.js, compiled from the
PUBLIC turkish.sbl on snowballstem.org).

Structure follows the published algorithm's routines: a 2-vowel gate,
check_vowel_harmony, optional-letter markers (n/s/y/U), the nominal-verb
suffix cascade, the noun suffix cascade with the recursive
stem_suffix_chain_before_ki, then append-U and last-consonant postlude.

Mark functions take (word, cur) and return (ok, new_cur) without
mutating the word; cascades splice deletions as w[:c] + w[d:] because
the ki-chain can delete interior segments while keeping the tail.
Differential-fuzzed vs the reference's compiled stemmer (0 mismatches).
``stem_tr(word)`` expects a lowercased word.
"""

from __future__ import annotations

from .snowball import STEMMERS

_V = frozenset("aeiouöüı")          # vowel
_U = frozenset("iuüı")              # high vowels (U archiphoneme)
_HARMONY = {
    "a": frozenset("aıou"), "e": frozenset("eiöü"),
    "ı": frozenset("aı"), "i": frozenset("ei"),
    "o": frozenset("ou"), "ö": frozenset("öü"),
    "u": frozenset("ou"), "ü": frozenset("öü"),
}

def _amg(names):
    return sorted(names, key=len, reverse=True)

_T_POSS = _amg(["m", "n", "miz", "niz", "muz", "nuz", "müz", "nüz",
                "mız", "nız"])
_T_LARI = _amg(["leri", "ları"])
_T_NU = _amg(["ni", "nu", "nü", "nı"])
_T_UN = _amg(["in", "un", "ün", "ın"])
_T_YA = _amg(["a", "e"])
_T_NA = _amg(["na", "ne"])
_T_DA = _amg(["da", "ta", "de", "te"])
_T_NDA = _amg(["nda", "nde"])
_T_DAN = _amg(["dan", "tan", "den", "ten"])
_T_NDAN = _amg(["ndan", "nden"])
_T_LA = _amg(["la", "le"])
_T_CA = _amg(["ca", "ce"])
_T_UM = _amg(["im", "um", "üm", "ım"])
_T_SUN = _amg(["sin", "sun", "sün", "sın"])
_T_UZ = _amg(["iz", "uz", "üz", "ız"])
_T_SUNUZ = _amg(["siniz", "sunuz", "sünüz", "sınız"])
_T_LAR = _amg(["lar", "ler"])
_T_NUZ = _amg(["niz", "nuz", "nüz", "nız"])
_T_DIR = _amg(["dir", "tir", "dur", "tur", "dür", "tür", "dır", "tır"])
_T_CASINA = _amg(["casına", "cesine"])
_T_YDU = _amg(["di", "ti", "dik", "tik", "duk", "tuk", "dük", "tük",
               "dık", "tık", "dim", "tim", "dum", "tum", "düm", "tüm",
               "dım", "tım", "din", "tin", "dun", "tun", "dün", "tün",
               "dın", "tın", "du", "tu", "dü", "tü", "dı", "tı"])
_T_YSA = _amg(["sa", "se", "sak", "sek", "sam", "sem", "san", "sen"])
_T_YMUS = _amg(["miş", "muş", "müş", "mış"])


def _harmony(w: str, cur: int) -> bool:
    """check_vowel_harmony: the last vowel of w[:cur] must harmonize
    with some earlier vowel of its class."""
    i = cur
    while True:
        if i > 0 and w[i - 1] in _V:
            break
        if i <= 0:
            return False
        i -= 1
    cls = _HARMONY[w[i - 1]]
    j = i - 1
    while True:
        if j > 0 and w[j - 1] in cls:
            return True
        if j <= 0:
            return False
        j -= 1


def _opt_letter(w: str, cur: int, letter: str) -> tuple[bool, int]:
    """mark_suffix_with_optional_X_consonant (X = n/s/y): either the
    letter precedes and a vowel precedes it (consume the letter), or no
    letter and a vowel sits two back (consume nothing)."""
    if cur > 0 and w[cur - 1] == letter:
        if cur - 1 > 0 and w[cur - 2] in _V:
            return True, cur - 1
        return False, cur
    if cur > 0 and cur - 1 > 0 and w[cur - 2] in _V:
        return True, cur
    return False, cur


def _opt_u_vowel(w: str, cur: int) -> tuple[bool, int]:
    """mark_suffix_with_optional_U_vowel: a U vowel preceded by a
    non-vowel (consume it), or no U vowel and a non-vowel two back."""
    if cur > 0 and w[cur - 1] in _U:
        if cur - 1 > 0 and w[cur - 2] not in _V:
            return True, cur - 1
        return False, cur
    if cur > 0 and cur - 1 > 0 and w[cur - 2] not in _V:
        return True, cur
    return False, cur


def _among(w: str, cur: int, table) -> tuple[bool, int]:
    for suf in table:
        if cur >= len(suf) and w[cur - len(suf):cur] == suf:
            return True, cur - len(suf)
    return False, cur


def _h_among(w: str, cur: int, table) -> tuple[bool, int]:
    if not _harmony(w, cur):
        return False, cur
    return _among(w, cur, table)


# ---- suffix markers (named per turkish.sbl) ----
def _mk_possessives(w, cur):
    ok, c = _among(w, cur, _T_POSS)
    if not ok:
        return False, cur
    ok2, c2 = _opt_u_vowel(w, c)
    return (True, c2) if ok2 else (False, cur)


def _mk_sU(w, cur):
    if not _harmony(w, cur):
        return False, cur
    if not (cur > 0 and w[cur - 1] in _U):
        return False, cur
    ok, c = _opt_letter(w, cur - 1, "s")
    return (True, c) if ok else (False, cur)


def _mk_lArI(w, cur):
    return _among(w, cur, _T_LARI)


def _mk_yUm(w, cur):
    ok, c = _h_among(w, cur, _T_UM)
    if not ok:
        return False, cur
    ok2, c2 = _opt_letter(w, c, "y")
    return (True, c2) if ok2 else (False, cur)


def _mk_sUn(w, cur):
    return _h_among(w, cur, _T_SUN)


def _mk_yUz(w, cur):
    ok, c = _h_among(w, cur, _T_UZ)
    if not ok:
        return False, cur
    ok2, c2 = _opt_letter(w, c, "y")
    return (True, c2) if ok2 else (False, cur)


def _mk_sUnUz(w, cur):
    return _among(w, cur, _T_SUNUZ)


def _mk_lAr(w, cur):
    return _h_among(w, cur, _T_LAR)


def _mk_nUz(w, cur):
    return _h_among(w, cur, _T_NUZ)


def _mk_DUr(w, cur):
    return _h_among(w, cur, _T_DIR)


def _mk_cAsInA(w, cur):
    return _among(w, cur, _T_CASINA)


def _mk_yDU(w, cur):
    ok, c = _h_among(w, cur, _T_YDU)
    if not ok:
        return False, cur
    ok2, c2 = _opt_letter(w, c, "y")
    return (True, c2) if ok2 else (False, cur)


def _mk_ysA(w, cur):
    ok, c = _among(w, cur, _T_YSA)
    if not ok:
        return False, cur
    ok2, c2 = _opt_letter(w, c, "y")
    return (True, c2) if ok2 else (False, cur)


def _mk_ymUs(w, cur):
    ok, c = _h_among(w, cur, _T_YMUS)
    if not ok:
        return False, cur
    ok2, c2 = _opt_letter(w, c, "y")
    return (True, c2) if ok2 else (False, cur)


def _mk_yken(w, cur):
    if cur >= 3 and w[cur - 3:cur] == "ken":
        ok, c = _opt_letter(w, cur - 3, "y")
        if ok:
            return True, c
    return False, cur


def _mk_nUn(w, cur):
    ok, c = _h_among(w, cur, _T_UN)
    if not ok:
        return False, cur
    ok2, c2 = _opt_letter(w, c, "n")
    return (True, c2) if ok2 else (False, cur)


def _mk_nCA(w, cur):
    ok, c = _h_among(w, cur, _T_CA)
    if not ok:
        return False, cur
    ok2, c2 = _opt_letter(w, c, "n")
    return (True, c2) if ok2 else (False, cur)


def _mk_ylA(w, cur):
    ok, c = _h_among(w, cur, _T_LA)
    if not ok:
        return False, cur
    ok2, c2 = _opt_letter(w, c, "y")
    return (True, c2) if ok2 else (False, cur)


def _mk_yA(w, cur):
    ok, c = _h_among(w, cur, _T_YA)
    if not ok:
        return False, cur
    ok2, c2 = _opt_letter(w, c, "y")
    return (True, c2) if ok2 else (False, cur)


def _mk_yU(w, cur):
    if not _harmony(w, cur):
        return False, cur
    if not (cur > 0 and w[cur - 1] in _U):
        return False, cur
    ok, c = _opt_letter(w, cur - 1, "y")
    return (True, c) if ok else (False, cur)


def _mk_nDA(w, cur):
    return _h_among(w, cur, _T_NDA)


def _mk_nA(w, cur):
    return _h_among(w, cur, _T_NA)


def _mk_nDAn(w, cur):
    return _h_among(w, cur, _T_NDAN)


def _mk_nU(w, cur):
    return _h_among(w, cur, _T_NU)


def _mk_DA(w, cur):
    return _h_among(w, cur, _T_DA)


def _mk_DAn(w, cur):
    return _h_among(w, cur, _T_DAN)


def _splice(w: str, c: int, d: int) -> str:
    return w[:c] + w[d:]


def _nominal_verb(w: str) -> tuple[str, bool]:
    """stem_nominal_verb_suffixes -> (word, continue_flag)."""
    cur = len(w)
    # case 1: ymUş | yDU | ysA | yken -> delete
    for probe in (_mk_ymUs, _mk_yDU, _mk_ysA, _mk_yken):
        ok, c = probe(w, cur)
        if ok:
            return w[:c], True
    # case 2: cAsInA preceded by optional(sUnUz|lAr|yUm|sUn|yUz), then
    # required ymUş -> delete everything
    ok, c = _mk_cAsInA(w, cur)
    if ok:
        oc = c
        for probe in (_mk_sUnUz, _mk_lAr, _mk_yUm, _mk_sUn, _mk_yUz):
            ok2, c2 = probe(w, oc)
            if ok2:
                oc = c2
                break
        ok3, c3 = _mk_ymUs(w, oc)
        if ok3:
            return w[:c3], True
    # case 3: lAr -> delete; then optional(DIr|yDU|ysA|ymUş) -> delete;
    # stop noun stemming (continue_flag False)
    ok, c = _mk_lAr(w, cur)
    if ok:
        w = w[:c]
        for probe in (_mk_DUr, _mk_yDU, _mk_ysA, _mk_ymUs):
            ok2, c2 = probe(w, len(w))
            if ok2:
                w = w[:c2]
                break
        return w, False
    # case 4: nUz preceded by yDU or ysA -> delete all
    ok, c = _mk_nUz(w, cur)
    if ok:
        ok2, c2 = _mk_yDU(w, c)
        if not ok2:
            ok2, c2 = _mk_ysA(w, c)
        if ok2:
            return w[:c2], True
    # case 5: sUnUz|yUz|sUn|yUm -> delete; then optional ymUş -> delete
    for probe in (_mk_sUnUz, _mk_yUz, _mk_sUn, _mk_yUm):
        ok, c = probe(w, cur)
        if ok:
            w = w[:c]
            ok2, c2 = _mk_ymUs(w, len(w))
            if ok2:
                w = w[:c2]
            return w, True
    # case 6: DIr -> delete; then optional(sUnUz|lAr|yUm|sUn|yUz)
    # followed by required ymUş -> delete that too
    ok, c = _mk_DUr(w, cur)
    if ok:
        w = w[:c]
        oc = len(w)
        for probe in (_mk_sUnUz, _mk_lAr, _mk_yUm, _mk_sUn, _mk_yUz):
            ok2, c2 = probe(w, oc)
            if ok2:
                oc = c2
                break
        ok3, c3 = _mk_ymUs(w, oc)
        if ok3:
            w = w[:c3]
        return w, True
    return w, True


def _chain_ki(w: str, cur: int) -> tuple[str, bool]:
    """stem_suffix_chain_before_ki: matches 'ki' ending at cur; deletes
    interior segments (w[cur:] is preserved). Returns (word, matched)."""
    d0 = cur
    if not (cur >= 2 and w[cur - 2:cur] == "ki"):
        return w, False
    c = cur - 2
    # case A: DA+ki -> delete; then (lAr -> delete, try chain) or
    # (possessive -> delete, try (lAr -> delete, try chain))
    ok, nc = _mk_DA(w, c)
    if ok:
        w = _splice(w, nc, d0)
        cur2 = nc
        ok2, nc2 = _mk_lAr(w, cur2)
        if ok2:
            w = _splice(w, nc2, cur2)
            w, _ = _chain_ki(w, nc2)
        else:
            ok2, nc2 = _mk_possessives(w, cur2)
            if ok2:
                w = _splice(w, nc2, cur2)
                cur3 = nc2
                ok3, nc3 = _mk_lAr(w, cur3)
                if ok3:
                    w = _splice(w, nc3, cur3)
                    w, _ = _chain_ki(w, nc3)
        return w, True
    # case B: nUn+ki -> delete; then lArI -> delete, or
    # (possessive|sU) -> delete then try(lAr -> delete, chain), or chain
    ok, nc = _mk_nUn(w, c)
    if ok:
        w = _splice(w, nc, d0)
        cur2 = nc
        ok2, nc2 = _mk_lArI(w, cur2)
        if ok2:
            w = _splice(w, nc2, cur2)
            return w, True
        ok2, nc2 = _mk_possessives(w, cur2)
        if not ok2:
            ok2, nc2 = _mk_sU(w, cur2)
        if ok2:
            w = _splice(w, nc2, cur2)
            cur3 = nc2
            ok3, nc3 = _mk_lAr(w, cur3)
            if ok3:
                w = _splice(w, nc3, cur3)
                w, _ = _chain_ki(w, nc3)
            return w, True
        w, _ = _chain_ki(w, cur2)
        return w, True
    # case C: nDA+ki (no delete yet); then lArI -> delete all, or
    # sU -> delete all then try(lAr -> delete, chain), or chain (req'd)
    ok, nc = _mk_nDA(w, c)
    if not ok:
        return w, False
    ok2, nc2 = _mk_lArI(w, nc)
    if ok2:
        return _splice(w, nc2, d0), True
    ok2, nc2 = _mk_sU(w, nc)
    if ok2:
        w = _splice(w, nc2, d0)
        cur3 = nc2
        ok3, nc3 = _mk_lAr(w, cur3)
        if ok3:
            w = _splice(w, nc3, cur3)
            w, _ = _chain_ki(w, nc3)
        return w, True
    w2, ok2 = _chain_ki(w, nc)
    if ok2:
        return w2, True
    return w, False


def _noun_suffixes(w: str) -> str:
    """stem_noun_suffixes: one pass through the ordered cascade."""
    cur = len(w)
    # case 1: lAr -> delete; try chain
    ok, c = _mk_lAr(w, cur)
    if ok:
        w = w[:c]
        w2, ok2 = _chain_ki(w, len(w))
        if ok2:
            w = w2
        return w
    # case 2: nCA -> delete; then try( lArI -> delete | (poss|sU) ->
    # delete try(lAr -> delete chain) | lAr -> delete try chain )
    ok, c = _mk_nCA(w, cur)
    if ok:
        w = w[:c]
        ok2, c2 = _mk_lArI(w, len(w))
        if ok2:
            return w[:c2]
        ok2, c2 = _mk_possessives(w, len(w))
        if not ok2:
            ok2, c2 = _mk_sU(w, len(w))
        if ok2:
            w = w[:c2]
            ok3, c3 = _mk_lAr(w, len(w))
            if ok3:
                w = w[:c3]
                w2, ok4 = _chain_ki(w, len(w))
                if ok4:
                    w = w2
            return w
        ok2, c2 = _mk_lAr(w, len(w))
        if ok2:
            w = w[:c2]
            w2, ok3 = _chain_ki(w, len(w))
            if ok3:
                w = w2
        return w
    # case 3: (nDA|nA): lArI -> delete | sU -> delete try(lAr chain) |
    # chain (required, else case fails)
    ok, c = _mk_nDA(w, cur)
    if not ok:
        ok, c = _mk_nA(w, cur)
    if ok:
        ok2, c2 = _mk_lArI(w, c)
        if ok2:
            return w[:c2]
        ok2, c2 = _mk_sU(w, c)
        if ok2:
            w = w[:c2]
            ok3, c3 = _mk_lAr(w, len(w))
            if ok3:
                w = w[:c3]
                w2, ok4 = _chain_ki(w, len(w))
                if ok4:
                    w = w2
            return w
        w2, ok2 = _chain_ki(w, c)
        if ok2:
            return w2
    # case 4: (nDAn|nU): sU -> delete try(lAr chain) | lArI (match only)
    ok, c = _mk_nDAn(w, cur)
    if not ok:
        ok, c = _mk_nU(w, cur)
    if ok:
        ok2, c2 = _mk_sU(w, c)
        if ok2:
            w = w[:c2]
            ok3, c3 = _mk_lAr(w, len(w))
            if ok3:
                w = w[:c3]
                w2, ok4 = _chain_ki(w, len(w))
                if ok4:
                    w = w2
            return w
        ok2, c2 = _mk_lArI(w, c)
        if ok2:
            return w
    # case 5: DAn -> delete; try( poss -> delete try(lAr chain) |
    # lAr -> delete try chain | chain )
    ok, c = _mk_DAn(w, cur)
    if ok:
        w = w[:c]
        ok2, c2 = _mk_possessives(w, len(w))
        if ok2:
            w = w[:c2]
            ok3, c3 = _mk_lAr(w, len(w))
            if ok3:
                w = w[:c3]
                w2, ok4 = _chain_ki(w, len(w))
                if ok4:
                    w = w2
            return w
        ok2, c2 = _mk_lAr(w, len(w))
        if ok2:
            w = w[:c2]
            w2, ok3 = _chain_ki(w, len(w))
            if ok3:
                w = w2
            return w
        w2, ok2 = _chain_ki(w, len(w))
        if ok2:
            w = w2
        return w
    # case 6: (nUn|ylA) -> delete; then: lAr -> delete + required chain,
    # else (poss|sU) -> delete try(lAr chain), else try chain.
    # NOTE: a lAr delete whose chain fails is NOT undone.
    ok, c = _mk_nUn(w, cur)
    if not ok:
        ok, c = _mk_ylA(w, cur)
    if ok:
        w = w[:c]
        ok2, c2 = _mk_lAr(w, len(w))
        if ok2:
            w = w[:c2]
            w2, ok3 = _chain_ki(w, len(w))
            if ok3:
                return w2
        ok2, c2 = _mk_possessives(w, len(w))
        if not ok2:
            ok2, c2 = _mk_sU(w, len(w))
        if ok2:
            w = w[:c2]
            ok3, c3 = _mk_lAr(w, len(w))
            if ok3:
                w = w[:c3]
                w2, ok4 = _chain_ki(w, len(w))
                if ok4:
                    w = w2
            return w
        w2, ok2 = _chain_ki(w, len(w))
        if ok2:
            w = w2
        return w
    # case 7: lArI -> delete
    ok, c = _mk_lArI(w, cur)
    if ok:
        return w[:c]
    # case 8: chain alone
    w2, ok = _chain_ki(w, cur)
    if ok:
        return w2
    # case 9: (DA|yU|yA) -> delete; then { poss -> delete, lAr (no
    # delete of its own) | lAr } -> delete matched lAr; try chain
    ok, c = _mk_DA(w, cur)
    if not ok:
        ok, c = _mk_yU(w, cur)
    if not ok:
        ok, c = _mk_yA(w, cur)
    if ok:
        w = w[:c]
        ok2, c2 = _mk_possessives(w, len(w))
        if ok2:
            w = w[:c2]
            end2 = len(w)
            ok3, c3 = _mk_lAr(w, end2)
            if ok3:
                w = w[:c3]
            w2, ok4 = _chain_ki(w, len(w))
            if ok4:
                w = w2
            return w
        ok2, c2 = _mk_lAr(w, len(w))
        if ok2:
            w = w[:c2]
            w2, ok3 = _chain_ki(w, len(w))
            if ok3:
                w = w2
        return w
    # case 10: (poss|sU) -> delete; then lAr -> delete; try chain
    ok, c = _mk_possessives(w, cur)
    if not ok:
        ok, c = _mk_sU(w, cur)
    if ok:
        w = w[:c]
        ok2, c2 = _mk_lAr(w, len(w))
        if ok2:
            w = w[:c2]
            w2, ok3 = _chain_ki(w, len(w))
            if ok3:
                w = w2
    return w


def _post_process(w: str) -> str:
    if w in ("ad", "soyad"):
        return w
    # append_U_to_stems_ending_with_d_or_g (harmonized with last vowel)
    if w.endswith(("d", "g")):
        i = len(w)
        while i > 0 and w[i - 1] not in _V:
            i -= 1
        if i > 0:
            v = w[i - 1]
            if v in "aı":
                w += "ı"
            elif v in "ei":
                w += "i"
            elif v in "ou":
                w += "u"
            elif v in "öü":
                w += "ü"
    # last-consonant devoicing undo
    swap = {"b": "p", "c": "ç", "d": "t", "ğ": "k"}
    if w and w[-1] in swap:
        w = w[:-1] + swap[w[-1]]
    return w


def stem_tr(word: str) -> str:
    if sum(1 for ch in word if ch in _V) < 2:
        return word
    w, cont = _nominal_verb(word)
    if not cont:
        return w
    w = _noun_suffixes(w)
    return _post_process(w)


STEMMERS["turkish"] = stem_tr
