"""Vectorized CJK dictionary segmentation — numpy twin of cjk_dict.

``cjk_dict.segment_dict`` (the CjkBreakEngine port, see that module for
provenance) is exact but pure Python: ~0.4 Mchars/s/core, the ja/zh
build bottleneck at scale.  This module re-expresses the common case as
numpy array kernels with BIT-FOR-BIT identical output (differentially
tested against the scalar path in tests/test_cjk_dict.py):

* char classification / script-run splitting: one table lookup over the
  codepoint array (class table built once from the same range lists);
* dictionary matching: per-word-length polynomial rolling hashes
  (uint64, wraparound) over the concatenated CJ runs, probed against
  per-length open-address bucket tables (scrambled-key, 32-bit keys
  where collision-free), every hash hit verified by codepoint
  comparison (exactness does not rest on the hash) and prefiltered by
  direct-address 2-prefix/3-prefix max-length tables (the vectorized
  analogue of the scalar ``_MAXLEN2`` pruning; bucket collisions
  max-merge, which only ever ADDS verified-away candidates);
* the Viterbi itself: a lockstep relaxation across ALL runs at once —
  edges (1-char fallback, dictionary words, the katakana run-length
  edge) are materialized as flat arrays, grouped by within-run start
  offset, and relaxed offset-by-offset with ``np.minimum.at`` over a
  composite int64 key ``cost << 21 | start_off << 1 | kind`` whose
  ordering reproduces the scalar tie-break exactly (first-achiever in
  ascending-start iteration order, word edges before the katakana edge
  from the same start).

Inputs the scalar path routes through its unit/mark machinery (kana
voicing marks, halfwidth kana, compat ideographs, U+3006) fall back to
the scalar implementation at CHUNK granularity — the text is split at
separator characters (class-None, non-mark: positions where the scalar
loop unconditionally flushes the open run and where a following mark
would be dropped, so no token and no mark attachment ever crosses one)
and only chunks actually containing such characters go through
``cd.segment_dict``; the rest stay vectorized, with every clean CJ run
in the text batched through ONE lockstep Viterbi call.  Parity by
construction.  Texts shorter than ``MIN_VEC_CHARS`` return None (numpy
per-call overhead dominates; caller uses the scalar path) and single
runs longer than ``MAX_LOCKSTEP_RUN`` use the scalar DP (the
offset-lockstep degenerates to one run per step above it).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np

from . import cjk_dict as cd

MIN_VEC_CHARS = 64
MAX_LOCKSTEP_RUN = 512

_B_INT = 0x9E3779B97F4A7C15  # odd -> invertible mod 2^64
_BINV_INT = pow(_B_INT, -1, 1 << 64)

_INF_COST = np.int64(1) << np.int64(40)
_COST_SHIFT = np.int64(21)
_OFF_MASK = (1 << 20) - 1

# lazily built module state
_TBL: Optional[np.ndarray] = None      # codepoint -> class (0 none,
#                                        1 alnum, 2 cj, 3 hangul)
_FB: Optional[np.ndarray] = None       # codepoint -> scalar-fallback flag
_CP1: Optional[np.ndarray] = None      # sorted 1-char word codepoints
_COST1: Optional[np.ndarray] = None
_BY_LEN: Dict[int, Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray, int, int]] = {}
#   L -> (skeys, bucket_starts, cost_sorted, cps_sorted[k, L],
#         shift, maxocc): open-address bucket table over scrambled
#   word hashes (sorted by scrambled key; bucket = key >> shift)
_P2MAXTBL: Optional[np.ndarray] = None  # direct-address 2-prefix ->
#   max word length (scrambled-hash bucket, max-merged on collision:
#   over-proposal only ever ADDS candidate lengths, and every proposed
#   word is verified by codepoint comparison)
_P2BITS = 22
_P3MAXTBL: Optional[np.ndarray] = None  # same, for 3-prefixes of words
_P3BITS = 22                            # of length >= 4
_SCRAMBLE = np.uint64(0x2545F4914F6CDD1D)
_COST1TBL: Optional[np.ndarray] = None  # codepoint -> 1-char word cost
_PW = np.ones(1, dtype=np.uint64)      # B^i
_PWINV = np.ones(1, dtype=np.uint64)   # Binv^i
_KATA_LUT: Optional[np.ndarray] = None
_OK = True  # cleared if the (astronomically unlikely) 64-bit word-hash
#             collision shows up at table build: scalar-only then


def _codepoints(s: str) -> np.ndarray:
    return np.frombuffer(s.encode("utf-32-le"), dtype=np.uint32)


def _grow_powers(n: int) -> None:
    global _PW, _PWINV
    if len(_PW) >= n:
        return
    m = max(n, 2 * len(_PW))
    b = np.full(m, np.uint64(_B_INT))
    b[0] = np.uint64(1)
    _PW = np.multiply.accumulate(b)
    bi = np.full(m, np.uint64(_BINV_INT))
    bi[0] = np.uint64(1)
    _PWINV = np.multiply.accumulate(bi)


def _word_hashes(cps: np.ndarray) -> np.ndarray:
    """Hash of each row of a (k, L) codepoint matrix:
    sum c[t] * B^(L-1-t) mod 2^64."""
    L = cps.shape[1]
    _grow_powers(L)
    pw_rev = _PW[L - 1 :: -1][:L].copy()
    return (cps.astype(np.uint64) * pw_rev[None, :]).sum(
        axis=1, dtype=np.uint64
    )


def _tune_allocator() -> None:
    """Raise glibc's malloc mmap/trim thresholds (64 MB) so numpy's
    multi-MB temporaries stay on the reusable heap instead of being
    mmap'd and returned to the OS per call.  On hosts where fresh
    anonymous pages fault slowly (memory-capped VMs), the default
    dynamic thresholds make every cold large-batch call re-fault its
    working set; with the thresholds raised the pages are faulted once
    per worker and reused.  Best-effort: silently skipped off glibc."""
    try:
        import ctypes

        libc = ctypes.CDLL("libc.so.6")
        libc.mallopt(-3, 64 << 20)  # M_MMAP_THRESHOLD
        libc.mallopt(-1, 64 << 20)  # M_TRIM_THRESHOLD
    except Exception:
        pass


def _build() -> bool:
    global _TBL, _FB, _CP1, _COST1, _P2MAXTBL, _P3MAXTBL, _COST1TBL, _KATA_LUT, _OK
    if _TBL is not None:
        return _OK
    _tune_allocator()
    words = cd._load()

    tbl = np.zeros(0x30000, dtype=np.uint8)
    for rngs, code in (
        (cd._HAN, 2), (cd._HIRA, 2), (cd._KATA, 2), (cd._HANGUL, 3),
    ):
        for lo, hi in rngs:
            tbl[lo : hi + 1] = code
    tbl[0x30:0x3A] = 1
    tbl[0x41:0x5B] = 1
    tbl[0x61:0x7B] = 1
    for cp in range(0x80, 0x250):
        if chr(cp).isalpha():
            tbl[cp] = 1
    tbl[0xFF10:0xFF1A] = 1
    tbl[0xFF21:0xFF3B] = 1
    tbl[0xFF41:0xFF5B] = 1

    # chars whose presence routes the WHOLE text to the scalar path:
    # voicing marks + halfwidth kana (unit machinery), compat
    # ideographs (NFKC-unstable), U+3006 (rule-bounded special-case)
    fb = np.zeros(0x30000, dtype=bool)
    fb[0xF900:0xFB00] = True
    fb[0xFF66:0xFFA0] = True
    fb[0x3099:0x309B] = True
    fb[0x3006] = True
    _TBL, _FB = tbl, fb

    by_raw: Dict[int, Tuple[List[str], List[int]]] = {}
    for w, c in words.items():
        ws, cs = by_raw.setdefault(len(w), ([], []))
        ws.append(w)
        cs.append(c)

    ws1, cs1 = by_raw.get(1, ([], []))
    cp1 = np.array([ord(w) for w in ws1], dtype=np.uint32)
    o = np.argsort(cp1)
    _CP1 = cp1[o]
    _COST1 = np.array(cs1, dtype=np.int64)[o]
    # direct-address 1-char cost table (codepoint-indexed)
    c1 = np.full(0x30000, np.int32(cd.MAX_SNLP), dtype=np.int32)
    c1[_CP1.astype(np.intp)] = _COST1.astype(np.int32)
    _COST1TBL = c1

    p2tbl = np.zeros(1 << _P2BITS, dtype=np.int8)
    p2shift = np.uint64(64 - _P2BITS)
    p3tbl = np.zeros(1 << _P3BITS, dtype=np.int8)
    p3shift = np.uint64(64 - _P3BITS)
    for L, (ws, cs) in sorted(by_raw.items()):
        if L < 2:
            continue
        cps = _codepoints("".join(ws)).reshape(len(ws), L)
        h = _word_hashes(cps)
        keys64 = h * _SCRAMBLE  # bijective mod 2^64
        o = np.argsort(keys64, kind="stable")
        if len(keys64) > 1:
            sk64 = keys64[o]
            if (np.diff(sk64) == 0).any():
                _OK = False  # 64-bit collision between two real words
                return False
        # 32-bit keys (top half) halve cache traffic in the hot probe;
        # exactness needs them collision-free within a length — check,
        # and keep 64-bit for a length that collides (expected ~never)
        keys32 = (keys64 >> np.uint64(32)).astype(np.uint32)
        sk32 = keys32[o]
        if len(sk32) > 1 and (np.diff(np.sort(keys32)) == 0).any():
            skeys = keys64[o]
        else:
            skeys = sk32
        nbits = max(4, int(len(skeys) * 2 - 1).bit_length())
        kbits = 64 if skeys.dtype == np.uint64 else 32
        shift = kbits - nbits
        buck = (skeys >> skeys.dtype.type(shift)).astype(np.int64)
        bstarts = np.searchsorted(
            buck, np.arange((1 << nbits) + 1, dtype=np.int64)
        ).astype(np.int64)
        maxocc = int(np.max(np.diff(bstarts))) if len(skeys) else 0
        _BY_LEN[L] = (
            skeys,
            bstarts,
            np.array(cs, dtype=np.int64)[o],
            cps[o],
            shift,
            maxocc,
        )
        # 2-prefix bucket -> max word length; bucket collisions merge
        # to the max (overestimates only propose extra lengths, the
        # per-length verification stays exact)
        b = ((_word_hashes(cps[:, :2]) * _SCRAMBLE) >> p2shift).astype(
            np.intp
        )
        np.maximum.at(p2tbl, b, np.int8(L))
        if L >= 4:
            b3 = (
                (_word_hashes(cps[:, :3]) * _SCRAMBLE) >> p3shift
            ).astype(np.intp)
            np.maximum.at(p3tbl, b3, np.int8(L))
    _P2MAXTBL = p2tbl
    _P3MAXTBL = p3tbl

    lut = np.full(cd.MAX_KATA_GROUP + 1, 8192, dtype=np.int64)
    for i, c in enumerate(cd.KATA_COST):
        lut[i] = c
    _KATA_LUT = lut
    return True


def _lockstep_viterbi(
    cat: np.ndarray,
    lens: np.ndarray,
    text: Optional[str] = None,
    tstarts: Optional[List[int]] = None,
) -> List[List]:
    """Exact Viterbi over many concatenated runs at once.  Returns the
    word-end offset list per run (same contract as cd.cj_viterbi) — or,
    when ``text``/``tstarts`` (text offset of each run) are given, the
    token list per run directly (the backtrack walk slices tokens in
    the same pass)."""
    nr = len(lens)
    m = len(cat)
    off = np.zeros(nr + 1, dtype=np.int64)
    np.cumsum(lens, out=off[1:])
    run_id = np.repeat(np.arange(nr), lens)
    pos_in_run = np.arange(m, dtype=np.int64) - off[run_id]
    rem = lens[run_id] - pos_in_run
    gbase = off[:-1] + np.arange(nr)           # state(r, i) = gbase[r]+i
    gpos = gbase[run_id] + pos_in_run
    n_states = m + nr

    e_off: List[np.ndarray] = []
    e_gs: List[np.ndarray] = []
    e_ge: List[np.ndarray] = []
    e_cost: List[np.ndarray] = []
    e_kind: List[np.ndarray] = []

    # --- 1-char edges (dictionary cost, else the 255 fallback; the
    # scalar path's Hangul exclusion is moot: hangul is its own class)
    cost1 = _COST1TBL[cat.astype(np.intp)]
    e_off.append(pos_in_run)
    e_gs.append(gpos)
    e_ge.append(gpos + 1)
    e_cost.append(cost1.astype(np.int64))
    e_kind.append(np.zeros(m, dtype=np.int64))

    # --- dictionary word edges, prefiltered by the 2-prefix table
    if m >= 2:
        _grow_powers(m + 1)
        q = cat.astype(np.uint64) * _PWINV[:m]
        sacc = np.zeros(m + 1, dtype=np.uint64)
        np.cumsum(q, out=sacc[1:])

        maxl = np.zeros(m, dtype=np.int64)
        p2ok = np.flatnonzero(rem >= 2)
        if len(p2ok):
            h2 = (sacc[p2ok + 2] - sacc[p2ok]) * _PW[p2ok + 1]
            b2 = ((h2 * _SCRAMBLE) >> np.uint64(64 - _P2BITS)).astype(
                np.intp
            )
            maxl[p2ok] = _P2MAXTBL[b2]
        # second-stage prune: words of length >= 4 must also match a
        # 3-prefix of some >=4-length word (max-merged: over-proposes
        # only)
        m4 = np.flatnonzero((maxl >= 4) & (rem >= 4))
        if len(m4):
            h3 = (sacc[m4 + 3] - sacc[m4]) * _PW[m4 + 2]
            b3 = ((h3 * _SCRAMBLE) >> np.uint64(64 - _P3BITS)).astype(
                np.intp
            )
            cap3 = np.maximum(_P3MAXTBL[b3].astype(np.int64), 3)
            maxl[m4] = np.minimum(maxl[m4], cap3)
        # positions sorted by maxl (radix on int8): candidates for
        # length L are a prefix of this order, masked by rem >= L —
        # avoids two full-m scans per word length
        mo = np.argsort(-maxl.astype(np.int8), kind="stable")
        ml_sorted = maxl[mo]
        n_ge = np.searchsorted(-ml_sorted, -np.arange(32), side="right")
        for L, (skeys, bstarts, costs, cps, shift, maxocc) in _BY_LEN.items():
            cand = mo[: n_ge[L]] if L < 32 else mo[maxl[mo] >= L]
            p = cand[rem[cand] >= L]
            if not len(p):
                continue
            k = ((sacc[p + L] - sacc[p]) * _PW[p + L - 1]) * _SCRAMBLE
            if skeys.dtype == np.uint32:
                k = (k >> np.uint64(32)).astype(np.uint32)
            b = (k >> k.dtype.type(shift)).astype(np.intp)
            lo = bstarts[b]
            hi = bstarts[b + 1]
            # bucket probe: matched index into the sorted word arrays
            found = np.full(len(p), -1, dtype=np.int64)
            act = np.flatnonzero(hi > lo)
            j = 0
            while len(act) and j < maxocc:
                pos = lo[act] + j
                valid = pos < hi[act]
                vi = act[valid]
                pv = pos[valid]
                hitm = skeys[pv] == k[vi]
                found[vi[hitm]] = pv[hitm]
                act = vi[~hitm]
                j += 1
            hit = found >= 0
            p, s = p[hit], found[hit]
            if not len(p):
                continue
            # verify: the hash only PROPOSES, codepoints decide
            ok = (cat[p[:, None] + np.arange(L)] == cps[s]).all(axis=1)
            p, s = p[ok], s[ok]
            if not len(p):
                continue
            e_off.append(pos_in_run[p])
            e_gs.append(gpos[p])
            e_ge.append(gpos[p] + L)
            e_cost.append(costs[s])
            e_kind.append(np.zeros(len(p), dtype=np.int64))

    # --- katakana run-length edges
    kata = ((cat >= 0x30A1) & (cat <= 0x30FE) & (cat != 0x30FB)) | (
        (cat >= 0xFF66) & (cat <= 0xFF9F)
    )
    if kata.any():
        prevk = np.empty(m, dtype=bool)
        prevk[0] = False
        prevk[1:] = kata[:-1]
        ks = np.flatnonzero(kata & ~(prevk & (pos_in_run > 0)))
        if len(ks):
            nonk = np.flatnonzero(~kata)
            j_nk = np.full(len(ks), m, dtype=np.int64)
            if len(nonk):
                w = np.searchsorted(nonk, ks)
                has = w < len(nonk)
                j_nk[has] = nonk[w[has]]
            j_end = off[run_id[ks] + 1]
            j = np.minimum(np.minimum(j_nk, j_end), ks + cd.MAX_KATA_GROUP)
            klen = j - ks
            keep = klen < cd.MAX_KATA_GROUP
            ks, klen = ks[keep], klen[keep]
            if len(ks):
                e_off.append(pos_in_run[ks])
                e_gs.append(gpos[ks])
                e_ge.append(gpos[ks] + klen)
                e_cost.append(_KATA_LUT[klen])
                e_kind.append(np.ones(len(ks), dtype=np.int64))

    eoff = np.concatenate(e_off)
    egs = np.concatenate(e_gs)
    ege = np.concatenate(e_ge)
    ecost = np.concatenate(e_cost)
    ekind = np.concatenate(e_kind)
    # stable sort on int16 keys picks numpy's radix path (offsets are
    # bounded by MAX_LOCKSTEP_RUN, far below int16 range)
    order = np.argsort(eoff.astype(np.int16), kind="stable")
    eoff, egs, ege = eoff[order], egs[order], ege[order]
    ecost, ekind = ecost[order], ekind[order]

    best = np.full(n_states, _INF_COST << _COST_SHIFT, dtype=np.int64)
    best[gbase] = 0
    max_off = int(lens.max())
    grp = np.searchsorted(eoff, np.arange(max_off + 1))
    grp = np.append(grp, len(eoff))
    for i in range(max_off):
        a, b = grp[i], grp[i + 1]
        if a == b:
            continue
        src = best[egs[a:b]] >> _COST_SHIFT
        tie = (np.int64(i) << np.int64(1)) | ekind[a:b]
        cand = ((src + ecost[a:b]) << _COST_SHIFT) | tie
        np.minimum.at(best, ege[a:b], cand)

    # backtrack over plain Python ints (a single tolist() beats ~60k
    # numpy scalar reads by ~5x); with text/tstarts the walk slices
    # tokens directly (reversed, then one reverse per run)
    inf_packed = int(_INF_COST << _COST_SHIFT)
    bl = best.tolist()
    lens_l = lens.tolist()
    gbase_l = gbase.tolist()
    off_mask = int(_OFF_MASK)
    out: List[List] = []
    if text is not None:
        for r in range(nr):
            ln = lens_l[r]
            base = gbase_l[r]
            ts = tstarts[r]
            if bl[base + ln] >= inf_packed:
                out.append([text[ts : ts + ln]])
                continue
            toks: List[str] = []
            t = ln
            while t > 0:
                prev = (bl[base + t] >> 1) & off_mask
                toks.append(text[ts + prev : ts + t])
                t = prev
            toks.reverse()
            out.append(toks)
        return out
    for r in range(nr):
        ln = lens_l[r]
        base = gbase_l[r]
        if bl[base + ln] >= inf_packed:
            out.append([ln])
            continue
        bounds: List[int] = []
        t = ln
        while t > 0:
            bounds.append(t)
            t = (bl[base + t] >> 1) & off_mask
        bounds.reverse()
        out.append(bounds)
    return out


def _segment_pieces(text: str) -> List[Tuple[int, List[str]]]:
    """Core segmentation: returns (start_offset, tokens) per piece in
    text order.  Assumes _build() succeeded."""
    cp = _codepoints(text)
    cps = np.where(cp < 0x30000, cp, 0).astype(np.intp)
    fbm = _FB[cps]
    key = _TBL[cps].astype(np.int16)

    if fbm.any():
        # Chunks = maximal runs of (word-class | scalar-only) chars;
        # the class-None chars between them are separators: the scalar
        # loop flushes unconditionally there and drops a mark that
        # immediately follows one, so no token or mark attachment ever
        # crosses a chunk edge.  A chunk containing ANY scalar-only
        # char (mark / halfwidth kana / compat ideograph / U+3006) is
        # delegated whole to cd.segment_dict: overwrite its key with a
        # sentinel so the global run split below emits it as one piece
        # (chunks are separator-bounded, so two dirty chunks can never
        # merge).
        m = (key != 0) | fbm
        cstart = m & ~np.concatenate(([False], m[:-1]))
        cid = np.cumsum(cstart) - 1
        dirty = np.bincount(cid[fbm], minlength=int(cid[-1]) + 1 if len(cid) else 0) > 0
        key[m & dirty[cid]] = 4

    # global run split (runs never span separators or chunk edges)
    starts = np.flatnonzero(np.diff(key, prepend=np.int16(-1)))
    ends = np.append(starts[1:], len(key))
    codes = key[starts]
    keep = codes != 0
    starts, ends, codes = starts[keep], ends[keep], codes[keep]

    # All small CJ runs: ONE batched Viterbi.  Long runs use the
    # scalar DP (per-char cost does not pay lockstep overhead there).
    is_cj = codes == 2
    rlens = ends - starts
    small_m = is_cj & (rlens <= MAX_LOCKSTEP_RUN)
    small = np.flatnonzero(small_m)
    toks_by_run: Dict[int, List[str]] = {}
    if len(small):
        lens = rlens[small].astype(np.int64)
        sstarts = starts[small].tolist()
        cat = np.concatenate(
            [cp[s:e] for s, e in zip(starts[small], ends[small])]
        )
        for i, toks in zip(
            small.tolist(), _lockstep_viterbi(cat, lens, text, sstarts)
        ):
            toks_by_run[i] = toks

    out: List[Tuple[int, List[str]]] = []
    for k, (c, s, e) in enumerate(
        zip(codes.tolist(), starts.tolist(), ends.tolist())
    ):
        if c == 2:
            toks = toks_by_run.get(k)
            if toks is None:
                run = text[s:e]
                toks, a = [], 0
                for b in cd.cj_viterbi(run):
                    toks.append(run[a:b])
                    a = b
            out.append((s, toks))
        elif c == 4:
            out.append((s, cd.segment_dict(text[s:e])))
        else:
            out.append((s, [text[s:e]]))
    return out


def segment_fast(text: str) -> Optional[List[str]]:
    """Vectorized twin of cd.segment_dict; None -> caller must use the
    scalar path (text below MIN_VEC_CHARS, or the word tables failed to
    build).  Chunks containing scalar-only characters (marks /
    halfwidth kana / compat ideographs / U+3006) are delegated to
    ``cd.segment_dict`` per-chunk; everything else is vectorized."""
    if len(text) < MIN_VEC_CHARS or not _build():
        return None
    out: List[str] = []
    for _, toks in _segment_pieces(text):
        out.extend(toks)
    return out


# In batch mode numpy overhead is amortized across the whole batch, so
# the worthwhile-threshold drops; genuinely tiny texts still go scalar.
MIN_BATCH_CHARS = 8

# Per-slice cap on the joined text: bounds the lockstep working set to
# a few tens of MB however large the Arrow batch is, so the allocator
# reuses the same pages slice after slice (cache-friendlier too).
SLICE_CHARS = 1 << 19


def segment_many(texts: List[str]) -> List[List[str]]:
    """Batch twin of cd.segment_dict over a list of texts (one Arrow
    batch of documents).  All texts are joined with NUL — a class-None
    separator character, so no token and no mark attachment can cross a
    join point (the scalar loop flushes at class-None chars and drops a
    mark that follows one) — segmented in ONE vectorized pass (every
    clean CJ run in the whole batch relaxes through a single lockstep
    Viterbi), and the pieces are bucketed back to their source text by
    start offset."""
    if not _build():
        return [cd.segment_dict(t) for t in texts]
    out: List[Optional[List[str]]] = [None] * len(texts)
    big_idx: List[int] = []
    for i, t in enumerate(texts):
        if not isinstance(t, str) or len(t) < MIN_BATCH_CHARS:
            out[i] = cd.segment_dict(t) if isinstance(t, str) else []
        else:
            big_idx.append(i)
    for i in big_idx:
        out[i] = []
    # process in bounded slices (see SLICE_CHARS)
    s0 = 0
    while s0 < len(big_idx):
        s1 = s0
        chars = 0
        while s1 < len(big_idx) and (
            s1 == s0 or chars + len(texts[big_idx[s1]]) <= SLICE_CHARS
        ):
            chars += len(texts[big_idx[s1]]) + 1
            s1 += 1
        sl = big_idx[s0:s1]
        joined = "\0".join(texts[i] for i in sl)
        # text k (of the slice) spans [bounds[k], bounds[k+1]-1)
        bounds = [0]
        for i in sl:
            bounds.append(bounds[-1] + len(texts[i]) + 1)
        k = 0
        for start, toks in _segment_pieces(joined):
            while start >= bounds[k + 1] - 1:
                k += 1
            out[sl[k]].extend(toks)
        s0 = s1
    return out
