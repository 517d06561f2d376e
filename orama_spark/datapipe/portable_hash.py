"""Portable 64-bit FNV-1a over unicode codepoints — one hash, two
engines. The SAME k-gram hash is computable (bit-exact) as

  * a vectorized numpy kernel inside an Arrow/pandas UDF (Spark side),
  * a pure-SQL list expression (DuckDB side, for the driver oracles).

This is what lets the winnowing / minhash / simhash driver queries have
real value-level DuckDB oracles instead of `no_oracle` rows: Spark's
builtin ``xxhash64`` has no DuckDB twin, FNV-1a does (it is 4 integer
ops per char).

Definition (codepoint-wise, NOT byte-wise, so SQL `unicode(substr(...))`
and numpy UTF-32 views agree on non-ASCII):

    h = 14695981039346656037
    for each codepoint c: h = ((h XOR c) * 1099511628211) mod 2**64

Final value is reinterpreted as signed int64 (two's complement) because
Spark has no unsigned type.
"""

from __future__ import annotations

import numpy as np

FNV_OFFSET = 14695981039346656037
FNV_PRIME = 1099511628211
_U64 = 1 << 64
_I64_MAX1 = 1 << 63

# RE2-compatible whitespace class ([\t\n\f\r ] — NO \v), used so the
# Python kernel and the DuckDB oracle tokenize identically.
WS_CLASS = "[\\t\\n\\f\\r ]"


def codepoints(text: str) -> np.ndarray:
    """uint64 codepoint array of ``text`` (fast UTF-32 view)."""
    if not text:
        return np.empty(0, dtype=np.uint64)
    return np.frombuffer(text.encode("utf-32-le"), dtype=np.uint32).astype(np.uint64)


def fnv1a64(text: str) -> int:
    """Whole-string FNV-1a as signed int64."""
    h = np.uint64(FNV_OFFSET)
    pr = np.uint64(FNV_PRIME)
    with np.errstate(over="ignore"):  # uint64 wraparound is the algorithm
        for c in codepoints(text):
            h = (h ^ c) * pr
    return int(h.view(np.int64)) if np.isscalar(h) else int(np.int64(h))


def kgram_hashes(text: str, k: int) -> np.ndarray:
    """Signed-int64 FNV-1a hashes of every k-codepoint gram of ``text``,
    vectorized: k fused (xor, mul) passes over CONTIGUOUS shifted slices
    — O(n*k) uint64 ops, no per-gram Python. (The earlier
    sliding_window_view formulation read column j with a k*8-byte
    stride, touching a full cache line per element — ~8x the DRAM
    traffic; on this memory-bandwidth-bound VM that dominated the
    kernel. Contiguous slices are bit-identical and sequential.)"""
    codes = codepoints(text)
    if len(codes) < k:
        return np.empty(0, dtype=np.int64)
    n = len(codes) - k + 1
    h = np.full(n, FNV_OFFSET, dtype=np.uint64)
    pr = np.uint64(FNV_PRIME)
    for j in range(k):
        h = (h ^ codes[j : j + n]) * pr  # uint64 wraps mod 2**64
    return h.view(np.int64)


def token_hashes(tokens: list[str]) -> np.ndarray:
    """Signed-int64 FNV-1a hash per token, vectorized ACROSS tokens:
    all codepoints are decoded in one utf-32 pass, then the sequential
    FNV fold runs per character POSITION with a still-active mask —
    O(max_token_len) fused numpy passes instead of a per-codepoint
    Python loop."""
    n = len(tokens)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    lens = np.fromiter((len(t) for t in tokens), count=n, dtype=np.int64)
    all_codes = np.frombuffer(
        "".join(tokens).encode("utf-32-le"), dtype=np.uint32
    ).astype(np.uint64)
    offsets = np.concatenate(([0], np.cumsum(lens)[:-1]))
    pr = np.uint64(FNV_PRIME)
    h = np.full(n, FNV_OFFSET, dtype=np.uint64)
    max_len = int(lens.max())
    for j in range(max_len):
        m = lens > j
        h[m] = (h[m] ^ all_codes[offsets[m] + j]) * pr
    return h.view(np.int64)


# --------------------------------------------------------------- SQL side

def sql_fnv_reduce(codes_list_expr: str) -> str:
    """DuckDB expression: FNV-1a (as HUGEINT in [0, 2**64)) over a SQL
    LIST of codepoints. ``codes_list_expr`` must evaluate to
    list<HUGEINT-castable>."""
    return (
        "list_reduce(list_prepend(14695981039346656037::HUGEINT, "
        f"list_transform({codes_list_expr}, c -> c::HUGEINT)), "
        "(acc, c) -> (xor(acc::UBIGINT, c::UBIGINT)::HUGEINT"
        " * 1099511628211::HUGEINT) % 18446744073709551616::HUGEINT)"
    )


def sql_signed(huge_expr: str) -> str:
    """DuckDB expression: reinterpret a [0, 2**64) HUGEINT as signed
    int64 (matches numpy .view(int64))."""
    return (
        f"CASE WHEN ({huge_expr}) >= 9223372036854775808::HUGEINT "
        f"THEN (({huge_expr}) - 18446744073709551616::HUGEINT)::BIGINT "
        f"ELSE ({huge_expr})::BIGINT END"
    )


def sql_kgram_hashes(text_expr: str, k: int) -> str:
    """DuckDB expression: list<BIGINT> of the k-gram FNV-1a hashes of
    ``text_expr`` — bit-exact vs :func:`kgram_hashes`."""
    codes = f"list_transform(range(i, i + {k}), j -> unicode(substr({text_expr}, j::INT, 1)))"
    return (
        f"list_transform(range(1, greatest(length({text_expr}) - {k - 1}, 0) + 1), "
        f"i -> {sql_signed(sql_fnv_reduce(codes))})"
    )


def sql_string_fnv(str_expr: str) -> str:
    """DuckDB expression: signed FNV-1a of a whole string — bit-exact vs
    :func:`fnv1a64` / :func:`token_hashes` elements."""
    codes = (
        f"list_transform(range(1, length({str_expr}) + 1), "
        f"j -> unicode(substr({str_expr}, j::INT, 1)))"
    )
    return sql_signed(sql_fnv_reduce(codes))
