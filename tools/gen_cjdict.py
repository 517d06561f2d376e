"""Generate orama_spark/kernel/data/cjdict.tsv.gz from ICU's public
CJ word dictionary.

The reference's ja/zh tokenizers delegate word segmentation to
``Intl.Segmenter`` (packages/tokenizers/src/japanese.ts:1-98,
mandarin.ts:1-98), i.e. to ICU's dictionary-based CJK break engine.
ICU and its data are public (Unicode License); the dictionary
(``brkitr/cjdict.dict``, built from the public cjdict.txt frequency
list) ships inside every Node.js build as the embedded ``icudtNN_dat``
blob.  This tool extracts that blob from the local ``node`` binary,
walks the package table-of-contents to ``cjdict.dict``, enumerates its
UCharsTrie (serialized format documented in icu4c
``common/unicode/ucharstrie.h``) and writes the (word, cost) pairs as
a sorted TSV — the exact cost table ICU's CjkBreakEngine Viterbi uses
(``common/dictbe.cpp``).

Usage: python tools/gen_cjdict.py [node_binary] [out.tsv.gz]
"""

from __future__ import annotations

import gzip
import os
import re
import struct
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DEFAULT_OUT = os.path.join(REPO, "orama_spark", "kernel", "data", "cjdict.tsv.gz")

# UCharsTrie constants — icu4c common/unicode/ucharstrie.h (public).
MAX_BRANCH_LINEAR = 5
MIN_LINEAR_MATCH = 0x30
MIN_VALUE_LEAD = 0x40
NODE_TYPE_MASK = 0x3F
VALUE_IS_FINAL = 0x8000
MIN_TWO_UNIT_VALUE_LEAD = 0x4000
THREE_UNIT_VALUE_LEAD = 0x7FFF
MIN_TWO_UNIT_NODE_VALUE_LEAD = 0x4040
THREE_UNIT_NODE_VALUE_LEAD = 0x7FC0
MIN_TWO_UNIT_DELTA_LEAD = 0xFC00
THREE_UNIT_DELTA_LEAD = 0xFFFF


def extract_icu_blob(node_path: str) -> tuple[bytes, str]:
    """Extract the embedded icudtNN_dat object from an ELF binary."""
    syms = subprocess.run(
        ["readelf", "-sW", node_path], capture_output=True, text=True, check=True
    ).stdout
    m = re.search(
        r"([0-9a-f]+)\s+(0x[0-9a-f]+|\d+)\s+OBJECT\s+GLOBAL\s+DEFAULT\s+(\d+)\s+"
        r"(icudt(\d+)_dat)",
        syms,
    )
    if not m:
        raise RuntimeError(f"no icudtNN_dat symbol in {node_path}")
    vaddr, size_s, sec_idx, sym, icu_ver = m.groups()
    vaddr = int(vaddr, 16)
    size = int(size_s, 16) if size_s.startswith("0x") else int(size_s)
    secs = subprocess.run(
        ["readelf", "-SW", node_path], capture_output=True, text=True, check=True
    ).stdout
    sm = re.search(
        rf"\[\s*{sec_idx}\]\s+\S+\s+\S+\s+([0-9a-f]+)\s+([0-9a-f]+)", secs
    )
    if not sm:
        raise RuntimeError(f"section {sec_idx} not found")
    sec_vaddr, sec_off = (int(x, 16) for x in sm.groups())
    with open(node_path, "rb") as f:
        f.seek(vaddr - sec_vaddr + sec_off)
        return f.read(size), icu_ver


def find_cjdict(blob: bytes) -> bytes:
    """Walk the ICU common-data package TOC to the cjdict.dict payload."""
    hsize, m1, m2 = struct.unpack_from("<HBB", blob, 0)
    if (m1, m2) != (0xDA, 0x27) or blob[12:16] != b"CmnD":
        raise RuntimeError("not an ICU common data package")
    count = struct.unpack_from("<I", blob, hsize)[0]
    for i in range(count):
        noff, doff = struct.unpack_from("<II", blob, hsize + 4 + 8 * i)
        end = blob.index(b"\0", hsize + noff)
        if blob[hsize + noff : end].endswith(b"brkitr/cjdict.dict"):
            return blob[hsize + doff :]
    raise RuntimeError("cjdict.dict not in package TOC")


def trie_units(dict_payload: bytes):
    """The serialized UCharsTrie of a 'Dict'-format payload, as uint16s."""
    h = struct.unpack_from("<H", dict_payload, 0)[0]
    if dict_payload[12:16] != b"Dict":
        raise RuntimeError("not a Dict-format payload")
    idx = struct.unpack_from("<8i", dict_payload, h)
    trie_off, total, trie_type = idx[0], idx[3], idx[4]
    if trie_type & 7 != 1:
        raise RuntimeError(f"expected UCharsTrie, got type {trie_type}")
    raw = dict_payload[h + trie_off : h + total]
    return struct.unpack(f"<{len(raw)//2}H", raw)


def enumerate_trie(t) -> list[tuple[str, int]]:
    """All (word, value) pairs of a serialized UCharsTrie."""
    sys.setrecursionlimit(100000)
    out: list[tuple[str, int]] = []

    def read_value(pos: int, lead: int) -> int:
        if lead < MIN_TWO_UNIT_VALUE_LEAD:
            return lead
        if lead < THREE_UNIT_VALUE_LEAD:
            return ((lead - MIN_TWO_UNIT_VALUE_LEAD) << 16) | t[pos]
        return (t[pos] << 16) | t[pos + 1]

    def skip_value(pos: int, lead: int) -> int:
        if lead >= MIN_TWO_UNIT_VALUE_LEAD:
            pos += 1 if lead < THREE_UNIT_VALUE_LEAD else 2
        return pos

    def read_node_value(pos: int, lead: int) -> int:
        if lead < MIN_TWO_UNIT_NODE_VALUE_LEAD:
            return (lead >> 6) - 1
        if lead < THREE_UNIT_NODE_VALUE_LEAD:
            return (((lead & 0x7FC0) - MIN_TWO_UNIT_NODE_VALUE_LEAD) << 10) | t[pos]
        return (t[pos] << 16) | t[pos + 1]

    def skip_node_value(pos: int, lead: int) -> int:
        if lead >= MIN_TWO_UNIT_NODE_VALUE_LEAD:
            pos += 1 if lead < THREE_UNIT_NODE_VALUE_LEAD else 2
        return pos

    def jump_by_delta(pos: int) -> int:
        d = t[pos]
        pos += 1
        if d >= MIN_TWO_UNIT_DELTA_LEAD:
            if d == THREE_UNIT_DELTA_LEAD:
                d = (t[pos] << 16) | t[pos + 1]
                pos += 2
            else:
                d = ((d - MIN_TWO_UNIT_DELTA_LEAD) << 16) | t[pos]
                pos += 1
        return pos + d

    def skip_delta(pos: int) -> int:
        d = t[pos]
        pos += 1
        if d >= MIN_TWO_UNIT_DELTA_LEAD:
            pos += 2 if d == THREE_UNIT_DELTA_LEAD else 1
        return pos

    def walk(pos: int, prefix: str) -> None:
        while True:
            node = t[pos]
            pos += 1
            if node >= MIN_VALUE_LEAD:
                if node & VALUE_IS_FINAL:
                    out.append((prefix, read_value(pos, node & 0x7FFF)))
                    return
                out.append((prefix, read_node_value(pos, node)))
                pos = skip_node_value(pos, node)
                node &= NODE_TYPE_MASK
            if node < MIN_LINEAR_MATCH:
                length = node
                if length == 0:
                    length = t[pos]
                    pos += 1
                walk_branch(pos, length + 1, prefix)
                return
            length = node - MIN_LINEAR_MATCH + 1
            prefix = prefix + "".join(chr(u) for u in t[pos : pos + length])
            pos += length

    def walk_branch(pos: int, length: int, prefix: str) -> None:
        while length > MAX_BRANCH_LINEAR:
            pos2 = pos + 1  # skip the comparison split unit
            walk_branch(jump_by_delta(pos2), length >> 1, prefix)
            pos = skip_delta(pos2)
            length = length - (length >> 1)
        while length > 1:
            unit = chr(t[pos])
            pos += 1
            lead = t[pos]
            if lead & VALUE_IS_FINAL:
                out.append((prefix + unit, read_value(pos + 1, lead & 0x7FFF)))
            else:
                p2 = pos + 1
                d = read_value(p2, lead)
                walk(skip_value(p2, lead) + d, prefix + unit)
            pos = skip_value(pos + 1, t[pos] & 0x7FFF)
            length -= 1
        unit = chr(t[pos])
        walk(pos + 1, prefix + unit)

    walk(0, "")
    return out


def main() -> None:
    node = sys.argv[1] if len(sys.argv) > 1 else "/usr/bin/node"
    out_path = sys.argv[2] if len(sys.argv) > 2 else DEFAULT_OUT
    blob, icu_ver = extract_icu_blob(node)
    words = enumerate_trie(trie_units(find_cjdict(blob)))
    words.sort()
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with gzip.open(out_path, "wt", encoding="utf-8", compresslevel=9) as f:
        f.write(f"# cjdict from ICU {icu_ver} (Unicode License), "
                f"extracted by tools/gen_cjdict.py\n")
        for w, v in words:
            f.write(f"{w}\t{v}\n")
    print(f"{len(words)} entries -> {out_path} "
          f"({os.path.getsize(out_path)} bytes, ICU {icu_ver})")


if __name__ == "__main__":
    main()
