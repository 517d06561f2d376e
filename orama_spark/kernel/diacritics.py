"""Diacritics folding — exact port of the reference charcode table.

Reference: /root/reference/packages/orama/src/components/tokenizer/diacritics.ts:1-212
The table maps charcodes U+00C0..U+017F to ASCII; ``None`` entries
(charcodes 0xD7 '×' and 0xF7 '÷') are left unchanged (the reference uses
``|| charCode`` so a null mapping falls through to the original char).
"""

from __future__ import annotations

DIACRITICS_CHARCODE_START = 192
DIACRITICS_CHARCODE_END = 383

# fmt: off
_CHARCODE_REPLACE_MAPPING = [
    65, 65, 65, 65, 65, 65, 65, 67, 69, 69, 69, 69, 73, 73, 73, 73,
    69, 78, 79, 79, 79, 79, 79, None, 79, 85, 85, 85, 85, 89, 80, 115,
    97, 97, 97, 97, 97, 97, 97, 99, 101, 101, 101, 101, 105, 105, 105, 105,
    101, 110, 111, 111, 111, 111, 111, None, 111, 117, 117, 117, 117, 121, 112, 121,
    65, 97, 65, 97, 65, 97, 67, 99, 67, 99, 67, 99, 67, 99, 68, 100,
    68, 100, 69, 101, 69, 101, 69, 101, 69, 101, 69, 101, 71, 103, 71, 103,
    71, 103, 71, 103, 72, 104, 72, 104, 73, 105, 73, 105, 73, 105, 73, 105,
    73, 105, 73, 105, 74, 106, 75, 107, 107, 76, 108, 76, 108, 76, 108, 76,
    108, 76, 108, 78, 110, 78, 110, 78, 110, 110, 78, 110, 79, 111, 79, 111,
    79, 111, 79, 111, 82, 114, 82, 114, 82, 114, 83, 115, 83, 115, 83, 115,
    83, 115, 84, 116, 84, 116, 84, 116, 85, 117, 85, 117, 85, 117, 85, 117,
    85, 117, 85, 117, 87, 119, 89, 121, 89, 90, 122, 90, 122, 90, 122, 115,
]
# fmt: on

# Precomputed str.translate table: charcode -> replacement charcode.
_TRANSLATE_TABLE: dict[int, int] = {}
for _i, _repl in enumerate(_CHARCODE_REPLACE_MAPPING):
    if _repl is not None and _repl != 0:
        _TRANSLATE_TABLE[DIACRITICS_CHARCODE_START + _i] = _repl


def replace_diacritics(s: str) -> str:
    """Port of ``replaceDiacritics`` (diacritics.ts:206-212)."""
    return s.translate(_TRANSLATE_TABLE)
