"""Reference-format persistence: ``save``/``load`` dumps + the
plugin-data-persistence ``persist``/``restore`` wire formats.

Closes SURVEY §2.1's two serialization rows with real interchange:
``save_dump`` emits the reference's RawData object
(methods/serialization.ts:22-31), ``persist`` wraps it as 'json' or
msgpack-hex 'binary' (plugin-data-persistence/src/index.ts:54-93), and
``restore``/``restore_index`` turn either payload — including one a
real reference instance saved — into our query-ready parquet layout.

The parquet tables remain the at-scale persistence layer; these dumps
are the reference-compatible interchange format (single-document by
design, with explicit export size guards).
"""

from .dump import persist, save_dump
from .msgpack_codec import decode as msgpack_decode
from .msgpack_codec import encode as msgpack_encode
from .restore import parse_payload, restore, restore_index

__all__ = [
    "save_dump",
    "persist",
    "restore",
    "restore_index",
    "parse_payload",
    "msgpack_encode",
    "msgpack_decode",
]
