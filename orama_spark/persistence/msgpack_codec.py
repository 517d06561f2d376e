"""Minimal MessagePack codec for persistence dumps.

The reference's ``plugin-data-persistence`` ``binary`` format is
``@msgpack/msgpack`` ``encode(save(db))`` hex-encoded
(plugin-data-persistence/src/index.ts:73-82). This is a dependency-free
implementation of the public MessagePack spec
(https://github.com/msgpack/msgpack/blob/master/spec.md) covering the
types a dump contains: nil, bool, int, float64, str, bin, array, map.

Encoding choices mirror @msgpack/msgpack defaults so a dump we write is
byte-compatible with what the JS plugin would produce for the same
object tree:

- integers take the shortest unsigned/signed form (positive fixint,
  uint8/16/32/64, negative fixint, int8/16/32/64);
- floats are always float64 (JS numbers);
- str sizes use fixstr/str8/str16/str32;
- maps preserve insertion order (JS object key order).

Floats that carry integral values stay floats only if the Python object
is a float — mirroring JS where ``1.0`` and ``1`` are the same number
and @msgpack/msgpack encodes integral numbers as ints. Callers that
need exact JS behaviour should therefore pass ints for integral values
(the dump builder does: tf ratios stay floats, ids/lengths are ints).
"""

from __future__ import annotations

import struct
from typing import Any


def encode(obj: Any) -> bytes:
    out = bytearray()
    _enc(obj, out)
    return bytes(out)


def _enc(o: Any, out: bytearray) -> None:
    if o is None:
        out.append(0xC0)
    elif o is True:
        out.append(0xC3)
    elif o is False:
        out.append(0xC2)
    elif isinstance(o, int):
        _enc_int(o, out)
    elif isinstance(o, float):
        # @msgpack/msgpack encodes integral JS numbers as ints
        if o.is_integer() and abs(o) < 2**63:
            _enc_int(int(o), out)
        else:
            out.append(0xCB)
            out += struct.pack(">d", o)
    elif isinstance(o, str):
        b = o.encode("utf-8")
        n = len(b)
        if n < 32:
            out.append(0xA0 | n)
        elif n < 256:
            out += b"\xd9" + struct.pack(">B", n)
        elif n < 65536:
            out += b"\xda" + struct.pack(">H", n)
        else:
            out += b"\xdb" + struct.pack(">I", n)
        out += b
    elif isinstance(o, (bytes, bytearray)):
        n = len(o)
        if n < 256:
            out += b"\xc4" + struct.pack(">B", n)
        elif n < 65536:
            out += b"\xc5" + struct.pack(">H", n)
        else:
            out += b"\xc6" + struct.pack(">I", n)
        out += o
    elif isinstance(o, (list, tuple)):
        n = len(o)
        if n < 16:
            out.append(0x90 | n)
        elif n < 65536:
            out += b"\xdc" + struct.pack(">H", n)
        else:
            out += b"\xdd" + struct.pack(">I", n)
        for it in o:
            _enc(it, out)
    elif isinstance(o, dict):
        n = len(o)
        if n < 16:
            out.append(0x80 | n)
        elif n < 65536:
            out += b"\xde" + struct.pack(">H", n)
        else:
            out += b"\xdf" + struct.pack(">I", n)
        for k, v in o.items():
            _enc(k if isinstance(k, str) else str(k), out)
            _enc(v, out)
    else:
        raise TypeError(f"msgpack: unsupported type {type(o).__name__}")


def _enc_int(i: int, out: bytearray) -> None:
    if 0 <= i < 128:
        out.append(i)
    elif -32 <= i < 0:
        out.append(0x100 + i)
    elif 0 <= i < 256:
        out += b"\xcc" + struct.pack(">B", i)
    elif 0 <= i < 65536:
        out += b"\xcd" + struct.pack(">H", i)
    elif 0 <= i < 2**32:
        out += b"\xce" + struct.pack(">I", i)
    elif 0 <= i < 2**64:
        out += b"\xcf" + struct.pack(">Q", i)
    elif -128 <= i < 0:
        out += b"\xd0" + struct.pack(">b", i)
    elif -32768 <= i < 0:
        out += b"\xd1" + struct.pack(">h", i)
    elif -(2**31) <= i < 0:
        out += b"\xd2" + struct.pack(">i", i)
    elif -(2**63) <= i < 0:
        out += b"\xd3" + struct.pack(">q", i)
    else:
        raise OverflowError(f"msgpack: int out of 64-bit range: {i}")


def decode(data: bytes) -> Any:
    obj, pos = _dec(memoryview(data), 0)
    if pos != len(data):
        raise ValueError(f"msgpack: {len(data) - pos} trailing bytes")
    return obj


def _dec(b: memoryview, p: int):
    t = b[p]
    p += 1
    if t < 0x80:  # positive fixint
        return t, p
    if t >= 0xE0:  # negative fixint
        return t - 0x100, p
    if 0x80 <= t < 0x90:  # fixmap
        return _dec_map(b, p, t & 0x0F)
    if 0x90 <= t < 0xA0:  # fixarray
        return _dec_arr(b, p, t & 0x0F)
    if 0xA0 <= t < 0xC0:  # fixstr
        n = t & 0x1F
        return str(b[p : p + n], "utf-8"), p + n
    if t == 0xC0:
        return None, p
    if t == 0xC2:
        return False, p
    if t == 0xC3:
        return True, p
    if t in (0xC4, 0xC5, 0xC6):  # bin 8/16/32
        w = {0xC4: 1, 0xC5: 2, 0xC6: 4}[t]
        n = int.from_bytes(b[p : p + w], "big")
        p += w
        return bytes(b[p : p + n]), p + n
    if t == 0xCA:
        return struct.unpack_from(">f", b, p)[0], p + 4
    if t == 0xCB:
        return struct.unpack_from(">d", b, p)[0], p + 8
    if t in (0xCC, 0xCD, 0xCE, 0xCF):  # uint 8/16/32/64
        w = 1 << (t - 0xCC)
        return int.from_bytes(b[p : p + w], "big"), p + w
    if t in (0xD0, 0xD1, 0xD2, 0xD3):  # int 8/16/32/64
        w = 1 << (t - 0xD0)
        return int.from_bytes(b[p : p + w], "big", signed=True), p + w
    if t in (0xD9, 0xDA, 0xDB):  # str 8/16/32
        w = {0xD9: 1, 0xDA: 2, 0xDB: 4}[t]
        n = int.from_bytes(b[p : p + w], "big")
        p += w
        return str(b[p : p + n], "utf-8"), p + n
    if t in (0xDC, 0xDD):  # array 16/32
        w = 2 if t == 0xDC else 4
        n = int.from_bytes(b[p : p + w], "big")
        return _dec_arr(b, p + w, n)
    if t in (0xDE, 0xDF):  # map 16/32
        w = 2 if t == 0xDE else 4
        n = int.from_bytes(b[p : p + w], "big")
        return _dec_map(b, p + w, n)
    raise ValueError(f"msgpack: unsupported type byte 0x{t:02x}")


def _dec_arr(b: memoryview, p: int, n: int):
    out = []
    for _ in range(n):
        v, p = _dec(b, p)
        out.append(v)
    return out, p


def _dec_map(b: memoryview, p: int, n: int):
    out = {}
    for _ in range(n):
        k, p = _dec(b, p)
        v, p = _dec(b, p)
        out[k] = v
    return out, p
