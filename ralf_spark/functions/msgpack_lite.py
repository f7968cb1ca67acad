"""Minimal pure-Python MessagePack codec — no third-party dependency.

The reference's Kafka source deserializes msgpack-encoded values
(``ralf/operators/source.py:73-75``: ``value_deserializer=msgpack.loads``;
fields consumed at ``:80-86``). Spark has no native msgpack codec, so the
engine decodes Kafka payloads in an Arrow-batched ``mapInPandas`` kernel
(``ralf_spark.streaming.sources.decode_kafka_records``); that kernel uses
the real ``msgpack`` package when importable and falls back to this codec
otherwise, so the decode path runs (and is tested) in dependency-free
environments.

Implements the subset of the public MessagePack format spec
(https://github.com/msgpack/msgpack/blob/master/spec.md) that record
payloads use: nil, bool, all int widths, float32/64, str, bin, array, map.
Ext types are not needed for the reference wire schema and raise.
"""

from __future__ import annotations

import struct
from typing import Any

__all__ = ["packb", "unpackb", "loads"]


def packb(obj: Any) -> bytes:
    """Serialize ``obj`` to msgpack bytes."""
    out = bytearray()
    _pack(obj, out)
    return bytes(out)


def _pack(obj: Any, out: bytearray) -> None:
    if obj is None:
        out.append(0xC0)
    elif obj is False:
        out.append(0xC2)
    elif obj is True:
        out.append(0xC3)
    elif isinstance(obj, int):
        _pack_int(obj, out)
    elif isinstance(obj, float):
        out.append(0xCB)
        out += struct.pack(">d", obj)
    elif isinstance(obj, str):
        b = obj.encode("utf-8")
        n = len(b)
        if n < 32:
            out.append(0xA0 | n)
        elif n < 2**8:
            out += struct.pack(">BB", 0xD9, n)
        elif n < 2**16:
            out += struct.pack(">BH", 0xDA, n)
        else:
            out += struct.pack(">BI", 0xDB, n)
        out += b
    elif isinstance(obj, (bytes, bytearray)):
        n = len(obj)
        if n < 2**8:
            out += struct.pack(">BB", 0xC4, n)
        elif n < 2**16:
            out += struct.pack(">BH", 0xC5, n)
        else:
            out += struct.pack(">BI", 0xC6, n)
        out += obj
    elif isinstance(obj, (list, tuple)):
        n = len(obj)
        if n < 16:
            out.append(0x90 | n)
        elif n < 2**16:
            out += struct.pack(">BH", 0xDC, n)
        else:
            out += struct.pack(">BI", 0xDD, n)
        for item in obj:
            _pack(item, out)
    elif isinstance(obj, dict):
        n = len(obj)
        if n < 16:
            out.append(0x80 | n)
        elif n < 2**16:
            out += struct.pack(">BH", 0xDE, n)
        else:
            out += struct.pack(">BI", 0xDF, n)
        for k, v in obj.items():
            _pack(k, out)
            _pack(v, out)
    else:
        raise TypeError(f"cannot msgpack-serialize {type(obj).__name__}")


def _pack_int(v: int, out: bytearray) -> None:
    if 0 <= v < 0x80:
        out.append(v)
    elif -32 <= v < 0:
        out.append(v & 0xFF)
    elif 0 <= v < 2**8:
        out += struct.pack(">BB", 0xCC, v)
    elif 0 <= v < 2**16:
        out += struct.pack(">BH", 0xCD, v)
    elif 0 <= v < 2**32:
        out += struct.pack(">BI", 0xCE, v)
    elif 0 <= v < 2**64:
        out += struct.pack(">BQ", 0xCF, v)
    elif -(2**7) <= v < 0:
        out += struct.pack(">Bb", 0xD0, v)
    elif -(2**15) <= v < 0:
        out += struct.pack(">Bh", 0xD1, v)
    elif -(2**31) <= v < 0:
        out += struct.pack(">Bi", 0xD2, v)
    elif -(2**63) <= v < 0:
        out += struct.pack(">Bq", 0xD3, v)
    else:
        raise OverflowError(f"int out of msgpack range: {v}")


def unpackb(data: bytes | bytearray | memoryview) -> Any:
    """Deserialize one msgpack object; trailing bytes are an error."""
    mv = memoryview(bytes(data))
    obj, off = _unpack(mv, 0)
    if off != len(mv):
        raise ValueError(f"{len(mv) - off} trailing bytes after msgpack object")
    return obj


#: ``msgpack.loads`` alias — lets callers treat this module as a drop-in
#: for the subset the wire decode uses.
loads = unpackb


def _unpack(mv: memoryview, off: int) -> tuple[Any, int]:
    b = mv[off]
    off += 1
    if b < 0x80:  # positive fixint
        return b, off
    if b >= 0xE0:  # negative fixint
        return b - 0x100, off
    if 0x80 <= b < 0x90:  # fixmap
        return _unpack_map(mv, off, b & 0x0F)
    if 0x90 <= b < 0xA0:  # fixarray
        return _unpack_array(mv, off, b & 0x0F)
    if 0xA0 <= b < 0xC0:  # fixstr
        n = b & 0x1F
        return str(mv[off : off + n], "utf-8"), off + n
    if b == 0xC0:
        return None, off
    if b == 0xC2:
        return False, off
    if b == 0xC3:
        return True, off
    if b in (0xC4, 0xC5, 0xC6):  # bin8/16/32
        n, off = _unpack_len(mv, off, b - 0xC4)
        return bytes(mv[off : off + n]), off + n
    if b == 0xCA:
        return struct.unpack_from(">f", mv, off)[0], off + 4
    if b == 0xCB:
        return struct.unpack_from(">d", mv, off)[0], off + 8
    if b in (0xCC, 0xCD, 0xCE, 0xCF):  # uint8/16/32/64
        fmt = "BHIQ"[b - 0xCC]
        return (
            struct.unpack_from(">" + fmt, mv, off)[0],
            off + struct.calcsize(fmt),
        )
    if b in (0xD0, 0xD1, 0xD2, 0xD3):  # int8/16/32/64
        fmt = "bhiq"[b - 0xD0]
        return (
            struct.unpack_from(">" + fmt, mv, off)[0],
            off + struct.calcsize(fmt),
        )
    if b in (0xD9, 0xDA, 0xDB):  # str8/16/32
        n, off = _unpack_len(mv, off, b - 0xD9)
        return str(mv[off : off + n], "utf-8"), off + n
    if b in (0xDC, 0xDD):  # array16/32
        n, off = _unpack_len(mv, off, b - 0xDC + 1)
        return _unpack_array(mv, off, n)
    if b in (0xDE, 0xDF):  # map16/32
        n, off = _unpack_len(mv, off, b - 0xDE + 1)
        return _unpack_map(mv, off, n)
    raise ValueError(f"unsupported msgpack type byte 0x{b:02x} (ext?)")


def _unpack_len(mv: memoryview, off: int, width_idx: int) -> tuple[int, int]:
    fmt = ">" + "BHI"[width_idx]
    return struct.unpack_from(fmt, mv, off)[0], off + struct.calcsize(fmt)


def _unpack_array(mv: memoryview, off: int, n: int) -> tuple[list, int]:
    items = []
    for _ in range(n):
        item, off = _unpack(mv, off)
        items.append(item)
    return items, off


def _unpack_map(mv: memoryview, off: int, n: int) -> tuple[dict, int]:
    d = {}
    for _ in range(n):
        k, off = _unpack(mv, off)
        v, off = _unpack(mv, off)
        d[k] = v
    return d, off
