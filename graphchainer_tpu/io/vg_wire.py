"""Minimal protobuf wire-format encoder for the vg schema subset we emit.

Hand-rolled (no protoc dependency): only varint, length-delimited and the
few field numbers of vg.Position / Edit / Mapping / Path / Alignment that
GAM consumers read (field numbers from the public vg schema, mirrored in
the reference's vendored src/vg.proto:52-128)."""
from __future__ import annotations

import struct
from typing import List, Optional


def varint(n: int) -> bytes:
    out = bytearray()
    n &= (1 << 64) - 1
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def tag(field: int, wire: int) -> bytes:
    return varint((field << 3) | wire)


def f_varint(field: int, value: int) -> bytes:
    if value == 0:
        return b""
    return tag(field, 0) + varint(value)


def f_bool(field: int, value: bool) -> bytes:
    return f_varint(field, 1 if value else 0)


def f_bytes(field: int, value: bytes) -> bytes:
    if not value:
        return b""
    return tag(field, 2) + varint(len(value)) + value


def f_str(field: int, value: str) -> bytes:
    return f_bytes(field, value.encode("utf-8"))


def f_msg(field: int, value: bytes) -> bytes:
    # empty submessages still get emitted (presence carries meaning)
    return tag(field, 2) + varint(len(value)) + value


def f_double(field: int, value: float) -> bytes:
    if value == 0.0:
        return b""
    return tag(field, 1) + struct.pack("<d", value)


def position(node_id: int, offset: int, is_reverse: bool) -> bytes:
    return (f_varint(1, node_id) + f_varint(2, offset)
            + f_bool(4, is_reverse))


def edit(from_length: int, to_length: int, sequence: str = "") -> bytes:
    return (f_varint(1, from_length) + f_varint(2, to_length)
            + f_str(3, sequence))


def mapping(pos: bytes, edits: List[bytes], rank: int) -> bytes:
    out = f_msg(1, pos)
    for e in edits:
        out += f_msg(2, e)
    out += f_varint(5, rank)
    return out


def path(mappings: List[bytes], name: str = "") -> bytes:
    out = f_str(1, name)
    for m in mappings:
        out += f_msg(2, m)
    return out


def alignment(sequence: str, path_msg: Optional[bytes], name: str,
              score: int = 0, identity: float = 0.0,
              mapping_quality: int = 0) -> bytes:
    out = f_str(1, sequence)
    if path_msg is not None:
        out += f_msg(2, path_msg)
    out += f_str(3, name)
    out += f_varint(5, mapping_quality)
    out += f_varint(6, score)
    out += f_double(16, identity)
    return out
