"""proto → row converter for the reference's MoonlinkRow protobuf
(src/moonlink_proto/proto/row.proto: ``MoonlinkRow { repeated RowValue
values = 1 }`` with a RowValue oneof — int32=1, int64=2, float32=3,
float64=4, decimal_128_be=5, bool=6, bytes=7, fixed_len_bytes=8,
array=9, struct=10, null=11).

No protobuf library ships in this container, so this decodes the proto3
WIRE FORMAT directly — it's four primitives (varint, fixed64,
length-delimited, fixed32) and nothing else. Values are positional
(MoonlinkRow is a value list, not a map), exactly like the reference's
``MoonlinkRow``; the batch stage zips them onto a target Arrow schema
by position (proto_to_moonlink_row parity).

    ds.map_batches(ProtoToRows(arrow_schema, payload_col="value"),
                   batch_format="pyarrow", concurrency=(1, 8))
"""

from __future__ import annotations

import struct

import pyarrow as pa

_VARINT, _FIX64, _LEN, _FIX32 = 0, 1, 2, 5


class ProtoDecodeError(ValueError):
    pass


def _read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    shift, acc = 0, 0
    while True:
        if pos >= len(buf):
            raise ProtoDecodeError("truncated varint")
        b = buf[pos]
        pos += 1
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            return acc, pos
        shift += 7


def _fields(buf: bytes):
    """Iterate (field_number, wire_type, value) over one message."""
    pos = 0
    while pos < len(buf):
        key, pos = _read_varint(buf, pos)
        fnum, wt = key >> 3, key & 7
        if wt == _VARINT:
            v, pos = _read_varint(buf, pos)
        elif wt == _FIX64:
            v, pos = buf[pos:pos + 8], pos + 8
        elif wt == _LEN:
            n, pos = _read_varint(buf, pos)
            v, pos = buf[pos:pos + n], pos + n
        elif wt == _FIX32:
            v, pos = buf[pos:pos + 4], pos + 4
        else:
            raise ProtoDecodeError(f"unsupported wire type {wt}")
        yield fnum, wt, v


def _signed(v: int, bits: int) -> int:
    """proto3 int32/int64 are two's-complement varints."""
    v &= (1 << 64) - 1
    if v >= 1 << 63:
        v -= 1 << 64
    return v


def decode_row_value(buf: bytes):
    """One RowValue message → python value (oneof dispatch)."""
    for fnum, _wt, v in _fields(buf):
        if fnum == 1:
            return _signed(v, 32)
        if fnum == 2:
            return _signed(v, 64)
        if fnum == 3:
            return struct.unpack("<f", v)[0]
        if fnum == 4:
            return struct.unpack("<d", v)[0]
        if fnum == 5:  # decimal128 big-endian two's complement
            return int.from_bytes(v, "big", signed=True)
        if fnum == 6:
            return bool(v)
        if fnum in (7, 8):
            return bytes(v)
        if fnum == 9:   # Array { repeated RowValue values = 1 }
            return [decode_row_value(sub) for _f, _w, sub in _fields(v)
                    if _f == 1]
        if fnum == 10:  # Struct { repeated RowValue fields = 1 }
            return tuple(decode_row_value(sub) for _f, _w, sub in _fields(v)
                         if _f == 1)
        if fnum == 11:
            return None
    return None  # empty oneof ≡ null


def decode_moonlink_row(buf: bytes) -> list:
    """MoonlinkRow message → positional python values."""
    return [decode_row_value(v) for f, _w, v in _fields(buf) if f == 1]


# ---- encoder (tests / synthetic sources) ----

def _varint(v: int) -> bytes:
    v &= (1 << 64) - 1
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _key(fnum: int, wt: int) -> bytes:
    return _varint((fnum << 3) | wt)


def _len_field(fnum: int, payload: bytes) -> bytes:
    return _key(fnum, _LEN) + _varint(len(payload)) + payload


def encode_row_value(value, kind: str) -> bytes:
    """kind ∈ int32,int64,float32,float64,decimal128,bool,bytes,fixed,
    array:<kind>,struct:<k1,k2,...>,null."""
    if kind == "null" or value is None:
        return _len_field(11, b"")
    if kind == "int32":
        return _key(1, _VARINT) + _varint(value)
    if kind == "int64":
        return _key(2, _VARINT) + _varint(value)
    if kind == "float32":
        return _key(3, _FIX32) + struct.pack("<f", value)
    if kind == "float64":
        return _key(4, _FIX64) + struct.pack("<d", value)
    if kind == "decimal128":
        return _len_field(5, int(value).to_bytes(16, "big", signed=True))
    if kind == "bool":
        return _key(6, _VARINT) + _varint(1 if value else 0)
    if kind == "bytes":
        return _len_field(7, bytes(value))
    if kind == "fixed":
        return _len_field(8, bytes(value))
    if kind.startswith("array:"):
        inner = kind.split(":", 1)[1]
        payload = b"".join(_len_field(1, encode_row_value(v, inner))
                           for v in value)
        return _len_field(9, payload)
    if kind.startswith("struct:"):
        kinds = kind.split(":", 1)[1].split(",")
        payload = b"".join(_len_field(1, encode_row_value(v, k))
                           for v, k in zip(value, kinds))
        return _len_field(10, payload)
    raise ProtoDecodeError(f"unknown kind {kind!r}")


def encode_moonlink_row(values_kinds: list[tuple]) -> bytes:
    """[(value, kind), ...] → MoonlinkRow bytes."""
    return b"".join(_len_field(1, encode_row_value(v, k))
                    for v, k in values_kinds)


# ---------------------------------------------------------------- stage


class ProtoToRows:
    """map_batches stage: MoonlinkRow protobuf datums → typed Arrow
    columns, mapped POSITIONALLY onto the target schema (MoonlinkRow
    carries no field names, exactly like the reference row)."""

    def __init__(self, schema: pa.Schema, payload_col: str = "value",
                 keep_cols: tuple[str, ...] = ()):
        self.schema = schema
        self.payload_col = payload_col
        self.keep_cols = keep_cols

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows = [decode_moonlink_row(d)
                for d in batch[self.payload_col].to_pylist()]
        cols = {}
        for c in self.keep_cols:
            cols[c] = batch[c]
        for i, f in enumerate(self.schema):
            vals = [r[i] if i < len(r) else None for r in rows]
            if pa.types.is_string(f.type):
                vals = [v.decode() if isinstance(v, bytes) else v for v in vals]
            cols[f.name] = pa.array(vals, f.type)
        return pa.table(cols)
