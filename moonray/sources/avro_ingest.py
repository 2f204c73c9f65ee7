"""Avro → row converter (the reference's Kafka-shaped ingest path:
src/moonlink_connectors/src/rest_ingest/avro_converter.rs — record →
row, union[null, X] → nullable X, schema mapped to Arrow exactly as
convert_schema_type:151-236 does).

No avro library ships in this container, so this is a self-contained
implementation of the Avro BINARY encoding for the subset the reference
converter supports: null, boolean, int, long, float, double, bytes,
string, record, enum, fixed, array, map, and unions. The binary format
is tiny — zigzag-varint longs, length-prefixed bytes, field
concatenation for records, block-encoded arrays/maps (Apache Avro
spec §binary encoding) — and a pure-Python decoder matches how this
path is used: per-message decode is inherently row-wise (the reference
decodes one Kafka message at a time too); the batch converter amortizes
schema parsing once per actor.

    schema = parse_avro_schema(json_str)
    ds.map_batches(AvroToRows(schema, payload_col="value"),
                   batch_format="pyarrow", concurrency=(1, 8))
"""

from __future__ import annotations

import json
import struct

import pyarrow as pa

# ---------------------------------------------------------------- schema


class AvroSchemaError(ValueError):
    pass


def parse_avro_schema(src):
    """JSON string/dict → normalized schema tree (dicts with 'type')."""
    s = json.loads(src) if isinstance(src, str) else src
    return _norm(s)


_PRIMITIVES = {"null", "boolean", "int", "long", "float", "double",
               "bytes", "string"}


# Avro logicalType annotations the converter honors (the reference's
# ingest model: decimal(i128), date32, time64 µs, timestamp µs UTC —
# avro spec §logical-types). timestamp-millis decodes scaled to µs so
# the Arrow side is always timestamp[us].
_LOGICAL = {("bytes", "decimal"), ("fixed", "decimal"),
            ("int", "date"), ("long", "time-micros"),
            ("long", "timestamp-micros"), ("long", "timestamp-millis"),
            ("long", "local-timestamp-micros")}


def _norm(s):
    if isinstance(s, str):
        if s not in _PRIMITIVES:
            raise AvroSchemaError(f"unsupported avro type {s!r}")
        return {"type": s}
    if isinstance(s, list):  # union
        return {"type": "union", "branches": [_norm(b) for b in s]}
    if isinstance(s, dict):
        t = s["type"]
        lt = s.get("logicalType")
        if lt is not None and (t, lt) in _LOGICAL:
            node = {"type": t, "logicalType": lt}
            if lt == "decimal":
                node["precision"] = int(s["precision"])
                node["scale"] = int(s.get("scale", 0))
                if t == "fixed":
                    node["size"] = int(s["size"])
            return node
        if t in _PRIMITIVES:
            return {"type": t}
        if t == "record":
            return {"type": "record", "name": s.get("name", ""),
                    "fields": [{"name": f["name"], "type": _norm(f["type"])}
                               for f in s["fields"]]}
        if t == "array":
            return {"type": "array", "items": _norm(s["items"])}
        if t == "map":
            return {"type": "map", "values": _norm(s["values"])}
        if t == "enum":
            return {"type": "enum", "symbols": list(s["symbols"])}
        if t == "fixed":
            return {"type": "fixed", "size": int(s["size"])}
    raise AvroSchemaError(f"unsupported avro schema node: {s!r}")


def avro_to_arrow_schema(schema) -> pa.Schema:
    """Record schema → Arrow schema (avro_converter.rs:115-128; a
    union[null, X] field becomes nullable X, :192-224)."""
    if schema["type"] != "record":
        raise AvroSchemaError("top-level avro schema must be a record")
    fields = []
    for f in schema["fields"]:
        typ, nullable = _arrow_type(f["type"])
        fields.append(pa.field(f["name"], typ, nullable=nullable))
    return pa.schema(fields)


def _arrow_type(s) -> tuple[pa.DataType, bool]:
    t = s["type"]
    lt = s.get("logicalType")
    if lt is not None:
        if lt == "decimal":
            return pa.decimal128(s["precision"], s["scale"]), False
        if lt == "date":
            return pa.date32(), False
        if lt == "time-micros":
            return pa.time64("us"), False
        if lt in ("timestamp-micros", "timestamp-millis"):
            # canonicalized to UTC µs (reference: moonlink_type.rs's
            # TimeStampTz contract); -millis decodes scaled ×1000
            return pa.timestamp("us", tz="UTC"), False
        if lt == "local-timestamp-micros":
            return pa.timestamp("us"), False
    simple = {"null": pa.null(), "boolean": pa.bool_(), "int": pa.int32(),
              "long": pa.int64(), "float": pa.float32(),
              "double": pa.float64(), "bytes": pa.binary(),
              "string": pa.string()}
    if t in simple:
        return simple[t], t == "null"
    if t == "array":
        item, _ = _arrow_type(s["items"])
        return pa.list_(item), False
    if t == "map":
        val, _ = _arrow_type(s["values"])
        return pa.map_(pa.string(), val), False
    if t == "enum":
        return pa.string(), False
    if t == "fixed":
        return pa.binary(s["size"]), False
    if t == "record":
        sub = [(f["name"],) + _arrow_type(f["type"]) for f in s["fields"]]
        return pa.struct([pa.field(n, ty, nullable=nl) for n, ty, nl in sub]), False
    if t == "union":
        others = [b for b in s["branches"] if b["type"] != "null"]
        if len(others) != 1 or len(others) == len(s["branches"]):
            # reference restriction: only [null, X] unions (:199-218)
            raise AvroSchemaError("only union [null, X] is supported")
        typ, _ = _arrow_type(others[0])
        return typ, True
    raise AvroSchemaError(f"unsupported avro type {t!r}")


# ---------------------------------------------------------------- binary


class _Reader:
    __slots__ = ("buf", "pos")

    def __init__(self, buf: bytes):
        self.buf = buf
        self.pos = 0

    def read(self, n: int) -> bytes:
        b = self.buf[self.pos:self.pos + n]
        if len(b) != n:
            raise AvroSchemaError("truncated avro datum")
        self.pos += n
        return b

    def long(self) -> int:
        shift, acc = 0, 0
        while True:
            b = self.buf[self.pos]
            self.pos += 1
            acc |= (b & 0x7F) << shift
            if not b & 0x80:
                break
            shift += 7
        return (acc >> 1) ^ -(acc & 1)  # zigzag


def _decode(r: _Reader, s) -> object:
    t = s["type"]
    lt = s.get("logicalType")
    if lt is not None:
        if lt == "decimal":
            raw = (r.read(s["size"]) if t == "fixed"
                   else r.read(r.long()))
            import decimal as _dec

            unscaled = int.from_bytes(raw, "big", signed=True)
            return _dec.Decimal(unscaled).scaleb(-s["scale"])
        if lt == "timestamp-millis":
            return r.long() * 1000  # → µs, matching the Arrow type
        # date / time-micros / timestamp-micros / local-…: the raw
        # int IS the Arrow storage value (days / µs)
        return r.long()
    if t == "null":
        return None
    if t == "boolean":
        return r.read(1) != b"\x00"
    if t in ("int", "long"):
        return r.long()
    if t == "float":
        return struct.unpack("<f", r.read(4))[0]
    if t == "double":
        return struct.unpack("<d", r.read(8))[0]
    if t == "bytes":
        return r.read(r.long())
    if t == "string":
        return r.read(r.long()).decode()
    if t == "record":
        return {f["name"]: _decode(r, f["type"]) for f in s["fields"]}
    if t == "enum":
        return s["symbols"][r.long()]
    if t == "fixed":
        return r.read(s["size"])
    if t == "union":
        return _decode(r, s["branches"][r.long()])
    if t == "array":
        out = []
        while True:
            n = r.long()
            if n == 0:
                return out
            if n < 0:  # block with byte size prefix
                n = -n
                r.long()
            out.extend(_decode(r, s["items"]) for _ in range(n))
    if t == "map":
        out = []
        while True:
            n = r.long()
            if n == 0:
                return out
            if n < 0:
                n = -n
                r.long()
            for _ in range(n):
                k = r.read(r.long()).decode()
                out.append((k, _decode(r, s["values"])))
    raise AvroSchemaError(f"unsupported avro type {t!r}")


def decode_avro(schema, datum: bytes):
    r = _Reader(datum)
    v = _decode(r, schema)
    if r.pos != len(datum):
        raise AvroSchemaError(f"{len(datum) - r.pos} trailing bytes")
    return v


# encoder — for tests and synthetic sources (the inverse subset)

def _zigzag(n: int) -> bytes:
    u = (n << 1) ^ (n >> 63) if n < 0 else n << 1
    out = bytearray()
    while True:
        b = u & 0x7F
        u >>= 7
        if u:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def encode_avro(schema, value) -> bytes:
    t = schema["type"]
    lt = schema.get("logicalType")
    if lt is not None:
        if lt == "decimal":
            import decimal as _dec

            unscaled = int(_dec.Decimal(value).scaleb(schema["scale"]))
            if t == "fixed":
                return unscaled.to_bytes(schema["size"], "big", signed=True)
            nbytes = max(1, (unscaled.bit_length() + 8) // 8)
            raw = unscaled.to_bytes(nbytes, "big", signed=True)
            return _zigzag(len(raw)) + raw
        if lt == "date" and not isinstance(value, int):
            import datetime as _dt

            value = (value - _dt.date(1970, 1, 1)).days
        elif lt in ("timestamp-millis", "timestamp-micros",
                    "local-timestamp-micros") and not isinstance(value, int):
            import datetime as _dt

            # naive datetimes are UTC wall time here (matching _decode
            # and the engine's canonicalization) — value.timestamp()
            # would interpret them in the HOST's local timezone
            epoch = (_dt.datetime(1970, 1, 1, tzinfo=_dt.timezone.utc)
                     if value.tzinfo else _dt.datetime(1970, 1, 1))
            us = round((value - epoch).total_seconds() * 1_000_000)
            value = us // 1000 if lt == "timestamp-millis" else us
        elif lt == "time-micros" and not isinstance(value, int):
            value = ((value.hour * 3600 + value.minute * 60
                      + value.second) * 1_000_000 + value.microsecond)
        return _zigzag(int(value))
    if t == "null":
        return b""
    if t == "boolean":
        return b"\x01" if value else b"\x00"
    if t in ("int", "long"):
        return _zigzag(int(value))
    if t == "float":
        return struct.pack("<f", value)
    if t == "double":
        return struct.pack("<d", value)
    if t == "bytes":
        return _zigzag(len(value)) + bytes(value)
    if t == "string":
        b = value.encode()
        return _zigzag(len(b)) + b
    if t == "record":
        return b"".join(encode_avro(f["type"], value[f["name"]])
                        for f in schema["fields"])
    if t == "enum":
        return _zigzag(schema["symbols"].index(value))
    if t == "fixed":
        assert len(value) == schema["size"]
        return bytes(value)
    if t == "union":
        for i, b in enumerate(schema["branches"]):
            if (value is None) == (b["type"] == "null"):
                return _zigzag(i) + encode_avro(b, value)
        raise AvroSchemaError("no union branch matches value")
    if t == "array":
        if not value:
            return _zigzag(0)
        return (_zigzag(len(value))
                + b"".join(encode_avro(schema["items"], v) for v in value)
                + _zigzag(0))
    if t == "map":
        items = list(value.items()) if isinstance(value, dict) else list(value)
        if not items:
            return _zigzag(0)
        out = [_zigzag(len(items))]
        for k, v in items:
            kb = k.encode()
            out.append(_zigzag(len(kb)) + kb + encode_avro(schema["values"], v))
        out.append(_zigzag(0))
        return b"".join(out)
    raise AvroSchemaError(f"unsupported avro type {t!r}")


# ---------------------------------------------------------------- stage


class AvroToRows:
    """map_batches stage: binary Avro datums → typed Arrow columns.
    Schema parsed once per actor (pass the JSON string so Ray serializes
    cheaply); extra ``keep_cols`` pass through unchanged."""

    def __init__(self, schema_json: str, payload_col: str = "value",
                 keep_cols: tuple[str, ...] = ()):
        self.schema = parse_avro_schema(schema_json)
        self.arrow_schema = avro_to_arrow_schema(self.schema)
        self.payload_col = payload_col
        self.keep_cols = keep_cols

    def __call__(self, batch: pa.Table) -> pa.Table:
        records = [decode_avro(self.schema, d)
                   for d in batch[self.payload_col].to_pylist()]
        cols = {}
        for c in self.keep_cols:
            cols[c] = batch[c]
        for f in self.arrow_schema:
            cols[f.name] = pa.array([r.get(f.name) for r in records], f.type)
        return pa.table(cols)
