"""Avro Object Container Files over the pure-Python wire codec.

Iceberg manifest lists and manifest files are Avro OCF files; this
module adds the container framing (public Avro 1.x spec: ``Obj\\x01``
magic, file-metadata map with ``avro.schema``/``avro.codec``, 16-byte
sync marker, then blocks of ``count, byte-size, records..., sync``)
on top of the r2 binary codec in ``moonray/sources/avro_ingest.py``.

The written ``avro.schema`` metadata is the caller's ORIGINAL JSON
text, so Iceberg-required attributes like ``field-id`` reach external
readers verbatim (the binary codec ignores unknown attributes).
"""

from __future__ import annotations

import io
import json
import os
import struct

from moonray.sources.avro_ingest import (_Reader, _zigzag, decode_avro,
                                         encode_avro, parse_avro_schema)

_MAGIC = b"Obj\x01"


def write_ocf(path: str, schema_json: str, records: list[dict],
              metadata: dict[str, str] | None = None,
              sync: bytes | None = None) -> int:
    """Write records as a single-block OCF file; returns file length."""
    schema = parse_avro_schema(schema_json)
    meta = {"avro.schema": schema_json, "avro.codec": "null",
            **(metadata or {})}
    if sync is None:
        sync = os.urandom(16)
    out = io.BytesIO()
    out.write(_MAGIC)
    out.write(_zigzag(len(meta)))
    for k, v in meta.items():
        kb, vb = k.encode(), v.encode()
        out.write(_zigzag(len(kb)) + kb + _zigzag(len(vb)) + vb)
    out.write(_zigzag(0))
    out.write(sync)
    if records:
        body = b"".join(encode_avro(schema, r) for r in records)
        out.write(_zigzag(len(records)) + _zigzag(len(body)) + body)
        out.write(sync)
    data = out.getvalue()
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)
    return len(data)


def read_ocf(path: str) -> tuple[str, dict[str, str], list[dict]]:
    """→ (schema JSON text, file metadata, decoded records)."""
    with open(path, "rb") as f:
        buf = f.read()
    if buf[:4] != _MAGIC:
        raise ValueError("bad avro OCF magic")
    r = _Reader(buf)
    r.pos = 4
    meta: dict[str, str] = {}
    while True:
        n = r.long()
        if n == 0:
            break
        if n < 0:
            n = -n
            r.long()  # block byte size
        for _ in range(n):
            k = r.read(r.long()).decode()
            meta[k] = r.read(r.long()).decode()
    if meta.get("avro.codec", "null") != "null":
        raise ValueError(f"unsupported OCF codec {meta['avro.codec']!r}")
    sync = r.read(16)
    schema_json = meta["avro.schema"]
    schema = parse_avro_schema(schema_json)
    records: list[dict] = []
    while r.pos < len(buf):
        count = r.long()
        size = r.long()
        block = r.read(size)
        br = _Reader(block)
        for _ in range(count):
            start = br.pos
            rec = _decode_one(br, schema)
            records.append(rec)
            if br.pos == start:
                raise ValueError("zero-length avro record")
        if r.read(16) != sync:
            raise ValueError("OCF sync marker mismatch")
    return schema_json, meta, records


def _decode_one(r: _Reader, schema) -> dict:
    from moonray.sources.avro_ingest import _decode

    return _decode(r, schema)


def decode_one(schema_json: str, datum: bytes):
    return decode_avro(parse_avro_schema(schema_json), datum)


def to_json_compat(v):
    """Decoded record → plain JSON-compatible (maps decode as
    key/value pair lists; bytes pass through)."""
    if isinstance(v, list) and v and isinstance(v[0], tuple):
        return {k: to_json_compat(x) for k, x in v}
    if isinstance(v, list):
        return [to_json_compat(x) for x in v]
    if isinstance(v, dict):
        return {k: to_json_compat(x) for k, x in v.items()}
    return v


__all__ = ["write_ocf", "read_ocf", "decode_one", "to_json_compat"]
