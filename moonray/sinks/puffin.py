"""Puffin files + Iceberg v3 deletion-vector blobs (pure Python/numpy).

Implements the three public formats the reference's Iceberg syncer
emits for deletion vectors (reference:
src/moonlink/src/storage/table/iceberg/deletion_vector.rs:80-145 —
``| len | magic 0xD1D33964 | roaring bitmap | crc32c |`` inside a
puffin file), from their public specs only:

- Puffin file format (Iceberg spec "Puffin file format"): ``PFA1``
  header magic, concatenated blobs, footer = magic + JSON payload +
  u32-LE payload size + u32 flags + magic.
- ``deletion-vector-v1`` blob: u32 big-endian length of (magic +
  vector), magic bytes ``D1 D3 39 64``, the vector as a portable
  64-bit roaring bitmap, u32 big-endian CRC-32C over (magic + vector).
- Portable roaring (RoaringFormatSpec): 64-bit = u64-LE bucket count
  then per bucket u32-LE high key + 32-bit portable bitmap; 32-bit =
  cookie 12346 (no run containers) + container count, descriptive
  header (u16 key, u16 cardinality-1), offset header, then sorted-u16
  array containers (card ≤ 4096) or 8 KiB bitset containers.

Everything round-trips: ``read_*`` validates magics and CRCs, so the
pytest replay checker exercises the same bytes an external Iceberg v3
reader would parse.
"""

from __future__ import annotations

import json
import struct

import numpy as np

PUFFIN_MAGIC = b"PFA1"
DV_MAGIC = bytes((0xD1, 0xD3, 0x39, 0x64))

_SERIAL_COOKIE_NO_RUN = 12346
_BITSET_THRESHOLD = 4096


# ------------------------------------------------------------- crc32c

def _crc32c_table() -> np.ndarray:
    poly = 0x82F63B78  # Castagnoli, reflected
    tbl = np.empty(256, dtype=np.uint64)
    for i in range(256):
        c = i
        for _ in range(8):
            c = (c >> 1) ^ poly if c & 1 else c >> 1
        tbl[i] = c
    return tbl


_CRC_TBL = _crc32c_table()


def crc32c(data: bytes) -> int:
    """Table-driven CRC-32C. DV blobs are small (KBs); the byte loop is
    fine — not a hot path."""
    crc = 0xFFFFFFFF
    tbl = _CRC_TBL
    for b in data:
        crc = int(tbl[(crc ^ b) & 0xFF]) ^ (crc >> 8)
    return crc ^ 0xFFFFFFFF


# ----------------------------------------------- portable roaring

def _serialize_roaring32(vals: np.ndarray) -> bytes:
    """``vals``: sorted unique uint32 → portable 32-bit roaring bytes."""
    hi = (vals >> 16).astype(np.uint16)
    lo = (vals & 0xFFFF).astype(np.uint16)
    keys, starts = np.unique(hi, return_index=True)
    bounds = np.append(starts, len(vals))
    n = len(keys)
    head = struct.pack("<II", _SERIAL_COOKIE_NO_RUN, n)
    desc = bytearray()
    payloads = []
    for i in range(n):
        seg = lo[bounds[i]:bounds[i + 1]]
        card = len(seg)
        desc += struct.pack("<HH", int(keys[i]), card - 1)
        if card <= _BITSET_THRESHOLD:
            payloads.append(seg.astype("<u2").tobytes())
        else:
            bits = np.zeros(1024, dtype=np.uint64)
            idx = seg.astype(np.uint32)
            np.bitwise_or.at(bits, idx >> 6,
                             np.uint64(1) << (idx & np.uint32(63)).astype(np.uint64))
            payloads.append(bits.astype("<u8").tobytes())
    # offset header: container start positions from the bitmap's byte 0
    off = len(head) + len(desc) + 4 * n
    offsets = bytearray()
    for p in payloads:
        offsets += struct.pack("<I", off)
        off += len(p)
    return head + bytes(desc) + bytes(offsets) + b"".join(payloads)


def _deserialize_roaring32(buf: bytes, pos: int) -> tuple[np.ndarray, int]:
    cookie, n = struct.unpack_from("<II", buf, pos)
    if cookie != _SERIAL_COOKIE_NO_RUN:
        raise ValueError(f"unsupported roaring cookie {cookie}")
    base = pos
    pos += 8
    keys = np.empty(n, dtype=np.uint32)
    cards = np.empty(n, dtype=np.int64)
    for i in range(n):
        k, cm1 = struct.unpack_from("<HH", buf, pos)
        keys[i], cards[i] = k, cm1 + 1
        pos += 4
    offsets = [struct.unpack_from("<I", buf, pos + 4 * i)[0]
               for i in range(n)]
    pos += 4 * n
    parts = []
    end = pos
    for i in range(n):
        p = base + offsets[i]
        card = int(cards[i])
        if card <= _BITSET_THRESHOLD:
            seg = np.frombuffer(buf, dtype="<u2", count=card, offset=p
                                ).astype(np.uint32)
            end = max(end, p + 2 * card)
        else:
            bits = np.frombuffer(buf, dtype="<u8", count=1024, offset=p)
            idx = np.flatnonzero(
                np.unpackbits(bits.view(np.uint8), bitorder="little"))
            seg = idx.astype(np.uint32)
            if len(seg) != card:
                raise ValueError("bitset cardinality mismatch")
            end = max(end, p + 8192)
        parts.append(seg | (np.uint32(keys[i]) << np.uint32(16)))
    out = (np.concatenate(parts) if parts
           else np.empty(0, dtype=np.uint32))
    return out, end


def serialize_roaring64(vals: np.ndarray) -> bytes:
    """Sorted-unique uint64 positions → portable 64-bit roaring."""
    vals = np.asarray(vals, dtype=np.uint64)
    hi32 = (vals >> np.uint64(32)).astype(np.uint32)
    lo32 = (vals & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    keys, starts = np.unique(hi32, return_index=True)
    bounds = np.append(starts, len(vals))
    out = [struct.pack("<Q", len(keys))]
    for i, k in enumerate(keys):
        out.append(struct.pack("<I", int(k)))
        out.append(_serialize_roaring32(lo32[bounds[i]:bounds[i + 1]]))
    return b"".join(out)


def deserialize_roaring64(buf: bytes) -> np.ndarray:
    (nb,) = struct.unpack_from("<Q", buf, 0)
    pos = 8
    parts = []
    for _ in range(nb):
        (hi,) = struct.unpack_from("<I", buf, pos)
        pos += 4
        lo, pos = _deserialize_roaring32(buf, pos)
        parts.append(lo.astype(np.uint64) | (np.uint64(hi) << np.uint64(32)))
    return (np.concatenate(parts) if parts
            else np.empty(0, dtype=np.uint64))


# ------------------------------------------------------ DV blob

def encode_dv_blob(positions: np.ndarray) -> bytes:
    """Deleted row positions (uint32/64, sorted unique) →
    ``deletion-vector-v1`` blob bytes."""
    bitmap = serialize_roaring64(np.asarray(positions, dtype=np.uint64))
    body = DV_MAGIC + bitmap
    return (struct.pack(">I", len(body)) + body
            + struct.pack(">I", crc32c(body)))


def decode_dv_blob(blob: bytes) -> np.ndarray:
    (length,) = struct.unpack_from(">I", blob, 0)
    body = blob[4:4 + length]
    if body[:4] != DV_MAGIC:
        raise ValueError("bad deletion-vector-v1 magic")
    (crc,) = struct.unpack_from(">I", blob, 4 + length)
    if crc != crc32c(body):
        raise ValueError("deletion-vector-v1 CRC mismatch")
    return deserialize_roaring64(body[4:])


# -------------------------------------------------------- puffin

def write_puffin(path: str, blobs: list[dict]) -> list[dict]:
    """``blobs``: [{"type", "bytes", ...footer extras...}]. Writes the
    puffin file and returns the footer blob descriptors (with offset/
    length filled in) for the caller's manifest entries."""
    descs = []
    with open(path, "wb") as f:
        f.write(PUFFIN_MAGIC)
        off = 4
        for b in blobs:
            data = b["bytes"]
            d = {k: v for k, v in b.items() if k != "bytes"}
            d.setdefault("fields", [])
            d["offset"] = off
            d["length"] = len(data)
            descs.append(d)
            f.write(data)
            off += len(data)
        payload = json.dumps({"blobs": descs, "properties":
                              {"created-by": "moonray"}}).encode()
        f.write(PUFFIN_MAGIC)
        f.write(payload)
        f.write(struct.pack("<I", len(payload)))
        f.write(struct.pack("<I", 0))  # flags: payload uncompressed
        f.write(PUFFIN_MAGIC)
    return descs


def read_puffin(path: str) -> tuple[list[dict], bytes]:
    """→ (footer blob descriptors, whole file bytes). Validates all
    three magics and the footer framing."""
    with open(path, "rb") as f:
        raw = f.read()
    if raw[:4] != PUFFIN_MAGIC or raw[-4:] != PUFFIN_MAGIC:
        raise ValueError("bad puffin magic")
    (size,) = struct.unpack_from("<I", raw, len(raw) - 12)
    (flags,) = struct.unpack_from("<I", raw, len(raw) - 8)
    if flags & 1:
        raise ValueError("compressed puffin footer unsupported")
    payload = raw[len(raw) - 12 - size:len(raw) - 12]
    if raw[len(raw) - 12 - size - 4:len(raw) - 12 - size] != PUFFIN_MAGIC:
        raise ValueError("bad puffin footer magic")
    return json.loads(payload.decode())["blobs"], raw


def apply_puffin_dv(table, puffin_path: str, offset: int, size: int):
    """Subtract one deletion-vector blob from a positionally-aligned
    table: read the puffin file, slice the blob at (offset, size),
    decode positions, drop those rows. The ONE place the blob framing
    meets row filtering — both Iceberg read paths (driver replay and
    the distributed datasource) call this, so a framing change can't
    drift between them."""
    import numpy as np
    import pyarrow as pa

    _, raw = read_puffin(puffin_path)
    dv = decode_dv_blob(raw[offset:offset + size])
    if not len(dv):
        return table
    keep = np.ones(table.num_rows, dtype=bool)
    keep[dv.astype(np.int64)] = False
    return table.filter(pa.array(keep))


# ---------------------------------------------- file-index blobs
#
# The reference commits each file index as a puffin blob alongside the
# DV puffins (iceberg_table_syncer.rs:47-52); its on-disk shape is the
# persisted bucket hash map of persisted_bucket_hash_map.rs — a bucket
# array indexed by the hash's UPPER bits plus packed entries carrying
# the LOWER hash bits for verification and the (file, row) location.
# moonray's blob mirrors that architecture over its own key hash
# (util.hash_key_array — splitmix64 for integer/temporal keys, the
# polars string hash lanes otherwise):
#
#   | MRIX1 | u8 k | 3B pad | u32 nfiles | u64 nentries |
#   | nfiles × (u32 len, utf8 path) |            exported data files
#   | (2^k + 1) × u64 bucket offsets |           bucket = hash >> (64-k)
#   | nentries × u32 hash_lo |                   low 32 hash bits
#   | nentries × u32 file_idx |
#   | nentries × u32 row_off |
#
# Entries are sorted by bucket; hash_lo verifies candidates before the
# (always mandatory) exact key-equality check against the fetched row.

INDEX_MAGIC = b"MRIX1"


def encode_index_blob(files: list[str], hashes: np.ndarray,
                      file_idx: np.ndarray, rows: np.ndarray,
                      k: int | None = None) -> bytes:
    n = len(hashes)
    if k is None:
        # ~4 entries per bucket on average, capped at 2^20 buckets
        k = max(1, min(20, int(n).bit_length() - 2)) if n else 1
    h = np.ascontiguousarray(hashes, dtype=np.uint64)
    bucket = (h >> np.uint64(64 - k)).astype(np.int64)
    order = np.argsort(bucket, kind="stable")
    bucket = bucket[order]
    h_lo = (h[order] & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    fi = np.ascontiguousarray(file_idx, dtype=np.uint32)[order]
    ro = np.ascontiguousarray(rows, dtype=np.uint32)[order]
    nbuckets = 1 << k
    counts = np.bincount(bucket, minlength=nbuckets)
    offsets = np.zeros(nbuckets + 1, dtype=np.uint64)
    np.cumsum(counts, out=offsets[1:])
    out = [INDEX_MAGIC, struct.pack("<B3x", k),
           struct.pack("<I", len(files)), struct.pack("<Q", n)]
    for p in files:
        pb = p.encode()
        out.append(struct.pack("<I", len(pb)))
        out.append(pb)
    out.append(offsets.astype("<u8").tobytes())
    out.append(h_lo.astype("<u4").tobytes())
    out.append(fi.astype("<u4").tobytes())
    out.append(ro.astype("<u4").tobytes())
    return b"".join(out)


def decode_index_blob(blob: bytes) -> dict:
    if blob[:5] != INDEX_MAGIC:
        raise ValueError("bad index blob magic")
    pos = 5
    (k,) = struct.unpack_from("<B3x", blob, pos); pos += 4
    (nfiles,) = struct.unpack_from("<I", blob, pos); pos += 4
    (n,) = struct.unpack_from("<Q", blob, pos); pos += 8
    files = []
    for _ in range(nfiles):
        (ln,) = struct.unpack_from("<I", blob, pos); pos += 4
        files.append(blob[pos:pos + ln].decode()); pos += ln
    nbuckets = 1 << k
    offsets = np.frombuffer(blob, "<u8", nbuckets + 1, pos)
    pos += 8 * (nbuckets + 1)
    h_lo = np.frombuffer(blob, "<u4", n, pos); pos += 4 * n
    fi = np.frombuffer(blob, "<u4", n, pos); pos += 4 * n
    ro = np.frombuffer(blob, "<u4", n, pos); pos += 4 * n
    return {"k": k, "files": files, "offsets": offsets,
            "h_lo": h_lo, "file_idx": fi, "rows": ro}


def index_blob_candidates(idx: dict, hashes: np.ndarray
                          ) -> list[list[tuple[str, int]]]:
    """Per query hash: the [(file, row), ...] candidate locations whose
    bucket + low-32 hash bits match (exact key verification is the
    caller's job — hash equality can never prove key equality)."""
    k = idx["k"]
    h = np.ascontiguousarray(hashes, dtype=np.uint64)
    buckets = (h >> np.uint64(64 - k)).astype(np.int64)
    los = (h & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    out = []
    for b, lo in zip(buckets, los):
        s, e = int(idx["offsets"][b]), int(idx["offsets"][b + 1])
        hits = np.flatnonzero(idx["h_lo"][s:e] == lo)
        out.append([(idx["files"][int(idx["file_idx"][s + i])],
                     int(idx["rows"][s + i])) for i in hits])
    return out
