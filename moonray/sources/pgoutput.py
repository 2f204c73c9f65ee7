"""pgoutput binary replication codec — the actual Postgres logical
replication message set, encoded/decoded byte-for-byte per the
published protocol (PostgreSQL docs, "Logical Streaming Replication
Protocol" + "Logical Replication Message Formats", protocol version 1;
the format the reference's connector consumes in
src/moonlink_connectors/src/pg_replicate/postgres_source.rs:765 LoC
and clients/postgres.rs).

Three layers, exactly as on a real replication socket:

1. **CopyData framing**: every replication payload rides a CopyData
   message — byte ``'d'`` + Int32 length (length covers itself, not
   the type byte). A torn trailing frame stays buffered — the binary
   wire keeps the JSONL wire's torn-tail crash property.
2. **Envelopes**: XLogData ``'w'`` (start/end LSN + send time +
   payload), PrimaryKeepalive ``'k'`` (wal_end + send time + reply
   bit), and client→server StandbyStatusUpdate ``'r'`` (write/flush/
   apply LSNs + send time + reply bit).
3. **pgoutput messages**: Begin ``'B'``, Commit ``'C'``, Relation
   ``'R'``, Type ``'Y'``, Insert ``'I'``, Update ``'U'`` (with
   optional ``'K'``/``'O'`` old tuple), Delete ``'D'``; TupleData in
   text format (``'n'`` null / ``'u'`` unchanged-toast / ``'t'`` +
   length + text).

The codec converts between these bytes and the engine's event-dict
grammar (sources/cdc_tail.py docstring), so ``CdcTail.consume_events``
is the shared framing core for the JSONL wire, the TCP JSON wire and
this binary wire. Values use Postgres text format (ints/floats as
text, bool ``t``/``f``, bytea ``\\x`` hex), typed back through the
Relation message's column OIDs.
"""

from __future__ import annotations

import struct

from moonray.sources.cdc_tail import CdcProtocolError

# our type names ↔ Postgres type OIDs (pg_type.dat, public constants)
_OID_OF = {"int64": 20, "int32": 23, "string": 25, "utf8": 25,
           "float32": 700, "float": 700, "float64": 701, "double": 701,
           "bool": 16, "binary": 17}
_TYPE_OF_OID = {20: "int64", 23: "int32", 25: "string", 700: "float32",
                701: "float64", 16: "bool", 17: "binary"}


def _cstr(s: str) -> bytes:
    return s.encode() + b"\x00"


def _read_cstr(b: bytes, off: int) -> tuple[str, int]:
    end = b.index(b"\x00", off)
    return b[off:end].decode(), end + 1


def _text_of(v, typ: str) -> bytes:
    """Postgres text-format output for one value."""
    if typ == "bool":
        return b"t" if v else b"f"
    if typ == "binary":
        return b"\\x" + bytes(v).hex().encode()
    if typ in ("float32", "float64", "float", "double"):
        return repr(float(v)).encode()
    return str(v).encode()


def _value_of(b: bytes, typ: str):
    """Inverse of _text_of, typed by the relation column."""
    if typ == "bool":
        return b == b"t"
    if typ == "binary":
        if not b.startswith(b"\\x"):
            raise CdcProtocolError(f"bytea text format expected, got {b!r}")
        return bytes.fromhex(b[2:].decode())
    if typ in ("int32", "int64"):
        return int(b)
    if typ in ("float32", "float64", "float", "double"):
        return float(b)
    return b.decode()


def _tuple_data(values: list, types: list[str]) -> bytes:
    out = [struct.pack(">H", len(values))]
    for v, t in zip(values, types):
        if v is None:
            out.append(b"n")
        else:
            txt = _text_of(v, t)
            out.append(b"t" + struct.pack(">I", len(txt)) + txt)
    return b"".join(out)


def _read_tuple(b: bytes, off: int,
                types: list[str]) -> tuple[list, list[int], int]:
    """→ (values, positions of 'u' unchanged-toast columns, new off).
    'u' slots come back as None placeholders — the CALLER must
    substitute the old-tuple value (they are NOT nulls; treating them
    as nulls silently wipes TOASTed columns on update)."""
    (n,) = struct.unpack_from(">H", b, off)
    off += 2
    vals: list = []
    unchanged: list[int] = []
    for i in range(n):
        kind = b[off:off + 1]
        off += 1
        if kind == b"n":
            vals.append(None)
            continue
        if kind == b"u":                       # unchanged TOAST
            vals.append(None)
            unchanged.append(i)
            continue
        if kind != b"t":
            raise CdcProtocolError(f"unknown tuple column kind {kind!r}")
        (ln,) = struct.unpack_from(">I", b, off)
        off += 4
        vals.append(_value_of(b[off:off + ln], types[i]))
        off += ln
    return vals, unchanged, off


# ---------------------------------------------------------- messages


def encode_message(ev: dict, relations: dict[int, dict]) -> bytes:
    """One pgoutput message from an event dict. ``relations`` maps
    rel_id → its relation event (for tuple column types); the caller
    must have routed that event through here first, exactly like a
    real publisher sends Relation before DML."""
    kind = ev["event"]
    if kind == "relation":
        rid = int(ev["rel_id"])
        relations[rid] = ev
        keys = set(ev["key_cols"])
        cols = [(n, t) for n, t in (tuple(c) for c in ev["columns"])]
        body = [b"R", struct.pack(">I", rid), _cstr("public"),
                _cstr(ev["table"]), b"\x64",       # replica identity 'd'
                struct.pack(">H", len(cols))]
        for n, t in cols:
            oid = _OID_OF.get(t)
            if oid is None:
                raise CdcProtocolError(f"no pg OID for type {t!r}")
            body.append(struct.pack(">B", 1 if n in keys else 0))
            body.append(_cstr(n))
            body.append(struct.pack(">Ii", oid, -1))
        return b"".join(body)
    if kind == "type":
        return b"Y" + struct.pack(">I", int(ev.get("oid", 0))) \
            + _cstr("public") + _cstr(ev.get("name", ""))
    if kind == "begin":
        return b"B" + struct.pack(">QqI", int(ev.get("final_lsn", 0)),
                                  0, int(ev["xid"]))
    if kind == "commit":
        # pgoutput v1 Commit carries NO xid: messages correlate with
        # the preceding Begin (one in-flight tx per stream) — the
        # decoder re-stamps it, keeping the bytes spec-exact
        end = int(ev["end_lsn"])
        return b"C" + struct.pack(">BQQq", 0, end, end, 0)
    if kind in ("insert", "update", "delete"):
        rid = int(ev["rel_id"])
        rel = relations.get(rid)
        if rel is None:
            raise CdcProtocolError(
                f"{kind} for undeclared rel_id {rid} (Relation must "
                "precede DML on the wire)")
        types = [t for _n, t in (tuple(c) for c in rel["columns"])]
        if kind == "insert":
            return b"I" + struct.pack(">I", rid) + b"N" \
                + _tuple_data(list(ev["values"]), types)
        if kind == "delete":
            return b"D" + struct.pack(">I", rid) + b"O" \
                + _tuple_data(list(ev["values"]), types)
        out = [b"U", struct.pack(">I", rid)]
        old = ev.get("old_values")
        if old is not None:
            out.append(b"O")
            out.append(_tuple_data(list(old), types))
        out.append(b"N")
        out.append(_tuple_data(list(ev["values"]), types))
        return b"".join(out)
    raise CdcProtocolError(f"cannot encode event {kind!r}")


def decode_message(b: bytes, lsn: int,
                   relations: dict[int, dict]) -> dict:
    """One pgoutput message → the event dict the engine grammar uses.
    ``lsn`` is the enclosing XLogData start LSN (DML events carry it)."""
    tag = b[:1]
    if tag == b"R":
        (rid,) = struct.unpack_from(">I", b, 1)
        off = 5
        _ns, off = _read_cstr(b, off)
        table, off = _read_cstr(b, off)
        off += 1                               # replica identity byte
        (ncols,) = struct.unpack_from(">H", b, off)
        off += 2
        cols, keys = [], []
        for _ in range(ncols):
            flags = b[off]
            off += 1
            name, off = _read_cstr(b, off)
            (oid, _mod) = struct.unpack_from(">Ii", b, off)
            off += 8
            typ = _TYPE_OF_OID.get(oid)
            if typ is None:
                raise CdcProtocolError(f"unmapped pg type OID {oid}")
            cols.append([name, typ])
            if flags & 1:
                keys.append(name)
        ev = {"event": "relation", "rel_id": rid, "table": table,
              "columns": cols, "key_cols": keys}
        relations[rid] = ev
        return ev
    if tag == b"Y":
        (oid,) = struct.unpack_from(">I", b, 1)
        off = 5
        _ns, off = _read_cstr(b, off)
        name, _off = _read_cstr(b, off)
        return {"event": "type", "oid": oid, "name": name}
    if tag == b"B":
        final_lsn, _ts, xid = struct.unpack_from(">QqI", b, 1)
        ev = {"event": "begin", "xid": xid}
        if final_lsn:
            ev["final_lsn"] = final_lsn
        return ev
    if tag == b"C":
        _flags, _clsn, end, _ts = struct.unpack_from(">BQQq", b, 1)
        return {"event": "commit", "end_lsn": end}
    if tag in (b"I", b"U", b"D"):
        (rid,) = struct.unpack_from(">I", b, 1)
        rel = relations.get(rid)
        if rel is None:
            raise CdcProtocolError(f"DML for undeclared rel_id {rid}")
        types = [t for _n, t in rel["columns"]]
        off = 5
        if tag == b"I":
            if b[off:off + 1] != b"N":
                raise CdcProtocolError("insert without new tuple")
            vals, unchanged, _ = _read_tuple(b, off + 1, types)
            if unchanged:
                raise CdcProtocolError(
                    "insert tuple carries unchanged-toast columns")
            return {"event": "insert", "rel_id": rid, "values": vals,
                    "lsn": lsn}
        if tag == b"D":
            if b[off:off + 1] not in (b"K", b"O"):
                raise CdcProtocolError("delete without key/old tuple")
            vals, _unchanged, _ = _read_tuple(b, off + 1, types)
            return {"event": "delete", "rel_id": rid, "values": vals,
                    "lsn": lsn}
        old = None
        marker = b[off:off + 1]
        if marker in (b"K", b"O"):
            old, _ou, off = _read_tuple(b, off + 1, types)
            marker = b[off:off + 1]
        if marker != b"N":
            raise CdcProtocolError("update without new tuple")
        vals, unchanged, _ = _read_tuple(b, off + 1, types)
        if unchanged:
            # real walsenders send 'u' for unchanged TOASTed columns;
            # the stored value must be PRESERVED, which needs the old
            # tuple (REPLICA IDENTITY FULL) — refuse loudly rather
            # than fold 'u' into NULL and wipe the column on merge
            if old is None:
                raise CdcProtocolError(
                    "update carries unchanged-toast columns but no old "
                    "tuple — set REPLICA IDENTITY FULL on the source "
                    "table so unchanged values can be reconstructed")
            for i in unchanged:
                vals[i] = old[i]
        ev = {"event": "update", "rel_id": rid, "values": vals,
              "lsn": lsn}
        if old is not None:
            ev["old_values"] = old
        return ev
    raise CdcProtocolError(f"unknown pgoutput message tag {tag!r}")


# ------------------------------------------------- envelopes + frames


def _frame(payload: bytes) -> bytes:
    """CopyData: 'd' + Int32 length (length includes itself)."""
    return b"d" + struct.pack(">I", 4 + len(payload)) + payload


def xlogdata_frame(lsn: int, msg: bytes) -> bytes:
    return _frame(b"w" + struct.pack(">QQq", lsn, lsn, 0) + msg)


def keepalive_frame(wal_end: int, reply: bool) -> bytes:
    return _frame(b"k" + struct.pack(">Qq", wal_end, 0)
                  + (b"\x01" if reply else b"\x00"))


def status_update_frame(write: int, flush: int, apply: int,
                        reply: bool = False) -> bytes:
    return _frame(b"r" + struct.pack(">QQQq", write, flush, apply, 0)
                  + (b"\x01" if reply else b"\x00"))


class PgWireDecoder:
    """Incremental decoder: feed raw socket/file bytes, get back the
    engine's event dicts. CopyData frames are reassembled across
    feeds; a torn trailing frame stays buffered (crash safety).
    Emits ``{"event": "keepalive", "wal_end", "reply"}`` for 'k'
    envelopes and ``{"msg": "status_update", ...}`` for 'r' (the
    server side of the ack channel uses the same decoder)."""

    def __init__(self):
        self._buf = b""
        self.relations: dict[int, dict] = {}
        self._cur_xid: int | None = None       # Begin↔Commit correlation

    def feed(self, data: bytes) -> list[dict]:
        self._buf += data
        out = []
        while True:
            if len(self._buf) < 5:
                return out
            tag = self._buf[:1]
            if tag != b"d":
                raise CdcProtocolError(
                    f"expected CopyData frame, got {tag!r}")
            (ln,) = struct.unpack_from(">I", self._buf, 1)
            total = 1 + ln                      # type byte + length field
            if len(self._buf) < total:
                return out                      # torn frame → wait
            payload = self._buf[5:total]
            self._buf = self._buf[total:]
            out.append(self._envelope(payload))

    def _envelope(self, p: bytes) -> dict:
        kind = p[:1]
        if kind == b"w":
            start, _end, _ts = struct.unpack_from(">QQq", p, 1)
            ev = decode_message(p[25:], start, self.relations)
            # pgoutput correlates tx messages by stream order: stamp
            # the open Begin's xid onto its Commit for the grammar
            if ev["event"] == "begin":
                self._cur_xid = int(ev["xid"])
            elif ev["event"] == "commit":
                if self._cur_xid is None:
                    raise CdcProtocolError("Commit without open Begin")
                ev["xid"], self._cur_xid = self._cur_xid, None
            return ev
        if kind == b"k":
            wal_end, _ts = struct.unpack_from(">Qq", p, 1)
            return {"event": "keepalive", "wal_end": wal_end,
                    "reply": bool(p[17])}
        if kind == b"r":
            w, f, a, _ts = struct.unpack_from(">QQQq", p, 1)
            return {"msg": "status_update", "write_lsn": w,
                    "flush_lsn": f, "apply_lsn": a,
                    "reply": bool(p[33])}
        raise CdcProtocolError(f"unknown replication envelope {kind!r}")


class PgWireEncoder:
    """Event dicts → CopyData-framed replication bytes (the publisher
    half; stateful for Relation schemas, like a real walsender)."""

    def __init__(self):
        self.relations: dict[int, dict] = {}

    def encode(self, ev: dict) -> bytes:
        if ev.get("event") == "keepalive":
            return keepalive_frame(int(ev.get("wal_end", 0)),
                                   bool(ev.get("reply")))
        lsn = int(ev.get("lsn", ev.get("end_lsn", ev.get("final_lsn", 0))
                          or 0))
        return xlogdata_frame(lsn, encode_message(ev, self.relations))
