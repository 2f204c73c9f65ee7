"""File-tailing CDC replication source — the reference's Postgres
logical-replication connector interface with a file as the wire.

The reference consumes pgoutput over a replication socket
(src/moonlink_connectors/src/pg_replicate/postgres_source.rs) and
converts messages to a CdcEvent stream `Begin | Commit | Insert |
Update | Delete | Relation | Type | PrimaryKeepAlive`
(conversions/cdc_event.rs:194-206), which moonlink_sink.rs folds into
table writes (update = delete + append). External network sources are
out of scope for this environment, so this module speaks the SAME
event grammar from an append-only JSONL file ("the wire"), preserving
the properties that matter:

- **Relation framing**: a `relation` event declares a source table's
  id, column names/types and key columns before any DML for it
  (RelationBody); `type` events are accepted and recorded.
- **Transaction framing**: DML arrives between `begin(xid)` and
  `commit(xid, end_lsn)`; only COMMITTED transactions are emitted —
  a trailing uncommitted tx stays buffered until its commit appears
  (the reference likewise acks only up to commit LSN).
- **LSN order**: transactions are emitted in commit order; each row
  carries its event LSN into the merge, so last-writer-wins
  tie-breaking matches the reference's ordering rules.
- **Update decomposition**: update → delete(old key) + append(new row)
  when the key changed, else a single upsert row — exactly
  moonlink_sink.rs's delete_if_exists + append.
- **Torn tails**: a half-written last line (a crash mid-append on the
  producer side) is left in the file until completed; `poll()` only
  consumes through the last newline.
- **Replay safety**: `apply()` derives the merge job_id from
  (xid, end_lsn, table), and merge_into is idempotent per job_id — a
  consumer crash between apply and offset persistence re-applies into
  the SAME committed version instead of duplicating.

Event lines (one JSON object per line):

    {"event":"relation","rel_id":1,"table":"customer",
     "columns":[["c_custkey","int64"],["c_name","string"]],
     "key_cols":["c_custkey"]}
    {"event":"begin","xid":7,"final_lsn":1042}
    {"event":"insert","rel_id":1,"values":[5,"n5"],"lsn":1040}
    {"event":"update","rel_id":1,"old_values":[5,"n5"],
     "values":[5,"n5b"],"lsn":1041}
    {"event":"delete","rel_id":1,"values":[5,null],"lsn":1042}
    {"event":"commit","xid":7,"end_lsn":1042}
    {"event":"keepalive","wal_end":1042}
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field

import pyarrow as pa

_TYPES = {
    "string": pa.string(), "int32": pa.int32(), "int64": pa.int64(),
    "float32": pa.float32(), "float64": pa.float64(),
    "binary": pa.binary(), "bool": pa.bool_(),
    "double": pa.float64(), "float": pa.float32(), "utf8": pa.string(),
}


class CdcProtocolError(ValueError):
    pass


@dataclass
class Relation:
    rel_id: int
    table: str
    columns: list[tuple[str, str]]
    key_cols: list[str]

    @property
    def schema(self) -> pa.Schema:
        return pa.schema([(n, _TYPES[t]) for n, t in self.columns])


@dataclass
class CommittedTx:
    """One committed transaction: per-table change rows in event order.
    ``changes[table]`` is a list of (op_char, lsn, values_list)."""

    xid: int
    end_lsn: int
    changes: dict[str, list[tuple[str, int, list]]] = field(
        default_factory=dict)

    def change_table(self, rel: Relation) -> pa.Table:
        """The merge-ready Arrow change set for one table: op, lsn,
        then the relation's columns (positional values)."""
        rows = self.changes.get(rel.table, [])
        cols: dict = {
            "op": pa.array([r[0] for r in rows], pa.string()),
            "lsn": pa.array([r[1] for r in rows], pa.int64()),
        }
        for i, (name, typ) in enumerate(rel.columns):
            cols[name] = pa.array(
                [r[2][i] if i < len(r[2]) else None for r in rows],
                _TYPES[typ])
        return pa.table(cols)


class CdcTail:
    """Incremental reader over the replication file. Stateless w.r.t.
    the consumer's tables: it parses, frames and orders; `apply` (or
    the caller) folds the committed transactions into tables."""

    def __init__(self, path: str):
        self.path = path
        self.offset = 0                      # byte offset of consumed prefix
        self.relations: dict[int, Relation] = {}
        self._open_tx: dict[int, CommittedTx] = {}   # xid → building tx

    def _key_changed(self, rel: Relation, old: list | None,
                     new: list) -> bool:
        if old is None:
            return False
        idx = [i for i, (n, _t) in enumerate(rel.columns)
               if n in rel.key_cols]
        return any(old[i] != new[i] for i in idx)

    def poll(self) -> list[CommittedTx]:
        """Consume newly appended COMPLETE lines; return the
        transactions whose commit arrived, in commit order."""
        if not os.path.exists(self.path):
            return []
        with open(self.path, "rb") as f:
            f.seek(self.offset)
            buf = f.read()
        # only consume through the last newline (torn tail stays)
        cut = buf.rfind(b"\n")
        if cut < 0:
            return []
        chunk, self.offset = buf[:cut + 1], self.offset + cut + 1
        return self.consume_lines(chunk.splitlines())

    def consume_lines(self, lines) -> list[CommittedTx]:
        """JSONL entry point: parse complete event lines (bytes or
        str) and delegate to consume_events."""
        return self.consume_events(
            json.loads(ln) for ln in lines if ln.strip())

    def consume_events(self, events) -> list[CommittedTx]:
        """The wire-agnostic framing core: feed event dicts, get back
        the transactions whose commit arrived, in commit order. All
        three wires speak this grammar — the JSONL file tail, the TCP
        JSON stream (sources/cdc_socket.py) and the pgoutput binary
        codec (sources/pgoutput.py)."""
        done: list[CommittedTx] = []
        for ev in events:
            kind = ev.get("event")
            if kind == "relation":
                self.relations[int(ev["rel_id"])] = Relation(
                    rel_id=int(ev["rel_id"]), table=ev["table"],
                    columns=[tuple(c) for c in ev["columns"]],
                    key_cols=list(ev["key_cols"]))
            elif kind == "type":
                continue                      # accepted, nothing to map
            elif kind == "keepalive":
                continue
            elif kind == "begin":
                xid = int(ev["xid"])
                if xid in self._open_tx:
                    raise CdcProtocolError(f"begin for open xid {xid}")
                self._open_tx[xid] = CommittedTx(xid=xid, end_lsn=-1)
            elif kind in ("insert", "update", "delete"):
                xid = int(ev.get("xid", 0)) or self._sole_open_xid()
                tx = self._open_tx.get(xid)
                if tx is None:
                    raise CdcProtocolError(f"{kind} outside a transaction")
                rel = self.relations.get(int(ev["rel_id"]))
                if rel is None:
                    raise CdcProtocolError(
                        f"{kind} for undeclared rel_id {ev['rel_id']}")
                rows = tx.changes.setdefault(rel.table, [])
                lsn = int(ev["lsn"])
                vals = list(ev["values"])
                if kind == "insert":
                    rows.append(("I", lsn, vals))
                elif kind == "delete":
                    rows.append(("D", lsn, vals))
                else:
                    old = ev.get("old_values")
                    if self._key_changed(rel, old, vals):
                        # key update = delete old key + insert new row
                        # (moonlink_sink.rs decomposition); the delete
                        # orders strictly before the insert at lsn
                        rows.append(("D", lsn, list(old)))
                        rows.append(("I", lsn, vals))
                    else:
                        rows.append(("U", lsn, vals))
            elif kind == "commit":
                xid = int(ev["xid"])
                tx = self._open_tx.pop(xid, None)
                if tx is None:
                    raise CdcProtocolError(f"commit for unknown xid {xid}")
                tx.end_lsn = int(ev["end_lsn"])
                done.append(tx)
            else:
                raise CdcProtocolError(f"unknown replication event {kind!r}")
        return done

    def _sole_open_xid(self) -> int:
        if len(self._open_tx) != 1:
            raise CdcProtocolError(
                "DML without xid requires exactly one open transaction")
        return next(iter(self._open_tx))

    # ------------------------------------------------ apply to tables
    def apply(self, tx: CommittedTx, tables: dict[str, object]) -> dict:
        """Fold one committed transaction into the destination
        MoonrayTables. Returns {table: version}. Idempotent: job_id is
        (xid, end_lsn, table)-derived, so re-applying after a consumer
        crash lands in the same committed version."""
        import ray.data as rd

        out = {}
        rels = {r.table: r for r in self.relations.values()}
        for name in tx.changes:
            t = tables.get(name)
            if t is None:
                continue                      # not subscribed
            changes = tx.change_table(rels[name])
            out[name] = t.merge(
                rd.from_arrow(changes),
                job_id=f"cdc-x{tx.xid}-l{tx.end_lsn}-{name}")
        return out

    def run_until_idle(self, tables: dict[str, object]) -> dict:
        """Drain everything currently committed in the file into the
        tables (the poll loop body a long-running consumer would run on
        a timer / inotify)."""
        applied: dict = {}
        for tx in self.poll():
            applied.update(self.apply(tx, tables))
        return applied


def write_events(path: str, events: list[dict]) -> None:
    """Producer-side helper (tests/fixtures): append events as JSONL."""
    with open(path, "a") as f:
        for ev in events:
            f.write(json.dumps(ev) + "\n")
        f.flush()
        os.fsync(f.fileno())


def replicate_follow(wire: str, tables: dict[str, object],
                     state_path: str, *, poll_interval: float = 1.0,
                     idle_exit: int | None = None,
                     stop=None) -> dict:
    """Continuous replication daemon: drain → checkpoint → sleep →
    repeat (the reference's long-running pg_replicate consumer loop,
    driven by file growth instead of a socket). Each cycle IS
    ``replicate_once`` — same durable offset checkpoint, same
    exactly-once merge job ids — so killing the daemon at any point
    and restarting (follow or once) resumes losslessly.

    Exit: when ``stop()`` returns true (checked every cycle), or after
    ``idle_exit`` consecutive drains that applied nothing (None = run
    forever). Returns cumulative {table: rows_applied}."""
    import time as _time

    total: dict[str, int] = {}
    idle = 0
    while True:
        if stop is not None and stop():
            break
        applied = replicate_once(wire, tables, state_path)
        if applied:
            idle = 0
            for k, v in applied.items():
                total[k] = total.get(k, 0) + v
        else:
            idle += 1
            if idle_exit is not None and idle >= idle_exit:
                break
        if stop is not None and stop():
            break
        _time.sleep(poll_interval)
    return total


def replicate_once(wire: str, tables: dict[str, object],
                   state_path: str) -> dict:
    """One drain cycle of a durable replication consumer: resume the
    tail at the checkpointed byte offset (with its relation registry —
    relation events BEFORE the offset are not re-readable), fold every
    newly committed transaction into the destination tables, then
    atomically persist the new position. Crash anywhere → the next run
    re-polls from the last persisted offset and the (xid, end_lsn,
    table)-derived merge job ids land in the SAME committed versions
    (exactly-once effect from at-least-once delivery — the reference's
    confirmed-flush-LSN acking, wal.rs/postgres_source.rs, as a file
    checkpoint)."""
    tail = CdcTail(wire)
    if os.path.exists(state_path):
        with open(state_path) as f:
            st = json.load(f)
        tail.offset = int(st["offset"])
        for r in st["relations"]:
            tail.relations[int(r["rel_id"])] = Relation(
                rel_id=int(r["rel_id"]), table=r["table"],
                columns=[tuple(c) for c in r["columns"]],
                key_cols=list(r["key_cols"]))
    applied = tail.run_until_idle(tables)
    tmp = state_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"offset": tail.offset, "relations": [
            {"rel_id": r.rel_id, "table": r.table,
             "columns": [list(c) for c in r.columns],
             "key_cols": r.key_cols}
            for r in tail.relations.values()]}, f)
    os.replace(tmp, state_path)
    return applied
