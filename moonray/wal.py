"""Event-level ingest WAL — durable buffering of individual ingest
events BETWEEN table commits (reference: WalManager,
src/moonlink/src/storage/wal.rs:423-444 — numbered flushed WAL files +
an in-mem buffer, truncated once an Iceberg snapshot covers their LSNs;
recovery replays surviving files, wal.rs:670-760).

moonray's commits are batch-atomic: a change Dataset merges and commits
as one manifest version. Without a WAL, rows POSTed to the HTTP
``/ingest`` path that have been ack'd but not yet folded into a merge
die with the service process. EventWal closes that window:

  1. every buffered ingest event is appended as its own NUMBERED file
     (``wal/00000001.json`` …) and fsync'd BEFORE the HTTP ack — an
     ack'd event survives any crash;
  2. a fold (explicit flush, size trigger, or service restart) replays
     all pending events in file order into ONE merge job whose job_id
     derives from the covered seq range — merge_into is idempotent per
     job_id, so a crash between commit and truncate re-folds into the
     SAME committed version instead of duplicating rows;
  3. after the commit the covered files are deleted (WAL truncation,
     the files_to_delete half of the reference's PersistAndTruncate).

One EventWal per table root, single-writer (the service's write lock —
the same single-TableHandler assumption the reference makes).
"""

from __future__ import annotations

import base64
import json
import os

_WAL_DIR = "wal"


def _enc(o):
    """JSON hook: binary column values (image/audio payloads) round-trip
    through the WAL as {"__b64__": ...} envelopes."""
    if isinstance(o, (bytes, bytearray)):
        return {"__b64__": base64.b64encode(bytes(o)).decode()}
    raise TypeError(f"not JSON-serializable: {type(o).__name__}")


def _dec(obj):
    if set(obj) == {"__b64__"}:
        return base64.b64decode(obj["__b64__"])
    return obj


class EventWal:
    """Numbered durable event files under ``<table_root>/wal/``."""

    def __init__(self, table_root: str):
        self.dir = os.path.join(table_root, _WAL_DIR)
        os.makedirs(self.dir, exist_ok=True)
        self._next = 1 + max((int(f.split(".")[0])
                              for f in os.listdir(self.dir)
                              if f.endswith(".json")), default=0)

    def _path(self, seq: int) -> str:
        return os.path.join(self.dir, f"{seq:08d}.json")

    def append(self, event: dict) -> int:
        """Durably append one event; returns its seq. The event is
        fsync'd (file AND directory entry) before this returns — the
        caller may ack only after."""
        seq = self._next
        self._next += 1
        tmp = self._path(seq) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(event, f, default=_enc)
            f.flush()
            os.fsync(f.fileno())
        os.rename(tmp, self._path(seq))
        dfd = os.open(self.dir, os.O_RDONLY)
        try:
            os.fsync(dfd)
        finally:
            os.close(dfd)
        return seq

    def pending(self) -> list[tuple[int, dict]]:
        """All durable events in seq order (crash-leftover ``.tmp``
        files — events never ack'd — are ignored and swept)."""
        out = []
        for f in sorted(os.listdir(self.dir)):
            p = os.path.join(self.dir, f)
            if f.endswith(".tmp"):
                os.unlink(p)
                continue
            if not f.endswith(".json"):
                continue
            with open(p) as fh:
                out.append((int(f.split(".")[0]),
                            json.load(fh, object_hook=_dec)))
        return out

    def truncate_through(self, seq: int) -> int:
        """Delete all event files with seq ≤ ``seq``; returns count."""
        n = 0
        for f in sorted(os.listdir(self.dir)):
            if f.endswith(".json") and int(f.split(".")[0]) <= seq:
                os.unlink(os.path.join(self.dir, f))
                n += 1
        return n

    def __len__(self) -> int:
        return sum(1 for f in os.listdir(self.dir) if f.endswith(".json"))
