"""TCP replication wire — the cdc_tail event grammar over a loopback
socket with the reference's keepalive/ack protocol shape.

The reference's connector speaks pgoutput over a replication socket
and acknowledges progress with StandbyStatusUpdate messages carrying
the confirmed-flush LSN; the server's PrimaryKeepAlive may request an
immediate reply, and a reconnecting client resumes from the slot's
confirmed_flush_lsn (postgres_source.rs:58-121,565-575 — event loop,
send_status_update). No Postgres exists in this sandbox, so this
module keeps that PROTOCOL shape over newline-delimited JSON events
(the same grammar sources/cdc_tail.py frames):

client → server  {"msg": "start_replication", "lsn": N}
server → client  relation/begin/dml/commit lines (txs with
                 end_lsn > N only), interleaved with
                 {"event": "keepalive", "wal_end": N, "reply": true}
client → server  {"msg": "status_update", "write_lsn": N,
                  "flush_lsn": N, "apply_lsn": N}

Delivery is at-least-once (crash between apply and ack → the tx
resends on reconnect); the consumer's merge job ids are
(xid, end_lsn, table)-derived so re-application is exactly-once in
effect — identical to the file wire's contract. Backpressure is the
transport's: the client applies each committed tx BEFORE reading
more, so a slow consumer fills the TCP window and the producer
blocks, never an unbounded client-side buffer.

``CdcWireServer`` is the test/fixture producer (a replication-slot
stand-in: it tracks confirmed_flush_lsn and replays from it);
``replicate_socket`` is the consumer — the socket twin of
cdc_tail.replicate_follow, same durable checkpoint file, lossless
kill/resume.
"""

from __future__ import annotations

import json
import os
import socket
import threading
import time

from moonray.sources.cdc_tail import CdcTail, Relation


def _load_state(state_path: str) -> tuple[int, list[dict]]:
    if not os.path.exists(state_path):
        return 0, []
    with open(state_path) as f:
        st = json.load(f)
    return int(st.get("flush_lsn", 0)), st.get("relations", [])


def _save_state(state_path: str, flush_lsn: int, tail: CdcTail) -> None:
    tmp = state_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"flush_lsn": flush_lsn, "relations": [
            {"rel_id": r.rel_id, "table": r.table,
             "columns": [list(c) for c in r.columns],
             "key_cols": r.key_cols}
            for r in tail.relations.values()]}, f)
    os.replace(tmp, state_path)


def replicate_socket(url: str, tables: dict[str, object], state_path: str,
                     *, stop=None, idle_exit: int | None = None,
                     recv_timeout: float = 0.5,
                     reconnect_delay: float = 0.2,
                     codec: str = "jsonl") -> dict:
    """Consume the replication stream at ``url`` (``tcp://host:port``)
    into the destination tables. Resumes from the checkpoint file's
    confirmed-flush LSN; acks after every applied commit; answers
    reply-requested keepalives; reconnects on drops. Exit when
    ``stop()`` is true or after ``idle_exit`` consecutive idle recv
    windows (None = run until stopped). Returns cumulative
    {table: rows_applied}.

    ``codec``: ``"jsonl"`` (newline JSON events) or ``"pgoutput"``
    (the real binary message set in CopyData frames with XLogData /
    keepalive envelopes and StandbyStatusUpdate acks — see
    sources/pgoutput.py). The JSON start_replication handshake line
    stands in for the START_REPLICATION command in both."""
    if not url.startswith("tcp://"):
        raise ValueError(f"socket wire url must be tcp://host:port, got {url!r}")
    if codec not in ("jsonl", "pgoutput"):
        raise ValueError(f"unknown wire codec {codec!r}")
    use_pg = codec == "pgoutput"
    if use_pg:
        from moonray.sources.pgoutput import (PgWireDecoder,
                                              status_update_frame)
    host, port_s = url[6:].rsplit(":", 1)
    port = int(port_s)
    flush_lsn, rels = _load_state(state_path)
    tail = CdcTail(path="")
    for r in rels:
        tail.relations[int(r["rel_id"])] = Relation(
            rel_id=int(r["rel_id"]), table=r["table"],
            columns=[tuple(c) for c in r["columns"]],
            key_cols=list(r["key_cols"]))
    total: dict[str, int] = {}
    idle = 0

    def _ack(sock, lsn: int) -> None:
        if use_pg:
            sock.sendall(status_update_frame(lsn, lsn, lsn))
        else:
            sock.sendall((json.dumps(
                {"msg": "status_update", "write_lsn": lsn,
                 "flush_lsn": lsn, "apply_lsn": lsn}) + "\n").encode())

    while not (stop is not None and stop()):
        try:
            sock = socket.create_connection((host, port), timeout=5.0)
        except OSError:
            if idle_exit is not None:
                idle += 1
                if idle >= idle_exit:
                    break
            time.sleep(reconnect_delay)
            continue
        try:
            sock.settimeout(recv_timeout)
            sock.sendall((json.dumps(
                {"msg": "start_replication", "lsn": flush_lsn,
                 "codec": codec}) + "\n").encode())
            buf = b""
            decoder = PgWireDecoder() if use_pg else None
            # a disconnect mid-transaction leaves the interrupted tx
            # open in the framing state; the server replays the whole
            # tx from the slot on reconnect, so stale opens must drop
            # or its Begin re-arrives as "begin for open xid"
            tail._open_tx.clear()
            while not (stop is not None and stop()):
                try:
                    data = sock.recv(65536)
                except socket.timeout:
                    idle += 1
                    if idle_exit is not None and idle >= idle_exit:
                        return total
                    _ack(sock, flush_lsn)   # idle heartbeat
                    continue
                if not data:
                    # server closed → reconnect; counts as an idle
                    # window so a server that refuses this client
                    # (e.g. codec mismatch) can't spin forever under
                    # idle_exit — any applied tx resets the counter
                    idle += 1
                    break
                stream, reply_wanted = [], False
                if use_pg:
                    # CopyData reassembly (torn frames stay buffered)
                    for ev in decoder.feed(data):
                        if ev.get("event") == "keepalive":
                            reply_wanted |= bool(ev.get("reply"))
                            continue
                        stream.append(ev)
                else:
                    buf += data
                    cut = buf.rfind(b"\n")
                    if cut < 0:
                        continue
                    lines, buf = buf[:cut].split(b"\n"), buf[cut + 1:]
                    for ln in lines:
                        if not ln.strip():
                            continue
                        ev = json.loads(ln)
                        if ev.get("event") == "keepalive":
                            reply_wanted |= bool(ev.get("reply"))
                            continue
                        stream.append(ev)
                for tx in tail.consume_events(stream):
                    if tx.end_lsn <= flush_lsn:
                        continue             # resend of an acked tx
                    idle = 0
                    applied = tail.apply(tx, tables)
                    for name in applied:
                        total[name] = total.get(name, 0) + sum(
                            len(rows) for t_name, rows
                            in tx.changes.items() if t_name == name)
                    # checkpoint BEFORE the ack: a crash between the
                    # two resends nothing (server keeps the tx until
                    # acked) and re-application is idempotent anyway
                    flush_lsn = tx.end_lsn
                    _save_state(state_path, flush_lsn, tail)
                    _ack(sock, flush_lsn)
                if reply_wanted:
                    _ack(sock, flush_lsn)
        finally:
            sock.close()
        if stop is not None and stop():
            break
        if idle_exit is not None and idle >= idle_exit:
            break
        time.sleep(reconnect_delay)
    return total


class CdcWireServer:
    """Loopback replication producer (test fixture / slot stand-in):
    serves one consumer at a time, replays the event log from the
    requested (or slot-confirmed) LSN, streams appended events live,
    emits reply-requested keepalives, and advances
    ``confirmed_flush_lsn`` from status updates — the protocol half of
    a replication slot, without Postgres."""

    def __init__(self, events: list[dict] | None = None, *,
                 keepalive_every: int = 4, codec: str = "jsonl",
                 _drop_mid_tx_once: bool = False):
        if codec not in ("jsonl", "pgoutput"):
            raise ValueError(f"unknown wire codec {codec!r}")
        self._events: list[dict] = list(events or [])
        self._lock = threading.Condition()
        self._closed = False
        self.confirmed_flush_lsn = 0
        self.keepalive_every = keepalive_every
        self.codec = codec
        # test seam: sever the FIRST connection halfway through its
        # first transaction payload — the deterministic repro for the
        # reconnect-with-open-tx framing state
        self._drop_mid_tx_once = _drop_mid_tx_once
        self._srv = socket.create_server(("127.0.0.1", 0))
        self._srv.settimeout(0.2)
        self.port = self._srv.getsockname()[1]
        self.url = f"tcp://127.0.0.1:{self.port}"
        self._thread = threading.Thread(target=self._serve, daemon=True)
        self._thread.start()

    def append(self, events: list[dict]) -> None:
        with self._lock:
            self._events.extend(events)
            self._lock.notify_all()

    def close(self) -> None:
        with self._lock:
            self._closed = True
            self._lock.notify_all()
        self._srv.close()
        self._thread.join(timeout=5)

    # ------------------------------------------------------ internals
    def _tx_blocks(self):
        """Split the flat event list into (relations-so-far, block)
        units: a block is a begin..commit run (with its end_lsn) or a
        standalone relation/type declaration."""
        rels: list[dict] = []
        i, out = 0, []
        evs = self._events
        while i < len(evs):
            ev = evs[i]
            kind = ev.get("event")
            if kind in ("relation", "type"):
                rels.append(ev)
                i += 1
                continue
            if kind == "begin":
                j = i
                while j < len(evs) and evs[j].get("event") != "commit":
                    j += 1
                if j == len(evs):
                    break                      # incomplete tail tx
                out.append((list(rels), evs[i:j + 1],
                            int(evs[j]["end_lsn"])))
                i = j + 1
                continue
            i += 1
        return out, len(evs)

    def _serve(self) -> None:
        while True:
            with self._lock:
                if self._closed:
                    return
            try:
                conn, _addr = self._srv.accept()
            except socket.timeout:
                continue
            except OSError:
                return
            try:
                self._handle(conn)
            except (OSError, ValueError):
                pass
            finally:
                conn.close()

    def _handle(self, conn: socket.socket) -> None:
        conn.settimeout(0.2)
        buf = b""
        while b"\n" not in buf:
            try:
                d = conn.recv(4096)
            except socket.timeout:
                with self._lock:
                    if self._closed:
                        return
                continue
            if not d:
                return
            buf += d
        line, buf = buf.split(b"\n", 1)
        start = json.loads(line)
        if start.get("msg") != "start_replication":
            raise ValueError("expected start_replication")
        if start.get("codec", "jsonl") != self.codec:
            raise ValueError(
                f"client codec {start.get('codec')!r} != server codec "
                f"{self.codec!r}")
        use_pg = self.codec == "pgoutput"
        if use_pg:
            from moonray.sources.pgoutput import (PgWireDecoder,
                                                  PgWireEncoder,
                                                  keepalive_frame)
            encoder = PgWireEncoder()
        with self._lock:
            lsn = max(int(start.get("lsn", 0)), self.confirmed_flush_lsn)

        def _slot_advance(flush: int) -> None:
            with self._lock:
                self.confirmed_flush_lsn = max(
                    self.confirmed_flush_lsn, flush)

        # ack reader: advance the slot from status updates
        def _read_acks(extra: bytes) -> None:
            nonlocal_buf = extra
            conn2 = conn
            ack_dec = PgWireDecoder() if use_pg else None
            if use_pg and nonlocal_buf:
                # acks may already sit in the post-handshake leftover
                # (handshake line + first status frame in one segment)
                # — drain them now, not after the next recv
                for m in ack_dec.feed(nonlocal_buf):
                    if m.get("msg") == "status_update":
                        _slot_advance(int(m["flush_lsn"]))
                nonlocal_buf = b""
            while True:
                if use_pg:
                    try:
                        d = conn2.recv(4096)
                    except socket.timeout:
                        continue
                    except OSError:
                        return
                    if not d:
                        return
                    for m in ack_dec.feed(d):
                        if m.get("msg") == "status_update":
                            _slot_advance(int(m["flush_lsn"]))
                    continue
                cut = nonlocal_buf.find(b"\n")
                if cut >= 0:
                    ln, nonlocal_buf = (nonlocal_buf[:cut],
                                        nonlocal_buf[cut + 1:])
                    if ln.strip():
                        m = json.loads(ln)
                        if m.get("msg") == "status_update":
                            _slot_advance(int(m["flush_lsn"]))
                    continue
                try:
                    d = conn2.recv(4096)
                except socket.timeout:
                    continue
                except OSError:
                    return
                if not d:
                    return
                nonlocal_buf += d

        ack_thread = threading.Thread(target=_read_acks, args=(buf,),
                                      daemon=True)
        ack_thread.start()

        sent_rel_ids: set[int] = set()
        sent_blocks = 0
        consumed = 0
        idle_ticks = 0
        while True:
            with self._lock:
                if self._closed:
                    return
                blocks, consumed = self._tx_blocks()
            progressed = False
            for rels, block, end_lsn in blocks[sent_blocks:]:
                sent_blocks += 1
                if end_lsn <= lsn:
                    continue
                out = []
                for r in rels:
                    rid = int(r.get("rel_id", -1))
                    if rid not in sent_rel_ids:
                        sent_rel_ids.add(rid)
                        out.append(r)
                out.extend(block)
                if use_pg:
                    payload_b = b"".join(encoder.encode(e) for e in out)
                else:
                    payload_b = "".join(
                        json.dumps(e) + "\n" for e in out).encode()
                if self._drop_mid_tx_once:
                    self._drop_mid_tx_once = False
                    conn.sendall(payload_b[:len(payload_b) // 2])
                    return                      # sever mid-transaction
                conn.sendall(payload_b)
                progressed = True
                if sent_blocks % self.keepalive_every == 0:
                    if use_pg:
                        conn.sendall(keepalive_frame(end_lsn, True))
                    else:
                        conn.sendall((json.dumps(
                            {"event": "keepalive", "wal_end": end_lsn,
                             "reply": True}) + "\n").encode())
            if not progressed:
                # idle: a dead client must release the handler so the
                # accept loop can serve a reconnect — the ack reader
                # exits on disconnect, and a periodic keepalive probes
                # the transport (sendall on a closed peer raises)
                if not ack_thread.is_alive():
                    return
                idle_ticks += 1
                if idle_ticks % 5 == 0:
                    with self._lock:
                        lsn_now = self.confirmed_flush_lsn
                    if use_pg:
                        conn.sendall(keepalive_frame(lsn_now, True))
                    else:
                        conn.sendall((json.dumps(
                            {"event": "keepalive", "wal_end": lsn_now,
                             "reply": True}) + "\n").encode())
                with self._lock:
                    if self._closed:
                        return
                    self._lock.wait(timeout=0.2)
            else:
                idle_ticks = 0
