"""TCP replication wire (cdc_socket): the cdc_tail grammar over a
loopback socket with the reference's keepalive/ack protocol shape
(postgres_source.rs event loop + send_status_update). Covers live
streaming, reply-requested keepalives advancing the slot, kill/resume
losslessness, and slot-side resume when the client checkpoint is
gone."""

import threading
import time

import pyarrow as pa

from moonray.sources.cdc_socket import CdcWireServer, replicate_socket
from moonray.table import MoonrayTable

REL = {"event": "relation", "rel_id": 1, "table": "cust",
       "columns": [["id", "int64"], ["name", "string"], ["bal", "float64"]],
       "key_cols": ["id"]}


def _table(tmp_path, name="cust"):
    schema = pa.schema([("id", pa.int64()), ("name", pa.string()),
                        ("bal", pa.float64())])
    return MoonrayTable.create(str(tmp_path / name), key_col="id",
                               schema=schema, index_partitions=4,
                               rows_per_fragment=16)


def _state(t) -> dict:
    return {r["id"]: (r["name"], r["bal"]) for r in t.scan().take_all()}


def _tx(xid, rows, lsn0):
    evs = [{"event": "begin", "xid": xid}]
    lsn = lsn0
    for op, vals, old in rows:
        e = {"event": op, "rel_id": 1, "values": vals, "lsn": lsn}
        if old is not None:
            e["old_values"] = old
        evs.append(e)
        lsn += 1
    evs.append({"event": "commit", "xid": xid, "end_lsn": lsn - 1})
    return evs, lsn - 1


def test_socket_stream_and_slot_ack(tmp_path):
    evs = [REL]
    evs0, l0 = _tx(1, [("insert", [i, f"n{i}", float(i)], None)
                       for i in range(8)], 100)
    evs1, l1 = _tx(2, [("update", [3, "upd3", 9.5], [3, "n3", 3.0]),
                       ("delete", [5, None, None], None)], l0 + 1)
    srv = CdcWireServer(evs + evs0 + evs1, keepalive_every=1)
    try:
        t = _table(tmp_path)
        state = str(tmp_path / "state.json")
        total = replicate_socket(srv.url, {"cust": t}, state,
                                 idle_exit=3)
        assert total == {"cust": 10}
        want = {i: (f"n{i}", float(i)) for i in range(8) if i != 5}
        want[3] = ("upd3", 9.5)
        assert _state(t) == want
        # status updates advanced the slot to the last commit
        deadline = time.time() + 3
        while srv.confirmed_flush_lsn < l1 and time.time() < deadline:
            time.sleep(0.05)
        assert srv.confirmed_flush_lsn == l1
    finally:
        srv.close()


def test_socket_kill_and_resume_lossless(tmp_path):
    """Kill the consumer mid-stream; a restarted consumer with the same
    checkpoint file applies exactly the remaining transactions."""
    evs = [REL]
    lsn = 100
    all_rows = {}
    for xid in range(1, 11):
        rows = [("insert", [xid * 10 + j, f"v{xid}-{j}", float(xid)], None)
                for j in range(3)]
        for _op, vals, _old in rows:
            all_rows[vals[0]] = (vals[1], vals[2])
        block, lsn = _tx(xid, rows, lsn + 1)
        evs.extend(block)
    srv = CdcWireServer(evs, keepalive_every=3)
    try:
        t = _table(tmp_path)
        state = str(tmp_path / "state.json")

        applied_some = threading.Event()
        kill = threading.Event()

        orig_merge = t.merge
        calls = {"n": 0}

        def slow_merge(*a, **kw):
            v = orig_merge(*a, **kw)
            calls["n"] += 1
            if calls["n"] >= 3:
                applied_some.set()
            return v

        t.merge = slow_merge
        th = threading.Thread(
            target=replicate_socket,
            args=(srv.url, {"cust": t}, state),
            kwargs={"stop": kill.is_set}, daemon=True)
        th.start()
        assert applied_some.wait(timeout=20)
        kill.set()                      # "kill" mid-stream
        th.join(timeout=10)
        assert not th.is_alive()
        t.merge = orig_merge
        assert 0 < len(_state(t)) <= len(all_rows)

        # restart with the SAME state file → remaining txs apply,
        # nothing duplicates (idempotent job ids + flush-lsn skip)
        total2 = replicate_socket(srv.url, {"cust": t},
                                  state, idle_exit=3)
        assert _state(t) == all_rows
        assert t.scan().count() == len(all_rows)
    finally:
        srv.close()


def test_socket_resume_from_server_slot_without_client_state(tmp_path):
    """Client checkpoint lost AFTER a full drain: the server's
    replication slot (confirmed_flush_lsn) prevents re-streaming."""
    evs = [REL]
    block, l0 = _tx(1, [("insert", [1, "a", 1.0], None),
                        ("insert", [2, "b", 2.0], None)], 100)
    srv = CdcWireServer(evs + block, keepalive_every=1)
    try:
        t = _table(tmp_path)
        state = str(tmp_path / "state.json")
        replicate_socket(srv.url, {"cust": t}, state, idle_exit=3)
        assert len(_state(t)) == 2
        deadline = time.time() + 3
        while srv.confirmed_flush_lsn < l0 and time.time() < deadline:
            time.sleep(0.05)

        # lose the client checkpoint, reconnect: slot says "already
        # confirmed through l0" → nothing resent, table unchanged
        import os

        os.remove(state)
        total = replicate_socket(srv.url, {"cust": t}, state,
                                 idle_exit=3)
        assert total == {}
        assert len(_state(t)) == 2

        # a NEW tx appended after reconnect streams live
        block2, _ = _tx(2, [("insert", [3, "c", 3.0], None)], l0 + 1)
        srv.append(block2)
        replicate_socket(srv.url, {"cust": t}, state, idle_exit=4)
        assert len(_state(t)) == 3
    finally:
        srv.close()
