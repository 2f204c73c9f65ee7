"""File-tailing CDC replication source (reference connector interface:
postgres_source.rs + cdc_event.rs:194-206 + moonlink_sink.rs, with a
JSONL file as the wire). Covers Relation/Begin/Commit framing,
commit-gated visibility, torn tails, key-update decomposition,
interleaved (streamed) transactions and replay idempotency."""

import pyarrow as pa
import pytest
import ray.data as rd

from moonray.sources.cdc_tail import (CdcProtocolError, CdcTail,
                                      write_events)
from moonray.table import MoonrayTable

REL = {"event": "relation", "rel_id": 1, "table": "cust",
       "columns": [["id", "int64"], ["name", "string"], ["bal", "float64"]],
       "key_cols": ["id"]}


def _table(tmp_path):
    schema = pa.schema([("id", pa.int64()), ("name", pa.string()),
                        ("bal", pa.float64())])
    return MoonrayTable.create(str(tmp_path / "cust"), key_col="id",
                               schema=schema, index_partitions=4,
                               rows_per_fragment=16)


def _state(t) -> dict:
    return {r["id"]: (r["name"], r["bal"]) for r in t.scan().take_all()}


def test_tail_commit_gating_torn_tail_and_apply(tmp_path):
    log = str(tmp_path / "wire.jsonl")
    t = _table(tmp_path)
    tail = CdcTail(log)
    tables = {"cust": t}

    write_events(log, [
        REL,
        {"event": "begin", "xid": 1},
        *[{"event": "insert", "rel_id": 1, "values": [i, f"n{i}", float(i)],
           "lsn": 100 + i} for i in range(6)],
        {"event": "commit", "xid": 1, "end_lsn": 105},
        {"event": "keepalive", "wal_end": 105},
        {"event": "begin", "xid": 2},
        {"event": "update", "rel_id": 1, "old_values": [2, "n2", 2.0],
         "values": [2, "upd2", 2.5], "lsn": 110},
        {"event": "delete", "rel_id": 1, "values": [4, None, None],
         "lsn": 111},
        # no commit for xid 2 yet
    ])
    # torn tail: half-written line must not be consumed
    with open(log, "a") as f:
        f.write('{"event":"com')

    applied = tail.run_until_idle(tables)
    assert applied == {"cust": 1}           # only xid 1 committed
    assert _state(t) == {i: (f"n{i}", float(i)) for i in range(6)}

    # producer finishes the torn line into a commit for xid 2
    with open(log, "a") as f:
        f.write('mit","xid":2,"end_lsn":111}\n')
    tail.run_until_idle(tables)
    got = _state(t)
    assert got[2] == ("upd2", 2.5) and 4 not in got and len(got) == 5


def test_key_update_decomposes_to_delete_plus_insert(tmp_path):
    log = str(tmp_path / "wire.jsonl")
    t = _table(tmp_path)
    tail = CdcTail(log)
    write_events(log, [
        REL,
        {"event": "begin", "xid": 1},
        {"event": "insert", "rel_id": 1, "values": [1, "a", 1.0], "lsn": 10},
        {"event": "commit", "xid": 1, "end_lsn": 10},
        {"event": "begin", "xid": 2},
        # key 1 → key 9 (the old row must vanish)
        {"event": "update", "rel_id": 1, "old_values": [1, "a", 1.0],
         "values": [9, "a9", 1.5], "lsn": 11},
        {"event": "commit", "xid": 2, "end_lsn": 11},
    ])
    tail.run_until_idle({"cust": t})
    assert _state(t) == {9: ("a9", 1.5)}


def test_interleaved_streamed_transactions_and_replay_idempotency(tmp_path):
    log = str(tmp_path / "wire.jsonl")
    t = _table(tmp_path)
    tail = CdcTail(log)
    write_events(log, [
        REL,
        {"event": "begin", "xid": 10},
        {"event": "begin", "xid": 11},
        {"event": "insert", "rel_id": 1, "xid": 11,
         "values": [7, "x11", 0.5], "lsn": 20},
        {"event": "insert", "rel_id": 1, "xid": 10,
         "values": [8, "x10", 0.25], "lsn": 21},
        {"event": "commit", "xid": 11, "end_lsn": 20},
        {"event": "commit", "xid": 10, "end_lsn": 21},
    ])
    txs = tail.poll()
    assert [x.xid for x in txs] == [11, 10]  # commit order
    for tx in txs:
        tail.apply(tx, {"cust": t})
    assert _state(t) == {7: ("x11", 0.5), 8: ("x10", 0.25)}
    v = t.latest_version()
    # consumer crash between apply and offset persistence → re-apply
    for tx in txs:
        tail.apply(tx, {"cust": t})
    assert t.latest_version() == v          # same versions, no dup rows
    assert _state(t) == {7: ("x11", 0.5), 8: ("x10", 0.25)}


def test_protocol_errors(tmp_path):
    log = str(tmp_path / "wire.jsonl")
    tail = CdcTail(log)
    write_events(log, [
        REL,
        {"event": "insert", "rel_id": 1, "values": [1, "a", 1.0], "lsn": 1},
    ])
    with pytest.raises(CdcProtocolError):
        tail.poll()
    log2 = str(tmp_path / "wire2.jsonl")
    tail2 = CdcTail(log2)
    write_events(log2, [
        {"event": "begin", "xid": 1},
        {"event": "insert", "rel_id": 99, "values": [1], "lsn": 1},
    ])
    with pytest.raises(CdcProtocolError):
        tail2.poll()


def test_replicate_once_durable_position_across_restarts(tmp_path, capsys):
    """jobs replicate: a fresh consumer process resumes at the
    checkpointed byte offset with its relation registry; a crash
    between apply and checkpoint re-applies idempotently (same
    versions, no duplicates)."""
    import json as _json

    from moonray.jobs.__main__ import main
    from moonray.sources.cdc_tail import replicate_once

    log = str(tmp_path / "wire.jsonl")
    state = str(tmp_path / "pos.json")
    t = _table(tmp_path)

    write_events(log, [
        REL,
        {"event": "begin", "xid": 1},
        {"event": "insert", "rel_id": 1, "values": [1, "a", 1.0], "lsn": 10},
        {"event": "insert", "rel_id": 1, "values": [2, "b", 2.0], "lsn": 11},
        {"event": "commit", "xid": 1, "end_lsn": 11},
    ])
    applied = replicate_once(log, {"cust": t}, state)
    assert applied == {"cust": t.latest_version()}
    assert _state(t) == {1: ("a", 1.0), 2: ("b", 2.0)}
    v1 = t.latest_version()

    # restart (fresh tail): nothing new → no merges, version unchanged
    assert replicate_once(log, {"cust": t}, state) == {}
    assert t.latest_version() == v1

    # append a second tx; consume via the CLI (another fresh process
    # shape) — the relation declared before the checkpoint still
    # resolves because it rides the state file
    write_events(log, [
        {"event": "begin", "xid": 2},
        {"event": "update", "rel_id": 1, "old_values": [1, "a", 1.0],
         "values": [1, "a2", 9.0], "lsn": 20},
        {"event": "delete", "rel_id": 1, "values": [2, None, None],
         "lsn": 21},
        {"event": "commit", "xid": 2, "end_lsn": 21},
    ])
    assert main(["replicate", "--wire", log,
                 "--map", f"cust={tmp_path / 'cust'}",
                 "--state", state]) == 0
    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["applied"]["cust"] == t.latest_version()
    assert _state(t) == {1: ("a2", 9.0)}

    # crash-between-apply-and-checkpoint simulation: rewind the state
    # file to the v1 position and re-drain — idempotent job ids land in
    # the SAME version, state converges
    st = _json.loads(open(state).read())
    v2 = t.latest_version()
    # rebuild a pre-tx2 state: offset after tx1 only
    import os as _os

    sz_tx1 = None
    with open(log, "rb") as f:
        raw = f.read()
    first_commit = raw.find(b'"commit"')
    sz_tx1 = raw.find(b"\n", first_commit) + 1
    _json.dump({"offset": sz_tx1, "relations": st["relations"]},
               open(state, "w"))
    assert replicate_once(log, {"cust": t}, state) == {"cust": v2}
    assert t.latest_version() == v2
    assert _state(t) == {1: ("a2", 9.0)}


def test_replicate_follow_tails_concurrent_writer(tmp_path):
    """Follow mode: a writer thread appends transactions while the
    daemon loop drains; the loop exits on idle and the table holds
    every committed row. A subsequent --once cycle finds nothing new
    (the follow loop's checkpoint is durable and shared)."""
    import threading
    import time

    from moonray.sources.cdc_tail import replicate_follow, replicate_once

    log = str(tmp_path / "wire.jsonl")
    state = str(tmp_path / "state.json")
    t = _table(tmp_path)
    write_events(log, [REL])

    def writer():
        for tx in range(4):
            base = tx * 10
            write_events(log, [
                {"event": "begin", "xid": tx + 1},
                *[{"event": "insert", "rel_id": 1,
                   "values": [base + i, f"n{base + i}", float(i)],
                   "lsn": 1000 + base + i} for i in range(5)],
                {"event": "commit", "xid": tx + 1, "end_lsn": 1000 + base + 9},
            ])
            time.sleep(0.15)

    th = threading.Thread(target=writer)
    th.start()
    applied = replicate_follow(log, {"cust": t}, state,
                               poll_interval=0.1, idle_exit=8)
    th.join()
    assert applied.get("cust", 0) > 0
    got = _state(t)
    assert sorted(got) == [tx * 10 + i for tx in range(4) for i in range(5)]
    # nothing left for a one-shot drain; checkpoint is shared
    assert replicate_once(log, {"cust": t}, state) in ({}, {"cust": 0})
    # stop() callable exits immediately even with work pending
    write_events(log, [
        {"event": "begin", "xid": 99},
        {"event": "insert", "rel_id": 1, "values": [999, "late", 0.0],
         "lsn": 9999},
        {"event": "commit", "xid": 99, "end_lsn": 9999},
    ])
    out = replicate_follow(log, {"cust": t}, state,
                           poll_interval=0.01, stop=lambda: True)
    assert out == {} and 999 not in _state(t)
