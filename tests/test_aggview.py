"""Incremental aggregate-view maintenance (moonray/aggview.py).

Oracle: full recompute of the aggregate from the source's current scan
(pandas groupby) after every sync round — the view must match it
value-for-value while only ever reading the changelog + affected-group
rescans. Covers count/sum/min/max algebra under insert/update/delete,
group death, the tie-triggered extreme rescan (and its absence), null
handling, composite and transform-derived group columns, and
crash-replay idempotence via the windowed merge job_id."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from moonray.aggview import build_aggregate_view, sync_aggregate
from moonray.table import MoonrayTable

AGGS = {"cnt": ("count", None), "sum_x": ("sum", "x"),
        "min_x": ("min", "x"), "max_x": ("max", "x")}


def _mk_src(root, rows):
    schema = pa.schema([("id", pa.int64()), ("g", pa.int64()),
                        ("x", pa.int64())])
    t = MoonrayTable.create(root, key_col="id", schema=schema,
                            zone_cols=("g",), rows_per_fragment=32,
                            index_partitions=4)
    ids, gs, xs = zip(*rows)
    t.bulk_load(rd.from_arrow(pa.table({
        "id": pa.array(ids, pa.int64()), "g": pa.array(gs, pa.int64()),
        "x": pa.array(xs, pa.int64())})))
    return t


def _merge(t, ops, lsn):
    """ops: list of (op, id, g, x)."""
    o, i, g, x = zip(*ops)
    t.merge(rd.from_arrow(pa.table({
        "op": pa.array(o, pa.string()),
        "lsn": pa.array([lsn] * len(o), pa.int64()),
        "id": pa.array(i, pa.int64()),
        "g": pa.array(list(g), pa.int64()),
        "x": pa.array(list(x), pa.int64()),
    })), job_id=f"chg-{lsn}")


def _oracle(src) -> pd.DataFrame:
    df = pa.concat_tables(src.scan().iter_batches(
        batch_format="pyarrow", batch_size=8192)).to_pandas()
    if df.empty:
        return pd.DataFrame(columns=["g", "cnt", "sum_x", "min_x", "max_x"])
    out = df.groupby("g").agg(
        cnt=("x", "size"), sum_x=("x", "sum"),
        min_x=("x", "min"), max_x=("x", "max")).reset_index()
    return out.sort_values("g", ignore_index=True)


def _view_df(dst) -> pd.DataFrame:
    tbls = list(dst.scan().iter_batches(batch_format="pyarrow",
                                        batch_size=8192))
    if not tbls:
        return pd.DataFrame(columns=["g", "cnt", "sum_x", "min_x", "max_x"])
    df = pa.concat_tables(tbls).to_pandas()
    return df[["g", "cnt", "sum_x", "min_x", "max_x"]] \
        .sort_values("g", ignore_index=True)


def _check(src, dst):
    got, want = _view_df(dst), _oracle(src)
    pd.testing.assert_frame_equal(
        got.astype({"cnt": "int64", "sum_x": "int64"}),
        want.astype({"cnt": "int64", "sum_x": "int64"}))


def test_count_sum_minmax_rounds(tmp_path):
    src = _mk_src(str(tmp_path / "src"),
                  [(i, i % 3, 10 * i) for i in range(30)])
    dst = build_aggregate_view(src, str(tmp_path / "view"),
                               group_cols=["g"], aggs=AGGS)
    _check(src, dst)

    # round 1: inserts into existing + a brand-new group
    _merge(src, [("I", 100, 0, 5), ("I", 101, 7, 1), ("I", 102, 7, 2)],
           lsn=1)
    stats = {}
    sync_aggregate(src, dst, group_cols=["g"], aggs=AGGS, stats=stats)
    _check(src, dst)
    assert stats["rescanned_groups"] == 0  # inserts never rescan

    # round 2: update (D+I shape through merge) + delete a non-extreme
    _merge(src, [("U", 100, 0, 7), ("D", 4, 0, 0)], lsn=2)
    stats = {}
    sync_aggregate(src, dst, group_cols=["g"], aggs=AGGS, stats=stats)
    _check(src, dst)


def test_extreme_delete_triggers_rescan_only_then(tmp_path):
    src = _mk_src(str(tmp_path / "src"),
                  [(1, 0, 5), (2, 0, 9), (3, 0, 14), (4, 1, 3)])
    dst = build_aggregate_view(src, str(tmp_path / "view"),
                               group_cols=["g"], aggs=AGGS)

    # delete group 0's min row (x=5): stored min must be recomputed
    _merge(src, [("D", 1, 0, 0)], lsn=1)
    stats = {}
    sync_aggregate(src, dst, group_cols=["g"], aggs=AGGS, stats=stats)
    assert stats["rescanned_groups"] == 1
    _check(src, dst)

    # delete a middle row (x=9 is now between 9..14? x=9 IS the new min)
    # → use group with non-extreme member: add rows first
    _merge(src, [("I", 10, 1, 1), ("I", 11, 1, 8)], lsn=2)
    sync_aggregate(src, dst, group_cols=["g"], aggs=AGGS)
    _merge(src, [("D", 4, 1, 0)], lsn=3)  # x=3: between min 1 and max 8
    stats = {}
    sync_aggregate(src, dst, group_cols=["g"], aggs=AGGS, stats=stats)
    assert stats["rescanned_groups"] == 0
    _check(src, dst)


def test_group_death_removes_row(tmp_path):
    src = _mk_src(str(tmp_path / "src"), [(1, 5, 1), (2, 5, 2), (3, 6, 3)])
    dst = build_aggregate_view(src, str(tmp_path / "view"),
                               group_cols=["g"], aggs=AGGS)
    _merge(src, [("D", 1, 5, 0), ("D", 2, 5, 0)], lsn=1)
    stats = {}
    sync_aggregate(src, dst, group_cols=["g"], aggs=AGGS, stats=stats)
    assert stats["deleted_groups"] == 1
    got = _view_df(dst)
    assert got["g"].tolist() == [6]
    _check(src, dst)


def test_insert_plus_delete_same_window_is_noop(tmp_path):
    src = _mk_src(str(tmp_path / "src"), [(1, 0, 1)])
    dst = build_aggregate_view(src, str(tmp_path / "view"),
                               group_cols=["g"], aggs=AGGS)
    # group 9 is born and dies inside one sync window → no D op for a
    # key the view never had
    _merge(src, [("I", 50, 9, 5)], lsn=1)
    _merge(src, [("D", 50, 9, 0)], lsn=2)
    sync_aggregate(src, dst, group_cols=["g"], aggs=AGGS)
    _check(src, dst)


def test_replay_after_crash_is_idempotent(tmp_path):
    from moonray.aggview import _pointer_name
    from moonray.commitstore import store_for

    src = _mk_src(str(tmp_path / "src"),
                  [(i, i % 2, i) for i in range(10)])
    dst = build_aggregate_view(src, str(tmp_path / "view"),
                               group_cols=["g"], aggs=AGGS)
    _merge(src, [("I", 90, 0, 50), ("D", 2, 0, 0)], lsn=1)
    sync_aggregate(src, dst, group_cols=["g"], aggs=AGGS)
    want = _view_df(dst)

    # crash between merge-commit and pointer-advance: pointer rolls
    # back, the replayed round recomputes (stale) deltas but the
    # windowed job_id short-circuits the merge
    store = store_for(dst.root)
    store.set_pointer(_pointer_name("agg"), "1")
    sync_aggregate(src, dst, group_cols=["g"], aggs=AGGS)
    pd.testing.assert_frame_equal(_view_df(dst), want)
    _check(src, dst)


def test_composite_group_cols(tmp_path):
    schema = pa.schema([("id", pa.int64()), ("a", pa.string()),
                        ("b", pa.int64()), ("x", pa.int64())])
    src = MoonrayTable.create(str(tmp_path / "src"), key_col="id",
                              schema=schema, rows_per_fragment=32,
                              index_partitions=4)
    src.bulk_load(rd.from_arrow(pa.table({
        "id": pa.array(range(12), pa.int64()),
        "a": pa.array(["p", "q"] * 6, pa.string()),
        "b": pa.array([i % 3 for i in range(12)], pa.int64()),
        "x": pa.array(range(0, 120, 10), pa.int64())})))
    aggs = {"cnt": ("count", None), "sum_x": ("sum", "x"),
            "min_x": ("min", "x")}
    dst = build_aggregate_view(src, str(tmp_path / "view"),
                               group_cols=["a", "b"], aggs=aggs)
    src.merge(rd.from_arrow(pa.table({
        "op": pa.array(["D", "I"], pa.string()),
        "lsn": pa.array([1, 1], pa.int64()),
        "id": pa.array([0, 100], pa.int64()),
        "a": pa.array(["p", "p"], pa.string()),
        "b": pa.array([0, 0], pa.int64()),
        "x": pa.array([0, 999], pa.int64())})), job_id="c1")
    stats = {}
    sync_aggregate(src, dst, group_cols=["a", "b"], aggs=aggs, stats=stats)
    # id=0 had x=0, the (p,0) min → rescan
    assert stats["rescanned_groups"] == 1

    df = pa.concat_tables(src.scan().iter_batches(
        batch_format="pyarrow", batch_size=8192)).to_pandas()
    want = df.groupby(["a", "b"]).agg(
        cnt=("x", "size"), sum_x=("x", "sum"),
        min_x=("x", "min")).reset_index() \
        .sort_values(["a", "b"], ignore_index=True)
    got = pa.concat_tables(dst.scan().iter_batches(
        batch_format="pyarrow", batch_size=8192)).to_pandas()[
        ["a", "b", "cnt", "sum_x", "min_x"]] \
        .sort_values(["a", "b"], ignore_index=True)
    pd.testing.assert_frame_equal(
        got.astype({"cnt": "int64", "sum_x": "int64", "min_x": "int64"}),
        want.astype({"cnt": "int64", "sum_x": "int64", "min_x": "int64"}))


def test_transform_derived_group_and_value(tmp_path):
    """Derived group (val bucket) + derived fixed-point value column;
    the rescan path must run the transform too."""
    import pyarrow.compute as pc

    schema = pa.schema([("id", pa.int64()), ("price", pa.float64())])
    src = MoonrayTable.create(str(tmp_path / "src"), key_col="id",
                              schema=schema, rows_per_fragment=32,
                              index_partitions=4)
    prices = [1.25, 2.50, 3.75, 10.10, 11.20, 0.05]
    src.bulk_load(rd.from_arrow(pa.table({
        "id": pa.array(range(6), pa.int64()),
        "price": pa.array(prices, pa.float64())})))

    def tf(b: pa.Table) -> pa.Table:
        cents = pc.cast(pc.floor(pc.add(pc.multiply(
            b["price"], 100.0), 0.5)), pa.int64())
        bucket = pc.cast(pc.floor(pc.divide(b["price"], 10.0)), pa.int64())
        return b.append_column("cents", cents).append_column(
            "bucket", bucket)

    aggs = {"cnt": ("count", None), "cents_sum": ("sum", "cents"),
            "cents_min": ("min", "cents")}
    dst = build_aggregate_view(src, str(tmp_path / "view"),
                               group_cols=["bucket"], aggs=aggs,
                               transform=tf, transform_columns=["price"])

    # delete the bucket-0 min (0.05) → derived-group rescan (no
    # physical pruning available, membership filtered post-transform)
    src.merge(rd.from_arrow(pa.table({
        "op": pa.array(["D"], pa.string()),
        "lsn": pa.array([1], pa.int64()),
        "id": pa.array([5], pa.int64()),
        "price": pa.array([0.0], pa.float64())})), job_id="d1")
    stats = {}
    sync_aggregate(src, dst, group_cols=["bucket"], aggs=aggs,
                   transform=tf, transform_columns=["price"], stats=stats)
    assert stats["rescanned_groups"] == 1

    got = pa.concat_tables(dst.scan().iter_batches(
        batch_format="pyarrow", batch_size=8192)).to_pandas() \
        .sort_values("bucket", ignore_index=True)
    df = pd.DataFrame({"price": [1.25, 2.50, 3.75, 10.10, 11.20]})
    df["cents"] = np.floor(df.price * 100 + 0.5).astype(np.int64)
    df["bucket"] = np.floor(df.price / 10).astype(np.int64)
    want = df.groupby("bucket").agg(
        cnt=("cents", "size"), cents_sum=("cents", "sum"),
        cents_min=("cents", "min")).reset_index()
    pd.testing.assert_frame_equal(
        got[["bucket", "cnt", "cents_sum", "cents_min"]].astype("int64"),
        want.astype("int64"))


def test_requires_count_column(tmp_path):
    src = _mk_src(str(tmp_path / "src"), [(1, 0, 1)])
    with pytest.raises(ValueError, match="count"):
        build_aggregate_view(src, str(tmp_path / "v"), group_cols=["g"],
                             aggs={"s": ("sum", "x")})


def test_sync_without_build_pointer_raises(tmp_path):
    src = _mk_src(str(tmp_path / "src"), [(1, 0, 1)])
    schema = pa.schema([("g", pa.int64()), ("cnt", pa.int64())])
    dst = MoonrayTable.create(str(tmp_path / "view"), key_col="g",
                              schema=schema)
    with pytest.raises(RuntimeError, match="no sync pointer"):
        sync_aggregate(src, dst, group_cols=["g"],
                       aggs={"cnt": ("count", None)})


def test_model_random_rounds(tmp_path):
    """Model-based: random insert/update/delete rounds; after every
    sync the view must equal a full recompute. Exercises group birth,
    death, rebirth, extreme deletion (rescan), duplicate extremes, and
    null-free int algebra under many interleavings."""
    rng = np.random.default_rng(1234)
    rows = [(int(i), int(rng.integers(0, 6)), int(rng.integers(0, 50)))
            for i in range(80)]
    src = _mk_src(str(tmp_path / "src"), rows)
    dst = build_aggregate_view(src, str(tmp_path / "view"),
                               group_cols=["g"], aggs=AGGS)
    _check(src, dst)
    live = {i for i, _g, _x in rows}
    gs = {i: g for i, g, _x in rows}
    next_id = 1000
    for lsn in range(1, 9):
        ops = []
        for _ in range(int(rng.integers(3, 12))):
            kind = rng.choice(["I", "U", "D"])
            if kind == "I" or not live:
                ops.append(("I", next_id, int(rng.integers(0, 6)),
                            int(rng.integers(0, 50))))
                next_id += 1
            elif kind == "U":
                i = int(rng.choice(sorted(live)))
                # updates may move a row BETWEEN groups (delete from
                # old group + insert into new one in the changelog)
                ops.append(("U", i, int(rng.integers(0, 6)),
                            int(rng.integers(0, 50))))
            else:
                i = int(rng.choice(sorted(live)))
                ops.append(("D", i, gs[i], 0))
        # one op per key per round (merge is last-LSN-wins per batch;
        # the model is simpler with distinct keys)
        seen, uniq = set(), []
        for op in ops:
            if op[1] not in seen:
                seen.add(op[1])
                uniq.append(op)
        for op, i, g, x in uniq:
            if op == "D":
                live.discard(i)
            else:
                live.add(i)
                gs[i] = g
        _merge(src, uniq, lsn=lsn)
        sync_aggregate(src, dst, group_cols=["g"], aggs=AGGS)
        _check(src, dst)


def test_new_group_within_window_extreme_delete(tmp_path):
    """Review finding (session 4): a group BORN inside the sync window
    whose within-window extreme is then deleted must rescan — the
    stored-extreme tie check can't fire (nothing stored), so any valid
    deleted value on a min/max column forces it."""
    src = _mk_src(str(tmp_path / "src"), [(1, 0, 7)])
    dst = build_aggregate_view(src, str(tmp_path / "view"),
                               group_cols=["g"], aggs=AGGS)
    # window spans two commits: g=9 born with x=3 and x=5, then x=3
    # (its min) deleted — true min is 5
    _merge(src, [("I", 10, 9, 3), ("I", 11, 9, 5)], lsn=1)
    _merge(src, [("D", 10, 9, 0)], lsn=2)
    stats = {}
    sync_aggregate(src, dst, group_cols=["g"], aggs=AGGS, stats=stats)
    assert stats["rescanned_groups"] >= 1
    row = [r for r in _view_df(dst).to_dict("records") if r["g"] == 9][0]
    assert row["min_x"] == 5 and row["max_x"] == 5 and row["cnt"] == 1
    _check(src, dst)


def test_crash_replay_with_new_commit_is_exactly_once(tmp_path):
    """Review finding (session 4): crash between merge-commit and
    pointer-advance, then a NEW source commit before the retry. The
    pending-window record must make the retry replay the ORIGINAL
    window (same job_id → short-circuit) and then catch up — not fold
    both windows into one differently-named job that double-applies."""
    from moonray.aggview import _pointer_name
    from moonray.commitstore import store_for

    src = _mk_src(str(tmp_path / "src"), [(1, 0, 100), (2, 0, 1)])
    dst = build_aggregate_view(src, str(tmp_path / "view"),
                               group_cols=["g"], aggs=AGGS)
    _merge(src, [("I", 50, 0, 10)], lsn=1)   # window (v1, v2]
    sync_aggregate(src, dst, group_cols=["g"], aggs=AGGS)

    # reconstruct the crash state: pointer NOT advanced, pending window
    # still on disk (exactly what a crash after dst.merge leaves)
    store = store_for(dst.root)
    last = 1
    cur = src.latest_version()
    store.set_pointer(_pointer_name("agg"), str(last))
    store.set_pointer(_pointer_name("agg") + ".pending", f"{last}:{cur}")

    _merge(src, [("I", 51, 0, 1)], lsn=2)    # new commit lands (v3)
    sync_aggregate(src, dst, group_cols=["g"], aggs=AGGS)
    # the v2 insert (x=10) must count exactly once AND the v3 insert
    # must be applied by the same call's catch-up round
    _check(src, dst)


AGGS_ND = {"cnt": ("count", None), "nd_x": ("count_distinct", "x")}


def _oracle_nd(src) -> pd.DataFrame:
    df = pa.concat_tables(src.scan().iter_batches(
        batch_format="pyarrow", batch_size=8192)).to_pandas()
    if df.empty:
        return pd.DataFrame(columns=["g", "cnt", "nd_x"])
    out = df.groupby("g").agg(cnt=("x", "size"),
                              nd_x=("x", "nunique")).reset_index()
    return out.sort_values("g", ignore_index=True)


def _check_nd(src, dst):
    got = pa.concat_tables(dst.scan().iter_batches(
        batch_format="pyarrow", batch_size=8192)).to_pandas()[
        ["g", "cnt", "nd_x"]].sort_values("g", ignore_index=True)
    pd.testing.assert_frame_equal(got.astype("int64"),
                                  _oracle_nd(src).astype("int64"))


def test_count_distinct_build_and_rounds(tmp_path):
    """Exact per-group COUNT(DISTINCT) maintained through the aux
    support-count table: duplicates collapse, deleting one copy of a
    duplicated value keeps it counted, deleting the LAST copy drops
    it."""
    rows = [(1, 0, 5), (2, 0, 5), (3, 0, 7), (4, 1, 5)]
    src = _mk_src(str(tmp_path / "src"), rows)
    dst = build_aggregate_view(src, str(tmp_path / "view"),
                               group_cols=["g"], aggs=AGGS_ND)
    _check_nd(src, dst)   # g0: cnt 3 nd 2; g1: cnt 1 nd 1

    # delete ONE copy of the duplicated value 5 → nd unchanged
    _merge(src, [("D", 1, 0, 0)], lsn=1)
    sync_aggregate(src, dst, group_cols=["g"], aggs=AGGS_ND)
    _check_nd(src, dst)

    # delete the LAST copy of 5 in g0 → nd drops to 1
    _merge(src, [("D", 2, 0, 0)], lsn=2)
    sync_aggregate(src, dst, group_cols=["g"], aggs=AGGS_ND)
    _check_nd(src, dst)

    # inserts: a new value, a duplicate, and a brand-new group
    _merge(src, [("I", 10, 0, 7), ("I", 11, 0, 9), ("I", 12, 5, 1)],
           lsn=3)
    sync_aggregate(src, dst, group_cols=["g"], aggs=AGGS_ND)
    _check_nd(src, dst)

    # update moves a row's value (D+I in the changelog)
    _merge(src, [("U", 10, 0, 11)], lsn=4)
    sync_aggregate(src, dst, group_cols=["g"], aggs=AGGS_ND)
    _check_nd(src, dst)


def test_count_distinct_model_random_rounds(tmp_path):
    rng = np.random.default_rng(99)
    rows = [(int(i), int(rng.integers(0, 4)), int(rng.integers(0, 6)))
            for i in range(40)]
    src = _mk_src(str(tmp_path / "src"), rows)
    aggs = {**AGGS_ND, "sum_x": ("sum", "x"), "min_x": ("min", "x")}
    dst = build_aggregate_view(src, str(tmp_path / "view"),
                               group_cols=["g"], aggs=aggs)
    live = {i for i, _g, _x in rows}
    gs = {i: g for i, g, _x in rows}
    next_id = 1000
    for lsn in range(1, 7):
        ops, seen = [], set()
        for _ in range(int(rng.integers(3, 10))):
            kind = rng.choice(["I", "U", "D"])
            if kind == "I" or not live:
                i = next_id; next_id += 1
            else:
                i = int(rng.choice(sorted(live)))
                if i in seen:
                    continue
            seen.add(i)
            if kind == "D" and i in live:
                ops.append(("D", i, gs[i], 0)); live.discard(i)
            else:
                g, x = int(rng.integers(0, 4)), int(rng.integers(0, 6))
                ops.append(("I" if i >= 1000 else "U", i, g, x))
                live.add(i); gs[i] = g
        if not ops:
            continue
        _merge(src, ops, lsn=lsn)
        sync_aggregate(src, dst, group_cols=["g"], aggs=aggs)
        _check_nd(src, dst)


def test_count_distinct_crash_replay(tmp_path):
    """Crash between aux merge and view merge, then a new source
    commit: the pending window replays the SAME aux job (short-circuit)
    and the absolute nd read-back stays correct."""
    from moonray.aggview import _pointer_name
    from moonray.commitstore import store_for

    src = _mk_src(str(tmp_path / "src"), [(1, 0, 5), (2, 0, 6)])
    dst = build_aggregate_view(src, str(tmp_path / "view"),
                               group_cols=["g"], aggs=AGGS_ND)
    _merge(src, [("I", 10, 0, 6), ("I", 11, 0, 7)], lsn=1)
    sync_aggregate(src, dst, group_cols=["g"], aggs=AGGS_ND)

    store = store_for(dst.root)
    cur = src.latest_version()
    store.set_pointer(_pointer_name("agg"), "1")
    store.set_pointer(_pointer_name("agg") + ".pending", f"1:{cur}")
    _merge(src, [("D", 10, 0, 0)], lsn=2)
    sync_aggregate(src, dst, group_cols=["g"], aggs=AGGS_ND)
    _check_nd(src, dst)


def test_crash_replay_of_delete_window_does_not_wedge(tmp_path):
    """Review finding (session 4, round 2): replaying a window whose
    view merge COMMITTED (only the pointer advance was lost) must
    short-circuit by job id — recomputed deltas against the post-merge
    state would read a killed group as 0-1 and trip the negative
    guard, wedging the view forever."""
    from moonray.aggview import _pointer_name
    from moonray.commitstore import store_for

    src = _mk_src(str(tmp_path / "src"), [(1, 0, 5), (2, 1, 6)])
    dst = build_aggregate_view(src, str(tmp_path / "view"),
                               group_cols=["g"], aggs=AGGS)
    _merge(src, [("D", 1, 0, 0)], lsn=1)  # kills group 0
    sync_aggregate(src, dst, group_cols=["g"], aggs=AGGS)
    want = _view_df(dst)

    # crash state: merge committed, pointer + pending not cleared
    store = store_for(dst.root)
    store.set_pointer(_pointer_name("agg"), "1")
    store.set_pointer(_pointer_name("agg") + ".pending",
                      f"1:{src.latest_version()}")
    sync_aggregate(src, dst, group_cols=["g"], aggs=AGGS)  # must not raise
    pd.testing.assert_frame_equal(_view_df(dst), want)
    _check(src, dst)


def test_crash_replay_aux_committed_last_copy_delete(tmp_path):
    """Same wedge on the aux path: the window deletes the LAST copy of
    a (group, value) pair, the aux merge commits, the process dies
    before the view merge. The replay must detect the committed aux job
    and go straight to the absolute read-back — recomputing pair deltas
    against post-merge aux would hit the negative-multiplicity guard."""
    from moonray.aggview import (_aux_root, _pointer_name, _sync_aux,
                                 _plan)
    from moonray.commitstore import store_for
    from moonray.table import MoonrayTable

    src = _mk_src(str(tmp_path / "src"), [(1, 0, 5), (2, 0, 6)])
    dst = build_aggregate_view(src, str(tmp_path / "view"),
                               group_cols=["g"], aggs=AGGS_ND)
    _merge(src, [("D", 1, 0, 0)], lsn=1)  # last copy of (g=0, x=5)

    # run ONLY the aux half of the window (= crash before view merge)
    import pyarrow as pa2
    cur = src.latest_version()
    j = pa2.table({"g": pa2.array([0], pa2.int64())})
    _sync_aux(src, dst, ["g"], _plan(AGGS_ND), None, None, {}, "agg",
              1, cur, j)
    aux = MoonrayTable.open(_aux_root(dst.root, "nd_x"))
    v_aux = aux.latest_version()

    # pointer still at 1; pending window recorded (what the crash left)
    store = store_for(dst.root)
    store.set_pointer(_pointer_name("agg") + ".pending", f"1:{cur}")
    sync_aggregate(src, dst, group_cols=["g"], aggs=AGGS_ND)
    assert aux.latest_version() == v_aux  # aux merge not re-applied
    _check_nd(src, dst)
