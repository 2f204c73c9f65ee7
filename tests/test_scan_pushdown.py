"""Exact predicate pushdown in scan: with ``exact_filter=True`` the
range filter runs INSIDE the read tasks (after zone pruning), so rows
outside the range never leave the read — payload columns of
non-matching rows don't ship. Parity vs the downstream-filter
contract and vs DuckDB BETWEEN."""

import duckdb
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from moonray import MoonrayTable

SCHEMA = pa.schema([
    ("id", pa.int64()), ("v", pa.int64()), ("payload", pa.string()),
])


def _mk(root, n=200):
    t = MoonrayTable.create(str(root), key_col="id", schema=SCHEMA,
                            zone_cols=("v",), index_partitions=4,
                            rows_per_fragment=16)
    t.bulk_load(rd.from_items(
        [{"id": i, "v": (i * 7) % 101, "payload": f"p{i}" * 10}
         for i in range(n)]))
    # DVs interact with the pushdown path: delete some in-range rows
    t.merge(rd.from_items(
        [{"id": i, "v": 0, "payload": "", "op": "D", "lsn": 1000 + i}
         for i in range(0, n, 9)]))
    return t


def _sorted(tbl: pa.Table) -> pa.Table:
    return tbl.sort_by("id")


def test_exact_filter_matches_downstream_filter(tmp_path):
    t = _mk(tmp_path / "tbl")
    ranges = {"v": (20, 60)}

    pushed = pa.concat_tables(list(
        t.scan(predicate_ranges=ranges, exact_filter=True)
        .iter_batches(batch_format="pyarrow")))
    loose = pa.concat_tables(list(
        t.scan(predicate_ranges=ranges).iter_batches(batch_format="pyarrow")))
    downstream = loose.filter(
        pc.and_(pc.greater_equal(loose["v"], 20),
                pc.less_equal(loose["v"], 60)))
    assert _sorted(pushed).equals(_sorted(downstream))
    assert len(pushed) < len(loose)   # pruning-only scan ships extra rows

    con = duckdb.connect()
    live = pa.concat_tables(list(t.scan().iter_batches(batch_format="pyarrow")))
    con.register("live", live)
    want = con.execute(
        "SELECT * FROM live WHERE v BETWEEN 20 AND 60 ORDER BY id").arrow()
    assert _sorted(pushed).cast(want.schema).equals(want)


def test_exact_filter_with_projection_excluding_filter_col(tmp_path):
    """The ranged column needn't be in the projection — it's read for
    the in-task filter and dropped before the block leaves the task."""
    t = _mk(tmp_path / "tbl")
    ds = t.scan(columns=["id", "payload"], predicate_ranges={"v": (20, 60)},
                exact_filter=True)
    got = pa.concat_tables(list(ds.iter_batches(batch_format="pyarrow")))
    assert got.schema.names == ["id", "payload"]

    full = pa.concat_tables(list(t.scan().iter_batches(batch_format="pyarrow")))
    want = full.filter(
        pc.and_(pc.greater_equal(full["v"], 20),
                pc.less_equal(full["v"], 60))).select(["id", "payload"])
    assert _sorted(got).equals(_sorted(want))


def test_exact_filter_open_bounds_and_added_column(tmp_path):
    """None bounds are half-open; a schema-evolution column filled from
    defaults filters correctly even though it's absent in old files."""
    t = _mk(tmp_path / "tbl", n=60)
    t.alter(add_columns=[("grade", pa.int64(), 5)])
    ds = t.scan(predicate_ranges={"v": (None, 50), "grade": (5, None)},
                exact_filter=True)
    got = pa.concat_tables(list(ds.iter_batches(batch_format="pyarrow")))
    full = pa.concat_tables(list(t.scan().iter_batches(batch_format="pyarrow")))
    want = full.filter(pc.less_equal(full["v"], 50))
    assert _sorted(got).equals(_sorted(want))
    assert pc.min(got["grade"]).as_py() == 5


def test_rg_stats_prune_in_span_path(tmp_path):
    """On a clustered table the rg-span read proves non-overlap from the
    parquet footer and skips those row groups entirely; results stay
    exact (footer pruning can only drop provably-empty groups)."""
    import pyarrow.parquet as pq

    from moonray.table import _read_fragment, _rg_stats_overlap

    t = MoonrayTable.create(str(tmp_path / "tbl"), key_col="id",
                            schema=SCHEMA, zone_cols=("v",),
                            index_partitions=4, rows_per_fragment=512)
    t.bulk_load(rd.from_items(
        [{"id": i, "v": (i * 7) % 101, "payload": f"p{i}" * 10}
         for i in range(1600)]))
    t.cluster(cols=["v"])   # sorted by v → tight per-row-group stats
    m = t.manifest()
    frag = max(m["fragments"], key=lambda f: f["rows"])
    path = str(tmp_path / "tbl") + "/" + frag["path"]
    pf = pq.ParquetFile(path)
    assert pf.num_row_groups > 1
    ranges = {"v": (0, 5)}
    kept = [g for g in range(pf.num_row_groups)
            if _rg_stats_overlap(pf, g, ranges, {"v"})]
    assert 0 < len(kept) < pf.num_row_groups   # footer proves skips

    schema = pa.schema([("id", pa.int64()), ("v", pa.int64())])
    got = _read_fragment(str(tmp_path / "tbl"), frag["path"], [],
                         schema, {}, False,
                         rg_span=(0, pf.num_row_groups), ranges=ranges)
    full = pq.read_table(path, columns=["id", "v"])
    want = full.filter(
        pc.and_(pc.greater_equal(full["v"], 0), pc.less_equal(full["v"], 5)))
    assert got.sort_by("id").equals(want.sort_by("id"))


def test_predicate_in_pushdown(tmp_path):
    """IN-list pushdown: zone/rg stats prune by containment, exact
    is_in always runs in-task; parity vs DuckDB IN; projection may
    exclude the filter column."""
    t = _mk(tmp_path / "tbl")
    wanted = [3, 17, 42, 99]

    ds = t.scan(predicate_in={"v": wanted})
    got = pa.concat_tables(list(ds.iter_batches(batch_format="pyarrow")))
    live = pa.concat_tables(list(t.scan().iter_batches(batch_format="pyarrow")))

    import duckdb

    con = duckdb.connect()
    con.register("live", live)
    want = con.execute(
        "SELECT * FROM live WHERE v IN (3, 17, 42, 99) ORDER BY id").arrow()
    assert _sorted(got).cast(want.schema).equals(want)

    proj = t.scan(columns=["id"], predicate_in={"v": wanted})
    gp = pa.concat_tables(list(proj.iter_batches(batch_format="pyarrow")))
    assert gp.schema.names == ["id"]
    assert sorted(gp["id"].to_pylist()) == sorted(want["id"].to_pylist())

    # combined with a range (conjunction)
    both = t.scan(predicate_ranges={"v": (10, 50)}, exact_filter=True,
                  predicate_in={"v": wanted})
    gb = pa.concat_tables(list(both.iter_batches(batch_format="pyarrow")))
    wb = con.execute("SELECT * FROM live WHERE v BETWEEN 10 AND 50 "
                     "AND v IN (3, 17, 42, 99) ORDER BY id").arrow()
    assert _sorted(gb).cast(wb.schema).equals(wb)


def test_predicate_in_prunes_fragments(tmp_path):
    """On a clustered table, an IN-list far outside most zone maps
    produces fewer read tasks than a full scan."""
    t = MoonrayTable.create(str(tmp_path / "tbl"), key_col="id",
                            schema=SCHEMA, zone_cols=("v",),
                            index_partitions=4, rows_per_fragment=64)
    t.bulk_load(rd.from_items(
        [{"id": i, "v": i, "payload": "x"} for i in range(640)]))
    t.cluster(cols=["v"])
    full = t.scan()
    pruned = t.scan(predicate_in={"v": [5, 7]})
    n_full = len(full.input_files())
    n_pruned = len(pruned.input_files())
    assert 0 < n_pruned < n_full
    assert sorted(r["v"] for r in pruned.take_all()) == [5, 7]
