"""Property test: scan pushdown (ranges × IN-lists × projections ×
exact_filter) always matches the DuckDB answer on the same live rows.
One shared table (module fixture) keeps the Ray work per example tiny.
"""

import duckdb
import pyarrow as pa
import pytest
import ray.data as rd
from hypothesis import given, settings
from hypothesis import strategies as st

from moonray import MoonrayTable

SCHEMA = pa.schema([
    ("id", pa.int64()), ("v", pa.int64()), ("w", pa.float64()),
    ("payload", pa.string()),
])


@pytest.fixture(scope="module")
def tbl(tmp_path_factory):
    root = tmp_path_factory.mktemp("pushprop") / "tbl"
    t = MoonrayTable.create(str(root), key_col="id", schema=SCHEMA,
                            zone_cols=("v", "w"), index_partitions=4,
                            rows_per_fragment=32)
    t.bulk_load(rd.from_items(
        [{"id": i, "v": (i * 13) % 97, "w": float((i * 7) % 53) / 2,
          "payload": f"p{i}"} for i in range(400)]))
    t.merge(rd.from_items(
        [{"id": i, "v": 0, "w": 0.0, "payload": "", "op": "D",
          "lsn": 1000 + i} for i in range(0, 400, 11)]))
    t.cluster(cols=["v"])
    live = pa.concat_tables(
        list(t.scan().iter_batches(batch_format="pyarrow")))
    con = duckdb.connect()
    con.register("live", live)
    return t, con


bound = st.one_of(st.none(), st.integers(min_value=-5, max_value=100))


@settings(max_examples=15, deadline=None)
@given(lo=bound, hi=bound,
       in_vals=st.one_of(st.none(), st.lists(
           st.integers(min_value=-5, max_value=100), min_size=1,
           max_size=5)),
       exact=st.booleans(),
       project=st.booleans())
def test_pushdown_matches_duckdb(tbl, lo, hi, in_vals, exact, project):
    t, con = tbl
    ranges = {"v": (lo, hi)} if (lo is not None or hi is not None) else None
    in_sets = {"v": in_vals} if in_vals else None
    cols = ["id", "payload"] if project else None

    ds = t.scan(columns=cols, predicate_ranges=ranges,
                predicate_in=in_sets, exact_filter=exact)
    batches = list(ds.iter_batches(batch_format="pyarrow"))
    got = (pa.concat_tables(batches, promote_options="permissive")
           if batches else
           pa.table({c: pa.array([], SCHEMA.field(c).type)
                     for c in (cols or SCHEMA.names)}))

    conds = []
    if ranges and exact:
        if lo is not None:
            conds.append(f"v >= {lo}")
        if hi is not None:
            conds.append(f"v <= {hi}")
    if in_sets:
        conds.append("v IN (" + ",".join(map(str, in_vals)) + ")")
    sel = ", ".join(cols) if cols else "*"
    sql = f"SELECT {sel} FROM live"
    if conds:
        sql += " WHERE " + " AND ".join(conds)
    want = con.execute(sql + " ORDER BY id").arrow()

    if not exact and ranges:
        # pruning-only contract for the ranges: the result contains at
        # least every row matching (range AND any IN-list) and at most
        # every row matching the remaining exact conditions
        lo_c = [] if lo is None else [f"v >= {lo}"]
        hi_c = [] if hi is None else [f"v <= {hi}"]
        strict = conds + lo_c + hi_c
        sqs = "SELECT id FROM live"
        floor = set(r[0] for r in con.execute(
            sqs + (" WHERE " + " AND ".join(strict) if strict else "")
        ).fetchall())
        ceil = set(r[0] for r in con.execute(
            sqs + (" WHERE " + " AND ".join(conds) if conds else "")
        ).fetchall())
        got_ids = set(got["id"].to_pylist())
        assert floor <= got_ids <= ceil
        return
    assert got.sort_by("id").cast(want.schema).equals(want)
