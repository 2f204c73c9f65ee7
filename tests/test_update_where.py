"""update_where: predicate UPDATE through the MERGE upsert path."""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest
import ray.data as rd

from moonray import MoonrayTable


def _mk(root: str, n: int = 400) -> MoonrayTable:
    schema = pa.schema([("id", pa.int64()), ("grp", pa.string()),
                        ("score", pa.float64())])
    t = MoonrayTable.create(root, key_col="id", schema=schema,
                            zone_cols=("score",), index_partitions=4,
                            rows_per_fragment=64)
    t.bulk_load(rd.from_arrow(pa.table({
        "id": pa.array(range(n), pa.int64()),
        "grp": pa.array(["a" if i % 2 else "b" for i in range(n)]),
        "score": pa.array(np.arange(n) * 1.0),
    })))
    return t


def _by_id(t) -> dict:
    out = {}
    for b in t.scan().iter_batches(batch_format="pyarrow"):
        for r in b.to_pylist():
            out[r["id"]] = (r["grp"], r["score"])
    return out


def test_update_where_matches_row_spec(tmp_path):
    t = _mk(str(tmp_path / "t"))

    def pred(b):
        return pc.and_(pc.greater_equal(b["score"], 100.0),
                       pc.less_equal(b["score"], 199.0))

    def bump(b):
        return b.set_column(
            b.column_names.index("score"), "score",
            pc.add(b["score"], 1000.0)).set_column(
            b.column_names.index("grp"), "grp",
            pa.array(["upd"] * len(b), pa.string()))

    v = t.update_where(pred, bump, lsn=50,
                       predicate_ranges={"score": (100.0, 199.0)},
                       exact_ranges=True)
    got = _by_id(t)
    assert len(got) == 400  # updates never change cardinality
    for i in range(400):
        if 100 <= i <= 199:
            assert got[i] == ("upd", i + 1000.0)
        else:
            assert got[i] == (("a" if i % 2 else "b"), float(i))
    # updates surface in the changelog as delete+insert at one version
    ops = {r["change_type"] for r in t.changes(v - 1, v).take_all()}
    assert ops == {"delete", "insert"}
    # idempotent replay under the same job id commits nothing new
    def bump2(b):
        return b.set_column(b.column_names.index("grp"), "grp",
                            pa.array(["upd2"] * len(b), pa.string()))

    pred2 = lambda b: pc.equal(b["id"], 0)
    v2 = t.update_where(pred2, bump2, lsn=51, job_id="once")
    assert t.update_where(pred2, bump2, lsn=51, job_id="once") == v2
    assert _by_id(t)[0] == ("upd2", 0.0)


def test_update_where_rejects_key_mutation_and_row_count(tmp_path):
    t = _mk(str(tmp_path / "t"), n=64)

    def pred(b):
        return pc.less_equal(b["score"], 10.0)

    with pytest.raises(Exception, match="key column"):
        t.update_where(
            pred, lambda b: b.set_column(
                b.column_names.index("id"), "id",
                pc.add(b["id"], 1_000_000)), lsn=60)
    with pytest.raises(Exception, match="exactly the rows"):
        t.update_where(pred, lambda b: b.slice(0, max(0, len(b) - 1)),
                       lsn=61)


def test_update_range_and_cli(tmp_path, capsys):
    import json

    from moonray.jobs.__main__ import main

    t = _mk(str(tmp_path / "t"), n=128)
    with pytest.raises(ValueError, match="key columns"):
        t.update_range({"score": (0.0, 5.0)}, {"id": 9}, lsn=70)
    with pytest.raises(ValueError, match="unknown columns"):
        t.update_range({"score": (0.0, 5.0)}, {"nope": 9}, lsn=70)
    t.update_range({"score": (10.0, 19.0)}, {"grp": "band"}, lsn=70)
    got = _by_id(t)
    assert all(got[i][0] == "band" for i in range(10, 20))
    assert got[5][0] in ("a", "b")

    def run(*argv):
        assert main(list(argv)) == 0
        return json.loads(capsys.readouterr().out.strip().splitlines()[-1])

    out = run("update-range", "--table", t.root,
              "--ranges-json", '{"score": [30, 39]}',
              "--set-json", '{"grp": "cli"}', "--lsn", "71")
    got = _by_id(t)
    assert all(got[i][0] == "cli" for i in range(30, 40))


# ---- model-based property test: a sequence of random range-updates
# applied to the table and to an in-memory model must stay identical ----

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@pytest.fixture(scope="module")
def upd_state(tmp_path_factory):
    root = tmp_path_factory.mktemp("updprop") / "tbl"
    t = MoonrayTable.create(
        str(root), key_col="id",
        schema=pa.schema([("id", pa.int64()), ("grp", pa.string()),
                          ("score", pa.float64())]),
        zone_cols=("score",), index_partitions=4, rows_per_fragment=32)
    n = 200
    t.bulk_load(rd.from_arrow(pa.table({
        "id": pa.array(range(n), pa.int64()),
        "grp": pa.array(["g"] * n),
        "score": pa.array([float((i * 13) % 97) for i in range(n)]),
    })))
    model = {i: ("g", float((i * 13) % 97)) for i in range(n)}
    return {"t": t, "model": model, "lsn": 100}


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(lo=st.integers(min_value=-10, max_value=110),
       width=st.integers(min_value=0, max_value=60),
       tag=st.sampled_from(["a", "b", "c"]),
       bump=st.integers(min_value=-3, max_value=3))
def test_update_range_lockstep_with_model(upd_state, lo, width, tag, bump):
    t, model = upd_state["t"], upd_state["model"]
    upd_state["lsn"] += 1
    lsn = upd_state["lsn"]
    lo_f, hi_f = float(lo), float(lo + width)
    t.update_range({"score": (lo_f, hi_f)},
                   {"grp": tag, "score": float(bump)}, lsn=lsn)
    for i, (g, s) in model.items():
        if lo_f <= s <= hi_f:
            model[i] = (tag, float(bump))
    assert _by_id(t) == model
