"""Property-based merge semantics: hypothesis-generated CDC sequences
(the shrinking complement to the seeded chaos runs — reference test
strategy §5: randomized event sequences against invariants)."""

import pyarrow as pa
import ray.data as rd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from moonray.table import MoonrayTable

SCHEMA = pa.schema([
    ("id", pa.int64()), ("name", pa.string()), ("age", pa.int32()),
])

KEYS = st.integers(min_value=0, max_value=9)
OPS = st.sampled_from(["I", "U", "D"])


def _apply_oracle(state: dict, changes: list[dict]) -> dict:
    for c in sorted(changes, key=lambda c: c["lsn"]):
        if c["op"] == "D":
            state.pop(c["id"], None)
        else:
            state[c["id"]] = {"id": c["id"], "name": c["name"], "age": c["age"]}
    return state


@settings(max_examples=12, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(ops=st.lists(st.tuples(OPS, KEYS), min_size=1, max_size=25))
def test_merge_matches_oracle_for_any_sequence(tmp_path_factory, ops):
    root = tmp_path_factory.mktemp("prop")
    t = MoonrayTable.create(str(root), key_col="id", schema=SCHEMA,
                            index_partitions=4, rows_per_fragment=4)
    base = [{"id": i, "name": f"base{i}", "age": i} for i in range(5)]
    t.bulk_load(rd.from_items(base))
    state = {r["id"]: dict(r) for r in base}

    # split the op sequence into 1-3 commit batches (batch-atomic apply)
    changes = []
    for lsn, (op, key) in enumerate(ops, start=1):
        row = {"op": op, "lsn": lsn, "id": key,
               "name": None if op == "D" else f"v{lsn}",
               "age": None if op == "D" else lsn}
        changes.append(row)
    cut = max(1, len(changes) // 2)
    for bi, batch in enumerate([changes[:cut], changes[cut:]]):
        if not batch:
            continue
        t.merge(rd.from_items(batch), job_id=f"prop-{bi}")
        state = _apply_oracle(state, batch)

    got_batches = [b for b in t.scan().iter_batches(batch_format="pyarrow",
                                                    batch_size=1024)]
    got = ({r["id"]: r for r in pa.concat_tables(got_batches).to_pylist()}
           if got_batches else {})
    assert got == state
    assert t.describe()["cardinality"] == len(state)
