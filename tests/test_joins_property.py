"""Property-based oracles for the bucketed join kernels: hypothesis
generates adversarial (user, ts) distributions — heavy ties, one-user
skew, empty sides — and checks the SHIPPED kernels
(joins.asof_bucket_kernel / joins.band_pairs_kernel) against brute-force
row loops (the shrinking complement to tests/test_joins.py's
fixed-fixture oracles). Pure-kernel tests: no Ray session needed."""

import numpy as np
import pyarrow as pa
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

ROWS = st.lists(
    st.tuples(st.integers(0, 4),          # user_id (few users → ties/skew)
              st.integers(0, 50),         # ts (small domain → many ties)
              st.booleans()),             # reference side?
    min_size=0, max_size=60)


def _group_table(rows, with_side=True):
    n = len(rows)
    cols = {
        "_bkt": pa.array([0] * n, pa.int32()),
        "event_id": pa.array(list(range(n)), pa.int64()),
        "user_id": pa.array([u for (u, _, _) in rows], pa.int64()),
        "ts_us": pa.array([t for (_, t, _) in rows], pa.int64()),
    }
    if with_side:
        cols["_side"] = pa.array([int(c) for (_, _, c) in rows], pa.int8())
    return pa.table(cols)


@settings(max_examples=60, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(rows=ROWS)
def test_asof_bucket_kernel_matches_row_loop(rows):
    from moonray.pipelines.joins import asof_bucket_kernel

    out = asof_bucket_kernel(_group_table(rows))
    got = dict(zip(out["event_id"].to_pylist(),
                   out["prior_ts"].cast(pa.int64()).to_pylist()))
    want = {}
    for i, (u, t, c) in enumerate(rows):
        if c:
            continue
        cand = [tc for (uc, tc, cc) in rows if cc and uc == u and tc <= t]
        if cand:
            want[i] = max(cand)
    assert got == want


@settings(max_examples=60, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(rows=ROWS, window=st.integers(0, 20))
def test_band_pairs_kernel_matches_quadratic(rows, window):
    from moonray.pipelines.joins import band_pairs_kernel

    out = band_pairs_kernel(_group_table(rows, with_side=False),
                            np.int64(window))
    got = set(zip(out["a_event_id"].to_pylist(),
                  out["b_event_id"].to_pylist()))
    gaps = dict(zip(zip(out["a_event_id"].to_pylist(),
                        out["b_event_id"].to_pylist()),
                    out["gap_us"].to_pylist()))
    want = {(ea, eb)
            for ea, (ua, ta, _) in enumerate(rows)
            for eb, (ub, tb, _) in enumerate(rows)
            if ua == ub and tb > ta and tb - ta <= window}
    assert got == want
    for (ea, eb), g in gaps.items():
        assert g == rows[eb][1] - rows[ea][1]
