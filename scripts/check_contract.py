"""Local stand-in for the driver's correctness gate: run every
queries() entry at a given sf, run the matching oracle_sql() in DuckDB
over the same parquet views, and compare row count + schema + values
(order-insensitive, exact). Usage:

    python scripts/check_contract.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import pandas as pd

TABLES = ("region nation customer supplier part orders lineitem "
          "events documents embeddings").split()


def to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data as rd

    if isinstance(res, rd.Dataset):
        tbl = pa.concat_tables(
            [b for b in res.iter_batches(batch_format="pyarrow", batch_size=65536)]
        ) if res.count() else res.schema().empty_table()
        return tbl.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def main():
    import ray

    # workers at nice 0, not Ray's default 15 — see bench._init_ray
    os.environ.setdefault("RAY_worker_niceness", "0")

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    ray.init(address="local", num_cpus=8, include_dashboard=False,
             logging_level="ERROR")
    ray.data.DataContext.get_current().enable_progress_bars = False

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as e

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs, oracles = e.queries(), e.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            got = normalize(to_pandas(fn(sf_dir)))
        except Exception as ex:
            failures.append((name, f"query raised: {ex!r}"))
            print(f"FAIL  {name}: query raised {ex!r}")
            continue
        dt = time.time() - t0
        sql = oracles.get(name)
        if sql is None:
            print(f"rows  {name}: {len(got)} rows ({dt:.1f}s, rows-only check)")
            continue
        want = normalize(con.sql(sql).df())
        status = "ok"
        if list(got.columns) != list(want.columns):
            status = f"SCHEMA got={list(got.columns)} want={list(want.columns)}"
        elif len(got) != len(want):
            status = f"ROWS got={len(got)} want={len(want)}"
        else:
            try:
                # check_dtype=True: the driver's value-hash is dtype-sensitive
                # (r1 lesson — DuckDB sum(BIGINT)->HUGEINT->float64 vs Ray int64
                # passed a dtype-lax compare but failed the driver hash).
                pd.testing.assert_frame_equal(got, want, check_dtype=True,
                                              check_exact=True)
            except AssertionError as ex:
                status = "VALUES " + str(ex).splitlines()[-1][:200]
        if status == "ok":
            print(f"ok    {name}: {len(got)} rows ({dt:.1f}s)")
        else:
            failures.append((name, status))
            print(f"FAIL  {name}: {status}")
    ray.shutdown()
    if failures:
        print(f"\n{len(failures)} FAILURES")
        sys.exit(1)
    print("\nALL OK")


if __name__ == "__main__":
    main()
