"""Distributed constraint validation (data-quality checks).

Warehouse-grade ingestion validates tables against declared
expectations (Delta constraints / Great Expectations / deequ): key
uniqueness, NOT NULL, value ranges, categorical domains. Each check is
expressed as a mergeable partial so validation is one streaming pass
plus (for uniqueness only) one thin combiner-reduced shuffle:

- not_null / range / in_set: every batch reduces to ONE
  (constraint, column, n_violations) row; the fold is O(batches ×
  constraints) thin rows.
- unique: violations = count(non-null keys) − count(distinct keys).
  A per-batch (key, cnt) combiner shrinks the exchange to one row per
  distinct key per batch, a groupby(key) sum dedups globally, and a
  Σ(cnt−1) partial finishes — the shuffle is ∝ distinct keys, never
  rows. ``dup_keys`` exposes the offending keys themselves the same
  way (filter cnt > 1 after the global sum).

Semantics match SQL: NULLs violate only not_null — they are excluded
from unique/range/in_set (a NULL comparison is unknown, not false).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

_SCHEMA = pa.schema([("constraint", pa.string()),
                     ("column", pa.string()),
                     ("n_violations", pa.int64())])


def _sql_lit(v) -> str:
    if isinstance(v, str):
        return "'" + v.replace("'", "''") + "'"
    return repr(v)


def check_constraints(ds, *, unique: tuple = (), not_null: tuple = (),
                      ranges: dict | None = None,
                      in_set: dict | None = None):
    """Validate ``ds``; returns a Dataset with one row per declared
    constraint: (constraint, column, n_violations). ``not_null`` is a
    column-name tuple; ``unique`` entries are column names OR tuples
    (a tuple asserts the composite key is unique, reported under the
    comma-joined name); ``ranges`` maps column → (lo, hi) inclusive;
    ``in_set`` maps column → allowed values."""
    import numpy as np
    import ray.data as rd
    from ray.data.aggregate import Sum

    ranges = dict(ranges or {})
    in_set = {k: list(v) for k, v in (in_set or {}).items()}
    nn, rg, ins = tuple(not_null), ranges, in_set

    def partial(b: pa.Table) -> pa.Table:
        cons, cols, viol = [], [], []
        for c in nn:
            cons.append("not_null"); cols.append(c)
            viol.append(b[c].null_count)
        for c, (lo, hi) in rg.items():
            v = b[c].drop_null()
            bad = pc.or_(pc.less(v, lo), pc.greater(v, hi))
            if pa.types.is_floating(v.type):
                # NaN is unordered for Arrow (never < or >) but DuckDB
                # orders NaN above everything, so NaN > hi is a
                # violation there — count NaN explicitly to match the
                # SQL oracle's semantics on float columns
                bad = pc.or_(bad, pc.is_nan(v))
            cons.append("range"); cols.append(c)
            viol.append(int(pc.sum(bad).as_py() or 0))
        for c, allowed in ins.items():
            v = b[c].drop_null()
            bad = pc.sum(pc.invert(pc.is_in(v, value_set=pa.array(allowed))))
            cons.append("in_set"); cols.append(c)
            viol.append(int(bad.as_py() or 0))
        return pa.Table.from_pydict(
            {"constraint": cons, "column": cols,
             "n_violations": pa.array(viol, pa.int64())}, schema=_SCHEMA)

    rows = []
    if nn or rg or ins:
        partial.__name__ = "constraint_partials"
        thin = ds.map_batches(partial, batch_format="pyarrow").take_all()
        acc: dict[tuple, int] = {}
        for r in thin:
            k = (r["constraint"], r["column"])
            acc[k] = acc.get(k, 0) + r["n_violations"]
        rows = [(c, col, n) for (c, col), n in acc.items()]

    for key in unique:
        # composite constraints: a tuple/list entry asserts the key
        # TUPLE is unique (the MERGE identity invariant); rows with ANY
        # null component are excluded (SQL unknown semantics)
        kcols = [key] if isinstance(key, str) else list(key)

        def kcounts(b: pa.Table, _ks=tuple(kcols)) -> pa.Table:
            t = b.select(list(_ks))
            t = t.drop_null()
            g = t.group_by(list(_ks)).aggregate([([], "count_all")])
            return g.rename_columns(list(_ks) + ["cnt"])

        kcounts.__name__ = "key_count_partials"

        def excess(b: pa.Table) -> pa.Table:
            e = pc.sum(pc.subtract(b["cnt"].cast(pa.int64()), 1))
            return pa.table({"x": pa.array([int(e.as_py() or 0)], pa.int64())})

        excess.__name__ = "excess_partial"
        gkey = kcols[0] if len(kcols) == 1 else kcols
        parts = (ds.map_batches(kcounts, batch_format="pyarrow")
                 .groupby(gkey).aggregate(Sum("cnt", alias_name="cnt"))
                 .map_batches(excess, batch_format="pyarrow").take_all())
        rows.append(("unique", ",".join(kcols), sum(r["x"] for r in parts)))

    rows.sort()
    return rd.from_arrow(pa.Table.from_pydict(
        {"constraint": [r[0] for r in rows],
         "column": [r[1] for r in rows],
         "n_violations": pa.array([r[2] for r in rows], pa.int64())},
        schema=_SCHEMA))


def dup_keys(ds, key: str):
    """The keys that violate uniqueness, with their multiplicities:
    (key value, cnt > 1). Combiner-reduced, shuffle ∝ distinct keys."""
    from ray.data.aggregate import Sum

    def kcounts(b: pa.Table) -> pa.Table:
        t = pa.table({key: b[key].combine_chunks().drop_null()})
        g = t.group_by(key).aggregate([([], "count_all")])
        return g.rename_columns([key, "cnt"])

    kcounts.__name__ = "key_count_partials"

    def dups(b: pa.Table) -> pa.Table:
        c = b["cnt"].cast(pa.int64())
        return (b.set_column(b.schema.get_field_index("cnt"), "cnt", c)
                .filter(pc.greater(c, 1)))

    dups.__name__ = "keep_dups"
    return (ds.map_batches(kcounts, batch_format="pyarrow")
            .groupby(key).aggregate(Sum("cnt", alias_name="cnt"))
            .map_batches(dups, batch_format="pyarrow"))


def check_constraints_oracle_sql(table: str, *, unique: tuple = (),
                                 not_null: tuple = (),
                                 ranges: dict | None = None,
                                 in_set: dict | None = None) -> str:
    """DuckDB UNION ALL mirror of check_constraints (same constraint
    labels, same NULL semantics), ordered like the Ray output."""
    def arm(label: str, col: str, expr: str) -> str:
        # every arm aliases the output columns: UNION ALL names come
        # from the first SELECT, and which family comes first depends
        # on which constraints the caller declared
        return (f"SELECT '{label}' AS \"constraint\", '{col}' AS "
                f"\"column\", {expr} AS n_violations FROM {table}")

    arms = []
    for c in (in_set or {}):
        vals = ", ".join(_sql_lit(v) for v in in_set[c])
        arms.append(arm("in_set", c,
                        f"COUNT(*) FILTER (WHERE {c} IS NOT NULL "
                        f"AND {c} NOT IN ({vals}))"))
    for c in not_null:
        arms.append(arm("not_null", c, f"COUNT(*) - COUNT({c})"))
    for c, (lo, hi) in (ranges or {}).items():
        arms.append(arm("range", c,
                        f"COUNT(*) FILTER (WHERE {c} < {_sql_lit(lo)} "
                        f"OR {c} > {_sql_lit(hi)})"))
    for key in unique:
        kcols = [key] if isinstance(key, str) else list(key)
        nn = " AND ".join(f"{c} IS NOT NULL" for c in kcols)
        tup = ", ".join(kcols)
        arms.append(arm("unique", ",".join(kcols),
                        f"COUNT(*) FILTER (WHERE {nn}) - "
                        f"COUNT(DISTINCT ({tup})) FILTER (WHERE {nn})"))
    return (" UNION ALL ".join(arms)
            + ' ORDER BY "constraint", "column"')
