"""Distributed column profiler — ANALYZE TABLE for training corpora.

The reference keeps per-fragment zone stats as internal metadata
(src/moonlink/src/storage/mooncake_table.rs snapshot counters and the
parquet footer min/max it prunes with); a data-curation engine also
needs corpus-level per-COLUMN statistics as a first-class, queryable
operator (Spark ANALYZE TABLE / deequ-style profiling): row counts,
null counts, distinct cardinality, min/max, string length mass, and
most-frequent values. Everything here is mergeable-partial +
thin-shuffle; nothing materializes data rows on the driver.

- ``profile_columns``: one output row per profiled column.
  Cheap moments (rows, nulls, min, max, len_sum) reduce per batch to
  ONE thin row per (batch, column) and fold in a groupby("column")
  map_groups — the exchange is O(batches × columns), never O(rows).
  Distinct cardinality runs as ONE extra pass for ALL columns at once:
  per batch each column's values dedup locally and hash to a
  column-salted uint64, the (column, ck) stream dedups globally on ck,
  and a count per column finishes — shuffle ∝ Σ distinct values.
  ``distinct="hash64"`` (default) trades a 2^-64-per-pair collision
  probability for the single shared pass; ``distinct="exact"`` runs
  one native-type dedup per column (functions/sketch
  distinct_count_exact) when provable exactness matters more than
  passes.
- ``top_values``: exact most-frequent-k values of one column —
  per-batch Arrow group_by counts (combiner), one groupby(value) sum,
  then an algebraic global top-k (partial top-k per block, single
  final merge). Ties break on value ascending so the result is total
  and SQL-reproducible.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from moonray.util import hash_key_array, splitmix64

def _is_num(t: pa.DataType) -> bool:
    return (pa.types.is_integer(t) or pa.types.is_floating(t)
            or pa.types.is_decimal(t))


def dtype_family(dtype_str: str) -> str | None:
    """Stat family from the reported Arrow dtype STRING — anchored, so
    composite dtypes that merely contain 'int'/'string' (dictionary,
    list, struct) fall into the neither family (all-NULL stats), which
    is exactly what the Ray side computes for them."""
    import re

    if re.match(r"^(u?int(8|16|32|64)|halffloat|float|double|decimal)",
                dtype_str):
        return "num"
    if dtype_str in ("string", "large_string"):
        return "str"
    return None


def _col_salt(name: str) -> np.uint64:
    # independent hash lane per column so equal values in different
    # columns never share a ck (the global dedup key)
    return splitmix64(
        hash_key_array(pa.array([name]))).astype(np.uint64)[0]


_STATS_SCHEMA = pa.schema([
    ("column", pa.string()),
    ("dtype", pa.string()),
    ("n_rows", pa.int64()),
    ("n_null", pa.int64()),
    ("min_num", pa.float64()),
    ("max_num", pa.float64()),
    ("min_str", pa.string()),
    ("max_str", pa.string()),
    ("len_sum", pa.int64()),
])


def _partial_stats(b: pa.Table, columns: list[str]) -> pa.Table:
    rows = {k: [] for k in
            ("column", "dtype", "n_rows", "n_null", "min_num", "max_num",
             "min_str", "max_str", "len_sum")}
    for name in columns:
        col = b[name]
        t = col.type
        nn = col.null_count
        rows["column"].append(name)
        rows["dtype"].append(str(t))
        rows["n_rows"].append(len(col))
        rows["n_null"].append(nn)
        mn = mx = None
        ms = xs = None
        ls = None
        if len(col) > nn:
            if _is_num(t):
                agg = pc.min_max(col)
                mn = float(agg["min"].as_py())
                mx = float(agg["max"].as_py())
            elif pa.types.is_string(t) or pa.types.is_large_string(t):
                agg = pc.min_max(col)
                ms = agg["min"].as_py()
                xs = agg["max"].as_py()
                ls = int(pc.sum(pc.utf8_length(col)).as_py())
        rows["min_num"].append(mn)
        rows["max_num"].append(mx)
        rows["min_str"].append(ms)
        rows["max_str"].append(xs)
        rows["len_sum"].append(ls)
    return pa.Table.from_pydict(rows, schema=_STATS_SCHEMA)


def _fold_stats(grp: pa.Table) -> pa.Table:
    name = grp["column"][0].as_py()
    dtype = grp["dtype"][0].as_py()

    def _tot(c):  # int64 sum over partials
        v = pc.sum(grp[c])
        return int(v.as_py()) if v.is_valid else None

    def _ext(c, fn):
        col = grp[c].drop_null()
        if len(col) == 0:
            return None
        return fn(col).as_py()

    ls = _tot("len_sum") if grp["len_sum"].null_count < len(grp) else None
    return pa.Table.from_pydict({
        "column": [name], "dtype": [dtype],
        "n_rows": [_tot("n_rows")], "n_null": [_tot("n_null")],
        "min_num": [_ext("min_num", pc.min)],
        "max_num": [_ext("max_num", pc.max)],
        "min_str": [_ext("min_str", pc.min)],
        "max_str": [_ext("max_str", pc.max)],
        "len_sum": [ls],
    }, schema=_STATS_SCHEMA)


_CID_BITS = 6  # ≤64 columns per distinct pass; 58 hash bits remain


def _partial_distinct(b: pa.Table, columns: list[str],
                      salts: dict[str, int]) -> pa.Table:
    """One thin (ck,) row per distinct value per batch, ALL columns in
    one stream: the column id rides the hash's low _CID_BITS so the
    global dedup is a single int64-keyed groupby (a string column key
    measurably slows the 2M-row exchange) and the per-column counts
    fall out of a bincount over those bits. 58 effective hash bits
    keep the collision odds ~n²/2^59 — still negligible, still
    disclosed (use distinct="exact" when it isn't)."""
    keys = []
    for cid, name in enumerate(columns):
        vals = b[name].combine_chunks().drop_null()
        if len(vals) == 0:
            continue
        u = pc.unique(vals)
        ck = splitmix64(hash_key_array(u) ^ np.uint64(salts[name]))
        ck = (ck & np.uint64(~np.uint64((1 << _CID_BITS) - 1))) \
            | np.uint64(cid)
        # int64 BIT VIEW, not a value cast: uint64 above 2^63 makes
        # Ray's hash-shuffle aggregate fall back to pickled-object
        # columns (measured on the 1M-row probe)
        keys.append(ck.view(np.int64))
    if not keys:
        return pa.table({"ck": pa.array([], pa.int64())})
    return pa.table({"ck": pa.array(np.concatenate(keys))})


def profile_columns(ds, columns: list[str] | None = None, *,
                    distinct: str = "hash64"):
    """Profile ``columns`` (default: every top-level column of the
    dataset schema): returns a Dataset with one row per column —
    (column, dtype, n_rows, n_null, n_distinct, min_num, max_num,
    min_str, max_str, len_sum). Numeric extremes land in
    min_num/max_num (cast to double), string extremes and total
    UTF-8 length in min_str/max_str/len_sum; the other family is NULL.
    Nulls are excluded from distinct/min/max/len_sum (SQL semantics).
    """
    import ray.data as rd
    from ray.data.aggregate import Count

    if columns is None:
        columns = ds.schema().names
    cols = list(columns)

    def partial(b: pa.Table) -> pa.Table:
        return _partial_stats(b, cols)

    partial.__name__ = "profile_partials"
    stats = (ds.map_batches(partial, batch_format="pyarrow")
             .groupby("column").map_groups(_fold_stats,
                                           batch_format="pyarrow"))

    if distinct == "exact":
        from moonray.functions.sketch import distinct_count_exact
        nd = {c: distinct_count_exact(ds, c, out_col="n")
              .take_all()[0]["n"] for c in cols}
    elif distinct == "hash64":
        nd = {}
        # ≤64 columns share a pass (cid rides the hash's low bits)
        for lo in range(0, len(cols), 1 << _CID_BITS):
            chunk = cols[lo:lo + (1 << _CID_BITS)]
            salts = {c: int(_col_salt(c)) for c in chunk}

            def pd_(b: pa.Table, _chunk=chunk, _salts=salts) -> pa.Table:
                return _partial_distinct(b, _chunk, _salts)

            pd_.__name__ = "distinct_partials"

            def cid_counts(b: pa.Table, _n=len(chunk)) -> pa.Table:
                ck = b["ck"].to_numpy(zero_copy_only=False) \
                    .view(np.uint64)
                cnt = np.bincount(
                    (ck & np.uint64((1 << _CID_BITS) - 1)).astype(np.int64),
                    minlength=_n)
                return pa.table({"cid": pa.array(np.arange(_n, dtype=np.int64)),
                                 "n": pa.array(cnt[:_n])})

            cid_counts.__name__ = "cid_counts"
            # dedup via ONE int64-keyed aggregate (no per-group Python,
            # no string key), then thin per-block bincount partials
            parts = (ds.map_batches(pd_, batch_format="pyarrow")
                     .groupby("ck").aggregate(Count(alias_name="_c"))
                     .map_batches(cid_counts, batch_format="pyarrow")
                     .take_all())
            acc = np.zeros(len(chunk), dtype=np.int64)
            for r in parts:
                acc[r["cid"]] += r["n"]
            nd.update({c: int(acc[i]) for i, c in enumerate(chunk)})
    else:
        raise ValueError(f"distinct mode {distinct!r}")

    # both sides are O(columns) rows — fold on the driver
    st = stats.take_all()
    st.sort(key=lambda r: r["column"])
    out = pa.Table.from_pydict({
        "column": [r["column"] for r in st],
        "dtype": [r["dtype"] for r in st],
        "n_rows": [r["n_rows"] for r in st],
        "n_null": [r["n_null"] for r in st],
        "n_distinct": [nd.get(r["column"], 0) for r in st],
        "min_num": [r["min_num"] for r in st],
        "max_num": [r["max_num"] for r in st],
        "min_str": [r["min_str"] for r in st],
        "max_str": [r["max_str"] for r in st],
        "len_sum": [r["len_sum"] for r in st],
    })
    return rd.from_arrow(out)


def profile_columns_oracle_sql(table: str, columns: list[str],
                               dtypes: dict[str, str]) -> str:
    """DuckDB equivalent of profile_columns over ``table``: one UNION
    ALL arm per column. ``dtypes`` maps column → the Arrow dtype string
    the Ray side reports (the SQL emits it as a literal)."""
    arms = []
    for c in columns:
        dt = dtypes[c]
        fam = dtype_family(dt)
        mn = mx = "CAST(NULL AS DOUBLE)"
        ms = xs = "CAST(NULL AS VARCHAR)"
        ls = "CAST(NULL AS BIGINT)"
        if fam == "num":
            mn = f"CAST(MIN({c}) AS DOUBLE)"
            mx = f"CAST(MAX({c}) AS DOUBLE)"
        elif fam == "str":
            ms, xs = f"MIN({c})", f"MAX({c})"
            ls = f"CAST(SUM(LENGTH({c})) AS BIGINT)"
        arms.append(f"""
          SELECT '{c}' AS "column", '{dt}' AS dtype,
                 COUNT(*) AS n_rows,
                 COUNT(*) - COUNT({c}) AS n_null,
                 COUNT(DISTINCT {c}) AS n_distinct,
                 {mn} AS min_num, {mx} AS max_num,
                 {ms} AS min_str, {xs} AS max_str,
                 {ls} AS len_sum
          FROM {table}""")
    return " UNION ALL ".join(arms)


def top_values(ds, col: str, k: int = 10):
    """Exact top-k most frequent values of ``col`` (nulls excluded):
    returns (value, cnt) with ties broken value-ascending. Per-batch
    Arrow group_by count combiner → groupby(value) global sum → one
    partial-top-k pass per block and a single final merge (the
    exchange after the combiner is ∝ distinct values, the final
    reduce sees ≤ k × n_blocks rows)."""
    from ray.data.aggregate import Sum

    def counts(b: pa.Table) -> pa.Table:
        t = pa.table({"value": b[col].combine_chunks().drop_null()})
        g = t.group_by("value").aggregate([([], "count_all")])
        return g.rename_columns(["value", "cnt"])

    counts.__name__ = "partial_value_counts"
    agg = (ds.map_batches(counts, batch_format="pyarrow")
           .groupby("value").aggregate(Sum("cnt", alias_name="cnt")))

    def tag(b: pa.Table) -> pa.Table:
        c = b["cnt"].cast(pa.int64())
        return pa.table({"value": b["value"], "cnt": c,
                         "_g": pa.array(np.zeros(len(b), np.int64))})

    tag.__name__ = "tag_const_group"
    from moonray.functions.topk import top_k_per_group
    top = top_k_per_group(agg.map_batches(tag, batch_format="pyarrow"),
                          group="_g", by="cnt", tie="value", k=k)
    return top.drop_columns(["_g"])


def top_values_oracle_sql(table: str, col: str, k: int = 10) -> str:
    return f"""
        SELECT {col} AS value, COUNT(*) AS cnt
        FROM {table} WHERE {col} IS NOT NULL
        GROUP BY {col}
        ORDER BY cnt DESC, value ASC
        LIMIT {k}
    """
