"""Watermark semantics for event-time windows (late-data accounting).

The tumbling/hopping operators aggregate pure event time; a streaming
engine also needs WATERMARKS: events that arrive after their window
closed are routed to a late side-channel instead of mutating an
already-emitted result (Flink/Beam allowed-lateness semantics; the
reference's LSN-ordered ingest gives the same replayable arrival
order). Batch replay makes this deterministic: arrival order is the
``arrival_col`` (event_id / LSN), and the watermark after an arrival is
``max(event time seen so far) − delay``. An event is late iff its
window end ≤ that watermark.

The running max over GLOBAL arrival order is the one non-embarrassing
step; it distributes as the classic two-phase scan:

1. **carry pass** (thin): a min/max/count aggregate sizes RANGE buckets
   over the measured arrival domain (arrival keys may be sparse or
   scrambled — dense-id division would make one bucket per row), then
   batches reduce to one (bucket, max_ts) row per bucket. The driver
   folds these into per-bucket exclusive prefix maxes — bucket count
   is capped at 64k (``bucket_rows`` sets the target rows per bucket),
   so driver state stays O(64k) and ships once via ray.put.
2. **window pass**: one groupby(bucket) shuffle; each group sorts by
   arrival, takes its local inclusive running max ⊔ carry-in, flags
   lateness, and reduces to per-window partials (on-time count,
   int-cent sum, late count). A final thin groupby(window) sums.

Value sums use half-up integer cents (the module-wide SQL-parity
convention) so the DuckDB oracle matches bit-for-bit.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def watermark_windows(ds, *, window_us: int, delay_us: int,
                      arrival_col: str = "event_id",
                      ts_col: str = "ts", value_col: str = "value",
                      bucket_rows: int = 4096):
    """→ Dataset (wstart, n_on_time, sum_cents, n_late): tumbling
    windows of ``window_us`` with allowed lateness ``delay_us`` under
    arrival order ``arrival_col``. Windows whose every event arrived
    late still appear (n_on_time=0, late counted)."""
    import ray
    import ray.data as rd
    from ray.data.aggregate import Count, Max, Min, Sum

    if "_bk" in (ds.schema().names or []):
        raise ValueError("input already has a '_bk' column (reserved)")

    # slim FIRST, then materialize: the three passes below (domain
    # aggregate, carry pass, window pass) would otherwise re-execute
    # the whole upstream pipeline three times. The cached blocks hold
    # only (arrival, ts, value); Ray spills them if they outgrow the
    # object store.
    cols = [arrival_col, ts_col, value_col]
    ds = ds.map_batches(
        lambda b, _c=tuple(cols): b.select(list(_c)),
        batch_format="pyarrow").materialize()

    # bucket by RANGE over the measured arrival domain, not by id
    # division: arrival keys may be sparse/scrambled (a dense-id
    # assumption turns every row into its own bucket — measured 65 s
    # at 100k events). One cheap aggregate pass sizes the buckets;
    # bucket count is bounded so the driver carry stays O(64k) max.
    dom = ds.aggregate(Min(arrival_col), Max(arrival_col), Count())
    if not dom or dom["count()"] == 0:
        return rd.from_arrow(pa.table({
            "wstart": pa.array([], pa.int64()),
            "n_on_time": pa.array([], pa.int64()),
            "sum_cents": pa.array([], pa.int64()),
            "n_late": pa.array([], pa.int64())}))
    lo = np.int64(dom[f"min({arrival_col})"])
    hi = np.int64(dom[f"max({arrival_col})"])
    n_rows = int(dom["count()"])
    n_buckets = min(max(n_rows // max(bucket_rows, 1), 1), 65536)
    span = np.int64(max(int(hi - lo) + 1, 1))
    bw = np.int64(-(-int(span) // n_buckets))  # ceil

    def thin(b: pa.Table) -> pa.Table:
        if len(b) == 0:  # reduceat on an empty array raises
            return pa.table({"bucket": pa.array([], pa.int64()),
                             "mx": pa.array([], pa.int64())})
        arr = b[arrival_col].to_numpy(zero_copy_only=False)
        us = b[ts_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
        bk = (arr - lo) // bw
        order = np.argsort(bk, kind="stable")
        bs, uss = bk[order], us[order]
        starts = np.r_[0, np.flatnonzero(bs[1:] != bs[:-1]) + 1]
        mx = np.maximum.reduceat(uss, starts)
        return pa.table({"bucket": pa.array(bs[starts]),
                         "mx": pa.array(mx)})

    thin.__name__ = "bucket_max_partials"
    parts = ds.map_batches(thin, batch_format="pyarrow").take_all()
    bmax: dict[int, int] = {}
    for r in parts:
        bmax[r["bucket"]] = max(bmax.get(r["bucket"], -(1 << 62)), r["mx"])
    buckets = sorted(bmax)
    carry_vals = np.array([bmax[b] for b in buckets], dtype=np.int64)
    # exclusive prefix max: carry into bucket i = max of buckets < i
    excl = np.empty_like(carry_vals)
    if len(carry_vals):
        excl[0] = -(1 << 62)
        if len(carry_vals) > 1:
            np.maximum.accumulate(carry_vals[:-1], out=excl[1:])
    carry = {b: int(excl[i]) for i, b in enumerate(buckets)}
    carry_ref = ray.put(carry)

    W, D = np.int64(window_us), np.int64(delay_us)

    def add_bucket(b: pa.Table) -> pa.Table:
        arr = b[arrival_col].to_numpy(zero_copy_only=False)
        return b.append_column("_bk", pa.array((arr - lo) // bw))

    add_bucket.__name__ = "assign_bucket"

    def window_group(grp: pa.Table) -> pa.Table:
        import ray as _ray

        cin = _ray.get(carry_ref)[grp["_bk"][0].as_py()]
        order = pc.sort_indices(grp, sort_keys=[(arrival_col, "ascending")])
        g = grp.take(order)
        us = g[ts_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
        wm = np.maximum(np.maximum.accumulate(us), np.int64(cin))
        wstart = (us // W) * W
        late = (wm - D) >= (wstart + W)
        # NULL values: the row still counts (SQL count(*)) but adds 0
        # to the sum (SQL sum() skips NULLs) — an unguarded NaN would
        # int64-cast to INT64_MIN and silently poison sum_cents
        vals = g[value_col].to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        vals = np.where(np.isnan(vals), 0.0, vals)
        cents = np.floor(vals * 100 + 0.5).astype(np.int64)
        t = pa.table({
            "wstart": pa.array(wstart),
            "n_on_time": pa.array((~late).astype(np.int64)),
            "sum_cents": pa.array(np.where(late, 0, cents)),
            "n_late": pa.array(late.astype(np.int64)),
        })
        g2 = t.group_by("wstart", use_threads=False).aggregate(
            [("n_on_time", "sum"), ("sum_cents", "sum"), ("n_late", "sum")])
        return pa.table({
            "wstart": g2["wstart"],
            "n_on_time": g2["n_on_time_sum"].cast(pa.int64()),
            "sum_cents": g2["sum_cents_sum"].cast(pa.int64()),
            "n_late": g2["n_late_sum"].cast(pa.int64()),
        })

    window_group.__name__ = "watermark_window_group"
    return (ds.map_batches(add_bucket, batch_format="pyarrow")
            .groupby("_bk").map_groups(window_group, batch_format="pyarrow")
            .groupby("wstart")
            .aggregate(Sum("n_on_time", alias_name="n_on_time"),
                       Sum("sum_cents", alias_name="sum_cents"),
                       Sum("n_late", alias_name="n_late")))


# SQL-expressible deterministic scramble of the arrival order: the
# fixture's event_id is time-ordered (nothing would ever be late), so
# tests/queries replay arrivals in Knuth-hash order. The int64 product
# bound is event_id ≤ floor(2^63/2654435761) ≈ 3.47e9 — NOT 2^32;
# add_scrambled_arrival enforces it loudly (numpy would wrap silently
# where DuckDB errors, breaking the bijection AND the oracle).
_ARRIVAL_MAX_ID = (1 << 63) // 2654435761
ARRIVAL_EXPR = "(event_id * 2654435761) % 4294967296"


def add_scrambled_arrival(ds, col: str = "arrival"):
    """Append the ARRIVAL_EXPR arrival key (vectorized, int64-exact).
    The key is a bijection of event_id mod 2^32, so distinct ids below
    2^32 get distinct keys (no arrival-order ties)."""
    def add(b: pa.Table) -> pa.Table:
        e = b["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(e) and (e.max() > _ARRIVAL_MAX_ID or e.min() < 0):
            raise ValueError(
                f"event_id outside [0, {_ARRIVAL_MAX_ID}]: the scramble "
                "product would overflow int64")
        a = (e * np.int64(2654435761)) % np.int64(4294967296)
        return b.append_column(col, pa.array(a, pa.int64()))

    add.__name__ = "scrambled_arrival"
    return ds.map_batches(add, batch_format="pyarrow")


def watermark_windows_oracle_sql(window_us: int, delay_us: int,
                                 table: str = "events",
                                 arrival_expr: str = "event_id") -> str:
    """DuckDB mirror: running max over arrival order via a window
    function, identical lateness rule and int-cent sums."""
    W, D = window_us, delay_us
    return f"""
        WITH a AS (
          SELECT {arrival_expr} AS arr, epoch_us(ts) AS us, value,
                 max(epoch_us(ts)) OVER (ORDER BY {arrival_expr}
                     ROWS UNBOUNDED PRECEDING) AS mx
          FROM {table}
        ),
        c AS (
          SELECT (us // {W}) * {W} AS wstart,
                 CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents,
                 (mx - {D}) >= ((us // {W}) + 1) * {W} AS late
          FROM a
        )
        SELECT wstart,
               count(*) FILTER (WHERE NOT late) AS n_on_time,
               CAST(COALESCE(sum(cents) FILTER (WHERE NOT late), 0)
                    AS BIGINT) AS sum_cents,
               count(*) FILTER (WHERE late) AS n_late
        FROM c GROUP BY wstart
    """
