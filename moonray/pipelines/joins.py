"""Distributed joins, Ray-Data-first.

The reference exposes joins only as internals (the MERGE delete-key
lookup join, src/moonlink/src/storage/index/hash_index.rs:392, and the
DataFusion scan handoff where the SQL engine joins); a standalone
engine needs them as first-class operators. Four doctrine shapes, each
with a DuckDB oracle in __ray_entry__:

- **broadcast dim join** (`broadcast_region_enrich`): the small side
  (nation x region, O(KB)) is read once on the driver, shipped once via
  ``ray.put``, and applied as a vectorized ``np.take`` lookup inside
  ``map_batches`` — no shuffle at all. This is the only sane plan when
  one side fits in memory, at any cluster size.
- **big-big hash equi-join** (`order_lineitem_revenue`): both sides
  hash-partition on the join key into the same bucket space (one
  all-to-all of THIN projected columns), then each bucket joins locally
  with Arrow's hash join. The probe side pre-aggregates per key inside
  ``map_batches`` before the shuffle (TPC-H-style partial agg), so the
  exchange carries one row per (batch, key), not one per lineitem.
- **as-of join** (`asof_purchase_last_click`): for each purchase event,
  the latest prior click by the same user — the classic
  point-in-time/backfill join. Per-user streams hash-bucket together;
  inside a bucket the match is one vectorized ``searchsorted`` over a
  (user, ts) composite key, no per-row loop.
- **banded interval self-join** (`events_band_pairs`): all event pairs
  by the same user within a bounded time window. The band bound is what
  keeps it tractable: sorted by (user, ts), each row's matches are a
  contiguous slice, found by two ``searchsorted`` calls and expanded
  with ``np.repeat`` — O(n log n + output) per bucket instead of the
  O(n^2) cross product.

Partitioning assumption (documented per the task brief): as-of and band
joins require each user's events to be totally ordered within one
bucket — guaranteed by hashing on user_id. Skewed users make a bucket
large but never split one (salting would break window semantics across
salt boundaries).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa

from moonray.util import default_buckets, splitmix64


def _bucket_of(keys: np.ndarray, buckets: int) -> np.ndarray:
    return (splitmix64(keys.astype(np.uint64)) % np.uint64(buckets)).astype(np.int32)


# ---------------------------------------------------------------- broadcast


class _RegionLookup:
    """Actor-pool stage holding the broadcast dim table: ``ray.put`` once
    on the driver, ``ray.get`` once per ACTOR in __init__ (not per
    batch/task), vectorized ``np.take`` per batch."""

    def __init__(self, lookup_ref):
        import ray

        # dense nationkey → region-name array (object dtype)
        self.region_by_nation = ray.get(lookup_ref)

    def __call__(self, b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        nk = b["c_nationkey"].to_numpy(zero_copy_only=False)
        rname = np.take(self.region_by_nation, nk)
        cents = np.floor(b["c_acctbal"].to_numpy(zero_copy_only=False) * 100
                         + 0.5).astype(np.int64)
        t = pa.table({"r_name": pa.array(rname.tolist(), pa.string()),
                      "cents": pa.array(cents, pa.int64())})
        g = t.group_by("r_name", use_threads=False).aggregate(
            [("cents", "count", pc.CountOptions(mode="all")), ("cents", "sum")])
        return pa.table({"r_name": g["r_name"],
                         "n_cust": g["cents_count"].cast(pa.int64()),
                         "acctbal_cents": g["cents_sum"].cast(pa.int64())})


def broadcast_region_enrich(sf_dir: str):
    """customer ⋈ nation ⋈ region via broadcast lookup, aggregated to
    (r_name, n_cust, acctbal_cents). The dim tables never shuffle; the
    fact table never leaves its read tasks until the 5-row aggregate."""
    import pyarrow.parquet as pq
    import ray
    import ray.data as rd
    from ray.data.aggregate import Sum

    nation = pq.read_table(os.path.join(sf_dir, "nation.parquet"))
    region = pq.read_table(os.path.join(sf_dir, "region.parquet"))
    rname_by_key: dict[int, str] = dict(zip(
        region["r_regionkey"].to_pylist(), region["r_name"].to_pylist()))
    nk = nation["n_nationkey"].to_pylist()
    lookup = np.empty(max(nk) + 1, dtype=object)
    for k, rk in zip(nk, nation["n_regionkey"].to_pylist()):
        lookup[k] = rname_by_key[rk]
    ref = ray.put(lookup)

    ds = rd.read_parquet(os.path.join(sf_dir, "customer.parquet"),
                         columns=["c_nationkey", "c_acctbal"])
    from moonray.util import as_fn

    # the dim side is 26 entries: constructing the lookup ON the driver
    # and shipping it in the task closure is cheaper than an actor
    # pool's spin-up; for a BIG dim side keep ray.put + per-task get
    # from node-local plasma (the knn broadcast pattern)
    ds = ds.map_batches(as_fn(_RegionLookup(ref), "region_lookup"),
                        batch_format="pyarrow")
    return (ds.groupby("r_name")
              .aggregate(Sum("n_cust", alias_name="n_cust"),
                         Sum("acctbal_cents", alias_name="acctbal_cents")))


# ------------------------------------------------------- big-big equi join


def order_lineitem_revenue(sf_dir: str, buckets: int | None = None):
    """orders ⋈ lineitem on orderkey → revenue by order priority.

    Plan: lineitem pre-aggregates (revenue cents, item count) per
    l_orderkey inside map_batches — the shuffle then moves one thin row
    per (batch, orderkey) instead of every lineitem. Both sides carry a
    shared bucket column; one groupby co-locates them and each bucket
    runs Arrow's local hash join, partial-aggregating by priority before
    the final 5-group reduce."""
    import pyarrow.compute as pc
    import ray.data as rd
    from ray.data.aggregate import Sum

    buckets = buckets or default_buckets()
    # union schema: orders rows carry o_orderpriority, lineitem partials
    # carry (rev_cents, n_items); the other side's columns ride as nulls
    fields = [("_bkt", pa.int32()), ("_side", pa.int8()), ("_k", pa.int64()),
              ("o_orderpriority", pa.string()),
              ("rev_cents", pa.int64()), ("n_items", pa.int64())]
    schema = pa.schema(fields)

    def orders_side(b: pa.Table) -> pa.Table:
        k = b["o_orderkey"].to_numpy(zero_copy_only=False)
        n = len(k)
        return pa.table({
            "_bkt": pa.array(_bucket_of(k, buckets)),
            "_side": pa.array(np.zeros(n, np.int8)),
            "_k": pa.array(k, pa.int64()),
            "o_orderpriority": b["o_orderpriority"],
            "rev_cents": pa.nulls(n, pa.int64()),
            "n_items": pa.nulls(n, pa.int64()),
        }, schema=schema)

    def lineitem_side(b: pa.Table) -> pa.Table:
        # partial pre-agg per orderkey: identical float ops to the oracle
        # (floor(x*100+0.5) half-up cents) so sums match bit-for-bit
        cents = np.floor(
            b["l_extendedprice"].to_numpy(zero_copy_only=False)
            * (1.0 - b["l_discount"].to_numpy(zero_copy_only=False))
            * 100 + 0.5).astype(np.int64)
        t = pa.table({"_k": b["l_orderkey"], "cents": pa.array(cents)})
        g = t.group_by("_k", use_threads=False).aggregate(
            [("cents", "count", pc.CountOptions(mode="all")), ("cents", "sum")])
        k = g["_k"].to_numpy(zero_copy_only=False)
        n = len(k)
        return pa.table({
            "_bkt": pa.array(_bucket_of(k, buckets)),
            "_side": pa.array(np.ones(n, np.int8)),
            "_k": g["_k"].cast(pa.int64()),
            "o_orderpriority": pa.nulls(n, pa.string()),
            "rev_cents": g["cents_sum"].cast(pa.int64()),
            "n_items": g["cents_count"].cast(pa.int64()),
        }, schema=schema)

    def join_bucket(group: pa.Table) -> pa.Table:
        side = group["_side"].to_numpy(zero_copy_only=False)
        left = group.filter(pa.array(side == 0)).select(["_k", "o_orderpriority"])
        right = group.filter(pa.array(side == 1)).select(["_k", "rev_cents",
                                                          "n_items"])
        if len(left) == 0 or len(right) == 0:
            return pa.table({"o_orderpriority": pa.array([], pa.string()),
                             "rev_cents": pa.array([], pa.int64()),
                             "n_items": pa.array([], pa.int64())})
        j = left.join(right, keys="_k", join_type="inner", use_threads=False)
        g = j.group_by("o_orderpriority", use_threads=False).aggregate(
            [("rev_cents", "sum"), ("n_items", "sum")])
        return pa.table({"o_orderpriority": g["o_orderpriority"],
                         "rev_cents": g["rev_cents_sum"].cast(pa.int64()),
                         "n_items": g["n_items_sum"].cast(pa.int64())})

    join_bucket.__name__ = "join_bucket"
    orders = rd.read_parquet(os.path.join(sf_dir, "orders.parquet"),
                             columns=["o_orderkey", "o_orderpriority"]
                             ).map_batches(orders_side, batch_format="pyarrow")
    items = rd.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_extendedprice", "l_discount"]
    ).map_batches(lineitem_side, batch_format="pyarrow")
    both = orders.union(items)
    joined = both.groupby("_bkt").map_groups(join_bucket,
                                             batch_format="pyarrow")
    return (joined.groupby("o_orderpriority")
            .aggregate(Sum("rev_cents", alias_name="revenue_cents"),
                       Sum("n_items", alias_name="n_items")))


# ------------------------------------------------------------- as-of join


def _codes_and_width(uid_all: np.ndarray, ts_all: np.ndarray,
                     margin: int = 0) -> tuple[np.ndarray, np.int64, np.ndarray]:
    """Dense per-bucket user codes + a composite-key width so that
    code*width + (ts - ts_min) orders rows by (user, ts) in one int64.
    Dense codes keep code_max small (≤ bucket rows), so overflow needs
    ~2^63/width users in ONE bucket — asserted anyway."""
    _, codes = np.unique(uid_all, return_inverse=True)
    ts_off = ts_all - ts_all.min() if len(ts_all) else ts_all
    width = np.int64(int(ts_off.max()) + margin + 2) if len(ts_off) else np.int64(1)
    if int(codes.max(initial=0) + 1) * int(width) >= (1 << 63):
        # hard error (not assert: -O must not strip it — silent int64
        # wraparound would corrupt join results)
        raise ValueError("composite (user, ts) key overflow: shrink the "
                         "bucket (raise `buckets`) or the ts range")
    return codes.astype(np.int64), width, ts_off.astype(np.int64)


def asof_bucket_kernel(group: pa.Table) -> pa.Table:
    """One bucket's as-of resolution (pure kernel — property-tested
    against a row-loop oracle in tests/test_joins_property.py). Input
    columns: _side (0=left/probe, 1=right/reference), event_id,
    user_id, ts_us."""
    empty = pa.table({"event_id": pa.array([], pa.int64()),
                      "user_id": pa.array([], pa.int64()),
                      "ts": pa.array([], pa.timestamp("us")),
                      "prior_ts": pa.array([], pa.timestamp("us"))})
    if len(group) == 0:
        return empty
    side = group["_side"].to_numpy(zero_copy_only=False)
    uid = group["user_id"].to_numpy(zero_copy_only=False)
    ts = group["ts_us"].to_numpy(zero_copy_only=False)
    eid = group["event_id"].to_numpy(zero_copy_only=False)
    codes, width, ts_off = _codes_and_width(uid, ts)
    comp = codes * width + ts_off
    is_c = side == 1
    comp_c, code_c, ts_c = comp[is_c], codes[is_c], ts[is_c]
    if len(comp_c) == 0:
        return empty
    order = np.argsort(comp_c, kind="stable")
    comp_c, code_c, ts_c = comp_c[order], code_c[order], ts_c[order]
    is_p = ~is_c
    # rightmost reference row with comp ≤ probe comp == latest ts ≤ ts_p
    pos = np.searchsorted(comp_c, comp[is_p], side="right") - 1
    valid = pos >= 0
    valid[valid] &= code_c[pos[valid]] == codes[is_p][valid]
    out_sel = np.flatnonzero(is_p)[valid]
    return pa.table({
        "event_id": pa.array(eid[out_sel], pa.int64()),
        "user_id": pa.array(uid[out_sel], pa.int64()),
        "ts": pa.array(ts[out_sel], pa.timestamp("us")),
        "prior_ts": pa.array(ts_c[pos[valid]], pa.timestamp("us")),
    })


def asof_purchase_last_click(sf_dir: str, buckets: int | None = None):
    """For each 'purchase' event, the latest 'click' by the same user at
    or before the purchase (inner as-of). One pass over events emits
    both sides tagged; per user-hash bucket, clicks sort once and every
    purchase resolves via one vectorized searchsorted."""
    import ray.data as rd

    buckets = buckets or default_buckets()

    def tag(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        # Arrow kernels, not numpy object-dtype string compares (those
        # materialize one Python str per row in the hottest stage)
        b = b.filter(pc.is_in(b["event_type"],
                              value_set=pa.array(["purchase", "click"])))
        is_click = pc.equal(b["event_type"], "click").combine_chunks() \
            .to_numpy(zero_copy_only=False)
        uid = b["user_id"].to_numpy(zero_copy_only=False)
        return pa.table({
            "_bkt": pa.array(_bucket_of(uid, buckets)),
            "_side": pa.array(is_click.astype(np.int8)),
            "event_id": b["event_id"],
            "user_id": b["user_id"],
            "ts_us": b["ts"].cast(pa.int64()),
        })

    ds = rd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                         columns=["event_id", "user_id", "ts", "event_type"])
    ds = ds.map_batches(tag, batch_format="pyarrow")
    return ds.groupby("_bkt").map_groups(asof_bucket_kernel,
                                         batch_format="pyarrow")


# -------------------------------------------------- banded interval join


def events_band_pairs(sf_dir: str, window_sec: int = 21600,
                      buckets: int | None = None):
    """All ordered event pairs by the same user with 0 < Δts ≤ window.
    Per bucket: one sort by (user, ts) composite, then each row's match
    range is [searchsorted(comp, comp_i, 'right'),
    searchsorted(comp, comp_i + W, 'right')) — contiguous because the
    composite width reserves headroom for W — expanded with np.repeat.
    Cost is O(n log n + pairs); the window bound is the scale contract."""
    import ray.data as rd

    buckets = buckets or default_buckets()
    w_us = np.int64(window_sec * 1_000_000)

    def tag(b: pa.Table) -> pa.Table:
        uid = b["user_id"].to_numpy(zero_copy_only=False)
        return pa.table({
            "_bkt": pa.array(_bucket_of(uid, buckets)),
            "event_id": b["event_id"],
            "user_id": b["user_id"],
            "ts_us": b["ts"].cast(pa.int64()),
        })

    def pairs_bucket(group: pa.Table) -> pa.Table:
        return band_pairs_kernel(group, w_us)

    pairs_bucket.__name__ = "pairs_bucket"
    ds = rd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                         columns=["event_id", "user_id", "ts"])
    ds = ds.map_batches(tag, batch_format="pyarrow")
    return ds.groupby("_bkt").map_groups(pairs_bucket, batch_format="pyarrow")


def band_pairs_kernel(group: pa.Table, w_us: np.int64) -> pa.Table:
    """One bucket's banded self-join (pure kernel — property-tested
    against the quadratic oracle in tests/test_joins_property.py).
    Input columns: event_id, user_id, ts_us."""
    empty = pa.table({"a_event_id": pa.array([], pa.int64()),
                      "b_event_id": pa.array([], pa.int64()),
                      "user_id": pa.array([], pa.int64()),
                      "gap_us": pa.array([], pa.int64())})
    if len(group) == 0:
        return empty
    uid = group["user_id"].to_numpy(zero_copy_only=False)
    ts = group["ts_us"].to_numpy(zero_copy_only=False)
    eid = group["event_id"].to_numpy(zero_copy_only=False)
    codes, width, ts_off = _codes_and_width(uid, ts, margin=int(w_us))
    comp = codes * width + ts_off
    order = np.argsort(comp, kind="stable")
    comp, ts, uid, eid = comp[order], ts[order], uid[order], eid[order]
    lo = np.searchsorted(comp, comp, side="right")       # skip ties: b.ts > a.ts
    hi = np.searchsorted(comp, comp + w_us, side="right")
    counts = hi - lo
    total = int(counts.sum())
    if total == 0:
        return empty
    a_idx = np.repeat(np.arange(len(comp)), counts)
    starts = np.cumsum(counts) - counts
    b_idx = np.arange(total) - np.repeat(starts, counts) + np.repeat(lo, counts)
    return pa.table({
        "a_event_id": pa.array(eid[a_idx], pa.int64()),
        "b_event_id": pa.array(eid[b_idx], pa.int64()),
        "user_id": pa.array(uid[a_idx], pa.int64()),
        "gap_us": pa.array(ts[b_idx] - ts[a_idx], pa.int64()),
    })
