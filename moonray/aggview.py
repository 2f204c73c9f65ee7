"""Incremental aggregate-view maintenance: materialized GROUP BY views
kept in sync through the changelog in O(changed rows) per round.

Extends the table→table composition in ``sync.py`` (CDC-out feeding
CDC-in, the reference's pg_replicate → moonlink_sink shape) from
row-level views to *aggregate* views: the destination is a MoonrayTable
keyed on the group columns whose rows are running aggregates of the
source. Each sync round reads only ``src.changes(last, cur)``, never
rescans the source, and merges one row per *changed group* — the
incremental-view-maintenance story a warehouse runs as a triggered MV
refresh, expressed over the engine's own changelog.

Aggregate algebra per round (classic IVM):

- ``count`` / ``sum`` are self-maintainable under insert AND delete:
  each change contributes a signed delta (+1/-1, +x/-x); deltas fold
  per group inside ``map_batches`` (Arrow ``group_by`` combiner), then
  one thin Ray groupby nets them globally. The merged row is
  ``stored + delta``; a group whose count reaches 0 is deleted from
  the view.
- ``count_distinct`` is EXACT and maintained through a per-column
  auxiliary support-count table ((group..., value) → multiplicity,
  itself a keyed MoonrayTable under the view root, maintained by
  signed deltas — the textbook IVM construction). Each round the view
  stores the ABSOLUTE distinct count read back from the aux table's
  changed groups, which makes replays idempotent by construction.
- ``min`` / ``max`` are self-maintainable under inserts (the extreme
  can only improve) but NOT under deletes: when a deleted value ties
  the stored extreme the true new extreme is unknown without data (the
  extreme's multiplicity isn't stored). Those groups — and only those —
  are recomputed by a *rescan of the affected groups*:
  ``src.scan(cur, predicate_in={group: affected})`` zone/row-group
  prunes to fragments that can contain them, so the rescan reads
  O(affected groups' data), not the table. Derived (transform-made)
  group columns can't prune the scan — only physical group columns
  feed ``predicate_in``; exact membership is filtered after.

Scale contract: every shuffle carries thin rows (group key + partial
aggregates). Per-round driver-side state is the folded delta table and
the point-lookup of stored group rows — both O(changed groups), the
same order as the MERGE planner's own driver state. The affected-group
rescan is the only data-proportional step and is bounded by the groups
whose stored extreme was deleted that round.

Exactly-once: the last-synced source version is a durable pointer in
the destination root and each round's MERGE runs under a job_id derived
from the (last, cur] window — a crash between merge-commit and
pointer-advance replays into the idempotent-merge path (the job marker
short-circuits before the recomputed — now stale — delta values could
apply). A changelog floor pinned on the source (``manifest.set_floor``)
keeps the needed manifests across routine snapshot expiry.

Float sums are accepted but order-dependent across partials; for
bit-exact parity with a SQL oracle aggregate fixed-point integers (the
engine's cents convention) derived via ``transform=``. Integer sums
use int64 arithmetic end-to-end (no float round-trip).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_KINDS = ("count", "sum", "min", "max", "count_distinct")


def _plan(aggs: dict):
    """Validate {out_col: (kind, src_col|None)} → [(out, kind, col)]."""
    plan = []
    for out, (kind, col) in aggs.items():
        if kind not in _KINDS:
            raise ValueError(f"unsupported aggregate kind {kind!r} "
                             f"(supported: {_KINDS})")
        if kind == "count":
            plan.append((out, "count", None))
        elif col is None:
            raise ValueError(f"{kind} aggregate {out!r} needs a source column")
        else:
            plan.append((out, kind, col))
    if not any(k == "count" for _o, k, _c in plan):
        raise ValueError("aggs must include a ('count', None) column — "
                         "group liveness (count reaching 0) drives row "
                         "deletion from the view")
    return plan


def _pointer_name(state_key: str) -> str:
    import os

    return os.path.join("aggview", state_key)


def _floor_token(dst_root: str, state_key: str) -> str:
    import hashlib

    h = hashlib.sha256(f"{dst_root}|{state_key}".encode()).hexdigest()[:16]
    return f"aggview-{h}"


def _probe_types(src, transform) -> dict:
    """Dtypes of transform-derived columns from an empty batch — keeps
    the view schema a pure function of the spec."""
    if transform is None:
        return {}
    probed = transform(src.schema().empty_table())
    return {f.name: f.type for f in probed.schema}


def _col_type(name: str, src_schema: pa.Schema, derived: dict):
    if name in derived:
        return derived[name]
    return src_schema.field(name).type


def _out_schema(group_cols, plan, src_schema: pa.Schema,
                derived: dict) -> pa.Schema:
    fields = [pa.field(g, _col_type(g, src_schema, derived))
              for g in group_cols]
    for out, kind, col in plan:
        if kind in ("count", "count_distinct"):
            typ = pa.int64()
        else:
            typ = _col_type(col, src_schema, derived)
            if kind == "sum":
                # SQL sum() widens: integer sums are int64, float
                # sums float64 — also the overflow-safe running type
                typ = pa.int64() if pa.types.is_integer(typ) \
                    else pa.float64()
        fields.append(pa.field(out, typ))
    return pa.schema(fields)


def _main_plan(plan):
    """The self-maintainable aggregates (everything but count_distinct
    — those run through the auxiliary support-count pipeline)."""
    return [p for p in plan if p[1] != "count_distinct"]


def _nd_plan(plan):
    return [(out, col) for out, kind, col in plan
            if kind == "count_distinct"]


def _aux_root(dst_root: str, out: str) -> str:
    import os

    return os.path.join(dst_root, "_aux", out)


def _read_columns(group_cols, plan, src_schema, transform,
                  transform_columns):
    """Columns to prune the scan/changelog read to. With a transform we
    can't know its inputs — the caller narrows via transform_columns."""
    if transform is not None:
        if transform_columns is None:
            return None  # transform inputs unknown: read everything
        cols = list(transform_columns)
    else:
        cols = []
    names = set(src_schema.names)
    for c in list(group_cols) + [c for _o, _k, c in plan if c]:
        if c in names and c not in cols:
            cols.append(c)
    return cols


def _partial_kernel(group_cols, plan, transform, *, signed: bool):
    """Per-batch combiner: thin (group, partial-agg) rows via one Arrow
    group_by. ``signed`` reads change_type and emits ±deltas for
    count/sum plus separate inserted/deleted extremes for min/max;
    unsigned is the initial-build / rescan shape."""

    def partial(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        if transform is not None:
            b = transform(b)
        cols: dict = {g: b[g] for g in group_cols}
        specs = []
        sign = None
        if signed:
            ins = pc.equal(b["change_type"], "insert").combine_chunks()
            sign = np.where(ins.to_numpy(zero_copy_only=False), 1, -1)
        for out, kind, col in plan:
            if kind == "count":
                cols[f"_p_{out}"] = pa.array(
                    sign if signed else np.ones(len(b), np.int64),
                    pa.int64())
                specs.append((f"_p_{out}", "sum"))
            elif kind == "sum":
                v = b[col].combine_chunks()
                arr = v.to_numpy(zero_copy_only=False)
                valid = pc.is_valid(v).to_numpy(zero_copy_only=False)
                if pa.types.is_floating(v.type):
                    arr = np.where(valid, np.asarray(arr, np.float64), 0.0)
                else:
                    arr = np.where(valid, arr, 0).astype(np.int64)
                cols[f"_p_{out}"] = pa.array(
                    arr * sign if signed else arr)
                specs.append((f"_p_{out}", "sum"))
            elif signed:
                # min/max under CDC: inserted extremes can only improve
                # the stored extreme; deleted extremes only *invalidate*
                # it (rescan detection). Nulls mask the other side out —
                # Arrow min/max skip them.
                ins_mask = pa.array(sign > 0)
                nulls = pa.nulls(len(b), b[col].type)
                cols[f"_pi_{out}"] = pc.if_else(ins_mask, b[col], nulls)
                cols[f"_pd_{out}"] = pc.if_else(ins_mask, nulls, b[col])
                specs.append((f"_pi_{out}", kind))
                specs.append((f"_pd_{out}", kind))
            else:
                cols[f"_p_{out}"] = b[col]
                specs.append((f"_p_{out}", kind))
        t = pa.table(cols)
        g = t.group_by(group_cols, use_threads=False).aggregate(specs)
        ren = {f"{name}_{fn}": name for name, fn in specs}
        return g.rename_columns([ren.get(c, c) for c in g.column_names])

    partial.__name__ = "aggview_partial"
    return partial


def _fold(ds, group_cols, plan, *, signed: bool):
    """Global net of the per-batch partials: one thin Ray groupby."""
    from ray.data.aggregate import Max, Min, Sum

    aggs = []
    for out, kind, _c in plan:
        if kind in ("count", "sum"):
            aggs.append(Sum(f"_p_{out}", alias_name=f"_p_{out}"))
        else:
            cls = Min if kind == "min" else Max
            if signed:
                aggs.append(cls(f"_pi_{out}", alias_name=f"_pi_{out}"))
                aggs.append(cls(f"_pd_{out}", alias_name=f"_pd_{out}"))
            else:
                aggs.append(cls(f"_p_{out}", alias_name=f"_p_{out}"))
    return ds.groupby(list(group_cols)).aggregate(*aggs)


def _collect(ds) -> pa.Table | None:
    tbls = [b for b in ds.iter_batches(batch_format="pyarrow",
                                       batch_size=65536)]
    return pa.concat_tables(tbls, promote_options="permissive") \
        if tbls else None


def _cast_deltas(deltas: pa.Table, group_cols, plan, src_schema,
                 derived) -> pa.Table:
    """Pin the folded delta table's dtypes: an all-null Min/Max partial
    comes back null-typed (join-incompatible), and Sum may widen."""
    want: dict = {g: _col_type(g, src_schema, derived) for g in group_cols}
    for out, kind, col in plan:
        if kind == "count":
            want[f"_p_{out}"] = pa.int64()
        elif kind == "sum":
            t = _col_type(col, src_schema, derived)
            want[f"_p_{out}"] = (pa.int64() if pa.types.is_integer(t)
                                 else pa.float64())
        else:
            t = _col_type(col, src_schema, derived)
            want[f"_pi_{out}"] = t
            want[f"_pd_{out}"] = t
            want[f"_p_{out}"] = t  # unsigned (rescan/build) shape
    return pa.table({c: deltas[c].cast(want[c]) if c in want else deltas[c]
                     for c in deltas.column_names})


def _full_aggregate(src, version, group_cols, plan, transform, derived,
                    transform_columns, *, predicate_in=None,
                    out_schema: pa.Schema | None = None):
    """Distributed full (re)aggregation at a pinned version → folded
    thin Dataset with the final out-column names and dtypes. ``plan``
    must be a MAIN plan (no count_distinct — those fold through the
    aux pipeline, not this one)."""
    cols = _read_columns(group_cols, plan, src.schema(), transform,
                         transform_columns)
    ds = src.scan(version, columns=cols, predicate_in=predicate_in)
    folded = _fold(ds.map_batches(
        _partial_kernel(group_cols, plan, transform, signed=False),
        batch_format="pyarrow"), group_cols, plan, signed=False)
    schema = out_schema or _out_schema(group_cols, plan, src.schema(),
                                       derived)

    def finalize(b: pa.Table) -> pa.Table:
        out = {g: b[g].cast(schema.field(g).type) for g in group_cols}
        for outc, _k, _c in plan:
            out[outc] = b[f"_p_{outc}"].cast(schema.field(outc).type)
        return pa.table(out)

    finalize.__name__ = "aggview_finalize"
    return folded.map_batches(finalize, batch_format="pyarrow")


def _build_aux(src, version, dst_root, group_cols, out, col, transform,
               transform_columns, derived):
    """The support-count table behind a count_distinct column: one row
    per live (group..., value) with its multiplicity ``n`` — classic
    IVM support counts, themselves maintainable by signed deltas. A
    MoonrayTable keyed on (group cols + value) under the view root."""
    import pyarrow.compute as pc
    import ray.data as rd  # noqa: F401 — table API takes Datasets

    from moonray.table import MoonrayTable

    src_schema = src.schema()
    gfields = [pa.field(g, _col_type(g, src_schema, derived))
               for g in group_cols]
    vtype = _col_type(col, src_schema, derived)
    schema = pa.schema(gfields + [pa.field(col, vtype),
                                  pa.field("n", pa.int64())])
    aux = MoonrayTable.create(_aux_root(dst_root, out), schema=schema,
                              key_cols=list(group_cols) + [col],
                              index_partitions=16)
    nd_entry = [(out, "count_distinct", col)]
    cols_read = _read_columns(group_cols, nd_entry, src_schema,
                              transform, transform_columns)
    keys = list(group_cols) + [col]

    def pairs(b: pa.Table) -> pa.Table:
        if transform is not None:
            b = transform(b)
        t = pa.table({**{g: b[g] for g in group_cols}, col: b[col],
                      "_one": pa.array(np.ones(len(b), np.int64))})
        t = t.filter(pc.is_valid(t[col]))  # count(DISTINCT) skips nulls
        g = t.group_by(keys, use_threads=False).aggregate([("_one", "sum")])
        return g.rename_columns(
            ["n" if c == "_one_sum" else c for c in g.column_names])

    pairs.__name__ = f"aux_pairs_{out}"
    from ray.data.aggregate import Sum

    folded = (src.scan(version, columns=cols_read)
              .map_batches(pairs, batch_format="pyarrow")
              .groupby(keys).aggregate(Sum("n", alias_name="n")))

    def fin(b: pa.Table) -> pa.Table:
        return pa.table({f.name: b[f.name].cast(f.type) for f in schema})

    fin.__name__ = "aux_finalize"
    aux.bulk_load(folded.map_batches(fin, batch_format="pyarrow"))
    return aux


def _nd_absolute(aux, group_cols, restrict: dict | None = None) -> dict:
    """{group-key tuple: distinct count} from the aux table — the
    ABSOLUTE value (idempotent across replays: recomputed from the
    committed aux state, never a delta). ``restrict`` limits the scan
    to the changed groups (predicate_in: exact in-task filter, pruned
    where possible)."""
    import pyarrow.compute as pc  # noqa: F401
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        t = pa.table({**{g: b[g] for g in group_cols},
                      "_one": pa.array(np.ones(len(b), np.int64))})
        g = t.group_by(list(group_cols),
                       use_threads=False).aggregate([("_one", "sum")])
        return g.rename_columns(
            ["nd" if c == "_one_sum" else c for c in g.column_names])

    partial.__name__ = "nd_partial"
    folded = (aux.scan(columns=list(group_cols), predicate_in=restrict)
              .map_batches(partial, batch_format="pyarrow")
              .groupby(list(group_cols)).aggregate(Sum("nd",
                                                       alias_name="nd")))
    t = _collect(folded)
    if t is None or len(t) == 0:
        return {}
    keys = list(zip(*[t[g].to_pylist() for g in group_cols]))
    return dict(zip(keys, t["nd"].to_pylist()))


def _attach_nd(ds, group_cols, nd_maps: dict, schema: pa.Schema):
    """Build-time: join the absolute distinct counts onto the folded
    main aggregates (broadcast via ray.put — the maps are O(groups),
    the same order as the view itself)."""
    import ray

    ref = ray.put(nd_maps)

    def attach(b: pa.Table) -> pa.Table:
        import ray as _ray

        maps = _ray.get(ref)
        keys = list(zip(*[b[g].to_pylist() for g in group_cols]))
        out = {c: b[c] for c in b.column_names}
        for nd_out, m in maps.items():
            out[nd_out] = pa.array([m.get(k, 0) for k in keys],
                                   pa.int64())
        return pa.table({f.name: out[f.name].cast(f.type)
                         for f in schema})

    attach.__name__ = "attach_nd"
    return ds.map_batches(attach, batch_format="pyarrow")


def build_aggregate_view(src, root: str, *, group_cols, aggs: dict,
                         transform=None, transform_columns=None,
                         state_key: str = "agg",
                         index_partitions: int = 16,
                         rows_per_fragment: int | None = None):
    """Create the view table at ``root`` (keyed on ``group_cols``),
    full-build it from a pinned snapshot of ``src``, and set the sync
    pointer so the first ``sync_aggregate`` continues from exactly that
    version.

    ``aggs``: {out_col: (kind, src_col|None)}, kinds
    count/sum/min/max/count_distinct; a count column is mandatory (it
    drives group-death deletes). count_distinct is EXACT and
    incrementally maintained through a per-column auxiliary
    support-count table ((group..., value) → multiplicity) under the
    view root — classic IVM; the view stores the absolute distinct
    count recomputed from the aux table's changed groups each round.
    ``transform(batch) -> batch`` derives extra columns (fixed-point
    cents, day-bucketed timestamps, ...) before aggregation; it is
    applied identically to the initial scan, every changelog round, and
    affected-group rescans. ``transform_columns`` names the source
    columns the transform reads so scans stay column-pruned."""
    from moonray import manifest as mf
    from moonray.commitstore import store_for
    from moonray.table import MoonrayTable

    plan = _plan(aggs)
    derived = _probe_types(src, transform)
    cur = src.latest_version()
    # floor BEFORE reading so concurrent expiry can't drop (cur, ...]
    mf.set_floor(src.root, cur, _floor_token(root, state_key))
    schema = _out_schema(group_cols, plan, src.schema(), derived)
    kw: dict = {"index_partitions": index_partitions}
    if rows_per_fragment:
        kw["rows_per_fragment"] = rows_per_fragment
    if len(group_cols) > 1:
        kw["key_cols"] = list(group_cols)
    else:
        kw["key_col"] = group_cols[0]
    dst = MoonrayTable.create(root, schema=schema, **kw)
    main_ds = _full_aggregate(src, cur, group_cols, _main_plan(plan),
                              transform, derived, transform_columns,
                              out_schema=schema)
    nd = _nd_plan(plan)
    if nd:
        nd_maps = {}
        for out, col in nd:
            aux = _build_aux(src, cur, dst.root, group_cols, out, col,
                             transform, transform_columns, derived)
            nd_maps[out] = _nd_absolute(aux, group_cols)
        main_ds = _attach_nd(main_ds, group_cols, nd_maps, schema)
    dst.bulk_load(main_ds)
    store_for(dst.root).set_pointer(_pointer_name(state_key), str(cur))
    return dst


def sync_aggregate(src, dst, *, group_cols, aggs: dict, transform=None,
                   transform_columns=None, state_key: str = "agg",
                   stats: dict | None = None) -> int:
    """Apply source commits in (last_synced, src.latest] to the
    aggregate view and advance the pointer. Returns dst's new version.
    ``stats`` (optional dict) is filled with round observability:
    ``changed_groups``, ``rescanned_groups``, ``deleted_groups``.

    Exactly-once across crashes needs a DETERMINISTIC window: the merge
    job_id embeds (last, cur], so a retry after a crash between
    merge-commit and pointer-advance must replay the SAME cur — if it
    took a newer src.latest instead, the job_id would differ and the
    committed window's deltas would apply twice. A pending record
    (written before the merge, cleared after the pointer advances) pins
    the in-flight window; when a replayed pending window is behind
    src.latest, a second round in the same call catches up."""
    v = dst.latest_version()
    for _ in range(2):
        v, replayed = _sync_round(src, dst, group_cols, aggs, transform,
                                  transform_columns, state_key, stats)
        if not replayed:
            break
    return v


def _sync_round(src, dst, group_cols, aggs, transform, transform_columns,
                state_key, stats) -> tuple[int, bool]:
    """One sync window → (dst version, replayed_pending)."""
    import pyarrow.compute as pc

    from moonray import manifest as mf
    from moonray.commitstore import store_for

    plan = _plan(aggs)
    derived = _probe_types(src, transform)
    group_cols = list(group_cols)
    store = store_for(dst.root)
    try:
        last = int(store.read_pointer(_pointer_name(state_key)))
    except FileNotFoundError:
        raise RuntimeError(
            "aggregate view has no sync pointer — create it with "
            "build_aggregate_view (a full build at a pinned version)")
    pend_name = _pointer_name(state_key) + ".pending"
    pending = None
    try:
        raw = store.read_pointer(pend_name)
        if raw:
            pending = tuple(int(x) for x in raw.split(":"))
    except FileNotFoundError:
        pass
    replay = bool(pending and pending[0] == last and pending[1] > last)
    cur = pending[1] if replay else src.latest_version()
    mf.set_floor(src.root, last, _floor_token(dst.root, state_key))
    if cur <= last:
        store.set_pointer(pend_name, "")
        return dst.latest_version(), False
    store.set_pointer(pend_name, f"{last}:{cur}")

    view_job = f"aggsync-{state_key}-{last}-{cur}"
    if replay:
        # the window's view merge may have COMMITTED before the crash
        # (only the pointer advance was lost). Detect it by job id
        # BEFORE recomputing anything: replay deltas would otherwise be
        # computed against the post-merge view state, where a
        # group-killing delete reads back as count 0 + another -1 and
        # trips the negative guard — wedging the view forever.
        done = mf.find_version_by_job(dst.root, view_job)
        if done is not None:
            store.set_pointer(_pointer_name(state_key), str(cur))
            store.set_pointer(pend_name, "")
            mf.set_floor(src.root, cur, _floor_token(dst.root, state_key))
            return dst.latest_version(), True

    main = _main_plan(plan)
    try:
        deltas = _collect(_fold(
            src.changes(last, cur).map_batches(
                _partial_kernel(group_cols, main, transform, signed=True),
                batch_format="pyarrow"),
            group_cols, main, signed=True))
    except FileNotFoundError as e:
        raise RuntimeError(
            f"aggregate sync (state_key={state_key!r}) needs source "
            f"manifests ({last}, {cur}] but at least one is expired: {e}. "
            "Resync required: rebuild the view with build_aggregate_view."
        ) from e
    if deltas is not None:
        deltas = _cast_deltas(deltas, group_cols, main, src.schema(),
                              derived)
    if deltas is None or len(deltas) == 0:
        store.set_pointer(_pointer_name(state_key), str(cur))
        store.set_pointer(pend_name, "")
        mf.set_floor(src.root, cur, _floor_token(dst.root, state_key))
        return dst.latest_version(), replay

    # stored rows for exactly the changed groups — index-served point
    # reads, O(changed groups)
    keycols = [deltas[g] for g in group_cols]
    keys = (keycols[0].to_pylist() if len(group_cols) == 1
            else list(zip(*[c.to_pylist() for c in keycols])))
    stored = dst.lookup(keys)
    schema = dst.schema()
    stored = stored.rename_columns(
        [c if c in group_cols else f"_s_{c}" for c in stored.column_names])
    j = deltas.join(stored, keys=group_cols, join_type="left outer")

    # count_distinct columns: maintain the aux support-count tables
    # through the same window, then read back ABSOLUTE per-group
    # distinct counts (idempotent across replays — recomputed from the
    # committed aux state). nd-changed groups ⊆ the main delta's groups
    # (every changelog row moves the group's count too).
    nd_abs: dict = {}
    if _nd_plan(plan):
        nd_abs = _sync_aux(src, dst, group_cols, plan, transform,
                           transform_columns, derived, state_key,
                           last, cur, j)
    group_keys = list(zip(*[j[g].to_pylist() for g in group_cols]))

    cnt_out = next(o for o, k, _c in plan if k == "count")
    exists = pc.is_valid(j[f"_s_{cnt_out}"]).to_numpy(zero_copy_only=False)
    old_cnt = np.where(exists, pc.fill_null(j[f"_s_{cnt_out}"], 0)
                       .to_numpy(zero_copy_only=False), 0).astype(np.int64)
    new_cnt = old_cnt + np.asarray(
        pc.fill_null(j[f"_p_{cnt_out}"], 0)
        .to_numpy(zero_copy_only=False), np.int64)
    if (new_cnt < 0).any():
        raise RuntimeError("aggregate view out of sync: a group's count "
                           "went negative (was the view built from a "
                           "different source or spec?)")
    dead = new_cnt == 0
    rescan_mask = np.zeros(len(j), dtype=bool)

    new_cols: dict = {g: j[g] for g in group_cols}
    for out, kind, _c in plan:
        typ = schema.field(out).type
        if kind == "count":
            new_cols[out] = pa.array(new_cnt, typ)
        elif kind == "count_distinct":
            m = nd_abs.get(out, {})
            new_cols[out] = pa.array(
                [int(m.get(k, 0)) for k in group_keys], typ)
        elif kind == "sum":
            s = pc.fill_null(j[f"_s_{out}"], 0)
            p = pc.fill_null(j[f"_p_{out}"], 0)
            if pa.types.is_integer(typ):
                new = (np.asarray(s.to_numpy(zero_copy_only=False), np.int64)
                       + np.asarray(p.to_numpy(zero_copy_only=False),
                                    np.int64))
            else:
                new = (np.asarray(s.to_numpy(zero_copy_only=False),
                                  np.float64)
                       + np.asarray(p.to_numpy(zero_copy_only=False),
                                    np.float64))
            new_cols[out] = pa.array(new).cast(typ)
        else:
            s = j[f"_s_{out}"]
            ins = j[f"_pi_{out}"]
            dele = j[f"_pd_{out}"]
            # existing group: the stored extreme survives unless a
            # deleted value TIES the would-be result — any delete that
            # could displace min(s, ins_min) satisfies d <= that value
            # <= s, so d <= s catches it (multiplicity unknown →
            # rescan). NEW group (born this window): inserted extremes
            # are only trustworthy if NOTHING was deleted — a
            # delete-after-insert inside the window may have removed
            # the extreme row, so any valid deleted value forces a
            # rescan.
            cmp = pc.less_equal if kind == "min" else pc.greater_equal
            tie = pc.fill_null(cmp(dele, s), False)
            tie = np.asarray(tie.combine_chunks()
                             .to_numpy(zero_copy_only=False), bool)
            del_valid = np.asarray(
                pc.is_valid(dele).combine_chunks()
                .to_numpy(zero_copy_only=False), bool)
            rescan_mask |= ((tie & exists) | (del_valid & ~exists)) & ~dead
            best = (pc.min_element_wise if kind == "min"
                    else pc.max_element_wise)
            new_cols[out] = best(s, ins).cast(typ)  # arrow skips nulls

    # net-zero groups that never existed (insert+delete inside one
    # window) are a no-op, not a delete of a missing key
    keep = ~(dead & ~exists)
    ops_tbl = pa.table({
        "op": pa.array(np.where(dead, "D", "I"), pa.string()),
        "lsn": pa.array(np.full(len(j), cur, np.int64()), pa.int64()),
        **{f.name: new_cols[f.name].cast(f.type) for f in schema},
    }).filter(pa.array(keep))

    n_rescan = int(rescan_mask.sum())
    if n_rescan:
        # exact extremes for groups whose stored extreme was deleted:
        # recompute ONLY those groups at the target version. predicate_in
        # prunes fragments/row-groups by containment on PHYSICAL group
        # columns (derived ones can't prune); exact membership is
        # re-filtered against the affected set below.
        affected = pa.table(
            {g: j[g].filter(pa.array(rescan_mask)) for g in group_cols})
        phys = set(src.schema().names)
        pin = {g: affected[g].to_pylist() for g in group_cols
               if g in phys} or None
        exact = _collect(_full_aggregate(
            src, cur, group_cols, main, transform, derived,
            transform_columns, predicate_in=pin))
        if exact is not None and len(exact):
            want = set(zip(*[affected[g].to_pylist() for g in group_cols]))
            got = list(zip(*[exact[g].to_pylist() for g in group_cols]))
            exact = exact.filter(pa.array([k in want for k in got]))
            exact = exact.rename_columns(
                [c if c in group_cols else f"_x_{c}"
                 for c in exact.column_names])
            exact = exact.append_column("_x__hit",
                                        pa.array([True] * len(exact)))
            ops_tbl = ops_tbl.join(exact, keys=group_cols,
                                   join_type="left outer")
            # hit-marker, NOT coalesce: a recomputed extreme that is
            # legitimately NULL (all remaining values null) must replace
            # the stale merged value
            hit = pc.fill_null(ops_tbl["_x__hit"], False)
            fixed = {
                out: pc.if_else(
                    hit, ops_tbl[f"_x_{out}"].cast(schema.field(out).type),
                    ops_tbl[out])
                for out, kind, _c in plan if kind in ("min", "max")}
            ops_tbl = pa.table({
                c: fixed.get(c, ops_tbl[c])
                for c in ["op", "lsn", *[f.name for f in schema]]})

    import ray.data as rd

    v = dst.merge(rd.from_arrow(ops_tbl),
                  job_id=view_job)
    store.set_pointer(_pointer_name(state_key), str(cur))
    store.set_pointer(pend_name, "")
    mf.set_floor(src.root, cur, _floor_token(dst.root, state_key))
    if stats is not None:
        stats["changed_groups"] = len(j)
        stats["rescanned_groups"] = n_rescan
        stats["deleted_groups"] = int(dead.sum())
    return v, replay


def _sync_aux(src, dst, group_cols, plan, transform, transform_columns,
              derived, state_key, last, cur, j) -> dict:
    """Maintain the count_distinct support tables through the window
    (signed (group..., value) deltas → aux MERGE, idempotent under the
    windowed job_id), then return {out: {group-key tuple: absolute
    distinct count}} for the changed groups. Replay-safe: the absolute
    read-back is a pure function of the committed aux state."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    from moonray.table import MoonrayTable

    from moonray import manifest as mf

    src_schema = src.schema()
    restrict = {g: sorted(set(j[g].to_pylist())) for g in group_cols}
    out_maps: dict = {}
    for out, col in _nd_plan(plan):
        aux = MoonrayTable.open(_aux_root(dst.root, out))
        keys = list(group_cols) + [col]
        aux_job = f"aggsync-{state_key}-aux-{out}-{last}-{cur}"
        if mf.find_version_by_job(aux.root, aux_job) is not None:
            # this aux merge committed before a crash: recomputing pair
            # deltas against the post-merge aux state would read a
            # killed pair as 0 + another -1 and trip the negative
            # guard — go straight to the absolute read-back
            out_maps[out] = _nd_absolute(aux, group_cols,
                                         restrict=restrict)
            continue
        # NOTE: the changelog window is re-read once per count_distinct
        # column (k+1 reads per round incl. the main fold) — the pair
        # key set differs per column, so the folds can't share a
        # shuffle; keep k small or accept the extra read
        def pair_delta(b: pa.Table, _col=col) -> pa.Table:
            if transform is not None:
                b = transform(b)
            ins = pc.equal(b["change_type"], "insert").combine_chunks()
            sign = np.where(ins.to_numpy(zero_copy_only=False), 1,
                            -1).astype(np.int64)
            t = pa.table({**{g: b[g] for g in group_cols},
                          _col: b[_col],
                          "_d": pa.array(sign)})
            t = t.filter(pc.is_valid(t[_col]))  # nulls never count
            g = t.group_by(keys, use_threads=False).aggregate(
                [("_d", "sum")])
            return g.rename_columns(
                ["_d" if c == "_d_sum" else c for c in g.column_names])

        pair_delta.__name__ = f"aux_pair_delta_{out}"
        folded = _collect(
            src.changes(last, cur)
            .map_batches(pair_delta, batch_format="pyarrow")
            .groupby(keys).aggregate(Sum("_d", alias_name="_d")))
        if folded is not None and len(folded):
            vtype = _col_type(col, src_schema, derived)
            folded = pa.table({
                **{g: folded[g].cast(_col_type(g, src_schema, derived))
                   for g in group_cols},
                col: folded[col].cast(vtype),
                "_d": folded["_d"].cast(pa.int64())})
            pair_keys = list(zip(*[folded[c].to_pylist() for c in keys]))
            stored = aux.lookup(pair_keys)
            stored = stored.rename_columns(
                [c if c in keys else f"_s_{c}"
                 for c in stored.column_names])
            pj = folded.join(stored, keys=keys, join_type="left outer")
            old_n = np.asarray(pc.fill_null(pj["_s_n"], 0)
                               .to_numpy(zero_copy_only=False), np.int64)
            new_n = old_n + np.asarray(
                pj["_d"].to_numpy(zero_copy_only=False), np.int64)
            if (new_n < 0).any():
                raise RuntimeError(
                    f"aux support table for {out!r} out of sync: a "
                    "(group, value) multiplicity went negative")
            p_exists = np.asarray(pc.is_valid(pj["_s_n"]).to_numpy(
                zero_copy_only=False), bool)
            p_dead = new_n == 0
            keep = ~(p_dead & ~p_exists)
            ops = pa.table({
                "op": pa.array(np.where(p_dead, "D", "I"), pa.string()),
                "lsn": pa.array(np.full(len(pj), cur, np.int64())),
                **{c: pj[c] for c in keys},
                "n": pa.array(new_n, pa.int64()),
            }).filter(pa.array(keep))
            if len(ops):
                import ray.data as rd

                aux.merge(rd.from_arrow(ops),
                          job_id=aux_job)
        out_maps[out] = _nd_absolute(aux, group_cols, restrict=restrict)
    return out_maps
