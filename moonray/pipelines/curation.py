"""Image-corpus curation flagship: quality-filter → pHash near-dup
groups → distributed component collapse → best-per-group representative.

The end-to-end curation pass every large image+caption corpus runs
before training (the task brief's ray-data × image axes): drop rows
with junk captions, find perceptual-hash duplicate FAMILIES (not just
pairs — re-encodes of re-encodes chain), and keep exactly one
representative per family, preferring the highest-resolution copy.

Scale shape: pixels never move — the dup detection runs on thin
(image_id, phash) rows (functions.multimodal.phash_near_dups, byte-band
LSH, exact ≤7 bits), the collapse is the distributed min-label
propagation of functions.components (no driver union-find), and the
representative choice is two more thin co-partitioned shuffles
carrying (id, component, area). Only the final drop set (O(duplicate
rows), strictly smaller than the pair set) reaches the driver for the
broadcast filter.

Node ids: connected_components needs int64 nodes, so string image ids
map through a vectorized 64-bit columnar hash with an explicit
collision CHECK that raises rather than silently merging unrelated
groups. Fine to ~1e9 images; beyond that swap in a dense id from the
table's key index (or a 128-bit id) — the check makes the boundary
loud, not wrong.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from moonray.util import default_buckets


def _hash_ids(col, hash_fn=None) -> pa.Array:
    """Vectorized 64-bit node id per string id. Default path is polars'
    columnar xxhash (no per-row Python — this runs over the whole corpus
    several times per curation pass); only intra-run consistency matters
    (the collision check is loud, and every user-visible output carries
    the original string id, never the node id). ``hash_fn`` injection
    (tests forcing collisions) falls back to the per-row loop."""
    if hash_fn is not None:
        return pa.array(
            [hash_fn(v) & 0x7FFFFFFFFFFFFFFF for v in col.to_pylist()],
            pa.int64())
    import polars as pl

    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    h = pl.from_arrow(pa.table({"s": arr}))["s"].hash(seed=0).to_numpy()
    return pa.array((h & np.uint64(0x7FFFFFFFFFFFFFFF)).astype(np.int64))


def caption_quality_filter(ds, *, caption_col: str = "caption",
                           min_tokens: int = 4, max_tokens: int = 512):
    """Vectorized caption gate: token count in [min, max] and non-empty
    after strip — the cheap first pass that shrinks everything after."""
    import pyarrow.compute as pc

    def keep(b: pa.Table) -> pa.Table:
        cap = b[caption_col]
        toks = pc.count_substring_regex(cap, r"\S+")
        ok = pc.and_(pc.greater_equal(toks, min_tokens),
                     pc.less_equal(toks, max_tokens))
        return b.filter(pc.fill_null(ok, False))

    keep.__name__ = "caption_quality_filter"
    return ds.map_batches(keep, batch_format="pyarrow")


def image_dup_groups(ds, *, id_col: str = "image_id",
                     phash_col: str = "phash", max_hamming: int = 4,
                     buckets: int | None = None, _hash_fn=None):
    """pHash near-dup FAMILIES: (image_id, id64, component) rows for
    every image that belongs to a duplicate group (singletons omitted).
    Exact for max_hamming ≤ 7 (byte-band pigeonhole) + exact transitive
    closure (min-label propagation)."""
    from moonray.functions.components import connected_components
    from moonray.functions.multimodal import phash_near_dups

    n_buckets = buckets or default_buckets()
    thin = ds.select_columns([id_col, phash_col])

    # ---- string id → int64 node id, with loud collision detection ----
    def add_hash(b: pa.Table) -> pa.Table:
        h = _hash_ids(b[id_col], _hash_fn)
        bkt = pa.array((np.asarray(h).astype(np.uint64)
                        % np.uint64(n_buckets)).astype(np.int32))
        return pa.table({"id64": h, id_col: b[id_col], "_bkt": bkt})

    add_hash.__name__ = "hash_image_ids"

    def check_collisions(g: pa.Table) -> pa.Table:
        t = g.sort_by([("id64", "ascending"), (id_col, "ascending")])
        h = t["id64"].to_numpy(zero_copy_only=False)
        ids = t[id_col].to_pylist()
        same_h = h[1:] == h[:-1]
        diff_id = np.array([ids[i + 1] != ids[i] for i in range(len(ids) - 1)],
                           dtype=bool) if len(ids) > 1 else np.array([], bool)
        if np.any(same_h & diff_id):
            k = int(np.flatnonzero(same_h & diff_id)[0])
            raise RuntimeError(
                f"64-bit id collision: {ids[k]!r} vs {ids[k + 1]!r} — use a "
                "dense id (key index ordinal) or 128-bit ids at this scale")
        first = np.ones(len(h), dtype=bool)
        first[1:] = ~same_h
        return t.filter(pa.array(first)).select(["id64", id_col])

    check_collisions.__name__ = "check_id64_collisions"
    idmap = (thin.map_batches(add_hash, batch_format="pyarrow")
             .groupby("_bkt").map_groups(check_collisions,
                                         batch_format="pyarrow")
             .materialize())

    pairs = phash_near_dups(thin, id_col=id_col, phash_col=phash_col,
                            max_hamming=max_hamming)

    def pairs_to_int(b: pa.Table) -> pa.Table:
        return pa.table({"a": _hash_ids(b["a"], _hash_fn),
                         "b": _hash_ids(b["b"], _hash_fn)})

    pairs_to_int.__name__ = "pairs_to_id64"
    comp = connected_components(
        pairs.map_batches(pairs_to_int, batch_format="pyarrow"))

    # ---- attach the original string id back (co-partitioned) ---------
    def tag(table_kind: int, key_col: str, val_col: str, val_type):
        def f(t: pa.Table) -> pa.Table:
            k = t[key_col].to_numpy(zero_copy_only=False)
            bkt = pa.array((k.astype(np.uint64) % np.uint64(n_buckets))
                           .astype(np.int32))
            return pa.table({"_k": pa.array(np.full(len(t), table_kind,
                                                    np.int8)),
                             "id64": t[key_col],
                             "_v": t[val_col].cast(val_type),
                             "_bkt": bkt})

        f.__name__ = f"tag_kind{table_kind}"
        return f

    def attach_names(g: pa.Table) -> pa.Table:
        kind = g["_k"].to_numpy(zero_copy_only=False)
        h = g["id64"].to_numpy(zero_copy_only=False)
        is_name = kind == 0
        nh = h[is_name]
        order = np.argsort(nh)
        nh = nh[order]
        names = np.array(g["_v"].to_pylist(), dtype=object)[is_name][order]
        ch, cv = h[~is_name], g["_v"].to_numpy(zero_copy_only=False)[~is_name]
        pos = np.searchsorted(nh, ch)
        return pa.table({
            id_col: pa.array(names[pos].tolist(), pa.string()),
            "id64": pa.array(ch, pa.int64()),
            "component": pa.array(cv.astype(np.int64)),
        })

    attach_names.__name__ = "attach_image_ids"
    named = (idmap.map_batches(tag(0, "id64", id_col, pa.string()),
                               batch_format="pyarrow")
             .union(comp.map_batches(
                 lambda t: pa.table({
                     "_k": pa.array(np.ones(len(t), np.int8)),
                     "id64": t["id"],
                     "_v": t["component"].cast(pa.string()),
                     "_bkt": pa.array(
                         (t["id"].to_numpy(zero_copy_only=False)
                          .astype(np.uint64) % np.uint64(n_buckets))
                         .astype(np.int32)),
                 }), batch_format="pyarrow"))
             .groupby("_bkt").map_groups(attach_names,
                                         batch_format="pyarrow"))
    return named


def duplicate_drops(ds, *, id_col: str = "image_id",
                    max_hamming: int = 4, buckets: int | None = None,
                    _hash_fn=None):
    """Streaming Dataset of the NON-representative members of every
    pHash duplicate family in ``ds`` (one ``id_col`` column). The
    representative is the max-w×h-area member; ties break to the
    lexicographically smallest id, so output is deterministic. Input
    rows need (id, phash, w, h) and must already be quality-gated —
    gated copies should neither represent nor veto a family. Everything
    here is thin co-partitioned shuffles; nothing is driver-collected,
    so callers choose their regime: broadcast the drop set (Dataset
    curation, O(dups) driver memory) or stream it into a MERGE of
    deletes (curate_table, O(1) driver memory)."""
    n_buckets = buckets or default_buckets()
    groups = image_dup_groups(ds, id_col=id_col, max_hamming=max_hamming,
                              buckets=n_buckets, _hash_fn=_hash_fn)

    # co-partition group rows with (id, area) metadata by id64 hash,
    # then pick the representative per component and emit the DROPS
    def add_area(b: pa.Table) -> pa.Table:
        w = b["w"].to_numpy(zero_copy_only=False).astype(np.int64)
        h = b["h"].to_numpy(zero_copy_only=False).astype(np.int64)
        hh = _hash_ids(b[id_col], _hash_fn)
        bkt = pa.array((np.asarray(hh).astype(np.uint64)
                        % np.uint64(n_buckets)).astype(np.int32))
        return pa.table({"id64": hh, "area": pa.array(w * h), "_bkt": bkt})

    add_area.__name__ = "thin_area_rows"

    def bucket_by_component(t: pa.Table) -> pa.Table:
        c = t["component"].to_numpy(zero_copy_only=False)
        return t.append_column("_cbkt", pa.array(
            (c.astype(np.uint64) % np.uint64(n_buckets)).astype(np.int32)))

    def join_area(g: pa.Table) -> pa.Table:
        kind = g["_k"].to_numpy(zero_copy_only=False)
        h = g["id64"].to_numpy(zero_copy_only=False)
        is_area = kind == 0
        ah = h[is_area]
        order = np.argsort(ah)
        ah = ah[order]
        av = g["_v"].to_numpy(zero_copy_only=False)[is_area][order]
        gh = h[~is_area]
        names = np.array(g["_n"].to_pylist(), dtype=object)[~is_area]
        comps = g["_v"].to_numpy(zero_copy_only=False)[~is_area]
        pos = np.searchsorted(ah, gh)
        return pa.table({
            id_col: pa.array(names.tolist(), pa.string()),
            "component": pa.array(comps.astype(np.int64)),
            "area": pa.array(av[pos].astype(np.int64)),
        })

    join_area.__name__ = "join_group_area"

    def pick_drops(g: pa.Table) -> pa.Table:
        t = g.sort_by([("component", "ascending"), ("area", "descending"),
                       (id_col, "ascending")])
        c = t["component"].to_numpy(zero_copy_only=False)
        first = np.ones(len(c), dtype=bool)
        first[1:] = c[1:] != c[:-1]
        return t.filter(pa.array(~first)).select([id_col])

    pick_drops.__name__ = "drop_non_representatives"

    def tag_area(t: pa.Table) -> pa.Table:
        return pa.table({"_k": pa.array(np.zeros(len(t), np.int8)),
                         "id64": t["id64"],
                         "_n": pa.array([""] * len(t), pa.string()),
                         "_v": t["area"], "_bkt": t["_bkt"]})

    def tag_groups(t: pa.Table) -> pa.Table:
        hh = t["id64"].to_numpy(zero_copy_only=False)
        bkt = pa.array((hh.astype(np.uint64) % np.uint64(n_buckets))
                       .astype(np.int32))
        return pa.table({"_k": pa.array(np.ones(len(t), np.int8)),
                         "id64": t["id64"], "_n": t[id_col],
                         "_v": t["component"], "_bkt": bkt})

    tag_area.__name__, tag_groups.__name__ = "tag_area", "tag_groups"
    area_rows = ds.map_batches(add_area, batch_format="pyarrow")
    joined = (area_rows.map_batches(tag_area, batch_format="pyarrow")
              .union(groups.map_batches(tag_groups, batch_format="pyarrow"))
              .groupby("_bkt").map_groups(join_area, batch_format="pyarrow"))
    return (joined.map_batches(bucket_by_component, batch_format="pyarrow")
            .groupby("_cbkt").map_groups(pick_drops, batch_format="pyarrow"))


def curate_image_corpus(ds, *, id_col: str = "image_id",
                        caption_col: str = "caption",
                        max_hamming: int = 4, min_tokens: int = 4,
                        max_tokens: int = 512,
                        buckets: int | None = None):
    """Full curation pass. Returns the curated Dataset: caption-gated
    rows minus non-representative near-dups (see duplicate_drops for
    the representative rule). Drop set is broadcast (O(dups) driver
    memory); for in-place table curation with no driver materialization
    use curate_table."""
    import ray

    ds = caption_quality_filter(ds, caption_col=caption_col,
                                min_tokens=min_tokens,
                                max_tokens=max_tokens).materialize()
    drops_ds = duplicate_drops(ds, id_col=id_col, max_hamming=max_hamming,
                               buckets=buckets)
    drop_tbl = pa.concat_tables(
        [pa.table({id_col: pa.array([], pa.string())})]
        + [b for b in drops_ds.iter_batches(batch_format="pyarrow")],
        promote_options="permissive")
    drop_ref = ray.put(drop_tbl[id_col].combine_chunks())

    def keep(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        d = ray.get(drop_ref)   # broadcast once; node-local thereafter
        if len(d) == 0:
            return b
        return b.filter(pc.invert(pc.is_in(b[id_col], value_set=d)))

    keep.__name__ = "keep_representatives"
    return ds.map_batches(keep, batch_format="pyarrow")


def curate_table(table, *, lsn: int, id_col: str = "image_id",
                 caption_col: str = "caption", max_hamming: int = 4,
                 min_tokens: int = 4, max_tokens: int = 512,
                 buckets: int | None = None,
                 job_id: str | None = None) -> int:
    """Curate a LIVE MoonrayTable in place: one MERGE of delete rows for
    (a) rows failing the caption quality gate and (b) non-representative
    members of each pHash duplicate family. Pixels never move — the dup
    detection and representative choice run on a COLUMN-PRUNED scan of
    (id, phash, w, h, caption) thin columns, and the deletes go through
    the normal DV path (batch-atomic commit, snapshot isolation,
    idempotent resume under ``job_id``, time travel to the pre-curation
    version — everything a destructive Dataset rewrite would lose).
    Returns the committed version.

    Family semantics match curate_image_corpus: the quality gate runs
    FIRST, so junk-captioned copies neither represent nor veto a
    family."""
    import pyarrow.compute as pc

    thin_cols = list(dict.fromkeys([id_col, "phash", "w", "h", caption_col]))
    # coalesce to FEW LARGE blocks before the wide stages: the scan
    # emits one block per fragment, and Ray's sort shuffle creates
    # O(input blocks × partitions) intermediate objects whose inlined
    # copies accumulate in the DRIVER (the object owner) — measured
    # ~2 GB driver heap at 280k rows × 280 fragments. Thin rows are
    # ~50 B each, so ~500k rows per block keeps blocks in the tens of
    # MiB and the intermediate count O(cpus × partitions).
    import ray as _ray

    cpus = (int(_ray.cluster_resources().get("CPU", 8))
            if _ray.is_initialized() else 8)
    card = table.describe()["cardinality"]
    nblocks = max(2 * cpus, card // 500_000)
    thin = (table.scan(columns=thin_cols).repartition(nblocks)
            .materialize())

    def tok_ok(b: pa.Table) -> pa.Array:
        # same band as caption_quality_filter — the two curation paths
        # must gate identically or table vs Dataset output diverges
        toks = pc.count_substring_regex(b[caption_col], r"\S+")
        ok = pc.and_(pc.greater_equal(toks, min_tokens),
                     pc.less_equal(toks, max_tokens))
        return pc.fill_null(ok, False)

    def quality_fails(b: pa.Table) -> pa.Table:
        return b.filter(pc.invert(tok_ok(b))).select([id_col])

    def quality_passes(b: pa.Table) -> pa.Table:
        return b.filter(tok_ok(b))

    quality_fails.__name__ = "quality_fail_ids"
    quality_passes.__name__ = "quality_pass_rows"
    gated = thin.map_batches(quality_passes, batch_format="pyarrow")

    schema = table.schema()

    def to_deletes(b: pa.Table) -> pa.Table:
        n = len(b)
        cols = {
            "op": pa.array(["D"] * n, pa.string()),
            "lsn": pa.array(np.full(n, lsn, np.int64)),
            id_col: b[id_col],
        }
        # D rows carry the full schema with null payloads (the CDC
        # change-row shape merge expects; only the key matters)
        for f in schema:
            if f.name not in cols:
                cols[f.name] = pa.nulls(n, f.type)
        return pa.table(cols)

    to_deletes.__name__ = "curation_delete_rows"
    # drops = quality failures ∪ non-representative dups, both streaming
    # Datasets of thin id rows — NOTHING is collected on the driver;
    # the union feeds one MERGE of (op, lsn, key) rows through the
    # normal DV delete path
    drops = (thin.map_batches(quality_fails, batch_format="pyarrow")
             .union(duplicate_drops(gated, id_col=id_col,
                                    max_hamming=max_hamming,
                                    buckets=buckets)))
    return table.merge(drops.map_batches(to_deletes, batch_format="pyarrow"),
                       job_id=job_id)
