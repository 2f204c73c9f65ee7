"""Incremental table→table sync: materialized-view maintenance over the
changelog.

Composes the engine's CDC-out (``table.changes`` — per-commit inserts/
deletes in O(changed rows)) with its CDC-in (``table.merge``): a
destination table tracks a source table through a row ``insert_filter``
without ever rescanning the source. This is the moonlink composition a
real deployment runs between two tables/engines (reference: the
pg_replicate source feeding the moonlink sink, pg_replicate.rs →
moonlink_sink.rs), expressed table-to-table.

Correctness under filtering: updates arrive as delete+insert at one
commit version. Deletes ALWAYS pass through (never filtered), so a row
whose new value leaves the view is removed by its delete half; the
``_seq`` tie-break (delete=0 < insert=1) makes the insert half win when
both touch the same key at the same version — identical to the engine's
own streaming-xact ordering. The filter therefore must not touch key
columns' identity, only decide row membership / transform non-key
values.

Resume/exactly-once: the last-synced source version is a durable pointer
in the DESTINATION root (commit store — object-store safe), and each
sync round merges under a job_id derived from the (from, to) version
window, so a crash between merge and pointer update replays into the
idempotent-merge path instead of double-applying.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_SEQ = "_seq"


def _pointer_name(state_key: str) -> str:
    import os

    return os.path.join("sync", state_key)


def last_synced_version(dst, state_key: str = "default") -> int:
    from moonray.commitstore import store_for

    try:
        return int(store_for(dst.root).read_pointer(_pointer_name(state_key)))
    except FileNotFoundError:
        # first sync only — a transient read error must PROPAGATE, not
        # silently reset the pointer to 0 and replay the whole changelog
        return 0


def _src_floor_token(dst, state_key: str) -> str:
    import hashlib

    h = hashlib.sha256(f"{dst.root}|{state_key}".encode()).hexdigest()[:16]
    return f"sync-{h}"


def sync_incremental(src, dst, *, insert_filter=None,
                     state_key: str = "default") -> int:
    """Apply the source commits in (last_synced, src.latest] to ``dst``
    and advance the sync pointer. Returns dst's new version (or its
    current one when already up to date). ``insert_filter(batch) ->
    bool mask`` selects which INSERT rows belong to the view; deletes
    always flow.

    Expiry safety: each round advances a changelog FLOOR on the source
    (manifest.set_floor) so a routine ``expire_snapshots`` on src keeps
    the manifests this consumer still needs — without it, expiry would
    permanently break the incremental path. A source expired BEFORE the
    first sync (or with the floor manually cleared) surfaces as a
    'resync required' error instead of a FileNotFoundError."""
    from moonray import manifest as mf
    from moonray.commitstore import store_for

    last = last_synced_version(dst, state_key)
    cur = src.latest_version()
    # floor before reading: expiry running concurrently must not drop
    # the (last, cur] manifests out from under the changelog scan
    mf.set_floor(src.root, last, _src_floor_token(dst, state_key))
    if cur <= last:
        return dst.latest_version()
    schema = src.schema()

    def to_ops(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        is_ins = pc.equal(b["change_type"], "insert").combine_chunks() \
            .to_numpy(zero_copy_only=False)
        keep = np.ones(len(b), dtype=bool)
        if insert_filter is not None and is_ins.any():
            mask = insert_filter(b)
            if isinstance(mask, (pa.Array, pa.ChunkedArray)):
                mask = np.asarray(mask.to_numpy(zero_copy_only=False))
            keep = ~is_ins | np.asarray(mask, dtype=bool)
        t = b.filter(pa.array(keep))
        is_ins = is_ins[keep]
        cols = {
            "op": pa.array(np.where(is_ins, "I", "D").tolist(), pa.string()),
            "lsn": t["commit_version"].cast(pa.int64()),
            _SEQ: pa.array(is_ins.astype(np.int64), pa.int64()),
        }
        for f in schema:
            cols[f.name] = t[f.name]
        return pa.table(cols)

    to_ops.__name__ = "changelog_to_ops"
    try:
        ops = src.changes(last, cur).map_batches(to_ops,
                                                 batch_format="pyarrow")
        v = dst.merge(ops, seq_col=_SEQ,
                      job_id=f"sync-{state_key}-{last}-{cur}")
    except FileNotFoundError as e:
        raise RuntimeError(
            f"incremental sync (state_key={state_key!r}) needs source "
            f"manifests ({last}, {cur}] but at least one is expired: {e}. "
            "Resync required: rebuild dst from a full scan, then reset "
            "the sync pointer to the scanned version.") from e
    store_for(dst.root).set_pointer(_pointer_name(state_key), str(cur))
    mf.set_floor(src.root, cur, _src_floor_token(dst, state_key))
    return v
