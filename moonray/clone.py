"""Zero-copy shallow clone: a new table whose first version references
the source's data/DV/index files in place.

The lakehouse pattern (Delta SHALLOW CLONE; Iceberg snapshot
re-registration — the reference's export path registers table metadata
over existing files the same way, src/moonlink/src/storage/table/
iceberg/iceberg_table_syncer.rs): cloning a 100 TB table is a metadata
commit, not a copy. Mechanics here:

- Every fragment / DV / index path in the cloned manifest is rewritten
  to an externally-rooted ref (``ext::<src_root>::<rel>``,
  filecache.ext_ref); all readers resolve these through
  ``filecache.data_path``, so scans/lookups/merges on the clone read
  the source's bytes directly (through the worker file cache for
  remote roots).
- The clone is copy-on-write: merges write their DV deltas and new
  fragments under the CLONE root; compaction/clustering rewrite
  external fragments into local ones. The source never observes any
  of it.
- The cloned source VERSION is pinned on the source under a token
  derived from the clone root, so a routine ``expire_snapshots`` on
  the source keeps every file the clone references. ``release_clone``
  drops that pin when the clone is deleted (or fully localized).
- The clone's own ``expire_snapshots`` can never delete source files:
  its GC deletes only files listed under the clone root, and ext refs
  never appear there.

A clone of a clone re-uses the grandparent refs verbatim (ext_ref
passes external refs through), but pins only its IMMEDIATE source —
keep intermediate clones alive, or localize, before dropping them.
"""

from __future__ import annotations

import hashlib

from moonray import manifest as mf
from moonray.filecache import ext_ref
from moonray.table import MoonrayTable


def _clone_token(dst_root: str) -> str:
    return "clone-" + hashlib.sha256(dst_root.encode()).hexdigest()[:16]


def clone_table(src: MoonrayTable, dst_root: str, *,
                version: int | None = None,
                ref: str | None = None) -> MoonrayTable:
    """Shallow-clone ``src`` (at ``version`` / tag ``ref``, default
    latest) into a new table at ``dst_root``. O(metadata): no data
    bytes move (measured 4→8 ms for 64→640 fragments). Returns the
    opened clone."""
    if ref is not None:
        if version is not None:
            raise ValueError("pass version or ref, not both")
        version = src.ref_version(ref)
    v = src.latest_version() if version is None else int(version)
    # dst check BEFORE the pin: the pin token derives from dst_root, so
    # pin-then-fail here would collide with (and on cleanup, destroy)
    # the retention pin of whatever clone already lives at dst
    try:
        mf.latest_version(dst_root)
        raise ValueError(f"destination already has a table: {dst_root}")
    except FileNotFoundError:
        pass
    # pin + GC-epoch handshake: an expire computing its retained set
    # re-reads pins until stable (manifest.expire_snapshots), so a pin
    # it observes is safe — the remaining race is an expire already
    # PAST its final pin read. gc_epoch detects that: if the epoch is
    # quiescent (begin == end) and unchanged across pin + manifest
    # load, no such expire ran and nothing needs verification; else we
    # wait for the expire to finish deleting and verify every file the
    # manifest references is still present (unpin + raise if not).
    import time as _time

    token = _clone_token(dst_root)
    epoch0 = mf.gc_epoch(src.root)
    mf.pin(src.root, v, token)
    try:
        m = src.manifest(v)
        epoch1 = mf.gc_epoch(src.root)
        if epoch1 != epoch0 or epoch0[0] != epoch0[1]:
            for _ in range(600):  # wait out the in-flight expire
                b, e = mf.gc_epoch(src.root)
                if b == e:
                    break
                _time.sleep(0.1)
            from moonray.commitstore import store_for
            from moonray.filecache import split_ext_ref

            def gone(rel: str) -> bool:
                ext = split_ext_ref(rel)
                if ext is not None:
                    return not store_for(ext[0]).exists(ext[1])
                return not store_for(src.root).exists(rel)

            missing = sorted(r for r in mf.referenced_files(m) if gone(r))
            if missing:
                raise FileNotFoundError(
                    f"version {v} lost {len(missing)} files to a "
                    f"concurrent expire_snapshots (first: {missing[0]}); "
                    "re-run clone_table against a retained version")
    except BaseException:
        mf.unpin(src.root, token)
        raise

    frags = []
    for f in m["fragments"]:
        f = dict(f)
        f["path"] = ext_ref(src.root, f["path"])
        if f.get("dv"):
            f["dv"] = [ext_ref(src.root, r) for r in f["dv"]]
        frags.append(f)
    index = {
        "num_partitions": m["index"]["num_partitions"],
        "partitions": {p: [ext_ref(src.root, r) for r in rels]
                       for p, rels in m["index"]["partitions"].items()},
    }
    mf.init_table_dirs(dst_root)
    clone_m = {
        "version": 0,
        "parent": None,
        "commit_lsn": m["commit_lsn"],  # LSN domain continues in the clone
        "job_id": f"clone-of-{v}",
        "key_col": m.get("key_col"),
        "key_cols": m.get("key_cols"),
        "identity": m.get("identity", "keys"),
        "zone_cols": m.get("zone_cols", []),
        "index": index,
        "fragments": frags,
        "rows_per_fragment": m["rows_per_fragment"],
        "schema_ipc": m["schema_ipc"],
        "column_defaults": dict(m.get("column_defaults", {})),
        "stats": dict(m.get("stats", {})),
        "cloned_from": {"root": src.root, "version": v},
    }
    mf.commit_manifest(dst_root, clone_m)
    return MoonrayTable(dst_root)


def release_clone(src: MoonrayTable, dst_root: str) -> None:
    """Drop the source-version pin held for the clone at ``dst_root``.
    Call when the clone is deleted or fully localized — after this, a
    source ``expire_snapshots`` may delete files the clone still
    references. Idempotent (unpin of a missing pin is a no-op)."""
    release_clone_at(src.root, dst_root)


def release_clone_at(src_root: str, dst_root: str) -> None:
    """release_clone by roots — used by catalog drop_table, which knows
    only the ``cloned_from`` record."""
    mf.unpin(src_root, _clone_token(dst_root))


def localize_clone(clone: MoonrayTable) -> int:
    """Rewrite every externally-rooted fragment into the clone's own
    root (compaction over exactly the ext fragments), turning the
    shallow clone into a self-contained table. Index entries follow via
    a full index rebuild (optimize('index') folds merged entries; the
    compaction path re-stages moved rows' index entries like any
    rewrite). Returns the new version. After this + one
    ``release_clone``, the source may be expired or deleted freely."""
    from moonray.filecache import EXT_PREFIX

    v = clone.optimize("full")  # force_full compaction + full index fold
    still = sorted(r for r in mf.referenced_files(clone.manifest())
                   if r.startswith(EXT_PREFIX))
    if still:
        raise RuntimeError(
            f"localize left {len(still)} external refs (first: {still[0]}) "
            "— expected none after optimize('full'); investigate before "
            "releasing the source pin")
    return v
