"""VACUUM — orphan-file GC for a table root.

``expire_snapshots`` deletes files when their last referencing VERSION
expires; what it can't see are files that were never referenced at all:
fragments/DV/index objects published by a job that crashed before its
commit (the write path publishes artifacts first, commits the manifest
last — crash-safe for the table, but the published bytes linger), or
sidecars left by interrupted colindex builds. This is Delta's VACUUM /
Iceberg's remove-orphan-files, applied to moonray's layout.

Safety model:

- the reachable set is the UNION over every retained version manifest
  (fragment paths, DV delta files, index partition files) plus every
  bloom sidecar referenced by a column index — so time travel, pinned
  snapshots, tags and clone sources (their pins retain the versions
  whose manifests hold the refs) all stay intact;
- only the artifact directories are swept (``fragments/ dv/ index/
  colindex/``): ``staging/``/``lineage/`` belong to the expiry GC,
  ``versions/``/``pins/``/``segments/`` to the manifest layer;
- ``grace_seconds`` (default 24 h) keeps any file younger than the
  grace window — a running job's just-published artifacts are never
  swept out from under its commit (local roots; remote stores expose
  no mtime, so on a remote root vacuum requires ``grace_seconds=0``
  and the caller's guarantee that no job is in flight);
- ``dry_run=True`` lists without deleting.
"""

from __future__ import annotations

import os
import time


_SWEEP_DIRS = ("fragments", "dv", "index", "colindex")


def _reachable(root: str) -> set[str]:
    """Union of manifest.referenced_files over every retained version
    (the canonical ref enumeration — vacuum must never diverge from
    it) plus the colindex sidecar refs. index.json is read FRESH (via
    the commit store on remote roots), never through the worker file
    cache: a stale cached copy would classify newly-built sidecars as
    orphans."""
    import json

    from moonray import colindex
    from moonray import manifest as mf
    from moonray.filecache import is_remote

    refs: set[str] = set()
    for v in mf.list_versions(root):
        refs |= mf.referenced_files(mf.load_manifest(root, v))
    for col in colindex.list_indexed_columns(root):
        rel = f"colindex/{col}/index.json"
        refs.add(rel)
        try:
            if is_remote(root):
                from moonray.commitstore import store_for

                idx = json.loads(store_for(root).read(rel))
            else:
                with open(os.path.join(root, rel)) as f:
                    idx = json.load(f)
        except (FileNotFoundError, OSError, ValueError):
            continue
        for e in idx.get("frags", {}).values():
            refs.add(e["bloom"])
    return refs


def vacuum_table(table, *, grace_seconds: float = 86400.0,
                 dry_run: bool = False) -> dict:
    """Delete unreferenced artifact files under the table root.
    Returns {"orphans": [rel, ...], "deleted": n, "kept_recent": n,
    "scanned": n}."""
    from moonray.filecache import is_remote

    root = table.root
    refs = _reachable(root)
    remote = is_remote(root)
    if remote and grace_seconds > 0:
        raise ValueError(
            "remote roots expose no mtime for the grace window — run "
            "vacuum with grace_seconds=0 only when no job is in flight")

    found: list[tuple[str, float | None]] = []
    if remote:
        from moonray.commitstore import store_for

        store = store_for(root)
        for d in _SWEEP_DIRS:
            found += [(rel, None) for rel in store.list(d)]
    else:
        for d in _SWEEP_DIRS:
            base = os.path.join(root, d)
            for dirpath, _dirs, files in os.walk(base):
                for fn in files:
                    p = os.path.join(dirpath, fn)
                    found.append((os.path.relpath(p, root),
                                  os.path.getmtime(p)))

    now = time.time()
    orphans, kept_recent = [], 0
    for rel, mtime in found:
        # publish_tmp siblings are '<final>.tmp.<hex>' — but the grace
        # window, not this name check, is the real in-flight protection
        if rel in refs or ".tmp." in os.path.basename(rel):
            continue
        if mtime is not None and now - mtime < grace_seconds:
            kept_recent += 1
            continue
        orphans.append(rel)

    deleted = 0
    if not dry_run:
        if remote:
            from moonray.commitstore import store_for

            store = store_for(root)
            for rel in orphans:
                try:
                    store.delete(rel)
                    deleted += 1
                except FileNotFoundError:
                    pass
        else:
            for rel in orphans:
                try:
                    os.unlink(os.path.join(root, rel))
                    deleted += 1
                except FileNotFoundError:
                    pass
    return {"orphans": sorted(orphans), "deleted": deleted,
            "kept_recent": kept_recent, "scanned": len(found)}
