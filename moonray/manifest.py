"""Versioned table manifests: atomic publish, pinning, expiry.

One manifest JSON per committed version — the analogue of a mooncake/
Iceberg snapshot (reference: ``Snapshot`` at
src/moonlink/src/storage/mooncake_table.rs:159-184 maps 1:1 to an
Iceberg snapshot; commit via the iceberg syncer at
src/moonlink/src/storage/table/iceberg/iceberg_table_syncer.rs).

Layout under a table root::

    versions/v{N:08d}.json   immutable manifest per version
    versions/LATEST          current version number (temp+rename publish)
    pins/{token}             reader pins: version numbers expiry must keep
    fragments/ dv/ index/    data files referenced by manifests
    lineage/                 per-job checkpoint logs (checkpoint.py)

Manifest contents: fragment list (path, rows, bytes, DV ref + count,
zone maps, created_version), hash-partitioned key-index file lists,
``commit_lsn`` (LSN visibility: a scan of version V sees exactly the
changes committed at LSN ≤ commit_lsn(V) — reference rule at
src/moonlink/src/storage/mooncake_table.rs:438-443), and the job_id that
committed it (idempotent resume).

Single-writer model (as in the reference: one TableHandler per table);
readers are lock-free — they read an immutable manifest file.
"""

from __future__ import annotations

import glob
import os

from moonray.util import HASH_IMPL, atomic_write_text, read_json

FORMAT = "moonray/1"

# ---------------------------------------------------------------------------
# Segmented fragment lists (the Iceberg manifest-list trick)
#
# Above _SEG_INLINE_MAX fragments, a version's fragment list is stored
# as content-addressed SEGMENT files under segments/ and the version
# JSON carries only the refs. Chunk boundaries are content-defined over
# fragment ids (boundary after every id whose hash % _SEG_TARGET == 0),
# so they are stable across versions: an append / compaction perturbs
# only its own chunk(s), every other chunk re-hashes to the same
# content address and is REUSED — a commit writes O(changed) metadata
# bytes instead of rewriting the whole list. DV refs/counts are split
# out of the entries into a separate content-addressed dv-state object
# (see _write_segments), so a MERGE whose deletes scatter across the
# whole table — the common case — rewrites NO core chunk at all. At
# 10^12 images (~10^7 fragments) a monolithic per-commit rewrite would
# make metadata the MERGE bottleneck; with segments the version JSON
# holds ~n/TARGET refs and steady-state commits touch a handful of
# objects. (Reference analogue: Iceberg snapshots reference manifest
# files and carry unchanged ones over, with v3 deletion vectors stored
# apart from the data manifests — iceberg_table_syncer.rs commit path,
# deletion_vector.rs.)
# ---------------------------------------------------------------------------

_SEG_INLINE_MAX = int(os.environ.get("MOONRAY_MANIFEST_INLINE_MAX", "128"))
_SEG_TARGET = int(os.environ.get("MOONRAY_MANIFEST_SEGMENT_TARGET", "1024"))

# immutable, content-addressed → safe to cache process-wide
_SEG_CACHE: dict = {}
_SEG_CACHE_MAX = 512

# chunk-ref reuse: a core entry's content is a pure function of its
# fragment id (DV state is split out before chunking, rewrites mint new
# ids — job-uuid-prefixed — and ALTER is metadata-only), so a chunk's
# content address is determined by its id SEQUENCE alone. Commits look
# up (root, blake2b(ids)) here and reuse the ref without re-serializing
# the chunk: both the bytes written AND the hashing become O(changed
# fragments) per commit (previously bytes were O(changed) but content
# addressing still re-serialized every chunk, ~6 µs/fragment — see the
# manifest_bench table in BASELINE.md). A hit still stats the segment
# object so a ref GC'd by expire_snapshots falls through to a rewrite.
# MOONRAY_MANIFEST_PARANOID=1 (set by tests/conftest.py) re-serializes
# every hit and asserts the address matches, enforcing the invariant.
_CHUNK_REF_CACHE: dict = {}
_CHUNK_REF_CACHE_MAX = 8192


def _chunk_key(store, ids: list) -> tuple:
    import hashlib

    digest = hashlib.blake2b("\0".join(ids).encode(),
                             digest_size=16).digest()
    return (getattr(store, "root", ""), digest)


def _remember_chunk(store, ids: list, ref: dict) -> None:
    if len(_CHUNK_REF_CACHE) >= _CHUNK_REF_CACHE_MAX:
        _CHUNK_REF_CACHE.clear()  # tiny values; wholesale reset is fine
    _CHUNK_REF_CACHE[_chunk_key(store, ids)] = {
        "path": ref["path"], "count": ref["count"]}


def _seg_read(store, rel: str) -> list:
    import json

    key = (getattr(store, "root", ""), rel)
    entries = _SEG_CACHE.get(key)
    if entries is None:
        entries = json.loads(store.read(rel))
        if len(_SEG_CACHE) >= _SEG_CACHE_MAX:
            _SEG_CACHE.clear()  # tiny objects; wholesale reset is fine
        _SEG_CACHE[key] = entries
    # per-entry copies: callers build child manifests from these
    # objects and must never reach the shared cache through them
    if isinstance(entries, dict):  # dv-state: {frag_id: [dv_refs, count]}
        return {k: [list(v[0]), v[1]] for k, v in entries.items()}
    return [dict(e) for e in entries]


def _segment_runs(ids: list) -> list[tuple]:
    """Content-defined chunk bounds [(a, b), ...] over the id sequence."""
    import numpy as np
    import pyarrow as pa

    from moonray.util import hash_key_array

    h = hash_key_array(pa.array(ids, pa.string()))
    cut_idx = np.flatnonzero((h % np.uint64(_SEG_TARGET)) == 0)
    cap = 4 * _SEG_TARGET  # bound pathological boundary droughts
    bounds, start = [], 0
    for c in cut_idx.tolist():
        end = c + 1
        while end - start > cap:
            bounds.append(start + cap)
            start += cap
        bounds.append(end)
        start = end
    n = len(ids)
    while n - start > cap:
        bounds.append(start + cap)
        start += cap
    if start < n:
        bounds.append(n)
    # loop is over boundaries (~n/TARGET), not fragments: the only
    # O(fragments) commit-side cost left is the vectorized id hash —
    # chunk serialization is skipped for id-identical chunks via
    # _CHUNK_REF_CACHE (see _write_segments)
    return list(zip([0] + bounds[:-1], bounds))


def _put_content_addressed(store, kind: str, obj) -> dict:
    import hashlib
    import json

    from moonray.commitstore import CommitConflict

    payload = json.dumps(obj, sort_keys=True, separators=(",", ":")).encode()
    sha = hashlib.sha256(payload).hexdigest()[:32]
    rel = os.path.join("segments", f"{kind}-{sha}.json")
    if not store.exists(rel):
        try:
            store.put_if_absent(rel, payload)
        except CommitConflict:
            pass  # content-addressed: the existing bytes are ours
    return {"path": rel, "count": len(obj)}


def _write_segments(store, frags: list) -> tuple[list[dict], dict]:
    """Store the fragment list as (immutable core segments, DV state).

    DV refs/counts are SPLIT OUT of the fragment entries before
    chunking (the Iceberg-v3 separation of data manifests from
    deletion-vector state): a MERGE whose deletes scatter across the
    whole table changes only the dv-state object — every core chunk
    re-hashes to its existing content address and costs zero new bytes.
    Core chunks rewrite only when fragments are added/removed/replaced
    (append, compaction, clustering), and the dv-state object is itself
    content-addressed, so append-only commits reuse the parent's
    byte-for-byte. DV state stays O(fragments-with-DVs) and is emptied
    every time compaction/clustering folds DVs into rewritten files."""
    dv_state = {}
    ids = []
    for f in frags:
        if f.get("dv") or f.get("dv_count"):
            dv_state[f["id"]] = [list(f.get("dv", [])),
                                 int(f.get("dv_count", 0))]
        ids.append(f["id"])

    def cores(a: int, b: int) -> list:
        # built lazily per cache-missed run: on a hit-everywhere commit
        # no per-entry dict copies happen at all
        return [{k: v for k, v in f.items() if k not in ("dv", "dv_count")}
                for f in frags[a:b]]

    paranoid = os.environ.get("MOONRAY_MANIFEST_PARANOID") == "1"
    refs = []
    for a, b in _segment_runs(ids):
        key = _chunk_key(store, ids[a:b])
        ref = _CHUNK_REF_CACHE.get(key)
        if ref is not None and store.exists(ref["path"]):
            if paranoid:
                fresh = _put_content_addressed(store, "seg", cores(a, b))
                assert fresh["path"] == ref["path"], (
                    "chunk-ref invariant violated: an id-identical chunk "
                    "serialized to a different content address — a core "
                    "fragment-entry field was mutated under a kept id")
            refs.append(dict(ref))
            continue
        ref = _put_content_addressed(store, "seg", cores(a, b))
        _remember_chunk(store, ids[a:b], ref)
        refs.append(dict(ref))
    return refs, _put_content_addressed(store, "dvs", dv_state)


def _resolve_fragments(store, seg_refs: list[dict]) -> list:
    if len(seg_refs) > 8:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=8) as ex:
            parts = list(ex.map(lambda s: _seg_read(store, s["path"]),
                                seg_refs))
    else:
        parts = [_seg_read(store, s["path"]) for s in seg_refs]
    out: list = []
    for s, p in zip(seg_refs, parts):
        # prime the chunk-ref cache so the FIRST commit after opening a
        # table already reuses unchanged chunks without re-serializing
        _remember_chunk(store, [e["id"] for e in p], s)
        out.extend(p)
    return out


def _vpath(root: str, version: int) -> str:
    return os.path.join(root, "versions", f"v{version:08d}.json")


def _vrel(version: int) -> str:
    return os.path.join("versions", f"v{version:08d}.json")


def _store(root: str):
    """Metadata-plane accessor: every manifest READ goes through the
    commit store, so a table whose root is an object-store URL (mock://
    in tests; S3 via the documented mapping) can be opened and scanned
    with no filesystem assumptions — the remote half of the reference's
    'Iceberg table readable by any engine' story. Local roots resolve
    to direct os calls with no extra copies."""
    from moonray.commitstore import store_for

    return store_for(root)


def is_remote_root(root: str) -> bool:
    return "://" in root


def init_table_dirs(root: str) -> None:
    if is_remote_root(root):
        # object stores have no directories; the scratch plane
        # (storage.scratch_for) creates its own dirs lazily
        return
    for d in ("versions", "fragments", "dv", "index", "segments", "pins",
              "floors", "lineage", "staging", "jobs"):
        os.makedirs(os.path.join(root, d), exist_ok=True)


def latest_version(root: str) -> int:
    return int(_store(root).read_pointer(os.path.join("versions", "LATEST")))


def load_manifest(root: str, version: int | None = None) -> dict:
    import json

    if version is None:
        version = latest_version(root)
    m = json.loads(_store(root).read(_vrel(version)))
    assert m["format"] == FORMAT, f"unknown table format {m['format']}"
    if m["hash_impl"] != HASH_IMPL:  # pragma: no cover
        raise RuntimeError(
            f"table was written with hash impl {m['hash_impl']}, runtime has {HASH_IMPL}; "
            "index partitioning would diverge"
        )
    if "fragments" not in m:
        store = _store(root)
        frags = _resolve_fragments(store, m["fragment_segments"])
        dv_state = (_seg_read(store, m["dv_state"]["path"])
                    if m.get("dv_state") else {})
        for f in frags:
            s = dv_state.get(f["id"])
            if s is None:
                # None = no DV (dv_paths_of normalizes) — avoids
                # allocating a fresh empty list per fragment, which at
                # 10^5+ entries is real GC pressure on every load
                f["dv"], f["dv_count"] = None, 0
            else:
                f["dv"], f["dv_count"] = s
        m["fragments"] = frags
    return m


def list_versions(root: str) -> list[int]:
    out = []
    for rel in _store(root).list("versions"):
        fn = os.path.basename(rel)
        if fn.startswith("v") and fn.endswith(".json"):
            out.append(int(fn[1:-5]))
    return sorted(out)


def commit_manifest(root: str, manifest: dict) -> int:
    """Atomically publish a new version through the commit store
    (commitstore.py): conditional-put of the immutable manifest object
    (CommitConflict if a concurrent writer beat us to the version id —
    no exists()/rename race), then the durable LATEST pointer swap. A
    crash between the two leaves LATEST at the parent — the new version
    is simply invisible, matching the reference's atomic Iceberg
    catalog-transaction commit (iceberg_table_syncer.rs:47-52). The
    same two primitives map to S3 conditional writes (see
    commitstore.S3CommitStore)."""
    import json

    from moonray.commitstore import store_for

    import time

    version = manifest["version"]
    manifest.setdefault("format", FORMAT)
    manifest.setdefault("hash_impl", HASH_IMPL)
    # commit wall-clock for timestamp time travel (Iceberg
    # snapshot timestamp-ms analogue); informational — ordering
    # guarantees come from version numbers, not clocks
    manifest.setdefault("committed_at", time.time())
    store = store_for(root)
    job_id = manifest.get("job_id")
    if job_id:
        # job marker BEFORE the version put: find_version_by_job resolves
        # resume checks from one directory listing instead of reading
        # every version JSON (O(history) reads at the head of every
        # merge/maintenance call). Marker-first ordering means a
        # committed version always has its marker; a marker whose
        # version put lost the race (or crashed) is validated against
        # the version JSON's job_id at lookup and skipped.
        from moonray.commitstore import CommitConflict

        try:
            store.put_if_absent(_job_marker_rel(job_id, version), b"")
        except CommitConflict:
            pass  # same job retrying the same version number
    frags = manifest.get("fragments")
    if frags is not None and len(frags) > _SEG_INLINE_MAX:
        manifest = dict(manifest)
        del manifest["fragments"]
        segs, dv_ref = _write_segments(store, frags)
        manifest["fragment_segments"] = segs
        manifest["dv_state"] = dv_ref
    payload = json.dumps(manifest, indent=1, sort_keys=True).encode()
    store.put_if_absent(os.path.join("versions", f"v{version:08d}.json"), payload)
    # monotonic publish: with concurrent append committers (table.py
    # rebase loop) a blind pointer write could regress LATEST to an
    # older committed version; advance_pointer only ever moves it up
    store.advance_pointer(os.path.join("versions", "LATEST"), version)
    return version


def _job_marker_rel(job_id: str, version: int) -> str:
    return os.path.join("jobs", f"{job_id}.v{version:08d}")


def _marker_versions(markers: list[str]) -> dict:
    """{version: marker rel} parsed from jobs/ listing entries."""
    out = {}
    for rel in markers:
        tail = os.path.basename(rel).rsplit(".v", 1)
        if len(tail) == 2 and tail[1].isdigit():
            out[int(tail[1])] = rel
    return out


def find_version_by_job(root: str, job_id: str) -> int | None:
    """Resume support: has job_id already committed a version?

    Fast path (every table committed by current code): one jobs/
    directory listing + at most one version read per marker candidate —
    NOT a read of every version JSON, which made the resume check at
    the head of each merge/maintenance call O(history) store reads.
    Versions without a marker (legacy tables, or a marker swept by a
    concurrent expire) are covered by a scan restricted to exactly the
    unmarked versions."""
    import json

    store = _store(root)
    markers = store.list("jobs")
    pref = f"{job_id}.v"
    cands = sorted((int(os.path.basename(rel)[len(pref):])
                    for rel in markers
                    if os.path.basename(rel).startswith(pref)
                    and os.path.basename(rel)[len(pref):].isdigit()),
                   reverse=True)
    for v in cands:
        try:
            m = json.loads(store.read(_vrel(v)))
        except (FileNotFoundError, OSError):
            continue  # marker from an attempt whose version put lost/crashed
        if m.get("job_id") == job_id:
            return v
    marked = _marker_versions(markers)
    for v in reversed([v for v in list_versions(root) if v not in marked]):
        m = json.loads(store.read(_vrel(v)))
        if m.get("job_id") == job_id:
            return v
    return None


def pin(root: str, version: int, token: str) -> None:
    _store(root).set_pointer(os.path.join("pins", token), str(version))


def unpin(root: str, token: str) -> None:
    _store(root).delete(os.path.join("pins", token))


def pinned_versions(root: str) -> set[int]:
    store = _store(root)
    return {int(store.read(rel)) for rel in store.list("pins")}


def named_tags(root: str) -> dict:
    """{tag name: version} — the pins whose token carries the ``tag-``
    prefix (MoonrayTable.tag). Tags ride the pin retention rule in
    expire_snapshots unchanged."""
    store = _store(root)
    out = {}
    for rel in store.list("pins"):
        fn = os.path.basename(rel)
        if fn.startswith("tag-"):
            out[fn[4:]] = int(store.read(rel))
    return out


def set_floor(root: str, version: int, token: str) -> None:
    """Changelog floor: a CDC consumer (incremental view sync, changes()
    tailer) at offset V needs the manifest RANGE (V, head] intact, not
    one version — expiry keeps every version ≥ the smallest floor. The
    Iceberg analogue is 'don't expire snapshots newer than the oldest
    incremental consumer'. Advanced each sync round; monotonic per
    token (a stale re-set never lowers an advanced floor)."""
    store = _store(root)
    rel = os.path.join("floors", token)
    try:
        if int(store.read(rel)) >= version:
            return
    except FileNotFoundError:
        pass
    store.set_pointer(rel, str(version))


def clear_floor(root: str, token: str) -> None:
    _store(root).delete(os.path.join("floors", token))


def floor_versions(root: str) -> set[int]:
    store = _store(root)
    return {int(store.read(rel)) for rel in store.list("floors")}


def referenced_files(manifest: dict) -> set[str]:
    from moonray.dv import dv_paths_of

    refs: set[str] = set()
    for s in manifest.get("fragment_segments", []):
        refs.add(s["path"])
    if manifest.get("dv_state"):
        refs.add(manifest["dv_state"]["path"])
    for f in manifest["fragments"]:
        refs.add(f["path"])
        refs.update(dv_paths_of(f))
    for paths in manifest["index"]["partitions"].values():
        refs.update(paths)
    return refs


def gc_epoch(root: str) -> tuple[int, int]:
    """(begin, end) GC-epoch counters: expire_snapshots bumps ``begin``
    before computing its retained set and ``end`` after its last
    delete. A reader that observes begin == end with the same values
    before and after taking a pin knows no expire ran concurrently —
    the handshake clone_table uses to make pin-then-read race-free."""
    store = _store(root)

    def rd(name: str) -> int:
        try:
            return int(store.read_pointer(os.path.join("gc", name)))
        except FileNotFoundError:
            return 0

    return rd("begin"), rd("end")


def expire_snapshots(root: str, keep_last: int = 2, keep_versions=()) -> dict:
    """True snapshot expiry (the reference has no distinct operator — it
    removes replaced files at each Iceberg commit, see
    src/moonlink/src/storage/table/iceberg/moonlink_catalog.rs:28-34 —
    the north rule requires explicit ``expire_snapshots``).

    Retains: the newest ``keep_last`` versions, every pinned version,
    and ``keep_versions``. Deletes older manifest files and any data/DV/
    index file not referenced by a retained manifest.

    Concurrent-pin safety: the pin set is re-read after the retained
    set is computed and the computation restarts if it changed (a pin
    that lands mid-compute — e.g. clone_table on another driver — must
    retain its version), bracketed by the gc_epoch counters so pinners
    can detect an expire that was already past its final pin read."""
    import json

    store = _store(root)
    epoch = gc_epoch(root)[0] + 1
    store.set_pointer(os.path.join("gc", "begin"), str(epoch))
    versions = list_versions(root)
    cur = latest_version(root)
    pins = pinned_versions(root)
    while True:
        keep = set(versions[-keep_last:]) | {cur} | set(keep_versions) | pins
        floors = floor_versions(root)
        if floors:
            lo = min(floors)
            keep |= {v for v in versions if v >= lo}
        keep = {v for v in keep if v in versions}
        retained_refs: set[str] = set()
        for v in keep:
            retained_refs |= referenced_files(load_manifest(root, v))
        now = pinned_versions(root)
        if now == pins:
            break
        pins = now  # a pin landed mid-compute; recompute with it
    removed_manifests, removed_files = [], []
    committed_jobs: set[str] = set()
    expired_jobs: set[str] = set()
    for v in versions:
        m = json.loads(store.read(_vrel(v)))
        if v not in keep:
            store.delete(_vrel(v))
            removed_manifests.append(v)
            expired_jobs.add(m.get("job_id", ""))
        else:
            committed_jobs.add(m.get("job_id", ""))
    for sub in ("fragments", "dv", "index", "segments"):
        for rel in store.list(sub):
            if rel not in retained_refs and not rel.endswith((".tmp", ".meta.json")):
                store.delete(rel)
                removed_files.append(rel)
    # job markers of expired versions (and of attempts whose version
    # put never landed) — a swept marker is self-healing: its version,
    # if retained, shows up as unmarked and the lookup's restricted
    # scan still finds it
    for rel in store.list("jobs"):
        tail = os.path.basename(rel).rsplit(".v", 1)
        v = int(tail[1]) if len(tail) == 2 and tail[1].isdigit() else None
        if v is None or v not in keep:
            store.delete(rel)
            removed_files.append(rel)
    # staging/lineage GC — the WAL-truncation analogue (reference flushes
    # WAL files whose LSN ≤ the persisted LSN, src/moonlink/src/storage/
    # wal.rs:670-760): a job's staging (shuffle runs, sidecars, resume
    # markers) is resume state, obsolete once its version is committed or
    # expired. Unknown job dirs (possibly in flight) are left alone.
    import shutil as _shutil

    removed_staging = 0
    from moonray.storage import stage_path

    staging = stage_path(root, "staging")
    if os.path.isdir(staging):
        for job_dir in os.listdir(staging):
            if job_dir in committed_jobs or job_dir in expired_jobs:
                _shutil.rmtree(os.path.join(staging, job_dir), ignore_errors=True)
                removed_staging += 1
    lineage = stage_path(root, "lineage")
    if os.path.isdir(lineage):
        for fn in os.listdir(lineage):
            if fn.endswith(".jsonl") and fn[:-6] in expired_jobs:
                os.remove(os.path.join(lineage, fn))
    store.set_pointer(os.path.join("gc", "end"), str(epoch))
    return {
        "kept_versions": sorted(keep),
        "removed_versions": removed_manifests,
        "removed_files": len(removed_files),
        "removed_staging_dirs": removed_staging,
    }
