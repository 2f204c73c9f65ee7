"""Worker-local cache for remote immutable data files — the analogue of
the reference's ObjectStorageCache (src/moonlink/src/storage/cache/
object_storage/object_storage_cache.rs:23-51): on a cluster reading
S3-class storage, fragment/index/DV files download once per worker and
repeat reads hit local disk. Every data file moonray writes is
IMMUTABLE and content-/job-addressed, so the cache needs no
invalidation — a name either exists with the right bytes or not at all.

``data_path(root, rel)`` is the accessor every read path goes through:

- local root → plain join, zero overhead (the OS page cache is the
  cache; this is the only mode exercised in this sandbox);
- remote root (``scheme://…``) → fetch-once into the worker-local LRU
  cache directory, evicting least-recently-USED files past the byte
  capacity (reference evicts by refcount+LRU; batch tasks hold no
  long-lived pins, so pure LRU suffices).

Fetchers are registered per scheme. ``mock://<local-dir>`` ships as the
test double (copies + counts fetches); an S3 fetcher is one GetObject
call behind the same interface.
"""

from __future__ import annotations

import hashlib
import os
import shutil
import threading
import time

_DEFAULT_CAPACITY = int(os.environ.get("MOONRAY_CACHE_BYTES", 2 << 30))


def is_remote(root: str) -> bool:
    return "://" in root


class FileCache:
    def __init__(self, cache_dir: str | None = None,
                 capacity_bytes: int = _DEFAULT_CAPACITY):
        self.dir = cache_dir or os.path.join(
            os.environ.get("TMPDIR", "/tmp"), f"moonray-cache-{os.getuid()}")
        os.makedirs(self.dir, exist_ok=True)
        self.capacity = capacity_bytes
        self._lock = threading.Lock()
        self.hits = 0
        self.misses = 0

    def _key(self, root: str, rel: str) -> str:
        h = hashlib.blake2b(f"{root}\x00{rel}".encode(),
                            digest_size=10).hexdigest()
        return f"{h}-{os.path.basename(rel)}"

    def get(self, root: str, rel: str, fetch) -> str:
        """Local path for a remote file; ``fetch(root, rel, dst)`` runs
        on miss (into a temp path, atomically renamed — concurrent
        fetchers of the same file race benignly to identical bytes)."""
        path = os.path.join(self.dir, self._key(root, rel))
        if os.path.exists(path):
            with self._lock:
                self.hits += 1
            os.utime(path)  # LRU touch
            return path
        tmp = f"{path}.tmp.{os.getpid()}.{threading.get_ident()}"
        from moonray import chaos

        def _fetch_once():
            # throw away any torn copy from a previous attempt —
            # partial fetches must never survive into the cache
            try:
                os.unlink(tmp)
            except FileNotFoundError:
                pass
            fetch(root, rel, tmp)
            chaos.maybe_partial_fetch(root, rel, tmp)

        chaos.with_io_retries(_fetch_once)
        os.rename(tmp, path)
        with self._lock:
            self.misses += 1
        self._evict()
        return path

    def _evict(self) -> None:
        entries = []
        total = 0
        for fn in os.listdir(self.dir):
            p = os.path.join(self.dir, fn)
            try:
                st = os.stat(p)
            except FileNotFoundError:
                continue
            entries.append((st.st_mtime, st.st_size, p))
            total += st.st_size
        if total <= self.capacity:
            return
        for _mtime, size, p in sorted(entries):
            if total <= self.capacity:
                break
            try:
                os.remove(p)
                total -= size
            except FileNotFoundError:
                pass


# ---------------------------------------------------------------- scheme registry

_FETCH_COUNTS: dict[str, int] = {}


def _mock_fetch(root: str, rel: str, dst: str) -> None:
    """Test double: 'mock:///abs/dir' serves files from a local dir and
    counts fetches, standing in for GetObject."""
    src_dir = root[len("mock://"):]
    _FETCH_COUNTS[rel] = _FETCH_COUNTS.get(rel, 0) + 1
    shutil.copyfile(os.path.join(src_dir, rel), dst)


def _s3_fetch(root: str, rel: str, dst: str) -> None:  # pragma: no cover
    raise NotImplementedError(
        "S3 fetch: GetObject(bucket, prefix + rel) → dst. boto3 is not in "
        "this container; register a fetcher with register_fetcher('s3', fn) "
        "to deploy.")


def _s3test_fetch(root: str, rel: str, dst: str) -> None:
    from moonray.s3http import s3test_fetch

    s3test_fetch(root, rel, dst)


_FETCHERS = {"mock": _mock_fetch, "s3": _s3_fetch,
             "s3test": _s3test_fetch}


def register_fetcher(scheme: str, fn) -> None:
    _FETCHERS[scheme] = fn


_CACHE: FileCache | None = None
_CACHE_LOCK = threading.Lock()


def process_cache() -> FileCache:
    global _CACHE
    if _CACHE is None:
        with _CACHE_LOCK:
            if _CACHE is None:
                _CACHE = FileCache()
    return _CACHE


EXT_PREFIX = "ext::"


def ext_ref(src_root: str, rel: str) -> str:
    """Externally-rooted file reference: ``ext::<root>::<rel>``. Written
    by shallow clones (moonray.clone) into fragment/DV/index entries so
    a clone's manifest can reference its source table's data files
    without copying bytes. Already-external refs pass through unchanged
    (a clone of a clone keeps pointing at wherever the bytes live)."""
    if rel.startswith(EXT_PREFIX):
        return rel
    if "::" in src_root:
        raise ValueError(f"table root may not contain '::': {src_root!r}")
    return f"{EXT_PREFIX}{src_root}::{rel}"


def split_ext_ref(rel: str) -> tuple[str, str] | None:
    """(embedded root, sub-rel) for an ``ext::`` ref, else None — the
    ONE decoder for the clone-ref format (data_path and fsck both
    resolve through it)."""
    if not rel.startswith(EXT_PREFIX):
        return None
    src_root, sub = rel[len(EXT_PREFIX):].split("::", 1)
    return src_root, sub


def data_path(root: str, rel: str) -> str:
    """THE read accessor: local path for ``rel`` under ``root``,
    transparently caching remote files per worker. ``ext::<root>::<rel>``
    refs (shallow clones) resolve against their embedded root instead —
    recursion keeps remote-root caching intact for cloned files."""
    ext = split_ext_ref(rel)
    if ext is not None:
        return data_path(*ext)
    if not is_remote(root):
        from moonray import chaos

        if chaos.config_for(root):
            # chaos-enabled root: the resolve itself runs under the
            # retry absorber (accessor-level transient faults)
            chaos.with_io_retries(
                lambda: chaos.maybe_fault(root, rel, "read"))
        return os.path.join(root, rel)
    scheme = root.split("://", 1)[0]
    fetch = _FETCHERS.get(scheme)
    if fetch is None:
        raise ValueError(f"no fetcher registered for scheme {scheme!r}")
    return process_cache().get(root, rel, fetch)
