"""Commit-store abstraction: the two primitives a manifest publish
actually needs, with object-store-safe semantics.

The r1 commit path leaned on POSIX rename atomicity twice — fine on a
local FS, silently broken on S3-class object stores (no rename; blind
PUT races between two writers both "creating" the same version). The
reference avoids this by committing through an Iceberg catalog
transaction (src/moonlink/src/storage/table/iceberg/
iceberg_table_syncer.rs:47-52, file_catalog.rs). The equivalent
primitives, abstracted here:

- ``put_if_absent(rel, data)``: atomically create a COMPLETE immutable
  object, failing if it already exists. This is the concurrent-writer
  guard: two racing committers of version N cannot both succeed.
- ``set_pointer(name, value)`` / ``read_pointer(name)``: durably
  publish the LATEST pointer. Monotonic integer values make blind
  last-writer-wins acceptable *after* put_if_absent serialized the
  version id; readers who see a stale pointer see an older committed
  snapshot, never a torn one.

Local implementation: write-to-temp + fsync + ``os.link`` (hard link
creation is atomic AND fails with EEXIST — unlike the exists()+rename
dance, there is no TOCTOU window), pointer via fsync'd rename + dir
fsync.

S3 implementation (documented; boto isn't in this container):

- put_if_absent → ``PutObject`` with ``If-None-Match: *`` (S3
  conditional writes, public API): the PUT fails with 412 if the key
  exists. GCS: ``x-goog-if-generation-match: 0``; ABS:
  ``If-None-Match: *``.
- set_pointer → ``PutObject`` of the pointer key with
  ``If-Match: <etag>`` CAS on the previous pointer generation (retry
  loop keeping the max version), or a catalog/DynamoDB transactional
  swap where available.
- read_pointer → plain GET.

``store_for(root)`` picks the implementation from the root scheme.
"""

from __future__ import annotations

import os
import uuid


class CommitConflict(RuntimeError):
    """Another writer already committed this object."""


class LocalCommitStore:
    """POSIX implementation of the commit primitives."""

    def __init__(self, root: str):
        self.root = root

    def _abs(self, rel: str) -> str:
        return os.path.join(self.root, rel)

    def put_if_absent(self, rel: str, data: bytes) -> None:
        """Atomically create ``rel`` with the full content, raising
        CommitConflict if it exists. Temp + fsync + hard link: the
        object appears complete-or-not-at-all, and link(2) is the
        conditional create (EEXIST), with no exists()/rename race."""
        from moonray import chaos
        from moonray.util import fsync_dir

        # chaos fires BEFORE any side effect: put_if_absent is a
        # conditional create, so only the pre-effect window may be
        # transiently retried (a post-link retry would see its own
        # object and mis-report CommitConflict)
        if chaos.config_for(self.root):
            chaos.with_io_retries(
                lambda: chaos.maybe_fault(self.root, rel, "commit"))
        path = self._abs(rel)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        tmp = f"{path}.tmp.{uuid.uuid4().hex[:8]}"
        with open(tmp, "wb") as f:
            f.write(data)
            f.flush()
            os.fsync(f.fileno())
        try:
            os.link(tmp, path)
        except FileExistsError:
            raise CommitConflict(
                f"{rel} already committed — concurrent writer detected. "
                "moonray tables are single-writer per table (like the "
                "reference's one TableHandler per table); serialize "
                "writers externally or use separate tables.") from None
        finally:
            try:
                os.unlink(tmp)
            except FileNotFoundError:
                pass
        fsync_dir(os.path.dirname(path))

    def set_pointer(self, name: str, value: str) -> None:
        from moonray.util import atomic_write_text, fsync_dir

        path = self._abs(name)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        atomic_write_text(path, value, durable=True)
        fsync_dir(os.path.dirname(path))

    def advance_pointer(self, name: str, value: int) -> None:
        """Monotonic pointer swap: publish ``value`` only if it exceeds
        the current pointer. With concurrent committers a blind
        last-writer-wins set_pointer can REGRESS the pointer (A commits
        v5, B commits v6 and publishes, then A's stale publish lands) —
        readers would see an older committed snapshot until the next
        commit heals it. Local impl: read-modify-write under an flock'd
        sidecar lock (advisory locks serialize co-host writers; the
        manifest object itself was already serialized by
        put_if_absent). S3 mapping: PutObject with ``If-Match: <etag>``
        CAS in a retry loop that keeps the max value (see module
        docstring)."""
        import fcntl

        path = self._abs(name)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path + ".lock", "w") as lock:
            fcntl.flock(lock, fcntl.LOCK_EX)
            try:
                cur = int(self.read_pointer(name))
            except (FileNotFoundError, ValueError):
                cur = -1
            if value > cur:
                self.set_pointer(name, str(value))

    def read_pointer(self, name: str) -> str:
        with open(self._abs(name)) as f:
            return f.read().strip()

    def put(self, rel: str, local_path: str) -> None:
        """Blind PUT of a complete immutable object (S3: plain
        PutObject). For content/job-named artifacts only — races are
        benign because both writers carry identical bytes; version
        files must keep using put_if_absent."""
        from moonray import chaos

        if chaos.config_for(self.root):
            # blind PUTs are idempotent — the whole op may retry
            chaos.with_io_retries(
                lambda: chaos.maybe_fault(self.root, rel, "commit"))
        path = self._abs(rel)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        tmp = f"{path}.tmp.{uuid.uuid4().hex[:8]}"
        import shutil as _shutil

        _shutil.copyfile(local_path, tmp)
        os.replace(tmp, path)

    # -- read/list plane (S3: GetObject / ListObjectsV2) --------------
    def read(self, rel: str) -> bytes:
        with open(self._abs(rel), "rb") as f:
            return f.read()

    def exists(self, rel: str) -> bool:
        return os.path.exists(self._abs(rel))

    def list(self, prefix: str) -> list[str]:
        """Relative paths of every object under ``prefix`` (recursive,
        sorted) — the ListObjectsV2-with-prefix analogue."""
        base = self._abs(prefix)
        out = []
        for dirpath, _dirs, files in os.walk(base):
            for fn in files:
                out.append(os.path.relpath(os.path.join(dirpath, fn), self.root))
        return sorted(out)

    def delete(self, rel: str) -> None:
        try:
            os.remove(self._abs(rel))
        except FileNotFoundError:
            pass


class MockCommitStore(LocalCommitStore):
    """``mock://<local-dir>`` — the remote-metadata test double, pairing
    with filecache's mock fetcher: a table root on an emulated object
    store whose metadata plane (manifests, LATEST pointer, pins) is
    served through the commit-store API and whose data plane goes
    through the worker-local file cache. Operation counts let tests
    assert access patterns (e.g. open+scan = O(1) metadata reads)."""

    op_counts: dict[str, int] = {}

    def __init__(self, root: str):
        super().__init__(root[len("mock://"):])

    def _count(self, op: str) -> None:
        MockCommitStore.op_counts[op] = MockCommitStore.op_counts.get(op, 0) + 1

    def read(self, rel: str) -> bytes:
        self._count("read")
        return super().read(rel)

    def list(self, prefix: str) -> list[str]:
        self._count("list")
        return super().list(prefix)

    def read_pointer(self, name: str) -> str:
        self._count("read_pointer")
        return super().read_pointer(name)

    def put(self, rel: str, local_path: str) -> None:
        self._count("put")
        super().put(rel, local_path)


class S3CommitStore:  # pragma: no cover - no object store in this sandbox
    """Contract for the S3-class implementation (see module docstring).
    Instantiating raises: no boto/object store in this container. The
    method semantics are pinned here so a deployment only fills in the
    HTTP calls, not the protocol."""

    def __init__(self, root: str):
        raise NotImplementedError(
            "S3 commit store: put_if_absent = PutObject + If-None-Match:*, "
            "set_pointer = PutObject + If-Match CAS (keep max version), "
            "read_pointer = GetObject. boto3 is not available in this "
            "container; implement these three calls to deploy on S3.")


def store_for(root: str):
    if root.startswith("mock://"):
        return MockCommitStore(root)
    if root.startswith("s3test://"):
        # the S3 conditional-write protocol over real HTTP (s3http.py)
        # — the tested implementation of the contract S3CommitStore
        # documents; real s3:// only needs SigV4 transport on top
        from moonray.s3http import S3HttpCommitStore

        return S3HttpCommitStore(root)
    if root.startswith(("s3://", "gs://", "abfs://")):
        return S3CommitStore(root)
    return LocalCommitStore(root)
