"""Write-plane routing: which storage a table artifact lands on.

A table root owns two kinds of state, with different storage needs
(reference split: Iceberg snapshots on the object store via the catalog
transaction, src/moonlink/src/storage/table/iceberg/, vs local
temp/WAL paths the TableHandler owns):

- PUBLISHED artifacts — ``fragments/``, ``dv/``, ``index/`` (and the
  ``versions/``/``pins/`` metadata plane already owned by
  commitstore.py). Immutable, content/job-named, manifest-referenced
  objects. These publish through the commit store, so a remote
  (``scheme://``) root is written with object-store semantics: upload
  of a complete object, no rename, no append. Readers fetch them
  through the worker file cache (filecache.data_path).
- SCRATCH / coordination state — ``staging/`` (shuffle run files,
  per-unit resume markers, staged sidecars, streaming-xact spools) and
  ``lineage/``. Mutable, append-y, glob-heavy, and only meaningful
  until the job's version commits (expiry GC truncates them). These
  live on a POSIX *scratch root* every worker can reach:

  * local table root → the table root itself (layout unchanged);
  * remote table root → ``$MOONRAY_SCRATCH/<digest(root)>`` (default
    under the system temp dir). On a multi-node cluster point
    MOONRAY_SCRATCH at shared storage (NFS / FSx / a fuse mount) —
    the same assumption external shuffle services make, and the
    scalability-critical deployment knob called out in shuffle.py.

Everything here is stateless and cheap to call from Ray workers: the
scheme string alone picks the plane.
"""

from __future__ import annotations

import hashlib
import os
import tempfile
import uuid

from moonray.filecache import is_remote


def scratch_for(root: str) -> str:
    """The POSIX scratch root backing a table root's coordination
    state. Identity for local roots; a shared-mount dir keyed by the
    root digest for remote roots."""
    if not is_remote(root):
        return root
    base = os.environ.get("MOONRAY_SCRATCH") or os.path.join(
        tempfile.gettempdir(), "moonray-scratch")
    d = os.path.join(base, hashlib.sha256(root.encode()).hexdigest()[:20])
    os.makedirs(d, exist_ok=True)
    return d


def stage_path(root: str, *parts: str) -> str:
    """Path of a staging/lineage artifact for ``root`` (see module
    docstring for what belongs there)."""
    return os.path.join(scratch_for(root), *parts)


def publish_tmp(root: str, rel: str) -> str:
    """A temp path to WRITE a to-be-published artifact at. Local roots:
    sibling of the final path (same filesystem → atomic rename);
    remote roots: on scratch, uploaded by publish_file."""
    if not is_remote(root):
        path = os.path.join(root, rel)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        return f"{path}.tmp.{uuid.uuid4().hex[:6]}"
    d = stage_path(root, "uploads")
    os.makedirs(d, exist_ok=True)
    return os.path.join(d, f"{uuid.uuid4().hex}.tmp")


def publish_file(root: str, rel: str, tmp: str, *, durable: bool = True) -> None:
    """Publish the complete file at ``tmp`` as the immutable object
    ``rel`` under ``root``. Local: fsync + rename (atomic,
    complete-or-absent — manifest-referenced files must be durable
    BEFORE the manifest fsync, see util.fsync_file). Remote: upload
    via the commit store (a blind PUT — artifact names are
    content/job-derived, so a retried task re-publishes identical
    bytes and last-writer-wins is sound). ``tmp`` is consumed."""
    if not is_remote(root):
        from moonray import chaos
        from moonray.util import fsync_file

        if chaos.config_for(root):
            chaos.with_io_retries(
                lambda: chaos.maybe_fault(root, rel, "write"))
        if durable:
            fsync_file(tmp)
        os.rename(tmp, os.path.join(root, rel))
        return
    from moonray import chaos
    from moonray.commitstore import store_for

    chaos.with_io_retries(lambda: (
        chaos.maybe_fault(root, rel, "write"),
        store_for(root).put(rel, tmp)))
    try:
        os.unlink(tmp)
    except FileNotFoundError:
        pass


def publish_bytes(root: str, rel: str, data: bytes, *, durable: bool = True) -> None:
    tmp = publish_tmp(root, rel)
    with open(tmp, "wb") as f:
        f.write(data)
    publish_file(root, rel, tmp, durable=durable)
