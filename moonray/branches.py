"""Branch refs — named writable lines of development on one table.

Iceberg models branches as named refs inside a single metadata file;
moonray's version store is linear, so a branch is realized as a
zero-copy shallow CLONE living under ``<root>/branches/<name>`` —
O(metadata) to create (no data bytes move, see clone.py), fully
writable (COW: branch commits write new fragments under the branch
root, the shared history stays ``ext::``-referenced), and pinned on
the parent so the branched-from version survives ``expire_snapshots``.

Publish is a changelog fast-forward: ``publish_branch`` replays the
branch's commits since the fork point into the parent through
``sync_incremental`` (exactly the write-audit-publish recipe of
test_wap.py, given a first-class name). The parent's keyed MERGE
idempotence and ``_seq`` D<I ordering give the replay the same
semantics as committing on the parent directly.

Interaction with the rest of the engine:
- ``vacuum`` sweeps only ``fragments/ dv/ index/ colindex/`` — the
  ``branches/`` subtree is never treated as orphan bytes;
- dropping a branch releases its clone pin on the parent (the same
  path as catalog.drop_table);
- 'main' is reserved: the table itself is the main branch (and the
  Iceberg export already reserves the name for its head ref).

Reference: Iceberg branch/tag refs; moonlink keeps a single mooncake
table line (no branches) — this is a capability extension along the
same snapshot model used for tags (table.tag / sinks/iceberg.py refs).
"""

from __future__ import annotations

import re
import shutil

from moonray import manifest as mf

_NAME_RE = re.compile(r"^[A-Za-z0-9][A-Za-z0-9._-]{0,63}$")


def _check_name(name: str) -> str:
    if name == "main":
        raise ValueError("'main' is reserved: the table itself is the "
                         "main branch")
    if not _NAME_RE.match(name):
        raise ValueError(f"invalid branch name: {name!r}")
    return name


def branch_root(root: str, name: str) -> str:
    # posix-style join keeps scheme:// roots intact
    return root.rstrip("/") + "/branches/" + name


def create_branch(table, name: str, *, version: int | None = None,
                  ref: str | None = None):
    """Fork a writable branch at ``version`` / tag ``ref`` (default:
    current head). Returns the opened branch table."""
    from moonray.clone import clone_table

    return clone_table(table, branch_root(table.root, _check_name(name)),
                       version=version, ref=ref)


def open_branch(table, name: str):
    from moonray.table import MoonrayTable

    broot = branch_root(table.root, _check_name(name))
    try:
        return MoonrayTable.open(broot)
    except FileNotFoundError:
        raise FileNotFoundError(
            f"no branch {name!r} on {table.root}") from None


def list_branches(table) -> list[str]:
    """Branch names = subdirectories of branches/ that hold a committed
    table (a LATEST pointer)."""
    if mf.is_remote_root(table.root):
        from moonray.commitstore import store_for

        st = store_for(table.root)
        names = set()
        for rel in st.list("branches"):
            parts = rel.split("/")
            # branches/<name>/versions/LATEST
            if len(parts) >= 3 and parts[-1] == "LATEST":
                names.add(parts[1])
        return sorted(names)
    import os

    bdir = os.path.join(table.root, "branches")
    if not os.path.isdir(bdir):
        return []
    out = []
    for d in sorted(os.listdir(bdir)):
        try:
            mf.latest_version(os.path.join(bdir, d))
            out.append(d)
        except FileNotFoundError:
            pass
    return out


def _state_key(name: str, br) -> str:
    """Sync-pointer key unique PER BRANCH INCARNATION: the pointer
    lives on the parent and outlives the branch, so a drop + recreate
    under the same name must not resume from the old branch's pointer
    (it would silently skip the new branch's early commits). The v0
    commit timestamp identifies the incarnation."""
    born = br.manifest(0).get("committed_at") or 0.0
    return f"branch-{name}-{int(float(born) * 1e6)}"


def publish_branch(table, name: str, *, drop: bool = False) -> int:
    """Fast-forward the parent to include every branch commit since the
    fork point (changelog replay through the keyed MERGE path; the
    clone-v0 baseline contributes nothing). Idempotent: publishing an
    already-published branch is a no-op. With ``drop=True`` the branch
    is deleted after a successful publish."""
    from moonray.sync import sync_incremental

    br = open_branch(table, name)
    v = sync_incremental(br, table, state_key=_state_key(name, br))
    if drop:
        drop_branch(table, name)
    return v


def drop_branch(table, name: str) -> None:
    """Delete the branch and release its retention pin on the parent
    (same ordering as catalog.drop_table: the pin release is
    best-effort, the files go last)."""
    from moonray.clone import release_clone_at

    broot = branch_root(table.root, _check_name(name))
    try:
        mf.latest_version(broot)
    except FileNotFoundError:
        raise FileNotFoundError(
            f"no branch {name!r} on {table.root}") from None
    try:
        src = mf.load_manifest(broot).get("cloned_from")
        if src:
            release_clone_at(src["root"], broot)
    except Exception:
        pass
    # hygiene: retire this incarnation's sync pointer on the parent
    # (publish keys pointers per incarnation, so a stale one can never
    # be READ again — this just stops them accumulating)
    try:
        from moonray.commitstore import store_for
        from moonray.sync import _pointer_name
        from moonray.table import MoonrayTable

        br = MoonrayTable.open(broot)
        store_for(table.root).delete(
            _pointer_name(_state_key(name, br)))
    except Exception:
        pass
    if mf.is_remote_root(table.root):
        from moonray.commitstore import store_for
        from moonray.storage import scratch_for

        st = store_for(table.root)
        for rel in st.list(f"branches/{name}"):
            st.delete(rel)
        shutil.rmtree(scratch_for(broot), ignore_errors=True)
        return
    shutil.rmtree(broot, ignore_errors=True)
