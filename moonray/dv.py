"""Deletion vectors: per-fragment sorted uint32 row-offset arrays.

Mirrors the reference's two DV representations — in-memory
``BatchDeletionVector`` (dense bitmap with ``delete_row``/``merge_with``/
``apply_to_batch``; reference:
src/moonlink/src/storage/mooncake_table/delete_vector.rs:9-105) and the
persisted Iceberg-v3 roaring puffin blob (reference:
src/moonlink/src/storage/table/iceberg/deletion_vector.rs:80-145).
Without pyroaring in this container we persist the sorted offset array
itself (``.npy``): equally compact for realistic delete fractions and
zero-copy mmap-able. DV files are immutable and version-suffixed; merge
is a set union; apply is a vectorized Arrow filter.
"""

from __future__ import annotations

import io
import os

import numpy as np
import pyarrow as pa


def empty_dv() -> np.ndarray:
    return np.empty(0, dtype=np.uint32)


def merge_dv(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Union of two deletion vectors (≈ RoaringTreemap |=)."""
    return np.union1d(a.astype(np.uint32), b.astype(np.uint32))


def save_dv(root: str, rel: str, dv: np.ndarray) -> None:
    # manifest-referenced → must hit disk BEFORE the manifest fsync, or
    # a power loss could leave a durable manifest pointing at a DV whose
    # deleted rows resurface (util.fsync_file rationale); remote roots
    # publish the complete object through the commit store
    from moonray.storage import publish_file, publish_tmp

    tmp = publish_tmp(root, rel)
    with open(tmp, "wb") as f:
        np.save(f, np.asarray(dv, dtype=np.uint32))
        f.flush()
    publish_file(root, rel, tmp)


def load_dv(path: str) -> np.ndarray:
    with open(path, "rb") as f:
        return np.load(io.BytesIO(f.read()))


def dv_paths_of(frag_meta: dict) -> list[str]:
    """A fragment's DV as a list of delta files. Each MERGE round appends
    per-key-partition deltas (guaranteed disjoint: a (frag, off) row has
    one key, one key hashes to one partition; the reducer subtracts
    offsets already present in older deltas). Compaction folds the list
    back to empty. Accepts legacy None / single-path values."""
    d = frag_meta.get("dv")
    if not d:
        return []
    return [d] if isinstance(d, str) else list(d)


def load_dv_union(root: str, rel_paths: list[str]) -> np.ndarray:
    """Union of DV delta files. Merge writes disjoint deltas, but
    callers downstream (lookup's ``setdiff1d(assume_unique=True)``,
    ``apply_dv_mask``) must not silently corrupt if a future path ever
    violates that invariant — so dedup here (np.unique = sort + dedup,
    same cost class as the old sort). Remote roots read through the
    worker-local file cache."""
    from moonray.filecache import data_path

    if not rel_paths:
        return empty_dv()
    parts = [load_dv(data_path(root, p)) for p in rel_paths]
    out = np.concatenate(parts) if len(parts) > 1 else parts[0]
    return np.unique(out.astype(np.uint32))


def apply_dv_mask(row_offsets: np.ndarray, dv: np.ndarray) -> np.ndarray:
    """Boolean keep-mask for rows given their in-fragment offsets
    (vectorized ``np.isin``; equivalent to the reference's negated-bitmap
    ``filter_record_batch`` at delete_vector.rs:84-105)."""
    if len(dv) == 0:
        return np.ones(len(row_offsets), dtype=bool)
    return ~np.isin(row_offsets, dv, assume_unique=False)


def filter_batch(batch: pa.Table, rowoff_col: str, dv: np.ndarray) -> pa.Table:
    if len(dv) == 0:
        return batch
    offs = batch[rowoff_col].to_numpy(zero_copy_only=False)
    mask = apply_dv_mask(offs, dv)
    if mask.all():
        return batch
    return batch.filter(pa.array(mask))
