"""Deterministic hashing + small helpers shared across stages.

Key hashing must be deterministic ACROSS PROCESSES AND SESSIONS (the
index partition assignment ``hash(key) % P`` is persisted on disk), so
Python's builtin ``hash`` is never used. Int keys use a vectorized
splitmix64; string keys use polars' vectorized hash with a fixed seed
(stable within a polars version; the manifest records the impl so a
mismatch is detected at open, mirroring how moonlink persists its index
hash layout — reference: src/moonlink/src/storage/index/persisted_bucket_hash_map.rs).
"""

from __future__ import annotations

import hashlib
import json
import os
import uuid

import numpy as np
import pyarrow as pa

try:  # vectorized string hashing
    # polars sizes its global thread pool to ALL machine cores at first
    # import — N concurrent Ray tasks each spinning a full pool
    # oversubscribes the node N× (same failure mode cap_kernel_threads
    # fixes for Arrow). Must be set BEFORE the import; honored only if
    # the user hasn't chosen their own cap. Kernels inside a Ray task
    # should be near-single-threaded — Ray owns core scheduling.
    os.environ.setdefault("POLARS_MAX_THREADS", "2")
    import polars as pl

    _HAS_POLARS = True
except ImportError:  # pragma: no cover
    _HAS_POLARS = False

# The "+temporal1" suffix records the canonical temporal hash lane
# (date/time/timestamp keys hash via temporal_storage_int → splitmix64
# instead of polars' string/physical lane). Tables persisted under an
# older HASH_IMPL would probe indexes with a different hash — the
# manifest guard (manifest.load_manifest) rejects them loudly rather
# than misrouting lookups or silently dropping bloom-pruned fragments.
HASH_IMPL = ("splitmix64+polars0+temporal1" if _HAS_POLARS
             else "splitmix64+blake2b8+temporal1")


def splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 over a uint64 array (public-domain constants).

    Written with two allocations + in-place ops instead of the naive
    eight-temporary chain: on multi-MiB arrays every temporary is a full
    DRAM round-trip (this box's shared bus makes that 3×, measured
    1.35 s → 0.42 s on a 128 MiB matrix), and this kernel sits under
    every shuffle hash, dedup content hash and minhash permutation.
    Output is bit-identical to the original chain — persisted key-index
    partitions and shuffle plans depend on it."""
    z = x.astype(np.uint64, copy=True) if x.dtype != np.uint64 else x.copy()
    z += np.uint64(0x9E3779B97F4A7C15)
    t = z >> np.uint64(30)
    t ^= z
    t *= np.uint64(0xBF58476D1CE4E5B9)
    np.right_shift(t, np.uint64(27), out=z)
    z ^= t
    z *= np.uint64(0x94D049BB133111EB)
    np.right_shift(z, np.uint64(31), out=t)
    t ^= z
    return t


def hash_key_array(arr, seed: int = 0) -> np.ndarray:
    """uint64 hash of a key column (pa.Array / pa.ChunkedArray / np /
    list). ``seed`` selects an independent hash lane (seed=0 is the
    historical default and must stay byte-stable: persisted key-index
    partitions and shuffle plans are keyed by it)."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if isinstance(arr, pa.Array):
        if arr.null_count == 0 and (
                pa.types.is_date(arr.type) or pa.types.is_time(arr.type)
                or pa.types.is_timestamp(arr.type)):
            # temporal → CANONICAL integer view (days / µs — see
            # types.temporal_storage_int; also dodges Arrow's missing
            # date32→int64 / time32→int64 casts), then the splitmix64
            # lane: byte-stable forever (polars' temporal hash is an
            # implementation detail of its version). Null-bearing
            # temporal columns fall through to the generic lane.
            import pyarrow.compute as _pc

            from moonray.types import temporal_storage_int

            arr = _pc.cast(temporal_storage_int(arr, arr.type),
                           pa.int64())
        if pa.types.is_integer(arr.type):
            vals = arr.to_numpy(zero_copy_only=False).astype(np.uint64)
            h = splitmix64(vals)
            return h if not seed else splitmix64(h ^ np.uint64(seed))
        if _HAS_POLARS:
            return (pl.from_arrow(arr).hash(seed=seed)
                    .to_numpy().astype(np.uint64))
        # blake2b zero-pads salt, so seed=0 matches the unsalted default
        salt = int(seed).to_bytes(8, "little")
        return np.array(
            [int.from_bytes(hashlib.blake2b(s.encode(), digest_size=8,
                                            salt=salt).digest(), "little")
             for s in arr.to_pylist()],
            dtype=np.uint64,
        )
    arr_np = np.asarray(arr)
    if np.issubdtype(arr_np.dtype, np.integer):
        h = splitmix64(arr_np.astype(np.uint64))
        return h if not seed else splitmix64(h ^ np.uint64(seed))
    return hash_key_array(pa.array(arr_np), seed=seed)


def canonical_tokens(texts):
    """THE module-wide tokenization (lower-then-extract `[a-z0-9]+`):
    every token stream — dedup shingles, text index postings, hashing
    embedder, the text-stats oracles — must come from this one
    expression, or their SQL oracles and each other silently diverge
    on case-fold edges. Accepts a pa.Array/ChunkedArray, pl.Series or
    list of str; returns a polars list[str] Series."""
    import polars as pl

    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    if isinstance(texts, pa.Array):
        s = pl.from_arrow(texts)
    elif isinstance(texts, pl.Series):
        s = texts
    else:
        s = pl.Series(texts, dtype=pl.String)
    return s.str.to_lowercase().str.extract_all("[a-z0-9]+")


def list_to_matrix(col, dtype=np.float64) -> np.ndarray:
    """Fixed-length list<float> column → (n, d) matrix, zero-copy from
    the Arrow values buffer where possible (the pandas detour
    ``np.stack(col.to_pandas())`` materializes n Python objects + n
    small arrays per batch)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    vals = col.flatten().to_numpy(zero_copy_only=False)
    if n == 0:
        return np.empty((0, 0), dtype=dtype)
    if not pa.types.is_fixed_size_list(col.type):
        lens = np.diff(col.offsets.to_numpy(zero_copy_only=False))
        if not (lens == lens[0]).all():
            raise ValueError("ragged embedding column: lists have unequal lengths")
    return np.ascontiguousarray(vals.reshape(n, len(vals) // n), dtype=dtype)


def stable_hash_str(s: str) -> int:
    """Deterministic 64-bit hash of one string (seed derivation, frag bucketing)."""
    return int.from_bytes(hashlib.blake2b(s.encode(), digest_size=8).digest(), "little")


def new_job_id() -> str:
    return uuid.uuid4().hex[:12]


def scratch_root(prefix: str) -> str:
    """Throwaway table root for pipeline/demo tables: tmpfs when
    available (scratch tables shouldn't pay disk fsync), with
    best-effort GC of stale siblings so repeated runs don't accumulate."""
    import glob as _glob
    import shutil
    import tempfile
    import time

    base = "/dev/shm" if os.path.isdir("/dev/shm") else None
    parent = base or tempfile.gettempdir()
    cutoff = time.time() - 2 * 3600
    for d in _glob.glob(os.path.join(parent, f"{prefix}*")):
        try:
            if os.path.getmtime(d) < cutoff:
                shutil.rmtree(d, ignore_errors=True)
        except OSError:
            pass
    return tempfile.mkdtemp(prefix=prefix, dir=base)


def default_buckets(per_cpu: int = 4, lo: int = 16, hi: int = 4096) -> int:
    """Shuffle fan-out sized to the cluster (~per_cpu reduce groups per
    CPU for scheduling slack), clamped: hardcoded constants (the old 32)
    cap parallelism on a big cluster and over-shard a laptop."""
    import ray

    cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    return int(min(hi, max(lo, per_cpu * cpus)))


def content_id(batch: pa.Table, *cols: str) -> str:
    """Deterministic 16-hex id from the given columns' FULL values —
    stable across Ray task retries, so side-effect files (fragments,
    shuffle runs) written under content-derived names are idempotent: a
    retried task overwrites the same path instead of duplicating rows.
    Hashes the complete Arrow buffers (via IPC serialization of the id
    columns, chunk-normalized), not endpoint probes: probe collisions
    would silently overwrite one run/fragment with another — a
    silent-data-loss class guarding every exactly-once path. The id
    columns are narrow (keys + lsn), so the cost is negligible next to
    the parquet write the name stamps."""
    h = hashlib.blake2b(digest_size=8)
    h.update(len(batch).to_bytes(8, "little"))
    present = [c for c in cols if c in batch.column_names]
    if present and len(batch):
        t = batch.select(present).combine_chunks()
        sink = pa.BufferOutputStream()
        with pa.ipc.new_stream(sink, t.schema) as w:
            w.write_table(t)
        h.update(sink.getvalue())
    return h.hexdigest()


# Data-file durability: every file a MANIFEST can reference (fragment
# parquet, DV delta, index parquet) is fsynced before its rename, and the
# versions/ dir is fsynced after the manifest publish — so a durable
# manifest never points at data that hasn't reached disk (power-loss
# safety for committed versions). Intra-job state (shuffle runs, resume
# markers, lineage) stays process-crash-scoped: after power loss an
# in-flight job must restart from scratch, which loses no committed data.
# MOONRAY_FSYNC_DATA=0 opts out (e.g. throwaway benchmarks on tmpfs).
_FSYNC_DATA = os.environ.get("MOONRAY_FSYNC_DATA", "1").lower() not in ("0", "false")


def fsync_file(path: str) -> None:
    """fsync an already-written file by path (no-op if opted out)."""
    if not _FSYNC_DATA:
        return
    fd = os.open(path, os.O_RDONLY)
    try:
        os.fsync(fd)
    finally:
        os.close(fd)


def fsync_dir(path: str) -> None:
    """fsync a directory so renames within it are durable."""
    if not _FSYNC_DATA:
        return
    fd = os.open(path, os.O_RDONLY)
    try:
        os.fsync(fd)
    finally:
        os.close(fd)


_KERNEL_THREADS_CAPPED = False


def cap_kernel_threads(n: int = 2) -> None:
    """Cap Arrow's internal thread pool inside a Ray worker process.

    Arrow sizes its pool to ALL machine cores; N concurrent map_batches
    tasks each spawning a full pool oversubscribes the node ~N× (measured
    13.4 s vs 1.1 s per compaction group). Ray already owns core
    scheduling — kernels inside a task should be (near) single-threaded."""
    global _KERNEL_THREADS_CAPPED
    if _KERNEL_THREADS_CAPPED:
        return
    pa.set_cpu_count(n)
    pa.set_io_thread_count(max(2, n))
    _KERNEL_THREADS_CAPPED = True


def as_fn(obj, name: str | None = None):
    """Wrap a callable config object as a named plain function so Ray Data
    treats it as a stateless task UDF (map_groups requires __name__; a
    class instance would otherwise demand an actor pool)."""
    def fn(batch):
        cap_kernel_threads()
        return obj(batch)

    fn.__name__ = name or type(obj).__name__
    return fn


def atomic_write_json(path: str, obj, durable: bool = False) -> None:
    """Write JSON via temp file + rename (atomic publish on POSIX).

    ``durable=True`` (fsync) is reserved for the manifest publish — the
    one correctness-critical ordering point. Staging sidecars / markers /
    DV deltas are manifest-gated: a crash before commit loses nothing
    durable, and per-file fsyncs serialize the whole node's IO when a
    hundred tasks write concurrently."""
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = f"{path}.tmp.{uuid.uuid4().hex[:8]}"
    with open(tmp, "w") as f:
        json.dump(obj, f, indent=1, sort_keys=True)
        if durable:
            f.flush()
            os.fsync(f.fileno())
    os.rename(tmp, path)


def atomic_write_text(path: str, text: str, durable: bool = False) -> None:
    tmp = f"{path}.tmp.{uuid.uuid4().hex[:8]}"
    with open(tmp, "w") as f:
        f.write(text)
        if durable:
            f.flush()
            os.fsync(f.fileno())
    os.rename(tmp, path)


def read_json(path: str):
    with open(path) as f:
        return json.load(f)
