"""Maintenance passes: bin-packing compaction, index merge, Z-order
clustering, manifest rewrite. The heart of the reference (SURVEY.md §2.8).

Compaction mirrors the reference's trigger + executor: select fragments
below final size or ≥50% deleted, bounded group sizes, stream-read each
source, apply the DV, append into ~final-size outputs, then rewrite the
covering key-index entries (reference: trigger
src/moonlink/src/storage/mooncake_table/snapshot_maintenance.rs:42-199,
config src/moonlink/src/storage/compaction/compaction_config.rs:47-54,
executor src/moonlink/src/storage/compaction/compactor.rs:82-466).
Instead of the reference's old→new RecordLocation remap, each compaction
task emits *fresh* index entries for surviving rows; stale entries die
at probe time (live-fragment filter) and physically at index merge.

All passes plan on the driver over manifest *metadata* (tiny) and
execute as Ray tasks over disjoint fragment groups — safe to run wide in
parallel, unlike the reference's ≤1-maintenance-op-in-flight limit which
exists only because of its single-process shared state.
"""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq

from moonray import manifest as mf
from moonray.checkpoint import LineageLog
from moonray.dv import dv_paths_of, filter_batch, load_dv_union
from moonray.fragments import ROWOFF, normalize_to_schema, rg_rows_of, write_fragment
from moonray.storage import stage_path
from moonray.keyindex import MergeIndexPartition, build_index_from_runs
from moonray.util import as_fn, atomic_write_json, new_job_id, read_json
from moonray.zorder import ZKEY, AddZKey

DEFAULT_TARGET_BYTES = 128 * 1024 * 1024  # reference flush target: 128 MiB
DEFAULT_DV_FRAC = 0.5                     # reference: ≥50% rows deleted
DEFAULT_MAX_GROUP = 32                    # reference: ≤32 files per round
# auto-maintenance triggers (reference: data compaction fires at ≥16
# files below final size or ≥50% deleted rows, compaction_config.rs:47-54
# via snapshot_maintenance.rs:42-199; index merge fires at ≥16 small
# index files, index_merge_config.rs:50-88)
TRIGGER_MIN_SMALL_FRAGS = 16
TRIGGER_MIN_INDEX_FILES = 16


def maintenance_due(m: dict, *, small_bytes: int | None = None,
                    dv_frac: float = DEFAULT_DV_FRAC,
                    cluster_tail_frags: int | None = None) -> dict:
    """Evaluate the reference's background-maintenance triggers against
    a manifest (pure metadata — no data touched). Returns which passes
    are due plus the pressure counters that justified them.

    ``cluster_tail_frags`` (opt-in): also fire an INCREMENTAL cluster
    pass when at least that many fragments sit outside the Z-sorted set
    (fragments born from merges/compaction since the last cluster pass)
    — the LSM-style sort-the-tail policy layered on the reference's
    compaction triggers. None (default) disables the trigger."""
    small_bytes = small_bytes if small_bytes is not None else DEFAULT_TARGET_BYTES // 2
    frags = m["fragments"]
    small = sum(1 for f in frags if f["bytes"] < small_bytes)
    dv_heavy = sum(1 for f in frags
                   if f["dv_count"] / max(1, f["rows"]) >= dv_frac)
    n_parts = max(1, len(m["index"]["partitions"]))
    index_files = sum(len(v) for v in m["index"]["partitions"].values())
    tail = sum(1 for f in frags if not f["id"].startswith("z-"))
    return {
        "compact": small >= TRIGGER_MIN_SMALL_FRAGS or dv_heavy > 0,
        "index_merge": (index_files >= TRIGGER_MIN_INDEX_FILES
                        and index_files > n_parts),
        "cluster": (cluster_tail_frags is not None
                    and bool(m.get("zone_cols"))
                    and tail >= cluster_tail_frags),
        "small_fragments": small,
        "dv_heavy_fragments": dv_heavy,
        "index_files": index_files,
        "unclustered_fragments": tail,
    }


def plan_compaction(fragments: list[dict], *, target_bytes: int,
                    small_bytes: int, dv_frac: float,
                    min_group: int, max_group: int, force_full: bool) -> list[dict]:
    """Driver-side bin-packing over manifest metadata. Returns groups of
    fragment metas; each group rewrites into ~target_bytes outputs."""
    def live_bytes(f):
        frac_live = 1.0 - (f["dv_count"] / max(1, f["rows"]))
        return int(f["bytes"] * frac_live)

    if force_full:
        cands = list(fragments)
    else:
        cands = [f for f in fragments
                 if f["bytes"] < small_bytes
                 or f["dv_count"] / max(1, f["rows"]) >= dv_frac]
    cands.sort(key=lambda f: f["id"])
    groups, cur, cur_bytes = [], [], 0
    for f in cands:
        if cur and (cur_bytes + live_bytes(f) > target_bytes or len(cur) >= max_group):
            groups.append(cur)
            cur, cur_bytes = [], 0
        cur.append(f)
        cur_bytes += live_bytes(f)
    if cur:
        groups.append(cur)
    out = []
    for g in groups:
        has_dv = any(x["dv_count"] > 0 for x in g)
        if len(g) >= min_group or has_dv or force_full:
            out.append({"frags": g})
    return out


class CompactGroup:
    """One task per fragment group: read members (streamed per fragment),
    fold in the DV, rewrite as ZSTD fragments (reference compacted-file
    compression: src/moonlink/src/storage/parquet_utils.rs:16-19), emit
    fresh index entries. Idempotent per (job, gid): a done-marker +
    staged entries parquet short-circuit the rerun — this is the
    fragment-granular resume the north rule requires."""

    def __init__(self, root: str, job_id: str, key_col: str | None, zone_cols,
                 rows_per_fragment: int, schema_ipc: str | None = None,
                 defaults: dict | None = None, key_cols: list[str] | None = None,
                 index_partitions: int = 0):
        self.root = root
        self.job_id = job_id
        self.key_col = key_col
        self.zone_cols = list(zone_cols)
        # compacted outputs are 4× the flush granularity, mirroring the
        # reference's 512 MiB compacted files vs 128 MiB flush files
        # (compaction_config.rs:52 vs mooncake_table_config.rs:24) —
        # otherwise small-file compaction of an rpf-sized table would
        # re-emit the same file count it set out to reduce
        self.rpf = 4 * rows_per_fragment
        self.schema_ipc = schema_ipc
        self.defaults = defaults or {}
        self.key_cols = key_cols or ([key_col] if key_col else [])
        self.index_partitions = index_partitions

    def _marker(self, gid: int) -> str:
        return stage_path(self.root, "staging", self.job_id,
                          f"compact-g{gid}.done.json")

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_rows = []
        for row in batch.to_pylist():
            gid = int(row["gid"])
            spec = json.loads(row["spec"])
            marker = self._marker(gid)
            if os.path.exists(marker):
                out_rows.append(int(read_json(marker)["rows"]))
                continue
            schema = (pa.ipc.read_schema(pa.py_buffer(bytes.fromhex(self.schema_ipc)))
                      if self.schema_ipc else None)
            from moonray.filecache import data_path

            pieces = []
            for f in spec["frags"]:
                t = pq.read_table(data_path(self.root, f["path"]),
                                  memory_map=True, pre_buffer=False)
                dvp = dv_paths_of(f)
                if dvp:
                    t = filter_batch(t, ROWOFF, load_dv_union(self.root, dvp))
                t = t.drop_columns([ROWOFF])
                if schema is not None:
                    # project onto the CURRENT schema: compaction folds
                    # ALTER-added/-dropped columns into the rewrite
                    t = normalize_to_schema(t, schema, self.defaults)
                pieces.append(t)
            data = pa.concat_tables(pieces) if pieces else None
            user_cols = list(data.column_names) if data is not None else None
            if data is not None and len(data) and self.key_col is not None:
                from moonray.identity import CKEY, append_ckey

                if self.key_col == CKEY:
                    data = append_ckey(data, self.key_cols)
            group_entries = []
            if data is not None and len(data):
                for i, start in enumerate(range(0, len(data), self.rpf)):
                    chunk = data.slice(start, self.rpf)
                    _meta, entries = write_fragment(
                        self.root, self.job_id, chunk,
                        key_col=self.key_col, zone_cols=self.zone_cols,
                        frag_id=f"c-{self.job_id}-g{gid}-{i:04d}",
                        compression="zstd", data_cols=user_cols,
                        row_group_rows=rg_rows_of(self.rpf // 4),
                    )
                    if entries is not None:
                        group_entries.append(entries)
            n_entries = 0
            if group_entries and self.key_col is not None and self.index_partitions:
                from moonray.keyindex import stage_entry_runs

                merged = pa.concat_tables(group_entries)
                stage_entry_runs(self.root, self.job_id, merged,
                                 self.key_col, self.index_partitions)
                n_entries = len(merged)
            atomic_write_json(marker, {"gid": gid, "rows": n_entries})
            out_rows.append(n_entries)
        return pa.table({"rows": pa.array(out_rows, pa.int64())})


def _auto_group_bytes(total_bytes: int) -> int:
    """Compaction-group input size targeting ≥4 groups per CPU so the
    rewrite saturates the cluster; clamped to [16 MiB, 128 MiB]. Output
    FILE size is governed by rows_per_fragment, not by group size."""
    import ray

    cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    return int(min(DEFAULT_TARGET_BYTES,
                   max(16 * 1024 * 1024, total_bytes // (4 * cpus))))


def compact(table, *, target_bytes: int | None = None,
            small_bytes: int | None = None, dv_frac: float = DEFAULT_DV_FRAC,
            min_group: int = 2, max_group: int = DEFAULT_MAX_GROUP,
            force_full: bool = False, job_id: str | None = None) -> int:
    """Bin-packing small-file / DV-heavy compaction → new version."""
    import ray.data as rd

    job_id = job_id or new_job_id()
    prev = mf.find_version_by_job(table.root, job_id)
    if prev is not None:
        return prev
    m = table.manifest()
    log = LineageLog(table.root, job_id)
    if target_bytes is None:
        target_bytes = _auto_group_bytes(sum(f["bytes"] for f in m["fragments"]))
    plan = plan_compaction(
        m["fragments"], target_bytes=target_bytes,
        # candidate selection ("file below final size") keys off the
        # reference's file-size target, NOT the parallelism-driven group
        # size (src/.../compaction_config.rs:47-54)
        small_bytes=small_bytes if small_bytes is not None else DEFAULT_TARGET_BYTES // 2,
        dv_frac=dv_frac, min_group=min_group, max_group=max_group,
        force_full=force_full,
    )
    if not plan:
        return m["version"]
    from moonray.identity import key_cols_of

    log.stage_start("compact")
    items = [{"gid": i, "spec": json.dumps(g)} for i, g in enumerate(plan)]
    # raw tasks (no Dataset launch): each group rewrites its fragments
    # and stages its index entries pre-partitioned; the index build is
    # then one tiny raw task per partition (keyindex.build_index_from_runs)
    from moonray.shuffle import run_items_tasks

    run_items_tasks(items, CompactGroup(
        table.root, job_id, m["key_col"], m["zone_cols"],
        m["rows_per_fragment"], m["schema_ipc"], m.get("column_defaults", {}),
        key_cols=key_cols_of(m),
        index_partitions=m["index"]["num_partitions"]))
    if m["key_col"] is None:  # identity='none': no key index
        deltas: dict[str, list[str]] = {}
    else:
        deltas = build_index_from_runs(table.root, job_id, m["key_col"])
    new_frags = [read_json(p) for p in _staged_meta_paths(table.root, job_id)]
    replaced = {f["id"] for g in plan for f in g["frags"]}
    log.stage_done("compact", {"counters": {
        "groups": len(plan), "replaced": len(replaced),
        "new_fragments": len(new_frags)}})
    return table._commit_append(m, new_frags, deltas, m["commit_lsn"], job_id,
                                replaced_frag_ids=replaced, op="maintenance")


def _staged_meta_paths(root: str, job_id: str) -> list[str]:
    import glob
    return sorted(glob.glob(os.path.join(
        stage_path(root, "staging", job_id, "meta"), "*.json")))


def merge_index(table, *, job_id: str | None = None, tasks_per_batch: int = 4) -> int:
    """Fold every index partition's delta files into one sorted file and
    drop dead entries (reference index-merge:
    snapshot_maintenance.rs:227-309, build_from_merge at
    persisted_bucket_hash_map.rs:1458)."""
    import ray.data as rd

    job_id = job_id or new_job_id()
    prev = mf.find_version_by_job(table.root, job_id)
    if prev is not None:
        return prev
    m = table.manifest()
    parts = list(m["index"]["partitions"].keys())
    if not parts:
        return m["version"]
    log = LineageLog(table.root, job_id)
    log.stage_start("index_merge")
    live = {f["id"] for f in m["fragments"]}
    dv_paths = {f["id"]: dv_paths_of(f) for f in m["fragments"] if dv_paths_of(f)}
    summary = rd.from_items([{"part": int(p)} for p in parts],
                            override_num_blocks=len(parts)).map_batches(
        as_fn(MergeIndexPartition(table.root, job_id, m["key_col"],
                                  m["index"]["partitions"], live, dv_paths)),
        batch_format="pyarrow", batch_size=tasks_per_batch,
    )
    new_partitions: dict[str, list[str]] = {}
    for row in summary.take_all():
        if row["path"]:
            new_partitions[str(row["part"])] = [row["path"]]
    log.stage_done("index_merge", {"counters": {"partitions": len(new_partitions)}})
    return table._commit_append(m, [], new_partitions, m["commit_lsn"], job_id,
                                replace_index=True, op="maintenance")



_MAX_BOUNDARY_SAMPLE = 16384


class ClusterWriteGroup:
    """Reduce task for one Z-key range partition: read its shuffle runs,
    sort by the salted Z-key, chunk into fragments, write them (ZSTD)
    and stage the fresh index entries pre-partitioned
    (keyindex.stage_entry_runs — the caller folds them with one raw task
    per index partition instead of chaining a Ray Data entry shuffle
    behind the reduce). Idempotent per (job, bucket): a done-marker
    short-circuits reruns (entry runs + fragments are already staged) —
    the fragment-granular resume the north rule requires."""

    def __init__(self, root: str, job_id: str, key_col: str | None, zone_cols,
                 rows_per_fragment: int, data_cols: list[str] | None = None,
                 index_partitions: int = 0):
        self.root = root
        self.job_id = job_id
        self.key_col = key_col
        self.zone_cols = list(zone_cols)
        self.rpf = rows_per_fragment
        self.data_cols = data_cols
        self.index_partitions = index_partitions

    def _check_fault_injection(self, stage_dir: str) -> None:
        """Same deterministic kill-switch as MergeApply (see merge.py):
        a FAIL_INJECT file with n aborts every task once ≥ n buckets
        completed — for fragment-granular resume tests."""
        import glob as _glob

        flag = os.path.join(stage_dir, "FAIL_INJECT")
        if os.path.exists(flag):
            n = int(open(flag).read().strip() or 0)
            done = len(_glob.glob(os.path.join(stage_dir, "cluster-p*.done.json")))
            if done >= n:
                raise RuntimeError(
                    f"injected failure: {done} cluster buckets done (limit {n})")

    def __call__(self, batch: pa.Table) -> pa.Table:
        from moonray.keyindex import stage_entry_runs
        from moonray.shuffle import read_bucket

        rows_out = []
        for pid in batch["bucket"].to_pylist():
            pid = int(pid)
            stage_dir = stage_path(self.root, "staging", self.job_id)
            self._check_fault_injection(stage_dir)
            marker = os.path.join(stage_dir, f"cluster-p{pid:05d}.done.json")
            if os.path.exists(marker):
                rows_out.append(int(read_json(marker)["rows"]))
                continue
            group = read_bucket(self.root, self.job_id, "cluster", pid)
            if group is None or len(group) == 0:
                continue
            data = group.sort_by(ZKEY).drop_columns([ZKEY])
            parts = []
            n = len(data)
            starts = list(range(0, n, self.rpf))
            sizes = [self.rpf] * len(starts)
            # fold a trailing crumb (< rpf/4 rows) into the previous
            # fragment instead of emitting a tiny file per partition
            if len(starts) > 1 and n - starts[-1] < self.rpf // 4:
                starts.pop()
                sizes.pop()
                sizes[-1] = n - starts[-1]
            for i, (start, size) in enumerate(zip(starts, sizes)):
                _meta, entries = write_fragment(
                    self.root, self.job_id, data.slice(start, size),
                    key_col=self.key_col, zone_cols=self.zone_cols,
                    frag_id=f"z-{self.job_id}-p{pid:05d}-{i:04d}", compression="zstd",
                    data_cols=self.data_cols,
                    row_group_rows=rg_rows_of(self.rpf),
                )
                if entries is not None:
                    parts.append(entries)
            n_entries = 0
            if parts and self.key_col is not None and self.index_partitions:
                merged = pa.concat_tables(parts)
                stage_entry_runs(self.root, self.job_id, merged,
                                 self.key_col, self.index_partitions)
                n_entries = len(merged)
            atomic_write_json(marker, {"pid": pid, "rows": n_entries})
            rows_out.append(n_entries)
        return pa.table({"rows": pa.array(rows_out, pa.int64())})


_MAX_BOUNDARY_FRAGS = 32


def _zkey_boundaries(table, m: dict, cols, ranges, salt_bits: int,
                     num_partitions: int, curve: str = "z"):
    """Equal-frequency Z-key range boundaries from a BOUNDED driver-side
    sample: the thin columns (zone + key — never image bytes) of ≤64
    fragments picked by uniform stride over the manifest, ≤1024 rows
    each, read directly with pyarrow in a small thread pool. Replaces a
    whole extra Ray pipeline launch (~1-2 s fixed cost per cluster()
    call, the single biggest drag on job-level scaling efficiency);
    work is O(constant) regardless of table size, so it stays cheap at
    any fragment count. Boundaries are a performance knob only:
    correctness never depends on them. Quantile (not equal-width) cuts
    absorb hot phash ranges; the low-bit key-hash salt breaks the
    remaining ties (north_rule skew handling)."""
    from concurrent.futures import ThreadPoolExecutor

    import numpy as np

    frags = m["fragments"]
    if not frags:
        return np.array([], dtype=np.int64)
    from moonray.identity import append_ckey, is_composite, key_cols_of

    stride = max(1, len(frags) // _MAX_BOUNDARY_FRAGS)
    pick = frags[::stride][:_MAX_BOUNDARY_FRAGS]
    kcols = key_cols_of(m)
    thin_cols = list(dict.fromkeys(list(cols) + kcols))
    composite = is_composite(m)
    zk = AddZKey(cols, ranges, m["key_col"], salt_bits, curve)
    per_frag = max(16, _MAX_BOUNDARY_SAMPLE // len(pick))

    from moonray.filecache import data_path
    from moonray.fragments import NBYTES

    def sample_one(f) -> tuple[np.ndarray, np.ndarray]:
        path = data_path(table.root, f["path"])
        present = set(pq.read_schema(path).names)
        want = thin_cols + ([NBYTES] if NBYTES in present else [])
        t = pq.read_table(path, columns=[c for c in want if c in present],
                          memory_map=True, pre_buffer=False)
        if len(t) == 0:
            return (np.array([], dtype=np.int64),) * 2
        if len(t) > per_frag:
            step = len(t) // per_frag
            t = t.take(pa.array(np.arange(0, len(t), step)[:per_frag]))
        # per-row payload weight (persisted at fragment-write time) →
        # equal-BYTE partitions; fall back to the fragment's bytes/rows
        # average, so equal-rows only when nothing better is known
        if NBYTES in t.column_names:
            w = t[NBYTES].to_numpy(zero_copy_only=False).astype(np.float64)
        else:
            w = np.full(len(t), max(1.0, f["bytes"] / max(1, f["rows"])))
        if composite:
            t = append_ckey(t, kcols)
        return zk(t)[ZKEY].to_numpy(zero_copy_only=False), w

    with ThreadPoolExecutor(max_workers=min(8, len(pick))) as ex:
        samples = [zw for zw in ex.map(sample_one, pick) if len(zw[0])]
    if not samples:
        return np.array([], dtype=np.int64)
    z = np.concatenate([zw[0] for zw in samples])
    w = np.concatenate([zw[1] for zw in samples])
    order = np.argsort(z, kind="stable")
    z, w = z[order], w[order]
    cum = np.cumsum(w)
    targets = cum[-1] * np.linspace(0, 1, num_partitions + 1)[1:-1]
    idx = np.searchsorted(cum, targets)
    return np.unique(z[np.minimum(idx, len(z) - 1)])


def cluster(table, *, cols=None, salt_bits: int = 8,
            partition_rows: int | None = None, curve: str = "z",
            job_id: str | None = None, scope: str = "full") -> int:
    """Z-order clustering: range-partition the live table by the salted
    interleaved Z-key (sampled equal-frequency boundaries), then ONE
    fused shuffle — ``groupby(pid).map_groups`` sorts each partition and
    writes its fragments + zone maps in place. Image payload bytes move
    through the shuffle exactly once; a naive ``ds.sort`` would move
    them through sample + map + reduce + a separate rewrite pass.
    Skew from hot phash ranges is broken by quantile cuts + the key-hash
    salt (see zorder.py).

    ``scope="incremental"`` clusters only the UNCLUSTERED TAIL — the
    fragments born since the last cluster pass (merge inserts,
    compaction outputs) — leaving prior Z-sorted fragments untouched:
    the LSM-flavored maintenance a 100 TB table needs, where a full
    rewrite per round is unpayable. Scans stay correct either way
    (zone pruning is per fragment); the tail's index entries append as
    deltas (stale entries for replaced tail fragments are dropped by
    the next index merge). Periodic ``scope="full"`` passes fold the
    sorted runs together."""
    import ray
    import ray.data as rd

    job_id = job_id or new_job_id()
    prev = mf.find_version_by_job(table.root, job_id)
    if prev is not None:
        return prev
    if scope not in ("full", "incremental"):
        raise ValueError(f"cluster scope must be full|incremental, got {scope!r}")
    m = table.manifest()
    if scope == "incremental":
        # the unclustered tail: cluster outputs carry a "z-" frag id;
        # anything else (flush "f-", compaction "c-") needs sorting.
        # Compaction of previously-sorted fragments deliberately loses
        # the mark — its concat does not preserve global Z order.
        tail = [f for f in m["fragments"] if not f["id"].startswith("z-")]
        m = dict(m, fragments=tail)
    if not m["fragments"]:
        return m["version"]
    cols = list(cols or m["zone_cols"])
    if not cols:
        raise ValueError("cluster needs cluster columns: pass cols=... or "
                         "create the table with zone_cols")
    log = LineageLog(table.root, job_id)
    log.stage_start("cluster")
    rpf = m["rows_per_fragment"]
    live_rows = sum(f["rows"] - f["dv_count"] for f in m["fragments"])

    # ---- stage: plan (persisted so a RESUME replays the exact same
    # shuffle: bounds / P / batch_rows determine run-file slicing and
    # content-derived names — recomputing them on a different-sized
    # cluster would mix stale first-attempt runs with differently-sliced
    # new ones in the same bucket dirs, duplicating rows) ----
    plan = log.stage_outputs("cluster_plan")
    if plan is None:
        log.stage_start("cluster_plan")
        ranges = {}
        for c in cols:
            mins = [f["zones"][c][0] for f in m["fragments"] if c in f.get("zones", {})]
            maxs = [f["zones"][c][1] for f in m["fragments"] if c in f.get("zones", {})]
            ranges[c] = (min(mins), max(maxs)) if mins else (0.0, 0.0)
        # partition count: ~2 output fragments per partition for
        # reduce-heap bounds, but never fewer than 2 partitions per CPU
        # (a P barely above the CPU count leaves almost half the cores
        # idle in the second reduce wave — measured 1.95x cluster
        # speedup at 2→8 cpus purely from 9 tasks packing onto 8 cores);
        # and never more than one partition per output fragment.
        cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
        part_rows = partition_rows or max(1, 2 * rpf)
        P = max(1, -(-live_rows // part_rows))
        if partition_rows is None:  # explicit partition_rows wins as-is
            P = max(1, min(max(P, 2 * cpus),
                           max(1, live_rows // max(1, rpf))))
        bounds = _zkey_boundaries(table, m, cols, ranges, salt_bits, P, curve)
        # map-batch size: CPU-INDEPENDENT (one fragment's worth) — a
        # cpu-derived size made the low-parallelism leg run 4x larger
        # batches and look artificially efficient per row, distorting
        # the N-vs-4N scaling comparison.
        batch_rows = int(max(1, min(rpf, live_rows)))
        plan = {"cols": cols, "curve": curve, "salt_bits": salt_bits,
                "ranges": {c: list(v) for c, v in ranges.items()},
                "P": int(P), "bounds": [int(x) for x in bounds],
                "batch_rows": batch_rows,
                "counters": {"partitions": int(P)}}
        log.stage_done("cluster_plan", plan)
    import numpy as np

    cols, curve, salt_bits = plan["cols"], plan["curve"], plan["salt_bits"]
    ranges = {c: tuple(v) for c, v in plan["ranges"].items()}
    P = plan["P"]  # (plan also persists batch_rows for older resumes)
    bounds = np.asarray(plan["bounds"], dtype=np.int64)

    # ---- stage: shuffle — ONE storage-backed range pass: each source
    # fragment maps to per-bucket IPC runs inside ONE raw task (read →
    # DV filter → Z-key → split → write). Raw tasks, not a Dataset
    # pipeline: the input is the table's own fragment list, so Dataset
    # machinery buys nothing and costs a pipeline launch plus an
    # object-store round trip of the full payload between the read
    # operator and the map operator. Ray's own sort shuffle is
    # O(blocks²) in intermediate objects and blew up quadratically on
    # wide image payloads. Per-fragment task granularity is also
    # CPU-count-independent → deterministic run slicing for resume. ----
    from moonray.shuffle import RunWriter, reduce_buckets_tasks

    def bucket_fn(b: pa.Table) -> np.ndarray:
        z = b[ZKEY].to_numpy(zero_copy_only=False)
        return np.searchsorted(bounds, z).astype(np.int32)

    from moonray.identity import append_ckey, is_composite, key_cols_of

    shuffle_out = log.stage_outputs("cluster_shuffle")
    if shuffle_out is None:
        log.stage_start("cluster_shuffle")
        import ray

        from moonray.dv import dv_paths_of
        from moonray.shuffle import BUCKET_COL
        from moonray.table import _read_fragment
        from moonray.util import cap_kernel_threads

        user_schema = table.schema()
        defaults = m.get("column_defaults", {})
        kcols = key_cols_of(m)
        composite = is_composite(m)
        zk = AddZKey(cols, ranges, m["key_col"], salt_bits, curve)
        writer = RunWriter(table.root, job_id, "cluster",
                           id_cols=(m["key_col"],) if m["key_col"] else (ZKEY,))
        root = table.root

        @ray.remote
        def map_frag(rel: str, dvs: list[str]) -> pa.Table:
            cap_kernel_threads()
            t = _read_fragment(root, rel, dvs, user_schema, defaults, False)
            if composite:
                t = append_ckey(t, kcols)
            t = zk(t)
            t = t.append_column(BUCKET_COL,
                                pa.array(bucket_fn(t).astype(np.int32)))
            return writer(t)

        map_frag = map_frag.options(name="cluster_map_frag")
        res = ray.get([map_frag.remote(f["path"], dv_paths_of(f))
                       for f in m["fragments"]])
        sizes: dict[int, int] = {}
        for t in res:
            for b, nb in zip(t["bucket"].to_pylist(), t["bytes"].to_pylist()):
                sizes[int(b)] = sizes.get(int(b), 0) + int(nb)
        buckets = sorted(sizes, key=lambda b: -sizes[b])  # LPT order
        shuffle_out = {"buckets": buckets, "counters": {"buckets": len(buckets)}}
        log.stage_done("cluster_shuffle", shuffle_out)
    buckets = shuffle_out["buckets"]
    user_cols = list(table.schema().names)
    # raw tasks (no Dataset launch): each bucket writes its sorted
    # fragments and stages its index entries pre-partitioned; the index
    # build is then one tiny raw task per partition
    reduce_buckets_tasks(
        buckets, ClusterWriteGroup(table.root, job_id, m["key_col"],
                                   m["zone_cols"], rpf, data_cols=user_cols,
                                   index_partitions=m["index"]["num_partitions"]))
    if m["key_col"] is None:  # identity='none': no key index
        deltas: dict[str, list[str]] = {}
    else:
        deltas = build_index_from_runs(table.root, job_id, m["key_col"])
    new_frags = [read_json(p) for p in _staged_meta_paths(table.root, job_id)]
    replaced = {f["id"] for f in m["fragments"]}
    log.stage_done("cluster", {"counters": {
        "partitions": int(P),
        "new_fragments": len(new_frags),
        "rows": sum(f["rows"] for f in new_frags)}})
    # incremental: m["fragments"] was narrowed to the tail, so commit
    # against the REAL parent manifest — untouched fragments survive,
    # and the index keeps its existing files (append tail deltas only;
    # a full pass rebuilds the index outright)
    parent = table.manifest()
    return table._commit_append(parent, new_frags, deltas, parent["commit_lsn"],
                                job_id, replaced_frag_ids=replaced,
                                replace_index=(scope == "full"),
                                op="maintenance")


def rewrite_manifest(table, *, job_id: str | None = None) -> int:
    """Manifest rewrite: republish the current state as a fresh version
    (drops tombstoned metadata, normalizes entries) without touching
    data — the metadata-only half of the reference's Iceberg manifest
    rewrite at each sync (iceberg_table_syncer.rs)."""
    job_id = job_id or new_job_id()
    prev = mf.find_version_by_job(table.root, job_id)
    if prev is not None:
        return prev
    m = table.manifest()
    return table._commit_append(m, [], {}, m["commit_lsn"], job_id,
                                op="maintenance")
