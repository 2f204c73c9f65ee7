"""Kill-and-resume at bucket/fragment granularity + seeded randomized
chaos runs against the brute-force oracle — our analogue of the
reference's chaos/replay and failure-injection test strategy
(src/moonlink/src/table_handler/chaos_test.rs, failure_tests.rs;
SURVEY.md §5)."""

import os

import pyarrow as pa
import pytest

from moonray.fixtures import (
    IMAGE_SCHEMA,
    make_changes_dataset,
    make_images_dataset,
    oracle_apply,
)
from moonray.table import MoonrayTable

N_BASE = 150


def _scan_dict(t, version=None):
    tbl = pa.concat_tables(
        [b for b in t.scan(version).iter_batches(batch_format="pyarrow",
                                                 batch_size=4096)])
    return {r["image_id"]: r for r in tbl.to_pylist()}


def _arrow(ds):
    return pa.concat_tables(
        [b for b in ds.iter_batches(batch_format="pyarrow", batch_size=4096)])


def _mk(root):
    t = MoonrayTable.create(str(root), key_col="image_id", schema=IMAGE_SCHEMA,
                            zone_cols=("phash", "w", "h"), index_partitions=8,
                            rows_per_fragment=64)
    t.bulk_load(make_images_dataset(N_BASE, seed=42))
    return t


def test_merge_killed_mid_apply_resumes(tmp_path):
    """A merge that dies after 3 of 8 apply buckets must (a) leave the
    table unchanged (no commit), (b) resume under the same job_id
    reusing the completed buckets' work, (c) produce exactly the same
    state as an uninterrupted merge."""
    t = _mk(tmp_path / "killed")
    ref = _mk(tmp_path / "ref")
    changes = lambda: make_changes_dataset(100, N_BASE, seed=7)  # noqa: E731

    ref.merge(changes(), job_id="ref-merge")
    expected = _scan_dict(ref)

    v_before = t.latest_version()
    stage_dir = os.path.join(t.root, "staging", "kill-job")
    os.makedirs(stage_dir, exist_ok=True)
    with open(os.path.join(stage_dir, "FAIL_INJECT"), "w") as f:
        f.write("3")
    with pytest.raises(Exception):
        t.merge(changes(), job_id="kill-job")
    assert t.latest_version() == v_before  # snapshot isolation: no commit
    done_before = sorted(p for p in os.listdir(stage_dir)
                         if p.startswith("apply-b") and p.endswith(".done.json"))
    assert len(done_before) >= 3  # partial work persisted
    mtimes = {p: os.path.getmtime(os.path.join(stage_dir, p)) for p in done_before}

    os.remove(os.path.join(stage_dir, "FAIL_INJECT"))
    v = t.merge(changes(), job_id="kill-job")  # resume
    assert v == v_before + 1
    assert _scan_dict(t) == expected
    for p, old_mtime in mtimes.items():  # completed buckets were NOT redone
        assert os.path.getmtime(os.path.join(stage_dir, p)) == old_mtime
    # idempotent re-merge after commit
    assert t.merge(changes(), job_id="kill-job") == v


def test_merge_resume_is_per_bucket_not_per_job(tmp_path):
    """Lineage log records per-stage progress; a resumed job skips the
    shuffle stage outputs too."""
    from moonray.checkpoint import LineageLog

    t = _mk(tmp_path / "lineage")
    t.merge(make_changes_dataset(60, N_BASE, seed=9), job_id="lj")
    log = LineageLog(t.root, "lj")
    stages = {r["stage"]: r["status"] for r in log.read_all()}
    assert stages.get("shuffle") == "done"
    assert stages.get("apply") == "done"
    assert stages.get("commit") == "done"
    # counters present (north rule: per-partition lineage + metrics)
    recs = [r for r in log.read_all() if r["stage"] == "apply" and r["status"] == "done"]
    assert recs and "rows_in" in recs[0]


def test_chaos_seeded_rounds_with_maintenance(tmp_path):
    """Seeded multi-round CDC chaos: 3 change rounds with maintenance
    interleaved; after every operation the scan must equal the oracle
    and invariants must hold (LSN monotone, cardinality consistent)."""
    t = _mk(tmp_path / "chaos")
    oracle_tbl = _arrow(make_images_dataset(N_BASE, seed=42))
    state = {r["image_id"]: r for r in oracle_tbl.to_pylist()}

    lsn0 = 1_000_000
    last_lsn = 0
    for rnd, (n_changes, maint) in enumerate(
            [(80, "compact"), (60, "cluster"), (70, "expire")]):
        ch_ds = make_changes_dataset(n_changes, N_BASE, seed=100 + rnd, lsn0=lsn0)
        ch = _arrow(ch_ds)
        base_tbl = pa.Table.from_pylist(
            sorted(state.values(), key=lambda r: r["image_id"]), schema=IMAGE_SCHEMA)
        state = oracle_apply(base_tbl, ch)
        t.merge(make_changes_dataset(n_changes, N_BASE, seed=100 + rnd, lsn0=lsn0),
                job_id=f"chaos-{rnd}")
        m = t.manifest()
        assert m["commit_lsn"] == lsn0 + n_changes - 1
        assert m["commit_lsn"] > last_lsn  # LSN monotonicity
        last_lsn = m["commit_lsn"]
        got = _scan_dict(t)
        assert set(got) == set(state), f"round {rnd} keyset"
        for k in got:
            assert got[k]["caption"] == state[k]["caption"], (rnd, k)
            assert got[k]["phash"] == state[k]["phash"], (rnd, k)
        assert t.describe()["cardinality"] == len(state)

        if maint == "compact":
            t.optimize("data", target_bytes=1 << 30, min_group=2)
        elif maint == "cluster":
            t.cluster()
        elif maint == "expire":
            t.optimize("index")
            t.expire_snapshots(keep_last=2)
        got = _scan_dict(t)
        assert set(got) == set(state), f"round {rnd} post-{maint}"
        assert t.describe()["cardinality"] == len(state)
        lsn0 += 1_000_000


def test_cluster_killed_mid_rewrite_resumes(tmp_path):
    """A cluster pass that dies after 2 of ~N reduce buckets must leave
    the table unchanged, then resume under the same job_id reusing the
    completed buckets' fragments — fragment-granular maintenance resume
    (north rule)."""
    t = _mk(tmp_path / "ck")
    ref = _mk(tmp_path / "ckref")
    ref.cluster(job_id="zc", partition_rows=24)
    expected = _scan_dict(ref)

    v_before = t.latest_version()
    stage_dir = os.path.join(t.root, "staging", "zc")
    os.makedirs(stage_dir, exist_ok=True)
    with open(os.path.join(stage_dir, "FAIL_INJECT"), "w") as f:
        f.write("2")
    # partition_rows=24 → ~7 reduce buckets > the 4 test CPUs, so the
    # second task wave deterministically sees ≥2 done markers and trips
    # the injected failure
    with pytest.raises(Exception):
        t.cluster(job_id="zc", partition_rows=24)
    assert t.latest_version() == v_before  # no commit
    done = [p for p in os.listdir(stage_dir) if p.endswith(".done.json")]
    assert len(done) >= 2
    mtimes = {p: os.path.getmtime(os.path.join(stage_dir, p)) for p in done}

    os.remove(os.path.join(stage_dir, "FAIL_INJECT"))
    v = t.cluster(job_id="zc", partition_rows=24)
    assert v == v_before + 1
    assert _scan_dict(t) == expected  # deterministic: same result as ref
    for p, old in mtimes.items():
        assert os.path.getmtime(os.path.join(stage_dir, p)) == old


def test_chaos_randomized_op_sequence(tmp_path):
    """Randomized seeded chaos (the reference's chaos_test.rs pattern:
    random event sequences against invariants, seed printed for repro —
    override with MOONRAY_CHAOS_SEED). Ops drawn: merges, streaming-xact
    delete commit/abort, every maintenance pass (incl. incremental
    cluster and the auto trigger), pins, snapshot expiry. Invariants
    after every op: scan == brute-force oracle, cardinality consistent,
    commit LSN monotone, pinned snapshots immutable."""
    import random

    seed = int(os.environ.get("MOONRAY_CHAOS_SEED", "20260817"))
    rng = random.Random(seed)
    print(f"[chaos] seed={seed}")

    t = _mk(tmp_path / "rchaos")
    state = {r["image_id"]: r
             for r in _arrow(make_images_dataset(N_BASE, seed=42)).to_pylist()}
    lsn0 = 1_000_000
    last_lsn = 0
    pins: list[tuple[int, str, dict]] = []

    def snapshot_of(st):
        return {k: (v["caption"], v["phash"]) for k, v in st.items()}

    OPS = ["merge", "merge", "merge", "stream_delete", "stream_abort",
           "compact", "index_merge", "cluster_incr", "cluster_full",
           "maintain", "pin", "expire"]
    for step in range(14):
        op = rng.choice(OPS)
        if op == "merge":
            n = rng.randint(20, 60)
            s = rng.randint(0, 1 << 20)
            ch = make_changes_dataset(n, N_BASE, seed=s, lsn0=lsn0)
            base_tbl = pa.Table.from_pylist(
                sorted(state.values(), key=lambda r: r["image_id"]),
                schema=IMAGE_SCHEMA)
            state = oracle_apply(base_tbl, _arrow(
                make_changes_dataset(n, N_BASE, seed=s, lsn0=lsn0)))
            t.merge(ch, job_id=f"chaos-{step}")
            lsn0 += 1_000_000
        elif op in ("stream_delete", "stream_abort"):
            import ray.data as rd

            from moonray.stream import StreamTransaction

            victims = rng.sample(sorted(state), k=min(5, len(state)))
            xact = StreamTransaction(t, xid=f"x{step}")
            xact.delete(rd.from_items([{"image_id": k} for k in victims]))
            if op == "stream_abort":
                xact.abort()          # nothing changes
            else:
                xact.commit(lsn=lsn0)
                for k in victims:
                    state.pop(k, None)
                lsn0 += 1_000_000
        elif op == "compact":
            t.optimize("data", target_bytes=1 << 30, min_group=2)
        elif op == "index_merge":
            t.optimize("index")
        elif op == "cluster_incr":
            t.cluster(scope="incremental")
        elif op == "cluster_full":
            t.cluster()
        elif op == "maintain":
            t.maintain_if_needed(cluster_tail_frags=8)
        elif op == "pin":
            v, tok = t.scan_begin()
            pins.append((v, tok, snapshot_of(state)))
        elif op == "expire":
            t.expire_snapshots(keep_last=2)

        m = t.manifest()
        assert m["commit_lsn"] >= last_lsn, (step, op)  # LSN monotone
        last_lsn = m["commit_lsn"]
        got = _scan_dict(t)
        assert snapshot_of(got) == snapshot_of(state), (step, op, seed)
        assert t.describe()["cardinality"] == len(state), (step, op, seed)

    # every pinned snapshot still reads exactly as recorded
    for v, tok, snap in pins:
        assert snapshot_of(_scan_dict(t, version=v)) == snap, (v, seed)
        t.scan_end(tok)
