"""Resumable shard export: determinism, resume-skips-finished, summary
parity vs pandas."""

import os

import numpy as np
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"


def _docs():
    import ray.data as rd

    return rd.read_parquet(f"{SF}/documents.parquet")


def test_export_matches_pandas_and_is_deterministic(tmp_path):
    from moonray.functions.shards import export_training_shards

    out1, out2 = str(tmp_path / "a"), str(tmp_path / "b")
    s1 = {r["shard"]: r["n_rows"]
          for r in export_training_shards(_docs(), out1, 8, "doc_id",
                                          mode="modulo").take_all()}
    df = pq.read_table(f"{SF}/documents.parquet").to_pandas()
    want = (df.doc_id % 8).value_counts().to_dict()
    assert s1 == want

    export_training_shards(_docs(), out2, 8, "doc_id", mode="modulo")
    for s in range(8):
        a = open(os.path.join(out1, f"shard={s:05d}", "part.parquet"), "rb").read()
        b = open(os.path.join(out2, f"shard={s:05d}", "part.parquet"), "rb").read()
        assert a == b, f"shard {s} not byte-stable"


def test_resume_skips_finished_shards(tmp_path):
    """Simulate a killed export: finished shards keep their _DONE
    markers, the in-flight shard has a partial file and NO marker, one
    shard is entirely missing. Resume must rewrite exactly the
    unfinished ones and leave finished files byte-untouched."""
    import shutil

    import moonray.functions.shards as sh

    out = str(tmp_path / "x")
    sh.export_training_shards(_docs(), out, 8, "doc_id", mode="modulo")

    # craft the crash state: shard 3 partial (no marker, torn file),
    # shard 5 never started
    os.remove(os.path.join(out, "shard=00003", sh._DONE))
    with open(os.path.join(out, "shard=00003", "part.parquet"), "wb") as f:
        f.write(b"torn")
    shutil.rmtree(os.path.join(out, "shard=00005"))

    done_before = sh.finished_shards(out)
    assert done_before == set(range(8)) - {3, 5}
    mtimes = {s: os.path.getmtime(os.path.join(out, f"shard={s:05d}",
                                               "part.parquet"))
              for s in done_before}

    summary = {r["shard"]: r["n_rows"]
               for r in sh.export_training_shards(_docs(), out, 8, "doc_id",
                                                  mode="modulo").take_all()}
    assert set(summary) == set(range(8))
    for s, m in mtimes.items():
        assert os.path.getmtime(os.path.join(out, f"shard={s:05d}",
                                             "part.parquet")) == m, s
    df = pq.read_table(f"{SF}/documents.parquet").to_pandas()
    assert summary == (df.doc_id % 8).value_counts().to_dict()
    # the rewritten shard is readable and sorted (full overwrite, no
    # append-to-torn-file)
    t3 = pq.read_table(os.path.join(out, "shard=00003", "part.parquet"))
    ids = t3["doc_id"].to_pylist()
    assert ids == sorted(ids) and all(i % 8 == 3 for i in ids)


def test_param_mismatch_refused_and_empty_shards_complete(tmp_path):
    import pyarrow as pa
    import ray.data as rd

    import moonray.functions.shards as sh

    out = str(tmp_path / "p")
    ds = rd.from_arrow(pa.table({
        "k": pa.array(["a", "b", "c"], pa.string()),
        "v": pa.array([1, 2, 3], pa.int64())}))
    # string keys exercise the hash_key_array path; 16 shards >> 3 keys
    # exercises empty-shard completion
    s = {r["shard"]: r["n_rows"]
         for r in sh.export_training_shards(ds, out, 16, "k").take_all()}
    assert set(s) == set(range(16)) and sum(s.values()) == 3
    with pytest.raises(ValueError, match="mixing shard layouts"):
        sh.export_training_shards(ds, out, 8, "k")
    # fully-complete resume is a no-op that still returns the summary
    again = {r["shard"]: r["n_rows"]
             for r in sh.export_training_shards(ds, out, 16, "k").take_all()}
    assert again == s


def test_null_keys_rejected(tmp_path):
    import pyarrow as pa
    import ray.data as rd

    import moonray.functions.shards as sh

    ds = rd.from_arrow(pa.table({
        "k": pa.array([1, None, 3], pa.int64()),
        "v": pa.array([1, 2, 3], pa.int64())}))
    with pytest.raises(Exception, match="null 'k'"):
        sh.export_training_shards(ds, str(tmp_path / "n"), 4, "k",
                                  mode="modulo").take_all()


def test_shuffled_export_is_seeded_permutation(tmp_path):
    import moonray.functions.shards as sh

    o1, o2, o3 = (str(tmp_path / x) for x in "abc")
    sh.export_training_shards(_docs(), o1, 4, "doc_id", mode="modulo")
    sh.export_training_shards(_docs(), o2, 4, "doc_id", mode="modulo",
                              shuffle_seed=7)
    sh.export_training_shards(_docs(), o3, 4, "doc_id", mode="modulo",
                              shuffle_seed=7)
    for s in range(4):
        p = f"shard={s:05d}/part.parquet"
        plain = pq.read_table(os.path.join(o1, p))["doc_id"].to_pylist()
        shuf = pq.read_table(os.path.join(o2, p))["doc_id"].to_pylist()
        again = pq.read_table(os.path.join(o3, p))["doc_id"].to_pylist()
        assert sorted(shuf) == plain          # same rows, key order differs
        assert shuf != plain                  # actually shuffled
        assert shuf == again                  # seeded → reproducible
    # a different seed is a different permutation; mismatched resume is
    # refused (seed is part of the layout manifest)
    import pytest as _pytest

    with _pytest.raises(ValueError, match="mixing shard layouts"):
        sh.export_training_shards(_docs(), o2, 4, "doc_id", mode="modulo",
                                  shuffle_seed=8)
