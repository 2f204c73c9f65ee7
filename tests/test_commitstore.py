"""Commit-store primitives: conditional version create (no
exists()/rename race), pointer publish, scheme dispatch, and the
concurrent-writer guard surfacing through commit_manifest."""

import os

import pytest

from moonray import manifest as mf
from moonray.commitstore import CommitConflict, LocalCommitStore, store_for


def test_put_if_absent_is_conditional_and_complete(tmp_path):
    s = LocalCommitStore(str(tmp_path))
    s.put_if_absent("versions/v1.json", b'{"v":1}')
    assert (tmp_path / "versions/v1.json").read_bytes() == b'{"v":1}'
    with pytest.raises(CommitConflict):
        s.put_if_absent("versions/v1.json", b'{"v":"other"}')
    # loser's content never replaces the winner's, and no temp litter
    assert (tmp_path / "versions/v1.json").read_bytes() == b'{"v":1}'
    assert sorted(os.listdir(tmp_path / "versions")) == ["v1.json"]
    s.set_pointer("versions/LATEST", "1")
    assert s.read_pointer("versions/LATEST") == "1"


def test_store_scheme_dispatch(tmp_path):
    assert isinstance(store_for(str(tmp_path)), LocalCommitStore)
    with pytest.raises(NotImplementedError):
        store_for("s3://bucket/table")


def test_commit_manifest_rejects_concurrent_version(tmp_path):
    root = str(tmp_path / "t")
    mf.init_table_dirs(root)
    m = {"version": 0, "parent": None, "commit_lsn": 0, "job_id": "a",
         "key_col": "id", "key_cols": ["id"], "identity": "keys",
         "zone_cols": [], "index": {"num_partitions": 1, "partitions": {}},
         "fragments": [], "rows_per_fragment": 8, "schema_ipc": "",
         "column_defaults": {}, "stats": {}}
    mf.commit_manifest(root, dict(m))
    with pytest.raises(CommitConflict):
        mf.commit_manifest(root, dict(m, job_id="b"))
    assert mf.latest_version(root) == 0
