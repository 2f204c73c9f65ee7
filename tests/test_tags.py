"""Named refs (tags): a durable name → version pointer that also pins
its snapshot against expire_snapshots — the Iceberg tag-ref analogue
(our version chain is linear, so tags only; no branches). Built on the
pin mechanism (pins/tag-<name>), so retention comes for free.
"""

import json
import subprocess
import sys

import pyarrow as pa
import pytest
import ray.data as rd

from moonray.table import MoonrayTable


def _mk(root: str) -> MoonrayTable:
    schema = pa.schema([("id", pa.int64()), ("val", pa.string())])
    return MoonrayTable.create(root, key_col="id", schema=schema,
                               index_partitions=2, rows_per_fragment=32)


def _load(n: int, start: int = 0) -> rd.Dataset:
    return rd.from_arrow(pa.table({
        "id": pa.array(range(start, start + n), pa.int64()),
        "val": pa.array([f"v{i}" for i in range(start, start + n)],
                        pa.string()),
    }))


def test_tag_resolves_and_survives_expiry(tmp_path):
    t = _mk(str(tmp_path / "tbl"))
    t.bulk_load(_load(64))
    v_tagged = t.tag("baseline")          # defaults to latest
    for i in range(1, 4):
        t.bulk_load(_load(64, start=64 * i))
    assert t.tags() == {"baseline": v_tagged}
    assert t.ref_version("baseline") == v_tagged
    assert t.scan(ref="baseline").count() == 64   # old snapshot via name
    t.expire_snapshots(keep_last=1)
    assert t.scan(ref="baseline").count() == 64   # tag pinned it
    t.untag("baseline")
    t.expire_snapshots(keep_last=1)
    with pytest.raises(Exception):
        t.scan(version=v_tagged).count()          # now expired
    assert t.scan().count() == 256


def test_tag_validation_and_errors(tmp_path):
    t = _mk(str(tmp_path / "tbl"))
    t.bulk_load(_load(32))
    with pytest.raises(ValueError):
        t.tag("../escape")
    with pytest.raises(ValueError):
        t.tag("")
    with pytest.raises(Exception):
        t.tag("ghost", version=999)              # target must exist
    with pytest.raises(KeyError):
        t.ref_version("nope")
    with pytest.raises(ValueError):
        t.scan(version=1, ref="x")               # mutually exclusive
    # re-tag moves the name (last write wins, like iceberg replace tag)
    v1 = t.tag("prod")
    t.bulk_load(_load(32, start=32))
    v2 = t.tag("prod")
    assert v2 > v1 and t.ref_version("prod") == v2


def test_tags_cli_roundtrip(tmp_path):
    root = str(tmp_path / "tbl")
    t = _mk(root)
    t.bulk_load(_load(32))

    def cli(*argv):
        out = subprocess.run(
            [sys.executable, "-m", "moonray.jobs", *argv],
            capture_output=True, text=True, check=True,
            cwd="/root/repo")
        return json.loads(out.stdout.strip().splitlines()[-1])

    r = cli("tag", "--table", root, "release-1")
    assert r["version"] == t.latest_version()
    assert cli("tags", "--table", root) == {"release-1": r["version"]}
    outdir = str(tmp_path / "out")
    cli("scan", "--table", root, "--ref", "release-1", "--output", outdir)
    import pyarrow.parquet as pq

    assert pq.read_table(outdir).num_rows == 32
    cli("untag", "--table", root, "release-1")
    assert cli("tags", "--table", root) == {}
