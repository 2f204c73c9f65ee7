"""Image-corpus curation vs a brute-force oracle: quality gate +
all-pairs hamming + BFS components + max-area representative."""

import numpy as np
import pyarrow as pa

from moonray.fixtures import make_images_with_dup_families
from moonray.pipelines.curation import (caption_quality_filter,
                                        curate_image_corpus,
                                        image_dup_groups)

MAX_HAMMING = 4
MIN_TOKENS = 4


def _hamming(a: int, b: int) -> int:
    return bin((np.uint64(a) ^ np.uint64(b)).item()).count("1")


def _oracle(rows):
    """Pure-Python curation: returns the surviving image_id set."""
    rows = [r for r in rows if len(r["caption"].split()) >= MIN_TOKENS]
    ids = [r["image_id"] for r in rows]
    ph = {r["image_id"]: np.uint64(r["phash"]).item() for r in rows}
    area = {r["image_id"]: r["w"] * r["h"] for r in rows}
    adj = {i: set() for i in ids}
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            if _hamming(ph[ids[i]], ph[ids[j]]) <= MAX_HAMMING:
                adj[ids[i]].add(ids[j])
                adj[ids[j]].add(ids[i])
    keep, seen = set(), set()
    for start in ids:
        if start in seen:
            continue
        grp, stack = {start}, [start]
        while stack:
            x = stack.pop()
            for y in adj[x]:
                if y not in grp:
                    grp.add(y)
                    stack.append(y)
        seen |= grp
        keep.add(min(grp, key=lambda x: (-area[x], x)))
    return keep


def test_curation_matches_brute_force_oracle():
    ds = make_images_with_dup_families(60, seed=42).materialize()
    rows = ds.select_columns(
        ["image_id", "caption", "phash", "w", "h"]).take_all()
    expected = _oracle(rows)

    got = curate_image_corpus(ds, max_hamming=MAX_HAMMING,
                              min_tokens=MIN_TOKENS, buckets=4)
    got_ids = {r["image_id"] for r in
               got.select_columns(["image_id"]).take_all()}
    assert got_ids == expected
    # sanity on the fixture: dup families existed and were collapsed,
    # junk captions were gated, and the high-res variant won its family
    assert any(i.endswith("-d1") for i in got_ids)
    assert not any(i.endswith("-d2") for i in got_ids)
    assert sum(1 for r in rows if r["caption"] == "junk") > 0  # gate had work
    assert not any(r in got_ids for r in
                   (x["image_id"] for x in rows if x["caption"] == "junk"))
    assert got.count() < ds.count()


def test_quality_filter_gates_junk():
    ds = make_images_with_dup_families(30, seed=7)
    kept = caption_quality_filter(ds, min_tokens=MIN_TOKENS)
    caps = [r["caption"] for r in kept.select_columns(["caption"]).take_all()]
    assert caps and all(len(c.split()) >= MIN_TOKENS for c in caps)


def test_dup_groups_families_are_complete():
    ds = make_images_with_dup_families(25, seed=42).materialize()
    grp = image_dup_groups(ds, max_hamming=MAX_HAMMING, buckets=4).take_all()
    by_comp: dict[int, set] = {}
    for r in grp:
        by_comp.setdefault(r["component"], set()).add(r["image_id"])
    fams = [v for v in by_comp.values()]
    # every family holds a base and its two variants
    assert fams and all(len(f) == 3 for f in fams)
    for f in fams:
        base = min(f, key=len)
        assert {base + "-d1", base + "-d2"} <= f


def test_id64_collision_raises():
    ds = make_images_with_dup_families(10, seed=42).materialize()
    import pytest

    # a degenerate hash maps every id to one node — the check must fail
    # LOUDLY instead of silently merging unrelated groups
    with pytest.raises(Exception, match="collision"):
        image_dup_groups(ds, max_hamming=MAX_HAMMING, buckets=2,
                         _hash_fn=lambda s: 42).take_all()


def test_curate_table_in_place(tmp_path):
    """In-place table curation: same survivor set as the Dataset path,
    through the DV delete path — old version still scans pre-curation
    (snapshot isolation), and the merge is idempotent under job_id."""
    from moonray.fixtures import IMAGE_SCHEMA
    from moonray.pipelines.curation import curate_table
    from moonray.table import MoonrayTable

    ds = make_images_with_dup_families(40, seed=42).materialize()
    expected = _oracle(ds.select_columns(
        ["image_id", "caption", "phash", "w", "h"]).take_all())

    t = MoonrayTable.create(str(tmp_path / "imgs"), key_col="image_id",
                            schema=IMAGE_SCHEMA, zone_cols=("phash",),
                            index_partitions=4, rows_per_fragment=64)
    t.bulk_load(ds)
    v_pre = t.latest_version()
    v = curate_table(t, lsn=10_000, max_hamming=MAX_HAMMING,
                     min_tokens=MIN_TOKENS, buckets=4, job_id="curate-1")
    got = {r["image_id"] for r in
           t.scan().select_columns(["image_id"]).take_all()}
    assert got == expected
    # snapshot isolation: the pre-curation version still has every row
    assert t.scan(version=v_pre).count() == ds.count()
    # idempotent resume
    assert curate_table(t, lsn=10_000, max_hamming=MAX_HAMMING,
                        min_tokens=MIN_TOKENS, buckets=4,
                        job_id="curate-1") == v
