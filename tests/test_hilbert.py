"""Hilbert-curve clustering preserves state and produces zone maps;
hilbert_index is a bijection on the lattice (locality sanity in-module).
"""

import numpy as np
import pyarrow as pa

from moonray.fixtures import IMAGE_SCHEMA, make_images_dataset
from moonray.table import MoonrayTable
from moonray.zorder import hilbert_index


def test_hilbert_index_bijective_2d():
    # full 2-bit × 2-bit lattice → indices are a permutation of 0..15
    xs, ys = np.meshgrid(np.arange(4, dtype=np.uint64),
                         np.arange(4, dtype=np.uint64))
    h = hilbert_index([xs.ravel(), ys.ravel()], bits=2)
    assert sorted(h.tolist()) == list(range(16))
    # hilbert is unit-step: consecutive curve positions differ by 1 in
    # exactly one coordinate (the defining property Z-order lacks)
    order = np.argsort(h)
    dx = np.abs(np.diff(xs.ravel()[order].astype(int)))
    dy = np.abs(np.diff(ys.ravel()[order].astype(int)))
    assert np.all(dx + dy == 1)


def test_cluster_hilbert_preserves_state(tmp_path):
    t = MoonrayTable.create(str(tmp_path / "h"), key_col="image_id",
                            schema=IMAGE_SCHEMA, zone_cols=("phash", "w", "h"),
                            index_partitions=4, rows_per_fragment=64)
    t.bulk_load(make_images_dataset(150, seed=42))

    def state():
        tbl = pa.concat_tables([b for b in t.scan().iter_batches(
            batch_format="pyarrow", batch_size=4096)])
        return {r["image_id"]: r for r in tbl.to_pylist()}

    before = state()
    t.cluster(curve="hilbert")
    assert state() == before
    m = t.manifest()
    assert all("phash" in f["zones"] for f in m["fragments"])
    # still mergeable after hilbert rewrite
    from moonray.fixtures import make_changes_dataset

    t.merge(make_changes_dataset(40, 150, seed=5), job_id="post-h")
    assert len(state()) > 0
