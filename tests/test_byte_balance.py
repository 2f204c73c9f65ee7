"""Equal-BYTE Z-order partitioning (the ``_nbytes`` planner column).

Payload size often correlates with the clustering columns (bigger
images → bigger w/h → one end of the Z-curve), so equal-ROW quantile
cuts skew reducer input bytes by ~7× and the biggest bucket alone sets
the cluster() makespan. Fragments persist a per-row payload-size column
(fragments.row_payload_bytes) and the boundary sampler cuts equal-byte
partitions from it; this test pins that the resulting fragments are
byte-balanced on an adversarially size-skewed table.
"""

import numpy as np
import pyarrow as pa
import pytest

from moonray.fragments import NBYTES, row_payload_bytes
from moonray.table import MoonrayTable


def test_row_payload_bytes_counts_binary_plus_fixed():
    t = pa.table({
        "id": pa.array([1, 2], pa.int64()),
        "blob": pa.array([b"x" * 10, b"y" * 100], pa.binary()),
    })
    nb = row_payload_bytes(t).to_pylist()
    assert nb == [18, 108]  # binary length + 8 for the int64


def test_no_nbytes_column_for_thin_tables():
    t = pa.table({"id": pa.array([1], pa.int64())})
    assert row_payload_bytes(t) is None


def test_cluster_produces_byte_balanced_fragments(ray_session, tmp_path):
    import ray.data as rd

    root = str(tmp_path / "tbl")
    schema = pa.schema([("k", pa.int64()), ("zone", pa.int64()),
                        ("payload", pa.binary())])
    t = MoonrayTable.create(root, key_col="k", schema=schema,
                            zone_cols=("zone",), index_partitions=4,
                            rows_per_fragment=256)
    # size ∝ zone: rows at the top of the zone range are 50× heavier
    n = 2048
    rng = np.random.default_rng(7)
    zone = rng.permutation(n)
    size = 20 + (zone * 1000) // n * 50  # 20B … ~50KB, monotone in zone
    data = pa.table({
        "k": pa.array(range(n), pa.int64()),
        "zone": pa.array(zone, pa.int64()),
        "payload": pa.array([bytes([i % 251]) * int(s)
                             for i, s in enumerate(size)], pa.binary()),
    })
    t.bulk_load(rd.from_arrow(data))
    # fragments carry the planner column
    import pyarrow.parquet as pq

    frag_path = t.manifest()["fragments"][0]["path"]
    assert NBYTES in pq.read_schema(f"{root}/{frag_path}").names

    t.cluster(partition_rows=None)
    m = t.manifest()
    sizes = sorted(f["bytes"] for f in m["fragments"])
    assert sum(f["rows"] for f in m["fragments"]) == n
    # equal-BYTE cuts: largest fragment within ~3x of the median even
    # though per-row sizes span 2500x (equal-ROW cuts would give ~20x)
    median = sizes[len(sizes) // 2]
    assert sizes[-1] <= 3.5 * median, sizes
    # rows now skew instead (heavy-payload partitions hold fewer rows)
    rows = sorted(f["rows"] for f in m["fragments"])
    assert rows[0] < rows[-1]
