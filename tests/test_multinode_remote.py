"""The real deployment shape, simulated end-to-end: a 2-node Ray
cluster (separate raylets + object stores) driving a table whose root
is an HTTP object store (s3test:// — the S3 conditional-write
protocol). Publishes are HTTP PUTs from workers on both nodes; reads
go through each worker's local file cache; the commit plane is
conditional-PUT + CAS pointer. Scan output must be byte-identical to
the same job against a local root on a single node.

Runs in a fresh subprocess (own Ray + cluster lifecycle)."""

import json
import subprocess
import sys
import textwrap


def test_remote_root_on_two_nodes(tmp_path):
    script = textwrap.dedent("""
        import hashlib, json, os, shutil, sys
        os.environ.pop("RAY_ADDRESS", None)
        import pyarrow as pa
        import ray
        workdir = sys.argv[1]

        def digest(ds, key):
            parts = list(ds.iter_batches(batch_format="pyarrow",
                                         batch_size=4096))
            tbl = pa.concat_tables(parts).sort_by(key).combine_chunks()
            sink = pa.BufferOutputStream()
            with pa.ipc.new_stream(sink, tbl.schema) as w:
                w.write_table(tbl)
            return (hashlib.sha256(sink.getvalue().to_pybytes())
                    .hexdigest(), tbl.num_rows)

        def drive(root):
            from moonray import MoonrayTable
            from moonray.fixtures import (IMAGE_SCHEMA,
                                          make_changes_dataset,
                                          make_images_dataset)
            t = MoonrayTable.create(root, key_col="image_id",
                                    schema=IMAGE_SCHEMA,
                                    zone_cols=("phash", "w", "h"),
                                    index_partitions=4,
                                    rows_per_fragment=128)
            t.bulk_load(make_images_dataset(400, seed=11))
            t.merge(make_changes_dataset(250, 400, seed=11),
                    job_id="mnr-merge")
            t.optimize("full")
            d, n = digest(t.scan(), "image_id")
            lk = t.lookup([f"img-{i:012d}" for i in (3, 7)]).num_rows
            return d, n, lk

        # single node, local root — the reference run
        ray.init(address="local", num_cpus=4, include_dashboard=False,
                 logging_level="ERROR")
        ray.data.DataContext.get_current().enable_progress_bars = False
        d1, n1, lk1 = drive(f"{workdir}/local")
        ray.shutdown()

        # two nodes, HTTP object-store root
        from ray.cluster_utils import Cluster
        cluster = Cluster(initialize_head=True, head_node_args={
            "num_cpus": 2, "include_dashboard": False,
            "object_store_memory": 1_000_000_000})
        cluster.add_node(num_cpus=2, object_store_memory=1_000_000_000)
        ray.init(address=cluster.address, logging_level="ERROR")
        ray.data.DataContext.get_current().enable_progress_bars = False
        from moonray.s3http import S3HttpServer
        from moonray.storage import scratch_for
        srv = S3HttpServer()
        root = srv.root("imgs")
        try:
            alive = len([n for n in ray.nodes() if n["Alive"]])
            d2, n2, lk2 = drive(root)
            with srv.bucket.lock:
                n_objects = len(srv.bucket.objects)
        finally:
            shutil.rmtree(scratch_for(root), ignore_errors=True)
            ray.shutdown()
            cluster.shutdown()
            srv.shutdown()
        print(json.dumps({"single": d1, "multi": d2, "n1": n1,
                          "n2": n2, "lk1": lk1, "lk2": lk2,
                          "alive": alive, "n_objects": n_objects}))
    """)
    p = subprocess.run([sys.executable, "-c", script, str(tmp_path)],
                       capture_output=True, timeout=540,
                       cwd="/root/repo")
    assert p.returncode == 0, p.stderr.decode()[-4000:]
    out = json.loads(p.stdout.decode().strip().splitlines()[-1])
    assert out["alive"] == 2
    assert out["n_objects"] > 0, "nothing reached the HTTP store"
    assert out["n1"] == out["n2"] > 0
    # (a change-set delete may drop one of the probed keys — parity
    # with the single-node run is the invariant)
    assert out["lk1"] == out["lk2"] >= 1
    assert out["single"] == out["multi"], \
        "2-node remote-root scan diverged from single-node local-root"


def test_remote_root_two_nodes_under_chaos(tmp_path):
    """All three deployment axes at once: 2-node cluster, HTTP
    object-store root, seeded IO fault injection on the shared chaos
    plane. The merge + maintenance result must be chaos-free-identical
    and faults must demonstrably fire in the cluster's workers."""
    script = textwrap.dedent("""
        import hashlib, json, os, shutil, sys
        os.environ.pop("RAY_ADDRESS", None)
        import pyarrow as pa
        import ray
        workdir = sys.argv[1]

        def digest(ds, key):
            parts = list(ds.iter_batches(batch_format="pyarrow",
                                         batch_size=4096))
            tbl = pa.concat_tables(parts).sort_by(key).combine_chunks()
            sink = pa.BufferOutputStream()
            with pa.ipc.new_stream(sink, tbl.schema) as w:
                w.write_table(tbl)
            return hashlib.sha256(sink.getvalue().to_pybytes()).hexdigest()

        def drive(root):
            from moonray import MoonrayTable
            from moonray.fixtures import (IMAGE_SCHEMA,
                                          make_changes_dataset,
                                          make_images_dataset)
            t = MoonrayTable.create(root, key_col="image_id",
                                    schema=IMAGE_SCHEMA,
                                    zone_cols=("phash",),
                                    index_partitions=4,
                                    rows_per_fragment=128)
            t.bulk_load(make_images_dataset(300, seed=13))
            t.merge(make_changes_dataset(200, 300, seed=13),
                    job_id="mnc-merge")
            t.optimize("full")
            return digest(t.scan(), "image_id")

        ray.init(address="local", num_cpus=4, include_dashboard=False,
                 logging_level="ERROR")
        ray.data.DataContext.get_current().enable_progress_bars = False
        d_clean = drive(f"{workdir}/local")
        ray.shutdown()

        from ray.cluster_utils import Cluster
        cluster = Cluster(initialize_head=True, head_node_args={
            "num_cpus": 2, "include_dashboard": False,
            "object_store_memory": 1_000_000_000})
        cluster.add_node(num_cpus=2, object_store_memory=1_000_000_000)
        ray.init(address=cluster.address, logging_level="ERROR")
        ray.data.DataContext.get_current().enable_progress_bars = False
        from moonray import chaos
        from moonray.s3http import S3HttpServer
        from moonray.storage import scratch_for
        srv = S3HttpServer()
        root = srv.root("imgs")
        sc = scratch_for(root)
        with open(os.path.join(sc, "CHAOS.json"), "w") as f:
            json.dump({"seed": 7, "read_error_prob": 0.3,
                       "write_error_prob": 0.3,
                       "commit_error_prob": 0.3,
                       "partial_fetch_prob": 0.4,
                       "delay_ms": [0, 2]}, f)
        try:
            d_chaos = drive(root)
            fired = chaos.fired_count(root)
        finally:
            shutil.rmtree(sc, ignore_errors=True)
            ray.shutdown()
            cluster.shutdown()
            srv.shutdown()
        print(json.dumps({"clean": d_clean, "chaos": d_chaos,
                          "fired": fired}))
    """)
    p = subprocess.run([sys.executable, "-c", script, str(tmp_path)],
                       capture_output=True, timeout=540,
                       cwd="/root/repo")
    assert p.returncode == 0, p.stderr.decode()[-4000:]
    out = json.loads(p.stdout.decode().strip().splitlines()[-1])
    assert out["fired"] > 0, "no fault fired on the cluster"
    assert out["clean"] == out["chaos"], \
        "chaos on the 2-node HTTP deployment changed the result"
