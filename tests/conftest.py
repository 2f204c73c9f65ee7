import os

import pytest
import ray

# enforce the chunk-ref invariant (manifest._CHUNK_REF_CACHE: core
# fragment entries are a pure function of fragment id) on every commit
# made by the suite — zero production cost, full verification in tests
os.environ.setdefault("MOONRAY_MANIFEST_PARANOID", "1")


@pytest.fixture(scope="session", autouse=True)
def ray_session():
    # workers at nice 0, not Ray's default 15 — see bench._init_ray
    os.environ.setdefault("RAY_worker_niceness", "0")
    ray.init(address="local", num_cpus=4, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    ctx = ray.data.DataContext.get_current()
    ctx.enable_progress_bars = False
    yield
    ray.shutdown()
