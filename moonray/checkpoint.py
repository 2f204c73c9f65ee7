"""Per-job lineage / checkpoint log — the WAL-flavored piece.

The reference persists a WAL and replays it after a crash
(src/moonlink/src/storage/wal.rs; recovery from max(iceberg LSN, WAL
LSN) at src/moonlink/src/table_handler.rs:132-148). For a batch engine
the equivalent is a *lineage log*: each job appends JSONL records
``{job, stage, unit, status, counters}`` under ``lineage/{job}.jsonl``
and drops stage-done markers under ``staging/{job}/``. Resume rules:

- a job whose version is already committed (manifest carries ``job_id``)
  is a no-op on re-run;
- a completed stage is skipped — its outputs are read back from the
  marker (stage granularity for merge; *fragment-group granularity* for
  compaction, whose tasks check per-group done markers, satisfying the
  north rule's fragment-granular resume);
- an incomplete stage's partial files are invisible (manifest-gated) and
  simply overwritten/ignored.

The counters recorded here (rows merged, fragments written, bytes
scanned, stage wall-time) double as the metrics requirement (reference
observability analogue: src/moonlink/src/observability/).
"""

from __future__ import annotations

import json
import os
import time

from moonray.util import atomic_write_json, read_json


class LineageLog:
    def __init__(self, root: str, job_id: str):
        self.root = root
        self.job_id = job_id
        from moonray.storage import stage_path

        self.path = stage_path(root, "lineage", f"{job_id}.jsonl")
        os.makedirs(os.path.dirname(self.path), exist_ok=True)
        self._stage_t0: dict[str, float] = {}

    # -- log records -------------------------------------------------
    def record(self, stage: str, status: str, unit: str = "-", **counters) -> None:
        rec = {"job": self.job_id, "stage": stage, "unit": unit,
               "status": status, "t": time.time(), **counters}
        with open(self.path, "a") as f:
            f.write(json.dumps(rec) + "\n")

    def stage_start(self, stage: str) -> None:
        self._stage_t0[stage] = time.time()
        self.record(stage, "start")

    # -- stage-done markers (resume) ---------------------------------
    def _marker(self, stage: str) -> str:
        from moonray.storage import stage_path

        return stage_path(self.root, "staging", self.job_id,
                          f"stage-{stage}.done.json")

    def stage_done(self, stage: str, outputs: dict | None = None) -> None:
        os.makedirs(os.path.dirname(self._marker(stage)), exist_ok=True)
        atomic_write_json(self._marker(stage), outputs or {})
        dt = time.time() - self._stage_t0.pop(stage, time.time())
        self.record(stage, "done", wall_sec=round(dt, 4), **(outputs or {}).get("counters", {}))

    def stage_outputs(self, stage: str) -> dict | None:
        """Outputs of a previously completed stage, or None."""
        p = self._marker(stage)
        if os.path.exists(p):
            return read_json(p)
        return None

    def read_all(self) -> list[dict]:
        if not os.path.exists(self.path):
            return []
        with open(self.path) as f:
            return [json.loads(line) for line in f if line.strip()]
