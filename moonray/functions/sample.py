"""Deterministic stratified sampling — training-data mixture building.

At 100 TB a mixture spec ("30% of en, all of de, half of fr") cannot be
a random_shuffle + limit per stratum (two all-to-alls and a
materialization); it is one stateless vectorized filter: a row survives
iff its key's deterministic draw falls under its stratum's fraction.
Deterministic by key → reproducible mixtures across runs and resumable
jobs, and any subset relation holds (lowering a fraction strictly
shrinks the kept set — nested samples for ablations).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from moonray.util import splitmix64

_DEN = 1_000_000


def stratified_sample(ds, *, strata_col: str, fractions: dict,
                      key_col: str, default_fraction: float = 0.0,
                      sampler: str = "hash"):
    """Keep each row with probability fractions[stratum], decided
    deterministically from its key: ``sampler="hash"`` draws
    splitmix64(key) % 1e6 (unbiased for any key distribution — the
    scale default); ``sampler="modulo"`` draws key % 1e6 (exactly
    reproducible in plain SQL for oracle checks; fine when keys are
    dense/unstructured). Returns the filtered lazy Dataset."""
    if sampler not in ("hash", "modulo"):
        raise ValueError(f"unknown sampler {sampler!r}")
    thresholds = {s: int(np.rint(f * _DEN)) for s, f in fractions.items()}
    default_t = int(np.rint(default_fraction * _DEN))

    def keep(b: pa.Table) -> pa.Table:
        if len(b) == 0:
            return b
        enc = pc.dictionary_encode(b[strata_col].combine_chunks()
                                   if isinstance(b[strata_col], pa.ChunkedArray)
                                   else b[strata_col])
        codes = np.asarray(enc.indices)
        uniq = enc.dictionary.to_pylist()
        per_code = np.array([thresholds.get(u, default_t) for u in uniq],
                            dtype=np.int64)
        thresh = per_code[codes]
        keys = b[key_col].to_numpy(zero_copy_only=False).astype(np.uint64)
        if sampler == "hash":
            draw = (splitmix64(keys) % np.uint64(_DEN)).astype(np.int64)
        else:
            draw = (keys % np.uint64(_DEN)).astype(np.int64)
        return b.filter(pa.array(draw < thresh))

    keep.__name__ = "stratified_sample_filter"
    return ds.map_batches(keep, batch_format="pyarrow")


def stratified_sample_oracle_sql(strata_col: str, fractions: dict,
                                 key_col: str, table: str = "documents",
                                 default_fraction: float = 0.0) -> str:
    """The sampler="modulo" variant as ANSI SQL (same draw, same
    thresholds) — the DuckDB oracle for driver checks."""
    cases = " ".join(
        f"WHEN '{s}' THEN {int(np.rint(f * _DEN))}"
        for s, f in fractions.items())
    return (f"SELECT * FROM {table} WHERE ({key_col} % {_DEN}) < "
            f"CASE {strata_col} {cases} "
            f"ELSE {int(np.rint(default_fraction * _DEN))} END")
