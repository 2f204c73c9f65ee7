"""JSON ingest converters — the analogue of the reference's REST-ingest
row converter (JSON → MoonlinkRow per schema,
src/moonlink_connectors/src/rest_ingest/json_converter.rs, and the
Insert/Upsert/Delete event mapping at moonlink_rest_sink.rs:211-246).

Stays columnar: a batch of JSON strings is parsed once per batch inside
``map_batches`` (stdlib json — the parse loop is the unavoidable
row-wise step the reference also pays), then materialized as typed
Arrow columns. Unknown fields are ignored; missing fields become null;
type mismatches raise (schema-strict, as the reference validates)."""

from __future__ import annotations

import json

import pyarrow as pa


def _typed_array(values: list, typ: pa.DataType) -> pa.Array:
    """pa.array with extended-type coercion: JSON spells decimals as
    digit strings/numbers, dates/timestamps as ISO strings, binary/UUID
    as hex — moonray/types.coerce_value maps them (recursively for
    list/struct/map) onto what the Arrow builder accepts. Flat
    int/float/string/bool schemas skip the per-value pass entirely."""
    from moonray.types import coerce_value, needs_coercion

    if needs_coercion(typ):
        values = [coerce_value(v, typ) for v in values]
    return pa.array(values, typ)


class JsonToRows:
    """map_batches stage: a string column of JSON objects → typed Arrow
    columns per ``schema``. Use for payload extraction from embedded
    JSON columns or for REST-style row ingest."""

    def __init__(self, schema: pa.Schema, json_col: str = "json",
                 keep_cols: tuple[str, ...] = ()):
        self.schema = schema
        self.json_col = json_col
        self.keep_cols = keep_cols

    def __call__(self, batch: pa.Table) -> pa.Table:
        parsed = [json.loads(s) if s else {} for s in
                  batch[self.json_col].to_pylist()]
        cols = {}
        for kc in self.keep_cols:
            cols[kc] = batch[kc]
        for field in self.schema:
            cols[field.name] = _typed_array(
                [p.get(field.name) for p in parsed], field.type)
        return pa.table(cols)


def json_changes(ds, schema: pa.Schema, *, json_col: str = "json"):
    """REST-ingest event stream → CDC change Dataset: each JSON object
    carries ``op`` ("insert" | "upsert" | "delete"), ``lsn``, and the row
    payload; output matches merge_into's contract (op ∈ I/U/D).
    Insert/Upsert both map to upsert semantics (the reference maps
    Upsert ≡ delete_if_exists + Append; our MERGE gives plain Insert the
    same last-writer-wins treatment)."""
    OP_MAP = {"insert": "I", "upsert": "U", "delete": "D"}

    def convert(batch: pa.Table) -> pa.Table:
        parsed = [json.loads(s) for s in batch[json_col].to_pylist()]
        cols = {
            "op": pa.array([OP_MAP[p["op"]] for p in parsed], pa.string()),
            "lsn": pa.array([p["lsn"] for p in parsed], pa.int64()),
        }
        for field in schema:
            cols[field.name] = _typed_array(
                [p.get("row", {}).get(field.name) for p in parsed], field.type)
        return pa.table(cols)

    return ds.map_batches(convert, batch_format="pyarrow")
