"""Row-identity modes — the reference's ``IdentityProp`` variants
(src/moonlink/src/row/moonlink_row.rs:270-277):

- ``keys`` with ONE key column  → SinglePrimitiveKey: the index keys on
  the column itself (fast path, the only mode moonray had in r1);
- ``keys`` with MANY key columns → Keys(composite): the index keys on an
  injective string encoding of the tuple (``_ckey``), computed on the
  fly per batch and never persisted in data fragments;
- ``full_row``                   → FullRow: every column is a key column
  (identity = the whole row);
- ``none``                       → None: rows have NO identity — the
  table is append-only, deletes/updates are forbidden
  (src/moonlink/src/storage/mooncake_table.rs:129-139) and no key index
  is maintained.

The encoding is exact (escaped separator join of per-column string
casts), so probes compare true tuple equality — no hash-collision
identity false-positives. Key columns must be non-null.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

CKEY = "_ckey"
_SEP = "\x1f"

IDENTITIES = ("keys", "full_row", "none")


def resolve_identity(identity: str, key_col, key_cols, schema: pa.Schema):
    """create()-time resolution → (identity, key_cols, index_key_col)."""
    if identity not in IDENTITIES:
        raise ValueError(f"identity must be one of {IDENTITIES}, got {identity!r}")
    if identity == "none":
        if key_col or key_cols:
            raise ValueError("identity='none' tables have no key columns")
        return identity, [], None
    if identity == "full_row":
        if key_col or key_cols:
            raise ValueError("identity='full_row' keys on every column; "
                             "don't pass key_col/key_cols")
        cols = list(schema.names)
    else:
        if key_col and key_cols:
            raise ValueError("pass key_col OR key_cols, not both")
        cols = list(key_cols) if key_cols else ([key_col] if key_col else [])
        if not cols:
            raise ValueError("identity='keys' needs key_col or key_cols")
    missing = [c for c in cols if c not in schema.names]
    if missing:
        raise ValueError(f"key columns not in schema: {missing}")
    index_key = cols[0] if len(cols) == 1 else CKEY
    return identity, cols, index_key


def key_cols_of(m: dict) -> list[str]:
    kc = m.get("key_cols")
    if kc is not None:
        return list(kc)
    return [m["key_col"]] if m.get("key_col") else []


def identity_of(m: dict) -> str:
    return m.get("identity", "keys")


def is_composite(m: dict) -> bool:
    return m.get("key_col") == CKEY


def _col_to_string(col) -> pa.Array:
    """One key column → an injective string form, per type:

    - binary / fixed-size-binary → lowercase hex (a cast to string
      would require valid UTF-8 and is not injective across escapes);
    - struct → polars json_encode (vectorized, field-order stable
      because the Arrow type fixes field order);
    - list → per-row JSON (Python loop — list-typed KEY columns are a
      rare modelling choice and the reference also hashes such rows
      value-by-value, column_array_builder.rs's Array arm);
    - temporal / decimal / numeric / string → Arrow cast to string
      (ISO dates/timestamps, canonical decimal digits).
    """
    t = col.type
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if (pa.types.is_binary(t) or pa.types.is_large_binary(t)
            or pa.types.is_fixed_size_binary(t)):
        import polars as pl

        return pl.from_arrow(col).bin.encode("hex").to_arrow() \
            .cast(pa.string())
    if pa.types.is_struct(t):
        import polars as pl

        return pl.from_arrow(col).struct.json_encode().to_arrow() \
            .cast(pa.string())
    if pa.types.is_list(t) or pa.types.is_large_list(t) \
            or pa.types.is_fixed_size_list(t):
        import json

        return pa.array([None if v is None else json.dumps(v)
                         for v in col.to_pylist()], pa.string())
    return pc.cast(col, pa.string())


def encode_key_column(batch: pa.Table, key_cols: list[str]) -> pa.Array:
    """Injective composite-key encoding: per column cast to an
    injective string form (_col_to_string), escape (ESC doubled,
    SEP → ESC+'s'), join with SEP. Vectorized Arrow kernels
    throughout (except list-typed key columns, documented above)."""
    parts = []
    for c in key_cols:
        s = _col_to_string(batch[c])
        s = pc.replace_substring(s, "\\", "\\\\")
        s = pc.replace_substring(s, _SEP, "\\s")
        parts.append(s)
    if len(parts) == 1:
        return parts[0]
    return pc.binary_join_element_wise(*parts, _SEP)


def append_ckey(batch: pa.Table, key_cols: list[str]) -> pa.Table:
    """Append the ``_ckey`` identity column (idempotent)."""
    if CKEY in batch.column_names:
        return batch
    return batch.append_column(CKEY, encode_key_column(batch, key_cols))


def with_identity_key(ds, m: dict):
    """Dataset → Dataset carrying the table's index key column: a no-op
    for single-column keys, an appended ``_ckey`` map for composite."""
    if not is_composite(m):
        return ds
    cols = key_cols_of(m)

    def add(b: pa.Table) -> pa.Table:
        return append_ckey(b, cols)

    add.__name__ = "append_ckey"
    return ds.map_batches(add, batch_format="pyarrow")
