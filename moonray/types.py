"""Extended-type support: the engine's value-domain conversions.

The reference's ingest data model spans the full parquet-logical
palette — Decimal(i128), Date32, Time64(µs), Timestamp canonicalized
to UTC µs, FixedLenByteArray[16] (UUID), Array, Struct
(src/moonlink/src/row/moonlink_type.rs:5-21; the match-arm coverage of
src/moonlink/src/row/column_array_builder.rs). moonray stores schemas
as Arrow IPC and fragments as parquet, so STORAGE is full-fidelity for
free; what needs explicit support is every place a VALUE leaves Arrow:

- zone maps (JSON sidecars/manifests) — ``zone_encode_value`` maps each
  orderable scalar type to an ORDER-PRESERVING JSON primitive, so the
  planner's pruning compares (plain ``<=`` in _zones_overlap /
  _zones_contain_any) stay type-blind:
    decimal(p,s)   → unscaled int  (fixed scale ⇒ order-preserving;
                      JSON ints are arbitrary-precision in Python)
    date32         → epoch days int
    timestamp(µs)  → epoch µs int (tz-aware canonicalized to UTC)
    time64(µs)     → µs-from-midnight int
    binary / FSB   → lowercase hex str (fixed 2 chars per byte ⇒
                      lexicographic order matches bytes order)
    int/float/str/bool → as-is
  Nested types (list/struct/map) have no total order → no zone entry.
- predicate bounds — ``bound_encoded`` puts a user-supplied bound into
  the same JSON domain for planning; ``bound_natural`` yields the
  natural Python value Arrow kernels compare against in-task
  (pc.greater_equal, parquet filters=, is_in). Accepted spellings per
  type: native Python objects, ints in the encoded domain, and ISO /
  digit strings.
- converters — ``coerce_value`` maps a parsed-JSON value (or Avro
  decoded primitive) onto a typed field, recursively for nested types.

Iceberg/Delta export serialization for these types lives with the
sinks (single-value bounds: sinks/iceberg._single_value_bytes).
"""

from __future__ import annotations

import datetime as _dt
import decimal as _dec

import pyarrow as pa
import pyarrow.compute as pc

_EPOCH_DATE = _dt.date(1970, 1, 1)
_EPOCH_DT = _dt.datetime(1970, 1, 1)
_EPOCH_DT_UTC = _dt.datetime(1970, 1, 1, tzinfo=_dt.timezone.utc)


def is_nested(t: pa.DataType) -> bool:
    return (pa.types.is_list(t) or pa.types.is_large_list(t)
            or pa.types.is_fixed_size_list(t) or pa.types.is_struct(t)
            or pa.types.is_map(t))


def is_zoneable(t: pa.DataType) -> bool:
    """Types with a total order the zone maps can exploit."""
    return not (is_nested(t) or pa.types.is_null(t))


def _is_binary_like(t: pa.DataType) -> bool:
    return (pa.types.is_binary(t) or pa.types.is_large_binary(t)
            or pa.types.is_fixed_size_binary(t))


_ONE_US = _dt.timedelta(microseconds=1)


def _ts_to_us(v, t: pa.DataType) -> int:
    # exact integer µs via timedelta floor-division — float
    # total_seconds() loses ±1 µs above ~2^53 µs (year ~2255 /
    # large pre-1970 negatives), enough to mis-prune a fragment
    # whose zone boundary equals the true bound
    if isinstance(v, (int,)):
        return int(v)
    if isinstance(v, str):
        v = _dt.datetime.fromisoformat(v)
    if v.tzinfo is not None:
        return (v - _EPOCH_DT_UTC) // _ONE_US
    return (v - _EPOCH_DT) // _ONE_US


def zone_encode_value(v, t: pa.DataType):
    """Natural Python value (``Scalar.as_py()``) → order-preserving
    JSON primitive. None passes through."""
    if v is None:
        return None
    if pa.types.is_decimal(t):
        return int(_dec.Decimal(v).scaleb(t.scale))
    if pa.types.is_date(t):
        if isinstance(v, int):
            return v
        return (v - _EPOCH_DATE).days
    if pa.types.is_timestamp(t):
        return _ts_to_us(v, t)
    if pa.types.is_time(t):
        if isinstance(v, int):
            return v
        return ((v.hour * 3600 + v.minute * 60 + v.second) * 1_000_000
                + v.microsecond)
    if _is_binary_like(t):
        return v.hex() if isinstance(v, (bytes, bytearray)) else str(v)
    return v


def bound_encoded(v, t: pa.DataType):
    """User-supplied predicate bound → the zone-JSON domain (the same
    encoding zone_encode_value produced at write time)."""
    if v is None:
        return None
    if pa.types.is_decimal(t):
        d = v if isinstance(v, _dec.Decimal) else _dec.Decimal(str(v))
        # quantize to the column scale with directional safety left to
        # the caller: bounds compare inclusively and a sub-scale bound
        # is itself a modelling error, so plain scaleb + to-int
        return int(d.scaleb(t.scale))
    if pa.types.is_date(t):
        return zone_encode_value(_coerce_date(v), t)
    if pa.types.is_timestamp(t):
        return _ts_to_us(v if not isinstance(v, str)
                         else _dt.datetime.fromisoformat(v), t)
    if pa.types.is_time(t):
        return zone_encode_value(_coerce_time(v), t)
    if _is_binary_like(t):
        return v.hex() if isinstance(v, (bytes, bytearray)) else str(v)
    return v


def _coerce_date(v) -> _dt.date:
    if isinstance(v, _dt.date) and not isinstance(v, _dt.datetime):
        return v
    if isinstance(v, _dt.datetime):
        return v.date()
    if isinstance(v, int):
        return _EPOCH_DATE + _dt.timedelta(days=v)
    return _dt.date.fromisoformat(v)


def _coerce_time(v) -> _dt.time:
    if isinstance(v, _dt.time):
        return v
    if isinstance(v, int):  # µs from midnight
        return (_dt.datetime.min + _dt.timedelta(microseconds=v)).time()
    return _dt.time.fromisoformat(v)


def bound_natural(v, t: pa.DataType):
    """User-supplied predicate bound → the natural Python value Arrow
    kernels accept for this column type (pc.greater_equal, parquet
    ``filters=``, pc.is_in value sets)."""
    if v is None:
        return None
    if pa.types.is_decimal(t):
        return v if isinstance(v, _dec.Decimal) else _dec.Decimal(str(v))
    if pa.types.is_date(t):
        return _coerce_date(v)
    if pa.types.is_timestamp(t):
        if isinstance(v, _dt.datetime):
            dt = v
        elif isinstance(v, int):
            dt = _EPOCH_DT + _dt.timedelta(microseconds=v)
        else:
            dt = _dt.datetime.fromisoformat(v)
        if t.tz is not None and dt.tzinfo is None:
            dt = dt.replace(tzinfo=_dt.timezone.utc)
        if t.tz is None and dt.tzinfo is not None:
            dt = dt.astimezone(_dt.timezone.utc).replace(tzinfo=None)
        return dt
    if pa.types.is_time(t):
        return _coerce_time(v)
    if _is_binary_like(t):
        return bytes.fromhex(v) if isinstance(v, str) else bytes(v)
    return v


def normalize_ranges(ranges: dict, schema: pa.Schema) -> dict:
    """{col: (lo, hi)} with every bound in the column's natural domain
    (pass-through for columns not in the schema)."""
    out = {}
    for c, (lo, hi) in ranges.items():
        if c in schema.names:
            t = schema.field(c).type
            out[c] = (bound_natural(lo, t), bound_natural(hi, t))
        else:
            out[c] = (lo, hi)
    return out


def encode_ranges(ranges: dict, schema: pa.Schema) -> dict:
    out = {}
    for c, (lo, hi) in ranges.items():
        if c in schema.names:
            t = schema.field(c).type
            out[c] = (bound_encoded(lo, t), bound_encoded(hi, t))
        else:
            out[c] = (lo, hi)
    return out


def normalize_in(in_sets: dict, schema: pa.Schema) -> dict:
    return {c: ([bound_natural(v, schema.field(c).type) for v in vals]
                if c in schema.names else list(vals))
            for c, vals in in_sets.items()}


def encode_in(in_sets: dict, schema: pa.Schema) -> dict:
    return {c: ([bound_encoded(v, schema.field(c).type) for v in vals]
                if c in schema.names else list(vals))
            for c, vals in in_sets.items()}


# ----------------------------------------------------------- converters


def coerce_value(v, t: pa.DataType):
    """Parsed-JSON (or Avro-decoded) value → what pa.array accepts for
    this field type; recursive for nested types. None passes through;
    type mismatches raise (schema-strict, like the reference's JSON
    converter)."""
    if v is None:
        return None
    if pa.types.is_decimal(t):
        return v if isinstance(v, _dec.Decimal) else _dec.Decimal(str(v))
    if pa.types.is_date(t):
        return _coerce_date(v)
    if pa.types.is_timestamp(t):
        return bound_natural(v, t)
    if pa.types.is_time(t):
        return _coerce_time(v)
    if _is_binary_like(t):
        if isinstance(v, (bytes, bytearray)):
            return bytes(v)
        return bytes.fromhex(v)
    if pa.types.is_list(t) or pa.types.is_large_list(t) \
            or pa.types.is_fixed_size_list(t):
        return [coerce_value(x, t.value_type) for x in v]
    if pa.types.is_struct(t):
        return {f.name: coerce_value(v.get(f.name), f.type) for f in t}
    if pa.types.is_map(t):
        items = v.items() if isinstance(v, dict) else v
        # keys coerce too: map<date32,...> / map<binary,...> arrive
        # from the JSON/Avro converters as strings just like values
        return [(coerce_value(k, t.key_type),
                 coerce_value(x, t.item_type)) for k, x in items]
    return v


def needs_coercion(t: pa.DataType) -> bool:
    """Whether pa.array(parsed_json_values, t) needs coerce_value help
    (extended scalars anywhere in the type tree)."""
    if (pa.types.is_decimal(t) or pa.types.is_date(t)
            or pa.types.is_timestamp(t) or pa.types.is_time(t)
            or _is_binary_like(t)):
        return True
    if pa.types.is_list(t) or pa.types.is_large_list(t) \
            or pa.types.is_fixed_size_list(t):
        return needs_coercion(t.value_type)
    if pa.types.is_struct(t):
        return any(needs_coercion(f.type) for f in t)
    if pa.types.is_map(t):
        return needs_coercion(t.key_type) or needs_coercion(t.item_type)
    return False


def unscaled_to_decimal(unscaled, precision: int, scale: int) -> pa.Array:
    """int64 unscaled values → decimal128(precision, scale), vectorized
    (decimal128 storage is a 128-bit little-endian integer; widen the
    int64 lane with its sign extension — no per-value Python)."""
    import numpy as np

    u = np.ascontiguousarray(np.asarray(unscaled, dtype=np.int64))
    buf = np.empty((len(u), 2), "<i8")
    buf[:, 0] = u
    buf[:, 1] = u >> 63  # sign extension
    return pa.Array.from_buffers(pa.decimal128(precision, scale), len(u),
                                 [None, pa.py_buffer(buf.tobytes())])


def decimal_to_unscaled(col) -> "object":
    """decimal128 column → int64 unscaled values (numpy), the inverse
    of unscaled_to_decimal for |values| < 2^63 — raises on overflow
    rather than wrapping. Raises on nulls: a null slot's storage is
    arbitrary bytes, so decoding it would yield a garbage int — the
    caller must fill/drop nulls first (Arrow has no int64 NaN)."""
    import numpy as np

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if col.null_count:
        raise ValueError(
            "decimal_to_unscaled: column has nulls; null slots decode "
            "as arbitrary ints — fill or drop them first")
    n = len(col)
    raw = np.frombuffer(col.buffers()[1], "<i8",
                        count=2 * (col.offset + n))[2 * col.offset:]
    lo, hi = raw[0::2], raw[1::2]
    if not np.array_equal(hi, lo >> 63):
        raise OverflowError("decimal values exceed int64 unscaled range")
    return lo.copy()


# ------------------------------------------------------------ zone maps


def temporal_storage_int(col, t: pa.DataType):
    """Temporal column → int column in the CANONICAL encoded unit
    (days for dates, µs for times/timestamps) regardless of the
    column's physical unit — the zone/bound/hash domains must agree,
    and date64 (ms) / timestamp(s|ms|ns) / time32(s|ms) store other
    units. Also the one place that knows Arrow's missing direct casts
    (date32→int64, time32→int64 don't exist; go through the canonical
    temporal type first)."""
    if pa.types.is_date(t):
        return pc.cast(pc.cast(col, pa.date32()), pa.int32())
    if pa.types.is_time(t):
        return pc.cast(pc.cast(col, pa.time64("us")), pa.int64())
    if pa.types.is_timestamp(t):
        return pc.cast(pc.cast(col, pa.timestamp("us", tz=t.tz)),
                       pa.int64())
    raise TypeError(f"not a temporal type: {t}")


def compute_zones_typed(table: pa.Table, zone_cols) -> dict:
    """min/max per zone column as order-preserving JSON primitives.
    Temporal columns min/max over their CANONICAL integer view (days /
    µs — one cast, no per-value Python); nested/unorderable columns
    are skipped."""
    zones = {}
    for c in zone_cols:
        if c not in table.column_names or len(table) == 0:
            continue
        t = table.schema.field(c).type
        if not is_zoneable(t):
            continue
        col = table[c]
        if pa.types.is_date(t) or pa.types.is_time(t) \
                or pa.types.is_timestamp(t):
            mm = pc.min_max(temporal_storage_int(col, t))
            zones[c] = [mm["min"].as_py(), mm["max"].as_py()]
        else:
            mm = pc.min_max(col)
            zones[c] = [zone_encode_value(mm["min"].as_py(), t),
                        zone_encode_value(mm["max"].as_py(), t)]
    return zones
