"""Per-fragment bloom-filter column indexes (secondary, non-key).

The key index (keyindex.py) serves point reads on the PRIMARY key; an
equality / IN-list predicate on any other high-cardinality column can
only zone-prune by min/max containment — nearly useless once the table
is clustered on a different axis. This module adds the lakehouse answer
(Delta's bloom-filter file index; Iceberg's puffin blob stats): one
immutable bloom sidecar per fragment per indexed column, consulted at
scan planning to drop fragments that PROVABLY contain none of the
queried values.

Correctness is conservative end-to-end, so the index can never change
results — only I/O:

- a fragment with no sidecar (never indexed, or written after the last
  build) is always kept;
- a bloom hit is "maybe present" (fpp-bounded false positives); the
  exact ``is_in`` filter ALWAYS still runs inside the read tasks
  (table.scan's predicate_in contract);
- sidecars are keyed by the immutable fragment path, so a stale
  ``index.json`` (cached copy on a remote root, concurrent rebuild) is
  still *valid* for every fragment it mentions — staleness only costs
  pruning power, never rows;
- deleted rows stay in their fragment's bloom (false positives only);
  compaction/cluster outputs are new paths → unindexed → kept until the
  next ``build_bloom_index`` round.

Scale: the build is one Ray task per fragment batch reading ONLY the
indexed column; sidecars are ~1.2 KiB per 1k rows at fpp=1% (bits
rounded to a power of two for mask-modulo). The consult ships the
queried values' 64-bit hashes to thin Ray tasks that read sidecars
through the worker file cache — O(fragments/chunk) tasks, each a few
KiB of I/O — and falls back to a driver loop below a small fragment
count. Hashing is ``util.hash_key_array`` (splitmix64 / polars), the
same deterministic lanes the key index uses.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

_GOLD = np.uint64(0x9E3779B97F4A7C15)
_MAX_K = 16
_DISTRIBUTED_MIN_FRAGS = 17  # below this a driver loop beats task launch


def _index_rel(col: str) -> str:
    return f"colindex/{col}/index.json"


def _params(n_rows: int, fpp: float) -> tuple[int, int]:
    n = max(1, int(n_rows))
    bits = -n * math.log(fpp) / (math.log(2) ** 2)
    bits = max(64, 1 << int(math.ceil(math.log2(bits))))
    k = max(1, round(bits / n * math.log(2)))
    return bits, min(k, _MAX_K)


def _h2(h64: np.ndarray) -> np.ndarray:
    from moonray.util import splitmix64

    return splitmix64(h64 ^ _GOLD) | np.uint64(1)


def _build_bits(h64: np.ndarray, bits: int, k: int) -> bytes:
    bs = np.zeros(bits // 8, np.uint8)
    h2 = _h2(h64)
    mask = np.uint64(bits - 1)
    for j in range(k):
        pos = (h64 + np.uint64(j) * h2) & mask
        np.bitwise_or.at(bs, (pos >> np.uint64(3)).astype(np.int64),
                         (np.uint64(1) << (pos & np.uint64(7)))
                         .astype(np.uint8))
    return bs.tobytes()


def _any_maybe(bloom: bytes, h64: np.ndarray, bits: int, k: int) -> bool:
    """True iff at least one queried hash has all k bits set. A
    truncated/corrupt bloom (fewer bytes than bits/8) degrades to
    True — the module invariant is that the index may only ever
    change I/O, never results."""
    bs = np.frombuffer(bloom, np.uint8)
    if bits <= 0 or len(bs) * 8 < bits:
        return True
    h2 = _h2(h64)
    mask = np.uint64(bits - 1)
    alive = np.ones(len(h64), bool)
    for j in range(k):
        pos = (h64[alive] + np.uint64(j) * h2[alive]) & mask
        hit = (bs[(pos >> np.uint64(3)).astype(np.int64)]
               >> (pos & np.uint64(7)).astype(np.uint8)) & 1
        nxt = np.zeros(len(h64), bool)
        nxt[np.flatnonzero(alive)[hit.astype(bool)]] = True
        alive = nxt
        if not alive.any():
            return False
    return True


def _hash_values(values, typ: pa.DataType) -> np.ndarray:
    import pyarrow.compute as pc

    arr = values if isinstance(values, (pa.Array, pa.ChunkedArray)) \
        else pa.array(list(values), typ)
    if arr.type != typ:
        arr = arr.cast(typ)
    arr = pc.drop_null(arr)
    from moonray.util import hash_key_array

    return hash_key_array(arr) if len(arr) else np.array([], np.uint64)


def load_index(root: str, col: str) -> dict | None:
    """The column's index manifest, or None. Read through the worker
    file cache on remote roots — a stale copy is correctness-safe (see
    module docstring), so no freshness machinery is needed."""
    import json

    from moonray.filecache import data_path

    try:
        with open(data_path(root, _index_rel(col))) as f:
            return json.load(f)
    except (FileNotFoundError, OSError):
        return None


# ---- sidecar format: | magic MRCB2 | u32 hdr_len | hdr json | payload |
# hdr = {"frag": [bits, k, off, len], "rgs": [[bits, k, off, len], ...]}
# One fragment-level bloom (planner prune) + one bloom PER PARQUET ROW
# GROUP (in-task prune): a production 512 MiB fragment has several row
# groups, and an unclustered equality predicate otherwise reads all of
# them — rg stats can't prune what min/max don't order.

_MAGIC = b"MRCB2"


def _encode_sidecar(frag_bloom: bytes, rg_blooms: list,
                    frag_bits: int, frag_k: int, rg_params: list) -> bytes:
    import json

    payload = bytearray(frag_bloom)
    rgs = []
    for (bits, k), blm in zip(rg_params, rg_blooms):
        rgs.append([bits, k, len(payload), len(blm)])
        payload += blm
    hdr = json.dumps({"frag": [frag_bits, frag_k, 0, len(frag_bloom)],
                      "rgs": rgs}).encode()
    return (_MAGIC + len(hdr).to_bytes(4, "little") + hdr + bytes(payload))


def _decode_sidecar(data: bytes) -> tuple[dict, int]:
    """→ (header, payload_offset). Raises ValueError on foreign bytes."""
    import json

    if data[:5] != _MAGIC:
        raise ValueError("not a MRCB2 bloom sidecar")
    n = int.from_bytes(data[5:9], "little")
    hdr = json.loads(data[9:9 + n])
    return hdr, 9 + n


def rgs_maybe(sidecar: bytes, h64: np.ndarray, rg_indices) -> list:
    """Per-row-group membership: True where some queried hash may be
    present. Unknown row groups (index beyond the sidecar) and corrupt
    entries stay True."""
    hdr, off = _decode_sidecar(sidecar)
    rgs = hdr["rgs"]
    out = []
    for g in rg_indices:
        if g >= len(rgs):
            out.append(True)
            continue
        try:
            bits, k, o, ln = rgs[g]
            out.append(_any_maybe(sidecar[off + o:off + o + ln],
                                  h64, bits, k))
        except Exception:  # noqa: BLE001
            out.append(True)
    return out


def list_indexed_columns(root: str) -> list[str]:
    """Columns with a bloom index under this root (the colindex/
    directory's immediate children that hold an index.json)."""
    import os

    from moonray.filecache import is_remote

    if is_remote(root):
        from moonray.commitstore import store_for

        rels = store_for(root).list("colindex")
        return sorted({r.split("/")[1] for r in rels
                       if r.endswith("/index.json")
                       and len(r.split("/")) == 3})
    base = os.path.join(root, "colindex")
    try:
        return sorted(c for c in os.listdir(base)
                      if os.path.exists(os.path.join(base, c,
                                                     "index.json")))
    except FileNotFoundError:
        return []


def build_bloom_index(table, col: str, *, fpp: float | None = None,
                      batch_frags: int = 16) -> dict:
    """(Re)build the bloom index for ``col``: one Ray task per
    ``batch_frags`` fragments lacking a sidecar, each reading only the
    indexed column. The refreshed ``index.json`` lists exactly the
    current manifest's live fragments (dead entries drop; their sidecar
    files are GC'd). ``fpp=None`` keeps a prior index's fpp (0.01 for a
    first build). Returns a summary dict."""
    import ray

    from moonray.storage import publish_bytes

    schema = table.schema()
    if col not in schema.names:
        raise ValueError(f"no column {col!r} in table schema")
    m = table.manifest()
    frags = m["fragments"]
    prior = load_index(table.root, col) or {"frags": {}}
    if fpp is None:
        fpp = float(prior.get("fpp", 0.01))
    have = prior["frags"]
    todo = [f for f in frags if f["path"] not in have]

    @ray.remote(num_cpus=1)
    def _index_batch(root, col, metas, fpp):
        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        from moonray.filecache import data_path
        from moonray.util import hash_key_array

        out = {}
        for f in metas:
            pf = pq.ParquetFile(data_path(root, f["path"]),
                                memory_map=True, pre_buffer=False)
            rg_blooms, rg_params, frag_hashes = [], [], []
            for g in range(pf.num_row_groups):
                vals = pc.drop_null(
                    pf.read_row_group(g, columns=[col])[col]
                    .combine_chunks())
                h = hash_key_array(vals) if len(vals) else \
                    np.array([], np.uint64)
                bits, k = _params(len(vals), fpp)
                rg_blooms.append(_build_bits(h, bits, k))
                rg_params.append((bits, k))
                frag_hashes.append(h)
            allh = (np.concatenate(frag_hashes) if frag_hashes
                    else np.array([], np.uint64))
            fbits, fk = _params(len(allh), fpp)
            rel = f"colindex/{col}/{f['path'].replace('/', '_')}.bloom"
            publish_bytes(root, rel, _encode_sidecar(
                _build_bits(allh, fbits, fk), rg_blooms, fbits, fk,
                rg_params))
            out[f["path"]] = {"bloom": rel, "bits": fbits, "k": fk}
        return out

    refs = [_index_batch.remote(table.root, col,
                                todo[i:i + batch_frags], fpp)
            for i in range(0, len(todo), batch_frags)]
    built: dict = {}
    for r in ray.get(refs):
        built.update(r)

    live = {f["path"] for f in frags}
    entries = {p: e for p, e in {**have, **built}.items() if p in live}
    if not built and entries == have:
        # steady state (a maintenance tick on a quiet table): nothing
        # built, nothing dropped — skip the index.json republish
        return {"col": col, "built": 0, "indexed": len(entries),
                "fragments": len(frags), "gc_sidecars": 0}
    import json

    publish_bytes(table.root, _index_rel(col), json.dumps(
        {"col": col, "fpp": fpp, "frags": entries},
        sort_keys=True).encode())
    # GC sidecars of fragments no longer in the manifest — strictly
    # AFTER the new index.json is live. A stale cached index referencing
    # a GC'd sidecar degrades to keep-the-fragment (see _maybe_local).
    dropped = 0
    for p, e in have.items():
        if p not in live:
            _delete_sidecar(table.root, e["bloom"])
            dropped += 1
    return {"col": col, "built": len(built), "indexed": len(entries),
            "fragments": len(frags), "gc_sidecars": dropped}


def _delete_sidecar(root: str, rel: str) -> None:
    import os

    from moonray.filecache import is_remote

    if is_remote(root):
        from moonray.commitstore import store_for

        try:
            store_for(root).delete(rel)
        except FileNotFoundError:
            pass
        return
    try:
        os.unlink(os.path.join(root, rel))
    except FileNotFoundError:
        pass


def scan_plan(root: str, frags: list, predicate_in: dict,
              schema: pa.Schema) -> tuple[list, dict | None]:
    """Fragment-level bloom pruning + the in-task consult plan:
    → (surviving fragments, {col: (entries_by_path, value_hashes)} for
    indexed predicate columns — what read tasks need to ALSO prune row
    groups inside their fragment). Both conservative."""
    info = _load_info(root, predicate_in, schema)
    return _prune_with_info(root, frags, info), (info or None)


def _load_info(root: str, predicate_in: dict, schema: pa.Schema) -> dict:
    """One index.json load + one value-hash per indexed predicate
    column → {col: (entries_by_path, value_hashes)}."""
    info: dict = {}
    for col, values in predicate_in.items():
        if col not in schema.names:
            continue
        idx = load_index(root, col)
        if not idx or not idx.get("frags"):
            continue
        h = _hash_values(values, schema.field(col).type)
        if len(h):
            info[col] = (idx["frags"], h)
    return info


def prune_fragments(root: str, frags: list, predicate_in: dict,
                    schema: pa.Schema) -> list:
    """Drop fragments whose bloom proves NO queried value can be
    present, for every predicate_in column that has an index.
    Conservative: unindexed columns/fragments keep everything."""
    return _prune_with_info(root, frags,
                            _load_info(root, predicate_in, schema))


def _prune_with_info(root: str, frags: list, info: dict) -> list:
    import ray

    for _col, (entries, h) in info.items():
        if len(frags) == 0:
            break
        candidates = [(i, entries[f["path"]]) for i, f in enumerate(frags)
                      if f["path"] in entries]
        if not candidates:
            continue
        if len(candidates) < _DISTRIBUTED_MIN_FRAGS:
            keep_idx = {
                i for i, e in candidates
                if _maybe_local(root, e, h)}
        else:
            @ray.remote(num_cpus=0.5)
            def _consult(root, chunk, h):
                return [i for i, e in chunk if _maybe_local(root, e, h)]

            chunk_n = 64
            refs = [_consult.remote(root, candidates[i:i + chunk_n], h)
                    for i in range(0, len(candidates), chunk_n)]
            keep_idx = {i for part in ray.get(refs) for i in part}
        covered = {i for i, _e in candidates}
        frags = [f for i, f in enumerate(frags)
                 if i not in covered or i in keep_idx]
    return frags


def _maybe_local(root: str, entry: dict, h: np.ndarray) -> bool:
    data = read_sidecar(root, entry)
    if data is None:
        return True
    try:
        hdr, off = _decode_sidecar(data)
        bits, k, o, ln = hdr["frag"]
        return _any_maybe(data[off + o:off + o + ln], h, bits, k)
    except Exception:  # noqa: BLE001 — corrupt sidecar degrades to keep
        return True


def read_sidecar(root: str, entry: dict) -> bytes | None:
    """Sidecar bytes through the file cache, or None when missing — a
    stale cached index.json can reference a sidecar a newer build GC'd;
    every consumer degrades to keep."""
    from moonray.filecache import data_path

    try:
        with open(data_path(root, entry["bloom"]), "rb") as f:
            return f.read()
    except (FileNotFoundError, OSError):
        return None
