"""fsck — table-integrity verification, metadata-fast and data-deep.

The ops tool a 100 TB deployment runs after an incident (partial GC, a
bad copy job, bit-rot on cheap storage): verify that what the manifest
CLAIMS matches what the files HOLD, without trusting either side. The
reference verifies identity at the row level on every probe
(equals_parquet_at_offset, src/moonlink/src/row/moonlink_row.rs:214-248)
and validates puffin/DV framing with CRCs on load; fsck is the
whole-table batch form of the same distrust.

Two passes:

- **metadata pass** (driver, O(files) existence stats — no data read):
  every referenced fragment / DV / index file exists; DV refs are
  unique; ``dv_count`` ≤ rows; fully-dead fragments aren't in the
  manifest (the commit path drops them); index partition keys are
  within ``num_partitions``.
- **deep pass** (one Ray task per fragment, reads footers + thin
  columns only — payload columns never move): parquet footer row count
  == manifest ``rows``; DV offsets in-range and deduplicated count ==
  ``dv_count``; zone maps CONTAIN the actual min/max of each zone
  column (a too-narrow zone map silently breaks pruned scans — the
  same invariant delete_where's docstring warns about); key column has
  no nulls (identity requires it).

Returns ``{"ok": bool, "issues": [str, ...], "fragments_checked": n}``
— issues name the fragment/file so an operator can quarantine it.
"""

from __future__ import annotations

import pyarrow as pa


def fsck(table, *, deep: bool = True, concurrency=None) -> dict:
    from moonray import manifest as mf
    from moonray.commitstore import store_for
    from moonray.dv import dv_paths_of
    from moonray.identity import key_cols_of

    m = table.manifest()
    store = store_for(table.root)
    issues: list[str] = []

    # ---- metadata pass ----
    seen_dv: dict[str, str] = {}
    for f in m["fragments"]:
        fid = f["id"]
        if not _ref_exists(store, table.root, f["path"]):
            issues.append(f"fragment {fid}: missing file {f['path']}")
        if f["dv_count"] > f["rows"]:
            issues.append(f"fragment {fid}: dv_count {f['dv_count']} > "
                          f"rows {f['rows']}")
        elif f["dv_count"] == f["rows"]:
            issues.append(f"fragment {fid}: fully dead but still in the "
                          "manifest (commit path should have dropped it)")
        for rel in dv_paths_of(f):
            if rel in seen_dv:
                issues.append(f"fragment {fid}: DV ref {rel} already "
                              f"referenced by fragment {seen_dv[rel]}")
            seen_dv[rel] = fid
            if not _ref_exists(store, table.root, rel):
                issues.append(f"fragment {fid}: missing DV file {rel}")
    n_parts = m["index"]["num_partitions"]
    for p, rels in m["index"]["partitions"].items():
        if not (0 <= int(p) < n_parts):
            issues.append(f"index partition {p} outside num_partitions "
                          f"{n_parts}")
        for rel in rels:
            if not _ref_exists(store, table.root, rel):
                issues.append(f"index partition {p}: missing file {rel}")

    if not deep or not m["fragments"]:
        return {"ok": not issues, "issues": issues,
                "fragments_checked": 0 if not deep else len(m["fragments"])}

    # ---- deep pass: one task per fragment, thin columns only ----
    import ray
    import ray.data as rd

    root = table.root
    zone_cols = list(m.get("zone_cols", []))
    kcols = key_cols_of(m)
    units = [{"id": f["id"], "path": f["path"], "rows": f["rows"],
              "dv_count": f["dv_count"], "dv": dv_paths_of(f),
              "zones": f.get("zones", {})} for f in m["fragments"]]

    def check_fragment(batch: pa.Table) -> pa.Table:
        import json as _json

        import numpy as np
        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        from moonray.dv import load_dv_union
        from moonray.filecache import data_path

        out = []
        for u in batch.to_pylist():
            fid = u["id"]
            try:
                pf = pq.ParquetFile(data_path(root, u["path"]))
            except Exception as ex:  # unreadable counts as an issue
                out.append(f"fragment {fid}: unreadable parquet: {ex}")
                continue
            n = pf.metadata.num_rows
            if n != u["rows"]:
                out.append(f"fragment {fid}: footer rows {n} != manifest "
                           f"rows {u['rows']}")
            dv = load_dv_union(root, list(u["dv"]))
            if len(dv) != u["dv_count"]:
                out.append(f"fragment {fid}: DV union size {len(dv)} != "
                           f"dv_count {u['dv_count']}")
            if len(dv) and int(dv.max()) >= u["rows"]:
                out.append(f"fragment {fid}: DV offset {int(dv.max())} out "
                           f"of range (rows {u['rows']})")
            want = [c for c in set(zone_cols) | set(kcols)
                    if c in pf.schema_arrow.names]
            if want:
                t = pf.read(columns=want)
                # recompute in the same ENCODED domain the zone maps
                # persist (moonray/types.py) — comparing natural
                # date/decimal/bytes values against encoded zones
                # either crashes (TypeError) or goes vacuous
                from moonray.types import compute_zones_typed

                actual = compute_zones_typed(t, zone_cols)
                for c in zone_cols:
                    z = u["zones"].get(c)
                    a = actual.get(c)
                    if not z or a is None or len(t) == 0:
                        continue
                    lo, hi = a
                    if (z[0] is not None and lo is not None and lo < z[0]) \
                            or (z[1] is not None and hi is not None
                                and hi > z[1]):
                        out.append(
                            f"fragment {fid}: zone map for {c} "
                            f"[{z[0]}, {z[1]}] does not contain actual "
                            f"[{lo}, {hi}] — pruned scans would drop rows")
                for c in kcols:
                    if c in t.column_names and t[c].null_count:
                        out.append(f"fragment {fid}: key column {c} has "
                                   f"{t[c].null_count} nulls")
        return pa.table({"issue": pa.array(out, pa.string())})

    check_fragment.__name__ = "fsck_fragment"
    found = rd.from_items(units, override_num_blocks=len(units)).map_batches(
        check_fragment, batch_format="pyarrow", batch_size=4,
        concurrency=concurrency)
    issues += [r["issue"] for r in found.take_all()]
    return {"ok": not issues, "issues": sorted(issues),
            "fragments_checked": len(units)}


def _ref_exists(store, root: str, rel: str) -> bool:
    from moonray.filecache import split_ext_ref

    ext = split_ext_ref(rel)
    if ext is not None:
        # externally-rooted ref (shallow clone): check at its own root
        from moonray.commitstore import store_for

        return _ref_exists(store_for(ext[0]), ext[0], ext[1])
    return store.exists(rel)
