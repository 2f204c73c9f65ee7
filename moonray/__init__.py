"""moonray — a Ray-Data-native lakehouse table-maintenance engine.

A from-scratch re-expression of the semantics of the reference engine
(moonlink, an Iceberg-native streaming-upsert ingestion engine — see
SURVEY.md for the structural map) built idiomatically on Ray Data:

- Tables are directories of parquet *fragments* plus versioned JSON
  *manifests* (snapshot isolation by version pinning) — the Lance-style
  layout the north rule asks for, implemented on pyarrow since the
  ``lance`` package is not available in this environment.
- Deletes are *deletion vectors* (sorted row-offset arrays per fragment),
  mirroring moonlink's BatchDeletionVector / Iceberg v3 puffin DVs
  (reference: src/moonlink/src/storage/mooncake_table/delete_vector.rs).
- CDC apply (insert/update/delete, last-writer-wins by LSN) is MERGE INTO:
  a groupby-shuffle dedup + key-index probe (semi join → DV hits, anti
  join → inserts) materialized as ``map_batches`` over zero-copy Arrow.
- Maintenance: bin-packing compaction, Z-order clustering with zone maps,
  index merge, manifest rewrite, snapshot expiry.
"""

from moonray.aggview import build_aggregate_view, sync_aggregate  # noqa: F401
from moonray.catalog import MoonrayCatalog  # noqa: F401
from moonray.clone import clone_table, localize_clone, release_clone  # noqa: F401
from moonray.merge import merge_into  # noqa: F401
from moonray.stream import StreamTransaction  # noqa: F401
from moonray.table import MoonrayTable  # noqa: F401

__version__ = "0.1.0"
