"""Export sinks: publish a moonray snapshot into foreign table formats
(reference: the secondary Delta Lake syncer,
src/moonlink/src/storage/table/deltalake/deltalake_table_syncer.rs)."""
