"""Ingest-side converters (the REST/JSON ingest analogue)."""
