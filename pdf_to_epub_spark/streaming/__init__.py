from .incremental import PAGES_SCHEMA, incremental_extract, windowed_ingest_rate

__all__ = ["PAGES_SCHEMA", "incremental_extract", "windowed_ingest_rate"]
