from .incremental import (
    PAGES_SCHEMA,
    incremental_extract,
    load_postings,
    streaming_near_dup_pairs,
    streaming_postings,
    windowed_ingest_rate,
)

__all__ = [
    "PAGES_SCHEMA",
    "incremental_extract",
    "load_postings",
    "streaming_near_dup_pairs",
    "streaming_postings",
    "windowed_ingest_rate",
]
