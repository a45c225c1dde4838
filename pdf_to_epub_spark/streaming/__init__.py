from .incremental import (
    PAGES_SCHEMA,
    incremental_extract,
    streaming_near_dup_pairs,
    windowed_ingest_rate,
)

__all__ = [
    "PAGES_SCHEMA",
    "incremental_extract",
    "streaming_near_dup_pairs",
    "windowed_ingest_rate",
]
