from .incremental import PAGES_SCHEMA, incremental_extract

__all__ = ["PAGES_SCHEMA", "incremental_extract"]
