from .assemble import assemble_documents, ordered_concat
from .extract import blocks_table, decode_binary_pages, extract_documents
from .metrics import corpus_counters, partition_metrics, status_summary
from .resume import pending_documents, resume_run, with_doc_hash

__all__ = [
    "assemble_documents",
    "blocks_table",
    "corpus_counters",
    "decode_binary_pages",
    "extract_documents",
    "ordered_concat",
    "partition_metrics",
    "pending_documents",
    "resume_run",
    "status_summary",
    "with_doc_hash",
]
