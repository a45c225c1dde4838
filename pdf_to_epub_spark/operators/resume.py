"""Checkpoint-resume semantics: skip documents already committed.

Spark re-expression of the reference's content-hash resume index
(`/root/reference/pdf_to_epub.sh:162-195`, marker written at
`/root/reference/ocr-processing/merge_one_book.py:102-115`) and its
skip-if-output-exists memoization (`pdf_to_epub.sh:216-219`).

The committed-results table (parquet/Iceberg snapshot) holds ``doc_hash``
per finished document; resuming a run is a ``left_anti`` join of the input
against it.  The done-side is typically tiny relative to the input, so it
is broadcast — no shuffle of the 100 TB side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_doc_hash(docs: DataFrame, payload_col: str = "html") -> DataFrame:
    """SHA-256 content identity, computed JVM-side."""
    col = F.col(payload_col)
    if dict(docs.dtypes).get(payload_col) == "string":
        col = F.encode(col, "UTF-8")
    return docs.withColumn("doc_hash", F.sha2(col, 256))


def pending_documents(
    docs: DataFrame,
    done: DataFrame,
    hash_col: str = "doc_hash",
    broadcast_done: bool = True,
) -> DataFrame:
    """Input minus already-committed rows (anti-join on content hash)."""
    done_keys = done.select(hash_col).distinct()
    if broadcast_done:
        done_keys = F.broadcast(done_keys)
    return docs.join(done_keys, on=hash_col, how="left_anti")


def resume_run(
    docs: DataFrame,
    committed_path: str,
    payload_col: str = "html",
) -> DataFrame:
    """Convenience wrapper: hash the input, anti-join against the committed
    snapshot at ``committed_path`` (absent/empty snapshot → full input)."""
    spark = docs.sparkSession
    hashed = with_doc_hash(docs, payload_col)
    try:
        done = spark.read.parquet(committed_path).select("doc_hash")
    except Exception:  # noqa: BLE001 — first run: nothing committed yet
        return hashed
    return pending_documents(hashed, done)
