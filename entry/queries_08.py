"""Driver query builders (part 8): streaming-surface replays.

VERDICT r4 #6 — the applyInPandasWithState first-seen dedup and the
watermarked stream-stream interval join were pytest-only; these two
queries run the REAL streaming operators (availableNow file-source
micro-batches / memory-sink stream-stream join) inside the driver gate,
with exact DuckDB oracles replaying the streaming semantics in SQL
(batch assignment is a pure function of doc_id, so state-boundary
behavior is deterministic and hash-checkable).
"""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from entry._shared import _t


def _pages_with_mirrors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → page stream rows with planted re-crawls, batch-tagged.

    batch 0: even-doc originals.  batch 1: odd originals + ALL mirrors —
    mirrors of even docs (doc_id % 10 == 0) test CROSS-batch state
    suppression, mirrors of odd docs (doc_id % 20 == 1) land in the same
    batch as their original and test the WITHIN-batch dup counter.
    Mirror warc_ts is +1 minute so the original always sorts first."""
    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    ts = F.expr(
        "timestamp'2025-01-01 00:00:00' "
        "+ make_interval(0, 0, 0, 0, 0, CAST(doc_id % 60 AS INT), 0)"
    )
    originals = d.select(
        F.concat(F.lit("doc://"), F.col("doc_id").cast("string")).alias("url"),
        ts.alias("warc_ts"),
        F.lit(None).cast("binary").alias("html"),
        F.col("text"),
        F.lit("en").alias("lang"),
        (F.col("doc_id") % 2).cast("int").alias("batch"),
    )
    mirrors = d.where(
        ((F.col("doc_id") % 10) == 0) | ((F.col("doc_id") % 20) == 1)
    ).select(
        F.concat(F.lit("mirror://"), F.col("doc_id").cast("string")).alias(
            "url"
        ),
        F.expr(
            "timestamp'2025-01-01 00:00:00' "
            "+ make_interval(0, 0, 0, 0, 0, CAST(doc_id % 60 AS INT) + 1, 0)"
        ).alias("warc_ts"),
        F.lit(None).cast("binary").alias("html"),
        F.col("text"),
        F.lit("en").alias("lang"),
        F.lit(1).cast("int").alias("batch"),
    )
    return originals.unionByName(mirrors)


def _q_streaming_first_seen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stateful streaming dedup (streaming/stateful.py
    `streaming_first_seen`, applyInPandasWithState) driven for real: two
    availableNow micro-batch rounds over file-source parquet, parquet
    sink, checkpointed state.  Batch membership is doc_id parity (plus
    planted mirror re-crawls), so the oracle replays the exact state
    semantics in SQL: per content hash, the emitting batch is the FIRST
    batch containing it, the emitted row is that batch's (warc_ts, url)
    minimum, and n_dupes_in_batch counts the batch's other copies;
    later-batch re-crawls are suppressed entirely."""
    import tempfile

    from pdf_to_epub_spark.streaming.stateful import streaming_first_seen
    from pdf_to_epub_spark.streaming.incremental import PAGES_SCHEMA

    import shutil

    pages = _pages_with_mirrors(spark, sf_dir)
    work = tempfile.mkdtemp(prefix="sfs_replay_")
    inp, out, cp = f"{work}/in", f"{work}/out", f"{work}/cp"
    try:
        for b in (0, 1):
            pages.where(F.col("batch") == b).drop("batch").coalesce(
                1
            ).write.mode("append").parquet(inp)
            q = (
                streaming_first_seen(
                    spark.readStream.schema(PAGES_SCHEMA).parquet(inp)
                )
                .writeStream.format("parquet")
                .option("path", out)
                .option("checkpointLocation", cp)
                .outputMode("append")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
        # materialize before the temp tree is removed — the returned
        # DataFrame must stay collectable after cleanup (the gate runs
        # each builder at two scales; leaking a parquet tree per call
        # would grow /tmp unboundedly)
        return (
            spark.read.parquet(out)
            .select("doc_hash", "url", "warc_ts", "n_dupes_in_batch")
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)


def _q_stream_label_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked stream-stream interval join (streaming/incremental.py
    `streaming_page_label_join`) driven for real: page and label file
    streams joined on url with label_ts ∈ [warc_ts, warc_ts + 5 min],
    append-mode memory sink.  Labels lag their page by (doc_id % 8)
    minutes — docs with lag ≤ 5 pair, 6–7 fall outside the interval —
    and ghost labels (doc_id % 50 == 0) have no page at all.  The pair
    set is decided by the interval predicate, not watermark timing
    (state eviction only), so a plain SQL interval join replays it
    exactly."""
    import tempfile
    import uuid

    from pdf_to_epub_spark.streaming.incremental import (
        streaming_page_label_join,
    )

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    ts = F.expr(
        "timestamp'2025-01-01 00:00:00' "
        "+ make_interval(0, 0, 0, 0, 0, CAST(doc_id % 60 AS INT), 0)"
    )
    pages = d.select(
        F.concat(F.lit("doc://"), F.col("doc_id").cast("string")).alias("url"),
        ts.alias("warc_ts"),
        F.lit(None).cast("binary").alias("html"),
        F.col("text"),
        F.lit("en").alias("lang"),
    )
    labels = d.select(
        F.concat(F.lit("doc://"), F.col("doc_id").cast("string")).alias("url"),
        F.concat(F.lit("lab"), F.col("doc_id").cast("string")).alias("label"),
        F.expr(
            "timestamp'2025-01-01 00:00:00' "
            "+ make_interval(0, 0, 0, 0, 0, "
            "  CAST(doc_id % 60 AS INT) + CAST(doc_id % 8 AS INT), 0)"
        ).alias("label_ts"),
    ).unionByName(
        d.where((F.col("doc_id") % 50) == 0).select(
            F.concat(F.lit("ghost://"), F.col("doc_id").cast("string")).alias(
                "url"
            ),
            F.lit("orphan").alias("label"),
            ts.alias("label_ts"),
        )
    )
    import shutil

    work = tempfile.mkdtemp(prefix="ssj_replay_")
    qn = "ssj_replay_" + uuid.uuid4().hex[:12]
    try:
        pages.write.parquet(f"{work}/pages")
        labels.write.parquet(f"{work}/labels")
        q = streaming_page_label_join(
            spark,
            f"{work}/pages",
            f"{work}/labels",
            watermark="10 minutes",
            max_lag="5 minutes",
            query_name=qn,
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        # materialize, then drop the memory-sink table — it would
        # otherwise hold the whole join result in driver memory for the
        # session's lifetime, one copy per invocation
        return (
            spark.table(qn)
            .select("url", "warc_ts", "label", "label_ts")
            .localCheckpoint(eager=True)
        )
    finally:
        spark.catalog.dropTempView(qn)
        shutil.rmtree(work, ignore_errors=True)
