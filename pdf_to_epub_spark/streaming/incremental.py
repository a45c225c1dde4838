"""Incremental (checkpointed) extraction over a growing page corpus.

The reference has NO streaming operators (SURVEY §2.9) — its only
incremental element is the resume-by-hash index, which operators/resume.py
covers for batch.  This module is the Structured-Streaming expression of
the same idea for a corpus that grows between runs: an ``availableNow``
file-source stream processes exactly the files not yet recorded in the
checkpoint, then stops — i.e. "resume from the last committed snapshot"
(`north_rule`) driven by Spark's own streaming offset log instead of an
explicit anti-join.

Extraction is append-only (document-local), so it streams trivially; the
blocks→document assembly aggregation stays a batch query over the extracted
output table.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.types import (
    BinaryType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

PAGES_SCHEMA = StructType(
    [
        StructField("url", StringType()),
        StructField("warc_ts", TimestampType()),
        StructField("html", BinaryType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
    ]
)


def incremental_extract(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    salt_partitions: int | None = None,
    await_termination: bool = True,
    html_mode: bool = False,
):
    """Process all not-yet-committed parquet files under ``input_dir`` and
    append extracted rows to ``output_dir``; offsets live in
    ``checkpoint_dir``.  Returns the StreamingQuery.

    ``html_mode`` switches the per-document transform to the HTML
    main-content extractor (same EXTRACTED_SCHEMA, so the sink and all
    downstream batch queries are unchanged)."""
    from pdf_to_epub_spark.operators.extract import (
        extract_documents,
        extract_html_documents,
    )

    stream = spark.readStream.schema(PAGES_SCHEMA).parquet(input_dir)
    if html_mode:
        extracted = extract_html_documents(stream, salt_partitions=salt_partitions)
    else:
        extracted = extract_documents(stream, salt_partitions=salt_partitions)
    query = (
        extracted.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    if await_termination:
        query.awaitTermination()
    return query


def streaming_near_dup_pairs(
    spark: SparkSession,
    input_dir: str,
    pairs_dir: str,
    checkpoint_dir: str,
    signatures_path: str,
    text_col: str = "text",
    id_col: str = "url",
    k: int = 5,
    num_hashes: int = 64,
    bands: int = 16,
    jaccard_threshold: float = 0.5,
    await_termination: bool = True,
):
    """Streaming composition of the incremental near-dup flow: each
    micro-batch of new pages is treated as that day's pending set —
    signatures are computed for the batch only and appended to the shared
    signature store, banding runs over stored-old ∪ batch, and verified
    new-vs-all pairs append to ``pairs_dir``.

    foreachBatch is the right tool (not a stateful streaming agg): the
    LSH join needs the FULL historical signature table, which lives in the
    store as a plain parquet artifact — exactly the batch operator's
    deployment shape, driven by the streaming offset log instead of a
    scheduler.  The per-batch core is the SAME helper the batch operator
    uses (operators/dedup.incremental_pair_batch), so replay/recrawl
    semantics cannot drift between the two paths: the store deduplicates
    on read (a crash between the two sinks double-appends harmlessly),
    the pairs sink partitions by batch_id with dynamic-partition overwrite
    (a replayed batch rewrites its own partition instead of appending
    duplicate pair rows), and a re-crawled id with changed text resolves
    deterministically by content-hash arg-max (see the helper's docstring).
    """
    from pyspark.sql import functions as F

    from pdf_to_epub_spark.operators.dedup import incremental_pair_batch

    stream = spark.readStream.schema(PAGES_SCHEMA).parquet(input_dir)

    def process_batch(batch_df, batch_id: int) -> None:
        docs = batch_df.select(F.col(id_col), F.col(text_col))
        corpus = spark.read.schema(PAGES_SCHEMA).parquet(input_dir).select(
            F.col(id_col), F.col(text_col)
        )
        verified = incremental_pair_batch(
            spark,
            docs,
            corpus,
            signatures_path,
            text_col=text_col,
            id_col=id_col,
            k=k,
            num_hashes=num_hashes,
            bands=bands,
            jaccard_threshold=jaccard_threshold,
        )
        # idempotent pairs sink: foreachBatch is at-least-once, so a crash
        # after the write but before the checkpoint commit replays the
        # batch.  Each batch overwrites its own hive-style partition
        # directory, so a replay rewrites the same rows instead of
        # appending duplicates (the store side is already safe: it
        # deduplicates on read).  The explicit path — rather than
        # partitionBy + dynamic overwrite — keeps an empty batch readable:
        # it still lands schema-bearing empty part files.
        verified.write.mode("overwrite").parquet(
            f"{pairs_dir}/batch_id={int(batch_id)}"
        )

    query = (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    if await_termination:
        query.awaitTermination()
    return query


def windowed_ingest_rate(
    spark: SparkSession,
    input_dir: str,
    window: str = "5 minutes",
    slide: str | None = None,
    watermark: str = "10 minutes",
    query_name: str = "ingest_rate",
):
    """Event-time windowed ingest metrics with late-data handling: pages
    per (window, lang) with a watermark — the streaming counterpart of the
    batch metrics table.  Runs in ``update`` output mode so the watermark
    actually does its job: window state older than the watermark is
    evicted and later-than-watermark rows are dropped (``complete`` mode
    would keep every window forever and never drop late data).  Returns the
    started StreamingQuery writing to an in-memory sink (use
    ``processAllAvailable()`` then query ``SELECT * FROM <query_name>``;
    note update mode re-emits a window's row each time it changes)."""
    from pyspark.sql import functions as F

    pages = spark.readStream.schema(PAGES_SCHEMA).parquet(input_dir)
    agg = (
        pages.withWatermark("warc_ts", watermark)
        .groupBy(F.window("warc_ts", window, slide or window), "lang")
        .agg(
            F.count("*").alias("pages"),
            F.sum(F.length("text")).alias("chars"),
        )
    )
    return (
        agg.writeStream.outputMode("update")
        .format("memory")
        .queryName(query_name)
        .start()
    )


def streaming_postings(
    spark: SparkSession,
    input_dir: str,
    postings_dir: str,
    checkpoint_dir: str,
    id_col: str = "url",
    text_col: str = "text",
    await_termination: bool = True,
):
    """Streaming inverted-index maintenance: each micro-batch of pages is
    tokenized ON ITS OWN (the O(batch) property of
    operators/ir.update_postings, driven by the streaming offset log) and
    written to a postings store partitioned by ``batch_id`` with
    dynamic-partition overwrite — foreachBatch is at-least-once, so a
    replayed batch rewrites its own partition instead of appending
    duplicate postings.  Re-crawled ids are resolved at READ time
    (:func:`load_postings` keeps each doc's newest batch), the same
    resolve-on-read shape as the signature store.
    """
    from pyspark.sql import functions as F

    from pdf_to_epub_spark.operators import term_postings

    stream = spark.readStream.schema(PAGES_SCHEMA).parquet(input_dir)

    def process_batch(batch_df, batch_id: int) -> None:
        # Empty-guard on the SOURCE batch (a cheap limit-1 scan), not the
        # aggregated frame — isEmpty() on the postings aggregate would run
        # the full tokenize+shuffle once for the probe and again for the
        # write, doubling per-batch cost.
        if batch_df.isEmpty():
            return
        fresh = term_postings(
            batch_df.select(F.col(id_col), F.col(text_col)),
            id_col=id_col,
        ).withColumn("batch_id", F.lit(int(batch_id)))
        # partitionOverwriteMode as a per-write OPTION: setting it on
        # spark.conf would leak dynamic-overwrite semantics to every later
        # partitioned overwrite in the session.
        fresh.write.mode("overwrite").option(
            "partitionOverwriteMode", "dynamic"
        ).partitionBy("batch_id").parquet(postings_dir)

    q = (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    if await_termination:
        q.awaitTermination()
    return q


def load_postings(spark: SparkSession, postings_dir: str, id_col: str = "url"):
    """Current view of the streamed postings store: for every doc keep
    only its NEWEST batch's rows (a re-crawled page fully replaces its
    old postings).  The latest-batch table is slim (one row per doc) and
    joins back on (id, batch_id)."""
    from pyspark.sql import functions as F

    df = spark.read.parquet(postings_dir)
    latest = df.groupBy(id_col).agg(F.max("batch_id").alias("batch_id"))
    return df.join(latest, [id_col, "batch_id"]).select(
        "term", id_col, "tf"
    )


LABELS_SCHEMA = "url string, label string, label_ts timestamp"


def streaming_page_label_join(
    spark: SparkSession,
    pages_dir: str,
    labels_dir: str,
    watermark: str = "10 minutes",
    max_lag: str = "5 minutes",
    query_name: str = "page_labels",
):
    """Watermarked stream-stream INTERVAL join — the two-bus crawl shape
    where content and annotations (fetch metadata, classifier labels,
    moderation verdicts) arrive on separate streams and must be paired
    without ever materializing either side: pages ⋈ labels on url with
    ``label_ts ∈ [warc_ts, warc_ts + max_lag]``.

    The interval condition is what makes unbounded state bounded: with
    BOTH sides watermarked and the join range time-bound, Spark evicts
    page state once ``watermark > warc_ts + max_lag`` and label state
    once ``watermark > label_ts`` — without it a stream-stream join
    buffers forever (and Spark rejects append mode).  Inner join emits
    in ``append`` (each pair exactly once), so downstream sinks get
    clean at-most-once-per-pair rows.

    Returns the started StreamingQuery on an in-memory sink; drive with
    ``processAllAvailable()`` and read ``SELECT * FROM <query_name>``.
    Pair-set determinism comes from the interval predicate itself (the
    watermark only governs STATE EVICTION timing, which tests must not
    depend on)."""
    from pyspark.sql import functions as F

    pages = (
        spark.readStream.schema(PAGES_SCHEMA)
        .parquet(pages_dir)
        .withWatermark("warc_ts", watermark)
        .alias("p")
    )
    labels = (
        spark.readStream.schema(LABELS_SCHEMA)
        .parquet(labels_dir)
        .withWatermark("label_ts", watermark)
        .alias("l")
    )
    joined = pages.join(
        labels,
        F.expr(
            "p.url = l.url AND l.label_ts >= p.warc_ts "
            f"AND l.label_ts <= p.warc_ts + interval {max_lag}"
        ),
        "inner",
    ).select("p.url", "p.warc_ts", "l.label", "l.label_ts")
    return (
        joined.writeStream.outputMode("append")
        .format("memory")
        .queryName(query_name)
        .start()
    )
