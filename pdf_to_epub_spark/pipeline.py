"""End-to-end ingest pipeline: the composition a user actually runs.

pages (url, warc_ts, html, text, lang — the Common-Crawl-style input
table) →

1. resume anti-join against the committed output (operators/resume.py);
2. extraction (OCR-text or HTML mode) + chapter assembly;
3. quality gates: Gopher rules + repetition filters;
4. PII scrub of the survivors;
5. exact dedup, then MinHash near-dup removal (signature store optional);
6. deterministic train/val/test split.

Every stage is an independently-oracled operator (see __spark_entry__);
this module only wires them, so the composition's correctness is the
conjunction of the per-stage oracles plus the composition test
(tests/test_pipeline.py).  Per-stage counts are reported through an
``audit`` dict of small aggregate DataFrames — a driver materializes them
AFTER the run (they are cheap aggregates over checkpointed stages, not
extra full passes).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pdf_to_epub_spark.operators import (
    assemble_documents,
    blocks_table,
    drop_exact_duplicates,
    drop_near_duplicates,
    extract_documents,
    extract_html_documents,
    gopher_quality,
    hash_split,
    repetition_signals,
    scrub_pii,
)


@dataclass
class IngestResult:
    corpus: DataFrame
    audit: dict[str, DataFrame] = field(default_factory=dict)


def ingest(
    pages: DataFrame,
    done_hashes: DataFrame | None = None,
    html_mode: bool = False,
    salt_partitions: int | None = None,
    min_words: int = 50,
    max_dup_line_char_ratio: float = 0.3,
    max_top_bigram_char_ratio: float = 0.3,
    near_dup_threshold: float = 0.7,
    signatures_path: str | None = None,
    split_weights: dict[str, float] | None = None,
) -> IngestResult:
    """Run the full pipeline; returns the cleaned, deduplicated, split
    corpus ``(url, text, n_email, n_ip, n_phone, split)`` plus per-stage
    audit aggregates."""
    audit: dict[str, DataFrame] = {}

    if done_hashes is not None:
        from pdf_to_epub_spark.operators import pending_documents, with_doc_hash

        pages = pending_documents(
            with_doc_hash(pages, payload_col="text"), done_hashes
        )

    extractor = extract_html_documents if html_mode else extract_documents
    extracted = extractor(pages, salt_partitions=salt_partitions)
    docs = (
        assemble_documents(blocks_table(extracted))
        .select("url", F.col("assembled_text").alias("text"))
        # one materialization: five downstream stages (gopher + repetition
        # + join + dedup text access ×2) would each re-run the Python
        # extraction otherwise
        .localCheckpoint(eager=False)
    )
    audit["extracted"] = extracted.groupBy("status").count()

    g = gopher_quality(docs, min_words=min_words).select("url", "text", "keep")
    r = repetition_signals(docs, id_col="url")
    kept = (
        g.join(r, "url")
        .where(
            F.col("keep")
            & (F.col("dup_line_char_ratio") < max_dup_line_char_ratio)
            & (F.col("top_bigram_char_ratio") < max_top_bigram_char_ratio)
        )
        .select("url", "text")
    )
    audit["quality_kept"] = kept.groupBy().count()

    scrubbed = scrub_pii(kept).select(
        "url", F.col("clean_text").alias("text"), "n_email", "n_ip", "n_phone"
    )

    exact = drop_exact_duplicates(scrubbed, text_col="text", id_col="url")
    deduped = drop_near_duplicates(
        exact,
        text_col="text",
        id_col="url",
        k=5,
        jaccard_threshold=near_dup_threshold,
        signatures_path=signatures_path,
    ).localCheckpoint(eager=False)
    audit["deduped"] = deduped.groupBy().count()

    out = hash_split(deduped, split_weights, id_col="url")
    audit["splits"] = out.groupBy("split").count()
    return IngestResult(corpus=out, audit=audit)
