"""TextTiling topic segmentation (Hearst 1997), set-oriented and exact.

Long web documents (and the reference's book-length extractions — its
chapter detection at SURVEY §2 T24–T26 is the typographic cousin of this
operator) need TOPIC boundaries for chunking: training-example windows
that straddle a topic shift dilute both topics, and retrieval chunks
that respect topic boundaries rank better.  TextTiling is the classic
unsupervised algorithm: slide a window over fixed-size pseudo-sentences,
score lexical cohesion across each gap, and cut where cohesion dips.

This implementation re-derives it as pure relational algebra:

* tokens → pseudo-sentences of ``w`` tokens (``pos // w``);
* each gap ``g`` (between pseudo-sentence ``g-1`` and ``g``) compares
  the ``k`` pseudo-sentences on each side via the DICE coefficient over
  term counts — Dice is chosen over Hearst's cosine because it is
  RATIONAL: ``sim_micro = (2·10⁶·Σ_t min(cl,cr)) // (Σcl + Σcr)`` is
  exact integer arithmetic, so the DuckDB oracle replays it
  bit-for-bit (cosine's sqrt would re-open the float-parity front);
* only gaps with FULL windows on both sides are scored (``k ≤ g ≤
  n_ps−k``): clipped edge windows are smaller, which deflates Dice
  mechanically and (measured) plants spurious boundaries at the edges
  of perfectly uniform documents — Hearst's formulation compares
  equal-size blocks for the same reason;
* depth score = the local-valley form ``max(0, sim(g-1)−sim(g)) +
  max(0, sim(g+1)−sim(g))`` (missing neighbours contribute 0) — a
  deliberate simplification of Hearst's hill-climbing peaks that keeps
  the window stencil fixed-width (lag/lead), which is what survives a
  100 TB shuffle;
* boundary rule: ``depth > 0`` and at-or-above the document's mean
  depth, compared in cross-multiplied integer form
  (``depth · n_gaps ≥ Σdepth``) — no float mean.  ``depth > 0``
  requires a strictly-higher neighbouring gap, so uniform documents
  (all depths 0) never cut.

Scale shape: terms ride as 64-bit hashes (equality-only use; exact up
to 2⁻⁶⁴ collisions like the shingle operators); the window fan-out is a
bounded ×2k explode of slim (id, gap, hash, cnt) rows; every shuffle is
keyed by the document id or finer, so skew is bounded by document
length, not corpus size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

MICRO = 2_000_000  # Dice numerator scale: 2e6 · intersection


def _pseudo_sentence_counts(
    docs: DataFrame, id_col: str, text_col: str, w: int
) -> DataFrame:
    """(id, ps, th, cnt, n_ps): term-hash counts per pseudo-sentence,
    with the document's pseudo-sentence count alongside."""
    toks = docs.select(
        F.col(id_col).alias("_id"),
        F.filter(
            F.split(F.coalesce(F.col(text_col), F.lit("")), r"\s+"),
            lambda x: x != F.lit(""),
        ).alias("_toks"),
    ).select("_id", F.posexplode("_toks").alias("_pos", "_term"))
    counts = (
        toks.select(
            "_id",
            (F.col("_pos") / w).cast("long").alias("ps"),
            F.xxhash64(F.lower(F.col("_term"))).alias("th"),
        )
        .groupBy("_id", "ps", "th")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return counts.withColumn(
        "n_ps", F.max("ps").over(Window.partitionBy("_id")) + F.lit(1)
    )


def texttiling_gaps(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    w: int = 10,
    k: int = 2,
) -> DataFrame:
    """Per-gap cohesion scores and boundary decisions.

    Returns ``(id, gap, sim_micro, depth_micro, is_boundary)`` — one row
    per full-window gap ``k … n_ps−k``; documents shorter than ``2k``
    pseudo-sentences have no scorable gaps and are absent (their single
    tile is still emitted by :func:`text_segments`).
    """
    pc = _pseudo_sentence_counts(docs, id_col, text_col, w)
    return _gaps_from_pc(pc, id_col, k)


def _gaps_from_pc(pc: DataFrame, id_col: str, k: int) -> DataFrame:
    """Gap scoring over an already-built pseudo-sentence count table —
    split out so :func:`text_segments` can share ONE tokenize→explode→
    groupBy pass between the gap scores and the document-length lookup
    (the tokenization stage dominates; running it twice per action
    doubled the corpus scan)."""
    # a pseudo-sentence's counts contribute to the LEFT window of gaps
    # (ps, ps+k] and the RIGHT window of gaps [ps−k+1, ps] — clipped to
    # the full-window gap range [k, n_ps−k]; bounded ×2k fan-out of
    # slim rows
    l_lo = F.greatest(F.col("ps") + 1, F.lit(k))
    l_hi = F.least(F.col("ps") + k, F.col("n_ps") - k)
    left = pc.where(l_lo <= l_hi).select(
        "_id",
        F.explode(F.sequence(l_lo, l_hi)).alias("gap"),
        "th",
        F.col("cnt").alias("cl"),
        F.lit(0).cast("long").alias("cr"),
    )
    r_lo = F.greatest(F.col("ps") - k + 1, F.lit(k))
    r_hi = F.least(F.col("ps"), F.col("n_ps") - k)
    right = pc.where(r_lo <= r_hi).select(
        "_id",
        F.explode(F.sequence(r_lo, r_hi)).alias("gap"),
        "th",
        F.lit(0).cast("long").alias("cl"),
        F.col("cnt").alias("cr"),
    )
    per_term = (
        left.unionByName(right)
        .groupBy("_id", "gap", "th")
        .agg(F.sum("cl").alias("cl"), F.sum("cr").alias("cr"))
    )
    per_gap = per_term.groupBy("_id", "gap").agg(
        F.sum(F.least("cl", "cr")).alias("_inter"),
        (F.sum("cl") + F.sum("cr")).alias("_total"),
    )
    sims = per_gap.select(
        "_id",
        "gap",
        F.expr(f"({MICRO} * _inter) div _total").alias("sim_micro"),
    )

    by_gap = Window.partitionBy("_id").orderBy("gap")
    whole = Window.partitionBy("_id")
    lagv = F.lag("sim_micro", 1, None).over(by_gap)
    leadv = F.lead("sim_micro", 1, None).over(by_gap)
    depth = F.greatest(
        F.coalesce(lagv - F.col("sim_micro"), F.lit(0)), F.lit(0)
    ) + F.greatest(
        F.coalesce(leadv - F.col("sim_micro"), F.lit(0)), F.lit(0)
    )
    scored = sims.withColumn("depth_micro", depth).withColumn(
        "is_boundary",
        (F.col("depth_micro") > 0)
        & (
            F.col("depth_micro") * F.count(F.lit(1)).over(whole)
            >= F.sum("depth_micro").over(whole)
        ),
    )
    return scored.select(
        F.col("_id").alias(id_col),
        "gap",
        "sim_micro",
        "depth_micro",
        "is_boundary",
    )


def text_segments(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    w: int = 10,
    k: int = 2,
) -> DataFrame:
    """Tiles from the boundary gaps: ``(id, seg_id, start_ps, end_ps,
    n_ps)`` — contiguous pseudo-sentence ranges, ``seg_id`` numbered
    from 1 in document order.  Every document with at least one token
    yields at least one tile (a boundary-free document is one tile)."""
    # one shared pseudo-sentence pass behind a lazy barrier: it feeds
    # BOTH the doc-length lookup and the gap scorer (the same fan-out
    # pattern continuation_pairs/ngram_novelty checkpoint)
    pc = _pseudo_sentence_counts(docs, id_col, text_col, w).localCheckpoint(
        eager=False
    )
    doc_len = pc.groupBy(F.col("_id")).agg(F.max("n_ps").alias("_n_ps"))

    cuts = (
        _gaps_from_pc(pc, id_col, k)
        .where(F.col("is_boundary"))
        .select(F.col(id_col).alias("_id"), F.col("gap").alias("start_ps"))
    )
    starts = doc_len.select(
        "_id", F.lit(0).cast("long").alias("start_ps")
    ).unionByName(cuts)

    by_start = Window.partitionBy("_id").orderBy("start_ps")
    segs = starts.join(doc_len, "_id").select(
        "_id",
        F.row_number().over(by_start).alias("seg_id"),
        "start_ps",
        (
            F.coalesce(
                F.lead("start_ps", 1).over(by_start), F.col("_n_ps")
            )
            - 1
        ).alias("end_ps"),
    )
    return segs.select(
        F.col("_id").alias(id_col),
        "seg_id",
        "start_ps",
        "end_ps",
        (F.col("end_ps") - F.col("start_ps") + 1).alias("n_ps"),
    )
