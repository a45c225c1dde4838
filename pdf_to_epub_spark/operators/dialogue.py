"""Dialogue-turn shaping: conversation threads → SFT training pairs.

Mailing lists, forums, and chat logs become instruction-tuning data by
pairing each turn with the context that preceded it (the standard
adjacent-turn SFT shaping, cf. OpenAssistant/ShareGPT pipelines).  The
thread structure arrives from any threaded source — here the mbox
parser (sources/mbox.py), but anything with (thread, order, text) rows
works.

Scale shape: one per-thread window (lag + a bounded ``ROWS BETWEEN``
frame for multi-turn context) — the shuffle is keyed by the thread id
and skew is bounded by the longest single thread; no UDF, no explode,
output rows are 1:1 with qualifying turns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

TURN_SEP = "\n---\n"


def dialogue_pairs(
    messages: DataFrame,
    id_col: str = "doc_id",
    order_col: str = "msg_id",
    text_col: str = "body",
    context_turns: int = 2,
    min_chars: int = 1,
) -> DataFrame:
    """Thread turns → ``(id, pair_id, prompt, response)`` training
    pairs: each turn with at least one predecessor becomes a response;
    its prompt is the previous ``context_turns`` turns joined by
    ``TURN_SEP`` in thread order (multi-turn context windows, the shape
    chat SFT wants).  Pairs where either side is shorter than
    ``min_chars`` are dropped; ``pair_id`` numbers qualifying pairs from
    1 in thread order.  NULL-body turns carry no text: they are
    omitted from the assembled prompt AND excluded from the
    predecessor count (counting them would emit a pair whose claimed
    context silently misses a turn)."""
    w = Window.partitionBy(id_col).orderBy(order_col)
    ctx = F.array_join(
        F.collect_list("response").over(
            w.rowsBetween(-context_turns, -1)
        ),
        TURN_SEP,
    )
    # count("response") — non-NULL predecessors only, matching what
    # collect_list actually assembles into the prompt
    n_prev = F.count("response").over(w.rowsBetween(-context_turns, -1))
    shaped = (
        messages.select(id_col, order_col, F.col(text_col).alias("response"))
        .withColumn("prompt", ctx)
        .withColumn("_n_prev", n_prev)
        .where(
            (F.col("_n_prev") >= 1)
            & (F.length("prompt") >= min_chars)
            & (F.length("response") >= min_chars)
        )
    )
    return shaped.select(
        id_col,
        F.row_number().over(w).cast("long").alias("pair_id"),
        "prompt",
        "response",
    )
