"""Extraction-quality evaluation: token-multiset precision/recall/F1 of a
predicted text column against a gold column — the harness that turns the
north-rule's byte-identical contract into a graded signal when a candidate
extractor is NOT byte-perfect (e.g. comparing a naive tag-strip against the
link-density classifier, or re-scoring after a parser change).

Reference anchor: the reference pipeline's only quality check is byte
equality of Step-3 output (pdf_to_epub.sh golden diffs); this module is the
set-oriented generalization a 10^12-page corpus needs — per-document scores
you can aggregate, regress on, and gate with.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .textstats import _tokens


def token_overlap_eval(
    df: DataFrame,
    id_col: str = "doc_id",
    pred_col: str = "pred",
    gold_col: str = "gold",
) -> DataFrame:
    """Per-document multiset token overlap between ``pred_col`` and
    ``gold_col`` (both must be plain column NAMES): returns
    ``(id, n_pred, n_gold, n_overlap, p, r, f1)`` where overlap is the
    multiset intersection size (repeated tokens count up to their minimum
    multiplicity on the two sides — duplicated boilerplate can't inflate
    precision the way a set intersection would let it).

    Shape: ONE pass over the rows builds a tagged token array
    (pred-tokens ⊕ gold-tokens) that explodes into a single
    ``(id, token)``-keyed aggregation — the id in the key makes a hot
    token (stop words) irrelevant to skew — followed by the doc-keyed
    rollup, bounded by document size.  No joins: a pred-side vs
    gold-side join would scan the input twice and re-key the same rows.

    Metrics: ``p = overlap/n_pred``, ``r = overlap/n_gold`` (NULL when
    the denominator is 0), ``f1 = 2pr/(p+r)`` (0.0 when both defined but
    overlap is 0; NULL when either side is undefined), rounded to 6 dp
    for engine-stable comparison."""
    empty = F.array().cast("array<string>")
    tagged = F.concat(
        F.transform(
            F.coalesce(_tokens(pred_col), empty),
            lambda t: F.struct(t.alias("tok"), F.lit(1).alias("is_pred")),
        ),
        F.transform(
            F.coalesce(_tokens(gold_col), empty),
            lambda t: F.struct(t.alias("tok"), F.lit(0).alias("is_pred")),
        ),
    )
    toks = df.select(
        F.col(id_col).alias("__id"), F.explode_outer(tagged).alias("t")
    )
    per_tok = toks.groupBy("__id", F.col("t.tok").alias("tok")).agg(
        F.sum(F.when(F.col("t.is_pred") == 1, 1).otherwise(0)).alias("c_p"),
        F.sum(F.when(F.col("t.is_pred") == 0, 1).otherwise(0)).alias("c_g"),
    )
    per_doc = per_tok.groupBy("__id").agg(
        F.sum("c_p").cast("long").alias("n_pred"),
        F.sum("c_g").cast("long").alias("n_gold"),
        F.sum(F.least("c_p", "c_g")).cast("long").alias("n_overlap"),
    )
    p = F.when(F.col("n_pred") > 0, F.col("n_overlap") / F.col("n_pred"))
    r = F.when(F.col("n_gold") > 0, F.col("n_overlap") / F.col("n_gold"))
    f1 = F.when(
        p.isNotNull() & r.isNotNull() & ((p + r) > 0), 2 * p * r / (p + r)
    ).when(p.isNotNull() & r.isNotNull(), F.lit(0.0))
    return per_doc.select(
        F.col("__id").alias(id_col),
        "n_pred",
        "n_gold",
        "n_overlap",
        F.round(p, 6).alias("p"),
        F.round(r, 6).alias("r"),
        F.round(f1, 6).alias("f1"),
    )


def binary_classifier_eval(
    scored: DataFrame,
    truth_col: str = "truth",
    margin_col: str = "margin_micro",
) -> DataFrame:
    """Threshold metrics + exact AUC for a binary classifier, one row:
    ``(n_pos, n_neg, tp, fp, tn, fn, precision, recall, f1, auc)``.

    Prediction is ``margin > 0``.  AUC is the Mann-Whitney rank form
    with exact tie handling, computed as the INTEGER statistic
    ``U2 = sum over distinct margins of n_pos*(2*cum_neg_below + n_neg)``
    so the sum is partition-order independent and SQL-replayable;
    ``auc = U2 / (2*P*N)``.

    Scale shape: one groupBy on the margin value (slim counts), then a
    window over the DISTINCT-margin table only — the window's single
    ordered pass touches |distinct scores| rows, not the corpus, so the
    global ordering never sees corpus-sized data.  Degenerate inputs
    (no positives or no negatives) yield NULL ratio columns rather than
    a divide-by-zero."""
    from pyspark.sql.window import Window

    t = F.col(truth_col).cast("boolean")
    # NULL truth is "unlabeled", NULL margin is "unscored" — neither is
    # a class (the nb_train_scores rule); counting them would inflate
    # negatives / leak rows into no confusion cell
    scored = scored.where(
        t.isNotNull() & F.col(margin_col).isNotNull()
    )
    per = scored.groupBy(F.col(margin_col).alias("__m")).agg(
        F.sum(F.when(t, 1).otherwise(0)).alias("np"),
        F.sum(F.when(t, 0).otherwise(1)).alias("nn"),
    )
    w = Window.orderBy("__m")
    cum_below = F.coalesce(
        F.sum("nn").over(w.rowsBetween(Window.unboundedPreceding, -1)),
        F.lit(0),
    )
    pred_pos = F.col("__m") > 0
    agg = per.select(
        "np",
        "nn",
        # decimal(38,0): 2*P*N reaches 2^63 at P,N ~ 2e9 under a long
        # sum (the embedding_moments_nano overflow rule); DuckDB's
        # sum(BIGINT) is HUGEINT so the oracle mirrors exactly
        (F.col("np") * (2 * cum_below + F.col("nn")))
        .cast("decimal(38,0)")
        .alias("__u2"),
        F.when(pred_pos, F.col("np")).otherwise(F.lit(0)).alias("__tp"),
        F.when(pred_pos, F.col("nn")).otherwise(F.lit(0)).alias("__fp"),
        F.when(~pred_pos, F.col("nn")).otherwise(F.lit(0)).alias("__tn"),
        F.when(~pred_pos, F.col("np")).otherwise(F.lit(0)).alias("__fn"),
    ).agg(
        F.sum("np").cast("long").alias("n_pos"),
        F.sum("nn").cast("long").alias("n_neg"),
        F.sum("__tp").cast("long").alias("tp"),
        F.sum("__fp").cast("long").alias("fp"),
        F.sum("__tn").cast("long").alias("tn"),
        F.sum("__fn").cast("long").alias("fn"),
        F.sum("__u2").alias("u2"),
    )
    prec = F.when(
        F.col("tp") + F.col("fp") > 0,
        F.round(F.col("tp") / (F.col("tp") + F.col("fp")), 6),
    )
    rec = F.when(
        F.col("n_pos") > 0, F.round(F.col("tp") / F.col("n_pos"), 6)
    )
    # no tp>0 guard: under the two guards the denominator is positive,
    # so an all-wrong classifier scores f1 = 0.0, not NULL
    f1 = F.when(
        (F.col("tp") + F.col("fp") > 0) & (F.col("n_pos") > 0),
        F.round(
            2 * F.col("tp") / (2 * F.col("tp") + F.col("fp") + F.col("fn")),
            6,
        ),
    )
    auc = F.when(
        (F.col("n_pos") > 0) & (F.col("n_neg") > 0),
        F.round(
            F.col("u2").cast("double")
            / (2 * F.col("n_pos") * F.col("n_neg")),
            6,
        ),
    )
    return agg.select(
        "n_pos", "n_neg", "tp", "fp", "tn", "fn",
        prec.alias("precision"), rec.alias("recall"), f1.alias("f1"),
        auc.alias("auc"),
    )
