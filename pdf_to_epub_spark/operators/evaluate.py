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
    # Exclusive cumulative negatives via the keyed range-partitioned
    # machinery instead of an unpartitioned window: distinct margins are
    # bounded for calibrated scores but ~n for raw continuous floats, and
    # a corpus-sized caller would serialize the whole table through one
    # window task (the spearman_signals / rank_agreement contract; same
    # values, order-independent integer sums).
    from pdf_to_epub_spark.operators.bucketing import global_prefix_sums

    per = global_prefix_sums(per, ["__m"], "nn", "__cumnn")
    cum_below = F.col("__cumnn")
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


def cluster_pair_eval(
    assignments: DataFrame,
    pred_col: str = "pred",
    truth_col: str = "truth",
) -> DataFrame:
    """Pair-counting evaluation of a clustering (e.g. near-dup
    components) against ground-truth groups: precision / recall / F1
    over the "same-cluster" pair relation — the standard way to score a
    dedup run against labeled duplicate sets without materializing the
    O(n²) pairs.

    Everything reduces to three combiner-enabled aggregations of
    ``C(n, 2)`` cluster-size sums (predicted, true, and the joint
    (pred, truth) contingency cells = true-positive pairs) — exact
    integer math until the final three 6-dp divisions, so the result
    replays bit-for-bit in SQL at any scale.

    Returns one row: ``(n_items, tp_pairs, pred_pairs, true_pairs,
    precision, recall, f1)``; precision/recall are NULL when their
    denominator is 0, F1 is 0 when both are defined but 0.
    """
    def pair_sum(cols: list[str], alias: str) -> DataFrame:
        # per-group C(n,2) in INTEGER arithmetic (div, not /: Spark's
        # `/` on longs is a double and loses exactness past 2^53), the
        # cross-group sum in decimal(38,0) so it cannot wrap int64
        return (
            assignments.groupBy(*cols)
            .agg(F.count(F.lit(1)).alias("n"))
            .agg(
                F.sum(
                    # decimal BEFORE the multiply: n*(n-1) wraps int64
                    # past n ~ 3e9; the product is even so /2 is exact
                    F.col("n").cast("decimal(38,0)") * (F.col("n") - 1) / 2
                ).cast("long").alias(alias)
            )
        )

    tp = pair_sum([pred_col, truth_col], "tp_pairs")
    pp = pair_sum([pred_col], "pred_pairs")
    tt = pair_sum([truth_col], "true_pairs")
    n = assignments.agg(F.count(F.lit(1)).alias("n_items"))
    row = n.crossJoin(tp).crossJoin(pp).crossJoin(tt)
    prec = F.when(
        F.col("pred_pairs") > 0,
        F.round(
            F.col("tp_pairs").cast("double")
            / F.col("pred_pairs").cast("double"),
            6,
        ),
    )
    rec = F.when(
        F.col("true_pairs") > 0,
        F.round(
            F.col("tp_pairs").cast("double")
            / F.col("true_pairs").cast("double"),
            6,
        ),
    )
    f1 = F.when(
        prec.isNotNull() & rec.isNotNull(),
        F.when(
            prec + rec > 0, F.round(2.0 * prec * rec / (prec + rec), 6)
        ).otherwise(F.lit(0.0)),
    )
    return row.select(
        F.col("n_items").cast("long").alias("n_items"),
        "tp_pairs", "pred_pairs", "true_pairs",
        prec.alias("precision"), rec.alias("recall"), f1.alias("f1"),
    )


def rank_agreement(
    df: DataFrame,
    score_a: str = "score_a",
    score_b: str = "score_b",
    id_col: str = "doc_id",
) -> DataFrame:
    """Spearman rank agreement between two document scorers: rho = 1 −
    6·Σd² / (n(n²−1)) over ranks assigned by ``(score, id)`` — the
    "does the cheap quality score order documents like the expensive
    one" check run before swapping scorers in a filter cascade.

    Ranks are tie-broken by id, so they are permutations and the
    classic formula is exact.  A global ``row_number`` window would
    sort ALL rows in one task; instead each rank is assembled
    distributed: a cumulative-count window over the tiny DISTINCT-VALUE
    table gives each score value its starting offset, and a
    ``row_number`` window PARTITIONED by the value orders ties by id —
    every stage is keyed, nothing serializes on row count (only on
    distinct-score cardinality, the same contract as score_drift_ks).
    Σd² is an exact integer aggregate in a ``decimal(38,0)``
    accumulator; ``n(n²−1)`` is computed in doubles (n³ overflows
    int64 past ~2M rows — 15 significant digits is plenty for a
    correlation).

    Returns one row: ``(n, sum_d2, rho)``; rho NULL when n < 2.
    """
    from pyspark.sql.window import Window

    # rows with a NULL or NaN on EITHER side are dropped up front: the
    # offset window would count them (nulls sort first) while the
    # value-equi-join would drop them, leaving ranks that are no longer
    # a permutation of 1..n (rho can leave [-1, 1] silently).  NaN needs
    # isnan — Spark SQL defines NaN = NaN as TRUE — and isnan only
    # accepts floating columns, hence the dtype gate.
    cond = F.col(score_a).isNotNull() & F.col(score_b).isNotNull()
    types = dict(df.dtypes)
    for c in (score_a, score_b):
        if types.get(c) in ("float", "double"):
            cond = cond & ~F.isnan(F.col(c))
    df = df.where(cond)

    def _ranks(score: str, alias: str) -> DataFrame:
        # Starting offset per distinct value = EXCLUSIVE global prefix
        # count — the keyed range-partitioned form, not an unpartitioned
        # window over the distinct-value table (which is ~n rows for
        # continuous float scores; the score_drift_ks contract note).
        from pdf_to_epub_spark.operators.bucketing import global_prefix_sums

        slim = df.select(F.col(id_col).alias("id"), F.col(score).alias("v"))
        offsets = global_prefix_sums(
            slim.groupBy("v").agg(F.count(F.lit(1)).alias("c")),
            ["v"],
            "c",
            "off",
        ).select("v", "off")
        win = Window.partitionBy("v").orderBy("id")
        return slim.join(offsets, "v").select(
            "id",
            (F.col("off") + F.row_number().over(win)).cast("long").alias(alias),
        )

    ranked = _ranks(score_a, "ra").join(_ranks(score_b, "rb"), "id")
    d = F.col("ra") - F.col("rb")
    agg = ranked.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum((d * d).cast("decimal(38,0)")).cast("long").alias("sum_d2"),
    )
    nn = F.col("n").cast("double")
    rho = F.when(
        F.col("n") > 1,
        F.round(
            F.lit(1.0)
            - 6.0 * F.col("sum_d2").cast("double")
            / (nn * (nn * nn - F.lit(1.0))),
            6,
        ) + F.lit(0.0),
    )
    return agg.select(
        F.col("n").cast("long").alias("n"),
        F.col("sum_d2").cast("long").alias("sum_d2"),
        rho.alias("rho"),
    )


def score_drift_ks(
    sample_a: DataFrame,
    sample_b: DataFrame,
    value_col: str = "v",
) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov drift statistic between two score
    samples (yesterday's crawl vs today's, corpus A vs corpus B): D =
    max |F_a(v) − F_b(v)| over the pooled distinct values, plus the
    value where the gap peaks — the standard "did the distribution
    move" alarm for ingest monitoring.

    Shape: one union with side tags → one groupBy per distinct value
    (conditional counts) → running-sum windows over the distinct-value
    table (cardinality = distinct scores, NOT rows — pre-round
    continuous scores if that ever approaches row count) → one max.
    The gap is evaluated AFTER absorbing all rows of a value, which is
    the correct right-continuous ECDF convention and makes ties
    order-free.

    Returns one row: ``(n_a, n_b, d_stat, at_value)`` (D at 6 dp,
    smallest peak value wins ties).
    """
    from pyspark.sql.window import Window

    tagged = sample_a.select(
        F.col(value_col).alias("v"), F.lit(1).alias("ia"), F.lit(0).alias("ib")
    ).unionByName(
        sample_b.select(
            F.col(value_col).alias("v"),
            F.lit(0).alias("ia"),
            F.lit(1).alias("ib"),
        )
    )
    per = tagged.groupBy("v").agg(
        F.sum("ia").alias("ca"), F.sum("ib").alias("cb")
    )
    # Both inclusive ECDF counts in ONE keyed range pass (exclusive
    # prefix + own count) — replaces two unpartitioned running-sum
    # windows that would serialize the distinct-value table through a
    # single task when scores are raw continuous floats; totals come
    # from a 1-row broadcast instead of an all-rows frame.
    from pdf_to_epub_spark.operators.bucketing import global_prefix_sums

    cums = global_prefix_sums(
        per, ["v"], ["ca", "cb"], ["__xa", "__xb"]
    ).select(
        "v",
        (F.col("__xa") + F.col("ca")).alias("cum_a"),
        (F.col("__xb") + F.col("cb")).alias("cum_b"),
    )
    # totals = the ECDF maxima — re-reads the prefix-sum machinery's own
    # lazy checkpoint, so the union+groupBy subtree still executes once
    totals = cums.agg(
        F.max("cum_a").alias("n_a"), F.max("cum_b").alias("n_b")
    )
    curve = cums.crossJoin(F.broadcast(totals)).select(
        "v", "n_a", "n_b",
        F.round(
            F.abs(
                F.col("cum_a").cast("double") / F.col("n_a").cast("double")
                - F.col("cum_b").cast("double") / F.col("n_b").cast("double")
            ),
            6,
        ).alias("gap"),
    )
    # (gap desc, v asc) is a total order (v is unique), so the peak row
    # is orderBy + limit(1) — compiles to TakeOrderedAndProject
    # (per-partition heaps), not a row_number window serializing the
    # whole curve through one task.
    return curve.orderBy(F.desc("gap"), F.asc("v")).limit(1).select(
        F.col("n_a").cast("long").alias("n_a"),
        F.col("n_b").cast("long").alias("n_b"),
        F.col("gap").alias("d_stat"),
        F.col("v").alias("at_value"),
    )


def retrieval_eval(
    results: DataFrame,
    qrels: DataFrame,
    k: int = 10,
    qid_col: str = "qid",
    doc_col: str = "doc_id",
    rank_col: str = "rank",
) -> DataFrame:
    """Per-query retrieval metrics for a ranked run (e.g. bm25_topk)
    against binary relevance judgments: precision@k, recall@k,
    reciprocal rank, and nDCG@k (binary gains) — the IR-eval
    counterpart of the classifier eval.

    One broadcast-able inner join marks relevant result rows, one
    combiner-enabled groupBy per query aggregates hits / first-hit rank
    / the DCG sum; ideal DCG comes from the qrel counts (closed form
    over min(n_rel, k) — a sequence-HOF fold, no second shuffle).  DCG
    terms are quantized to integer NANO-units (``round(1e9 /
    log2(rank+1))``) before summing so the per-query sum is
    partition-order independent and SQL-replayable (the micro-nat
    convention).  Queries with no judged-relevant docs are dropped
    (metrics undefined); queries whose run returned nothing still
    appear via the qrel side with zero scores.

    Returns ``(qid, n_rel, hits_k, p_at_k, r_at_k, rr, ndcg_k)``, all
    ratios 6 dp.
    """
    rel = qrels.select(
        F.col(qid_col).alias("qid"), F.col(doc_col).alias("doc_id"),
        F.lit(1).alias("__rel"),
    ).distinct()
    run = results.select(
        F.col(qid_col).alias("qid"), F.col(doc_col).alias("doc_id"),
        F.col(rank_col).cast("long").alias("rank"),
    )
    marked = run.join(rel, ["qid", "doc_id"], "left")
    per_q = marked.groupBy("qid").agg(
        F.count(F.when((F.col("__rel") == 1) & (F.col("rank") <= k), 1))
        .cast("long").alias("hits_k"),
        F.min(F.when(F.col("__rel") == 1, F.col("rank"))).alias("first_rel"),
        F.sum(
            F.when(
                (F.col("__rel") == 1) & (F.col("rank") <= k),
                F.round(
                    F.lit(1e9) / F.log2(F.col("rank").cast("double") + 1.0)
                ).cast("long"),
            ).otherwise(F.lit(0).cast("long"))
        ).alias("dcg_nano"),
    )
    n_rel = rel.groupBy("qid").agg(F.count(F.lit(1)).alias("n_rel"))
    joined = n_rel.join(per_q, "qid", "left")
    ideal_nano = F.expr(
        f"aggregate(sequence(1, int(least(n_rel, {k}))), 0L,"
        " (acc, r) -> acc + bigint(round(1e9 / log2(double(r) + 1.0d))))"
    )
    hits = F.coalesce(F.col("hits_k"), F.lit(0))
    return joined.select(
        "qid",
        F.col("n_rel").cast("long").alias("n_rel"),
        hits.alias("hits_k"),
        F.round(hits.cast("double") / k, 6).alias("p_at_k"),
        F.round(
            hits.cast("double") / F.col("n_rel").cast("double"), 6
        ).alias("r_at_k"),
        F.round(
            F.coalesce(1.0 / F.col("first_rel").cast("double"), F.lit(0.0)),
            6,
        ).alias("rr"),
        F.round(
            F.coalesce(F.col("dcg_nano"), F.lit(0)).cast("double")
            / ideal_nano.cast("double"),
            6,
        ).alias("ndcg_k"),
    )


def calibration_bins(
    df: DataFrame,
    score_col: str = "score",
    label_col: str = "label",
    bins: int = 10,
) -> DataFrame:
    """Reliability diagram + expected calibration error (ECE, Naeini et
    al. 2015) for a probabilistic quality classifier: bucket predictions
    into equal-width confidence bins, compare each bin's mean confidence
    against its empirical positive rate.  A filter cascade that keeps
    "score ≥ 0.9" documents is only as good as the calibration of that
    0.9 — this is the audit run before trusting a threshold picked on
    the score scale.

    Two map-side-combined aggregations (per-bin, then the bin table —
    ≤ ``bins`` rows — folds into one ECE scalar); nothing shuffles more
    than the bin key.  Confidence sums ride in exact micro-unit
    integers (round(score·1e6) per row) so the per-bin means are
    order-independent and replay exactly in the SQL oracle; NULL and
    NaN scores/labels are dropped up front (same hygiene as
    rank_agreement).

    Returns one row per non-empty bin: ``(bin, n, avg_conf, frac_pos,
    gap, ece)`` — ``ece`` (the Σ n_b/N · |gap_b| scalar) repeated on
    every row for single-result convenience.
    """
    cond = F.col(score_col).isNotNull() & F.col(label_col).isNotNull()
    types = dict(df.dtypes)
    for c in (score_col, label_col):
        if types.get(c) in ("float", "double"):
            cond = cond & ~F.isnan(F.col(c))
    s = F.col(score_col).cast("double")
    # clamp BOTH ends: score 1.0 folds into the top bin, and an
    # un-clipped negative score lands in bin 0 instead of minting a
    # phantom "bin -1" that would pollute the ECE fold
    d = df.where(cond).select(
        F.greatest(
            F.lit(0), F.least(F.lit(bins - 1), F.floor(s * bins))
        ).cast("int").alias("bin"),
        F.round(s * 1e6, 0).cast("long").alias("_cm"),
        F.col(label_col).cast("boolean").cast("long").alias("_pos"),
    )
    per = d.groupBy("bin").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("_cm").alias("_conf"),
        F.sum("_pos").alias("_npos"),
    )
    conf = F.col("_conf").cast("double") / (F.lit(1e6) * F.col("n").cast("double"))
    pos = F.col("_npos").cast("double") / F.col("n").cast("double")
    # |mean_conf − frac_pos|·n in exact micro-units: |Σcm − npos·1e6| —
    # the ECE numerator stays integer, so the 10-bin fold is
    # order-independent (float Σ n·|gap| would not be).
    absdiff = F.abs(F.col("_conf") - F.col("_npos") * F.lit(1000000))
    per = per.select(
        "bin", "n",
        (F.round(conf, 6) + F.lit(0.0)).alias("avg_conf"),
        (F.round(pos, 6) + F.lit(0.0)).alias("frac_pos"),
        (
            F.round(
                absdiff.cast("double") / (F.lit(1e6) * F.col("n").cast("double")), 6
            )
            + F.lit(0.0)
        ).alias("gap"),
        absdiff.alias("_w"),
    ).localCheckpoint(eager=False)
    tot = per.agg(
        F.when(
            F.sum("n") > 0,
            F.round(
                F.sum("_w").cast("double") / (F.lit(1e6) * F.sum("n").cast("double")),
                6,
            )
            + F.lit(0.0),
        ).alias("ece")
    )
    return per.crossJoin(F.broadcast(tot)).select(
        "bin", "n", "avg_conf", "frac_pos", "gap", "ece"
    )


def proportion_test(
    df: DataFrame,
    group_col: str = "group",
    success_col: str = "success",
    z_crit: float = 1.959963984540054,
) -> DataFrame:
    """Two-sample proportion z-test between exactly two groups — the
    "did the new filter/extractor change the keep rate beyond noise"
    gate run before swapping pipeline stages.  Pooled-variance form:
    z = (p̂_a − p̂_b) / √(p̂(1−p̂)(1/n_a + 1/n_b)).

    One count aggregation (all four cells are exact integers —
    map-side-combined, order-free); the z formula is a single double
    expression the SQL oracle mirrors term-for-term.  Raises when the
    table carries ≠ 2 distinct groups (a silent one-group z would read
    as "not significant"); NULL group keys are dropped up front rather
    than counted as a third group.  Groups are ordered by key so
    (a, b) is deterministic, and the driver-side collect is bounded by
    a ``limit(3)`` (TakeOrdered) — a high-cardinality group column
    raises instead of materializing the whole group table.

    Returns one row: ``(group_a, group_b, n_a, n_b, rate_a, rate_b, z,
    significant)``; z NULL when a pooled variance of 0 makes it
    undefined (all successes or all failures).
    """
    counts = (
        df.where(F.col(group_col).isNotNull())
        .groupBy(F.col(group_col).alias("g"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.col(success_col).cast("boolean").cast("long"))
            .cast("long")
            .alias("pos"),
        )
        .orderBy("g")
        .limit(3)
        .collect()
    )
    if len(counts) != 2:
        got = "3 or more" if len(counts) == 3 else str(len(counts))
        raise ValueError(
            f"proportion_test needs exactly 2 groups, got {got}"
        )
    (ga, na, pa), (gb, nb, pb) = [tuple(r) for r in counts]
    spark = df.sparkSession
    base = spark.createDataFrame(
        [(str(ga), str(gb), na, nb, pa, pb)],
        "group_a string, group_b string, n_a long, n_b long, "
        "pos_a long, pos_b long",
    )
    ra = F.col("pos_a").cast("double") / F.col("n_a").cast("double")
    rb = F.col("pos_b").cast("double") / F.col("n_b").cast("double")
    pooled = (F.col("pos_a") + F.col("pos_b")).cast("double") / (
        F.col("n_a") + F.col("n_b")
    ).cast("double")
    var = (
        pooled
        * (F.lit(1.0) - pooled)
        * (
            F.lit(1.0) / F.col("n_a").cast("double")
            + F.lit(1.0) / F.col("n_b").cast("double")
        )
    )
    z = F.when(var > 0, F.round((ra - rb) / F.sqrt(var), 6) + F.lit(0.0))
    return base.select(
        "group_a", "group_b", "n_a", "n_b",
        (F.round(ra, 6) + F.lit(0.0)).alias("rate_a"),
        (F.round(rb, 6) + F.lit(0.0)).alias("rate_b"),
        z.alias("z"),
        F.when(var > 0, F.abs((ra - rb) / F.sqrt(var)) > F.lit(z_crit))
        .otherwise(F.lit(False))
        .alias("significant"),
    )


def feature_mi(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str = "label",
    bins: int = 10,
) -> DataFrame:
    """Mutual information I(feature; label) per feature, the
    filter-method feature ranking for quality-signal audits: which
    cheap per-document signals actually carry information about the
    (expensive) label a classifier is being trained to predict.

    Each feature is equal-width binned into ``bins`` buckets between
    its own min and max (constant features collapse to one bucket and
    score 0), and MI is computed from the (bin, label) contingency
    counts: ``Σ (n_xy/N)·ln(n_xy·N / (n_x·n_y))``.  Each term is
    quantized to integer micro-nats BEFORE the sum (the corpus_
    diversity convention), so the total is order-independent and
    engine-exact.  Count products ride doubles inside the log (at
    10^12 rows an int64 ``n_xy·N`` wraps).

    Scale shape: one stack() unpivot (rows × n_features, no shuffle),
    one groupBy per contingency cell, then everything else runs on the
    tiny cell table (≤ bins·|labels| rows per feature).  Min/max come
    from the same cell-table pass — a pre-aggregation keyed on
    (feature, bin would need the range first), so ranges ride one slim
    two-pass agg joined back broadcast.

    Rows with NULL (or NaN) feature or NULL label are dropped per
    feature.  Returns ``(feature, n_rows, n_bins_used, mi_micro_nats)``.
    """
    if not feature_cols:
        raise ValueError("feature_mi needs at least one feature column")
    stack_args = ", ".join(
        f"'{c}', cast(`{c}` as double)" for c in feature_cols
    )
    lab = F.col(label_col).cast("string")
    melted = df.select(
        F.expr(
            f"stack({len(feature_cols)}, {stack_args}) as (feature, x)"
        ),
        lab.alias("y"),
    ).where(
        F.col("x").isNotNull() & ~F.isnan("x") & F.col("y").isNotNull()
    )
    ranges = melted.groupBy("feature").agg(
        F.min("x").alias("_lo"), F.max("x").alias("_hi")
    )
    binned = melted.join(F.broadcast(ranges), "feature").select(
        "feature",
        "y",
        F.when(F.col("_hi") > F.col("_lo"), F.least(
            F.lit(bins - 1),
            F.floor(
                (F.col("x") - F.col("_lo"))
                / (F.col("_hi") - F.col("_lo")) * bins
            ).cast("int"),
        )).otherwise(F.lit(0)).alias("bin"),
    )
    nxy = binned.groupBy("feature", "bin", "y").agg(
        F.count(F.lit(1)).cast("long").alias("n_xy")
    ).localCheckpoint(eager=False)  # feeds three marginal aggregates
    nx = nxy.groupBy("feature", "bin").agg(F.sum("n_xy").alias("n_x"))
    ny = nxy.groupBy("feature", "y").agg(F.sum("n_xy").alias("n_y"))
    nn = nxy.groupBy("feature").agg(F.sum("n_xy").alias("n"))
    cells = (
        nxy.join(nx, ["feature", "bin"])
        .join(ny, ["feature", "y"])
        .join(F.broadcast(nn), "feature")
    )
    term = F.round(
        F.lit(1e6)
        * (F.col("n_xy").cast("double") / F.col("n").cast("double"))
        * F.log(
            (F.col("n_xy").cast("double") * F.col("n").cast("double"))
            / (F.col("n_x").cast("double") * F.col("n_y").cast("double"))
        ),
        0,
    ).cast("long")
    return (
        cells.groupBy("feature")
        .agg(
            F.max("n").cast("long").alias("n_rows"),
            F.countDistinct("bin").cast("int").alias("n_bins_used"),
            F.sum(term).cast("long").alias("mi_micro_nats"),
        )
        .orderBy(F.desc("mi_micro_nats"), F.asc("feature"))
    )


def rank_sum_test(
    df: DataFrame,
    value_col: str = "value",
    group_col: str = "group",
    z_crit: float = 1.959963984540054,
) -> DataFrame:
    """Mann-Whitney U rank-sum test between exactly two groups — the
    distribution-free "did the quality-score distribution shift" check
    (non-normal scores are the norm for web-text quality signals, where
    the proportion z-test of `proportion_test` doesn't apply).  Uses
    average ranks for ties and the tie-corrected normal approximation:

        U_a = R_a − n_a(n_a+1)/2,   μ = n_a·n_b/2
        σ² = (n_a·n_b/12)·((N+1) − Σ(t³−t)/(N(N−1)))
        z = (U_a − μ)/σ

    Nothing ranks row-by-row: with c(v) the count of value v and
    off(v) the cumulative count of strictly smaller values, the average
    rank of v is off(v) + (c(v)+1)/2, so R_a = Σ_v c_a(v)·avgrank(v)
    needs only the DISTINCT-VALUE table — the `rank_agreement` contract
    (every stage keyed; the one ordered window runs over distinct-score
    cardinality, not row count).  2·R_a and Σ(t³−t) are exact integers
    in decimal(38,0) accumulators, so the float math starts from
    engine-identical integers; z is rounded to 6 dp with a fixed
    operation order the SQL oracle replays term-for-term.

    Rows with a NULL group or NULL/NaN value are dropped up front.
    Raises when the table carries ≠ 2 distinct groups (bounded
    ``limit(3)`` probe, the `proportion_test` contract).  Returns one
    row: ``(group_a, group_b, n_a, n_b, u_a, u_b, z, significant)``;
    z is NULL when σ² = 0 (all values tied)."""
    from pyspark.sql.window import Window

    cond = F.col(group_col).isNotNull() & F.col(value_col).isNotNull()
    if dict(df.dtypes).get(value_col) in ("float", "double"):
        cond = cond & ~F.isnan(F.col(value_col))
    slim = df.where(cond).select(
        F.col(group_col).alias("g"), F.col(value_col).alias("v")
    )
    groups = [
        r["g"] for r in slim.select("g").distinct().orderBy("g").limit(3).collect()
    ]
    if len(groups) != 2:
        got = "3 or more" if len(groups) == 3 else str(len(groups))
        raise ValueError(f"rank_sum_test needs exactly 2 groups, got {got}")
    ga, gb = groups

    per_value = slim.groupBy("v").agg(
        F.count(F.lit(1)).cast("long").alias("c"),
        F.sum((F.col("g") == ga).cast("long")).cast("long").alias("c_a"),
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    ranked = per_value.select(
        "v",
        "c",
        "c_a",
        F.coalesce(F.sum("c").over(w), F.lit(0)).cast("long").alias("off"),
    )
    dec = "decimal(38,0)"
    two_avg = (
        F.lit(2).cast(dec) * F.col("off").cast(dec)
        + F.col("c").cast(dec)
        + F.lit(1).cast(dec)
    )
    sums = ranked.agg(
        F.sum(F.col("c_a").cast(dec) * two_avg).alias("two_r_a"),
        F.sum(
            F.col("c").cast(dec) * F.col("c").cast(dec) * F.col("c").cast(dec)
            - F.col("c").cast(dec)
        ).alias("tie_sum"),
        F.sum("c_a").cast("long").alias("n_a"),
        F.sum(F.col("c") - F.col("c_a")).cast("long").alias("n_b"),
    )
    n_a, n_b = F.col("n_a").cast("double"), F.col("n_b").cast("double")
    n = n_a + n_b
    u_a = (
        F.col("two_r_a").cast("double") / F.lit(2.0)
        - n_a * (n_a + F.lit(1.0)) / F.lit(2.0)
    )
    u_b = n_a * n_b - u_a
    var = (
        (n_a * n_b / F.lit(12.0))
        * (
            (n + F.lit(1.0))
            - F.col("tie_sum").cast("double") / (n * (n - F.lit(1.0)))
        )
    )
    z = F.when(
        var > 0,
        F.round((u_a - n_a * n_b / F.lit(2.0)) / F.sqrt(var), 6) + F.lit(0.0),
    )
    return sums.select(
        F.lit(str(ga)).alias("group_a"),
        F.lit(str(gb)).alias("group_b"),
        "n_a",
        "n_b",
        (u_a + F.lit(0.0)).alias("u_a"),
        (u_b + F.lit(0.0)).alias("u_b"),
        z.alias("z"),
        F.when(
            var > 0,
            F.abs((u_a - n_a * n_b / F.lit(2.0)) / F.sqrt(var)) > F.lit(z_crit),
        )
        .otherwise(F.lit(False))
        .alias("significant"),
    )


def cohen_kappa_pairs(
    ratings: DataFrame,
    item_col: str = "item_id",
    rater_col: str = "rater",
    label_col: str = "label",
) -> DataFrame:
    """Cohen's kappa for every unordered rater pair from a long
    ``(item, rater, label)`` table — the label-QA gate for human (or
    model-judge) annotation runs: raw agreement overstates reliability
    whenever the label marginals are skewed, which quality labels
    always are; kappa corrects by each pair's own chance-agreement
    floor.

    Exactness: over the pair's co-rated items, with ``n`` rows,
    ``agree`` matching rows, and per-label marginals ``a_l``/``b_l``,

        kappa = (n·agree − Σ_l a_l·b_l) / (n² − Σ_l a_l·b_l)

    — the (po−pe)/(1−pe) definition cleared of fractions, so both sides
    of the single 6-dp division are exact integers (decimal(38,0): n·n
    wraps int64 past n≈3e9) and the result replays bit-for-bit in SQL.

    Scale shape: one self-join on the item id (each item fans out to
    C(r_i,2) pair rows — raters per item is small and bounded), then a
    map-side-combinable groupBy on (rater_a, rater_b, label_a, label_b)
    whose cardinality is raters² × labels² — tiny regardless of corpus
    size.  Pairs that co-rate nothing don't appear; kappa is NULL when
    pe = 1 (both raters constant on the same label — undefined, not 1).
    """
    a = ratings.select(
        F.col(item_col).alias("_i"),
        F.col(rater_col).alias("rater_a"),
        F.col(label_col).alias("_la"),
    )
    b = ratings.select(
        F.col(item_col).alias("_i"),
        F.col(rater_col).alias("rater_b"),
        F.col(label_col).alias("_lb"),
    )
    joined = a.join(b, "_i").where(F.col("rater_a") < F.col("rater_b"))
    cells = joined.groupBy("rater_a", "rater_b", "_la", "_lb").agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("c")
    )
    # Σ_l a_l·b_l without a second corpus pass: marginals are sums of the
    # SAME contingency cells — a_l = Σ_lb c(l, lb), b_l = Σ_la c(la, l).
    al = cells.groupBy("rater_a", "rater_b", F.col("_la").alias("_l")).agg(
        F.sum("c").alias("a_l")
    )
    bl = cells.groupBy("rater_a", "rater_b", F.col("_lb").alias("_l")).agg(
        F.sum("c").alias("b_l")
    )
    chance = (
        al.join(bl, ["rater_a", "rater_b", "_l"], "full")
        .na.fill(0, ["a_l", "b_l"])
        .groupBy("rater_a", "rater_b")
        .agg(F.sum(F.col("a_l") * F.col("b_l")).alias("sum_ab"))
    )
    totals = cells.groupBy("rater_a", "rater_b").agg(
        F.sum("c").alias("n"),
        F.sum(F.when(F.col("_la") == F.col("_lb"), F.col("c")).otherwise(
            F.lit(0).cast("decimal(38,0)"))).alias("agree"),
    )
    out = totals.join(chance, ["rater_a", "rater_b"])
    n, agree, sab = F.col("n"), F.col("agree"), F.col("sum_ab")
    denom = n * n - sab
    return out.select(
        "rater_a",
        "rater_b",
        n.cast("long").alias("n_items"),
        agree.cast("long").alias("n_agree"),
        F.round(agree.cast("double") / n.cast("double"), 6).alias("po"),
        F.round(sab.cast("double") / (n * n).cast("double"), 6).alias("pe"),
        F.when(
            denom != 0,
            F.round(
                (n * agree - sab).cast("double") / denom.cast("double"), 6
            ),
        ).alias("kappa"),
    )


def _agreement_parts(
    ratings: DataFrame,
    item_col: str,
    label_col: str,
    nano_expr: str,
    nano_alias: str,
) -> DataFrame:
    """Shared multi-rater agreement plumbing (fleiss_kappa /
    krippendorff_alpha): per-(item,label) counts → per-item (n_i,
    Σ n_il²) over items with ≥2 ratings → one global row carrying
    ``n_items``, ``n_ratings``, ``sum_cj_sq`` (Σ of squared global label
    counts over included items) and the decimal sum of ``nano_expr`` (an
    exact integral-`div` nano-quantized per-item rational over the
    ``n_i``/``sum_sq`` columns) as ``nano_alias``.  `div`, NOT decimal
    `/` + floor: Spark decimal division HALF_UP-rounds at the result
    scale first, which can flip the floor when the true quotient sits
    within 5e-7 of an integer (possible once n_i(n_i−1) > 2e6); the
    quantized rationals are ≥ 0, so truncation IS floor."""
    per_cell = ratings.groupBy(
        F.col(item_col).alias("_i"), F.col(label_col).alias("_l")
    ).agg(F.count(F.lit(1)).alias("n_il"))
    per_item = per_cell.groupBy("_i").agg(
        F.sum("n_il").alias("n_i"),
        F.sum(F.col("n_il") * F.col("n_il")).alias("sum_sq"),
    ).where(F.col("n_i") >= 2)
    agg = per_item.select(
        F.expr(nano_expr).cast("decimal(38,0)").alias("_nano"), "n_i"
    ).agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum("_nano").alias(nano_alias),
        F.sum("n_i").cast("decimal(38,0)").alias("n_ratings"),
    )
    labels = (
        per_cell.join(per_item.select("_i"), "_i")
        .groupBy("_l")
        .agg(F.sum("n_il").cast("decimal(38,0)").alias("c_j"))
        .agg(F.sum(F.col("c_j") * F.col("c_j")).alias("sum_cj_sq"))
    )
    return agg.crossJoin(labels)


def fleiss_kappa(
    ratings: DataFrame,
    item_col: str = "item_id",
    rater_col: str = "rater",
    label_col: str = "label",
) -> DataFrame:
    """Fleiss' kappa (one row) over a long ``(item, rater, label)``
    table — the multi-rater generalization, tolerant of a variable
    rater count per item (items with fewer than 2 ratings are excluded
    from the agreement mean, per the standard treatment of missing
    assignments).

    Exactness contract: the per-item agreement P_i = (Σ_j n_ij² − n_i)
    / (n_i(n_i−1)) is a rational with an item-dependent denominator, so
    a double sum would be order-dependent.  Each P_i is quantized to
    integer NANO-units with floor division (exact, replayable —
    same device as the nDCG and LM-score operators), summed as
    decimal, and divided once.  Chance agreement P̄e = Σ_j c_j² / N²
    is exact integers end-to-end (global label counts c_j over the
    included items, N = Σ n_i).  kappa = (P̄ − P̄e)/(1 − P̄e) with both
    terms already 6-dp-stable; NULL when P̄e = 1.

    Scale: two map-side-combinable aggregations (item×label, then
    global) — no joins on the corpus axis beyond the slim per-item
    counts (shared plumbing: :func:`_agreement_parts`).
    """
    # nano-quantized P_i: floor(1e9 * (sum_sq - n_i) / (n_i*(n_i-1)))
    out = _agreement_parts(
        ratings,
        item_col,
        label_col,
        "(CAST(sum_sq - n_i AS DECIMAL(38,0)) * 1000000000)"
        " div (CAST(n_i AS DECIMAL(38,0)) * (n_i - 1))",
        "sum_p_nano",
    )
    p_bar = F.col("sum_p_nano").cast("double") / (
        F.col("n_items").cast("double") * 1e9
    )
    p_e = F.col("sum_cj_sq").cast("double") / (
        F.col("n_ratings") * F.col("n_ratings")
    ).cast("double")
    return out.select(
        F.col("n_items").cast("long").alias("n_items"),
        F.col("n_ratings").cast("long").alias("n_ratings"),
        F.round(p_bar, 6).alias("p_bar"),
        F.round(p_e, 6).alias("p_e"),
        F.when(
            F.round(p_e, 9) != 1.0,
            F.round((p_bar - p_e) / (1.0 - p_e), 6),
        ).alias("kappa"),
    )


def krippendorff_alpha(
    ratings: DataFrame,
    item_col: str = "item_id",
    rater_col: str = "rater",
    label_col: str = "label",
) -> DataFrame:
    """Krippendorff's alpha, nominal metric (one row) over a long
    ``(item, rater, label)`` table — the agreement statistic designed
    for MISSING ratings: Cohen's kappa only sees complete pairs and
    Fleiss' chance term assumes rater-interchangeable marginals, while
    alpha weighs every item by its own pairable-rating count.

    Pair-counting definition (computed exactly, no coincidence-matrix
    approximation): within an item with n_u ratings and per-label
    counts n_uc, the disagreeing ordered pairs number n_u² − Σ_c n_uc²,
    each weighted 1/(n_u−1), so

        D_o = (1/N) Σ_u (n_u² − Σ_c n_uc²)/(n_u−1)
        D_e = (N² − Σ_c n_c²)/(N(N−1))        alpha = 1 − D_o/D_e

    over items with ≥2 ratings (N = their total rating count, n_c the
    global label counts).  The per-item rational is nano-quantized with
    exact integral `div` (the Fleiss device), summed as decimal, and
    divided once; D_e is exact integers end-to-end.  alpha is NULL when
    D_e = 0 (all ratings one label — no disagreement is expressible).

    Scale: the same two map-side-combinable aggregations as
    :func:`fleiss_kappa` — nothing joins on the corpus axis (shared
    plumbing: :func:`_agreement_parts`).
    """
    out = _agreement_parts(
        ratings,
        item_col,
        label_col,
        "(CAST(n_i * n_i - sum_sq AS DECIMAL(38,0)) * 1000000000)"
        " div CAST(n_i - 1 AS DECIMAL(38,0))",
        "sum_d_nano",
    )
    n = F.col("n_ratings")
    d_o = F.col("sum_d_nano").cast("double") / (
        n.cast("double") * 1e9
    )
    d_e = (n * n - F.col("sum_cj_sq")).cast("double") / (
        n * (n - 1)
    ).cast("double")
    return out.select(
        F.col("n_items").cast("long").alias("n_items"),
        n.cast("long").alias("n_ratings"),
        F.round(d_o, 6).alias("d_o"),
        F.round(d_e, 6).alias("d_e"),
        F.when(d_e > 0, F.round(1.0 - d_o / d_e, 6)).alias("alpha"),
    )

def chi2_independence(
    df: DataFrame, a_col: str, b_col: str
) -> DataFrame:
    """Pearson chi-square test of independence over the (a, b)
    contingency table — the corpus-audit significance check ("is quality
    bucket independent of source domain?").  Rows where either category
    is NULL are excluded (a NULL level has no cell in the dense grid;
    counting it only in the margins corrupts E and dof).  Returns ONE
    row: ``(n, a_levels, b_levels, dof, chi2_nano)`` with
    ``chi2 = Σ_cells (O·N − r_a·c_b)² / (N·r_a·c_b)`` — the
    fraction-cleared form of Σ (O−E)²/E, E = r_a·c_b/N.

    Engine determinism: per cell, the numerator ``q = O·N − r_a·c_b``
    and denominator ``N·r_a·c_b`` are exact integers (DECIMAL(38,0) /
    HUGEINT); the cell term is ONE double expression of their exactly-
    converted values — ``round((q·q/den)·1e9)`` with identical
    association on both engines — then an integer sum (order-free).
    Doubles rather than pure integers because ``q²·1e9`` overflows 38
    digits once N exceeds ~1.8e7; IEEE-correct rounding of identical
    inputs gives identical outputs either way.

    Scale shape: one map-side-combined (a, b) count is the only
    corpus-volume exchange; margins and the dense grid (every (a, b)
    combination contributes its expected count even at O = 0) are
    broadcast algebra on the ≤|A|·|B|-row cell table behind a lazy
    checkpoint."""
    # NULL levels are excluded up front: groupBy would keep a NULL level
    # in the margins and N, but the grid's equi-join back to obs never
    # matches NULL keys — those cells would silently read O=0 while
    # their real counts inflate E, grossly overstating chi2 (and
    # count_distinct would exclude the level from dof, making dof
    # inconsistent with the grid actually summed).  Caught in review.
    obs = (
        df.select(F.col(a_col).alias("_a"), F.col(b_col).alias("_b"))
        .where(F.col("_a").isNotNull() & F.col("_b").isNotNull())
        .groupBy("_a", "_b")
        .agg(F.count(F.lit(1)).alias("_o"))
        .localCheckpoint(eager=False)
    )
    ra = obs.groupBy("_a").agg(F.sum("_o").alias("_ra"))
    cb = obs.groupBy("_b").agg(F.sum("_o").alias("_cb"))
    tot = obs.agg(F.sum("_o").alias("_n"))
    grid = (
        ra.crossJoin(F.broadcast(cb))
        .join(obs, ["_a", "_b"], "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "_a",
            "_b",
            F.coalesce(F.col("_o"), F.lit(0)).alias("_o"),
            "_ra",
            "_cb",
            "_n",
        )
    )
    dec = "decimal(38,0)"
    q = (
        F.col("_o").cast(dec) * F.col("_n").cast(dec)
        - F.col("_ra").cast(dec) * F.col("_cb").cast(dec)
    ).cast("double")
    den = (
        F.col("_n").cast(dec) * F.col("_ra").cast(dec) * F.col("_cb").cast(dec)
    ).cast("double")
    term = F.round((q * q / den) * F.lit(1e9), 0).cast("long")
    cells = grid.select("_a", "_b", term.alias("_t"))
    dims = (
        cells.agg(
            F.count_distinct("_a").alias("_al"),
            F.count_distinct("_b").alias("_bl"),
            F.sum("_t").alias("chi2_nano"),
        )
    )
    return dims.crossJoin(F.broadcast(tot)).select(
        F.col("_n").cast("long").alias("n"),
        F.col("_al").cast("long").alias("a_levels"),
        F.col("_bl").cast("long").alias("b_levels"),
        ((F.col("_al") - 1) * (F.col("_bl") - 1)).cast("long").alias("dof"),
        F.col("chi2_nano").cast("long").alias("chi2_nano"),
    )


def cramers_v(df: DataFrame, a_col: str, b_col: str) -> DataFrame:
    """Cramér's V effect size on top of :func:`chi2_independence` —
    the companion a significance test needs at corpus scale, where N is
    so large that EVERY association is "significant": V = sqrt(chi2 /
    (N·min(a−1, b−1))) ∈ [0, 1] measures strength, not detectability.

    One float chain over the exact integer inputs (chi2_nano, n, the
    min dof), identically associated in the SQL oracle:
    ``round(sqrt((chi2_nano/1e9) / (n·m)) · 1e6)`` micro-units.  Same
    single-pass plan as the chi-square (this just appends algebra to
    its one-row output)."""
    base = chi2_independence(df, a_col, b_col)
    m = F.least(F.col("a_levels") - 1, F.col("b_levels") - 1)
    v = F.round(
        F.sqrt(
            (F.col("chi2_nano").cast("double") / F.lit(1e9))
            / (F.col("n") * m).cast("double")
        )
        * F.lit(1e6),
        0,
    ).cast("long")
    return base.select(
        "n",
        "a_levels",
        "b_levels",
        "dof",
        "chi2_nano",
        F.when(m > 0, v).alias("v_micro"),
    )
