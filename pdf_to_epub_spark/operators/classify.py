"""Model-based quality filtering: a hashed-feature linear classifier
scored entirely JVM-side.

The production pattern (fastText-style quality models in CCNet/Dolma
pipelines): tokens hash into a fixed feature space, a pretrained weight
vector scores the mean feature weight, a sigmoid turns it into a keep
probability.  Nothing here needs Python on the hot path — the hash is
``md5``, the weight lookup is pure arithmetic on the bucket id, and the
per-document sum is a higher-order ``aggregate`` over the materialized
token array, so scoring is ZERO-shuffle and scales with input splits.

The shipped weights are a deterministic function of the bucket id (a
synthetic stand-in the DuckDB oracle replays bit-for-bit).  A real model
drops in two ways without changing the plan shape: weights as a literal
``CASE``/array lookup when the feature space is small, or a broadcast
(bucket, weight) join when it isn't — either way the corpus table never
shuffles.

Float contract: the token array gives BOTH engines the same left-to-right
summation order, so the raw score is bit-identical, and round(6) absorbs
libm ulp drift in the sigmoid's ``exp``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pdf_to_epub_spark.operators.textstats import _tokens

N_BUCKETS = 1024
_WEIGHT_MOD = 997  # coprime to the bucket count: spreads weights


def _bucket(tok: Column) -> Column:
    """Feature bucket: 60-bit md5 of 'feat:<token>' mod N_BUCKETS (the
    same hex-prefix hash idiom as operators.md5_hash60, inlined so it
    stays valid inside a HOF lambda)."""
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit("feat:"), tok)), 1, 15), 16, 10
    ).cast("long")
    return h % N_BUCKETS


def _weight(tok: Column) -> Column:
    """Synthetic pretrained weight in [-0.5, 0.5] as a pure function of
    the feature bucket."""
    return ((_bucket(tok) % _WEIGHT_MOD) / F.lit(float(_WEIGHT_MOD - 1))) - 0.5


def classifier_scores(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.5,
) -> DataFrame:
    """Score every document with the hashed linear model: raw score =
    mean feature weight over letter tokens (repeats count — term
    frequency IS the feature value), prob = sigmoid(4·raw), keep =
    prob >= threshold.  Token-free documents score raw 0 / prob 0.5.

    Output: ``(<id_col>, n_feats, raw_score, prob, keep)``; raw/prob
    rounded to 6 dp.

    The token array is materialized ONCE before the lambda (the 60×
    re-tokenization trap: an array-producing expression inside a HOF
    re-evaluates per element)."""
    toks = docs.select(F.col(id_col), _tokens(text_col).alias("__toks"))
    n, raw, prob = _score_cols()
    return toks.select(
        F.col(id_col),
        n.cast("long").alias("n_feats"),
        F.round(raw, 6).alias("raw_score"),
        F.round(prob, 6).alias("prob"),
        (prob >= threshold).alias("keep"),
    )


def _score_cols() -> tuple[Column, Column, Column]:
    """(n_tokens, raw_score, prob) over a materialized ``__toks`` array
    column."""
    s = F.aggregate(
        F.col("__toks"),
        F.lit(0.0),
        lambda acc, t: acc + _weight(t),
    )
    n = F.size("__toks")
    raw = s / F.greatest(F.lit(1), n)
    prob = F.lit(1.0) / (F.lit(1.0) + F.exp(F.lit(-4.0) * raw))
    return n, raw, prob


def classifier_gate(
    docs: DataFrame,
    threshold: float = 0.5,
    text_col: str = "text",
) -> DataFrame:
    """Filter form of :func:`classifier_scores` for pipeline wiring:
    keeps every input column, drops rows whose keep-probability is below
    ``threshold``.  Computed in-row (no groupBy, no join-back — a
    score-then-join plan would re-run the upstream subtree), so it
    composes into an ingest chain as one more narrow filter."""
    _, _, prob = _score_cols()
    return (
        docs.withColumn("__toks", _tokens(text_col))
        .where(prob >= threshold)
        .drop("__toks")
    )


def calibrate_scores(
    df: DataFrame,
    score_col: str = "score",
    group_col: str = "source",
    id_col: str = "doc_id",
    bucket_dp: int = 3,
) -> DataFrame:
    """Per-source quality-score calibration: every document's score is
    mapped to its percent-rank WITHIN its source (RANK ties-share
    semantics: ``(rank_min − 1) / (n − 1)``, 0 for singleton groups) —
    so a "keep the top 30%" threshold transfers across sources whose
    raw classifier distributions differ (the quality-classifier
    calibration step mixes like DCLM/FineWeb apply before cross-source
    thresholds).

    Scale shape: sources are few and huge, so a plain
    ``Window.partitionBy(source).orderBy(score)`` serializes each source
    through one task.  Instead the two-phase range-bucket form shared
    with sampling.token_budget_select / domain_caps_exact:
    ``round(score, bucket_dp)`` monotonically coarsens the order key,
    rank-within-bucket (parallel) plus an exclusive cross-bucket count
    offset (slim broadcast) reconstructs the exact per-source min-rank —
    equal scores always land in the same bucket, so RANK tie semantics
    survive the split.  Scores are rounded to 6 dp before ranking
    (engine-stable order); the oracle is DuckDB's native
    ``percent_rank()``."""
    from pyspark.sql.window import Window

    s = F.round(F.col(score_col), 6)
    rows = df.select(
        id_col,
        F.col(group_col).alias("_g"),
        s.alias("_s"),
    ).withColumn("_b", F.round(F.col("_s"), bucket_dp))
    # NULLS LAST on both levels (Spark asc defaults nulls-FIRST) so a
    # null score ranks exactly where DuckDB's percent_rank puts it.
    w = Window.partitionBy("_g", "_b").orderBy(F.asc_nulls_last("_s"))
    off_w = (
        Window.partitionBy("_og")
        .orderBy(F.asc_nulls_last("_ob"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = (
        rows.groupBy(F.col("_g").alias("_og"), F.col("_b").alias("_ob"))
        .agg(F.count("*").alias("_n"))
        .select(
            "_og",
            "_ob",
            F.coalesce(F.sum("_n").over(off_w), F.lit(0)).alias("_off"),
            F.sum("_n").over(
                Window.partitionBy("_og").rowsBetween(
                    Window.unboundedPreceding, Window.unboundedFollowing
                )
            ).alias("_gn"),
        )
    )
    ranked = (
        rows.withColumn("_r", F.rank().over(w))
        .join(
            F.broadcast(offsets),
            # eqNullSafe on BOTH keys: a null score means a null bucket,
            # and a null-unsafe bucket equality would silently drop the
            # row (violating one-verdict-row-per-document).
            (F.col("_g").eqNullSafe(F.col("_og")))
            & (F.col("_b").eqNullSafe(F.col("_ob"))),
        )
        .withColumn("_rank", F.col("_off") + F.col("_r"))
    )
    pct = F.when(
        F.col("_gn") > 1,
        F.round((F.col("_rank") - 1) / (F.col("_gn") - 1), 6),
    ).otherwise(F.lit(0.0))
    return ranked.select(
        id_col,
        F.col("_g").alias(group_col),
        F.col("_s").alias("score"),
        pct.alias("pct_rank"),
    )


_MICRO = 1_000_000


def nb_train_scores(
    docs: DataFrame,
    labels: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    label_col: str = "label",
    n_buckets: int = 512,
) -> DataFrame:
    """Distributed multinomial Naive Bayes: TRAIN on the labeled subset,
    score every document — the train-your-own counterpart of
    :func:`classifier_scores` (whose weights are pretrained).

    Training is one distributed aggregation: labeled docs' tokens hash
    into ``n_buckets`` features (``md5('nb:'||token)`` 60-bit prefix mod
    buckets — the oracle-replayable idiom), ``groupBy(label, bucket)``
    with map-side partials, then a BOUNDED collect of at most
    ``2 * n_buckets`` count rows (the lm.py pattern: the model is tiny,
    the corpus is not).  Laplace-smoothed per-bucket costs and class
    priors become integer micro-nats driver-side (Python ``math.log`` —
    same glibc libm DuckDB calls, and integer sums are order-independent
    after that).

    Scoring is ZERO-shuffle: per doc, materialize the token-bucket array
    once, then two higher-order ``aggregate`` passes over literal cost
    arrays shipped in the plan.  No Python, no join, no exchange — the
    scoring stage scales with input splits alone.

    Returns ``(id, n_tokens, cost_false_micro, cost_true_micro,
    pred_label, margin_micro)`` where costs include the class prior and
    ``pred_label = cost_true < cost_false`` (strict; the false class
    wins exact ties, deterministically).
    """
    import math

    lab = labels.select(
        F.col(id_col).alias("__id"), F.col(label_col).cast("boolean").alias("__lab")
    ).where(
        # a NULL label is "unlabeled", not a class: without this filter the
        # NULL group would collapse onto False via bool(None) and silently
        # corrupt priors/counts
        F.col("__lab").isNotNull()
    )
    labeled = docs.select(
        F.col(id_col).alias("__id"),
        # NULL text trains/scores as the empty document (priors only)
        F.coalesce(F.col(text_col), F.lit("")).alias("__t"),
    ).join(lab, "__id")

    toks = _tokens("__t")
    bucketed = F.transform(toks, lambda t: _nb_bucket(t, n_buckets))
    # explode_outer + null guard: a plain explode's inferred size()>0
    # filter would re-inline the token array build (r4s4 trap)
    tok_rows = (
        labeled.select("__lab", bucketed.alias("__b"))
        .select("__lab", F.explode_outer("__b").alias("bucket"))
        .where(F.col("bucket").isNotNull())
    )
    cnt_rows = (
        tok_rows.groupBy("__lab", "bucket").count().collect()
    )  # bounded: <= 2 * n_buckets rows
    prior_rows = labeled.groupBy("__lab").count().collect()

    n_docs = {bool(r["__lab"]): r["count"] for r in prior_rows}
    if set(n_docs) != {False, True}:
        raise ValueError("nb_train_scores needs labeled docs of BOTH classes")
    counts = {False: [0] * n_buckets, True: [0] * n_buckets}
    for r in cnt_rows:
        counts[bool(r["__lab"])][r["bucket"]] = r["count"]
    total_docs = sum(n_docs.values())

    def _cost_vec(c: bool) -> list[int]:
        tot = sum(counts[c])
        return [
            math.floor(-math.log((counts[c][b] + 1.0) / (tot + n_buckets)) * _MICRO + 0.5)
            for b in range(n_buckets)
        ]

    cost = {c: _cost_vec(c) for c in (False, True)}
    prior = {
        c: math.floor(-math.log(n_docs[c] / total_docs) * _MICRO + 0.5)
        for c in (False, True)
    }

    arrs = {
        c: F.array(*[F.lit(v) for v in cost[c]]) for c in (False, True)
    }
    scored = docs.select(
        F.col(id_col), F.coalesce(F.col(text_col), F.lit("")).alias("__t")
    ).select(
        F.col(id_col),
        F.transform(_tokens("__t"), lambda t: _nb_bucket(t, n_buckets)).alias(
            "__b"
        ),
    )

    def _sum_cost(c: bool):
        return F.aggregate(
            "__b",
            F.lit(prior[c]).cast("long"),
            lambda acc, b: acc + F.element_at(arrs[c], (b + 1).cast("int")),
        )

    cf, ct = _sum_cost(False), _sum_cost(True)
    return scored.select(
        id_col,
        F.size("__b").cast("int").alias("n_tokens"),
        cf.alias("cost_false_micro"),
        ct.alias("cost_true_micro"),
        (ct < cf).alias("pred_label"),
        (cf - ct).alias("margin_micro"),
    )


def _nb_bucket(tok: Column, n_buckets: int) -> Column:
    """60-bit md5 prefix of 'nb:<token>' mod the feature count — valid
    inside HOF lambdas (same idiom as :func:`_bucket`)."""
    return (
        F.conv(
            F.substring(F.md5(F.concat(F.lit("nb:"), tok)), 1, 15), 16, 10
        ).cast("long")
        % n_buckets
    )


def isotonic_calibration(
    scored: DataFrame,
    score_col: str = "score",
    label_col: str = "label",
    group_col: str | None = None,
    bins: int = 100,
    max_cells: int = 100_000,
) -> DataFrame:
    """Isotonic (PAV) calibration table for a quality classifier: maps
    raw score bins to monotone empirical keep-probabilities — the
    standard calibration when the classifier's scores rank well but its
    probabilities don't (percentile calibration — `calibrate_scores` —
    fixes cross-source thresholds; THIS fixes the probabilities
    themselves against labels).

    Shape: scores clamp to [0, 1) and bin on a fixed ``bins`` grid; one
    map-side-combinable ``(group, bin) → (n, n_pos)`` aggregation is the
    only corpus-volume exchange.  The pooled-adjacent-violators merge
    runs driver-side over the collected bins — bounded by
    ``groups × bins`` rows (groups are few and named: sources / tiers,
    NOT domains — the lm.py ≤784-row model-fit precedent), with all
    violator comparisons done on cross-multiplied INTEGER weights, so
    the fit is exact and replayable.  NULL scores/labels are excluded
    (unlabeled/unscored rows are not a class — the nb_train_scores
    rule).

    Returns one row per occupied input bin: ``(group?, bin, score_lo,
    score_hi, n, n_pos, p_cal)`` where ``p_cal`` = pooled
    n_pos/n of the PAV block containing the bin, rounded to 6 dp —
    broadcast-join it back on the bin id to calibrate the corpus.

    Oracle note: the driver oracle derives the same fit via the
    greatest-convex-minorant characterization (slopes of the lower
    convex hull of the cumulative (Σn, Σn_pos) diagram) — an
    independent algorithm, provably equal to PAV.
    """
    s = F.col(score_col).cast("double")
    lab = F.col(label_col).cast("boolean")
    # NaN is the float pipeline's usual unscored sentinel and is NOT
    # NULL — without the isnan guard it floors into bin 0 and corrupts
    # that bin's calibration
    rows = scored.where(s.isNotNull() & ~F.isnan(s) & lab.isNotNull())
    bin_id = F.least(
        F.greatest(F.floor(s * bins).cast("int"), F.lit(0)),
        F.lit(bins - 1),
    )
    keys = ([group_col] if group_col else []) + ["__bin"]
    agg = (
        rows.select(
            *([F.col(group_col)] if group_col else []),
            bin_id.alias("__bin"),
            F.when(lab, 1).otherwise(0).alias("__pos"),
        )
        .groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("n"), F.sum("__pos").alias("n_pos"))
    )
    # bound the collect ITSELF (the allocate_budget rule): a mistakenly
    # high-cardinality group_col (url, domain) must not materialize on
    # the driver before the guard fires
    collected = agg.limit(max_cells + 1).collect()
    if len(collected) > max_cells:
        raise ValueError(
            f"isotonic_calibration saw more than max_cells={max_cells} "
            "(group, bin) cells; groups must be few and named "
            "(sources / tiers), not per-document keys"
        )

    by_group: dict = {}
    for r in collected:
        g = r[group_col] if group_col else None
        by_group.setdefault(g, []).append((r["__bin"], int(r["n"]), int(r["n_pos"])))

    out_rows = []
    for g, brs in by_group.items():
        brs.sort()
        # PAV: blocks of (bins, n, pos); merge while a block's mean
        # exceeds its successor's — pos_a * n_b > pos_b * n_a keeps the
        # comparison in exact integers
        blocks: list[list] = []  # [first_bin, last_bin, n, pos]
        for b, n, pos in brs:
            blocks.append([b, b, n, pos])
            while (
                len(blocks) > 1
                and blocks[-2][3] * blocks[-1][2]
                > blocks[-1][3] * blocks[-2][2]
            ):
                b2 = blocks.pop()
                blocks[-1][1] = b2[1]
                blocks[-1][2] += b2[2]
                blocks[-1][3] += b2[3]
        fitted = {}
        for first, last, n, pos in blocks:
            p = round(pos / n, 6)
            for b, bn, bpos in brs:
                if first <= b <= last:
                    fitted[b] = p
        for b, n, pos in brs:
            out_rows.append(
                ((g,) if group_col else ())
                + (b, b / bins, (b + 1) / bins, n, pos, fitted[b])
            )

    spark = scored.sparkSession
    schema = (
        (f"{group_col} string, " if group_col else "")
        + "bin int, score_lo double, score_hi double,"
        + " n long, n_pos long, p_cal double"
    )
    return spark.createDataFrame(out_rows, schema).orderBy(*(
        ([group_col] if group_col else []) + ["bin"]
    ))
