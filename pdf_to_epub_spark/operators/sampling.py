"""Deterministic, corpus-stable sampling/splitting.

``DataFrame.sample``/``sampleBy`` are seed-dependent on PARTITIONING —
a repartition or a task retry can change which rows are kept, which is
disqualifying for train/val/test splits of a training corpus.  These
operators key every decision on a content-independent hash of the row id,
so membership is a pure function of (id, salt): stable across runs,
partitionings, engines — and replayable in the DuckDB oracle via the same
md5 arithmetic (`operators.md5_hash60`).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from pdf_to_epub_spark.operators.dedup import md5_hash60

_HASH_SPACE = float(1 << 60)


def _unit_hash(id_col: Column, salt: str) -> Column:
    """Uniform [0, 1) from the 60-bit md5 hash of ``salt:id``."""
    return md5_hash60(
        F.concat_ws(":", F.lit(salt), id_col.cast("string"))
    ) / F.lit(_HASH_SPACE)


def hash_split(
    df: DataFrame,
    weights: dict[str, float] | None = None,
    id_col: str = "doc_id",
    salt: str = "split",
    out_col: str = "split",
) -> DataFrame:
    """Assign each row to a named split with the given weight fractions,
    deterministically by id hash.  Weights need not sum to 1 — they are
    normalized; assignment walks the cumulative thresholds in dict order
    (make it an ordered mapping for a stable contract)."""
    weights = weights or {"train": 0.98, "val": 0.01, "test": 0.01}
    total = sum(weights.values())
    u = _unit_hash(F.col(id_col), salt)
    expr = None
    acc = 0.0
    names = list(weights)
    for name in names[:-1]:
        acc += weights[name] / total
        clause = F.when(u < acc, F.lit(name))
        expr = clause if expr is None else expr.when(u < acc, F.lit(name))
    last = F.lit(names[-1])
    expr = last if expr is None else expr.otherwise(last)
    return df.withColumn(out_col, expr)


def hash_sample(
    df: DataFrame,
    fraction: float,
    id_col: str = "doc_id",
    salt: str = "sample",
) -> DataFrame:
    """Keep ~``fraction`` of rows, deterministically by id hash — the
    repartition-stable replacement for ``df.sample``."""
    return df.where(_unit_hash(F.col(id_col), salt) < fraction)


def domain_quota_sample(
    df: DataFrame,
    caps: DataFrame | None = None,
    cap: int = 1000,
    domain_col: str = "domain",
    id_col: str = "doc_id",
    salt: str = "quota",
) -> DataFrame:
    """Proportional per-domain quota (the 100 TB scale path): keep each row
    with probability ``min(1, cap / n_domain)``, decided by the id hash —
    no window, no per-domain sort, just one count aggregation (map-side
    combined, one slim row per domain) broadcast-joined back as a filter.
    Exact in expectation; deterministic membership (pure function of
    (id, salt, domain count)), so it replays in the SQL oracle.

    ``caps`` overrides the per-domain counts table (schema: domain_col,
    n_domain) — e.g. yesterday's counts for a streaming ingest.  Domains
    absent from ``caps`` (a brand-new domain today) and null domains keep
    ALL their rows: an unknown domain cannot be over quota, so the join is
    a LEFT join and a missing count means rate 1 — an inner join would
    silently delete exactly the rows quota-ing must not touch."""
    if caps is None:
        caps = df.groupBy(domain_col).agg(F.count("*").alias("n_domain"))
    rate = F.least(
        F.lit(1.0),
        F.lit(float(cap)) / F.coalesce(F.col("n_domain"), F.lit(float(cap))),
    )
    return (
        df.join(F.broadcast(caps), [domain_col], "left")
        .where(_unit_hash(F.col(id_col), salt) < rate)
        .drop("n_domain")
    )


def domain_caps_exact(
    df: DataFrame,
    cap: int = 1000,
    domain_col: str = "domain",
    id_col: str = "doc_id",
    salt: str = "quota",
    salt_bits: int = 4,
) -> DataFrame:
    """Exact per-domain cap: keep the ``cap`` rows with the smallest id
    hashes per domain (deterministic, order-free) — skew-safely.

    Two-phase salted rank: the top ``salt_bits`` of the 60-bit order hash
    RANGE-bucket each domain into 2^salt_bits sub-partitions, so a hot
    domain's sort spreads over that many tasks instead of serializing into
    one window task.  Because the bucket is the hash's own prefix, every
    row of bucket s orders strictly before every row of bucket s+1, so a
    per-(domain, bucket) row_number plus an exclusive cumulative offset
    from the slim (domain, bucket, count) table reconstructs the global
    per-domain rank EXACTLY — the kept row set is identical to a single
    ``Window.partitionBy(domain)`` rank (which is how the SQL oracle
    replays it).  Cost: one extra map-side-combined count scan and a
    broadcast of (domains × 2^salt_bits) slim rows.  At 100 TB still
    prefer :func:`domain_quota_sample` first, then this to make the cap
    exact on the ~cap-scale survivors."""
    from pyspark.sql.window import Window

    h = md5_hash60(F.concat_ws(":", F.lit(salt), F.col(id_col).cast("string")))
    bucketed = df.withColumn("__h", h).withColumn(
        "__s", F.shiftright(F.col("__h"), 60 - salt_bits)
    )
    w = Window.partitionBy(domain_col, "__s").orderBy(
        F.col("__h").asc(), F.col(id_col).asc()
    )
    counts = bucketed.groupBy(domain_col, "__s").agg(F.count("*").alias("__n"))
    off_w = (
        Window.partitionBy(domain_col)
        .orderBy("__s")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = counts.select(
        F.col(domain_col).alias("__dom"),
        F.col("__s").alias("__os"),
        F.coalesce(F.sum("__n").over(off_w), F.lit(0)).alias("__off"),
    )
    ranked = bucketed.withColumn("__rn", F.row_number().over(w))
    joined = ranked.join(
        F.broadcast(offsets),
        F.col(domain_col).eqNullSafe(F.col("__dom")) & (F.col("__s") == F.col("__os")),
        "left",
    )
    return (
        joined.where(F.coalesce(F.col("__off"), F.lit(0)) + F.col("__rn") <= cap)
        .drop("__h", "__s", "__rn", "__dom", "__os", "__off")
    )


def token_budget_select(
    df: DataFrame,
    budget: int,
    score_col: str = "score",
    tokens_col: str = "n_tokens",
    id_col: str = "doc_id",
    bucket_dp: int = 3,
) -> DataFrame:
    """Exact token-budget curriculum selection: rank documents by quality
    ``(score DESC, id ASC)`` and keep the best prefix whose cumulative
    token count stays ≤ ``budget`` (the first document that would cross
    the budget — and everything after it — is excluded).  This is the
    "keep the top-quality X-token subset" step every pretraining mix ends
    with once per-source budgets are planned (mixture_plan allocates
    across sources; this selects within one).

    Returns one verdict row per input document: ``(id, score, n_tokens,
    cum_tokens, selected)`` — ``cum_tokens`` is the inclusive prefix sum
    in quality order, so the audit table shows exactly where the budget
    line fell.

    Scale shape: a single global ``Window.orderBy(score)`` cumsum would
    serialize the corpus through ONE task.  Instead the two-phase
    range-bucket form of :func:`domain_caps_exact`: ``round(score,
    bucket_dp)`` is a monotone coarsening of the order key, so every row
    of a higher bucket precedes every row of a lower bucket — a
    per-bucket window cumsum (parallel across ~10^bucket_dp buckets) plus
    an exclusive cross-bucket offset from the slim ``(bucket,
    sum_tokens)`` table (broadcast) reconstructs the global prefix sum
    EXACTLY, independent of how scores distribute over buckets.  Token
    sums are integer, so the reconstruction is bit-exact and the external
    oracle replays it as one plain window cumsum.  Scores are rounded to
    6 dp BEFORE ordering so the rank (and therefore cum_tokens) is
    engine-stable; ``score_col`` must be non-null.
    """
    from pyspark.sql.window import Window

    s = F.round(F.col(score_col), 6)
    rows = df.select(
        F.col(id_col),
        s.alias("__score"),
        F.col(tokens_col).cast("long").alias("__tok"),
    ).withColumn("__b", F.round(F.col("__score"), bucket_dp))
    w = (
        Window.partitionBy("__b")
        .orderBy(F.desc("__score"), F.asc(id_col))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    off_w = (
        Window.orderBy(F.desc("__ob"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = (
        rows.groupBy(F.col("__b").alias("__ob"))
        .agg(F.sum("__tok").alias("__n"))
        .select(
            "__ob",
            F.coalesce(F.sum("__n").over(off_w), F.lit(0)).alias("__off"),
        )
    )
    cum = (
        rows.withColumn("__part", F.sum("__tok").over(w))
        .join(F.broadcast(offsets), F.col("__b") == F.col("__ob"))
        .withColumn("__cum", F.col("__off") + F.col("__part"))
    )
    return cum.select(
        id_col,
        F.col("__score").alias("score"),
        F.col("__tok").alias("n_tokens"),
        F.col("__cum").alias("cum_tokens"),
        (F.col("__cum") <= F.lit(int(budget))).alias("selected"),
    )


def training_shards(
    df: DataFrame,
    n_shards: int = 256,
    id_col: str = "doc_id",
    salt: str = "shuffle",
    hash_fn=None,
) -> DataFrame:
    """Deterministic global training shuffle: every document gets a shard
    assignment and a stable position within its shard, both derived from a
    salted content-id hash — the reproducible pseudo-random ordering a
    training run reads instead of a true random (irreproducible) shuffle.

    Returns ``(id, shard, pos)``: ``shard = h % n_shards``, ``pos`` =
    rank of ``h`` within the shard (ties impossible for distinct ids
    modulo hash collisions, which the ``(h, id)`` order key absorbs).
    Changing ``salt`` yields an independent permutation per epoch —
    the standard trick for multi-epoch training without re-shuffling
    bytes on disk.

    Scale shape: no global sort — the only shuffle is the per-shard
    window, and shards are the parallelism unit (corpus/n_shards rows
    per task, hash-uniform so skew-free by construction; raise
    ``n_shards`` with corpus size).  At write time ``partitionBy(shard)
    + sortWithinPartitions(pos)`` lays the files out in read order with
    zero additional passes.  Default hash is the md5-60 verification
    form (oracle-replayable); pass ``hash_fn=F.xxhash64``-style for the
    cheaper scale path."""
    from pyspark.sql.window import Window

    from pdf_to_epub_spark.operators.dedup import md5_hash60

    key = F.concat_ws(":", F.lit(salt), F.col(id_col).cast("string"))
    h = (hash_fn or md5_hash60)(key)
    w = Window.partitionBy("shard").orderBy(F.asc("_h"), F.asc(id_col))
    return (
        df.select(id_col, h.alias("_h"))
        # pmod, not %: Spark % keeps the dividend's sign, so the
        # documented hash_fn=F.xxhash64 swap (signed longs) would emit
        # negative shard ids.  Identical for the non-negative md5-60
        # default.
        .withColumn(
            "shard", F.pmod(F.col("_h"), F.lit(int(n_shards))).cast("int")
        )
        .withColumn("pos", F.row_number().over(w))
        .select(id_col, "shard", "pos")
    )


def stratified_sample_exact(
    df: DataFrame,
    num: int = 1,
    den: int = 5,
    strata_col: str = "lang",
    id_col: str = "doc_id",
    salt: str = "strat",
    salt_bits: int = 4,
) -> DataFrame:
    """Exact proportional stratified sample: from every stratum keep
    EXACTLY ``ceil(n_stratum * num / den)`` rows — the ones with the
    smallest order hashes — deterministically and skew-safely.

    The fraction is a RATIONAL (num/den), not a float: ``ceil(n * 0.07)``
    style float products round up past exact integers (100 * 0.07 =
    7.000000000000001), silently changing the kept count; integer
    ``(n*num + den - 1) DIV den`` is exact for any n.

    Same two-phase salted rank as :func:`domain_caps_exact` (hash-prefix
    range buckets reconstruct the global per-stratum rank exactly, so a
    hot stratum — and language strata ARE hot, half a corpus can be one
    language — sorts across 2^salt_bits tasks instead of one).  The slim
    (stratum, bucket, count) table is broadcast; per-stratum totals ride
    the same rows.  When exactness is not required, a plain
    ``hash_sample(df, frac)`` keeps every stratum at ~frac with zero
    aggregation — use that first at 100 TB, this when the sample contract
    is "exactly ceil" (e.g. a fixed-size eval slice per language)."""
    if num <= 0 or den <= 0:
        raise ValueError("num and den must be positive")
    from pyspark.sql.window import Window

    h = md5_hash60(F.concat_ws(":", F.lit(salt), F.col(id_col).cast("string")))
    bucketed = df.withColumn("__h", h).withColumn(
        "__s", F.shiftright(F.col("__h"), 60 - salt_bits)
    )
    counts = bucketed.groupBy(strata_col, "__s").agg(F.count("*").alias("__n"))
    off_w = (
        Window.partitionBy(strata_col)
        .orderBy("__s")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    tot_w = Window.partitionBy(strata_col)
    offsets = counts.select(
        F.col(strata_col).alias("__st"),
        F.col("__s").alias("__os"),
        F.coalesce(F.sum("__n").over(off_w), F.lit(0)).alias("__off"),
        F.sum("__n").over(tot_w).alias("__tot"),
    )
    w = Window.partitionBy(strata_col, "__s").orderBy(
        F.col("__h").asc(), F.col(id_col).asc()
    )
    ranked = bucketed.withColumn("__rn", F.row_number().over(w))
    joined = ranked.join(
        F.broadcast(offsets),
        F.col(strata_col).eqNullSafe(F.col("__st")) & (F.col("__s") == F.col("__os")),
        "left",
    )
    target = F.expr(f"CAST((__tot * {num} + {den} - 1) DIV {den} AS BIGINT)")
    return (
        joined.where(
            F.coalesce(F.col("__off"), F.lit(0)) + F.col("__rn") <= target
        )
        .drop("__h", "__s", "__rn", "__st", "__os", "__off", "__tot")
    )


# --------------------------------------------------------------------------
# DSIR-style importance weighting (Xie et al. 2023, "Data Selection for
# Language Models via Importance Resampling")
# --------------------------------------------------------------------------


def _hashed_features(
    df: DataFrame, text_col: str, n_buckets: int, token_hash=None
) -> DataFrame:
    """Hashed unigram+bigram features per document: ``(doc_id, bucket)``,
    one row per feature OCCURRENCE (multiplicity matters — the importance
    weight is a product over the document's feature sequence).  Empty/null
    texts keep a null-bucket row (explode_outer) so they survive to the
    scoring aggregation with ``n_feats = 0``.  ``token_hash`` defaults to
    ``xxhash64`` (the scale path); pass `md5_hash60` for the
    oracle-replayable form (the package-wide convention)."""
    from pdf_to_epub_spark.operators.textstats import _tokens

    token_hash = token_hash or F.xxhash64

    ws = _tokens(text_col)
    bigrams = F.when(
        F.size("__ws") >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size("__ws") - 1),
            lambda i: F.concat_ws(
                " ", F.element_at("__ws", i), F.element_at("__ws", i + 1)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return (
        df.select("doc_id", ws.alias("__ws"))
        .select("doc_id", F.explode_outer(F.concat("__ws", bigrams)).alias("__f"))
        .select(
            "doc_id",
            F.when(
                F.col("__f").isNotNull(),
                F.pmod(token_hash(F.col("__f")), F.lit(n_buckets)),
            ).alias("bucket"),
        )
    )


def dsir_log_ratios(
    raw_df: DataFrame,
    target_df: DataFrame,
    text_col: str = "text",
    n_buckets: int = 4096,
    token_hash=None,
) -> DataFrame:
    """Per-bucket importance log-ratio table ``(bucket, lr_micro)`` for
    every one of the ``n_buckets`` hashed-feature buckets: with add-one
    smoothing over bucket counts,

        lr_micro = round((ln((c_t+1)/(N_t+B)) - ln((c_r+1)/(N_r+B))) * 1e6)

    stored as integer micro-nats so downstream per-document sums are
    order-independent and oracle-exact (the `operators/lm.py` determinism
    contract).  Both corpora are scanned once into B-bounded count tables;
    the totals ride a 1-row broadcast cross join — nothing collects.
    The count tables localCheckpoint (≤ n_buckets rows each): each feeds
    both the ratio join and the totals aggregation, and without the
    barrier the corpus-wide feature explode re-runs once per branch
    (measured 2× scoring cost on the bench corpus)."""
    b = float(n_buckets)
    full = raw_df.sparkSession.range(n_buckets).select(
        F.col("id").alias("bucket")
    )

    def counts(df: DataFrame, name: str) -> DataFrame:
        return (
            _hashed_features(df, text_col, n_buckets, token_hash)
            .where(F.col("bucket").isNotNull())
            .groupBy("bucket")
            .agg(F.count("*").alias(name))
            .localCheckpoint(eager=False)
        )

    raw_c = counts(raw_df, "c_r")
    tgt_c = counts(target_df, "c_t")
    totals = raw_c.agg(F.sum("c_r").alias("n_r")).crossJoin(
        tgt_c.agg(F.sum("c_t").alias("n_t"))
    )
    joined = (
        full.join(F.broadcast(raw_c), "bucket", "left")
        .join(F.broadcast(tgt_c), "bucket", "left")
        .crossJoin(F.broadcast(totals))
        .select(
            "bucket",
            F.coalesce("c_r", F.lit(0)).alias("c_r"),
            F.coalesce("c_t", F.lit(0)).alias("c_t"),
            F.coalesce("n_r", F.lit(0)).alias("n_r"),
            F.coalesce("n_t", F.lit(0)).alias("n_t"),
        )
    )
    lr = (
        F.log((F.col("c_t") + 1.0) / (F.col("n_t") + b))
        - F.log((F.col("c_r") + 1.0) / (F.col("n_r") + b))
    )
    return joined.select(
        "bucket", F.round(lr * 1e6).cast("long").alias("lr_micro")
    )


def dsir_log_weights(
    raw_df: DataFrame,
    target_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 4096,
    token_hash=None,
) -> DataFrame:
    """Per-document DSIR importance log-weight over the raw corpus:
    ``(doc_id, n_feats, log_weight_micro)`` where ``log_weight_micro`` is
    the integer micro-nat sum of the per-feature bucket log-ratios — the
    log of the (unnormalized) importance weight p_target(doc)/p_raw(doc)
    under the hashed-n-gram bag model.  Selection = take the top-k by
    weight (or Gumbel top-k for sampled selection; deterministic rank is
    the replayable default here).

    Shape at 100 TB: the ratio table is exactly ``n_buckets`` rows and
    BROADCASTS to the feature stream — the raw corpus is scanned once and
    shuffles only on ``(doc_id)`` for the final sum (id-keyed: hot
    features cannot skew it).  The target corpus (small by construction
    in DSIR) is scanned once for its count table."""
    ratios = dsir_log_ratios(raw_df, target_df, text_col, n_buckets, token_hash)
    feats = _hashed_features(
        raw_df.select(F.col(id_col).alias("doc_id"), text_col), text_col,
        n_buckets, token_hash,
    )
    return (
        feats.join(F.broadcast(ratios), "bucket", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.col("bucket")).cast("long").alias("n_feats"),
            F.coalesce(F.sum("lr_micro"), F.lit(0)).cast("long").alias(
                "log_weight_micro"
            ),
        )
    )


# --------------------------------------------------------------------------
# Source-mixture planning (Pile/DoReMi-style static mixing)
# --------------------------------------------------------------------------


def mixture_plan(
    df: DataFrame,
    targets: dict[str, float],
    source_col: str = "source",
    weight_col: str | None = None,
) -> DataFrame:
    """Largest-achievable-corpus mixture plan: given target fractions
    ``targets`` (source → fraction of the final mix) and the corpus's
    per-source availability (row count, or ``sum(weight_col)`` when a
    token/char weight column is given), the maximal total budget with NO
    upsampling is ``T* = min_s(available_s / frac_s)``; each source then
    samples at ``rate_s = frac_s · T* / available_s`` (≤ 1 by
    construction).  Returns ``(source, target_frac, available, rate)``
    for every targeted source — a source missing from the corpus drives
    ``T*`` (and every rate) to 0, surfacing the unsatisfiable mixture
    instead of silently re-normalizing it.

    Shape: one map-side-combined per-source aggregation (a handful of
    rows however big the corpus) and a 1-row min cross-joined back —
    nothing collects, nothing shuffles the corpus."""
    spark = df.sparkSession
    tgt = spark.createDataFrame(
        [(s, float(f)) for s, f in sorted(targets.items()) if float(f) > 0],
        f"{source_col} string, target_frac double",
    )
    w = F.count("*") if weight_col is None else F.sum(weight_col)
    avail = df.groupBy(source_col).agg(w.cast("long").alias("available"))
    plan = tgt.join(avail, source_col, "left").select(
        source_col,
        "target_frac",
        F.coalesce("available", F.lit(0)).cast("long").alias("available"),
    )
    t_star = plan.agg(
        F.min(F.col("available") / F.col("target_frac")).alias("__t")
    )
    return plan.crossJoin(F.broadcast(t_star)).select(
        source_col,
        "target_frac",
        "available",
        F.when(
            F.col("available") > 0,
            F.col("target_frac") * F.col("__t") / F.col("available"),
        ).otherwise(F.lit(0.0)).alias("rate"),
    )


def apply_mixture(
    df: DataFrame,
    targets: dict[str, float],
    source_col: str = "source",
    id_col: str = "doc_id",
    weight_col: str | None = None,
    salt: str = "mixture",
) -> DataFrame:
    """Deterministically sample the corpus to the `mixture_plan` rates:
    row membership = ``unit_hash(salt:id) < rate_source`` — a pure
    function of (id, salt, per-source totals), so it is retry- and
    partitioning-stable and replays in the SQL oracle via the same md5
    arithmetic.  Untargeted sources drop entirely (rate 0).  The
    plan table broadcasts; the corpus is scanned once with no shuffle."""
    rates = mixture_plan(df, targets, source_col, weight_col).select(
        source_col, "rate"
    )
    joined = df.join(F.broadcast(rates), source_col, "left")
    return joined.where(
        _unit_hash(F.col(id_col), salt) < F.coalesce("rate", F.lit(0.0))
    ).drop("rate")


def dsir_resample(
    raw_df: DataFrame,
    target_df: DataFrame,
    k: int = 50,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 4096,
    salt: str = "dsir",
    token_hash=None,
) -> DataFrame:
    """Gumbel top-k importance resampling — the selection step of DSIR:
    sampling k documents WITHOUT replacement with probability ∝ their
    importance weight is exactly taking the top k of
    ``log w_i + Gumbel_i`` (the Gumbel-max trick), and the Gumbel is
    realized deterministically from the id hash
    (``u = (h + 0.5)/2^60 ∈ (0,1)``, ``g = -ln(-ln(u))``) so the draw is
    retry/partitioning-stable and oracle-replayable.

    Returns ``(doc_id, log_weight_micro, gumbel_key)`` for the k winners,
    ordered by (key desc, id); the key is rounded to 6 dp and the ROUNDED
    value ranks, so the cut at k is engine-reproducible (the `bm25_topk`
    contract).  Plan: the weight computation's shuffles plus one
    TakeOrderedAndProject — no global sort materializes."""
    lw = dsir_log_weights(raw_df, target_df, text_col, id_col, n_buckets,
                          token_hash)
    h = md5_hash60(
        F.concat_ws(":", F.lit(salt), F.col("doc_id").cast("string"))
    )
    u = (h + F.lit(0.5)) / F.lit(_HASH_SPACE)
    key = F.round(
        F.col("log_weight_micro") / F.lit(1e6) - F.log(-F.log(u)), 6
    )
    return (
        lw.select("doc_id", "log_weight_micro", key.alias("gumbel_key"))
        .orderBy(F.desc("gumbel_key"), F.col("doc_id").asc())
        .limit(k)
    )


def temperature_mixture(
    df: DataFrame,
    group_col: str = "lang",
    weight_col: str | None = None,
    alpha: float = 0.5,
    budget: int = 1_000_000,
) -> DataFrame:
    """Temperature-weighted sampling plan (the mT5 / CC-100 α-sampling
    rule): sample group i with probability ``p_i ∝ n_i^α`` where n_i is
    the group's size (rows, or ``sum(weight_col)``).  α < 1 flattens the
    natural distribution — head languages/domains shrink, tail ones
    grow — without the hard floor/ceiling artifacts of per-group caps.
    Returns ``(group, n_units, share_raw, share_temp, target_units,
    epochs)``: target under ``budget`` total units and the implied
    epochs over the group's data (> 1 ⇒ the tail group repeats).

    Float discipline for the SQL oracle: ``n^α`` is computed as
    ``exp(α·ln n)`` and immediately quantized to integer micro-units
    (×1e6, HALF_UP via +0.5/floor both engines), so the cross-group
    normalizing SUM is integer-exact and order-independent; shares and
    epochs divide once at the end and round to 6 dp.  One tiny
    aggregation (groups ≪ corpus) + a 1-row broadcast — the corpus
    never shuffles beyond the map-side combine."""
    w = F.count("*") if weight_col is None else F.sum(weight_col)
    # Drop zero-size groups BEFORE the log: n_units can be 0 only via a
    # weight_col summing to 0, and ln(0) would silently NULL the group's
    # share (mis-normalizing the total) in Spark while aborting the SQL
    # replica outright.  A zero-weight group has no sampleable mass, so
    # excluding it is the correct plan semantics, not a workaround.
    sizes = df.groupBy(group_col).agg(w.cast("long").alias("n_units")).where(
        F.col("n_units") > 0
    )
    micro = F.floor(
        F.exp(F.lit(float(alpha)) * F.log(F.col("n_units"))) * F.lit(1_000_000.0)
        + F.lit(0.5)
    ).cast("long")
    weighted = sizes.select(group_col, "n_units", micro.alias("_w"))
    tot = weighted.agg(
        F.sum("_w").alias("_tw"), F.sum("n_units").alias("_tn")
    )
    j = weighted.crossJoin(F.broadcast(tot))
    share_temp = F.col("_w") / F.col("_tw")
    target = F.floor(share_temp * F.lit(int(budget))).cast("long")
    return j.select(
        group_col,
        "n_units",
        F.round(F.col("n_units") / F.col("_tn"), 6).alias("share_raw"),
        F.round(share_temp, 6).alias("share_temp"),
        target.alias("target_units"),
        F.round(target / F.col("n_units"), 4).alias("epochs"),
    )


def leakage_safe_splits(
    docs: DataFrame,
    pairs: DataFrame,
    weights: dict[str, float] | None = None,
    id_col: str = "doc_id",
    salt: str = "split",
) -> DataFrame:
    """Split assignment that CANNOT leak near-duplicates across splits:
    every document is labeled with its near-dup connected component, and
    the train/val/test decision hashes the CLUSTER label instead of the
    document id — so a val doc's near-twin can never sit in train (the
    fix for what the `split_leakage` audit detects; plain
    :func:`hash_split` scatters twins independently).

    Returns ``(id, cluster, split)``.  Same md5 unit-hash arithmetic and
    cumulative-threshold walk as :func:`hash_split` (oracle-replayable);
    plan = the component propagation (slim id-keyed joins) + one
    labels-to-ids join — the document text never shuffles."""
    from pdf_to_epub_spark.operators.dedup import connected_components

    labels = connected_components(pairs, docs.select(id_col), id_col=id_col)
    labeled = labels.select(
        F.col(id_col), F.col("component").alias("cluster")
    )
    return hash_split(
        labeled, weights, id_col="cluster", salt=salt, out_col="split"
    ).select(id_col, "cluster", "split")


def shard_manifest(
    df: DataFrame,
    n_shards: int = 256,
    id_col: str = "doc_id",
    text_col: str = "text",
    salt: str = "shuffle",
    hash_fn=None,
) -> DataFrame:
    """Loader manifest for the training-shard layout: one row per shard
    with document count, token volume, byte volume, and an
    order-independent content checksum — what a data-loader fleet
    reads at startup to size itself, verify integrity after transfer,
    and detect a silently-rewritten shard (the checksum changes iff
    any member document's bytes change or membership changes).

    The checksum is ``md5`` over the shard's member-document md5s
    concatenated IN SORTED ORDER — sorting makes it independent of
    aggregation order (Spark's collect_list order is
    nondeterministic), and the same construction is one
    ``string_agg(… ORDER BY …)`` in the SQL oracle.  Per-shard member
    lists are corpus/n_shards-sized (hash-uniform), so the sorted
    concat is bounded per task; token counts reuse the package token
    regex (map-side, before the one shard shuffle)."""
    from pdf_to_epub_spark.operators.textstats import token_count

    shards = training_shards(
        df, n_shards=n_shards, id_col=id_col, salt=salt, hash_fn=hash_fn
    )
    slim = df.select(
        id_col, F.coalesce(F.col(text_col), F.lit("")).alias("_t")
    ).select(
        id_col,
        F.md5(F.col("_t")).alias("_md5"),
        F.length(F.col("_t")).cast("long").alias("_chars"),
        token_count("_t").cast("long").alias("_toks"),
    )
    joined = shards.join(slim, id_col)
    return (
        joined.groupBy("shard")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("_toks").alias("n_tokens"),
            F.sum("_chars").alias("n_chars"),
            F.md5(
                F.concat_ws("", F.sort_array(F.collect_list("_md5"))).cast(
                    "binary"
                )
            ).alias("checksum"),
        )
        .select("shard", "n_docs", "n_tokens", "n_chars", "checksum")
    )


def quality_percentiles(
    df: DataFrame,
    score_col: str = "score",
    group_col: str = "lang",
    id_col: str = "doc_id",
    buckets: int = 4,
) -> DataFrame:
    """Per-group quantile normalization of a quality score + curriculum
    bucketing: ``pct`` is the score's ``percent_rank`` within its group
    (0 = worst, 1 = best) and ``bucket`` is its ``ntile`` quartile (1 =
    lowest scores) — the standard preprocessing before mixing corpora
    whose raw quality scores live on different scales, and the ordering
    key for curriculum-style data scheduling.

    Ties are broken by ``id_col`` so both the rank and the bucket are
    fully deterministic across engines and retries.  One window per
    group over a slim projection; a hot group serializes only its own
    sort (at 100 TB, group = language, so the window key is low-card
    but each partition streams + spills — no per-group collect).
    """
    from pyspark.sql.window import Window

    w = Window.partitionBy(group_col).orderBy(score_col, id_col)
    return df.select(
        F.col(id_col),
        F.col(group_col),
        F.col(score_col),
        F.round(F.percent_rank().over(w), 6).alias("pct"),
        F.ntile(buckets).over(w).cast("int").alias("bucket"),
    )


def weighted_sample(
    df: DataFrame,
    k: int,
    weight_col: str = "weight",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic weighted sampling without replacement
    (Efraimidis–Spirakis): each row gets priority ``ln(u) / w`` where
    ``u`` is a reproducible uniform draw from the row's md5 hash, and
    the k LARGEST priorities win — the inclusion probability of a row
    is proportional to its weight, yet the sample is a pure function of
    the ids (retry-stable, partitioning-stable, and replayable in SQL).

    The top-k cut is a global ``orderBy(...).limit(k)`` which Spark
    executes as TakeOrderedAndProject (per-partition heaps + a k-row
    driver merge — no full sort, no full shuffle).  The rank key is the
    6-dp-ROUNDED priority with an id tie-break, so the k-boundary is
    engine-stable (the BM25 precedent).

    Rows with non-positive weight are excluded.  Returns ``(id, weight,
    priority, rank)``.
    """
    from pdf_to_epub_spark.operators.dedup import md5_hash60

    u = (md5_hash60(F.col(id_col).cast("string")) + 1).cast("double") / (
        float(1 << 60) + 1.0
    )
    pri = F.round(F.log(u) / F.col(weight_col).cast("double"), 6) + F.lit(
        0.0
    )
    cand = df.filter(F.col(weight_col) > 0).select(
        F.col(id_col),
        F.col(weight_col).cast("double").alias("weight"),
        pri.alias("priority"),
    )
    top = cand.orderBy(F.desc("priority"), F.asc(id_col)).limit(k)
    from pyspark.sql.window import Window

    w = Window.orderBy(F.desc("priority"), F.asc(id_col))
    return top.select(
        id_col, "weight", "priority", F.row_number().over(w).alias("rank")
    )


def partition_skew(
    df: DataFrame,
    key_col: str,
    n_buckets: int = 32,
) -> DataFrame:
    """Partitioning audit: how evenly would this key hash-distribute
    over ``n_buckets`` tasks?  Returns a single summary row —
    ``(n_buckets, n_rows, n_empty, max_bucket_rows, skew_ratio, cv)``
    where ``skew_ratio`` is max/mean bucket size (1.0 = perfectly even;
    the straggler multiplier a shuffle on this key would pay) and
    ``cv`` the coefficient of variation, both 6 dp from exact integer
    sums in a fixed parse shape.

    The audit itself is one combiner-enabled groupBy on the bucket id
    (md5-based so the oracle replays it) + a single-row aggregate —
    run it BEFORE keying a 100 TB shuffle on a suspect column.
    """
    from pdf_to_epub_spark.operators.dedup import md5_hash60

    # NULL keys hash like a hash-partitioner treats them: all into one
    # real bucket (coalesce to hash 0), never a phantom 17th bucket
    b = (
        F.coalesce(
            md5_hash60(F.col(key_col).cast("string")), F.lit(0)
        ) % n_buckets
    ).alias("b")
    per = df.select(b).groupBy("b").agg(F.count(F.lit(1)).alias("n"))
    agg = per.agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("n").alias("s1"),
        F.sum(F.col("n") * F.col("n")).alias("s2"),
        F.max("n").alias("mx"),
    )
    k = F.col("k").cast("double")
    s1 = F.col("s1").cast("double")
    s2 = F.col("s2").cast("double")
    mean = s1 / F.lit(float(n_buckets))
    var = (F.lit(float(n_buckets)) * s2 - s1 * s1) / (
        F.lit(float(n_buckets)) * F.lit(float(n_buckets))
    )
    return agg.select(
        F.lit(n_buckets).cast("int").alias("n_buckets"),
        F.col("s1").cast("long").alias("n_rows"),
        (F.lit(n_buckets) - F.col("k")).cast("int").alias("n_empty"),
        F.col("mx").cast("long").alias("max_bucket_rows"),
        F.when(
            F.col("s1") > 0,
            F.round(F.col("mx").cast("double") / mean, 6),
        ).alias("skew_ratio"),
        F.when(
            F.col("s1") > 0, F.round(F.sqrt(var) / mean, 6)
        ).alias("cv"),
    )


def allocate_budget(
    counts: DataFrame,
    budget: int,
    stratum_col: str = "stratum",
    n_col: str = "n",
    max_strata: int = 100_000,
) -> DataFrame:
    """Largest-remainder (Hamilton) apportionment of a sampling budget
    across strata: each stratum gets ``floor(budget * n / total)`` docs
    plus one of the leftover units, awarded by largest fractional
    remainder (ties to the lexically-first stratum) — allocations sum
    to EXACTLY the budget, which proportional rounding alone cannot
    guarantee, and which a corpus-mixing plan needs before it hands
    targets to per-stratum samplers.

    The strata table is aggregate output (languages × quality buckets —
    hundreds of rows at any corpus size), so this does the arithmetic
    driver-side in exact Python integers (``budget * n`` overflows
    int64 at web scale; Python ints don't) after a bounded collect
    guarded by ``max_strata`` — the lm.py bounded-model-fit pattern.

    Returns ``(stratum, n, alloc)``.
    """
    # bound the collect ITSELF (limit max_strata+1), not just the row
    # count after the fact — a mistakenly-passed per-URL table must not
    # materialize on the driver before the guard fires
    rows = (
        counts.select(
            F.col(stratum_col).cast("string").alias("s"),
            F.col(n_col).cast("long").alias("n"),
        )
        .limit(max_strata + 1)
        .collect()
    )
    if len(rows) > max_strata:
        raise ValueError(
            f"allocate_budget saw more than max_strata={max_strata} "
            "strata; the operator is for aggregate tables"
        )
    total = sum(r["n"] for r in rows)
    out = []
    if total > 0:
        base = {r["s"]: (budget * r["n"]) // total for r in rows}
        rem = {r["s"]: (budget * r["n"]) % total for r in rows}
        leftover = budget - sum(base.values())
        order = sorted(rows, key=lambda r: (-rem[r["s"]], r["s"]))
        bonus = {r["s"] for r in order[:leftover]}
        out = [
            (r["s"], r["n"], base[r["s"]] + (1 if r["s"] in bonus else 0))
            for r in rows
        ]
    else:
        out = [(r["s"], r["n"], 0) for r in rows]
    return counts.sparkSession.createDataFrame(
        out, f"{stratum_col} string, {n_col} long, alloc long"
    )


def temporal_splits(
    df: DataFrame,
    ts_col: str = "warc_ts",
    id_col: str = "doc_id",
    train_frac: float = 0.8,
    val_frac: float = 0.1,
) -> DataFrame:
    """Time-based train/val/test assignment: the newest slice is held
    out — the right protocol when the model will score FUTURE crawls
    (hash splits leak temporal drift; a time holdout measures it).

    Boundaries are the exact percentiles of the capture epoch at
    ``train_frac`` and ``train_frac + val_frac``, rounded to 6 dp
    before the comparison on both engines (the lm_partition
    boundary-stability rule); rows on a boundary go to the LATER split
    (strict ``<``).  One percentile aggregate broadcast back over the
    slim (id, epoch) projection.

    Returns ``(id, epoch, split)`` with split ∈ train/val/test.
    """
    slim = df.select(
        F.col(id_col), F.unix_timestamp(F.col(ts_col)).alias("epoch")
    )
    cuts = slim.agg(
        F.round(F.expr(f"percentile(epoch, {train_frac})"), 6).alias("b1"),
        # round the cut fraction itself: 0.8 + 0.1 is 0.9000000000000001
        # in binary floats, which would probe a different percentile
        # than the oracle's literal 0.9
        F.round(
            F.expr(f"percentile(epoch, {round(train_frac + val_frac, 12)})"),
            6,
        ).alias("b2"),
    )
    j = slim.crossJoin(F.broadcast(cuts))
    split = (
        F.when(F.col("epoch").cast("double") < F.col("b1"), F.lit("train"))
        .when(F.col("epoch").cast("double") < F.col("b2"), F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return j.select(F.col(id_col), "epoch", split.alias("split"))


def interleave_strata(
    df: DataFrame,
    stratum_col: str = "stratum",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic round-robin interleave of strata into one training
    order: position ``(r-1) * n_strata + stratum_index`` where ``r`` is
    the row's rank INSIDE its stratum and strata are indexed in sorted
    order — consecutive training examples cycle through the strata
    (language, source, quality band) instead of arriving in blocks,
    without any random shuffle to make non-reproducible.

    Ranks come from per-stratum windows (parallel across strata, id
    tie-broken); the stratum index and count come from the tiny
    distinct-strata table, broadcast back.  Unequal strata leave gaps
    in the order values — harmless, the ORDER is what matters.

    Returns ``(id, stratum, stratum_rank, train_order)``.
    """
    from pyspark.sql.window import Window

    strata = (
        df.select(F.col(stratum_col).alias("stratum"))
        .distinct()
        .select(
            "stratum",
            (
                F.row_number().over(Window.orderBy("stratum")) - 1
            ).alias("__idx"),
        )
    )
    n_strata = strata.agg(F.count(F.lit(1)).alias("__k"))
    w = Window.partitionBy(stratum_col).orderBy(id_col)
    ranked = df.select(
        F.col(id_col),
        F.col(stratum_col).alias("stratum"),
        F.row_number().over(w).cast("long").alias("stratum_rank"),
    )
    # null-safe equality: a NULL stratum is a legitimate stratum (it is
    # in the distinct table and counted in __k); a plain equi-join
    # would silently drop those rows and leave a hole in every cycle
    idx = strata.select(
        F.col("stratum").alias("__st"), F.col("__idx")
    )
    return (
        ranked.join(
            F.broadcast(idx),
            F.col("stratum").eqNullSafe(F.col("__st")),
        )
        .crossJoin(F.broadcast(n_strata))
        .select(
            F.col(id_col),
            "stratum",
            "stratum_rank",
            (
                (F.col("stratum_rank") - 1) * F.col("__k") + F.col("__idx")
            ).cast("long").alias("train_order"),
        )
    )


def threshold_for_rate(
    df: DataFrame,
    keep_frac: float,
    score_col: str = "score",
) -> DataFrame:
    """Calibrate a score cutoff to a target keep-rate: the threshold is
    the exact ``1 - keep_frac`` percentile of the score (rounded to 6 dp
    before the comparison on both engines — the lm_partition boundary
    rule), and the row reports the rate actually achieved (ties at the
    cutoff make it ≥ the target).  This is how a quality-filter knob is
    set ("keep the best 30%") without hand-tuning.

    One percentile aggregate + one conditional count — two passes over
    the slim score column, no window, no sort.

    Returns one row: ``(cutoff, n_total, n_kept, achieved_rate)``.
    """
    cut = df.agg(
        F.round(
            F.expr(f"percentile({score_col}, {round(1.0 - keep_frac, 12)})"),
            6,
        ).alias("cutoff")
    )
    j = df.crossJoin(F.broadcast(cut))
    return j.agg(
        F.first("cutoff").alias("cutoff"),
        F.count(F.lit(1)).cast("long").alias("n_total"),
        F.sum(
            F.when(
                F.col(score_col).cast("double") >= F.col("cutoff"), 1
            ).otherwise(0)
        ).cast("long").alias("n_kept"),
    ).select(
        "cutoff", "n_total", "n_kept",
        F.when(
            F.col("n_total") > 0,
            F.round(
                F.col("n_kept").cast("double")
                / F.col("n_total").cast("double"),
                6,
            ),
        ).alias("achieved_rate"),
    )


# cumulative Poisson(1) CDF — inverse-CDF thresholds for the hash-seeded
# bootstrap weights.  P(X <= k) for k = 0..5; weights cap at 6.
_POISSON1_CDF = (
    0.36787944117144233,
    0.7357588823428847,
    0.9196986029286058,
    0.9810118431238462,
    0.9963401531726563,
    0.9994058151824183,
)


def bootstrap_ci(
    df: DataFrame,
    value_col: str,
    id_col: str = "doc_id",
    n_reps: int = 32,
    alpha: float = 0.05,
) -> DataFrame:
    """Poisson-bootstrap confidence interval for the corpus mean of a
    column (Chamandy et al. 2012, "Estimating uncertainty for massive
    data streams") — THE way to put error bars on a 100 TB metric,
    because true resampling-with-replacement needs global coordination
    while Poisson(1) weights are independent per (row, replicate) and
    stream map-side.

    Weights are drawn by inverse-CDF lookup on a deterministic
    md5-60 uniform from ``hash(id:rep)`` — no RNG state, so any
    replicate is reproducible on any cluster layout and the SQL oracle
    replays bit-for-bit.  Each row explodes into ``n_reps`` (replicate,
    weight) pairs (a literal-sequence generator — nothing for
    InferFiltersFromGenerate to re-inline); per-replicate sums ride
    exact integer accumulators — integral columns ride as-is,
    fractional ones are half-away quantized to micro-units first (a
    ≤5e-7 per-value bias, far below any bootstrap CI's width) — and the
    CI is the exact-percentile pair over the ``n_reps``-row
    replicate-mean table.  Rows with a NULL value are dropped up front
    (they carry no metric; keeping them would bias replicate means low
    through their weights).

    Returns one row: ``(n_rows, n_reps_effective, mean, ci_lo, ci_hi)``
    at the ``alpha/2 .. 1-alpha/2`` percentiles, 6 dp.
    ``n_reps_effective`` counts replicates that drew at least one
    nonzero Poisson weight (the ``_w > 0`` filter) — on any non-tiny
    input it equals the requested ``n_reps``, but a handful of rows can
    drop all-zero replicates, and the column name says so rather than
    silently shadowing the parameter.
    """
    lo_q = round(alpha / 2.0, 12)
    hi_q = round(1.0 - alpha / 2.0, 12)
    types = dict(df.dtypes)
    integral = types.get(value_col, "").lower() in (
        "tinyint", "smallint", "int", "bigint", "long",
    )
    scale = 1.0 if integral else 1e6
    vcol = F.col(value_col)
    if not integral:
        vcol = F.round(vcol.cast("double") * F.lit(1e6), 0)
    df = df.where(F.col(value_col).isNotNull())
    u = (
        md5_hash60(
            F.concat(
                F.col(id_col).cast("string"), F.lit(":"), F.col("rep").cast("string")
            )
        ).cast("double")
        / F.lit(1152921504606846976.0)
    )
    w = F.lit(6)
    for k in range(len(_POISSON1_CDF) - 1, -1, -1):
        w = F.when(u < F.lit(_POISSON1_CDF[k]), F.lit(k)).otherwise(w)
    reps = (
        df.select(
            F.col(id_col), vcol.cast("long").alias("v"),
            F.explode(F.sequence(F.lit(0), F.lit(n_reps - 1))).alias("rep"),
        )
        .select("rep", "v", w.alias("w"))
        .groupBy("rep")
        .agg(
            F.sum(F.col("w") * F.col("v")).alias("_wv"),
            F.sum("w").alias("_w"),
        )
        .where(F.col("_w") > 0)
        .select(
            (
                F.col("_wv").cast("double")
                / (F.lit(scale) * F.col("_w").cast("double"))
            ).alias("m")
        )
    )
    ci = reps.agg(
        F.round(F.expr(f"percentile(m, {lo_q})"), 6).alias("ci_lo"),
        F.round(F.expr(f"percentile(m, {hi_q})"), 6).alias("ci_hi"),
        F.count(F.lit(1)).cast("int").alias("n_reps_effective"),
    )
    full = df.agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.round(
            F.sum(vcol.cast("long")).cast("double")
            / (F.lit(scale) * F.count(F.lit(1)).cast("double")),
            6,
        ).alias("mean"),
    )
    return full.crossJoin(F.broadcast(ci)).select(
        "n_rows", "n_reps_effective", "mean", "ci_lo", "ci_hi"
    )


def hrw_shards(
    df: DataFrame,
    n_shards: int = 16,
    id_col: str = "doc_id",
    salt: str = "hrw",
) -> DataFrame:
    """Rendezvous (highest-random-weight) shard assignment (Thaler &
    Ravishankar 1998): ``shard = argmax_s hash(id, s)``.  Unlike
    ``training_shards``' ``h % n`` — where changing ``n`` reshuffles
    nearly EVERY key — growing ``n → n+1`` moves exactly the keys whose
    new-shard hash wins (≈ 1/(n+1) of them), and every moved key moves
    TO the new shard.  That minimal-movement property is what an
    incremental recrawl store wants: add a shard, re-home 1/(n+1) of
    the data, touch nothing else.

    Zero-shuffle: the argmax runs per row over a generated in-row
    struct array (``transform(sequence) → array_max``; lexicographic
    struct order = max hash, ties by max s — md5-collision-safe and
    engine-reproducible).  Cost is O(n_shards) hashes per key — fine
    to ~1k shards; beyond that use jump consistent hash (Lamping &
    Veach 2014, O(ln n) but 64-bit-overflow arithmetic that SQL oracles
    can't replay) and keep this as the verification form."""
    from pdf_to_epub_spark.operators.dedup import md5_hash60

    best = F.array_max(
        F.transform(
            F.sequence(F.lit(0), F.lit(int(n_shards) - 1)),
            lambda s: F.struct(
                md5_hash60(
                    F.concat(
                        F.col(id_col).cast("string"),
                        F.lit(":" + salt + ":"),
                        s.cast("string"),
                    )
                ).alias("h"),
                s.cast("int").alias("s"),
            ),
        )
    )
    return df.select(
        F.col(id_col),
        best["s"].alias("shard"),
        best["h"].alias("shard_weight"),
    )


def paired_bootstrap(
    df: DataFrame,
    value_a: str,
    value_b: str,
    id_col: str = "doc_id",
    n_reps: int = 32,
    alpha: float = 0.05,
) -> DataFrame:
    """Paired Poisson-bootstrap comparison of two per-document metrics
    (the Koehn 2004 significance-test shape on :func:`bootstrap_ci`'s
    Chamandy-style streaming weights): resample the per-doc DELTA
    ``a − b``, report the mean delta, its percentile CI, and
    ``win_rate`` — the share of replicate means > 0, the "how sure is
    A > B" readout.  Pairing (one delta per doc, never independent
    resamples of A and B) cancels between-document variance, which is
    why this detects differences an unpaired interval can't.

    Same determinism contract as :func:`bootstrap_ci`: md5-60
    inverse-CDF Poisson(1) weights per (id, rep), both metrics
    half-away micro-quantized so every replicate sum is an exact
    integer, doubles only at the final per-replicate division and the
    6-dp outputs.  Rows where either metric is NULL are dropped (no
    pair, no delta).  The output ``n_reps_effective`` counts replicates
    surviving the all-zero-weight filter (see :func:`bootstrap_ci`) —
    equal to the requested ``n_reps`` except on tiny inputs."""
    lo_q = round(alpha / 2.0, 12)
    hi_q = round(1.0 - alpha / 2.0, 12)
    delta = (
        F.round(F.col(value_a).cast("double") * F.lit(1e6), 0)
        - F.round(F.col(value_b).cast("double") * F.lit(1e6), 0)
    ).cast("long")
    base = df.where(
        F.col(value_a).isNotNull() & F.col(value_b).isNotNull()
    ).select(F.col(id_col), delta.alias("_d"))
    u = (
        md5_hash60(
            F.concat(
                F.col(id_col).cast("string"),
                F.lit(":"),
                F.col("rep").cast("string"),
            )
        ).cast("double")
        / F.lit(1152921504606846976.0)
    )
    w = F.lit(6)
    for k in range(len(_POISSON1_CDF) - 1, -1, -1):
        w = F.when(u < F.lit(_POISSON1_CDF[k]), F.lit(k)).otherwise(w)
    reps = (
        base.select(
            F.col(id_col),
            "_d",
            F.explode(F.sequence(F.lit(0), F.lit(n_reps - 1))).alias(
                "rep"
            ),
        )
        .select("rep", "_d", w.alias("w"))
        .groupBy("rep")
        .agg(
            F.sum(F.col("w") * F.col("_d")).alias("_wd"),
            F.sum("w").alias("_w"),
        )
        .where(F.col("_w") > 0)
        .select(
            (
                F.col("_wd").cast("double")
                / (F.lit(1e6) * F.col("_w").cast("double"))
            ).alias("m")
        )
    )
    ci = reps.agg(
        F.round(F.expr(f"percentile(m, {lo_q})"), 6).alias("ci_lo"),
        F.round(F.expr(f"percentile(m, {hi_q})"), 6).alias("ci_hi"),
        F.round(
            F.avg(F.when(F.col("m") > 0, 1.0).otherwise(0.0)), 6
        ).alias("win_rate"),
        F.count(F.lit(1)).cast("int").alias("n_reps_effective"),
    )
    full = base.agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.round(
            F.sum("_d").cast("double")
            / (F.lit(1e6) * F.count(F.lit(1)).cast("double")),
            6,
        ).alias("mean_delta"),
    )
    return full.crossJoin(F.broadcast(ci)).select(
        "n_rows",
        "n_reps_effective",
        "mean_delta",
        "ci_lo",
        "ci_hi",
        "win_rate",
    )


def otsu_threshold(
    df: DataFrame,
    score_col: str = "score",
    bins: int = 64,
) -> DataFrame:
    """Otsu's method over a quality-score column: the threshold that
    maximizes between-class variance of the score histogram — the
    parameter-free way to split a bimodal quality distribution (kept
    vs junk) when no target keep-RATE is known (its rate-targeted
    sibling is ``threshold_for_rate``).

    Scale shape: one min/max aggregate, one equal-width histogram
    groupBy (map-side combined), then the argmax scan runs entirely on
    the ≤ ``bins``-row histogram table — the single-partition windows
    are bins-sized, never data-sized.  The variance is evaluated in
    BIN units (bounded by bins², so a micro-unit rounding is exact
    enough for a stable argmax) and ties break toward the LOWER bin,
    so the cut is engine-deterministic.

    Returns one row: ``(n_rows, lo, hi, threshold_bin,
    threshold_value, var_micro, n_below, n_above)``.
    ``threshold_value`` is the LOWER EDGE of ``threshold_bin + 1``, so
    rows with score STRICTLY BELOW threshold_value are "below"
    (``n_below``); a score landing exactly on the edge bins upward and
    counts in ``n_above`` — consumers splitting on the value must use
    ``score < threshold_value`` (up to the 6 dp rounding) to reproduce
    the reported counts.  NULL/NaN scores are dropped; a constant or
    empty column yields NULL threshold fields.
    """
    s = F.col(score_col).cast("double")
    clean = df.where(s.isNotNull() & ~F.isnan(s)).select(s.alias("x"))
    rng = clean.agg(
        F.min("x").alias("_lo"),
        F.max("x").alias("_hi"),
        F.count(F.lit(1)).cast("long").alias("_n"),
    )
    binned = clean.join(F.broadcast(rng)).select(
        F.when(
            F.col("_hi") > F.col("_lo"),
            F.least(
                F.lit(bins - 1),
                F.floor(
                    (F.col("x") - F.col("_lo"))
                    / (F.col("_hi") - F.col("_lo")) * bins
                ).cast("int"),
            ),
        ).otherwise(F.lit(0)).alias("bin")
    )
    hist = binned.groupBy("bin").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    w = Window.orderBy("bin").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = hist.select(
        "bin",
        F.sum("n").over(w).cast("long").alias("w0"),
        F.sum(F.col("n") * F.col("bin")).over(w).cast("long").alias("s0"),
    )
    tot = hist.agg(
        F.sum("n").cast("long").alias("W"),
        F.sum(F.col("n") * F.col("bin")).cast("long").alias("S"),
    )
    c = cum.join(F.broadcast(tot))
    w0d = F.col("w0").cast("double") / F.col("W").cast("double")
    mu0 = F.col("s0").cast("double") / F.col("w0").cast("double")
    mu1 = (F.col("S") - F.col("s0")).cast("double") / (
        F.col("W") - F.col("w0")
    ).cast("double")
    var_micro = F.round(
        F.lit(1e6) * (w0d * (F.lit(1.0) - w0d))
        * ((mu0 - mu1) * (mu0 - mu1)),
        0,
    ).cast("long")
    best = (
        c.where(F.col("w0") < F.col("W"))
        .select(
            "bin", "w0", var_micro.alias("var_micro"), "W"
        )
        .orderBy(F.desc("var_micro"), F.asc("bin"))
        .limit(1)
    )
    out = rng.join(best, how="left")
    step = (F.col("_hi") - F.col("_lo")) / bins
    return out.select(
        F.col("_n").alias("n_rows"),
        F.round("_lo", 6).alias("lo"),
        F.round("_hi", 6).alias("hi"),
        F.col("bin").cast("int").alias("threshold_bin"),
        F.when(
            F.col("bin").isNotNull(),
            F.round(F.col("_lo") + (F.col("bin") + 1) * step, 6),
        ).alias("threshold_value"),
        "var_micro",
        F.col("w0").alias("n_below"),
        (F.col("W") - F.col("w0")).cast("long").alias("n_above"),
    )


def winsorize_scores(
    df: DataFrame,
    group_col: str = "domain",
    score_col: str = "score",
    p_lo: float = 0.01,
    p_hi: float = 0.99,
) -> DataFrame:
    """Per-group winsorization: clamp a signal at its group's exact
    ``p_lo``/``p_hi`` percentiles — the standard defense before
    averaging per-domain quality scores (one SEO page with a pathological
    score should not move its domain's mean; dropping it outright would
    bias the count).

    Exact ``percentile()`` per group (one map-side-combinable agg over
    the group key — Spark's exact percentile matches DuckDB's
    ``quantile_cont`` interpolation bit-for-bit), joined back on the
    group key.  NULL/NaN scores pass through unclamped with NULL
    bounds: they carry no signal to clamp and the consumer's null
    policy stays theirs.

    Returns the input columns plus ``(lo_bound, hi_bound, score_w,
    clipped)`` — all three rounded to 6 dp.
    """
    lo_q = round(p_lo, 12)
    hi_q = round(p_hi, 12)
    s = F.col(score_col).cast("double")
    ok = s.isNotNull() & ~F.isnan(s)
    bounds = (
        df.where(ok)
        .groupBy(group_col)
        .agg(
            F.round(F.expr(f"percentile({score_col}, {lo_q})"), 6).alias("lo_bound"),
            F.round(F.expr(f"percentile({score_col}, {hi_q})"), 6).alias("hi_bound"),
        )
    )
    j = df.join(bounds, group_col, "left")
    clamped = F.least(F.greatest(s, F.col("lo_bound")), F.col("hi_bound"))
    return j.select(
        *df.columns,
        "lo_bound",
        "hi_bound",
        F.when(ok, F.round(clamped, 6)).otherwise(s).alias("score_w"),
        F.when(ok, (s < F.col("lo_bound")) | (s > F.col("hi_bound")))
        .otherwise(F.lit(False))
        .alias("clipped"),
    )

def quantile_normalize(
    df: DataFrame,
    score_col: str,
    group_col: str,
    id_col: str = "doc_id",
    num_partitions: int | None = None,
) -> DataFrame:
    """Rank-based quantile normalization of per-group score distributions
    onto the POOLED distribution — the cross-domain score debiasing step
    (a quality classifier systematically scores some domains high; after
    normalization every group's scores occupy the same distribution, so
    one global threshold treats domains fairly; the microarray-era
    technique of Bolstad et al. 2003 applied to curation scores).

    The doc ranked ``r`` of ``n`` within its group maps to the pooled
    value at 0-based global index ``((2r-1)·N) div (2n)`` (midpoint
    quantile, N = total rows) — always an OBSERVED score, found by an
    integer-exact index (no interpolation, no float), so the result
    hash-replays in SQL.  Ties order by (score, id) on both the pooled
    and the within-group rankings.

    Scale shape (100 TB): within-group ranks are ordinary partitioned
    windows; the pooled ranking uses ``bucketing.global_positions``
    (range partition + per-partition window + broadcast offsets — never
    a single-partition window); the final lookup is an equi-join on the
    computed index.  Everything on the shuffles is slim (id, group,
    score, position)."""
    from .bucketing import global_positions

    d = df.select(
        F.col(id_col).alias("_id"),
        F.col(group_col).alias("_grp"),
        F.col(score_col).alias("_s"),
    )
    pooled = global_positions(
        d.select("_s", "_id"), ["_s", "_id"], pos_col="_g",
        num_partitions=num_partitions,
    ).localCheckpoint(eager=False)  # feeds the N agg AND the index join
    n_total = pooled.agg(F.count(F.lit(1)).alias("_N"))
    # asc_nulls_last: must agree with global_positions' pooled order (and
    # with the DuckDB oracle's ORDER BY default) — NULL scores rank last
    # in their group exactly as they rank last in the pool
    w = Window.partitionBy("_grp").orderBy(
        F.col("_s").asc_nulls_last(), F.col("_id").asc_nulls_last()
    )
    ranked = (
        d.withColumn("_r", F.row_number().over(w))
        .withColumn("_cnt", F.count(F.lit(1)).over(Window.partitionBy("_grp")))
        .crossJoin(F.broadcast(n_total))
    )
    idx = (
        F.expr(
            "(CAST(2 AS DECIMAL(38,0)) * _r - 1) * _N"
            " div (CAST(2 AS DECIMAL(38,0)) * _cnt)"
        ).cast("long")
        + 1
    )
    lookup = pooled.select(F.col("_g"), F.col("_s").alias("_norm"))
    return (
        ranked.withColumn("_g", idx)
        .join(lookup, "_g")
        .select(
            F.col("_id").alias(id_col),
            F.col("_grp").alias(group_col),
            F.col("_s").alias(score_col),
            F.col("_norm").alias("norm_score"),
        )
    )
