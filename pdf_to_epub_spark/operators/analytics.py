"""Behavioral analytics over the events stream: cohort retention and
funnel progression.

Neither exists in the reference (a document-conversion pipeline), but a
web-scale corpus engine is routinely pointed at its own telemetry — crawl
events, ingest attempts, user interactions — and these two are the
canonical event-table queries a warehouse migration would expect.  Both
are expressed as plain DataFrame algebra (window + groupBy / HOF
aggregate), fully DuckDB-oracle-replayable.

Scale notes (100 TB events):

* ``cohort_retention`` is one window keyed on the user plus one
  map-side-combined groupBy on (cohort, offset) — the user shuffle is the
  unavoidable one (first-touch attribution needs all of a user's rows
  together); the rollup output is tiny (days x offsets).
* ``funnel_stages`` shuffles each user's slim (ts, type) pairs once and
  walks them with a codegen'd higher-order ``aggregate`` — no per-step
  joins, no re-scan per funnel stage (a per-step chained-min join plan
  would rescan the events table len(steps) times).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _epoch_day(ts: Column) -> Column:
    """Timezone-proof epoch-day bucket (same idiom as hourly_rollup:
    floor-epoch integer arithmetic, never date_trunc)."""
    return F.floor(F.unix_timestamp(ts) / 86400).cast("long")


def cohort_retention(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Classic cohort-retention triangle: users are cohorted by the epoch
    day of their first event; each (cohort_day, day_offset) cell counts
    the distinct cohort users active that day.

    Output: ``cohort_day`` (epoch days), ``day_offset`` (>= 0),
    ``active_users``.
    """
    day = _epoch_day(F.col(ts_col)).alias("__day")
    w = Window.partitionBy(user_col)
    with_cohort = events.select(F.col(user_col), day).withColumn(
        "__cohort", F.min("__day").over(w)
    )
    return (
        with_cohort.groupBy(
            F.col("__cohort").alias("cohort_day"),
            (F.col("__day") - F.col("__cohort")).alias("day_offset"),
        )
        .agg(F.countDistinct(user_col).cast("long").alias("active_users"))
    )


def funnel_stages(
    events: DataFrame,
    steps: tuple[str, ...] = ("signup", "view", "purchase"),
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Per-user funnel walk: how far through ``steps`` did each user get,
    and when did each stage first complete?

    Semantics (chosen to be chained-min replayable in SQL): stage k's
    timestamp is the minimum event time of type ``steps[k]`` STRICTLY
    after stage k-1's timestamp (stage 0 is the unconditional minimum).
    The walk over the time-sorted event array reaches exactly that
    fixpoint, but in ONE pass: ``sort_array(collect_list(struct))`` per
    user, then a higher-order ``aggregate`` whose accumulator carries
    (stage, last_ts, times).  No per-stage join, no per-stage rescan.

    Output: ``<user_col>``, ``stages_reached`` (0..len(steps)) and
    ``t<k>_us`` epoch-microsecond timestamps (NULL when never reached).
    """
    n = len(steps)
    evs = (
        events.select(
            F.col(user_col),
            F.col(ts_col).alias("__ts"),
            F.col(type_col).alias("__et"),
        )
        .groupBy(user_col)
        .agg(
            F.sort_array(
                F.collect_list(F.struct(F.col("__ts"), F.col("__et")))
            ).alias("__evs")
        )
    )
    init = F.struct(
        F.lit(0).alias("stage"),
        F.lit("1900-01-01 00:00:00").cast("timestamp").alias("last_ts"),
        F.array().cast("array<timestamp>").alias("times"),
    )

    def _step_name(stage: Column) -> Column:
        # steps[stage] without element_at (ANSI mode: index 0 / overflow
        # must stay error-free inside the non-taken branch)
        expr = F.lit(steps[-1])
        for i in range(n - 2, -1, -1):
            expr = F.when(stage == i, F.lit(steps[i])).otherwise(expr)
        return expr

    def _merge(acc: Column, e: Column) -> Column:
        advance = (
            (acc["stage"] < n)
            & (e["__et"] == _step_name(acc["stage"]))
            & (e["__ts"] > acc["last_ts"])
        )
        return F.when(
            advance,
            F.struct(
                (acc["stage"] + 1).alias("stage"),
                e["__ts"].alias("last_ts"),
                F.concat(acc["times"], F.array(e["__ts"])).alias("times"),
            ),
        ).otherwise(acc)

    walked = evs.select(
        F.col(user_col),
        F.aggregate(F.col("__evs"), init, _merge).alias("__w"),
    )
    cols = [
        F.col(user_col),
        F.col("__w.stage").cast("int").alias("stages_reached"),
    ]
    for k in range(n):
        # F.get: 0-based, NULL (not an ANSI error) past the end
        cols.append(
            F.unix_micros(F.get(F.col("__w.times"), k)).alias(f"t{k + 1}_us")
        )
    return walked.select(*cols)


def rolling_window(
    events: DataFrame,
    window_seconds: int = 3600,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    id_col: str = "event_id",
) -> DataFrame:
    """Trailing time-RANGE window per user: for every event, the count /
    sum / avg of that user's events in the inclusive
    ``[t - window_seconds, t]`` frame — the rate-limit / burst-detection
    primitive (is this crawler hitting us 1000×/hour?).

    A RANGE frame, not ROWS: equal-second peers all see the same frame,
    and the bound is wall-clock, not row-count.  Ordering is the
    truncated epoch second (the same timezone-proof idiom as
    hourly_rollup), which both engines compute identically.

    One shuffle on the user key; the frame scan is linear per user (sorted
    within partition).  Output: ``(<id_col>, <user_col>, roll_n,
    roll_sum, roll_avg)`` — floats rounded to 4 dp.
    """
    from pyspark.sql.window import Window

    sec = F.unix_timestamp(F.col(ts_col)).cast("long")
    w = (
        Window.partitionBy(user_col)
        .orderBy(sec)
        .rangeBetween(-window_seconds, 0)
    )
    return events.select(
        F.col(id_col),
        F.col(user_col),
        F.count(F.lit(1)).over(w).cast("long").alias("roll_n"),
        F.round(F.sum(value_col).over(w), 4).alias("roll_sum"),
        F.round(F.avg(value_col).over(w), 4).alias("roll_avg"),
    )


def pivot_counts(
    events: DataFrame,
    values: tuple[str, ...] = ("click", "error", "purchase", "signup", "view"),
    user_col: str = "user_id",
    type_col: str = "event_type",
) -> DataFrame:
    """Wide per-user activity profile: one count column per event type
    (``n_<type>``) plus ``n_total`` — the pivot that turns an event log
    into ML feature rows.

    The pivot vocabulary is EXPLICIT: ``.pivot(col)`` without values
    triggers a full distinct pre-scan AND makes the output schema
    data-dependent — both disqualifying at 100 TB (and for the SQL
    oracle, whose column list must be static).  Types outside the
    vocabulary still count toward ``n_total``.  One map-side-combinable
    shuffle on the user key."""
    agg = [
        F.sum(
            (F.col(type_col) == v).cast("long")
        ).alias(f"n_{v}")
        for v in values
    ]
    return events.groupBy(user_col).agg(
        *agg, F.count(F.lit(1)).cast("long").alias("n_total")
    )


def corpus_diversity(
    df: DataFrame,
    group_col: str = "domain",
    top_n: int = 10,
) -> DataFrame:
    """One-row corpus concentration profile over a grouping key (domain
    by convention): group count, Shannon entropy of the group shares
    (nats), the effective group count ``exp(H)``, the exact Gini
    coefficient, and the share held by the single largest / ``top_n``
    largest groups.  The report a mixture designer reads before
    sampling: a crawl whose effective-domain count collapsed is one
    template farm wearing a million URLs.

    Scale shape: pages reduce to per-group counts (one map-side-
    combined groupBy), and EVERYTHING else — entropy, Gini, top-N — is
    computed from the counts-of-counts table (count value → how many
    groups have it), which is tiny (≤ thousands of distinct count
    values) regardless of group cardinality.  Gini needs the groups in
    sorted order, but equal counts occupy consecutive ranks, so the
    rank-sum over a tie block is ``cnt·(off + (cnt+1)/2)`` — the exact
    sorted-rank Gini with no global sort over the group table (the
    same rank-reconstruction idea as the salted exact domain cap).
    The only window runs over the counts-of-counts rows."""
    counts = df.groupBy(group_col).agg(F.count("*").alias("n"))
    cc = counts.groupBy("n").agg(F.count("*").alias("cnt"))
    w = Window.orderBy("n").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wd = Window.orderBy(F.desc("n")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    staged = cc.select(
        "n",
        "cnt",
        (F.sum("cnt").over(w) - F.col("cnt")).alias("off"),
        F.sum("cnt").over(wd).alias("cum_desc"),
    )
    # DOUBLED rank-sum of a tie block of `cnt` groups each of size n
    # after `off` smaller groups — n·cnt·(2·off+cnt+1) is integer-exact,
    # so the sum is order-independent across engines (the micro-nat
    # convention); decimal(38,0) because n·cnt·rank overflows long at
    # 10^12 pages.
    dec = "decimal(38,0)"
    rank_sum2 = (
        F.col("n").cast(dec)
        * F.col("cnt")
        * (F.lit(2) * F.col("off") + F.col("cnt") + F.lit(1))
    )
    # Per-block ln(n) in integer micro-nats BEFORE the sum: exact
    # integer aggregation, same quantization in the DuckDB oracle.
    nlogn_micro = (
        F.round(F.log(F.col("n").cast("double")) * 1e6).cast(dec)
        * F.col("n")
        * F.col("cnt")
    )
    # Top-N contribution from the descending cumulative: the block
    # supplies min(top_n, cum_desc) - (cum_desc - cnt) groups (≥0).
    top_take = F.greatest(
        F.least(F.lit(top_n), F.col("cum_desc"))
        - (F.col("cum_desc") - F.col("cnt")),
        F.lit(0),
    )
    agg = staged.agg(
        F.sum(F.col("n") * F.col("cnt")).alias("n_pages"),
        F.sum("cnt").alias("n_groups"),
        F.sum(rank_sum2).alias("rank_sum2"),
        F.max(F.col("n")).alias("max_n"),
        F.sum(top_take * F.col("n")).alias("top_n_pages"),
        F.sum(nlogn_micro).alias("nlogn_micro"),
    )
    total = F.col("n_pages").cast("double")
    # H = ln(total) - sum(n*ln n)/total  (algebraic form keeps one pass)
    entropy = F.round(
        F.log(total)
        - (F.col("nlogn_micro").cast("double") / 1e6) / total,
        6,
    )
    gini = F.round(
        F.col("rank_sum2").cast("double")
        / (F.col("n_groups").cast("double") * total)
        - (F.col("n_groups") + F.lit(1.0)) / F.col("n_groups"),
        6,
    )
    return agg.select(
        F.col("n_pages").cast("long").alias("n_pages"),
        F.col("n_groups").cast("long").alias("n_groups"),
        entropy.alias("entropy"),
        F.round(F.exp(entropy), 6).alias("effective_groups"),
        gini.alias("gini"),
        F.round(F.col("max_n") / total, 6).alias("top1_share"),
        F.round(F.col("top_n_pages") / total, 6).alias("topn_share"),
    )


def event_anomalies(
    events: DataFrame,
    ts_col: str = "ts",
    type_col: str = "event_type",
    z_threshold: float = 3.0,
) -> DataFrame:
    """Traffic-burst detection over an event stream: tumbling-hour counts
    per event type, then a z-score of each hour against that type's own
    hourly distribution — the crawl-rate / ingestion-anomaly monitor a
    100 TB pipeline runs over its own telemetry.

    Two combiner-enabled aggregations (hour×type counts, then per-type
    moments) joined back on the low-cardinality type key — the join side
    is one row per event type, so Spark broadcasts it.  Mean/variance are
    computed from exact integer count sums in a fixed parse shape
    (``k*s2 - s1*s1``), so the z-scores replay bit-for-bit in SQL.

    Returns ``(event_type, bucket_epoch, n_events, z, is_burst)`` for
    types with at least 2 hourly buckets (variance needs a df of 1).
    """
    hours = (
        events.select(
            F.col(type_col).alias("event_type"),
            (F.floor(F.unix_timestamp(F.col(ts_col)) / 3600) * 3600)
            .cast("long")
            .alias("bucket_epoch"),
        )
        .groupBy("event_type", "bucket_epoch")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    moments = hours.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("n_events").alias("s1"),
        F.sum(F.col("n_events") * F.col("n_events")).alias("s2"),
    )
    k = F.col("k").cast("double")
    s1 = F.col("s1").cast("double")
    s2 = F.col("s2").cast("double")
    stats = moments.filter(F.col("k") > 1).select(
        "event_type",
        (s1 / k).alias("_mean"),
        F.sqrt((k * s2 - s1 * s1) / (k * (k - F.lit(1.0)))).alias("_sd"),
    )
    z = F.when(
        F.col("_sd") > 0,
        F.round(
            (F.col("n_events").cast("double") - F.col("_mean"))
            / F.col("_sd"),
            6,
        ) + F.lit(0.0),
    ).otherwise(F.lit(0.0))
    return (
        hours.join(F.broadcast(stats), "event_type")
        .select(
            "event_type",
            "bucket_epoch",
            F.col("n_events").cast("long").alias("n_events"),
            z.alias("z"),
        )
        .withColumn("is_burst", (F.abs(F.col("z")) > z_threshold))
    )


def corpus_growth(
    events: DataFrame,
    ts_col: str = "ts",
    bucket_seconds: int = 86400,
) -> DataFrame:
    """Cumulative ingest-growth report: events per day plus the running
    total and running share of the corpus — the "how full is the crawl"
    curve every ingestion dashboard draws.

    One combiner-enabled groupBy to day grain, then cumulative /
    grand-total window frames over the tiny per-day table (the windows
    run over day-cardinality rows, never over raw events, so the
    single-partition ordered frame is safe at any corpus size).

    Returns ``(bucket_epoch, n_events, cum_events, pct_of_total)``.
    """
    from pyspark.sql.window import Window

    day = (
        F.floor(F.unix_timestamp(F.col(ts_col)) / bucket_seconds)
        * bucket_seconds
    ).cast("long")
    per = events.select(day.alias("bucket_epoch")).groupBy(
        "bucket_epoch"
    ).agg(F.count(F.lit(1)).alias("n_events"))
    cum = Window.orderBy("bucket_epoch").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    total = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return per.select(
        "bucket_epoch",
        F.col("n_events").cast("long").alias("n_events"),
        F.sum("n_events").over(cum).cast("long").alias("cum_events"),
        F.round(
            F.sum("n_events").over(cum).cast("double")
            / F.sum("n_events").over(total).cast("double"),
            6,
        ).alias("pct_of_total"),
    )


def event_transitions(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    tie_col: str = "event_id",
) -> DataFrame:
    """First-order transition matrix of an event stream: how often does
    event type A immediately precede type B within a user's timeline,
    and with what conditional probability — the Markov skeleton behind
    funnel mining and crawler-behavior profiling.

    One lag window PARTITIONED by user (parallel across users; ties
    broken by ``tie_col`` for retry-stable ordering), one
    combiner-enabled pair count, and the per-source normalization as a
    window over the aggregated pair table (cardinality = |types|², not
    events).

    Returns ``(prev_type, event_type, n, prob)`` with prob 6 dp.
    """
    from pyspark.sql.window import Window

    w = Window.partitionBy(user_col).orderBy(ts_col, tie_col)
    pairs = (
        events.select(
            F.col(user_col),
            F.col(ts_col),
            F.col(tie_col),
            F.col(type_col).alias("event_type"),
        )
        .withColumn("prev_type", F.lag("event_type").over(w))
        .where(F.col("prev_type").isNotNull())
        .groupBy("prev_type", "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    tot = Window.partitionBy("prev_type")
    return pairs.select(
        "prev_type",
        "event_type",
        F.col("n").cast("long").alias("n"),
        F.round(
            F.col("n").cast("double") / F.sum("n").over(tot).cast("double"),
            6,
        ).alias("prob"),
    )


def latency_bands(
    events: DataFrame,
    type_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """Per-type value bands: exact P50/P95 plus mean and count — the
    fetch-latency / response-size SLO report per event class.  One
    combiner-enabled aggregation; the percentiles are Spark's exact
    ``percentile`` (== DuckDB ``quantile_cont`` interpolation) and the
    mean comes from an exact sum in a fixed parse shape.

    Returns ``(event_type, n, p50, p95, mean_value)``, 6 dp.
    """
    agg = events.groupBy(F.col(type_col).alias("event_type")).agg(
        F.count(F.col(value_col)).alias("n"),
        F.expr(f"percentile({value_col}, 0.5)").alias("_p50"),
        F.expr(f"percentile({value_col}, 0.95)").alias("_p95"),
        F.sum(F.col(value_col).cast("double")).alias("_s"),
    )
    return agg.select(
        "event_type",
        F.col("n").cast("long").alias("n"),
        F.round(F.col("_p50"), 6).alias("p50"),
        F.round(F.col("_p95"), 6).alias("p95"),
        F.when(
            F.col("n") > 0,
            F.round(F.col("_s") / F.col("n").cast("double"), 6),
        ).alias("mean_value"),
    )


def extract_json_field(
    df: DataFrame,
    json_col: str = "props",
    field: str = "k",
    field_type: str = "int",
) -> DataFrame:
    """Typed extraction of one field from a JSON-string column — the
    semi-structured hop every event/props/metadata column needs before
    it can join the relational plan.  Spark-idiomatic path:
    ``from_json`` with an explicit one-field schema (JVM-side Jackson,
    codegen-friendly, no UDF), not ``get_json_object`` per row — and
    the parse NULL-ness doubles as the validity flag.

    Corrupt or NULL JSON → ``is_valid = false`` and a NULL value; VALID
    JSON missing the field → ``is_valid = true`` and a NULL value.  The
    two failure classes stay distinguishable, which a quarantine
    pipeline needs.  Corruption is detected via the
    ``columnNameOfCorruptRecord`` channel — PERMISSIVE ``from_json``
    returns a null-FIELDED struct on bad input, never a null struct,
    so ``parsed.isNotNull()`` alone cannot see it.

    Returns all input columns minus the JSON column, plus ``(<field>,
    is_valid)``.
    """
    # backtick the field (legal JSON keys contain spaces/dashes/dots)
    # and use a collision-improbable corrupt-record channel name (a
    # document whose JSON carries that literal key would be flagged)
    corrupt = "__xjf_corrupt_record__"
    parsed = F.from_json(
        F.col(json_col),
        f"`{field}` {field_type}, `{corrupt}` string",
        {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": corrupt},
    )
    keep = [c for c in df.columns if c != json_col]
    return df.select(
        *keep,
        parsed.getField(field).alias(field),
        (
            F.col(json_col).isNotNull()
            & parsed.getField(corrupt).isNull()
        ).alias("is_valid"),
    )


def count_cusum(
    events: DataFrame,
    ts_col: str = "ts",
    bucket_seconds: int = 86400,
) -> DataFrame:
    """Change-point detection on the daily event-count series (CUSUM):
    the statistic ``S_i = n·cum_i − i·total`` is the cumulative
    deviation from the mean rate scaled by ``n`` to stay in EXACT
    integer arithmetic — its extremum marks the most likely rate-change
    day (|S| near 0 everywhere = steady rate).  The ingest-monitoring
    sibling of event_anomalies: that flags single burst hours, this
    locates a sustained level shift.

    One groupBy to day grain, windows over the day-cardinality table
    only, one top-1 cut.  Normalized peak = |S| / (n·total) ∈ [0, ~¼].

    Returns one row: ``(n_days, total_events, peak_day, peak_stat,
    norm_stat)`` — peak_day is the day whose PREFIX ends at the
    extremum (earliest wins ties).
    """
    from pyspark.sql.window import Window

    day = (
        F.floor(F.unix_timestamp(F.col(ts_col)) / bucket_seconds)
        * bucket_seconds
    ).cast("long")
    # NULL timestamps would form a phantom day group that Spark's
    # ascending windows order FIRST (DuckDB orders it LAST), shifting
    # every index i — drop them before the series is built
    per = (
        events.select(day.alias("day"))
        .where(F.col("day").isNotNull())
        .groupBy("day")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    wo = Window.orderBy("day")
    cum = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    tot = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    curve = per.select(
        "day",
        F.row_number().over(wo).cast("long").alias("i"),
        F.sum("c").over(cum).cast("long").alias("cum"),
        F.sum("c").over(tot).cast("long").alias("total"),
        F.count(F.lit(1)).over(tot).cast("long").alias("n"),
    ).select(
        "day", "total", "n",
        (F.col("n") * F.col("cum") - F.col("i") * F.col("total")).alias("s"),
    )
    best = Window.orderBy(F.desc(F.abs(F.col("s"))), F.asc("day"))
    return (
        curve.withColumn("__rn", F.row_number().over(best))
        .filter(F.col("__rn") == 1)
        .select(
            F.col("n").alias("n_days"),
            F.col("total").alias("total_events"),
            F.col("day").alias("peak_day"),
            F.col("s").cast("long").alias("peak_stat"),
            F.when(
                F.col("total") > 0,
                F.round(
                    F.abs(F.col("s")).cast("double")
                    / (F.col("n") * F.col("total")).cast("double"),
                    6,
                ),
            ).alias("norm_stat"),
        )
    )


def session_paths(
    events: DataFrame,
    k: int = 5,
    top: int = 20,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Top event paths: per user, the time-ordered sequence of the first
    ``k`` event types joined with ``>`` — then the ``top`` most common
    paths.  The "what do journeys through the corpus/crawl/product look
    like" query behind funnel design (funnel_stages tests ONE path;
    this surfaces which paths exist).

    One groupBy per user (collect the (ts, id, type) structs, sort the
    array in-projection — per-user event counts bound the array, the
    same contract as funnel_stages), then a map-side-combined count per
    path and a TakeOrderedAndProject top cut.  Ties at the boundary
    break on the path string, so the cut is total-ordered and
    engine-stable.  A NULL event type renders as ``(null)`` in the
    path (array_join would otherwise drop the element, silently
    shortening the journey).

    Returns ``(path, n_users)``, ``top`` rows, most common first.
    """
    per = events.groupBy(F.col(user_col).alias("user_id")).agg(
        F.sort_array(
            F.collect_list(F.struct(F.col(ts_col), F.col(id_col), F.col(type_col)))
        ).alias("_evs")
    )
    path = F.array_join(
        F.transform(F.slice("_evs", 1, k), lambda e: e[type_col]),
        ">",
        "(null)",  # a NULL event_type must not silently vanish from the path
    )
    return (
        per.select(path.alias("path"))
        .groupBy("path")
        .agg(F.count(F.lit(1)).cast("long").alias("n_users"))
        .orderBy(F.desc("n_users"), F.asc("path"))
        .limit(top)
    )


def variant_fields(
    df: DataFrame,
    json_col: str = "props",
    fields: dict | None = None,
    keep: tuple = (),
) -> DataFrame:
    """OPEN-SCHEMA semi-structured extraction via Spark 4's VariantType —
    the complement of :func:`extract_json_field` (which declares a
    one-field struct schema up front): ``try_parse_json`` ingests
    arbitrary nested JSON once into the binary Variant encoding, then
    each requested field is one typed ``try_variant_get`` path
    (``$.a.b``, ``$.tags[1]`` …) — no schema declaration, late binding
    per field, NULL on type mismatch instead of a task error.

    ``fields`` maps output name → ``(variant_path, sql_type)``.  Two
    audit columns ride along: ``variant_schema``
    (``schema_of_variant`` — the per-row inferred shape, the drift
    signal for open-schema feeds) and ``corrupt`` (a NON-NULL string
    ``try_parse_json`` rejects — NULL input is absent, not corrupt;
    ``parse_json`` would kill the task instead).

    Scale: all JVM-side expression work (variant encode once, then
    per-field binary path reads) — no UDF, no second JSON parse per
    field, unlike chained ``get_json_object`` calls."""
    fields = fields or {"k": ("$.k", "bigint")}
    v = F.try_parse_json(F.col(json_col))
    cols = [F.col(c) for c in keep]
    cols += [
        F.try_variant_get(v, path, sql_type).alias(name)
        for name, (path, sql_type) in fields.items()
    ]
    # NULL input is ABSENT, not corrupt — only a non-null string that
    # try_parse_json rejects is malformed (the extract_json_field
    # distinction; caught in review)
    cols += [
        F.schema_of_variant(v).alias("variant_schema"),
        (F.col(json_col).isNotNull() & v.isNull()).alias("corrupt"),
    ]
    return df.select(*cols)
