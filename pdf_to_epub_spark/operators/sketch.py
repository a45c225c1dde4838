"""Count-min sketch over the corpus token stream.

The CMS (Cormode & Muthukrishnan 2005) is the mergeable frequency sketch a
100 TB pipeline wants for heavy-hitter questions ("which tokens/n-grams
exceed N occurrences?") without materializing the full vocabulary: the
sketch is a fixed ``depth × width`` counter grid however large the corpus,
partial-aggregates map-side, and unions across corpora/days by plain
counter addition.  Point estimates only over-count (min over depth rows of
hash-bucket counters ≥ the true count, w.h.p. within εN).

Everything here is deterministic — the row hashes are the md5-60 family —
so estimates replay exactly in the SQL oracle (`F.xxhash64` is the faster
drop-in at scale, same shape).

Reference anchor: the reference pipeline has no sketches (its corpus fits
one machine); this is part of the training-data surface (SURVEY §6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pdf_to_epub_spark.operators.dedup import md5_hash60
from pdf_to_epub_spark.operators.textstats import _tokens


def cms_sketch(
    df: DataFrame,
    text_col: str = "text",
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Build the ``(row, bucket, c)`` counter table: every token occurrence
    feeds ``depth`` counters, ``bucket_i = md5_60(i ++ ':' ++ token) mod
    width``.

    Two-stage plan: a word-count aggregation first (map-side combined, the
    standard vocab-sized shuffle), THEN the ``depth`` bucket hashes per
    *distinct* token, weighted by its count.  The counters are
    mathematically identical to hashing every occurrence, but the md5 work
    drops from ``depth × occurrences`` to ``depth × |vocab|`` — a
    controlled warm A/B at sf0.1/local[32] measured 1.81 s → 1.01 s
    (cold JVM 7.5 s → 1.7 s), and at 100 TB the heavy CPU stage scales
    with the vocabulary, not the token stream.  (Only worth it for
    genuinely low-cardinality values like word tokens or domains —
    shingle ids are near-occurrence cardinality and would pay the
    pre-aggregation shuffle for nothing.)  The final (row, bucket)
    aggregation still has at most depth×width groups, so the second
    shuffle stays a fixed few KB regardless of corpus size."""
    tok_counts = (
        df.select(F.explode(_tokens(text_col)).alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").alias("n"))
    )
    probes = tok_counts.select(
        F.col("n"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("row"),
                        F.pmod(
                            md5_hash60(F.concat(F.lit(f"{i}:"), F.col("tok"))),
                            F.lit(width),
                        ).alias("bucket"),
                    )
                    for i in range(depth)
                ]
            )
        ).alias("p"),
    )
    return (
        probes.groupBy(F.col("p.row").alias("row"), F.col("p.bucket").alias("bucket"))
        .agg(F.sum("n").cast("long").alias("c"))
    )


def cms_estimate(
    sketch: DataFrame,
    queries: DataFrame,
    token_col: str = "tok",
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Point-estimate the frequency of each query token against a built
    sketch: ``est = min over rows of counter[row][h_row(tok)]`` (0 when a
    probed bucket was never touched — then the true count is certainly 0).
    The sketch is ≤ depth×width rows and BROADCASTS; queries explode into
    ``depth`` slim probe rows each, so estimating k tokens costs k×depth
    broadcast-hash lookups — no corpus access at all."""
    probes = queries.select(
        F.col(token_col).alias("tok"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("row"),
                        F.pmod(
                            md5_hash60(
                                F.concat(F.lit(f"{i}:"), F.col(token_col))
                            ),
                            F.lit(width),
                        ).alias("bucket"),
                    )
                    for i in range(depth)
                ]
            )
        ).alias("p"),
    ).select("tok", F.col("p.row").alias("row"), F.col("p.bucket").alias("bucket"))
    joined = probes.join(F.broadcast(sketch), ["row", "bucket"], "left")
    return (
        joined.groupBy("tok")
        .agg(F.min(F.coalesce("c", F.lit(0))).cast("long").alias("cms_est"))
    )


def bloom_build(
    df: DataFrame,
    key_col: str = "url",
    n_bits: int = 8192,
    k: int = 6,
) -> DataFrame:
    """Build a Bloom filter over a key column as the SPARSE set-bit table
    ``(bit)`` — "seen this url before?" at crawl scale without shipping
    the url set.  Each key sets ``k`` bits, ``bit_i = md5_60(i ++ ':' ++
    key) mod n_bits``; the result is ≤ n_bits slim rows, mergeable across
    snapshots by plain union+distinct, and broadcastable to any probe
    stream.  One scan, one bounded-cardinality distinct."""
    probes = df.select(
        F.explode(
            F.array(
                *[
                    F.pmod(
                        md5_hash60(
                            F.concat(F.lit(f"{i}:"), F.col(key_col).cast("string"))
                        ),
                        F.lit(n_bits),
                    )
                    for i in range(k)
                ]
            )
        ).alias("bit")
    )
    return probes.distinct()


def bloom_probe(
    df: DataFrame,
    bloom: DataFrame,
    key_col: str = "url",
    n_bits: int = 8192,
    k: int = 6,
) -> DataFrame:
    """Probe a built Bloom filter: appends ``might_contain`` — true iff
    ALL k probe bits are set (no false negatives; false positives at the
    classic (1−e^{−kn/m})^k rate).  The bit table broadcasts; probing is
    k slim lookups per row with a key-grouped count — the key in the
    shuffle key keeps hot bits irrelevant to skew."""
    probes = df.select(
        F.col(key_col).alias("__key"),
        F.explode(
            F.array(
                *[
                    F.pmod(
                        md5_hash60(
                            F.concat(F.lit(f"{i}:"), F.col(key_col).cast("string"))
                        ),
                        F.lit(n_bits),
                    )
                    for i in range(k)
                ]
            )
        ).alias("bit"),
    )
    marked = probes.join(
        F.broadcast(bloom.withColumn("__set", F.lit(1))), "bit", "left"
    )
    hits = marked.groupBy("__key").agg(
        (F.sum(F.coalesce("__set", F.lit(0))) == F.lit(k)).alias(
            "might_contain"
        )
    )
    return df.join(
        hits, df[key_col] == hits["__key"], "left"
    ).drop("__key")


def histogram_sketch(
    df: DataFrame,
    value_col: str,
    lo: float,
    hi: float,
    n_bins: int = 64,
) -> DataFrame:
    """Fixed-range equi-width histogram ``(bin, c)`` — the mergeable
    quantile sketch: because the bin edges are data-INdependent
    (``[lo, hi)`` split into ``n_bins``), histograms from different
    corpora/days/partitions merge by counter addition, which a
    data-dependent sketch (exact percentile, GK) cannot do without a
    re-pass.  Values outside the range clamp to the edge bins (count is
    preserved; the estimate degrades only at the clamped tails — pick
    the range from domain knowledge or yesterday's min/max).  One scan,
    ≤ n_bins groups."""
    x = F.col(value_col).cast("double")
    width = (hi - lo) / n_bins
    raw = F.floor((x - F.lit(float(lo))) / F.lit(width)).cast("long")
    bin_ = F.least(F.greatest(raw, F.lit(0)), F.lit(n_bins - 1))
    return (
        df.where(x.isNotNull())
        .select(bin_.alias("bin"))
        .groupBy("bin")
        .agg(F.count("*").cast("long").alias("c"))
    )


def histogram_quantiles(
    sketch: DataFrame,
    qs: list[float],
    lo: float,
    hi: float,
    n_bins: int = 64,
) -> DataFrame:
    """Interpolated quantile estimates from a `histogram_sketch`:
    for each q, find the first bin whose cumulative count reaches
    ``q·N`` and interpolate linearly inside it —
    ``est = lo + (bin + (q·N − cum_before)/c_bin) · width``, rounded to
    6 dp.  Error is bounded by one bin width.  The sketch is ≤ n_bins
    rows, so the cumulative window and the per-q probe cost nothing at
    any corpus size."""
    from pyspark.sql.window import Window

    width = (hi - lo) / n_bins
    w = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    cum = sketch.select(
        "bin",
        "c",
        F.sum("c").over(w).alias("cum"),
        F.sum("c").over(
            Window.orderBy("bin").rowsBetween(
                Window.unboundedPreceding, -1
            )
        ).alias("cum_before"),
    ).withColumn("cum_before", F.coalesce("cum_before", F.lit(0)))
    total = sketch.agg(F.sum("c").alias("n"))
    qdf = sketch.sparkSession.createDataFrame(
        [(float(q),) for q in qs], "q double"
    ).crossJoin(F.broadcast(total))
    target = F.col("q") * F.col("n")
    hit = (
        qdf.join(F.broadcast(cum), F.col("cum") >= target)
        .groupBy("q", "n")
        .agg(F.min_by(F.struct("bin", "c", "cum_before"), "bin").alias("b"))
    )
    est = F.lit(float(lo)) + (
        F.col("b.bin")
        + (F.col("q") * F.col("n") - F.col("b.cum_before")) / F.col("b.c")
    ) * F.lit(width)
    return hit.select("q", F.round(est, 6).alias("estimate"))


def hll_sketch(
    df: DataFrame,
    value_col: str,
    p: int = 8,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """HyperLogLog register table ``(group..., bucket, max_rho)`` —
    the mergeable DISTINCT-count sketch (Flajolet et al. 2007) that
    completes the family (CMS = frequency, Bloom = membership,
    histogram = quantiles): "how many distinct URLs per domain across
    10^12 pages" without shuffling one row per distinct value.  The
    register table is ≤ 2^p rows per group however large the corpus;
    registers from different corpora/days/partitions merge by
    ``max(max_rho)`` — exactly what the groupBy's map-side partial
    aggregation already does, so the shuffle carries only per-partition
    register tables.

    Hash layout over the deterministic 60-bit md5 family (oracle-exact;
    ``F.xxhash64`` + a 64-bit split is the faster drop-in at scale):
    top ``p`` bits pick the bucket, the low ``60-p`` bits ``w`` yield
    ``rho`` = position of the highest set bit from the top = ``(60-p) -
    bitlength(w) + 1``, with the all-zero suffix capped at ``60-p+1``.
    ``bitlength`` is ``length(bin(w))`` in both engines — no
    float-log2 edge cases at powers of two."""
    groups = list(group_cols or [])
    sub_bits = 60 - p
    h = md5_hash60(F.col(value_col))
    bucket = F.shiftright(h, sub_bits)
    w = h.bitwiseAND(F.lit((1 << sub_bits) - 1))
    rho = F.when(w == 0, F.lit(sub_bits + 1)).otherwise(
        F.lit(sub_bits) - F.length(F.bin(w)) + F.lit(1)
    )
    return (
        df.where(F.col(value_col).isNotNull())
        .select(*groups, bucket.alias("bucket"), rho.alias("rho"))
        .groupBy(*groups, "bucket")
        .agg(F.max("rho").cast("int").alias("max_rho"))
    )


def hll_estimate(
    registers: DataFrame,
    p: int = 8,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Distinct-count estimate per group from a `hll_sketch` register
    table: raw HLL ``E = alpha_m · m² / Σ_j 2^(−M_j)`` (absent registers
    contribute 2^0), with the standard small-range correction
    ``E = m · ln(m / V)`` when ``E ≤ 2.5m`` and some register is empty
    (V = count of empty registers).

    Oracle-exact float discipline: the harmonic sum is accumulated as an
    INTEGER in units of 2^−(sub_bits+1) — every ``2^(−rho)`` term is a
    power of two, so the integer sum is exact and order-independent
    (the lm.py micro-nat pattern; a double accumulation would round
    differently per partition order).  The single double division
    happens once at the end, so Spark and the SQL oracle see
    bit-identical estimates."""
    groups = list(group_cols or [])
    if p < 4 or p > 18:
        raise ValueError(f"hll_estimate: p must be in [4, 18], got {p}")
    m = 1 << p
    sub_bits = 60 - p
    unit = 1 << (sub_bits + 1)  # 2^(sub_bits+1) = contribution of rho=0
    # integer contribution of one register: 2^(sub_bits+1-rho); max_rho is
    # ≤ sub_bits+1 so the exponent stays ≥ 0; absent registers add the
    # rho=0 unit. Sum bound: m · 2^(sub_bits+1) = 2^(p+sub_bits+1) = 2^61.
    # (expr(): the Python shiftleft binding only accepts an int literal
    # shift; the underlying ShiftLeft expression takes any column.)
    contrib = F.expr(f"shiftleft(CAST(1 AS BIGINT), {sub_bits + 1} - max_rho)")
    agg = registers.groupBy(*groups).agg(
        F.sum(contrib).cast("long").alias("_present_sum"),
        F.count("*").cast("long").alias("_n_present"),
    )
    sum_int = F.col("_present_sum") + (F.lit(m) - F.col("_n_present")) * F.lit(unit)
    # Flajolet et al. 2007 bias constants: the closed form
    # 0.7213/(1+1.079/m) is only derived for m >= 128; smaller register
    # counts use the tabulated values.
    alpha_small = {16: 0.673, 32: 0.697, 64: 0.709}
    if m in alpha_small:
        alpha = F.lit(alpha_small[m])
    else:
        alpha = F.lit(0.7213) / (F.lit(1) + F.lit(1.079) / F.lit(m))
    raw = alpha * F.lit(m) * F.lit(m) * F.lit(float(unit)) / sum_int
    v = F.lit(m) - F.col("_n_present")
    est = F.when(
        (raw <= F.lit(2.5) * F.lit(m)) & (v > 0),
        F.lit(m) * F.log(F.lit(m) / v),
    ).otherwise(raw)
    return agg.select(*groups, F.round(est, 4).alias("est_distinct"))


def _kmv(df: DataFrame, col: str, k: int, hash_fn) -> DataFrame:
    """k-minimum-values sketch of a column: the k smallest distinct
    60-bit hashes.  ``orderBy + limit`` compiles to
    TakeOrderedAndProject — per-partition top-k, merged on the driver,
    never a global sort."""
    return (
        df.select(hash_fn(F.col(col)).alias("h"))
        .distinct()
        .orderBy("h")
        .limit(k)
    )


def kmv_similarity(
    old: DataFrame,
    new: DataFrame,
    col: str = "url",
    k: int = 64,
    hash_fn=md5_hash60,
) -> DataFrame:
    """KMV (k-minimum-values / bottom-k) sketch comparison of two
    snapshots (Beyer et al. 2007): distinct-count estimates per side
    plus a Jaccard estimate from the combined sketch — "how much did
    the crawl change?" answered from two k-row sketches instead of a
    full-corpus distinct join.  This is the mergeable theta-sketch idea:
    at 100 TB each side's sketch is built with one pass (map-side
    top-k, driver merge) and stored; any pair of stored sketches
    compares in milliseconds.

    Estimator: with h the k-th smallest of 2^60-scaled hashes,
    ``D ≈ (k−1)·2^60 / h``; when a side has fewer than k distinct
    values the sketch IS the exact distinct set.  Jaccard: take the k
    smallest of the sketch union U_k; |U_k ∩ A ∩ B| / |U_k| is an
    unbiased Jaccard estimate (the bottom-k of the union is a uniform
    sample of the union).

    All arithmetic is integer until the two final divisions, which the
    SQL oracle mirrors in the same parse shape.  Returns one row:
    ``(k, n_sketch_old, n_sketch_new, est_distinct_old,
    est_distinct_new, est_jaccard)``.
    """
    a = _kmv(old, col, k, hash_fn).localCheckpoint(eager=True)
    b = _kmv(new, col, k, hash_fn).localCheckpoint(eager=True)
    u = a.union(b).distinct().orderBy("h").limit(k)
    inter = u.join(a, "h", "left_semi").join(b, "h", "left_semi")

    def side(s: DataFrame, tag: str) -> DataFrame:
        est = F.when(
            F.count(F.lit(1)) < k, F.count(F.lit(1)).cast("double")
        ).otherwise(
            F.round(
                F.lit(float(k - 1)) * F.lit(1152921504606846976.0)
                / F.max("h").cast("double"),
                6,
            )
        )
        return s.agg(
            F.count(F.lit(1)).cast("long").alias(f"n_sketch_{tag}"),
            est.alias(f"est_distinct_{tag}"),
        )

    ua = u.agg(F.count(F.lit(1)).alias("_nu"))
    ia = inter.agg(F.count(F.lit(1)).alias("_ni"))
    jac = F.when(
        F.col("_nu") > 0,
        F.round(F.col("_ni").cast("double") / F.col("_nu").cast("double"), 6),
    ).otherwise(F.lit(0.0))
    return (
        side(a, "old")
        .crossJoin(side(b, "new"))
        .crossJoin(ua)
        .crossJoin(ia)
        .select(
            F.lit(k).cast("int").alias("k"),
            "n_sketch_old",
            "n_sketch_new",
            "est_distinct_old",
            "est_distinct_new",
            jac.alias("est_jaccard"),
        )
    )


def lsh_plan(
    spark,
    num_hashes: int = 64,
    threshold: float = 0.5,
    grid: int = 99,
) -> DataFrame:
    """Banding planner for MinHash LSH: for every (bands, rows) split
    of a ``num_hashes`` signature, integrate the S-curve's error mass
    against a target Jaccard ``threshold`` — false-positive mass
    ``Σ_{J<T} P(J)`` plus false-negative mass ``Σ_{J≥T} (1−P(J))``
    with ``P(J) = 1−(1−J^r)^b`` over a uniform ``grid`` of J values —
    and rank the splits by total error.  The table a pipeline consults
    before committing a banding config to a 100 TB signature store
    (re-banding is cheap; re-signing is not).

    Pure arithmetic over a bands×grid literal cross — no input tables;
    each grid term is micro-unit-rounded before the sum so the ranking
    is engine-exact.  ``threshold_est`` is the classic ``(1/b)^(1/r)``
    S-curve midpoint.

    Returns one row per divisor pair: ``(bands, rows, threshold_est,
    fp_micro, fn_micro, err_micro)`` ordered by (err, bands).
    """
    divisors = [b for b in range(1, num_hashes + 1) if num_hashes % b == 0]
    base = spark.createDataFrame(
        [(b, num_hashes // b) for b in divisors], "bands int, rows int"
    )
    g = base.select(
        "bands",
        "rows",
        F.explode(F.sequence(F.lit(1), F.lit(grid))).alias("gi"),
    )
    j = F.col("gi").cast("double") / F.lit(float(grid + 1))
    p = F.lit(1.0) - F.pow(
        F.lit(1.0) - F.pow(j, F.col("rows").cast("double")),
        F.col("bands").cast("double"),
    )
    term = F.when(j < F.lit(threshold), p).otherwise(F.lit(1.0) - p)
    is_fp = (j < F.lit(threshold)).cast("int")
    micro = F.round(F.lit(1e6) * term, 0).cast("long")
    agg = g.groupBy("bands", "rows").agg(
        F.sum(F.when(is_fp == 1, micro).otherwise(F.lit(0)))
        .cast("long")
        .alias("fp_micro"),
        F.sum(F.when(is_fp == 0, micro).otherwise(F.lit(0)))
        .cast("long")
        .alias("fn_micro"),
    )
    return agg.select(
        "bands",
        "rows",
        F.round(
            F.pow(
                F.lit(1.0) / F.col("bands").cast("double"),
                F.lit(1.0) / F.col("rows").cast("double"),
            ),
            6,
        ).alias("threshold_est"),
        "fp_micro",
        "fn_micro",
        (F.col("fp_micro") + F.col("fn_micro")).alias("err_micro"),
    ).orderBy("err_micro", "bands")
