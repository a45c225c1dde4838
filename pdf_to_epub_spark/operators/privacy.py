"""Privacy audits beyond PII scrubbing: k-anonymity / l-diversity.

PII regex scrubbing (textstats.scrub_pii) removes direct identifiers;
re-identification risk comes from QUASI-identifiers — attribute
combinations (language, source, length band, domain…) that single out
a document or its author even with direct identifiers gone.  The
standard audit vocabulary (Sweeney's k-anonymity, Machanavajjhala's
l-diversity) maps exactly onto relational algebra:

* an equivalence class is a quasi-identifier groupBy;
* k-anonymity holds when every class has ≥ k rows;
* l-diversity holds when every class sees ≥ l distinct values of the
  sensitive attribute.

Scale shape: one map-side-combined groupBy for the audit; suppression
is a per-class window (count over the quasi partition) — both keyed by
the quasi columns, so skew equals the biggest equivalence class, which
is exactly the thing the audit is measuring.  No UDF anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def k_anonymity_audit(
    df: DataFrame,
    quasi_cols: list[str],
    sensitive_col: str,
    k: int = 5,
    l: int = 2,  # noqa: E741 — the literature's name
) -> DataFrame:
    """Per-equivalence-class audit: ``(quasi…, class_size, n_sensitive,
    k_anonymous, l_diverse)`` — one row per distinct quasi-identifier
    combination, flags strict (``>=``) against ``k`` and ``l``."""
    return df.groupBy(*quasi_cols).agg(
        F.count(F.lit(1)).alias("class_size"),
        F.countDistinct(sensitive_col).alias("n_sensitive"),
        (F.count(F.lit(1)) >= k).alias("k_anonymous"),
        (F.countDistinct(sensitive_col) >= l).alias("l_diverse"),
    )


def diversity_audit(
    df: DataFrame,
    quasi_cols: list[str],
    sensitive_col: str,
    l: int = 2,  # noqa: E741 — the literature's name
    c: int = 2,
) -> DataFrame:
    """The two stronger l-diversity instantiations from Machanavajjhala
    et al. 2007 §4 — distinct-l (k_anonymity_audit's flag) is defeated
    by a class where one sensitive value covers 98% of rows, so release
    gates use these instead:

    * **entropy l-diversity**: ``−Σ_v p_v·ln p_v ≥ ln(l)`` over the
      class's sensitive-value distribution;
    * **recursive (c,l)-diversity**: with per-value counts sorted
      descending ``r_1 ≥ … ≥ r_d``, require ``r_1 < c·(r_l + … + r_d)``
      (the top value must not dwarf the tail; ``d < l`` fails).

    Determinism contract: entropy is a grouped sum of per-value integer
    micro-nat terms ``round(−(r_v/n)·ln(r_v/n)·1e6)`` — each term one
    correctly-rounded float expression of exact integers, the sum
    order-free — compared against the Python-literal threshold
    ``round(ln(l)·1e6)`` (same literal embedded in the SQL oracle; the
    package-wide pattern).  The recursive test is pure integer algebra
    on the sorted count array.

    Scale shape: one map-side-combined groupBy to (quasi…, value)
    counts, then one groupBy to classes whose collected array is
    bounded by the sensitive domain (|values| per class, NOT class
    size).  Skew equals the biggest class's value diversity — the
    quantity under audit."""
    import math

    ent_threshold = round(math.log(l) * 1e6)
    per_val = df.groupBy(
        *quasi_cols, F.col(sensitive_col).alias("_v")
    ).agg(F.count(F.lit(1)).alias("_rv"))
    per_class = per_val.groupBy(*quasi_cols).agg(
        F.sum("_rv").alias("class_size"),
        F.count(F.lit(1)).alias("n_sensitive"),
        F.sort_array(F.collect_list("_rv"), asc=False).alias("_rs"),
    )
    n = F.col("class_size").cast("double")
    ent = F.aggregate(
        F.col("_rs"),
        F.lit(0).cast("long"),
        lambda acc, rv: acc
        + F.round(
            -(rv.cast("double") / n)
            * F.log(rv.cast("double") / n)
            * F.lit(1e6),
            0,
        ).cast("long"),
    )
    tail = F.coalesce(
        F.aggregate(
            F.slice(F.col("_rs"), l, F.greatest(
                F.col("n_sensitive") - F.lit(l - 1), F.lit(0)
            ).cast("int")),
            F.lit(0).cast("long"),
            lambda acc, rv: acc + rv,
        ),
        F.lit(0).cast("long"),
    )
    return per_class.select(
        *quasi_cols,
        "class_size",
        "n_sensitive",
        ent.alias("entropy_micro"),
        (ent >= F.lit(ent_threshold)).alias("entropy_l_diverse"),
        F.element_at("_rs", 1).alias("top_count"),
        tail.alias("tail_sum"),
        (
            (F.col("n_sensitive") >= l)
            & (F.element_at("_rs", 1) < F.lit(c) * tail)
        ).alias("recursive_cl_diverse"),
    )


def t_closeness_audit(
    df: DataFrame,
    quasi_cols: list[str],
    sensitive_col: str,
    t: float = 0.2,
) -> DataFrame:
    """t-closeness (Li, Li & Venkatasubramanian, ICDE 2007) — the third
    privacy gate after k-anonymity and l-diversity: an equivalence class
    leaks by DEVIATION even when diverse (a class that is 90% one
    sensitive value in a 50/50 corpus identifies its members' attribute
    with high confidence).  A class is t-close when the distance between
    its sensitive distribution and the GLOBAL one is ≤ t; for unordered
    categorical attributes the Earth Mover's distance reduces to total
    variation, ``TVD = ½·Σ_v |p_class(v) − p_global(v)|`` over the
    GLOBAL value domain (absent-in-class values contribute their global
    mass — the leak is the absence).

    Determinism contract: the numerator is the exact integer
    ``Σ_v |c_v·N − g_v·n|`` in decimal(38,0); ONE 6-dp-rounded division
    by ``2·n·N`` yields ``tvd`` (micro-units), compared against the
    Python-literal ``round(t·1e6)``.

    Scale shape: class×value counts and the global value table are each
    one map-side-combined groupBy; the class×domain expansion is a
    broadcast cross join against the (small by assumption) sensitive
    domain — |classes|·|domain| slim rows, never the corpus."""
    thr = round(t * 1e6)
    dec = "decimal(38,0)"
    per_val = df.groupBy(
        *quasi_cols, F.col(sensitive_col).alias("_v")
    ).agg(F.count(F.lit(1)).alias("_cv"))
    glob = df.groupBy(F.col(sensitive_col).alias("_v")).agg(
        F.count(F.lit(1)).alias("_gv")
    )
    total = df.agg(F.count(F.lit(1)).alias("_N"))
    classes = per_val.groupBy(*quasi_cols).agg(
        F.sum("_cv").alias("class_size")
    )
    # null-safe join keys throughout: a NULL sensitive value is a real
    # category (its absence from a class leaks like any other), and a
    # NULL quasi cell still names a class — plain equality would orphan
    # both and inflate tvd (caught in review).
    cond = F.col("c._v").eqNullSafe(F.col("v._v"))
    for q in quasi_cols:
        cond = cond & F.col(f"c.{q}").eqNullSafe(F.col(f"v.{q}"))
    expanded = (
        classes.crossJoin(F.broadcast(glob))
        .alias("c")
        .join(per_val.alias("v"), cond, "left")
        .select(
            *[F.col(f"c.{q}") for q in quasi_cols],
            F.col("c.class_size"),
            F.col("c._gv").alias("_gv"),
            F.col("v._cv").alias("_cv"),
        )
        .crossJoin(F.broadcast(total))
    )
    term = F.abs(
        F.coalesce(F.col("_cv"), F.lit(0)).cast(dec) * F.col("_N").cast(dec)
        - F.col("_gv").cast(dec) * F.col("class_size").cast(dec)
    )
    return (
        expanded.groupBy(*quasi_cols, "class_size", "_N")
        .agg(F.sum(term).cast(dec).alias("_num"))
        .select(
            *quasi_cols,
            "class_size",
            F.round(
                F.col("_num").cast("double")
                / (
                    F.lit(2).cast("double")
                    * F.col("class_size").cast("double")
                    * F.col("_N").cast("double")
                )
                * F.lit(1e6),
                0,
            )
            .cast("long")
            .alias("tvd_micro"),
        )
        .withColumn("t_close", F.col("tvd_micro") <= F.lit(thr))
    )


def suppress_small_classes(
    df: DataFrame,
    quasi_cols: list[str],
    k: int = 5,
) -> DataFrame:
    """Suppression pass: rows whose equivalence class is smaller than
    ``k`` get their quasi-identifier columns NULLed (cell suppression —
    the release-safe default when generalisation hierarchies are not
    defined); a ``suppressed`` flag records the action.  All other
    columns pass through untouched."""
    w = Window.partitionBy(*quasi_cols)
    with_size = df.withColumn("_class_size", F.count(F.lit(1)).over(w))
    small = F.col("_class_size") < k
    out = with_size
    for c in quasi_cols:
        out = out.withColumn(
            c, F.when(small, F.lit(None)).otherwise(F.col(c))
        )
    return out.withColumn("suppressed", small).drop("_class_size")


def generalize_to_k(
    df: DataFrame,
    numeric_col: str,
    quasi_cols: list[str],
    k: int = 5,
    base_width: int = 400,
    max_doublings: int = 6,
) -> DataFrame:
    """Generalization ladder — the k-anonymity release move when cell
    suppression (:func:`suppress_small_classes`) destroys too much: keep
    COARSENING the numeric quasi-identifier (band width ``base·2^j``)
    until every (quasi…, band) equivalence class reaches size ≥ k.
    Returns the full rung audit ``(width, n_classes, min_class_size,
    k_anonymous, chosen)`` — ``chosen`` marks the smallest satisfying
    width, the release utility/privacy trade made explicit.

    Scale shape: docs explode over the J+1 candidate widths (a narrow
    literal-array generate, J ≤ ~10), so ALL rungs' class tables ride
    ONE map-side-combined groupBy; the rung rollup and the argmin are
    algebra on a ≤(J+1)-row table (broadcast join, no window)."""
    widths = [int(base_width) * (2**j) for j in range(max_doublings + 1)]
    cand = df.select(
        *quasi_cols,
        F.col(numeric_col).alias("_v"),
        F.explode(F.array(*[F.lit(w) for w in widths])).alias("width"),
    )
    classes = (
        cand.select(
            *quasi_cols,
            "width",
            # exact integer division matching the DuckDB oracle's `//`
            # EXACTLY: both Spark DIV and DuckDB's integer `//`
            # TRUNCATE toward zero (verified: (-50)//100 = 0 in DuckDB
            # 1.0), so negatives in (-width, 0) share band 0 with
            # [0, width) on BOTH engines — Python's flooring `//` is
            # the odd one out, not the oracle.  (Not double
            # /-then-cast: a 64-bit id above 2^53 would band
            # off-by-one.)  Truncation vs floor only shifts WHERE the
            # band boundaries fall for negative values; class counts
            # and k-anonymity semantics are unaffected, and the
            # committed oracle replays truncation.
            F.expr("CAST(coalesce(_v, 0) AS BIGINT) DIV width").alias(
                "_band"
            ),
        )
        .groupBy("width", *quasi_cols, "_band")
        .agg(F.count(F.lit(1)).alias("_n"))
    )
    rungs = classes.groupBy("width").agg(
        F.count(F.lit(1)).alias("n_classes"),
        F.min("_n").alias("min_class_size"),
    )
    best = rungs.where(F.col("min_class_size") >= k).agg(
        F.min("width").alias("_best")
    )
    return (
        rungs.crossJoin(F.broadcast(best))
        .select(
            "width",
            "n_classes",
            "min_class_size",
            (F.col("min_class_size") >= k).alias("k_anonymous"),
            (F.col("width") == F.col("_best")).alias("chosen"),
        )
        .withColumn("chosen", F.coalesce(F.col("chosen"), F.lit(False)))
    )
