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
