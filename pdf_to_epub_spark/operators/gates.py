"""Paywall / consent-gate detection — access-gate page classification.

A web-scale training corpus is contaminated by pages that are not
content: metered paywalls ("Subscribe to continue reading") truncate the
article to a teaser, and cookie-consent interstitials ("We value your
privacy … Accept all cookies") prepend/replace the main text.  Both
leak boilerplate into the training set and (worse) mislabel the page's
real length/quality signals, so gate detection is a standard pre-filter
(C4/Dolma drop such pages; boilerplate literature calls them "gated
shells").  The reference's header/footer block removal (SURVEY §2 F3) is
the per-book analogue: recurring non-content furniture must be
recognised and stripped before assembly.

Scale shape: pure codegen column algebra — ``regexp_count`` over the
(lower-cased once) text, no token arrays, no UDF, no shuffle for the
per-page signals; the per-domain audit is one map-side-combined groupBy.
At 100 TB this runs at scan speed.

Float contract: rates are ``round(6)`` of integer-count ratios — exact
replay in the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Marker regexes are matched against lower-cased text.  Kept RE2/Java
# compatible (literal phrases + (?:…) alternation only) so the DuckDB
# oracle replays them verbatim.
PAYWALL_MARKERS: tuple[str, ...] = (
    "subscrib",                      # subscribe / subscriber / subscription
    "to continue reading",
    "sign in to (?:read|continue)",
    "already a subscriber",
    "unlock (?:unlimited|this|full) ",
    "free articles? (?:left|remaining)",
    "metered paywall",
)
CONSENT_MARKERS: tuple[str, ...] = (
    "accept all cookies",
    "we value your privacy",
    "cookie (?:policy|settings|preferences|banner)",
    "manage (?:your )?(?:preferences|choices)",
    "we and our partners",
    "legitimate interest",
    "gdpr",
)

# A paywall teaser is SHORT — the marker alone is not enough (an article
# ABOUT paywalls mentions them at full length).  Classification couples
# marker density with truncation.
TEASER_MAX_WORDS = 120
MIN_HITS = 2


def _hits(lowered: Column, markers: tuple[str, ...]) -> Column:
    out = F.lit(0).cast("long")
    for pat in markers:
        out = out + F.regexp_count(lowered, F.lit(pat))
    return out


def gate_signals(
    pages: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    paywall_markers: tuple[str, ...] = PAYWALL_MARKERS,
    consent_markers: tuple[str, ...] = CONSENT_MARKERS,
    teaser_max_words: int = TEASER_MAX_WORDS,
    min_hits: int = MIN_HITS,
) -> DataFrame:
    """Per-page access-gate signals and classification.

    Returns ``(id, n_words, paywall_hits, consent_hits, is_paywalled,
    is_consent_gated)`` where

    * ``paywall_hits`` / ``consent_hits`` — total non-overlapping marker
      matches in the lower-cased text;
    * ``is_paywalled`` — ≥ ``min_hits`` paywall markers AND a teaser-short
      body (≤ ``teaser_max_words`` words): the truncation requirement
      keeps full articles that merely discuss subscriptions;
    * ``is_consent_gated`` — ≥ ``min_hits`` consent markers (consent
      shells wrap full pages, so no length coupling).

    All extra columns of ``pages`` (e.g. a domain) pass through.
    """
    lowered = F.lower(F.coalesce(F.col(text_col), F.lit("")))
    pw = _hits(lowered, paywall_markers)
    cs = _hits(lowered, consent_markers)
    n_words = F.regexp_count(
        F.coalesce(F.col(text_col), F.lit("")), F.lit(r"\S+")
    ).cast("long")
    return (
        pages.withColumn("n_words", n_words)
        .withColumn("paywall_hits", pw)
        .withColumn("consent_hits", cs)
        .withColumn(
            "is_paywalled",
            (F.col("paywall_hits") >= min_hits)
            & (F.col("n_words") <= teaser_max_words),
        )
        .withColumn("is_consent_gated", F.col("consent_hits") >= min_hits)
        .drop(text_col)
    )


def gate_rates(
    signals: DataFrame, domain_col: str = "domain"
) -> DataFrame:
    """Per-domain gate audit over :func:`gate_signals` output — the
    crawl-health rollup that decides which domains need a cookie-wall
    bypass or are not worth fetching (a hard-paywalled domain at 99%
    gate rate contributes nothing to the corpus).

    One map-side-combined aggregation; returns ``(domain, n_pages,
    n_paywalled, n_consent_gated, paywall_rate, consent_rate)``
    (rates 6 dp).
    """
    return signals.groupBy(domain_col).agg(
        F.count(F.lit(1)).alias("n_pages"),
        F.sum(F.col("is_paywalled").cast("long")).alias("n_paywalled"),
        F.sum(F.col("is_consent_gated").cast("long")).alias(
            "n_consent_gated"
        ),
        F.round(
            F.sum(F.col("is_paywalled").cast("long"))
            / F.count(F.lit(1)),
            6,
        ).alias("paywall_rate"),
        F.round(
            F.sum(F.col("is_consent_gated").cast("long"))
            / F.count(F.lit(1)),
            6,
        ).alias("consent_rate"),
    )
