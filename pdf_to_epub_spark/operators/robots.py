"""robots.txt parsing + the per-domain disallow gate — the crawl-politeness
layer in front of a web corpus (the complement of the per-page robots-meta
``drop_noindex`` gate in operators/urls.py).

Scope is the original Robots Exclusion Protocol subset, applied
conservatively (when in doubt, exclude MORE):

* only ``User-agent: *`` groups are honored (a corpus crawler has no
  registered product token);
* ``Disallow`` prefixes only; ``Allow`` overrides are ignored, which can
  only over-exclude;
* wildcard rules are matched by their literal prefix up to the first
  ``*`` (``/a*b`` → prefix ``/a``), and ``$`` anchors are ignored — both
  strictly over-exclude relative to full RFC 9309 matching;
* a bare ``Disallow:`` (empty value = allow everything) contributes no
  rule; a ``Disallow: *`` / ``Disallow: /`` blocks the whole host.

Everything is JVM column algebra: split → posexplode → one window pass to
assign lines to their User-agent group (robots.txt is a line-stateful
format; the "which group am I in" running sum is exactly a prefix sum, so
it stays declarative), then two map-side-combined groupBys.  The rules
table is tiny (one row per domain) and broadcast into the page filter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .urls import registrable_domain

_UA_VAL = r"(?i)^user-agent\s*:\s*(\S+)"
_DIS_VAL = r"(?i)^disallow\s*:\s*(\S*)"
_DELAY_VAL = r"(?i)^crawl-delay\s*:\s*([0-9]+(?:\.[0-9]+)?)"


def robots_rules(
    robots: DataFrame,
    domain_col: str = "domain",
    body_col: str = "body",
) -> DataFrame:
    """(domain, robots.txt body) → (domain, disallow array<string>,
    crawl_delay double|null): the sorted, deduplicated Disallow prefixes
    and the largest ``Crawl-delay`` of every ``User-agent: *`` group
    (largest = most polite when groups disagree).  Domains whose
    robots.txt contains no star group (or no rules at all) are absent
    from the output — absence means unrestricted.

    Duplicate input rows per domain (multiple captures, several hosts
    mapping to one registrable domain) are supported: group structure is
    computed PER INPUT BODY (a per-row id keeps the window from
    interleaving lines of different bodies), then star-group rules union
    per domain — a set union, so the row-id values never affect the
    output."""
    # rid must be assigned BEFORE the explode (in the same projection as
    # a generator it would be re-evaluated per exploded row, fragmenting
    # every body into per-line "groups"); nondeterministic expressions
    # are not collapsed across the Generate, so the two-step is stable
    with_id = robots.select(
        F.col(domain_col).alias("domain"),
        F.monotonically_increasing_id().alias("rid"),
        F.col(body_col).alias("__body"),
    )
    lines = (
        with_id.select(
            "domain",
            "rid",
            F.posexplode(
                F.split(F.coalesce(F.col("__body"), F.lit("")), r"\r?\n")
            ).alias("pos", "raw"),
        )
        # strip comments, trim; blank lines stay (they end a group in the
        # spec, but group assignment below only needs UA-run boundaries)
        .select(
            "domain",
            "rid",
            "pos",
            F.trim(F.regexp_replace("raw", r"#.*$", "")).alias("line"),
        )
    )
    is_ua = F.col("line").rlike(r"(?i)^user-agent\s*:")
    w = Window.partitionBy("domain", "rid").orderBy("pos")
    # a group starts at the FIRST user-agent line of a consecutive run
    grouped = lines.select(
        "domain",
        "rid",
        "pos",
        "line",
        is_ua.alias("is_ua"),
        F.sum(
            (
                is_ua
                & ~F.coalesce(F.lag(is_ua, 1).over(w), F.lit(False))
            ).cast("int")
        )
        .over(w)
        .alias("grp"),
    )
    per_group = grouped.groupBy("domain", "rid", "grp").agg(
        F.max(
            (F.regexp_extract("line", _UA_VAL, 1) == "*").cast("int")
        ).alias("star"),
        F.collect_set(
            F.when(
                F.col("line").rlike(r"(?i)^disallow\s*:")
                & (F.regexp_extract("line", _DIS_VAL, 1) != ""),
                F.regexp_extract("line", _DIS_VAL, 1),
            )
        ).alias("dis"),
        F.max(
            F.nullif(
                F.regexp_extract("line", _DELAY_VAL, 1), F.lit("")
            ).cast("double")
        ).alias("delay"),
    )
    return (
        per_group.where(
            (F.col("star") == 1)
            & ((F.size("dis") > 0) | F.col("delay").isNotNull())
        )
        .groupBy("domain")
        .agg(
            F.sort_array(
                F.array_distinct(F.flatten(F.collect_list("dis")))
            ).alias("disallow"),
            F.max("delay").alias("crawl_delay"),
        )
    )


def filter_disallowed(
    pages: DataFrame,
    rules: DataFrame,
    url_col: str = "url",
) -> DataFrame:
    """Drop pages whose URL path falls under a Disallow prefix of their
    registrable domain's ``User-agent: *`` rules (``robots_rules``
    output).  Broadcast left join — no shuffle of the page table; pages
    on domains without rules are kept."""
    path = F.coalesce(
        F.nullif(
            F.regexp_extract(
                F.col(url_col), r"^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*(/[^?#]*)?", 1
            ),
            F.lit(""),
        ),
        F.lit("/"),
    )
    r = F.broadcast(
        rules.select(
            F.col("domain").alias("__r_domain"), F.col("disallow").alias("__r_dis")
        )
    )
    blocked = F.exists(
        F.col("__r_dis"),
        # literal prefix up to the first '*' (conservative wildcard)
        lambda d: F.col("__path").startswith(F.regexp_extract(d, r"^([^*]*)", 1)),
    )
    return (
        pages.withColumn("__dom", registrable_domain(F.col(url_col)))
        .withColumn("__path", path)
        .join(r, F.col("__dom") == F.col("__r_domain"), "left")
        .where(~F.coalesce(blocked, F.lit(False)))
        .drop("__dom", "__path", "__r_domain", "__r_dis")
    )


def robots_sitemaps(
    robots: DataFrame,
    domain_col: str = "domain",
    body_col: str = "body",
) -> DataFrame:
    """(domain, robots.txt body) → (domain, sitemap_url): the ``Sitemap:``
    directives — the crawl-seed discovery path that feeds
    :func:`~pdf_to_epub_spark.operators.urls.extract_sitemap_urls` (a
    frontier bootstraps from robots.txt sitemaps before it ever fetches a
    page).  Per REP, ``Sitemap`` is a GLOBAL directive: it belongs to no
    User-agent group, so unlike :func:`robots_rules` no group assembly is
    needed — one ``regexp_extract_all`` per body, zero shuffle beyond the
    final distinct.

    Directive matching is case-insensitive on the key, value runs to the
    first whitespace (urls with spaces are invalid in robots.txt), and
    ``(?d)`` + an explicit ``[ \\t]`` class keep Java and RE2 line
    semantics identical (the ``(?m)^`` of the two engines disagree on
    ``\\r``/U+2028 otherwise).  Duplicate declarations across captures of
    the same domain collapse via distinct."""
    urls = F.expr(
        f"regexp_extract_all({body_col}, "
        "'(?dim)^[ \\\\t]*sitemap[ \\\\t]*:[ \\\\t]*([^ \\\\t\\\\r\\\\n#]+)', 1)"
    )
    return (
        robots.select(
            F.col(domain_col).alias("domain"),
            F.explode_outer(urls).alias("sitemap_url"),
        )
        .where(F.col("sitemap_url").isNotNull())
        .distinct()
    )
