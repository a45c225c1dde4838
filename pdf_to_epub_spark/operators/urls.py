"""URL canonicalization — the key-normalization step in front of any
url-keyed operation (dedup, resume index, re-crawl diffing): two captures
of the same page under trivially different URLs must collide.

Pure JVM column algebra (regexp + array functions — RE2-compatible
patterns so the DuckDB oracle replays every rule bit-for-bit):

1. strip the fragment (``#…`` never reaches the server);
2. lowercase scheme + authority (host names are case-insensitive; paths
   are NOT touched — they are case-sensitive per RFC 3986);
3. drop default ports (``http://…:80``, ``https://…:443``);
4. drop tracking query parameters (``utm_*``, ``fbclid``, ``gclid``,
   ``msclkid``, ``mc_eid``);
5. sort the surviving query parameters (param order is
   semantics-preserving for the overwhelming majority of endpoints and is
   the standard CC-pipeline normalization);
6. normalize an empty path to ``/``.
"""

from __future__ import annotations

import functools
from operator import or_

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

TRACKING_PARAM_PATTERN = r"^(utm_[^=]*|fbclid|gclid|msclkid|mc_eid)="


def _permissive_text(col: str, max_scan_bytes: int) -> Column:
    """Bounded page prefix as a string WITHOUT charset validation: the
    binary→string cast keeps malformed bytes opaque instead of raising
    the way ``decode(…, 'UTF-8')`` does (a 100 TB scan meets mojibake
    and mid-codepoint prefix cuts on the first partition; the regex
    batteries treat the bad bytes as noise)."""
    return F.substring(F.col(col).cast("binary"), 1, max_scan_bytes).cast(
        "string"
    )


def _html_tags(text: Column, tag: str) -> Column:
    """All whole ``<tag …>`` opening tags in the bounded page prefix —
    the first step of tag-scoped attribute extraction (attributes are
    then pulled per-element, so pairing can never cross tag
    boundaries and attribute order is free)."""
    return F.regexp_extract_all(text, F.lit(rf"(?is)<{tag}\s[^>]*>"), F.lit(0))


def _tag_attr(tag_str: Column, name: str) -> Column:
    """Attribute value pulled from ONE tag string, token form: stops at
    whitespace/quote — right for URL- and tag-valued attributes
    (href/hreflang/rel).  The leading ``\\s`` pins the attribute-name
    boundary so ``data-href`` never matches ``href``."""
    return F.nullif(
        F.regexp_extract(
            tag_str, rf"""(?is)\s{name}\s*=\s*["']?([^"'\s<>]+)""", 1
        ),
        F.lit(""),
    )


def _tag_attr_quoted(tag_str: Column, name: str) -> Column:
    """Attribute value from ONE tag string, full-value form: a quoted
    value keeps internal spaces (``content="fr, en"``), an unquoted
    value stops at whitespace.  Three coalesced pulls because a single
    RE2/Java-portable regex cannot alternate capture groups through
    ``regexp_extract``'s one-group contract."""
    dq = F.regexp_extract(
        tag_str, rf'(?is)\s{name}\s*=\s*"([^"]*)"', 1
    )
    sq = F.regexp_extract(
        tag_str, rf"(?is)\s{name}\s*=\s*'([^']*)'", 1
    )
    bare = F.regexp_extract(
        tag_str, rf"""(?is)\s{name}\s*=\s*([^"'\s<>][^\s<>]*)""", 1
    )
    return F.nullif(
        F.coalesce(F.nullif(dq, F.lit("")), F.nullif(sq, F.lit("")), bare),
        F.lit(""),
    )


def canonical_url(url_col: Column) -> Column:
    no_frag = F.regexp_replace(url_col, r"#.*$", "")
    head = F.regexp_extract(no_frag, r"^([A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*)", 1)
    rest = F.substring(no_frag, F.length(head) + 1, F.lit(2_147_483_647))
    head = F.lower(head)
    head = F.regexp_replace(head, r"^(http://[^:/]*):80$", r"$1")
    head = F.regexp_replace(head, r"^(https://[^:/]*):443$", r"$1")
    path = F.regexp_extract(rest, r"^([^?]*)", 1)
    query = F.regexp_extract(rest, r"^[^?]*\?(.*)$", 1)
    params = F.sort_array(
        F.filter(
            F.split(query, "&"),
            lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_PATTERN),
        )
    )
    qs = F.concat_ws("&", params)
    return F.concat(
        head,
        F.when(path == "", F.lit("/")).otherwise(path),
        F.when(qs != "", F.concat(F.lit("?"), qs)).otherwise(F.lit("")),
    )


def canonicalize_urls(
    df: DataFrame, url_col: str = "url", out_col: str = "canon_url"
) -> DataFrame:
    return df.withColumn(out_col, canonical_url(F.col(url_col)))


def registrable_domain(url_col: Column) -> Column:
    """Last two host labels of the (lowercased) authority — the cheap
    registrable-domain approximation (a real deployment swaps in the
    public-suffix list; the two-label rule is the standard stand-in and is
    exactly replayable in SQL)."""
    host = F.regexp_extract(F.lower(url_col), r"^[a-z][a-z0-9+.\-]*://([^/:?#]*)", 1)
    two = F.regexp_extract(host, r"([^.]+\.[^.]+)$", 1)
    return F.when(two != "", two).otherwise(host)


def domain_stats(
    df: DataFrame, url_col: str = "url", text_col: str | None = "text"
) -> DataFrame:
    """Per-registrable-domain corpus statistics — the input to the
    per-domain quota/filter pass every web-corpus pipeline runs (domain
    caps, spam-domain drops).  One combiner-enabled groupBy on a slim
    (domain, n_chars) projection."""
    slim = df.select(
        registrable_domain(F.col(url_col)).alias("domain"),
        *(
            [F.length(F.col(text_col)).cast("long").alias("_chars")]
            if text_col
            else []
        ),
    )
    aggs = [F.count("*").alias("n_docs")]
    if text_col:
        aggs.append(F.sum("_chars").alias("total_chars"))
    return slim.groupBy("domain").agg(*aggs)


def filter_blocked_urls(
    df: DataFrame,
    blocked_domains: DataFrame,
    url_col: str = "url",
) -> DataFrame:
    """Drop rows whose registrable domain appears in a blocklist (the
    UT1/adult-list shape every CC pipeline applies).  The blocklist is a
    one-column ``(domain)`` DataFrame; the filter is a broadcast anti-join
    on the registrable domain — no shuffle of the page table, blocklists
    (even UT1's ~4M rows) broadcast comfortably."""
    bl = F.broadcast(blocked_domains.select(F.col("domain").alias("__bl_domain")))
    return (
        df.withColumn("__dom", registrable_domain(F.col(url_col)))
        .join(bl, F.col("__dom") == F.col("__bl_domain"), "left_anti")
        .drop("__dom")
    )


def extract_outlinks(
    pages: DataFrame,
    html_col: str = "html",
    url_col: str = "url",
    max_scan_bytes: int = 1 << 20,
) -> DataFrame:
    """(url, href …) → one (url, target) row per ``<a href=…>`` — the
    frontier/webgraph primitive.  Entirely JVM-side column algebra: one
    regexp_extract_all over the (bounded) page prefix, then a when-chain
    resolving each href the way a crawler does:

    * ``http(s)://…``     kept verbatim
    * ``//host/path``     inherits the source scheme
    * ``/path``           joins the source origin
    * ``other``           joins the source directory (naive relative —
      no ``..`` normalization; canonicalize_urls downstream if needed)
    * ``#…``, ``javascript:``, ``mailto:``, ``data:``, empty → dropped

    The explode is the only row amplification; no shuffle at all until
    the caller aggregates.  ``max_scan_bytes`` bounds the regex scan on
    pathological pages."""
    # JVM-side utf-8 decode: href/url bytes are overwhelmingly ASCII (and
    # non-ASCII hrefs are percent-encoded by compliant generators); a page
    # in a legacy charset can mangle the rare raw non-ASCII href — the
    # charset-exact path is the Python-side extractor (sniff_decode), this
    # operator deliberately stays in codegen
    page_text = _permissive_text(html_col, max_scan_bytes)
    # (?:[^>]*?\s)? pins href to an ATTRIBUTE boundary: without it the
    # quoted pattern also matches the href= suffix of data-href= /
    # xlink:href= and one tag emits two targets
    quoted = "(?i)<a\\s(?:[^>]*?\\s)?href\\s*=\\s*[\"']([^\"'<>]+)"
    unquoted = "(?i)<a\\s(?:[^>]*?\\s)?href\\s*=\\s*([^\\s\"'<>]+)"
    hrefs = F.concat(
        F.regexp_extract_all(page_text, F.lit(quoted), F.lit(1)),
        F.regexp_extract_all(page_text, F.lit(unquoted), F.lit(1)),
    )
    src = F.col(url_col)
    return (
        pages.select(src.alias(url_col), F.explode(hrefs).alias("_href"))
        .where(_keepable_href(F.col("_href")))
        .select(F.col(url_col), _resolve_href(F.col("_href"), src).alias("target"))
        .where(F.col("target").rlike(r"^(?i)https?://"))
    )


def _keepable_href(h: Column) -> Column:
    """Anchors a crawler follows: non-empty, not a fragment, not a
    non-fetchable scheme."""
    return (
        (F.length(h) > 0)
        & ~h.startswith("#")
        & ~h.rlike(r"^(?i)(javascript|mailto|data|tel):")
    )


def _resolve_href(h: Column, src: Column) -> Column:
    """Crawler-style href resolution against the source URL: absolute
    kept, ``//host`` inherits the scheme, ``/path`` joins the origin,
    bare-relative joins the source directory (naive — no ``..``
    normalization)."""
    origin = F.regexp_extract(src, r"^(https?://[^/]+)", 1)
    scheme = F.regexp_extract(src, r"^(https?):", 1)
    srcdir = F.regexp_replace(src, r"[^/]*$", "")
    return (
        F.when(h.rlike(r"^(?i)https?://"), h)
        .when(h.startswith("//"), F.concat(scheme, F.lit(":"), h))
        .when(h.startswith("/"), F.concat(origin, h))
        .otherwise(F.concat(srcdir, h))
    )


def extract_anchor_texts(
    pages: DataFrame,
    html_col: str = "html",
    url_col: str = "url",
    max_scan_bytes: int = 1 << 20,
) -> DataFrame:
    """(url, html) → one (url, target, anchor) row per quoted
    ``<a href=…>text</a>`` — anchor text is the strongest external
    description of a target page (the classic web-IR signal a corpus
    pipeline aggregates for titles/queries).  Inner tags are stripped and
    whitespace collapsed; empty anchors (image links) are dropped.

    JVM-side end to end: the two capture groups are pulled by two
    ``regexp_extract_all`` passes over the same bounded prefix (Spark's
    extract-all takes ONE group index), zipped positionally, exploded
    once.  Only quoted hrefs carry anchor pairing (the unquoted form is
    handled by ``extract_outlinks``; pairing both forms positionally
    would interleave wrong)."""
    page_text = _permissive_text(html_col, max_scan_bytes)
    # attribute-boundary href (no data-href double-claims) + tempered
    # inner text that refuses to cross into a following <a — an UNCLOSED
    # anchor drops its own pair instead of swallowing the next anchors'
    # text up to the stray </a>
    pat = (
        r"""(?is)<a\s(?:[^>]*?\s)?href\s*=\s*["']([^"'<>]+)["']"""
        r"""[^>]*>((?:(?!<a[\s>]).)*?)</a"""
    )
    pairs = F.arrays_zip(
        F.regexp_extract_all(page_text, F.lit(pat), F.lit(1)).alias("href"),
        F.regexp_extract_all(page_text, F.lit(pat), F.lit(2)).alias("raw"),
    )
    src = F.col(url_col)
    anchor = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.col("_p.raw"), r"<[^>]*>", " "), r"\s+", " "
        )
    )
    h = F.col("_p.href")
    return (
        pages.select(src.alias(url_col), F.explode(pairs).alias("_p"))
        .where(_keepable_href(h))
        .select(
            F.col(url_col),
            _resolve_href(h, src).alias("target"),
            anchor.alias("anchor"),
        )
        .where(F.col("target").rlike(r"^(?i)https?://") & (F.col("anchor") != ""))
    )


def top_anchors_per_domain(anchors: DataFrame, k: int = 3) -> DataFrame:
    """(url, target, anchor) → the k most frequent anchor texts per
    target registrable domain: (domain, anchor, n_refs, rank).  One
    map-side-combined groupBy then a per-domain top-k window on the
    already-aggregated (small) table; ties break lexically so the result
    is deterministic."""
    from pyspark.sql import Window

    counts = (
        anchors.select(
            registrable_domain(F.col("target")).alias("domain"), "anchor"
        )
        .groupBy("domain", "anchor")
        .agg(F.count("*").alias("n_refs"))
    )
    w = (
        Window.partitionBy("domain")
        .orderBy(F.col("n_refs").desc(), F.col("anchor"))
    )
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def canonical_dedup(
    pages: DataFrame, html_col: str = "html", url_col: str = "url"
) -> DataFrame:
    """Collapse URL variants that declare the same ``rel=canonical``
    target to ONE representative row — the publisher-declared dedup a web
    corpus applies before any content-based dedup (print views, mobile
    mirrors, tracking-URL duplicates all point at one canonical).

    Cluster key = declared canonical target (or own URL when absent);
    the representative is the member whose URL IS the canonical target
    when captured, else the lexically-smallest member.  One shuffle on
    the cluster key; all original columns pass through.  Only the
    rel=canonical regex runs per page (not the full page_meta battery —
    the other head scans would be paid and dropped)."""
    canon = _canonical_of(_permissive_text(html_col, 8192))
    cluster = F.coalesce(
        F.when(canon == "", None).otherwise(canon), F.col(url_col)
    )
    from pyspark.sql import Window

    w = Window.partitionBy("__cluster").orderBy(
        (F.col(url_col) == F.col("__cluster")).desc(), F.col(url_col)
    )
    return (
        pages.withColumn("__cluster", cluster)
        .withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__cluster", "__rn")
    )


def extract_sitemap_urls(
    sitemaps: DataFrame,
    xml_col: str = "xml",
    url_col: str = "url",
    max_scan_bytes: int = 8 << 20,
) -> DataFrame:
    """Sitemap / sitemap-index scan: (sitemap url, xml) → one
    (url, loc, is_index) row per ``<loc>`` entry.  ``is_index`` is true
    when the document is a ``<sitemapindex>`` (its locs are CHILD
    sitemaps to fetch, not pages) — the two-level walk every crawler
    seeds its frontier from.  JVM-side: one bounded decode, one
    regexp_extract_all, one explode; CDATA wrappers stripped."""
    xml_text = _permissive_text(xml_col, max_scan_bytes)
    locs = F.regexp_extract_all(
        xml_text, F.lit(r"(?is)<loc[^>]*>\s*(.*?)\s*</loc"), F.lit(1)
    )
    is_index = xml_text.rlike(r"(?is)<\s*sitemapindex[\s>]")
    loc = F.regexp_replace(
        F.col("_loc"), r"(?is)^<!\[CDATA\[\s*(.*?)\s*\]\]>$", r"$1"
    )
    return (
        sitemaps.select(
            F.col(url_col).alias(url_col),
            is_index.alias("is_index"),
            F.explode(locs).alias("_loc"),
        )
        .select(F.col(url_col), loc.alias("loc"), "is_index")
        .where(F.col("loc").rlike(r"^(?i)https?://"))
    )


def crawl_frontier(
    pages: DataFrame,
    crawled: DataFrame,
    per_domain_limit: int = 1000,
    html_col: str = "html",
    url_col: str = "url",
    crawled_col: str = "url",
) -> DataFrame:
    """The next crawl wave: outlinks of the fetched pages →
    canonicalized distinct targets → minus everything already crawled →
    capped per registrable domain (the politeness/budget cap) —
    (domain, target, rank) with rank 1..limit in lexical target order
    (deterministic across runs and partitionings).

    Scale shape: the distinct and the anti-join shuffle on the canonical
    target (the natural key); the per-domain cap is one window on the
    already-deduplicated slim table.  ``crawled`` can be arbitrarily
    large — the anti-join is sort-merge, no driver-side set."""
    from pyspark.sql import Window

    links = extract_outlinks(pages, html_col=html_col, url_col=url_col)
    targets = links.select(
        canonical_url(F.col("target")).alias("target")
    ).distinct()
    seen = crawled.select(
        canonical_url(F.col(crawled_col)).alias("__seen")
    )
    fresh = targets.join(seen, F.col("target") == F.col("__seen"), "left_anti")
    w = Window.partitionBy("domain").orderBy("target")
    return (
        fresh.withColumn("domain", registrable_domain(F.col("target")))
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= per_domain_limit)
        .select("domain", "target", "rank")
    )


def url_quality_features(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Classic URL-shape quality/spam signals, appended as columns:
    ``url_len``, ``host_len``, ``host_hyphens``, ``path_depth`` ('/'
    count in the path), ``n_digits`` / ``digit_ratio`` (spammy URLs are
    digit-heavy), ``n_params`` (query parameter count).  Pure codegen
    column algebra (length/replace arithmetic — every rule replayable in
    portable SQL); no shuffle."""
    u = F.col(url_col)
    host = F.regexp_extract(u, r"^[A-Za-z][A-Za-z0-9+.\-]*://([^/?#]*)", 1)
    path = F.regexp_extract(u, r"^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*([^?#]*)", 1)
    query = F.regexp_extract(u, r"\?([^#]*)", 1)

    def n_char(col: Column, ch: str) -> Column:
        return F.length(col) - F.length(F.replace(col, F.lit(ch)))

    n_digits = F.length(u) - F.length(F.regexp_replace(u, r"[0-9]", ""))
    return df.select(
        "*",
        F.length(u).cast("int").alias("url_len"),
        F.length(host).cast("int").alias("host_len"),
        n_char(host, "-").cast("int").alias("host_hyphens"),
        n_char(path, "/").cast("int").alias("path_depth"),
        n_digits.cast("int").alias("n_digits"),
        F.round(n_digits / F.length(u), 6).alias("digit_ratio"),
        F.when(query == "", F.lit(0))
        .otherwise(n_char(query, "&") + 1)
        .cast("int")
        .alias("n_params"),
    )


def recrawl_diff(
    old: DataFrame,
    new: DataFrame,
    url_col: str = "url",
    text_col: str = "text",
) -> DataFrame:
    """Snapshot diff between two crawls of the same corpus — the
    re-crawl scheduler's input (changed pages re-extract, added pages
    enter the pipeline, removed pages tombstone): one row per canonical
    URL with ``status`` ∈ added / removed / changed / unchanged.

    One full-outer sort-merge join on the canonical URL over slim
    (url, content-hash) projections — the page text never shuffles.
    URL variants that canonicalize identically within one snapshot
    collapse first (min hash — deterministic pick), so the output is
    exactly one row per canonical URL; presence is tracked explicitly,
    so a NULL text column cannot masquerade as an absent row."""

    def side(df: DataFrame, hash_alias: str, present_alias: str) -> DataFrame:
        return (
            df.select(
                canonical_url(F.col(url_col)).alias("url"),
                F.md5(F.col(text_col)).alias("__h"),
            )
            .groupBy("url")
            .agg(F.min("__h").alias(hash_alias))
            .withColumn(present_alias, F.lit(True))
        )

    o = side(old, "__old_hash", "__old_present")
    n = side(new, "__new_hash", "__new_present")
    status = (
        F.when(
            ~F.coalesce(F.col("__old_present"), F.lit(False)), F.lit("added")
        )
        .when(
            ~F.coalesce(F.col("__new_present"), F.lit(False)), F.lit("removed")
        )
        .when(
            F.col("__old_hash").eqNullSafe(F.col("__new_hash")),
            F.lit("unchanged"),
        )
        .otherwise(F.lit("changed"))
    )
    return o.join(n, "url", "full_outer").select("url", status.alias("status"))


def crawl_schedule(
    frontier: DataFrame,
    rules: DataFrame,
    default_delay_s: float = 1.0,
) -> DataFrame:
    """Politeness-aware fetch plan: the ``crawl_frontier`` output joined
    (broadcast) with the ``robots_rules`` Crawl-delay per domain →
    (domain, target, rank, eta_s) where ``eta_s = (rank−1) · delay`` and
    delay = max(declared crawl delay, default) — a host is fetched
    serially at its declared pace, hosts run in parallel.  No shuffle of
    the frontier (the per-domain rank already exists)."""
    r = F.broadcast(
        rules.select("domain", F.col("crawl_delay").alias("__delay"))
    )
    # greatest skips NULL inputs, so a missing/undeclared delay already
    # resolves to the (non-null) default
    delay = F.greatest(F.col("__delay"), F.lit(default_delay_s))
    return (
        frontier.join(r, "domain", "left")
        .select(
            "domain",
            "target",
            "rank",
            ((F.col("rank") - 1) * delay).alias("eta_s"),
        )
    )


def domain_graph(
    outlinks: DataFrame, url_col: str = "url", target_col: str = "target"
) -> DataFrame:
    """Outlink rows → the registrable-domain webgraph edge table
    (src_domain, dst_domain, n_links).  One map-side-combined groupBy on
    the slim domain pair; self-loops kept (intra-site link mass is a
    real quality signal)."""
    return (
        outlinks.select(
            registrable_domain(F.col(url_col)).alias("src_domain"),
            registrable_domain(F.col(target_col)).alias("dst_domain"),
        )
        .groupBy("src_domain", "dst_domain")
        .agg(F.count("*").alias("n_links"))
    )


def page_meta(
    pages: DataFrame,
    html_col: str = "html",
    max_scan_bytes: int = 8192,
) -> DataFrame:
    """Head-metadata columns from the page prefix, JVM-side:
    ``page_title`` (first <title> text, entity-light trim),
    ``page_noindex`` / ``page_nofollow`` (robots meta directives — the
    pages a polite corpus must exclude from training/link-following),
    ``page_canonical`` (rel=canonical href or null).  Output columns are
    ``page_``-prefixed so they cannot silently shadow caller columns.
    One bounded decode + a handful of regexes over the first
    ``max_scan_bytes`` (the WHATWG-prescan-style bound); no shuffle.

    Robots handling covers the forms real CMSes emit: both attribute
    orders (``name=… content=…`` and the reversed ``content=… name=…``),
    quoted and unquoted content values, MULTIPLE robots metas on one page
    (directives union), and the ``none`` directive (= noindex,nofollow).
    A NULL html column yields false flags (nothing declared), never a
    dropped row downstream."""
    head = _permissive_text(html_col, max_scan_bytes)
    title = F.regexp_extract(head, r"(?is)<title[^>]*>\s*(.*?)\s*</title", 1)
    # all robots metas, both attribute orders × quoted/unquoted content
    # (quoted values may contain spaces/commas; unquoted stop at
    # whitespace; [^>]*? never crosses a tag boundary, so the reversed
    # patterns can't pair content from one tag with name from the next)
    _robots_pats = (
        r"""(?is)<meta\s[^>]*?name\s*=\s*["']?robots["']?[^>]*?content\s*=\s*["']([^"'<>]*)""",
        r"""(?is)<meta\s[^>]*?name\s*=\s*["']?robots["']?[^>]*?content\s*=\s*([^\s"'<>]+)""",
        r"""(?is)<meta\s[^>]*?content\s*=\s*["']([^"'<>]*)["'][^>]*?name\s*=\s*["']?robots["']?""",
        r"""(?is)<meta\s[^>]*?content\s*=\s*([^\s"'<>]+)[^>]*?name\s*=\s*["']?robots["']?""",
    )
    # concat_ws skips NULL pieces, so a NULL head (fetch-failed row)
    # degrades to "" → both flags false rather than NULL
    robots = F.lower(
        F.concat_ws(
            ",",
            *(
                F.array_join(
                    F.regexp_extract_all(head, F.lit(p), F.lit(1)), ","
                )
                for p in _robots_pats
            ),
        )
    )
    canonical = _canonical_of(head)
    # token-exact directive match (comma-split, trimmed): a substring
    # test would flag the harmless 'max-image-preview:none' as noindex
    tokens = F.transform(F.split(robots, ","), lambda t: F.trim(t))
    has = lambda *names: F.exists(  # noqa: E731
        tokens, lambda t: functools.reduce(or_, [t == n for n in names])
    )
    return pages.select(
        "*",
        F.when(title == "", None).otherwise(title).alias("page_title"),
        (has("noindex", "none")).alias("page_noindex"),
        (has("nofollow", "none")).alias("page_nofollow"),
        F.when(canonical == "", None)
        .otherwise(canonical)
        .alias("page_canonical"),
    )


def _canonical_of(head: Column) -> Column:
    """rel=canonical href from a bounded head prefix ('' when absent)."""
    return F.regexp_extract(
        head,
        r"""(?is)<link\s[^>]*?rel\s*=\s*["']?canonical["']?[^>]*?href\s*=\s*["']([^"'<>]+)""",
        1,
    )


def drop_noindex(pages: DataFrame, html_col: str = "html") -> DataFrame:
    """Exclude pages whose robots meta declares noindex (or ``none``) —
    the polite-crawl gate a training corpus runs before everything else
    (a directive the publisher set; honoring it is not optional).  Rows
    with a NULL html column carry no directive and are KEPT."""
    return page_meta(pages, html_col).where(~F.col("page_noindex")).drop(
        "page_title", "page_noindex", "page_nofollow", "page_canonical"
    )


def _domain_graph(
    edges: DataFrame, src_col: str, dst_col: str
) -> tuple[DataFrame, DataFrame]:
    """Shared graph prep for the webgraph score family: deduplicated
    (src, dst) edge table plus the node set (either endpoint), both
    localCheckpointed — every fixed-point operator re-reads them each
    round."""
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).distinct()
    e = e.localCheckpoint(eager=False)
    nodes = (
        e.select(F.col("src").alias("domain"))
        .union(e.select(F.col("dst").alias("domain")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    return e, nodes


def _pagerank_fixed_point(
    e: DataFrame,
    nodes: DataFrame,
    init,
    reset,
    damping: float,
    iterations: int,
) -> DataFrame:
    """Shared simple-variant PageRank fixed point (the teleport vector
    parameterizes uniform PageRank vs seed-restricted TrustRank):
    rank₀ = ``init``; rankₜ₊₁(v) = ``reset``(v) + d·Σ rankₜ(u)/out(u)
    over distinct in-edges, no dangling-mass redistribution.  ``reset``
    is passed pre-folded (e.g. ``lit((1−d)/n)``) rather than rebuilt as
    ``lit(1−d)·tp`` so callers keep the exact float expression shape
    their 9-dp-rounded SQL oracles replay.  Per round one slim
    (domain, rank) join onto the edge list + one map-side-combined
    groupBy on dst, eager localCheckpoint per round (iterative-lineage
    hygiene)."""
    outdeg = e.groupBy("src").agg(F.count("*").alias("out"))
    ranks = nodes.select("domain", init.alias("rank")).localCheckpoint(
        eager=True
    )
    for _ in range(iterations):
        contribs = (
            e.join(outdeg, "src")
            .join(ranks, e.src == ranks.domain)
            .select(
                F.col("dst").alias("domain"),
                (F.col("rank") / F.col("out")).alias("c"),
            )
            .groupBy("domain")
            .agg(F.sum("c").alias("in_mass"))
        )
        ranks = (
            nodes.join(contribs, "domain", "left")
            .select(
                "domain",
                (
                    reset
                    + F.lit(damping) * F.coalesce("in_mass", F.lit(0.0))
                ).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks


def domain_rank(
    edges: DataFrame,
    damping: float = 0.85,
    iterations: int = 10,
    src_col: str = "src_domain",
    dst_col: str = "dst_domain",
) -> DataFrame:
    """PageRank over the (deduplicated) domain edge table — the classic
    webgraph quality prior a pretraining corpus weighs domains by.

    Simple-variant semantics (documented so the oracle can replay it
    term-for-term): rank₀ = 1/N; rankₜ₊₁(v) = (1−d)/N + d·Σ rankₜ(u)/out(u)
    over distinct in-edges, NO dangling-mass redistribution (scores are a
    relative prior, not a probability vector).  Fixed iteration count —
    deterministic output, and at diameter-bounded web graphs 10 rounds is
    the standard operating point.

    Scale shape: per round one join of the slim (domain, rank) table onto
    the edge list and one map-side-combined groupBy on dst — both keyed on
    the domain, so a pre-partitioned/bucketed edge table reuses its
    layout.  Each round eagerly localCheckpoints the slim rank table
    (iterative-lineage hygiene, same as connected_components).  Returns
    (domain, rank) rounded to 9 dp."""
    e, nodes = _domain_graph(edges, src_col, dst_col)
    n = nodes.count()
    if n == 0:
        # empty edge table (e.g. the filters upstream emptied the graph):
        # an empty (domain, rank) frame, not a 1/N ZeroDivisionError
        return nodes.select("domain", F.lit(0.0).alias("rank"))
    ranks = _pagerank_fixed_point(
        e,
        nodes,
        F.lit(1.0 / n),
        F.lit((1.0 - damping) / n),
        damping,
        iterations,
    )
    return ranks.select("domain", F.round("rank", 9).alias("rank"))


def trust_rank(
    edges: DataFrame,
    seeds: list[str],
    damping: float = 0.85,
    iterations: int = 10,
    src_col: str = "src_domain",
    dst_col: str = "dst_domain",
) -> DataFrame:
    """TrustRank (Gyöngyi, Garcia-Molina & Pedersen 2004, VLDB): PageRank
    with the teleport vector restricted to a hand-vetted seed set, so
    trust decays with link distance from known-good domains — the spam
    demotion prior a web corpus combines with :func:`domain_rank` (which
    a link farm can inflate; a farm with no in-path from seeds gets ~0
    here).

    Same simple-variant fixed-point as domain_rank with ``tp(v) =
    1/|seeds|`` on seeds, else 0: rank₀ = tp; rankₜ₊₁(v) = (1−d)·tp(v)
    + d·Σ rankₜ(u)/out(u).  Seeds are a driver-side list (vetted sets
    are small by definition) compiled into the plan as an isin literal —
    no join, no broadcast table.  Per-round cost is identical to
    domain_rank: one slim rank-table join keyed on domain + one
    map-side-combined groupBy; eager localCheckpoint per round bounds
    the iterative lineage.  Returns (domain, trust) rounded to 9 dp."""
    if not seeds:
        raise ValueError("trust_rank requires a non-empty seed set")
    e, nodes = _domain_graph(edges, src_col, dst_col)
    tp = F.when(
        F.col("domain").isin(*seeds), F.lit(1.0 / len(seeds))
    ).otherwise(F.lit(0.0))
    ranks = _pagerank_fixed_point(
        e, nodes, tp, F.lit(1.0 - damping) * tp, damping, iterations
    )
    return ranks.select("domain", F.round("rank", 9).alias("trust"))


def hits_scores(
    edges: DataFrame,
    iterations: int = 5,
    src_col: str = "src_domain",
    dst_col: str = "dst_domain",
) -> DataFrame:
    """HITS hubs-and-authorities over the (deduplicated) domain edge
    table — the complementary webgraph prior to :func:`domain_rank`
    (PageRank rewards being linked; authority rewards being linked BY
    GOOD HUBS, and hub scores surface the directory/aggregator domains a
    crawl frontier should expand first).

    Kleinberg's iteration, L1-normalized each half-step so the oracle can
    replay it term-for-term: hub_0 = auth_0 = 1/N; auth'(v) = Σ hub(u)
    over distinct in-edges then auth = auth'/Σauth'; hub'(u) = Σ auth(v)
    over distinct out-edges then hub = hub'/Σhub'.  Fixed iteration
    count; nodes with no in-edges (resp. out-edges) carry authority
    (resp. hub) 0 after the first round.

    Scale shape: per half-step one slim (domain, score) join onto the
    edge list + one map-side-combined groupBy — identical movement to
    PageRank; the normalizer is a 1-row aggregate broadcast back via
    crossJoin (never collected).  Eager localCheckpoint per round keeps
    the iterative lineage flat.  Returns (domain, hub, authority)
    rounded to 9 dp."""
    e, nodes = _domain_graph(edges, src_col, dst_col)
    n = nodes.count()
    if n == 0:
        return nodes.select(
            "domain",
            F.lit(0.0).alias("hub"),
            F.lit(0.0).alias("authority"),
        )
    scores = nodes.select(
        "domain", F.lit(1.0 / n).alias("hub"), F.lit(1.0 / n).alias("auth")
    ).localCheckpoint(eager=True)

    def _half_step(
        scores: DataFrame, from_col: str, to_col: str, score_col: str
    ) -> DataFrame:
        """Sum ``score_col`` over edges into ``to_col`` endpoints, then
        L1-normalize; returns the slim (domain, new) table."""
        raw = (
            e.join(scores, e[from_col] == scores.domain)
            .select(F.col(to_col).alias("domain"), F.col(score_col).alias("c"))
            .groupBy("domain")
            .agg(F.sum("c").alias("raw"))
        )
        full = nodes.join(raw, "domain", "left").select(
            "domain", F.coalesce("raw", F.lit(0.0)).alias("raw")
        )
        total = full.agg(F.sum("raw").alias("__t"))
        return full.crossJoin(F.broadcast(total)).select(
            "domain",
            F.when(F.col("__t") > 0, F.col("raw") / F.col("__t"))
            .otherwise(F.lit(0.0))
            .alias("new"),
        )

    for _ in range(iterations):
        auth = _half_step(scores, "src", "dst", "hub").withColumnRenamed(
            "new", "auth2"
        )
        hub = _half_step(auth.withColumnRenamed("auth2", "auth"), "dst", "src", "auth")
        scores = (
            auth.join(hub.withColumnRenamed("new", "hub2"), "domain")
            .select(
                "domain",
                F.col("hub2").alias("hub"),
                F.col("auth2").alias("auth"),
            )
            .localCheckpoint(eager=True)
        )
    return scores.select(
        "domain",
        F.round("hub", 9).alias("hub"),
        F.round("auth", 9).alias("authority"),
    )


def _strip_tags(col: Column) -> Column:
    """Inner text of an HTML fragment: tags → spaces, whitespace
    collapsed, trimmed (RE2-portable; the DuckDB oracle replays it)."""
    return F.trim(
        F.regexp_replace(
            F.regexp_replace(col, F.lit(r"(?s)<[^>]*>"), F.lit(" ")),
            F.lit(r"\s+"),
            F.lit(" "),
        )
    )


def extract_headings(
    pages: DataFrame,
    id_col: str = "doc_id",
    html_col: str = "html",
    max_scan_bytes: int = 1 << 20,
) -> DataFrame:
    """Document outline from the page body: one row per ``<h1>``–``<h6>``
    element in document order — ``(id, pos, level, heading)``.  This is
    the chapter/section skeleton the reference's Step-3 structuring pass
    derives from CHAPTER lines (reference
    `text-processing/Step3_structuring_v1.py`), re-expressed for web
    pages where the structure is explicit markup.

    Pure per-row column algebra (permissive decode + regexp_extract_all
    + posexplode): no shuffle, scales linearly with pages.  Regex-level
    parsing by design: headings nested inside comments/scripts are rare
    enough on real crawls that a full DOM parse (a Python UDF) isn't
    worth leaving codegen for this signal.
    """
    body = _permissive_text(html_col, max_scan_bytes)
    d = pages.select(F.col(id_col), body.alias("__b"))
    exploded = d.select(
        id_col,
        F.posexplode(
            F.regexp_extract_all(
                F.col("__b"),
                F.lit(r"(?is)<h[1-6][^>]*>.*?</h[1-6]\s*>"),
                F.lit(0),
            )
        ).alias("pos", "__m"),
    )
    return exploded.select(
        id_col,
        F.col("pos").cast("int").alias("pos"),
        F.regexp_extract("__m", r"(?i)<h([1-6])", 1)
        .cast("int")
        .alias("level"),
        _strip_tags(F.col("__m")).alias("heading"),
    )


def extract_tables(
    pages: DataFrame,
    id_col: str = "doc_id",
    html_col: str = "html",
    max_scan_bytes: int = 1 << 20,
    cell_sep: str = "|",
) -> DataFrame:
    """HTML table extraction: one output row per ``<tr>`` —
    ``(id, table_id, row_id, n_cells, cells)`` with cell inner texts
    joined by ``cell_sep``.  The structured-data mining pass of a
    web-corpus pipeline (tables are the densest fact source in a crawl).

    Two nested posexplodes over regexp_extract_all (tables → rows, then
    a cells transform per row) — still per-row column algebra with no
    shuffle; a page's tables never leave their partition.  Regex-level:
    a NESTED inner table terminates the outer match early (non-greedy
    ``.*?``), so deeply nested layout tables degrade to their inner
    tables rather than erroring — acceptable for mining, documented
    here.
    """
    body = _permissive_text(html_col, max_scan_bytes)
    d = pages.select(F.col(id_col), body.alias("__b"))
    tables = d.select(
        id_col,
        F.posexplode(
            F.regexp_extract_all(
                F.col("__b"),
                F.lit(r"(?is)<table[^>]*>.*?</table\s*>"),
                F.lit(0),
            )
        ).alias("table_id", "__t"),
    )
    rows = tables.select(
        id_col,
        F.col("table_id").cast("int").alias("table_id"),
        F.posexplode(
            F.regexp_extract_all(
                F.col("__t"),
                F.lit(r"(?is)<tr[^>]*>(.*?)</tr\s*>"),
                F.lit(1),
            )
        ).alias("row_id", "__r"),
    )
    cells = F.transform(
        F.regexp_extract_all(
            F.col("__r"),
            F.lit(r"(?is)<t[dh][^>]*>(.*?)</t[dh]\s*>"),
            F.lit(1),
        ),
        _strip_tags,
    )
    return rows.select(
        id_col,
        "table_id",
        F.col("row_id").cast("int").alias("row_id"),
        F.size(cells).cast("int").alias("n_cells"),
        F.array_join(cells, cell_sep).alias("cells"),
    )


def domain_quality_rank(
    df: DataFrame,
    domain_col: str = "domain",
    keep_col: str = "keep",
    z: float = 1.96,
) -> DataFrame:
    """Per-domain quality with a Wilson-score LOWER bound: rank domains by
    the 95%-confident floor of their quality-pass rate instead of the raw
    fraction, so a 2/2 domain does not outrank an 950/1000 one — the
    statistically honest version of domain-level curation (allowlists,
    crawl-budget assignment).

    ``wilson_lb = (p + z²/2n − z·√((p(1−p) + z²/4n)/n)) / (1 + z²/n)``
    with p = n_quality/n_docs.  One combiner-enabled groupBy on the slim
    (domain, bool) projection; the bound is per-group scalar algebra.
    Returns ``(domain, n_docs, n_quality, quality_rate, wilson_lb)``,
    both rates rounded to 6 dp."""
    z2 = float(z) * float(z)
    agg = df.groupBy(domain_col).agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum(F.when(F.col(keep_col), 1).otherwise(0))
        .cast("long")
        .alias("n_quality"),
    )
    n = F.col("n_docs").cast("double")
    p = F.col("n_quality") / n
    lb = (
        p
        + F.lit(z2) / (2 * n)
        - F.lit(float(z))
        * F.sqrt((p * (1 - p) + F.lit(z2) / (4 * n)) / n)
    ) / (1 + F.lit(z2) / n)
    return agg.select(
        domain_col,
        "n_docs",
        "n_quality",
        F.round(p, 6).alias("quality_rate"),
        F.round(lb, 6).alias("wilson_lb"),
    )


def extract_jsonld(
    pages: DataFrame,
    url_col: str = "url",
    html_col: str = "html",
    max_scan_bytes: int = 65536,
) -> DataFrame:
    """schema.org structured data from JSON-LD script blocks — the
    machine-readable page annotations (Article/Product/Recipe/...) a
    web-corpus pipeline mines for typed metadata and page-type
    classification.  One row per ``<script type="application/ld+json">``
    block: ``(url, block_id, ld_type, ld_name, ld_date)`` via a REAL
    JSON parse (``get_json_object``, JVM-side) — a malformed block
    yields NULL fields, never a dropped page or a raised error
    (permissive-by-construction, like the rest of the web layer).
    Bounded prefix scan, zero shuffles, zero UDFs."""
    text = _permissive_text(html_col, max_scan_bytes)
    pat = (
        r"""(?is)<script[^>]*type\s*=\s*["']application/ld\+json["']"""
        r"""[^>]*>\s*(.*?)\s*</script"""
    )
    arr = F.regexp_extract_all(text, F.lit(pat), F.lit(1))
    exploded = pages.select(
        F.col(url_col).alias("url"), F.posexplode_outer(arr).alias("block_id", "block")
    ).where(F.col("block").isNotNull())
    return exploded.select(
        "url",
        F.col("block_id").cast("int").alias("block_id"),
        F.get_json_object("block", "$['@type']").alias("ld_type"),
        F.get_json_object("block", "$.name").alias("ld_name"),
        F.get_json_object("block", "$.datePublished").alias("ld_date"),
    )


def mirror_domains(
    pages: DataFrame,
    url_col: str = "url",
    text_col: str = "text",
    min_domains: int = 2,
) -> DataFrame:
    """Mirror-site detection: content (by exact md5 of the page text)
    served under ≥ ``min_domains`` distinct registrable domains — the
    standing web-corpus failure mode exact PER-URL dedup misses when the
    dedup key includes the URL, and the evidence a crawl needs to
    collapse mirror families before domain-level quotas (a mirrored site
    otherwise multiplies its quota by its domain count).

    One slim (domain, md5) projection, one combiner-friendly groupBy on
    the hash; domain lists are deduped+sorted in-group so output is
    deterministic.  Returns ``(content_md5, n_pages, n_domains,
    domains_csv)``; join back on md5(text) to tag or drop mirrored
    pages."""
    slim = pages.select(
        registrable_domain(F.col(url_col)).alias("domain"),
        F.md5(F.coalesce(F.col(text_col), F.lit(""))).alias("content_md5"),
    )
    return (
        slim.groupBy("content_md5")
        .agg(
            F.count("*").cast("long").alias("n_pages"),
            F.size(F.collect_set("domain")).alias("n_domains"),
            F.concat_ws(
                ",", F.array_sort(F.collect_set("domain"))
            ).alias("domains_csv"),
        )
        .where(F.col("n_domains") >= min_domains)
    )


def url_templates(
    pages: DataFrame,
    url_col: str = "url",
    min_urls: int = 2,
) -> DataFrame:
    """Crawler-trap / path-template mining: collapse every URL path to a
    skeleton (digit runs → ``{N}``, ≥8-char hex runs → ``{H}``, query
    string dropped) and count URLs per (domain, template).  Calendar
    pages, session-id paths, and paginated archives — the families that
    explode a frontier at crawl time — all collapse to one template row
    whose count and domain share scream "trap" long before content is
    fetched.  Pure regexp_replace chain (codegen, RE2-portable) + one
    combiner-friendly groupBy on a slim projection; ``share`` is the
    template's fraction of its domain's URLs (window over the small
    aggregated table, not the page table)."""
    from pyspark.sql.window import Window

    path = F.regexp_extract(
        F.col(url_col), r"^[a-z][a-z0-9+.\-]*://[^/]*(/[^?#]*)?", 1
    )
    skeleton = F.regexp_replace(
        F.regexp_replace(path, r"[0-9a-f]{8,}", "{H}"),
        r"[0-9]+",
        "{N}",
    )
    slim = pages.select(
        registrable_domain(F.col(url_col)).alias("domain"),
        F.when(skeleton == "", "/").otherwise(skeleton).alias("template"),
    )
    counts = slim.groupBy("domain", "template").agg(
        F.count("*").cast("long").alias("n_urls")
    )
    w = Window.partitionBy("domain")
    return counts.select(
        "domain",
        "template",
        "n_urls",
        F.round(F.col("n_urls") / F.sum("n_urls").over(w), 6).alias("share"),
    ).where(F.col("n_urls") >= min_urls)


def extract_publish_dates(
    pages: DataFrame,
    url_col: str = "url",
    html_col: str = "html",
    max_scan_bytes: int = 16384,
) -> DataFrame:
    """Publication-date extraction — the freshness metadata a corpus
    keeps per page (recency-weighted sampling, time-sliced training
    sets, news dedup windows all key on it).  Resolution order mirrors
    what real pages actually carry, most-authoritative first:

    1. ``<meta property="article:published_time" content=...>`` (Open
       Graph; both attribute orders, quoted or unquoted values),
    2. JSON-LD ``"datePublished": "..."`` anywhere in the scanned prefix,
    3. a ``/YYYY/MM/DD/`` segment in the URL path (the blog/CMS
       convention), months/days pre-filtered to plausible ranges.

    Returns ``(url, published_raw, published_src, published_date)``;
    ``published_date`` is ``to_date`` of the first 10 chars, so a
    malformed raw value (e.g. month 13) yields a row with the raw string
    kept and the date NULL — malformed metadata must never drop a page.
    One bounded decode + a handful of regexes; zero shuffle (the
    page_meta plan shape)."""
    head = _permissive_text(html_col, max_scan_bytes)
    k = r"(?:property|name)"
    meta_pats = (
        rf"""(?is)<meta\s[^>]*?{k}\s*=\s*["']?article:published_time["']?[^>]*?content\s*=\s*["']([^"'<>]+)""",
        rf"""(?is)<meta\s[^>]*?{k}\s*=\s*["']?article:published_time["']?[^>]*?content\s*=\s*([^\s"'<>]+)""",
        rf"""(?is)<meta\s[^>]*?content\s*=\s*["']([^"'<>]+)["'][^>]*?{k}\s*=\s*["']?article:published_time["']?""",
        rf"""(?is)<meta\s[^>]*?content\s*=\s*([^\s"'<>]+)[^>]*?{k}\s*=\s*["']?article:published_time["']?""",
    )
    first_nonempty = F.coalesce(
        *(
            F.nullif(F.regexp_extract(head, p, 1), F.lit(""))
            for p in meta_pats
        )
    )
    jsonld = F.nullif(
        F.regexp_extract(
            head, r'(?is)"datePublished"\s*:\s*"([^"<>]+)"', 1
        ),
        F.lit(""),
    )
    url_date = F.nullif(
        F.regexp_replace(
            F.regexp_extract(
                F.col(url_col),
                r"/((?:19|20)\d{2})/(0[1-9]|1[0-2])/(0[1-9]|[12]\d|3[01])(?:/|$)",
                0,
            ),
            r"^/|/$",
            "",
        ),
        F.lit(""),
    )
    url_iso = F.translate(url_date, "/", "-")
    raw = F.coalesce(first_nonempty, jsonld, url_iso)
    src = (
        F.when(first_nonempty.isNotNull(), F.lit("meta"))
        .when(jsonld.isNotNull(), F.lit("jsonld"))
        .when(url_iso.isNotNull(), F.lit("url"))
    )
    return pages.select(
        F.col(url_col).alias("url"),
        raw.alias("published_raw"),
        src.alias("published_src"),
        # try_to_date, not to_date: the session runs ANSI mode, where
        # to_date RAISES on malformed input — a junk content attribute
        # must yield a NULL date, never a failed scan
        F.try_to_date(F.substring(raw, 1, 10), "yyyy-MM-dd").alias(
            "published_date"
        ),
    )


def link_reciprocity(
    edges: DataFrame,
    src_col: str = "src_domain",
    dst_col: str = "dst_domain",
) -> DataFrame:
    """Per-domain reciprocal-link ratio over the (deduplicated,
    self-loop-free) domain edge table — a classic link-farm tell: organic
    sites link out mostly one-way, while farms and link rings
    cross-link, pushing reciprocity toward 1 (the signal TrustRank-style
    demotion pipelines combine with the rank scores).

    ``ratio = |{(a,b) : (b,a) also present}| / outdegree(a)``, rounded
    to 6 dp.  Plan: one distinct on the slim edge table, one self
    left-semi join keyed (src, dst) against the reversed edges, one
    map-side-combined groupBy — edge-table-sized work throughout, no
    page-table involvement."""
    e = (
        edges.select(
            F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
        )
        .where(F.col("src") != F.col("dst"))
        .distinct()
        .localCheckpoint(eager=False)  # feeds probe AND reverse sides
    )
    rev = e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    recip = e.join(rev, ["src", "dst"], "left_semi")
    out = e.groupBy("src").agg(F.count("*").alias("n_out"))
    rec = recip.groupBy("src").agg(F.count("*").alias("n_recip"))
    return (
        out.join(rec, "src", "left")
        .select(
            F.col("src").alias("domain"),
            "n_out",
            F.coalesce("n_recip", F.lit(0)).alias("n_recip"),
            F.round(
                F.coalesce("n_recip", F.lit(0)) / F.col("n_out").cast("double"),
                6,
            ).alias("reciprocity"),
        )
    )


def domain_lang_consistency(
    df: DataFrame,
    url_col: str = "url",
    lang_col: str = "lang",
    min_consistency: float = 0.8,
) -> DataFrame:
    """Per-domain language-mix audit: each registrable domain's majority
    language and the fraction of its pages carrying it — a low
    consistency is the classic tell for mis-tagged languages, scraped
    mirror mixes, or an MT-spam farm (content farms machine-translate
    one corpus into many languages under one domain), and routes the
    domain to review before per-language sampling trusts its tags.

    Majority ties break (count desc, lang asc) so the verdict is
    deterministic.  Plan: one map-side-combined (domain, lang) count,
    then a window over the AGGREGATED table (bounded by domains ×
    languages, not pages) — page rows shuffle once as slim pairs."""
    from pyspark.sql.window import Window

    counts = (
        df.select(
            registrable_domain(F.col(url_col)).alias("domain"),
            F.col(lang_col).alias("_lang"),
        )
        .groupBy("domain", "_lang")
        .agg(F.count("*").alias("_n"))
    )
    w = Window.partitionBy("domain").orderBy(
        F.desc("_n"), F.asc_nulls_last("_lang")
    )
    tot = Window.partitionBy("domain")
    ranked = counts.select(
        "domain",
        "_lang",
        "_n",
        F.row_number().over(w).alias("_r"),
        F.sum("_n").over(tot).alias("_tot"),
    ).where(F.col("_r") == 1)
    consistency = F.round(F.col("_n") / F.col("_tot").cast("double"), 6)
    return ranked.select(
        "domain",
        F.col("_tot").alias("n_docs"),
        F.col("_lang").alias("majority_lang"),
        F.col("_n").alias("n_majority"),
        consistency.alias("consistency"),
        (consistency < F.lit(float(min_consistency))).alias("is_mixed"),
    )


def extract_feed_items(
    pages: DataFrame,
    url_col: str = "url",
    html_col: str = "html",
    max_scan_bytes: int = 1 << 20,
) -> DataFrame:
    """RSS/Atom feed-item extraction — the discovery source crawls poll
    between full recrawls (a feed hands over fresh URLs + titles far
    cheaper than re-fetching every page).  RSS ``<item>`` blocks yield
    ``<title>``/``<link>`` children; Atom ``<entry>`` blocks yield
    ``<title>`` and ``<link href=…>``.  Titles unwrap one CDATA layer
    (the sitemap-scan convention); items lacking a link are dropped,
    missing titles surface as NULL (a link-only item is still a crawl
    lead).  Per-block inner extraction runs inside a transform lambda
    over the block array, so pairing (title, link) within one item can
    never cross item boundaries — the tag-scoped pairing rule from
    extract_anchor_texts.

    Both kinds ride ONE projection and one explode (the per-kind
    struct arrays concatenate before the generator) — a per-kind
    union would re-run the page scan once per branch, the same
    re-execution shape media_dedup_clusters' banding avoids.  Zero
    shuffle; regexes are RE2-portable."""
    text = _permissive_text(html_col, max_scan_bytes)
    cdata = lambda c: F.regexp_replace(  # noqa: E731
        c, r"(?s)^\s*<!\[CDATA\[(.*?)\]\]>\s*$", "$1"
    )

    def per_kind(kind: str, block_pat: str, link_pat: str) -> Column:
        blocks = F.regexp_extract_all(text, F.lit(block_pat), F.lit(0))
        return F.transform(
            blocks,
            lambda b: F.struct(
                F.nullif(
                    F.trim(
                        cdata(
                            F.regexp_extract(
                                b, r"(?is)<title[^>]*>(.*?)</title", 1
                            )
                        )
                    ),
                    F.lit(""),
                ).alias("item_title"),
                F.nullif(
                    F.trim(F.regexp_extract(b, link_pat, 1)), F.lit("")
                ).alias("item_link"),
                F.lit(kind).alias("kind"),
            ),
        )

    items = F.concat(
        per_kind(
            "rss",
            r"(?is)<item[\s>].*?</item>",
            r"(?is)<link[^>]*>\s*(?:<!\[CDATA\[)?\s*([^<\]\s]+)",
        ),
        per_kind(
            "atom",
            r"(?is)<entry[\s>].*?</entry>",
            r"""(?is)<link\s[^>]*?href\s*=\s*["']?([^"'\s<>]+)""",
        ),
    )
    return (
        pages.select(
            F.col(url_col).alias("url"), F.explode_outer(items).alias("_it")
        )
        .where(F.col("_it.item_link").isNotNull())
        .select(
            "url",
            F.col("_it.item_title").alias("item_title"),
            F.col("_it.item_link").alias("item_link"),
            F.col("_it.kind").alias("kind"),
        )
    )


def extract_hreflang(
    pages: DataFrame,
    url_col: str = "url",
    html_col: str = "html",
    max_scan_bytes: int = 1 << 18,
) -> DataFrame:
    """``<link rel="alternate" hreflang=… href=…>`` extraction — the
    publisher-declared translation graph (which page is which language's
    version of which).  These declared pairs are the highest-precision
    seed for bitext mining: align the declared pairs first, spend the
    embedding-margin search (`bitext_margin_mine`) only on the rest.

    Attribute order is free in the wild, so the scan extracts whole
    ``<link …>`` tags first and pulls ``rel``/``hreflang``/``href`` out
    of each tag in a per-element lambda — pairing cannot cross tag
    boundaries by construction.  Emits one (url, hreflang, href) row per
    declared alternate; zero shuffle."""
    text = _permissive_text(html_col, max_scan_bytes)
    per = F.transform(
        _html_tags(text, "link"),
        lambda b: F.struct(
            _tag_attr(b, "rel").alias("rel"),
            _tag_attr(b, "hreflang").alias("hreflang"),
            _tag_attr(b, "href").alias("href"),
        ),
    )
    return (
        pages.select(
            F.col(url_col).alias("url"), F.explode_outer(per).alias("_t")
        )
        .where(
            (F.lower(F.col("_t.rel")) == "alternate")
            & F.col("_t.hreflang").isNotNull()
            & F.col("_t.href").isNotNull()
        )
        .select(
            "url",
            F.lower(F.col("_t.hreflang")).alias("hreflang"),
            F.col("_t.href").alias("href"),
        )
    )


def extract_amp_pairs(
    pages: DataFrame,
    url_col: str = "url",
    html_col: str = "html",
    max_scan_bytes: int = 1 << 18,
) -> DataFrame:
    """AMP twin detection — both directions of the declared pairing:
    a canonical page pointing at its AMP twin via ``<link
    rel="amphtml" href=…>``, and an AMP page pointing back via ``<link
    rel="canonical" href=…>`` plus the ``<html amp>`` / ``<html ⚡>``
    attribute marker.  AMP twins are guaranteed near-duplicates with
    different URLs and different boilerplate — dropping the AMP side
    by declaration is free precision before any MinHash spend, the
    same reasoning as `canonical_dedup` (which handles the generic
    rel=canonical collapse; this operator adds the amphtml edge and
    the is_amp verdict).

    Tag-scoped extraction (whole <link> tags, attributes pulled
    per-element in a transform lambda — the extract_hreflang rule);
    the amp marker is a bounded scan of the first <html …> tag.  Zero
    shuffle."""
    text = _permissive_text(html_col, max_scan_bytes)
    per = F.transform(
        _html_tags(text, "link"),
        lambda b: F.struct(
            F.lower(_tag_attr(b, "rel")).alias("rel"),
            _tag_attr(b, "href").alias("href"),
        ),
    )
    html_tag = F.regexp_extract(text, r"(?is)<html(\s[^>]*)?>", 1)
    is_amp = html_tag.rlike(r"(?i)(^|\s)(amp|⚡)(\s|=|$)")
    links = pages.select(
        F.col(url_col).alias("url"),
        is_amp.alias("is_amp"),
        F.explode_outer(per).alias("_t"),
    )
    amp_edge = links.where(F.col("_t.rel") == "amphtml").select(
        "url",
        "is_amp",
        F.col("_t.href").alias("twin_url"),
        F.lit("amphtml").alias("edge"),
    )
    canon_edge = links.where(
        F.col("is_amp") & (F.col("_t.rel") == "canonical")
    ).select(
        "url",
        "is_amp",
        F.col("_t.href").alias("twin_url"),
        F.lit("canonical").alias("edge"),
    )
    return amp_edge.unionAll(canon_edge)


def extract_declared_lang(
    pages: DataFrame,
    url_col: str = "url",
    html_col: str = "html",
    max_scan_bytes: int = 1 << 16,
) -> DataFrame:
    """Publisher-declared language: the ``<html lang=…>`` attribute,
    the ``<meta http-equiv=content-language>`` header equivalent, and
    ``<meta property="og:locale">`` — normalized to a lowercase
    BCP-47-ish primary subtag (``pt-BR`` → ``pt``, ``en_US`` → ``en``).
    The declared tag is the cheap prior a language-ID cascade checks
    first (agreement → skip the n-gram model; disagreement → the
    lang_script_mismatch audit); precedence html lang > http-equiv >
    og:locale, first non-null wins.  Tag-scoped extraction throughout
    (whole <html>/<meta> tags, attributes pulled per-tag) so attribute
    order is free — ``<meta content="fr" http-equiv=…>`` works; the
    quoted-value puller keeps the list form ("fr, en") intact.  Zero
    shuffle."""
    text = _permissive_text(html_col, max_scan_bytes)
    html_tag = F.get(
        F.regexp_extract_all(
            text, F.lit(r"(?is)<html(?:\s[^>]*)?>"), F.lit(0)
        ),
        F.lit(0),
    )
    html_lang = _tag_attr_quoted(html_tag, "lang")
    metas = _html_tags(text, "meta")

    def meta_content(key_attr: str, key_val: str) -> Column:
        matched = F.filter(
            metas,
            lambda b: F.lower(
                F.coalesce(_tag_attr_quoted(b, key_attr), F.lit(""))
            )
            == key_val,
        )
        return _tag_attr_quoted(F.get(matched, F.lit(0)), "content")

    http_equiv = meta_content("http-equiv", "content-language")
    og_locale = meta_content("property", "og:locale")
    raw = F.trim(F.coalesce(html_lang, http_equiv, og_locale))
    raw = F.nullif(raw, F.lit(""))
    primary = F.lower(F.regexp_extract(raw, r"^([A-Za-z]+)", 1))
    return pages.select(
        F.col(url_col).alias("url"),
        F.lower(raw).alias("declared_lang_raw"),
        F.when(primary != "", primary).alias("declared_lang"),
        F.when(html_lang.isNotNull(), "html_lang")
        .when(http_equiv.isNotNull(), "http_equiv")
        .when(og_locale.isNotNull(), "og_locale")
        .alias("declared_source"),
    )


def label_propagation(
    edges: DataFrame,
    iters: int = 8,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Synchronous label-propagation communities over an undirected
    graph: every node starts as its own label; each round every node
    adopts the most frequent label among its neighbors AND ITSELF (the
    self-vote damps the oscillation synchronous LPA exhibits on
    bipartite structure — rings otherwise converge to parity classes,
    not clusters), ties broken by SMALLEST label, so the update is a
    total order and the result deterministic — asynchronous LPA is
    famously not.  Complements
    :func:`pdf_to_epub_spark.operators.dedup.connected_components`:
    min-label CC merges anything connected, LPA keeps weakly-bridged
    clusters apart.

    Scale shape: per round one join of the slim label table to the edge
    list (both keyed on node — co-partitioned under bucketing) and one
    (node, label) count + per-node argmax; lineage is cut per round with
    a lazy localCheckpoint (the iterative-operator pattern, see
    dedup.connected_components).  Fixed ``iters`` keeps it replayable —
    LPA oscillates on bipartite structures, so a convergence loop would
    not be deterministic; pick iters ~ graph diameter."""
    from pyspark.sql.window import Window as _W

    e = edges.select(F.col(src_col).alias("s"), F.col(dst_col).alias("d"))
    sym = e.unionByName(
        e.select(F.col("d").alias("s"), F.col("s").alias("d"))
    ).distinct()
    nodes = sym.select(F.col("s").alias("node")).distinct()
    # EXACTLY one self-vote edge per node (see docstring): input
    # self-loops are dropped first or a looped node would vote for its
    # own label twice and could wrongly resist its community
    sym = sym.filter(F.col("s") != F.col("d")).unionByName(
        nodes.select(F.col("node").alias("s"), F.col("node").alias("d"))
    )
    labels = nodes.withColumn("label", F.col("node"))
    for _ in range(iters):
        nb = sym.join(
            labels.select(
                F.col("node").alias("d"), F.col("label").alias("nl")
            ),
            "d",
        )
        counts = nb.groupBy(F.col("s").alias("node"), "nl").agg(
            F.count(F.lit(1)).alias("c")
        )
        best = (
            counts.withColumn(
                "r",
                F.row_number().over(
                    _W.partitionBy("node").orderBy(
                        F.desc("c"), F.asc("nl")
                    )
                ),
            )
            .filter(F.col("r") == 1)
            .select("node", F.col("nl").alias("label"))
        )
        labels = (
            nodes.join(best, "node", "left")
            .select(
                "node",
                F.coalesce(F.col("label"), F.col("node")).alias("label"),
            )
            .localCheckpoint(eager=False)
        )
    return labels


def crawl_cadence(
    df: DataFrame,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    min_fetches: int = 2,
) -> DataFrame:
    """Per-registrable-domain fetch-cadence profile: inter-arrival gaps
    between consecutive captures of the same domain, then
    order-independent gap statistics.  The crawler-politeness /
    recrawl-scheduling counterpart of :func:`crawl_schedule` — where that
    op plans future fetches, this one measures the observed cadence.

    Shape: one slim ``(domain, epoch)`` projection → ``lag`` window per
    domain (streams + spills; a hot domain serializes its own sort only)
    → one combiner-enabled groupBy.  Variance is computed from integer
    gap sums in a fixed parse shape (``n*sum2 - sum*sum`` over doubles),
    so Spark and the SQL oracle agree bit-for-bit after 6-dp rounding;
    the median uses Spark's exact ``percentile`` (== DuckDB
    ``quantile_cont`` interpolation).

    Returns ``(domain, n_fetches, mean_gap_s, median_gap_s, var_gap_s)``
    for domains with at least ``min_fetches`` captures.
    """
    from pyspark.sql.window import Window as _W

    w = _W.partitionBy("domain").orderBy("epoch", url_col)
    slim = df.select(
        registrable_domain(F.col(url_col)).alias("domain"),
        F.col(url_col).alias(url_col),
        F.unix_timestamp(F.col(ts_col)).alias("epoch"),
    )
    gaps = slim.select(
        "domain",
        (F.col("epoch") - F.lag("epoch").over(w)).alias("gap"),
    )
    agg = gaps.groupBy("domain").agg(
        (F.count(F.lit(1))).alias("n_fetches"),
        F.count("gap").alias("n_gaps"),
        F.sum("gap").alias("sum_gap"),
        F.sum(F.col("gap") * F.col("gap")).alias("sum_gap2"),
        F.expr("percentile(gap, 0.5)").alias("median_raw"),
    )
    n = F.col("n_gaps").cast("double")
    s1 = F.col("sum_gap").cast("double")
    s2 = F.col("sum_gap2").cast("double")
    return (
        agg.filter(F.col("n_fetches") >= min_fetches)
        .select(
            "domain",
            F.col("n_fetches").cast("long").alias("n_fetches"),
            F.round(s1 / n, 6).alias("mean_gap_s"),
            F.round(F.col("median_raw"), 6).alias("median_gap_s"),
            F.when(
                F.col("n_gaps") > 1,
                F.round((n * s2 - s1 * s1) / (n * (n - F.lit(1.0))), 6),
            ).alias("var_gap_s"),
        )
    )


def cocitation_pairs(
    outlinks: DataFrame,
    url_col: str = "url",
    target_col: str = "target",
    min_count: int = 2,
    max_domains: int = 64,
) -> DataFrame:
    """Domain co-citation mining: unordered pairs of registrable domains
    linked from the SAME page, counted across pages — the co-citation
    graph used for mirror detection, topical clustering, and link-spam
    rings.

    Spark-first shape: NO self-join.  One groupBy url builds the sorted
    distinct-domain set per page (capped at ``max_domains`` — a page
    linking hundreds of domains is a link farm and would otherwise fan
    out O(k²)), a higher-order ``transform``/``flatten`` emits the
    C(k,2) combinations JVM-side, and a second combiner-enabled groupBy
    counts pairs.  The explode is ``explode_outer`` + null-filter so the
    optimizer cannot re-inline the combination lambda below the
    generator (InferFiltersFromGenerate).

    Returns ``(domain_a, domain_b, n_pages)`` with ``domain_a <
    domain_b`` and ``n_pages >= min_count``.
    """
    per_page = (
        outlinks.select(
            F.col(url_col).alias("url"),
            registrable_domain(F.col(target_col)).alias("dom"),
        )
        .groupBy("url")
        .agg(
            F.slice(
                F.sort_array(F.collect_set("dom")), 1, max_domains
            ).alias("doms")
        )
    )
    pairs_arr = per_page.select(
        F.expr(
            "flatten(transform(doms, (x, i) -> "
            "transform(slice(doms, i + 2, size(doms)), "
            "y -> struct(x AS domain_a, y AS domain_b))))"
        ).alias("pairs")
    )
    exploded = pairs_arr.select(
        F.explode_outer("pairs").alias("p")
    ).where(F.col("p").isNotNull())
    return (
        exploded.select("p.domain_a", "p.domain_b")
        .groupBy("domain_a", "domain_b")
        .agg(F.count(F.lit(1)).alias("n_pages"))
        .filter(F.col("n_pages") >= min_count)
    )


def outlink_quality(
    outlinks: DataFrame,
    domain_scores: DataFrame,
    url_col: str = "url",
    target_col: str = "target",
) -> DataFrame:
    """Neighborhood-quality signal: for each page, aggregate the quality
    scores of the registrable domains it links OUT to — pages whose
    outlinks point overwhelmingly at low-quality domains are link spam
    even when their own text looks clean (the classic spam-mass idea,
    page-local and join-cheap).

    ``domain_scores`` is a slim ``(domain, score)`` table (e.g. from
    :func:`domain_quality_rank`); it is broadcast, so the page/outlink
    table never shuffles on the join.  One combiner-enabled groupBy on
    the page url follows.

    Returns ``(url, n_outlinks, n_scored, mean_score, min_score)`` —
    ``n_outlinks`` counts distinct target domains, ``n_scored`` those
    with a score; mean/min are over scored domains only (NULL when
    none), mean at 6 dp in a fixed sum/count shape.
    """
    doms = (
        outlinks.select(
            F.col(url_col).alias("url"),
            registrable_domain(F.col(target_col)).alias("dom"),
        )
        # unparseable targets (relative hrefs, javascript:) yield an
        # empty/NULL domain — they are not outlink DOMAINS, drop them
        .where(F.col("dom").isNotNull() & (F.col("dom") != ""))
        .distinct()
    )
    scored = doms.join(
        F.broadcast(
            domain_scores.select(
                F.col("domain").alias("dom"), F.col("score").alias("__s")
            )
        ),
        "dom",
        "left",
    )
    agg = scored.groupBy("url").agg(
        F.count(F.lit(1)).alias("n_outlinks"),
        F.count("__s").alias("n_scored"),
        F.sum("__s").alias("_sum"),
        F.min("__s").alias("_min"),
    )
    return agg.select(
        "url",
        F.col("n_outlinks").cast("long").alias("n_outlinks"),
        F.col("n_scored").cast("long").alias("n_scored"),
        F.when(
            F.col("n_scored") > 0,
            F.round(
                F.col("_sum").cast("double")
                / F.col("n_scored").cast("double"),
                6,
            ),
        ).alias("mean_score"),
        F.col("_min").alias("min_score"),
    )


def redirect_chains(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    max_hops: int = 16,
) -> DataFrame:
    """Resolve redirect chains to their terminal target by pointer
    doubling: ``log2(max_hops)`` self-joins instead of ``max_hops``
    sequential walks — the scale-correct shape for following 301/302 /
    rel=canonical chains across a 10^12-row capture table (a linear walk
    is max_hops shuffles; doubling is 4 for 16 hops).

    The edge set is made functional first (``min(dst)`` per src,
    deterministic); each round joins the slim ``(node, jump, hops)``
    state with itself and checkpoints, so after round r the state holds
    ``f^(2^r)`` capped at the terminal.  Nodes still moving after
    ``max_hops`` hops (cycles, or chains longer than the cap) come back
    ``resolved = false`` with ``final = f^max_hops(src)`` — exactly what
    a step-by-step walk capped at ``max_hops`` produces, which is how
    the SQL oracle replays it.

    Returns one row per distinct source: ``(src, final, hops,
    resolved)``.
    """
    rounds = (max_hops - 1).bit_length()
    if max_hops < 1 or max_hops != 1 << rounds:
        raise ValueError("max_hops must be a power of two")
    e = (
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .groupBy("src")
        .agg(F.min("dst").alias("dst"))
    )
    nodes = e.select(F.col("src").alias("node")).union(
        e.select(F.col("dst").alias("node"))
    ).distinct()
    state = nodes.join(
        e.select(F.col("src").alias("node"), F.col("dst").alias("__d")),
        "node",
        "left",
    ).select(
        "node",
        F.coalesce(F.col("__d"), F.col("node")).alias("jump"),
        F.when(F.col("__d").isNotNull(), F.lit(1))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("hops"),
    )
    for _ in range(rounds):
        nxt = state.select(
            F.col("node").alias("__n2"),
            F.col("jump").alias("__j2"),
            F.col("hops").alias("__h2"),
        )
        state = (
            state.join(nxt, state["jump"] == nxt["__n2"])
            .select(
                "node",
                F.col("__j2").alias("jump"),
                (F.col("hops") + F.col("__h2")).alias("hops"),
            )
            .localCheckpoint(eager=False)
        )
    has_out = e.select(F.col("src").alias("__t"), F.lit(True).alias("__has"))
    return (
        e.select("src")
        .join(state, F.col("src") == F.col("node"))
        .join(has_out, state["jump"] == has_out["__t"], "left")
        .select(
            "src",
            F.col("jump").alias("final"),
            F.col("hops").cast("int").alias("hops"),
            F.coalesce(~F.col("__has"), F.lit(True)).alias("resolved"),
        )
    )


def domain_triangles(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Global triangle census of an undirected domain graph — triangle
    count, wedge count and global clustering coefficient, the standard
    link-ring / community-density health check on a webgraph.

    Scale shape: the classic degree-ordered node-iterator.  Edges are
    canonicalized and deduplicated, each edge is ORIENTED from the
    endpoint that is smaller in the ``(degree, node)`` total order to
    the larger — the orientation makes the graph a DAG where every
    vertex's out-degree is O(sqrt(m)) — then one self-join on the lower
    endpoint builds the wedges and a semi-join against the oriented
    edge set closes them.  Counting via a naive edge³ join would be
    O(m³); this is the O(m^1.5) form that survives power-law degree
    distributions.  Wedges come from exact integer ``C(deg, 2)`` sums.

    Returns one row: ``(n_nodes, n_edges, n_wedges, n_triangles,
    global_clustering)`` (= 3T/W, 6 dp, NULL when W = 0).
    """
    canon = edges.select(
        F.least(F.col(src_col), F.col(dst_col)).alias("a"),
        F.greatest(F.col(src_col), F.col(dst_col)).alias("b"),
    ).filter(F.col("a") != F.col("b")).distinct()
    deg = (
        canon.select(F.col("a").alias("node"))
        .union(canon.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    da = deg.select(F.col("node").alias("a"), F.col("deg").alias("dega"))
    db = deg.select(F.col("node").alias("b"), F.col("deg").alias("degb"))
    ed = canon.join(da, "a").join(db, "b")
    lo_first = (F.col("dega") < F.col("degb")) | (
        (F.col("dega") == F.col("degb")) & (F.col("a") < F.col("b"))
    )
    oriented = ed.select(
        F.when(lo_first, F.col("a")).otherwise(F.col("b")).alias("u"),
        F.when(lo_first, F.col("b")).otherwise(F.col("a")).alias("v"),
        F.when(lo_first, F.col("degb")).otherwise(F.col("dega")).alias("dv"),
    )
    w1 = oriented.select("u", F.col("v").alias("x"), F.col("dv").alias("dx"))
    w2 = oriented.select("u", F.col("v").alias("y"), F.col("dv").alias("dy"))
    wedge_lt = (F.col("dx") < F.col("dy")) | (
        (F.col("dx") == F.col("dy")) & (F.col("x") < F.col("y"))
    )
    wedges_df = w1.join(w2, "u").filter(wedge_lt).select(
        F.col("x").alias("u"), F.col("y").alias("v")
    )
    tri = wedges_df.join(
        oriented.select("u", "v"), ["u", "v"], "left_semi"
    ).agg(F.count(F.lit(1)).alias("n_triangles"))
    stats = deg.agg(
        F.count(F.lit(1)).alias("n_nodes"),
        F.sum(
            # decimal BEFORE the multiply (deg*(deg-1) wraps int64 past
            # deg ~ 3e9); even product, so /2 stays exact
            F.col("deg").cast("decimal(38,0)") * (F.col("deg") - 1) / 2
        ).cast("long").alias("n_wedges"),
    )
    nedges = canon.agg(F.count(F.lit(1)).alias("n_edges"))
    out = stats.crossJoin(nedges).crossJoin(tri)
    return out.select(
        F.col("n_nodes").cast("long").alias("n_nodes"),
        F.col("n_edges").cast("long").alias("n_edges"),
        F.col("n_wedges").cast("long").alias("n_wedges"),
        F.col("n_triangles").cast("long").alias("n_triangles"),
        F.when(
            F.col("n_wedges") > 0,
            F.round(
                F.lit(3.0) * F.col("n_triangles").cast("double")
                / F.col("n_wedges").cast("double"),
                6,
            ),
        ).alias("global_clustering"),
    )


def markup_signals(
    pages: DataFrame,
    html_col: str = "html",
    url_col: str = "url",
    max_scan_bytes: int = 1 << 20,
) -> DataFrame:
    """Interactivity / spam markup profile: counts of script, iframe,
    form and anchor opening tags plus overall tag density — SEO spam
    and ad-shell pages are script- and iframe-heavy with little text
    between tags, and this is the cheap page-level signal that catches
    them before any text extraction runs.

    Pure ``regexp_count`` column algebra over the permissive bounded
    page prefix (binary→string cast, no charset decode) — codegen
    end-to-end, no arrays, no UDF, no shuffle.

    Returns ``(url, n_script, n_iframe, n_form, n_links, tag_density)``
    where ``tag_density`` is ``<`` tag openers per 100 chars (6 dp,
    NULL for empty pages).
    """
    text = _permissive_text(html_col, max_scan_bytes)
    staged = pages.select(
        F.col(url_col).alias("url"),
        text.alias("__t"),
    )

    def n_tag(tag: str) -> Column:
        return F.regexp_count(
            F.col("__t"), F.lit(rf"(?is)<{tag}[\s>]")
        ).cast("int")

    length = F.length("__t")
    n_lt = F.regexp_count(F.col("__t"), F.lit(r"<[a-zA-Z]"))
    return staged.select(
        "url",
        n_tag("script").alias("n_script"),
        n_tag("iframe").alias("n_iframe"),
        n_tag("form").alias("n_form"),
        n_tag("a").alias("n_links"),
        F.when(
            length > 0,
            F.round(n_lt.cast("double") * 100.0 / length.cast("double"), 6),
        ).alias("tag_density"),
    )


def meta_redirects(
    pages: DataFrame,
    html_col: str = "html",
    url_col: str = "url",
    max_scan_bytes: int = 1 << 16,
) -> DataFrame:
    """Extract ``<meta http-equiv="refresh" content="N; url=…">``
    client-side redirects — the redirect class HTTP headers never show,
    and the other input (besides 301 chains) that
    :func:`redirect_chains` wants as edges.

    Tag-scoped two-pass extraction (the page_meta pattern): pull whole
    ``<meta …>`` tags first, keep the ones whose ``http-equiv`` token
    is ``refresh`` (attribute order and quote style free), then parse
    the delay and target out of the ``content`` value with anchored
    RE2-portable regexes.  First refresh tag per page wins (browsers
    honor the first).

    Returns one row per page that declares a refresh:
    ``(url, delay_s, target)`` — ``target`` NULL for pure-reload
    refreshes (no ``url=`` part).
    """
    text = _permissive_text(html_col, max_scan_bytes)
    staged = pages.select(
        F.col(url_col).alias("url"), _html_tags(text, "meta").alias("__m")
    )
    refresh = F.filter(
        F.col("__m"),
        lambda t: F.lower(_tag_attr(t, "http-equiv")) == "refresh",
    )
    first = F.get(refresh, 0)
    content = _tag_attr_quoted(first, "content")
    delay = F.regexp_extract(content, r"^\s*(\d+)", 1)
    target = F.nullif(
        F.regexp_extract(content, r"(?i)[;,]\s*url\s*=\s*['\"]?([^'\"\s]+)", 1),
        F.lit(""),
    )
    return (
        staged.select("url", content.alias("__c"), delay.alias("__d"),
                      target.alias("target"))
        .where(F.col("__c").isNotNull() & (F.col("__d") != ""))
        .select(
            "url",
            F.col("__d").cast("int").alias("delay_s"),
            "target",
        )
    )


def rel_pagination(
    pages: DataFrame,
    html_col: str = "html",
    url_col: str = "url",
    max_scan_bytes: int = 1 << 16,
) -> DataFrame:
    """Extract ``<link rel="next/prev" href="…">`` pagination hints —
    the signal that a page is one slice of a multi-page article, which
    a training-data pipeline needs to stitch (or at least to dedup
    against its siblings).

    Same tag-scoped shape as :func:`meta_redirects`: whole ``<link …>``
    tags, ``rel`` matched as a case-insensitive token (``rel="next"``
    and ``rel="prev nofollow"`` both count), href token-form, first
    occurrence per direction wins.

    Returns ``(url, next_url, prev_url, is_paginated)`` — one row per
    page, NULLs when a direction is absent.
    """
    text = _permissive_text(html_col, max_scan_bytes)
    staged = pages.select(
        F.col(url_col).alias("url"), _html_tags(text, "link").alias("__l")
    )

    def first_href(rel: str) -> Column:
        tags = F.filter(
            F.col("__l"),
            lambda t: F.concat(
                F.lit(" "), F.lower(_tag_attr_quoted(t, "rel")), F.lit(" ")
            ).contains(f" {rel} "),
        )
        return _tag_attr(F.get(tags, 0), "href")

    nxt = first_href("next")
    prv = first_href("prev")
    return staged.select(
        "url",
        nxt.alias("next_url"),
        prv.alias("prev_url"),
    ).withColumn(
        "is_paginated",
        F.col("next_url").isNotNull() | F.col("prev_url").isNotNull(),
    )


def og_cards(
    pages: DataFrame,
    html_col: str = "html",
    url_col: str = "url",
    max_scan_bytes: int = 1 << 16,
) -> DataFrame:
    """OpenGraph / Twitter-card extraction: ``og:title``, ``og:type``,
    ``og:image`` (``<meta property=…>``) and ``twitter:card``
    (``<meta name=…>``) — the structured social metadata layer most
    modern pages carry; pipelines use it for title recovery, media
    association, and page-type priors.

    Tag-scoped HOF extraction: one ``<meta …>`` tag array per page,
    one ``filter`` + first-element pull per key — attribute order and
    quote style free, first declaration wins, no shuffle, no UDF.

    Returns ``(url, og_title, og_type, og_image, twitter_card)`` with
    NULLs for absent keys.
    """
    text = _permissive_text(html_col, max_scan_bytes)
    staged = pages.select(
        F.col(url_col).alias("url"), _html_tags(text, "meta").alias("__m")
    )

    def first_content(attr: str, key: str) -> Column:
        tags = F.filter(
            F.col("__m"),
            lambda t: F.lower(_tag_attr_quoted(t, attr)) == key,
        )
        return _tag_attr_quoted(F.get(tags, 0), "content")

    return staged.select(
        "url",
        first_content("property", "og:title").alias("og_title"),
        first_content("property", "og:type").alias("og_type"),
        first_content("property", "og:image").alias("og_image"),
        first_content("name", "twitter:card").alias("twitter_card"),
    )


def k_core(
    edges: DataFrame,
    k: int = 3,
    src_col: str = "src",
    dst_col: str = "dst",
    max_iter: int = 50,
) -> DataFrame:
    """k-core decomposition of an undirected graph: iteratively peel
    every node with degree < k until the remainder is stable — the
    densest-substructure filter used to find link farms / PBN rings
    (spam cores survive peeling; organic periphery does not).

    Iterative Spark shape (the connected-components pattern): each
    round is one degree aggregation over the live edge set + two
    broadcast-able anti-joins dropping edges that touch a peeled node,
    with an eager-free ``localCheckpoint`` pinning each round's plan
    and an ``isEmpty`` probe for convergence.  Peeling cascades (a
    node can fall under k only after its neighbor peels), so rounds
    repeat until no node drops.  If the cascade is still moving after
    ``max_iter`` rounds (a long induced path peels only its endpoints
    each round) the result would NOT be the k-core, so the operator
    raises instead of silently returning periphery — raise
    ``max_iter`` for pathologically chain-shaped graphs.

    Returns the surviving nodes with their within-core degree:
    ``(node, deg)``.
    """
    live = (
        edges.select(
            F.least(F.col(src_col), F.col(dst_col)).alias("a"),
            F.greatest(F.col(src_col), F.col(dst_col)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=False)
    )

    def _deg(e: DataFrame) -> DataFrame:
        return (
            e.select(F.col("a").alias("node"))
            .union(e.select(F.col("b").alias("node")))
            .groupBy("node")
            .agg(F.count(F.lit(1)).alias("deg"))
        )

    converged = False
    for _ in range(max_iter):
        deg = _deg(live)
        bad = deg.filter(F.col("deg") < k).select("node")
        if bad.isEmpty():
            converged = True
            break
        live = (
            live.join(bad, live["a"] == bad["node"], "left_anti")
            .join(bad, F.col("b") == bad["node"], "left_anti")
            .localCheckpoint(eager=False)
        )
    if not converged:
        raise RuntimeError(
            f"k_core did not converge within max_iter={max_iter} rounds; "
            "raise max_iter (long induced paths peel two nodes per round)"
        )
    return _deg(live).select("node", F.col("deg").cast("long").alias("deg"))


def template_fingerprints(
    pages: DataFrame,
    html_col: str = "html",
    url_col: str = "url",
    max_scan_bytes: int = 1 << 16,
) -> DataFrame:
    """Template fingerprinting by CSS-class profile: the md5 of a page's
    sorted distinct ``class="…"`` tokens — pages generated by the same
    template share the fingerprint even when their text differs
    completely, so grouping by it finds template families for
    boilerplate modeling and mass-produced-page (doorway) detection.

    One regex scan pulls the double-quoted class attribute values, HOF
    algebra splits / flattens / dedups / sorts the token set, and the
    fingerprint is a plain md5 over the joined tokens — all JVM-side,
    no shuffle.  (Single-quoted and bare class attributes are rare in
    templated output; the double-quote scan is the documented scope.)

    Returns ``(url, n_class_tokens, fingerprint)`` — fingerprint NULL
    when the page declares no class tokens.
    """
    text = _permissive_text(html_col, max_scan_bytes)
    classes = F.regexp_extract_all(text, F.lit(r'(?is)\sclass="([^"]*)"'), F.lit(1))
    staged = pages.select(
        F.col(url_col).alias("url"), classes.alias("__c")
    )
    # class tokens separate on ANY whitespace (prettified templates wrap
    # class lists across lines) — a literal-space split would fracture
    # the same template into different fingerprints
    toks = F.sort_array(
        F.array_distinct(
            F.expr(
                "filter(flatten(transform(__c, c -> split(c, '\\\\s+'))),"
                " x -> x != '')"
            )
        )
    )
    staged2 = staged.select("url", toks.alias("__t"))
    n = F.size("__t")
    return staged2.select(
        "url",
        n.cast("int").alias("n_class_tokens"),
        F.when(
            n > 0, F.md5(F.concat_ws("|", F.col("__t")).cast("binary"))
        ).alias("fingerprint"),
    )


_VOID_TAGS = (
    "area base br col embed hr img input link meta param source track wbr"
).split()


def dom_depth(
    pages: DataFrame,
    html_col: str = "html",
    url_col: str = "url",
    max_scan_bytes: int = 1 << 16,
) -> DataFrame:
    """Approximate DOM nesting profile: maximum tag-nesting depth and
    total element count from a single tag scan — deep nesting is a
    template/spam complexity signal (layout-table spam nests 30+ deep;
    article pages sit around 8-12), and it prices the page for any
    downstream DOM-walking extractor.

    One regex pulls the tag stream; a sequential ``aggregate`` fold
    (struct accumulator: current depth, max depth) replays the
    browser's open/close balance — void elements (``br``, ``img``, …)
    and self-closed ``…/>`` tags don't nest, stray closers clamp at
    zero.  Per-row fold over a bounded array: no shuffle, no UDF.

    Returns ``(url, n_tags, max_depth)``.
    """
    text = _permissive_text(html_col, max_scan_bytes)
    tags = F.regexp_extract_all(
        text, F.lit(r"(?is)</?[a-z][a-z0-9]*[^>]*>"), F.lit(0)
    )
    void_arr = ", ".join(f"'{t}'" for t in _VOID_TAGS)
    staged = pages.select(
        F.col(url_col).alias("url"), tags.alias("__tg")
    )
    fold = F.expr(
        "aggregate(__tg, struct(0 AS d, 0 AS m), (acc, t) -> "
        "CASE "
        # closing tag: pop (clamped at 0)
        " WHEN t LIKE '</%' THEN struct(greatest(acc.d - 1, 0) AS d, acc.m AS m) "
        # self-closing or void: depth unchanged
        f" WHEN t LIKE '%/>' OR regexp_extract(lower(t), '^<([a-z][a-z0-9]*)', 1) IN ({void_arr}) "
        "   THEN struct(acc.d AS d, acc.m AS m) "
        # opening tag: push
        " ELSE struct(acc.d + 1 AS d, greatest(acc.m, acc.d + 1) AS m) END)"
    )
    return staged.select(
        "url",
        F.size("__tg").cast("int").alias("n_tags"),
        fold.getField("m").cast("int").alias("max_depth"),
    )


def url_lifespan(
    observations: DataFrame,
    url_col: str = "url",
    snap_col: str = "snap_epoch",
) -> DataFrame:
    """URL lifespan table across crawl snapshots: first/last sighting,
    sighting count, and whether the url is still alive in the NEWEST
    snapshot — the provenance row recrawl scheduling, link-rot stats,
    and deletion-compliance audits all start from.

    One combiner-enabled groupBy on the url plus a single-row global
    max broadcast back — no window, no sort.

    Returns ``(url, first_seen, last_seen, n_snapshots, is_active)``.
    """
    per = observations.groupBy(F.col(url_col).alias("url")).agg(
        F.min(F.col(snap_col)).cast("long").alias("first_seen"),
        F.max(F.col(snap_col)).cast("long").alias("last_seen"),
        F.count_distinct(F.col(snap_col)).cast("long").alias("n_snapshots"),
    )
    # the global max comes from the already-aggregated per-url table —
    # no second scan of the (10^9-row) observations input
    latest = per.agg(F.max("last_seen").alias("__latest"))
    return per.crossJoin(F.broadcast(latest)).select(
        "url", "first_seen", "last_seen", "n_snapshots",
        (F.col("last_seen") == F.col("__latest")).alias("is_active"),
    )


def domain_churn(
    old_pages: DataFrame,
    new_pages: DataFrame,
    url_col: str = "url",
) -> DataFrame:
    """Domain-level churn between two crawl snapshots: which registrable
    domains appeared, vanished, or persisted, with their page counts on
    each side — the health report that catches a collapsed seed list or
    a hijacked vertical before url-level diffs (recrawl_diff) would be
    readable.

    One count aggregation per side on the slim domain projection, then
    a full outer join of the two (domain-cardinality) count tables.

    Returns ``(domain, n_old, n_new, status)`` with status ∈
    new/lost/retained.
    """
    def side(df: DataFrame, alias: str) -> DataFrame:
        return (
            df.select(registrable_domain(F.col(url_col)).alias("domain"))
            .groupBy("domain")
            .agg(F.count(F.lit(1)).alias(alias))
        )

    o = side(old_pages, "n_old")
    n = side(new_pages, "n_new")
    j = o.join(n, "domain", "full_outer")
    status = (
        F.when(F.col("n_old").isNull(), F.lit("new"))
        .when(F.col("n_new").isNull(), F.lit("lost"))
        .otherwise(F.lit("retained"))
    )
    return j.select(
        "domain",
        F.coalesce(F.col("n_old"), F.lit(0)).cast("long").alias("n_old"),
        F.coalesce(F.col("n_new"), F.lit(0)).cast("long").alias("n_new"),
        status.alias("status"),
    )


def bfs_distances(
    edges: DataFrame,
    seeds: list[str],
    max_hops: int = 12,
    src_col: str = "src_domain",
    dst_col: str = "dst_domain",
) -> DataFrame:
    """Multi-source BFS hop distance from a seed set over the directed
    domain graph — "how many link hops from a vetted domain is this
    one?", the distance feature TrustRank smooths into a score but
    analysts also want raw (spam neighborhoods sit at hop ≥ 3;
    unreachable domains are the strongest signal of all and are simply
    absent from the output).

    Frontier expansion, not pointer doubling: redirect_chains doubles
    pointers because a functional graph has one out-edge per node; a
    general webgraph fans out, so the classic BFS loop is the right
    shape — each round joins only the CURRENT frontier (which only
    shrinks once the wave passes) onto the edge table, anti-joins the
    visited set, and stops as soon as a round adds nothing.  All joins
    are keyed on the domain, so a bucketed edge table reuses its layout
    every round; the visited table is eagerly localCheckpointed per
    round (iterative-lineage hygiene, same as connected_components).
    ``max_hops`` bounds the rounds so a pathological diameter cannot
    run away (and makes the recursive-CTE oracle finite).

    Seeds are a driver-side literal list (vetted sets are small by
    definition).  Seeds not present in the graph still appear at hop 0.

    Returns ``(domain, hops)`` for every node within ``max_hops`` of a
    seed.
    """
    if not seeds:
        raise ValueError("bfs_distances requires a non-empty seed set")
    # not _domain_graph: that helper eagerly materializes the node set,
    # which BFS never reads — dedup just the edge table
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).distinct().localCheckpoint(eager=False)
    spark = edges.sparkSession
    visited = spark.createDataFrame(
        [(s, 0) for s in sorted(set(seeds))], "domain string, hops int"
    ).localCheckpoint(eager=True)
    frontier = visited
    for hop in range(1, max_hops + 1):
        nxt = (
            frontier.join(e, frontier.domain == e.src)
            .select(F.col("dst").alias("domain"))
            .distinct()
            .join(visited, "domain", "left_anti")
            .select("domain", F.lit(hop).alias("hops"))
            .localCheckpoint(eager=True)
        )
        if nxt.isEmpty():
            break
        visited = visited.union(nxt).localCheckpoint(eager=True)
        frontier = nxt
    return visited.select("domain", F.col("hops").cast("int").alias("hops"))


def tracking_params(
    pages: DataFrame,
    url_col: str = "url",
    min_urls: int = 5,
    card_threshold: float = 0.5,
) -> DataFrame:
    """Query-parameter cardinality audit: which URL params look like
    per-visit tracking tokens (``sid``, ``utm_*`` ids — near-distinct
    values per occurrence) vs content-bearing params (``page`` — few
    values)?  This drives url_canonical's strip-list the data-driven
    way instead of a hand-curated blocklist: a param whose value is
    distinct on (almost) every URL cannot identify content, so
    stripping it merges duplicate pages.

    One explode of the split param array (explode_outer + null filter —
    the InferFiltersFromGenerate hygiene every lambda/split explode in
    this repo keeps) and one groupBy per param key.  count_distinct is
    exact here for the oracle; at 100 TB swap approx_count_distinct —
    the verdict only needs "high vs low cardinality".

    Returns ``(param, n_urls, n_distinct_values, distinct_ratio,
    is_tracking)`` — valueless params (``?dbg&x=1``) count with NULL
    values (NULL value rows count toward n_urls, not distinct values).
    """
    query = F.get(F.split(F.split(F.col(url_col), "#", 2).getItem(0), r"\?", 2), 1)
    d = pages.select(F.explode_outer(F.split(query, "&")).alias("p")).where(
        F.col("p").isNotNull() & (F.col("p") != "")
    )
    eq = F.instr(F.col("p"), "=")
    d = d.select(
        F.when(eq > 0, F.expr("substring(p, 1, instr(p, '=') - 1)"))
        .otherwise(F.col("p"))
        .alias("param"),
        F.when(eq > 0, F.expr("substring(p, instr(p, '=') + 1)")).alias("v"),
    )
    agg = d.groupBy("param").agg(
        F.count(F.lit(1)).cast("long").alias("n_urls"),
        F.count_distinct(F.col("v")).cast("long").alias("n_distinct_values"),
    )
    ratio = F.round(
        F.col("n_distinct_values").cast("double") / F.col("n_urls").cast("double"),
        6,
    ) + F.lit(0.0)
    return agg.select(
        "param", "n_urls", "n_distinct_values",
        ratio.alias("distinct_ratio"),
        (
            (F.col("n_urls") >= min_urls)
            & (F.col("n_distinct_values").cast("double")
               >= F.lit(card_threshold) * F.col("n_urls").cast("double"))
        ).alias("is_tracking"),
    )


def graph_modularity(
    edges: DataFrame,
    communities: DataFrame,
    src_col: str = "src_domain",
    dst_col: str = "dst_domain",
    node_col: str = "domain",
    comm_col: str = "community",
) -> DataFrame:
    """Newman modularity of a community assignment over the (undirected
    view of the) domain webgraph: Q = Σ_c [L_c/m − (D_c/2m)²] — the
    standard "is this partition better than chance" score used to
    decide whether label_propagation/connected_components output is
    worth acting on (Q ≈ 0 means the communities are noise).

    The directed edge table collapses to distinct undirected pairs
    (least/greatest endpoints, self-loops dropped); every aggregate
    (per-community internal edges L_c and degree mass D_c, plus the
    global m) is an exact integer, so the one double formula at the end
    replays in the SQL oracle.  Two keyed joins of the slim edge table
    onto the community map + one groupBy — nothing global but the
    2-scalar broadcast.

    Returns one row per community: ``(community, n_nodes,
    internal_edges, total_degree, q_contrib)`` with the overall
    ``modularity`` repeated on each row.
    """
    und = (
        edges.select(
            F.least(F.col(src_col), F.col(dst_col)).alias("a"),
            F.greatest(F.col(src_col), F.col(dst_col)).alias("b"),
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    comm = communities.select(
        F.col(node_col).alias("_n"), F.col(comm_col).alias("_c")
    )
    deg = (
        und.select(F.col("a").alias("_n"))
        .union(und.select(F.col("b").alias("_n")))
        .groupBy("_n")
        .agg(F.count(F.lit(1)).alias("_deg"))
    )
    per_node = comm.join(deg, "_n", "left").groupBy("_c").agg(
        F.count(F.lit(1)).cast("long").alias("n_nodes"),
        F.sum(F.coalesce("_deg", F.lit(0))).cast("long").alias("total_degree"),
    )
    ca = comm.select(F.col("_n").alias("a"), F.col("_c").alias("_ca"))
    cb = comm.select(F.col("_n").alias("b"), F.col("_c").alias("_cb"))
    internal = (
        und.join(ca, "a").join(cb, "b")
        .where(F.col("_ca") == F.col("_cb"))
        .groupBy(F.col("_ca").alias("_c"))
        .agg(F.count(F.lit(1)).cast("long").alias("internal_edges"))
    )
    m = und.agg(F.count(F.lit(1)).alias("_m"))
    per = (
        per_node.join(internal, "_c", "left")
        .select(
            F.col("_c").alias("community"), "n_nodes",
            F.coalesce("internal_edges", F.lit(0)).cast("long")
            .alias("internal_edges"),
            "total_degree",
        )
        .crossJoin(F.broadcast(m))
    )
    mm = F.col("_m").cast("double")
    dd = F.col("total_degree").cast("double")
    # per-community contribution in exact micro-units (half-away to a
    # long) so the cross-community fold is order-independent — summing
    # rounded DOUBLES would drift at community counts in the millions
    qm = F.when(
        F.col("_m") > 0,
        F.round(
            (
                F.col("internal_edges").cast("double") / mm
                - (dd / (F.lit(2.0) * mm)) * (dd / (F.lit(2.0) * mm))
            )
            * F.lit(1e6),
            0,
        ).cast("long"),
    ).otherwise(F.lit(0).cast("long"))
    per = per.select(
        "community", "n_nodes", "internal_edges", "total_degree",
        qm.alias("_qm"),
    ).localCheckpoint(eager=False)
    tot = per.agg(
        (
            F.round(F.sum("_qm").cast("double") / F.lit(1e6), 6) + F.lit(0.0)
        ).alias("modularity")
    )
    return per.crossJoin(F.broadcast(tot)).select(
        "community", "n_nodes", "internal_edges", "total_degree",
        (
            F.round(F.col("_qm").cast("double") / F.lit(1e6), 6) + F.lit(0.0)
        ).alias("q_contrib"),
        "modularity",
    )


def extract_lists(
    pages: DataFrame,
    id_col: str = "doc_id",
    html_col: str = "html",
    max_scan_bytes: int = 1 << 20,
) -> DataFrame:
    """HTML list mining: one output row per ``<li>`` item —
    ``(id, list_id, ordered, item_id, n_items, item_text)`` — the
    third leg of the structured-markup family (extract_headings,
    extract_tables): lists carry steps/enumerations/navigation, and the
    ordered/unordered bit plus item counts feed both boilerplate
    detection (nav lists are short + link-dense) and fact mining.

    Two nested posexplodes over regexp_extract_all — per-row column
    algebra, no shuffle, a page's lists never leave their partition.
    Regex-level by design (same contract as extract_tables): a nested
    inner list terminates the outer non-greedy match early, degrading
    to the inner list; items must be ``</li>``-closed (omitted closers
    are skipped, documented).
    """
    body = _permissive_text(html_col, max_scan_bytes)
    d = pages.select(F.col(id_col), body.alias("__b"))
    lists = d.select(
        id_col,
        F.posexplode(
            F.regexp_extract_all(
                F.col("__b"),
                F.lit(r"(?is)<[ou]l[^>]*>.*?</[ou]l\s*>"),
                F.lit(0),
            )
        ).alias("list_id", "__l"),
    )
    items = lists.select(
        id_col,
        F.col("list_id").cast("int").alias("list_id"),
        F.lower(F.substring("__l", 2, 2)).startswith("ol").alias("ordered"),
        F.regexp_extract_all(
            F.col("__l"), F.lit(r"(?is)<li[^>]*>.*?</li\s*>"), F.lit(0)
        ).alias("__items"),
    )
    ex = items.select(
        id_col, "list_id", "ordered",
        F.size("__items").alias("n_items"),
        F.posexplode_outer("__items").alias("item_id", "__it"),
    ).where(F.col("__it").isNotNull())
    return ex.select(
        id_col, "list_id", "ordered",
        F.col("item_id").cast("int").alias("item_id"),
        F.col("n_items").cast("int").alias("n_items"),
        F.trim(_strip_tags(F.col("__it"))).alias("item_text"),
    )


def change_rate(
    obs: DataFrame,
    url_col: str = "url",
    snap_col: str = "snap_id",
    hash_col: str = "content_md5",
) -> DataFrame:
    """Per-URL content change-rate estimate (Cho & Garcia-Molina 2003's
    recrawl-scheduling input): over a url's snapshot history, the
    fraction of observation intervals whose content hash changed —
    λ̂ = changes / intervals, the Poisson-rate MLE the crawl scheduler
    turns into a revisit period.

    One window per url (lag over the snapshot order — keyed partitions,
    bounded by a url's version count, same contract as recrawl_diff),
    one groupBy.  Duplicate (url, snap) rows must be resolved upstream;
    rates are exact integer ratios rounded to 6 dp.

    Returns ``(url, n_obs, n_changes, change_rate)`` — rate NULL for
    single-observation urls (no interval to estimate from).
    """
    from pyspark.sql.window import Window

    w = Window.partitionBy("url").orderBy("_s")
    d = obs.select(
        F.col(url_col).alias("url"), F.col(snap_col).alias("_s"),
        F.col(hash_col).alias("_h"),
    ).withColumn("_prev", F.lag("_h").over(w))
    per = d.groupBy("url").agg(
        F.count(F.lit(1)).cast("long").alias("n_obs"),
        F.sum(
            (
                F.col("_prev").isNotNull()
                & (F.col("_prev") != F.col("_h"))
            ).cast("long")
        ).cast("long").alias("n_changes"),
    )
    rate = F.when(
        F.col("n_obs") > 1,
        F.round(
            F.col("n_changes").cast("double")
            / (F.col("n_obs") - 1).cast("double"),
            6,
        ) + F.lit(0.0),
    )
    return per.select("url", "n_obs", "n_changes", rate.alias("change_rate"))


def degree_assortativity(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Newman degree assortativity of the undirected domain graph — the
    Pearson correlation between the degrees at the two ends of every
    edge.  Webgraphs are famously DISassortative (hubs link to leaves,
    r < 0); a near-zero or positive r over a crawl slice is a
    link-farm / mirror-ring tell, the structural complement to
    ``link_reciprocity``.

    Every moment the correlation needs is an exact integer sum —
    edges are canonicalized + deduplicated, degrees joined onto both
    endpoints (two node-table equi-joins, no window), and each
    undirected edge contributes both orientations by symmetry:
    ``M = 2E``, ``Sx = Σ(da+db)``, ``Sxy = 2Σ(da·db)``,
    ``Sxx = Σ(da²+db²)``.  Sums ride decimal(38,0) (an int64 Σdeg²
    wraps past ~3e9-degree hubs); the ONLY float op is the final
    ``r = (M·Sxy − Sx²) / (M·Sxx − Sx²)``, rounded to 6 dp — so the
    result is bit-stable across partitionings and engines.

    Returns one row: ``(n_nodes, n_edges, assortativity)`` —
    NULL r when the degree variance is 0 (regular graphs: rings,
    cliques) or there are no edges.
    """
    canon = (
        edges.select(
            F.least(F.col(src_col), F.col(dst_col)).alias("a"),
            F.greatest(F.col(src_col), F.col(dst_col)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=False)  # feeds degree agg AND the joins
    )
    deg = (
        canon.select(F.col("a").alias("node"))
        .union(canon.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    ed = canon.join(
        deg.select(F.col("node").alias("a"), F.col("deg").alias("da")), "a"
    ).join(
        deg.select(F.col("node").alias("b"), F.col("deg").alias("db")), "b"
    )
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    moments = ed.agg(
        F.count(F.lit(1)).cast("long").alias("n_edges"),
        F.sum(dec("da") + dec("db")).alias("sx"),
        F.sum(F.lit(2) * dec("da") * dec("db")).alias("sxy"),
        F.sum(dec("da") * dec("da") + dec("db") * dec("db")).alias("sxx"),
    )
    nn = deg.agg(F.count(F.lit(1)).cast("long").alias("n_nodes"))
    m = F.lit(2) * F.col("n_edges").cast("decimal(38,0)")
    num = (m * F.col("sxy") - F.col("sx") * F.col("sx")).cast("double")
    den = (m * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    return nn.crossJoin(moments).select(
        "n_nodes",
        "n_edges",
        F.when(den > 0, F.round(num / den, 6)).alias("assortativity"),
    )


def heading_body_pairs(
    pages: DataFrame,
    id_col: str = "doc_id",
    html_col: str = "html",
    max_scan_bytes: int = 1 << 20,
) -> DataFrame:
    """Section-structured (heading → body) training pairs from page
    markup: every ``<h1>``–``<h6>`` opens a section, the ``<p>``
    paragraphs up to the next heading are its body — the supervised
    pair shape (title→summary, question→answer) instruction-data
    pipelines mine from crawls.

    One combined regexp pass keeps headings and paragraphs in a single
    document-order stream (two separate extractions could not be
    re-interleaved without byte offsets); a per-document window
    cumsums the heading flags into section ids, and each section's
    body reassembles order-exactly via ``array_sort(collect_list(
    struct(pos, txt)))`` — no cross-document work anywhere, so the
    operator scales with pages like the other markup miners.
    Paragraphs before the first heading belong to no section and are
    dropped; headings with no paragraphs are kept with ``n_paras = 0``
    and NULL body (the consumer's filter choice).

    Returns ``(id, section_id, level, heading, n_paras, body)``.
    """
    body = _permissive_text(html_col, max_scan_bytes)
    d = pages.select(F.col(id_col), body.alias("__b"))
    exploded = d.select(
        id_col,
        F.posexplode(
            F.regexp_extract_all(
                F.col("__b"),
                F.lit(r"(?is)<h[1-6][^>]*>.*?</h[1-6]\s*>|<p[^>]*>.*?</p\s*>"),
                F.lit(0),
            )
        ).alias("pos", "__m"),
    )
    w = Window.partitionBy(id_col).orderBy("pos")
    tagged = exploded.select(
        id_col,
        "pos",
        F.col("__m").rlike("(?is)^<h[1-6]").alias("_is_h"),
        F.regexp_extract("__m", r"(?i)^<h([1-6])", 1).alias("_lvl"),
        _strip_tags(F.col("__m")).alias("_txt"),
    ).select(
        id_col,
        "pos",
        "_is_h",
        "_lvl",
        "_txt",
        F.sum(F.col("_is_h").cast("int")).over(w).alias("_sec"),
    )
    heads = tagged.where("_is_h").select(
        id_col,
        F.col("_sec").cast("int").alias("section_id"),
        F.col("_lvl").cast("int").alias("level"),
        F.col("_txt").alias("heading"),
    )
    paras = tagged.where(~F.col("_is_h") & (F.col("_sec") > 0)).select(
        id_col, "_sec", "pos", "_txt"
    )
    bodies = paras.groupBy(id_col, "_sec").agg(
        F.count(F.lit(1)).cast("long").alias("n_paras"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "_txt"))),
                lambda x: x["_txt"],
            ),
            " ",
        ).alias("body"),
    ).select(
        F.col(id_col), F.col("_sec").cast("int").alias("section_id"),
        "n_paras", "body",
    )
    return heads.join(bodies, [id_col, "section_id"], "left").select(
        id_col,
        "section_id",
        "level",
        "heading",
        F.coalesce("n_paras", F.lit(0)).cast("long").alias("n_paras"),
        "body",
    )


def site_sections(
    urls: DataFrame,
    url_col: str = "url",
    top_per_domain: int = 10,
) -> DataFrame:
    """Site-structure mining from URL paths: pages per first path
    segment per domain, with the fan-out into second-level segments —
    the "what sections does this site have and how big are they"
    report a crawl planner reads before allocating budget (a /tag/ or
    /search/ section exploding in page count is crawler-trap evidence;
    complements ``url_templates``' digit-generalizing view).

    Pure column algebra to ``(domain, section)`` keys, one map-side-
    combined count plus one distinct-ish subsection agg, and a
    per-domain window top cut ordered by (pages, section) — bounded
    output regardless of corpus size.

    Returns ``(domain, section, n_pages, n_subsections)``, at most
    ``top_per_domain`` rows per domain; pathless URLs count under
    ``(root)``.
    """
    # schemes are case-insensitive (RFC 3986) — [A-Za-z] like the
    # extractors at the top of this module, not lowercase-only
    domain = F.regexp_extract(
        F.col(url_col), r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)", 1
    )
    path = F.regexp_extract(
        F.col(url_col), r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1
    )
    segs = F.filter(F.split(path, "/"), lambda x: x != "")
    d = urls.select(
        domain.alias("domain"),
        F.when(F.size(segs) >= 1, F.get(segs, 0))
        .otherwise(F.lit("(root)"))
        .alias("section"),
        F.when(F.size(segs) >= 2, F.get(segs, 1)).alias("_sub"),
    ).where(F.col("domain") != "")
    agg = d.groupBy("domain", "section").agg(
        F.count(F.lit(1)).cast("long").alias("n_pages"),
        F.count_distinct("_sub").cast("long").alias("n_subsections"),
    )
    w = Window.partitionBy("domain").orderBy(
        F.desc("n_pages"), F.asc("section")
    )
    return (
        agg.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= top_per_domain)
        .drop("_rn")
    )


def surt_key(url_col: Column) -> Column:
    """SURT (Sort-friendly URI Reordering Transform) key — the canonical
    key of every web-archive index (Internet Archive / Common Crawl CDX):
    host labels reversed and comma-joined so one domain's captures sort
    contiguously, e.g.

        HTTP://www.News.Example.com:8080/A/b?z=2&a=1#frag
            → com,example,news:8080)/a/b?a=1&z=2

    Rules (the deterministic, SQL-replayable subset of the IA
    canonicalizer): lowercase everything, drop the fragment and the
    scheme, strip one leading ``www`` / ``www<digits>`` host label,
    reverse the remaining labels with ',' separators, keep a non-default
    ``:port`` after the reversed host, ')' then the path ('/' when
    empty), then the query with its ``k=v`` params sorted and empty
    params dropped.  Every step is a portable regex / array op (Java
    and RE2 agree on all patterns used), so the DuckDB oracle replays
    the transform byte-for-byte.  Pure column algebra — whole-stage
    codegen, no UDF; at 100 TB this is a free map stage feeding the
    CDX-style sort/bucket layout."""
    no_frag = F.regexp_replace(F.lower(url_col), r"#.*$", "")
    no_scheme = F.regexp_replace(no_frag, r"^[a-z][a-z0-9+.\-]*://", "")
    head = F.regexp_extract(no_scheme, r"^([^/?]*)", 1)
    rest = F.substring(no_scheme, F.length(head) + 1, F.lit(2_147_483_647))
    port = F.regexp_extract(head, r":(\d+)$", 1)
    host = F.regexp_replace(head, r":\d+$", "")
    host = F.regexp_replace(host, r"^www\d*\.", "")
    rev = F.concat_ws(",", F.reverse(F.split(host, r"\.")))
    path = F.regexp_extract(rest, r"^([^?]*)", 1)
    query = F.regexp_extract(rest, r"^[^?]*\?(.*)$", 1)
    qs = F.concat_ws(
        "&", F.sort_array(F.filter(F.split(query, "&"), lambda p: p != ""))
    )
    return F.concat(
        rev,
        F.when(port != "", F.concat(F.lit(":"), port)).otherwise(F.lit("")),
        F.lit(")"),
        F.when(path == "", F.lit("/")).otherwise(path),
        F.when(qs != "", F.concat(F.lit("?"), qs)).otherwise(F.lit("")),
    )


def surt_keys(
    df: DataFrame, url_col: str = "url", out_col: str = "surt"
) -> DataFrame:
    """Attach the SURT key column (see `surt_key`) — the step before
    writing a CDX-ordered index or range-partitioning captures by
    archive key."""
    return df.withColumn(out_col, surt_key(F.col(url_col)))


def cdx_prefix_counts(
    df: DataFrame, url_col: str = "url", depth: int = 2
) -> DataFrame:
    """Capture counts per SURT *prefix* — the "how much of this site /
    host family does the crawl hold" query a CDX index answers with a
    range scan.  ``depth`` keeps the first N reversed host labels
    (depth=2 ≈ registrable domain in SURT space, depth=3 adds the
    subdomain), so ``com,example`` aggregates every host under
    example.com contiguously — the property the SURT ordering exists
    to provide.

    One map-side-combined groupBy on the slim (prefix) projection; the
    distinct-url count is keyed on the same prefix.  Output:
    ``(surt_prefix, n_captures, n_urls)``."""
    surt = surt_key(F.col(url_col))
    host_part = F.regexp_extract(surt, r"^([^)]*)\)", 1)
    host_only = F.regexp_replace(host_part, r":\d+$", "")
    prefix = F.concat_ws(
        ",", F.slice(F.split(host_only, ","), 1, depth)
    )
    slim = df.select(prefix.alias("surt_prefix"), surt.alias("_surt"))
    return slim.groupBy("surt_prefix").agg(
        F.count(F.lit(1)).cast("long").alias("n_captures"),
        F.count_distinct("_surt").cast("long").alias("n_urls"),
    )
