"""Driver query builders (part 6/7 of the mechanical __spark_entry__ split; verbatim)."""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from entry._shared import _ship_package, _t
from entry.queries_01 import mutated_recrawl
from entry.queries_05 import _rater_table


def _q_burrows_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Burrows' Delta stylometric distance (textstats.burrows_delta)
    between the corpus' language groups over the top-40 function words —
    nano-unit relative frequencies, exact-integer z numerators, one
    sqrt+division per word, micro-quantized pair terms."""
    from pdf_to_epub_spark.operators import burrows_delta

    d = _t(spark, sf_dir, "documents").select(
        F.col("lang").alias("group"), "text"
    )
    return burrows_delta(d, top_words=40, max_groups=5).select(
        "group_a", "group_b", "n_words", "delta"
    )


def _q_krippendorff_alpha(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Krippendorff's alpha, nominal (evaluate.krippendorff_alpha), over
    the 3-rater run with missing ratings — the agreement statistic that
    weighs each item by its own pairable-rating count; per-item
    disagreement nano-quantized with exact integral div, D_e exact
    integers end-to-end."""
    from pdf_to_epub_spark.operators import krippendorff_alpha

    return krippendorff_alpha(_rater_table(spark, sf_dir)).select(
        "n_items", "n_ratings", "d_o", "d_e", "alpha"
    )


def _q_rank_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank agreement (evaluate.rank_agreement) between the
    length scorer and a residue-perturbed variant — exact Σd² from
    tie-broken rank permutations."""
    from pdf_to_epub_spark.operators import rank_agreement

    d = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.col("n_chars").alias("score_a"),
        (F.col("n_chars") + (F.col("doc_id") % 13) * 7 - 42).alias("score_b"),
    )
    return rank_agreement(d).select("n", "sum_d2", "rho")


def _q_score_drift_ks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample KS drift (evaluate.score_drift_ks) between even-doc
    lengths and residue-shifted odd-doc lengths — right-continuous ECDF
    gap over the pooled distinct values."""
    from pdf_to_epub_spark.operators import score_drift_ks

    d = _t(spark, sf_dir, "documents").select("doc_id", "n_chars")
    i = F.col("doc_id")
    a = d.filter(i % 2 == 0).select(F.col("n_chars").alias("v"))
    b = d.filter(i % 2 == 1).select(
        (F.col("n_chars") + (i % 5) * 3).alias("v")
    )
    return score_drift_ks(a, b).select("n_a", "n_b", "d_stat", "at_value")


def _q_retrieval_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-query IR metrics (evaluate.retrieval_eval, k=10): a
    deterministic 5-query run (qid = doc_id%5, rank = doc_id//5 + 1)
    judged by the doc_id%3 relevance rule — P@k / R@k / MRR plus
    nano-quantized nDCG@k so the float sums replay exactly."""
    from pdf_to_epub_spark.operators import retrieval_eval

    d = _t(spark, sf_dir, "documents").select("doc_id")
    i = F.col("doc_id")
    run = d.select(
        (i % 5).alias("qid"), i.alias("doc_id"),
        (F.floor(i / 5) + 1).cast("long").alias("rank"),
    )
    qrels = d.filter(i % 3 == 0).select(
        (i % 5).alias("qid"), i.alias("doc_id")
    )
    return retrieval_eval(run, qrels, k=10).select(
        "qid", "n_rel", "hits_k", "p_at_k", "r_at_k", "rr", "ndcg_k"
    )


def _q_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order event-type transition matrix
    (analytics.event_transitions) over the events table — per-user lag
    pairs, conditional probabilities normalized over the aggregated
    pair table."""
    from pdf_to_epub_spark.operators import event_transitions

    e = _t(spark, sf_dir, "events")
    return event_transitions(e).select(
        "prev_type", "event_type", "n", "prob"
    )


def _q_template_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSS-class template fingerprints (urls.template_fingerprints) over
    three residue variants (two class-bearing templates — one with
    duplicate/multi-space/empty class values — and a classless page) —
    construction oracle with the md5 computed in SQL."""
    from pdf_to_epub_spark.operators import template_fingerprints

    d = _t(spark, sf_dir, "documents").select("doc_id")
    i = F.col("doc_id")
    body = (
        F.when(i % 3 == 0, F.lit(
            '<div class="nav main"><p class="body text">x</p></div>'))
        .when(i % 3 == 1, F.lit(
            '<div class="main  nav"><span class="">y</span>'
            '<b class="nav">z</b></div>'))
        .otherwise(F.lit("<div><p>plain</p></div>"))
    )
    html = F.encode(
        F.concat(F.lit("<html><body>"), body, F.lit("</body></html>")),
        "UTF-8",
    )
    pages = d.select(
        F.concat(F.lit("t://"), i.cast("string")).alias("url"),
        html.alias("html"),
    )
    return template_fingerprints(pages).select(
        "url", "n_class_tokens", "fingerprint"
    )


def _q_allocate_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Largest-remainder budget apportionment (sampling.allocate_budget,
    budget=1000) across (lang, residue) strata — Spark computes it with
    exact Python ints over the bounded strata collect; the oracle
    replays it as window SQL (independent algorithm, same answer)."""
    from pdf_to_epub_spark.operators import allocate_budget

    d = _t(spark, sf_dir, "documents")
    counts = d.groupBy(
        F.concat(
            F.col("lang"), F.lit(":"), (F.col("doc_id") % 3).cast("string")
        ).alias("stratum")
    ).agg(F.count(F.lit(1)).alias("n"))
    return allocate_budget(counts, budget=1000).select(
        "stratum", "n", "alloc"
    )


def _q_temporal_splits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-holdout split assignment (sampling.temporal_splits, 80/10/10
    by capture epoch) over deterministic warc_ts — exact-percentile
    boundaries rounded before comparison on both engines."""
    from pdf_to_epub_spark.operators import temporal_splits

    d = _t(spark, sf_dir, "documents").select("doc_id")
    i = F.col("doc_id")
    pages = d.select(
        i.alias("doc_id"),
        F.timestamp_seconds(
            F.lit(1735689600) + (i * 997) % 86400
        ).alias("warc_ts"),
    )
    return temporal_splits(pages).select("doc_id", "epoch", "split")


def _q_politeness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composition: observed per-domain cadence (urls.crawl_cadence) vs
    each domain's declared crawl-delay — a domain violates politeness
    when its MEAN inter-fetch gap is under the delay.  Both the cadence
    stats and the verdict replay in the oracle."""
    from pdf_to_epub_spark.operators import crawl_cadence

    d = _t(spark, sf_dir, "documents").select("doc_id")
    i = F.col("doc_id")
    pages = d.select(
        F.concat(
            F.lit("https://sub"), (i % 3).cast("string"),
            F.lit(".site"), (i % 7).cast("string"),
            F.lit(".example/p"), i.cast("string"),
        ).alias("url"),
        F.timestamp_seconds(
            F.lit(1735689600) + (i * 997) % 86400
        ).alias("warc_ts"),
    )
    delays = d.select(
        F.concat(
            F.lit("site"), (i % 7).cast("string"), F.lit(".example")
        ).alias("domain"),
        (((i % 7) % 4) * 1000 + 500).cast("long").alias("crawl_delay_s"),
    ).distinct()
    cad = crawl_cadence(pages)
    return cad.join(F.broadcast(delays), "domain").select(
        "domain", "n_fetches", "mean_gap_s", "crawl_delay_s",
        (
            F.col("mean_gap_s") < F.col("crawl_delay_s").cast("double")
        ).alias("violates"),
    )


def _q_compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction planner (bucketing.compaction_plan,
    16 KiB target) over residue-sized synthetic file listings —
    deterministic next-fit bins over the size-descending order,
    replayed with the identical window SQL."""
    from pdf_to_epub_spark.operators import compaction_plan

    d = _t(spark, sf_dir, "documents").select("doc_id")
    i = F.col("doc_id")
    files = d.select(
        F.concat(F.lit("f"), i.cast("string"), F.lit(".parquet")).alias("path"),
        ((i * 131) % 10000 + 100).cast("long").alias("bytes"),
    )
    return compaction_plan(files, target_bytes=16384).select(
        "path", "bytes", "bin"
    )


def _q_dom_depth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DOM nesting profile (urls.dom_depth) over four residue variants
    (3-deep nest, sibling paragraphs, flat text with a void <br>,
    unbalanced openers with a stray closer) — construction oracle."""
    from pdf_to_epub_spark.operators import dom_depth

    d = _t(spark, sf_dir, "documents").select("doc_id")
    i = F.col("doc_id")
    body = (
        F.when(i % 4 == 0, F.lit(
            '<div id="a"><p><span>x</span></p></div>'))
        .when(i % 4 == 1, F.lit("<div><p>a</p><p>b</p><br></div>"))
        .when(i % 4 == 2, F.lit("plain text<br>no elements<img src=x>"))
        .otherwise(F.lit("</b><div><div>unbalanced<hr/></div>"))
    )
    pages = d.select(
        F.concat(F.lit("d://"), i.cast("string")).alias("url"),
        F.encode(body, "UTF-8").alias("html"),
    )
    return dom_depth(pages).select("url", "n_tags", "max_depth")


def _q_url_lifespan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-snapshot lifespan table (urls.url_lifespan): urls observed
    in residue-derived snapshots — first/last sighting, distinct
    sighting count, alive-in-newest flag."""
    from pdf_to_epub_spark.operators import url_lifespan

    d = _t(spark, sf_dir, "documents").select("doc_id")
    i = F.col("doc_id")
    obs = d.select(
        F.concat(F.lit("u"), (i % 100).cast("string")).alias("url"),
        (F.lit(86400) * (i % 7)).cast("long").alias("snap_epoch"),
    )
    return url_lifespan(obs).select(
        "url", "first_seen", "last_seen", "n_snapshots", "is_active"
    )


def _q_latency_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type value bands (analytics.latency_bands): exact P50/P95 +
    mean over the events table — multi-percentile coverage."""
    from pdf_to_epub_spark.operators import latency_bands

    e = _t(spark, sf_dir, "events")
    return latency_bands(e).select("event_type", "n", "p50", "p95", "mean_value")


def _q_interleave_strata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-robin curriculum interleave (sampling.interleave_strata) of
    the language strata — per-stratum windows + broadcast stratum
    index, no random shuffle."""
    from pdf_to_epub_spark.operators import interleave_strata

    d = _t(spark, sf_dir, "documents").select(
        "doc_id", F.col("lang").alias("stratum")
    )
    return interleave_strata(d).select(
        "doc_id", "stratum", "stratum_rank", "train_order"
    )


def _q_punct_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typography fingerprint (textstats.punct_profile) over text with
    residue-injected smart vs ASCII punctuation — same-regex replay in
    DuckDB."""
    from pdf_to_epub_spark.operators import punct_profile

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    i = F.col("doc_id")
    txt = F.concat(
        F.substring("text", 1, 50),
        F.when(i % 3 == 0, F.lit(" “quoted” — and… more”"))
        .when(i % 3 == 1, F.lit(" \"ascii\" -- and... more"))
        .otherwise(F.lit(" bare words only")),
    )
    return punct_profile(d.select("doc_id", txt.alias("text"))).select(
        "doc_id", "n_smart", "n_ascii", "smart_ratio"
    )


def _q_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed JSON field extraction (analytics.extract_json_field) over
    the events props column with residue-injected corruption (truncated
    JSON) and a missing-key variant — corrupt vs missing stay
    distinguishable; construction oracle."""
    from pdf_to_epub_spark.operators import extract_json_field

    e = _t(spark, sf_dir, "events").select("event_id", "props")
    i = F.col("event_id")
    props = (
        F.when(i % 7 == 0, F.lit('{"k": bad'))
        .when(i % 7 == 1, F.lit('{"j": 5}'))
        .otherwise(F.col("props"))
    )
    return extract_json_field(e.select("event_id", props.alias("props"))).select(
        "event_id", "k", "is_valid"
    )


def _q_pseudonymize_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic PII pseudonymization (textstats.pseudonymize_pii):
    emails/IPs injected arithmetically into each doc (shared across
    docs mod 50/7 so cross-doc token stability is exercised, one
    duplicated in-doc), replaced by stable salted-md5 tokens via the
    longest-first literal-replace fold; oracle replays the fold with
    DuckDB list_reduce over the same struct-sorted match list."""
    from pdf_to_epub_spark.operators.textstats import pseudonymize_pii

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    i = F.col("doc_id")
    injected = F.concat(
        F.coalesce(F.col("text"), F.lit("")),
        F.lit(" contact u"), (i % 50).cast("string"),
        F.lit("@ex"), (i % 7).cast("string"),
        F.lit(".com or u"), (i % 50).cast("string"),
        F.lit("@ex"), (i % 7).cast("string"),
        F.lit(".com from 10.0."), (i % 200).cast("string"),
        F.lit("."), (i % 250).cast("string"),
    )
    return pseudonymize_pii(d.select("doc_id", injected.alias("text")))


def _q_variant_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark-4 VariantType open-schema extraction (analytics.
    variant_fields): deterministically constructed nested JSON (an
    injected-corrupt residue every 11th event) parsed ONCE into the
    Variant encoding, fields read with typed paths incl. nested object
    and array index, per-row schema_of_variant as the drift audit;
    the construction oracle replays every field arithmetically and the
    valid-row schema string is a construction-known literal."""
    from pdf_to_epub_spark.operators.analytics import variant_fields

    e = _t(spark, sf_dir, "events").select("event_id")
    i = F.col("event_id")
    js = F.concat(
        F.lit('{"k": '), (i % 100).cast("string"),
        F.lit(', "meta": {"lang": "l'), (i % 5).cast("string"),
        F.lit('", "score": '), (i % 7).cast("string"),
        F.lit('}, "tags": ["t'), (i % 3).cast("string"),
        F.lit('", "x"]}'),
    )
    props = F.when(i % 11 == 0, F.lit('{"k": bad')).otherwise(js)
    return variant_fields(
        e.select("event_id", props.alias("props")),
        "props",
        {
            "k": ("$.k", "bigint"),
            "lang": ("$.meta.lang", "string"),
            "score": ("$.meta.score", "bigint"),
            "tag1": ("$.tags[1]", "string"),
        },
        keep=("event_id",),
    )


def _q_count_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM change-point detection (analytics.count_cusum) on the daily
    event-count series — exact integer statistic, earliest-day
    tie-break, window replay in DuckDB."""
    from pdf_to_epub_spark.operators import count_cusum

    e = _t(spark, sf_dir, "events")
    return count_cusum(e).select(
        "n_days", "total_events", "peak_day", "peak_stat", "norm_stat"
    )


def _q_domain_churn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot domain churn (urls.domain_churn): old snapshot covers
    domains 0-6, new covers 2-8 — two lost, two new, five retained,
    full-outer count join."""
    from pdf_to_epub_spark.operators import domain_churn

    d = _t(spark, sf_dir, "documents").select("doc_id")
    i = F.col("doc_id")
    old = d.select(
        F.concat(F.lit("https://a.site"), (i % 7).cast("string"),
                 F.lit(".example/p"), i.cast("string")).alias("url")
    )
    new = d.select(
        F.concat(F.lit("https://b.site"), ((i % 7) + 2).cast("string"),
                 F.lit(".example/q"), i.cast("string")).alias("url")
    )
    return domain_churn(old, new).select(
        "domain", "n_old", "n_new", "status"
    )


def _q_threshold_for_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep-rate calibration (sampling.threshold_for_rate, keep 30%):
    exact-percentile cutoff with boundary rounding on both engines,
    achieved rate reported with cutoff ties kept."""
    from pdf_to_epub_spark.operators import threshold_for_rate

    d = _t(spark, sf_dir, "documents").select(
        F.col("n_chars").alias("score")
    )
    return threshold_for_rate(d, keep_frac=0.3).select(
        "cutoff", "n_total", "n_kept", "achieved_rate"
    )


def _q_hapax_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document hapax profile (textstats.hapax_stats) over the real
    corpus text — corpus df via a token-keyed count window (no
    join-back double-scan), gibberish detector."""
    from pdf_to_epub_spark.operators import hapax_stats

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return hapax_stats(d).select(
        "doc_id", "n_distinct_tokens", "n_hapax", "hapax_ratio"
    )


def _q_bfs_distances(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-source BFS hop distance (urls.bfs_distances) over a
    deterministic two-component domain graph (20-ring + chords, 10-ring)
    seeded at a0 — component B stays unreachable; recursive-CTE oracle
    with the same max-hops cap."""
    from pdf_to_epub_spark.operators import bfs_distances

    d = _t(spark, sf_dir, "documents").select("doc_id")
    i = F.col("doc_id")
    m = (i % 20).cast("string")
    edges = (
        d.select(
            F.concat(F.lit("a"), m).alias("src_domain"),
            F.concat(F.lit("a"), (((i % 20) + 1) % 20).cast("string")).alias("dst_domain"),
        )
        .union(
            d.select(
                F.concat(F.lit("a"), m),
                F.concat(F.lit("a"), ((3 * (i % 20) + 7) % 20).cast("string")),
            )
        )
        .union(
            d.select(
                F.concat(F.lit("b"), (i % 10).cast("string")),
                F.concat(F.lit("b"), (((i % 10) + 1) % 10).cast("string")),
            )
        )
    )
    return bfs_distances(edges, ["a0"]).select("domain", "hops")


def _q_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order layout audit (bucketing.zorder_layout): the same document
    rows laid out arrival-ordered vs Morton-ordered on
    (n_chars, doc_id·37 mod 256), min/max file skipping for a y-range
    predicate compared across the two layouts — exact integer
    normalization + bit interleave replayed in the oracle."""
    from pdf_to_epub_spark.operators import zorder_layout

    d = _t(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("id"),
        F.col("n_chars").alias("x"),
        ((F.col("doc_id") * 37) % 256).alias("y"),
    )
    return zorder_layout(
        d, "x", "y", pred_lo=64, pred_hi=127, file_rows=50
    ).select(
        "layout", "n_rows", "n_files", "files_scanned", "rows_scanned",
        "rows_matched", "prune_ratio",
    )


def _q_kmv_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV bottom-k sketch comparison (sketch.kmv_similarity, k=64) of
    two residue-derived url snapshots (×2 vs ×3 scaling — overlap at
    multiples of 6): distinct estimates + union-sample Jaccard, all
    integer until the two final divisions."""
    from pdf_to_epub_spark.operators import kmv_similarity

    d = _t(spark, sf_dir, "documents").select("doc_id")
    i = F.col("doc_id")
    old = d.select(F.concat(F.lit("u"), (i * 2).cast("string")).alias("url"))
    new = d.select(F.concat(F.lit("u"), (i * 3).cast("string")).alias("url"))
    return kmv_similarity(old, new, k=64).select(
        "k", "n_sketch_old", "n_sketch_new", "est_distinct_old",
        "est_distinct_new", "est_jaccard",
    )


def _q_calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability diagram + ECE (evaluate.calibration_bins, 10 bins)
    over a residue-synthesized correlated (score, label) pair —
    micro-unit integer confidence sums keep every bin mean and the ECE
    scalar order-independent and oracle-exact."""
    from pdf_to_epub_spark.operators import calibration_bins

    d = _t(spark, sf_dir, "documents").select("doc_id")
    i = F.col("doc_id")
    scored = d.select(
        (((i * 37) % 101).cast("double") / F.lit(100.0)).alias("score"),
        (((i * 53 + 11) % 100) < ((i * 37) % 101)).alias("label"),
    )
    return calibration_bins(scored).select(
        "bin", "n", "avg_conf", "frac_pos", "gap", "ece"
    )


def _q_session_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top user journeys (analytics.session_paths, k=5, top 20) over
    the events table — per-user time-ordered first-5 event-type path,
    most common paths; tie-free (ts, event_id) ordering both engines."""
    from pdf_to_epub_spark.operators import session_paths

    e = _t(spark, sf_dir, "events")
    return session_paths(e, k=5, top=20).select("path", "n_users")


def _q_tracking_params(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Query-param cardinality audit (urls.tracking_params) over
    residue-synthesized urls (constant utm_source, 20-value page,
    per-url sid, valueless dbg flag every 5th) — construction oracle
    checks the parse end-to-end."""
    from pdf_to_epub_spark.operators import tracking_params

    d = _t(spark, sf_dir, "documents").select("doc_id")
    i = F.col("doc_id")
    url = F.when(
        i % 7 == 0,
        F.concat(F.lit("https://s"), (i % 13).cast("string"),
                 F.lit(".example/p/"), i.cast("string")),
    ).otherwise(
        F.concat(
            F.lit("https://s"), (i % 13).cast("string"),
            F.lit(".example/p/"), i.cast("string"),
            F.lit("?utm_source=feed&page="), (i % 20).cast("string"),
            F.lit("&sid="), i.cast("string"),
            F.when(i % 5 == 0, F.lit("&dbg")).otherwise(F.lit("")),
        )
    )
    return tracking_params(d.select(url.alias("url"))).select(
        "param", "n_urls", "n_distinct_values", "distinct_ratio", "is_tracking"
    )


def _q_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson-bootstrap CI (sampling.bootstrap_ci, 32 replicates) on
    mean n_chars — md5-seeded inverse-CDF weights, integer replicate
    sums, exact-percentile interval; replays bit-for-bit in DuckDB."""
    from pdf_to_epub_spark.operators import bootstrap_ci

    d = _t(spark, sf_dir, "documents").select("doc_id", "n_chars")
    return bootstrap_ci(d, "n_chars", n_reps=32).select(
        "n_rows", "n_reps_effective", "mean", "ci_lo", "ci_hi"
    )


def _q_term_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Church-Gale burstiness + variance-to-mean ratio
    (textstats.term_burstiness, top 30 by total tf) over the real
    corpus text — zeros never materialize (Σtf/Σtf² integer algebra
    + a 1-row N broadcast)."""
    from pdf_to_epub_spark.operators import term_burstiness

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return term_burstiness(d, top=30).select(
        "term", "doc_freq", "total_tf", "burstiness", "vmr"
    )


def _q_pdf_outline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PDF /Outlines bookmark extraction (sources/pdf.py
    extract_pdf_outline via parse_pdf_outlines mapInArrow): documents
    rendered as real PDFs with a synthesized nested bookmark tree
    (root → Part p → Detail p on even parts), parsed back by walking
    First/Next/Dest — the PDF-native TOC the chapter assembly prefers
    over font-size heuristics.  The oracle reconstructs (seq, level,
    title, page) from the word-count page math alone."""
    from pdf_to_epub_spark.sources.pdf import (
        documents_as_outlined_pdfs,
        parse_pdf_outlines,
    )

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return parse_pdf_outlines(documents_as_outlined_pdfs(d)).select(
        "doc_id", "seq", "level", "title", "page"
    )


def _q_embedding_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Int8 quantization audit (similarity.embedding_quantize) over the
    embeddings table — nano-unit integer error accumulators make every
    per-vector statistic order-independent and DuckDB-replayable
    (list_transform with the index lambda mirrors zip_with)."""
    from pdf_to_epub_spark.operators import embedding_quantize

    e = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    return embedding_quantize(e).select(
        "vec_id", "n_dims", "scale_nano", "max_q", "mae_nano", "rel_err"
    )


def _q_pdf_chapters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chapter assembly from the PDF-native TOC (assemble.pdf_chapters):
    documents rendered with a stride-2 Part outline (chapters span page
    RANGES), blocks assigned by the equi+range join, per-chapter block
    and char rollup — the EPUB spine logic end-to-end, oracle-replayed
    from the word-count page math."""
    from pdf_to_epub_spark.operators import pdf_chapters
    from pdf_to_epub_spark.sources.pdf import (
        documents_as_outlined_pdfs,
        parse_pdf_outlines,
        parse_pdf_payloads,
    )

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    pdfs = documents_as_outlined_pdfs(d, part_stride=2).localCheckpoint(
        eager=False
    )
    return pdf_chapters(
        parse_pdf_outlines(pdfs), parse_pdf_payloads(pdfs)
    ).select(
        "doc_id", "chapter_seq", "title", "first_page", "last_page",
        "n_blocks", "n_chars",
    )


def _q_graph_modularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newman modularity (urls.graph_modularity) of a two-block domain
    graph (rings + in-block chords + sparse cross-block bridges) scored
    against the block assignment — exact integer L_c/D_c/m aggregates,
    micro-unit contribution fold."""
    from pdf_to_epub_spark.operators import graph_modularity

    d = _t(spark, sf_dir, "documents").select("doc_id")
    i = F.col("doc_id")
    m = i % 20
    edges = d.select(
        F.concat(F.lit("n"), m.cast("string")).alias("src_domain"),
        F.concat(
            F.lit("n"),
            (((m % 10) + 1) % 10 + (m - m % 10)).cast("string"),
        ).alias("dst_domain"),
    ).union(
        d.where(i % 4 == 0).select(
            F.concat(F.lit("n"), m.cast("string")),
            F.concat(F.lit("n"), ((m + 10) % 20).cast("string")),
        )
    )
    comms = (
        d.select((i % 20).alias("_m"))
        .distinct()
        .select(
            F.concat(F.lit("n"), F.col("_m").cast("string")).alias("domain"),
            (F.col("_m") >= 10).cast("int").alias("community"),
        )
    )
    return graph_modularity(edges, comms).select(
        "community", "n_nodes", "internal_edges", "total_degree",
        "q_contrib", "modularity",
    )


def _q_proportion_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample proportion z-test (evaluate.proportion_test) between
    residue-split halves with a built-in ~10pt rate gap — pooled
    variance z replayed term-for-term; the driver-side collect is the
    bounded 2-row group-count table."""
    from pdf_to_epub_spark.operators import proportion_test

    d = _t(spark, sf_dir, "documents").select("doc_id")
    i = F.col("doc_id")
    df = d.select(
        (i % 2).cast("string").alias("group"),
        (((i * 13) % 100) < (55 + 13 * (i % 2))).alias("success"),
    )
    return proportion_test(df).select(
        "group_a", "group_b", "n_a", "n_b", "rate_a", "rate_b", "z",
        "significant",
    )


def _q_snapshot_expiry(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot-expiry file reap (bucketing.snapshot_expiry, keep 2):
    residue-derived manifest where file f_k appears in snapshots
    {k%5, (k*3)%5} — files untouched by the two newest snapshots get
    action=delete; cutoff from the distinct-snapshot top-k."""
    from pdf_to_epub_spark.operators import snapshot_expiry

    d = _t(spark, sf_dir, "documents").select("doc_id")
    i = F.col("doc_id")
    manifest = (
        d.select(
            (i % 5).cast("long").alias("snapshot_id"),
            F.concat(F.lit("f"), (i % 40).cast("string")).alias("path"),
        )
        .union(
            d.select(
                ((i * 3) % 5).cast("long"),
                F.concat(F.lit("f"), (i % 40).cast("string")),
            )
        )
        .distinct()
    )
    return snapshot_expiry(manifest, keep_last=2).select(
        "path", "last_snapshot", "n_refs", "referenced_by_kept", "action"
    )


def _q_extract_lists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HTML list mining (urls.extract_lists) over four residue variants
    (ul+ol mix, uppercase OL, stray <li> outside any list, an unclosed
    <li> that degrades into its closed successor) — construction
    oracle."""
    from pdf_to_epub_spark.operators import extract_lists

    d = _t(spark, sf_dir, "documents").select("doc_id")
    i = F.col("doc_id")
    body = (
        F.when(i % 4 == 0, F.lit(
            '<ul><li>alpha</li><li><b>beta</b></li></ul>'
            '<ol start="3"><li>one</li></ol>'))
        .when(i % 4 == 1, F.lit("<OL><li>x</li><li>y</li><li>z</li></OL>"))
        .when(i % 4 == 2, F.lit("no lists here <li>stray</li>"))
        .otherwise(F.lit("<ul><li>unclosed item<li>closed</li></ul>"))
    )
    pages = d.select("doc_id", F.encode(body, "UTF-8").alias("html"))
    return extract_lists(pages).select(
        "doc_id", "list_id", "ordered", "item_id", "n_items", "item_text"
    )


def _q_change_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recrawl change-rate estimation (urls.change_rate): residue
    snapshot history where content revs every 2 snapshots — per-url
    lag window over versions, exact change/interval ratio."""
    from pdf_to_epub_spark.operators import change_rate

    d = _t(spark, sf_dir, "documents").select("doc_id")
    i = F.col("doc_id")
    obs = d.select(
        F.concat(F.lit("u"), (i % 50).cast("string")).alias("url"),
        (i % 6).cast("long").alias("snap_id"),
        F.md5(
            F.concat(
                F.lit("c"), (i % 50).cast("string"), F.lit(":"),
                F.floor((i % 6) / 2).cast("string"),
            )
        ).alias("content_md5"),
    ).distinct()
    return change_rate(obs).select(
        "url", "n_obs", "n_changes", "change_rate"
    )


def _q_skipgram_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window co-occurrence counts (ir.skipgram_pairs, window 3, top 40,
    min_count 2) over the real corpus text — per-document HOF pair
    generation (no token self-join); the oracle replays via positional
    generate_series."""
    from pdf_to_epub_spark.operators import skipgram_pairs

    d = _t(spark, sf_dir, "documents").select("text")
    return skipgram_pairs(d, window=3, top=40, min_count=2).select(
        "term_a", "term_b", "n_cooc"
    )


def _q_degree_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newman degree assortativity (urls.degree_assortativity) over a
    hub-and-chain graph: one hub linked to all 23 leaf domains (a star
    is maximally disassortative) plus a chain over the first 11 leaves
    adding degree variety — r lands strictly negative and well away
    from a tie boundary."""
    from pdf_to_epub_spark.operators import degree_assortativity

    d = _t(spark, sf_dir, "documents").select("doc_id")
    r = F.col("doc_id") % 23
    leaf = F.concat(F.lit("s"), r.cast("string"), F.lit(".example"))
    star = d.select(F.lit("hub.example").alias("src"), leaf.alias("dst"))
    chain = d.where(r < 10).select(
        leaf.alias("src"),
        F.concat(
            F.lit("s"), (r + 1).cast("string"), F.lit(".example")
        ).alias("dst"),
    )
    return degree_assortativity(star.unionAll(chain))


def _q_span_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grid-bucketed interval-overlap join (asof.span_overlap): two
    deterministic mask spans per document against a fixed 25-char
    sentence grid — the duplicate-span × sentence alignment shape.
    The equi-join rides (doc, cell) with the owner-cell trick, so the
    oracle's plain theta-join must agree row-for-row with zero
    duplicate pairs."""
    from pdf_to_epub_spark.operators import span_overlap

    d = _t(spark, sf_dir, "documents").select("doc_id")
    i = F.col("doc_id")
    left = d.select(
        "doc_id",
        F.explode(
            F.array(
                F.struct(
                    (i * 2).alias("a_id"),
                    ((i % 7) * 10).alias("a_start"),
                    ((i % 7) * 10 + 15 + i % 4).alias("a_end"),
                ),
                F.struct(
                    (i * 2 + 1).alias("a_id"),
                    (F.lit(100) + (i % 5) * 8).alias("a_start"),
                    (F.lit(112) + (i % 5) * 8).alias("a_end"),
                ),
            )
        ).alias("_s"),
    ).select("doc_id", "_s.a_id", "_s.a_start", "_s.a_end")
    right = d.select(
        "doc_id", F.explode(F.sequence(F.lit(0), F.lit(7))).alias("b_id")
    ).select(
        "doc_id",
        "b_id",
        (F.col("b_id") * 25).alias("b_start"),
        (F.col("b_id") * 25 + 25).alias("b_end"),
    )
    return span_overlap(left, right, cell=32).orderBy(
        "doc_id", "a_id", "b_id"
    )


def _q_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal-rank fusion (ir.rrf_fuse) of a lexical run (score =
    text length) and a pseudo-dense run (score = a Knuth-hash residue)
    over 5 query groups — integer nano-unit contributions keep the
    fused score exact, so the DuckDB replay matches bit-for-bit."""
    from pdf_to_epub_spark.operators import rrf_fuse

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    q = (F.col("doc_id") % 5).alias("query_id")
    lex = d.select(
        q,
        "doc_id",
        F.length("text").cast("double").alias("score"),
        F.lit("lex").alias("run_id"),
    )
    dense = d.select(
        q,
        "doc_id",
        ((F.col("doc_id") * 2654435761) % 1000).cast("double").alias("score"),
        F.lit("dense").alias("run_id"),
    )
    return rrf_fuse(lex.unionAll(dense), k=60, topn=10)


def _q_rake_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAKE keyphrase mining (textstats.rake_keywords) over the raw
    documents table — stopword-delimited candidate phrases, integer
    micro-unit deg/freq scoring, corpus top-40."""
    from pdf_to_epub_spark.operators import rake_keywords

    d = _t(spark, sf_dir, "documents").select("text")
    return rake_keywords(d, top=40, min_occurrences=2)


def _q_feature_mi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual-information feature ranking (evaluate.feature_mi): three
    signals against a doc_id-derived label — f_mod is the label's own
    generator (high MI), f_len is weakly informative, f_noise is a
    hash residue (near-zero MI) — so the ranking is a real contrast,
    not three ties."""
    from pdf_to_epub_spark.operators import feature_mi

    d = _t(spark, sf_dir, "documents").select(
        F.length("text").alias("f_len"),
        ((F.col("doc_id") * 37) % 100).alias("f_noise"),
        (F.col("doc_id") % 3).alias("f_mod"),
        (F.col("doc_id") % 3 == 0).cast("int").alias("label"),
    )
    return feature_mi(
        d, ["f_len", "f_noise", "f_mod"], label_col="label", bins=10
    )


def _q_pq_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization assignment (similarity.pq_quantize): the
    64-dim embeddings split into 8 subspaces against an arithmetic
    16-code codebook; integer nano-unit distances make the per-
    subspace argmin engine-exact."""
    from pdf_to_epub_spark.operators import pq_quantize

    e = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    base = spark.createDataFrame(
        [(s, c) for s in range(8) for c in range(16)],
        "subspace int, code int",
    )
    cent = base.select(
        "subspace",
        "code",
        F.transform(
            F.sequence(F.lit(0), F.lit(7)),
            lambda jj: (
                (
                    (F.col("subspace") * 131 + F.col("code") * 31 + jj * 17)
                    % 200
                    - 100
                ).cast("double")
                / 100.0
            ),
        ).alias("cvec"),
    )
    return pq_quantize(e, cent, m=8)


def _q_continuation_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-based pagination stitching (dedup.continuation_pairs):
    each eligible document gets a synthetic continuation page whose
    first 8 tokens repeat the parent's last 8, so every parent must
    pair with exactly its own continuation (md5 token hash for the
    SQL replay)."""
    from pdf_to_epub_spark.operators import continuation_pairs
    from pdf_to_epub_spark.operators.dedup import md5_hash60

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    toks = F.split(F.trim(F.lower("text")), r"\s+")
    elig = d.select("doc_id", "text", toks.alias("_t")).where(
        F.size("_t") >= 8
    )
    a = elig.select(
        (F.col("doc_id") * 2).alias("doc_id"), F.col("text")
    )
    b = elig.select(
        (F.col("doc_id") * 2 + 1).alias("doc_id"),
        F.concat(
            F.array_join(F.slice("_t", -8, 8), " "),
            F.lit(" continued section "),
            F.col("doc_id").cast("string"),
        ).alias("text"),
    )
    return continuation_pairs(
        a.unionAll(b), k=8, max_fanout=16, token_hash=md5_hash60
    )


_CAP_NAMES = (
    "Arlon", "Brixton", "Calder", "Dorset", "Elgin", "Farrow", "Galway",
)


def _q_capitalized_phrases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Capitalized-run mining (textstats.capitalized_phrases) over
    documents augmented with deterministic proper-noun runs — 'Saint
    <name>' must surface, 'The Old <name>' must be dropped by the
    stopword-first filter."""
    from pdf_to_epub_spark.operators import capitalized_phrases

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    names = F.array(*[F.lit(n) for n in _CAP_NAMES])
    w1 = F.element_at(names, (F.col("doc_id") % 7 + 1).cast("int"))
    w2 = F.element_at(names, ((F.col("doc_id") * 2) % 7 + 1).cast("int"))
    aug = d.select(
        F.concat(
            F.col("text"),
            F.lit(" Saint "), w1,
            F.lit(" went to the The Old "), w2,
            F.lit("."),
        ).alias("text")
    )
    return capitalized_phrases(aug, top=40, min_count=2)


def _q_otsu_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Otsu auto-threshold (sampling.otsu_threshold) over a bimodal
    synthetic quality score (a 20..30 junk mode and an 80..86 keep
    mode) — the maximizing cut must land between the modes."""
    from pdf_to_epub_spark.operators import otsu_threshold

    d = _t(spark, sf_dir, "documents").select(
        F.when(
            F.col("doc_id") % 3 == 0, 80 + F.col("doc_id") % 7
        ).otherwise(20 + F.col("doc_id") % 11).cast("double").alias("score")
    )
    return otsu_threshold(d, bins=32)


def _q_heading_body_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Section training pairs (urls.heading_body_pairs) over pages with
    a pre-heading orphan paragraph (dropped), a two-paragraph section,
    and a childless heading (kept, n_paras=0)."""
    from pdf_to_epub_spark.operators import heading_body_pairs

    d = _t(spark, sf_dir, "documents").select("doc_id")
    i = F.col("doc_id")
    html = F.encode(
        F.concat(
            F.lit("<html><body><p>orphan intro</p><h1>Title "),
            i.cast("string"),
            F.lit("</h1><p>alpha "),
            (i % 7).cast("string"),
            F.lit("</p><p>beta <b>bold</b></p>"),
            F.when(
                i % 3 == 0,
                F.concat(
                    F.lit("<h2>Methods</h2><p>gamma "),
                    (i % 5).cast("string"),
                    F.lit("</p>"),
                ),
            ).otherwise(F.lit("<h2>Empty Section</h2>")),
            F.lit("</body></html>"),
        ),
        "UTF-8",
    )
    return heading_body_pairs(
        d.select("doc_id", html.alias("html"))
    )


def _q_site_sections(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Site-structure report (urls.site_sections) over synthetic URLs:
    5 domains × {news, blog, shop} sections with varying second-level
    fanout, plus pathless root pages."""
    from pdf_to_epub_spark.operators import site_sections

    d = _t(spark, sf_dir, "documents").select("doc_id")
    i = F.col("doc_id")
    sec = (
        F.when(i % 4 == 0, F.lit("news"))
        .when(i % 4 == 1, F.lit("blog"))
        .when(i % 4 == 2, F.lit("shop"))
    )
    url = F.when(
        i % 4 == 3,
        F.concat(F.lit("https://s"), (i % 5).cast("string"), F.lit(".example")),
    ).otherwise(
        F.concat(
            F.lit("https://s"), (i % 5).cast("string"), F.lit(".example/"),
            sec, F.lit("/"),
            F.when(i % 4 == 0, F.concat(F.lit("y"), (i % 3).cast("string")))
            .otherwise(F.concat(F.lit("p"), (i % 9).cast("string"))),
            F.lit("?ref="), (i % 2).cast("string"),
        )
    )
    return site_sections(d.select(url.alias("url")), top_per_domain=3)


def _q_winsorize_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain winsorization (sampling.winsorize_scores) of a
    synthetic quality score with planted outliers (doc_id % 97 == 0
    rows get a 10x score) at p05/p95."""
    from pdf_to_epub_spark.operators import winsorize_scores

    d = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(F.lit("d"), (F.col("doc_id") % 7).cast("string")).alias(
            "domain"
        ),
        F.when(
            F.col("doc_id") % 97 == 0,
            (500 + F.col("doc_id") % 13).cast("double"),
        )
        .otherwise((50 + F.col("doc_id") % 23).cast("double"))
        .alias("score"),
    )
    return winsorize_scores(d, p_lo=0.05, p_hi=0.95)


def _q_oph_minhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-permutation-hashing MinHash (dedup.oph_minhash_pairs) over
    the same mutated re-crawl fixture as minhash_pairs — one hash per
    shingle instead of num_hashes, same banded LSH + exact-Jaccard
    verification, so the exact-Jaccard oracle is shared."""
    from pdf_to_epub_spark.operators import oph_minhash_pairs

    return oph_minhash_pairs(
        mutated_recrawl(spark, sf_dir),
        k=3, num_hashes=32, bands=8, jaccard_threshold=0.7,
    ).select("id_a", "id_b", F.round("jaccard", 4).alias("jaccard"))


def _q_prf_expansion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pseudo-relevance-feedback expansion (ir.prf_expand) for the
    bm25_topk query terms: top-15 expansion terms from the top-25
    feedback documents, integer micro-unit relevance weights."""
    from pdf_to_epub_spark.operators import prf_expand

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return prf_expand(
        d, ["merge", "spark", "window"], k_docs=25, top_terms=15
    )


def _q_lsh_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banding planner (sketch.lsh_plan) for a 64-hash signature at
    threshold 0.5 — pure S-curve arithmetic, micro-unit error mass."""
    from pdf_to_epub_spark.operators import lsh_plan

    return lsh_plan(spark, num_hashes=64, threshold=0.5, grid=99)


def _q_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marginal n-gram contribution (dedup.ngram_novelty) over the
    corpus plus an exact-copy recrawl of every 10th doc (ids shifted
    past the corpus) — copies must score novelty 0."""
    from pdf_to_epub_spark.operators import ngram_novelty

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    mx = 10_000_000
    copies = d.where(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + mx).alias("doc_id"), "text"
    )
    return ngram_novelty(d.unionAll(copies), k=5)


def _q_domain_dup_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain exact-dup audit (dedup.domain_dup_rates): 7 synthetic
    domains; every doc_id % 5 == 4 doc gets an exact text copy under a
    shifted id (usually a different domain), so dup mass lands
    unevenly."""
    from pdf_to_epub_spark.operators import domain_dup_rates

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    dom = lambda c: F.concat(F.lit("d"), (c % 7).cast("string"))  # noqa: E731
    orig = d.select("doc_id", dom(F.col("doc_id")).alias("domain"), "text")
    copies = d.where(F.col("doc_id") % 5 == 4).select(
        (F.col("doc_id") + 10_000_000).alias("doc_id"),
        dom(F.col("doc_id") + 10_000_000).alias("domain"),
        "text",
    )
    return domain_dup_rates(orig.unionAll(copies))


def _q_jl_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sign-random JL projection (similarity.jl_project) of the 64-dim
    embeddings to 16 dims — md5-parity sign matrix, micro-unit exact
    folds."""
    from pdf_to_epub_spark.operators import jl_project

    e = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    return jl_project(e, out_dims=16)


def _q_docx_extract_blocks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DOCX/WordprocessingML source surface, oracled end-to-end: each
    documents row is rendered into a structurally honest ``.docx`` ZIP
    (sources/docx.make_docx_bytes — [Content_Types], rels, document.xml
    with styled ``w:p``/``w:r``/``w:t`` runs SPLIT mid-word, ``w:tab``
    elements, XML-escaped entity bait) and parsed back through the
    Arrow-batched extractor; the oracle recomputes the expected
    (block_id, block_type, text) rows relationally from the raw text, so
    a parser that drops run fragments, loses the tab, or mis-unescapes
    entities fails the hash."""
    _ship_package(spark)
    from pdf_to_epub_spark.sources.docx import (
        documents_as_docx,
        parse_docx_payloads,
    )

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    blocks = parse_docx_payloads(documents_as_docx(docs))
    return blocks.select(
        "doc_id",
        F.col("block_id").cast("long").alias("block_id"),
        "block_type",
        "text",
    )


def _q_docx_chapters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chapter assembly over the parsed docx blocks
    (sources/docx.docx_chapters): running heading count opens chapters,
    one per-doc rollup with title / paragraph count / body chars — the
    EPUB-spine aggregation shape (SURVEY §2 A2) on the docx source."""
    _ship_package(spark)
    from pdf_to_epub_spark.sources.docx import (
        documents_as_docx,
        docx_chapters,
        parse_docx_payloads,
    )

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    blocks = parse_docx_payloads(documents_as_docx(docs))
    return docx_chapters(blocks)


def _gated_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared access-gate fixture: 7 synthetic domains; every
    ``doc_id % 7 == 3`` page becomes a metered-paywall teaser (first 25
    words + subscription boilerplate) and every ``doc_id % 7 == 1`` page
    a consent-shell (cookie-banner boilerplate prepended)."""
    d = _t(spark, sf_dir, "documents").select(
        "doc_id", F.coalesce(F.col("text"), F.lit("")).alias("text")
    )
    toks = F.filter(
        F.split(F.col("text"), r"\s+"), lambda x: x != F.lit("")
    )
    teaser = F.concat(
        F.array_join(F.slice(toks, 1, 25), " "),
        F.lit(
            " Subscribe to continue reading. Already a subscriber? "
            "Sign in. Unlock unlimited digital access."
        ),
    )
    consent = F.concat(
        F.lit(
            "We value your privacy. We and our partners use cookies. "
            "Accept all cookies or manage your preferences. "
        ),
        F.col("text"),
    )
    return d.select(
        "doc_id",
        F.concat(F.lit("d"), (F.col("doc_id") % 7).cast("string")).alias(
            "domain"
        ),
        F.when(F.col("doc_id") % 7 == 3, teaser)
        .when(F.col("doc_id") % 7 == 1, consent)
        .otherwise(F.col("text"))
        .alias("text"),
    )


def _q_gate_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Paywall/consent-gate page classification (gates.gate_signals) over
    the mutated gate fixture — marker regexp counts plus the
    teaser-truncation coupling, pure codegen column algebra."""
    from pdf_to_epub_spark.operators.gates import gate_signals

    return gate_signals(_gated_pages(spark, sf_dir))


def _q_gate_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain access-gate audit (gates.gate_rates): gate rates per
    synthetic domain — the crawl-health rollup deciding which domains
    are worth fetching."""
    from pdf_to_epub_spark.operators.gates import gate_rates, gate_signals

    return gate_rates(gate_signals(_gated_pages(spark, sf_dir)))


def _q_texttiling_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TextTiling cohesion scoring (segment.texttiling_gaps) over the
    documents table — integer micro-Dice per gap, local-valley depth,
    strictly-above-mean boundary rule; w=10-token pseudo-sentences,
    k=2 window."""
    from pdf_to_epub_spark.operators.segment import texttiling_gaps

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return texttiling_gaps(d, w=10, k=2)


def _q_text_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Topic tiles (segment.text_segments): contiguous pseudo-sentence
    ranges cut at the TextTiling boundaries — every tokenful document
    yields at least one tile."""
    from pdf_to_epub_spark.operators.segment import text_segments

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return text_segments(d, w=10, k=2)


def _subtitle_cues(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared subtitle fixture: every document renders to a subtitle
    file — SRT for even ids, WebVTT for odd ids (both formats must
    parse to the SAME cues) — then parses back relationally."""
    from pdf_to_epub_spark.sources.subtitles import (
        parse_subtitle_cues,
        render_srt,
    )

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    srt = render_srt(d.where(F.col("doc_id") % 2 == 0), vtt=False)
    vtt = render_srt(d.where(F.col("doc_id") % 2 == 1), vtt=True)
    return parse_subtitle_cues(srt.unionByName(vtt))


def _q_srt_cues(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SRT/WebVTT subtitle source (sources/subtitles), oracled
    end-to-end: the whole render→parse loop is Catalyst string algebra
    (zero Python); the oracle recomputes expected cue timing/text
    relationally from the raw tokens, so the writer and parser must be
    exact inverses in BOTH formats."""
    return _subtitle_cues(spark, sf_dir)
