"""Driver query builders (part 4/7 of the mechanical __spark_entry__ split; verbatim)."""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window
from entry._shared import _docs_as_pages, _ship_package, _t
from entry.queries_01 import mutated_recrawl
from entry.queries_02 import _link_pages
from entry.queries_03 import _MOJI_TAIL, _OCR_TAIL


def _q_encoding_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Encoding-artifact router (textstats.encoding_signals): every 6th
    doc (≡1) gets a mojibake tail, every 6th (≡4) gets replacement/
    control/NBSP bytes — those must flag while clean docs stay quiet.
    The oracle splices the same marker alternation and tails."""
    from pdf_to_epub_spark.operators import encoding_signals

    d = _t(spark, sf_dir, "documents")
    bad = F.concat(
        F.col("text"), F.lit("\ufffd\ufffd\x07\u00a0")
    )
    docs = d.select(
        "doc_id",
        F.when((F.col("doc_id") % 6) == 1, F.concat("text", F.lit(_MOJI_TAIL)))
        .when((F.col("doc_id") % 6) == 4, bad)
        .otherwise(F.col("text"))
        .alias("text"),
    )
    return encoding_signals(docs)


def _q_ocr_artifacts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OCR-damage router (textstats.ocr_artifact_signals): every 4th doc
    (≡2) gets hyphen-wrap/digit-confusion/broken-word damage appended and
    must come back needs_repair; the oracle replays all five counters
    under RE2."""
    from pdf_to_epub_spark.operators import ocr_artifact_signals

    d = _t(spark, sf_dir, "documents")
    docs = d.select(
        "doc_id",
        F.when((F.col("doc_id") % 4) == 2, F.concat("text", F.lit(_OCR_TAIL)))
        .otherwise(F.col("text"))
        .alias("text"),
    )
    return ocr_artifact_signals(docs)


def _q_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact token-budget curriculum cut (sampling.token_budget_select):
    docs ranked by alpha-ratio quality, best prefix under a 100k-token
    budget kept; cum_tokens audits where the line fell.  The Spark side
    reconstructs the global prefix sum with the two-phase score-bucket
    form; the oracle is the single global window cumsum it must equal
    bit-exactly (integer token sums)."""
    from pdf_to_epub_spark.operators import token_budget_select

    d = _t(spark, sf_dir, "documents").select(
        "doc_id",
        (
            F.length(F.regexp_replace("text", "[^A-Za-zÀ-ÖØ-öø-ÿ]", ""))
            / F.greatest(F.length("text"), F.lit(1))
        ).alias("score"),
        F.expr("regexp_count(lower(text), '[a-zà-öø-ÿ]+')").alias("n_tokens"),
    )
    return token_budget_select(d, budget=100_000)


def _q_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup semantic dedup (similarity.semantic_dedup): deterministic
    sample-trained coarse clusters, within-cluster cosine ≥ 0.4 drops the
    higher id; one verdict row per vector.  The oracle replays the
    quantizer in Python (the _kmeans_profile_oracle pattern) and the
    assignment / pair / keep logic relationally."""
    from pdf_to_epub_spark.operators import semantic_dedup

    e = _t(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    return semantic_dedup(e, tau=0.4, n_centroids=16)


def _q_temperature_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mT5/CC-100 α-sampling plan over languages, char-weighted
    (sampling.temperature_mixture, α=0.5): head languages flatten, tail
    grows, epochs > 1 marks upsampled groups.  n^α is quantized to
    integer micro-units before the cross-group sum so the oracle's
    normalization is order-independent."""
    from pdf_to_epub_spark.operators import temperature_mixture

    d = _t(spark, sf_dir, "documents")
    return temperature_mixture(
        d, group_col="lang", weight_col="n_chars", alpha=0.5,
        budget=10_000_000,
    )


def _q_code_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Code-vs-prose routing (textstats.code_signals): every 7th doc's
    text is replaced by a synthetic code file (keywords, indentation,
    brace/semicolon lines) which must flag is_code while the prose docs
    stay false; the oracle replays all four signal families under RE2
    (?m) semantics."""
    from pdf_to_epub_spark.operators import code_signals

    d = _t(spark, sf_dir, "documents")
    sid = F.col("doc_id").cast("string")
    code_text = F.concat(
        F.lit("def handler_"), sid, F.lit("(x):\n    return x + "), sid,
        F.lit(";\n\nclass Page"), sid,
        F.lit(":\n    import os\n    var cache = {};\n    const LIMIT = "),
        sid, F.lit(";\n"),
    )
    docs = d.select(
        "doc_id",
        F.when((F.col("doc_id") % 7) == 3, code_text)
        .otherwise(F.col("text"))
        .alias("text"),
    )
    return code_signals(docs)


def _q_url_templates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawler-trap template mining (urls.url_templates): four synthetic
    URL families — calendar paths, article ids, 16-hex session ids, and
    a static page — must collapse to exactly four skeletons per domain
    with correct counts and domain shares."""
    from pdf_to_epub_spark.operators import url_templates

    d = _t(spark, sf_dir, "documents")
    site = (F.col("doc_id") % 5).cast("string")
    sid = F.col("doc_id").cast("string")
    month = F.lpad(((F.col("doc_id") % 12) + 1).cast("string"), 2, "0")
    url = (
        F.when(
            (F.col("doc_id") % 4) == 0,
            F.concat(
                F.lit("https://site"), site, F.lit(".com/cal/2024/"),
                month, F.lit("/"), sid,
            ),
        )
        .when(
            (F.col("doc_id") % 4) == 1,
            F.concat(
                F.lit("https://site"), site, F.lit(".com/article/"),
                sid, F.lit("-page"),
            ),
        )
        .when(
            (F.col("doc_id") % 4) == 2,
            F.concat(
                F.lit("https://site"), site, F.lit(".com/session/"),
                F.substring(F.md5(sid), 1, 16), F.lit("/view?sid="), sid,
            ),
        )
        .otherwise(
            F.concat(F.lit("https://site"), site, F.lit(".com/about"))
        )
    )
    return url_templates(d.select(url.alias("url")))


def _q_corpus_tiers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tier extraction — the deliverable shape of this graft cell: every
    document lands in exactly one training tier by composing signals the
    engine already computes.  ``reject`` = exact-dup loser (keep-lowest
    md5 group policy) or hard quality floor (n_words < 25, alpha word
    ratio ≤ 0.8, or symbol ratio ≥ 0.1); ``head`` = surviving docs in
    the strict band (≥ 70 words, mean word length in [3, 10]); ``mid``
    = everything else kept.  (Thresholds sit at this corpus's quartiles
    so all three tiers are populated; the full Gopher ``keep`` verdict
    is its own query.)  Tier rules read the ROUNDED gopher signals so
    the Spark/DuckDB threshold comparisons are bit-identical; the
    oracle reuses the gopher feature algebra (_GOPHER_ORACLE) as a
    CTE."""
    from pyspark.sql.window import Window

    from pdf_to_epub_spark.operators import gopher_quality

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    g = gopher_quality(d)
    w = Window.partitionBy(F.md5(F.coalesce(F.col("text"), F.lit(""))))
    dup = d.select(
        "doc_id",
        (F.col("doc_id") != F.min("doc_id").over(w)).alias("dup_loser"),
    )
    j = g.join(dup, "doc_id")
    rejected = (
        F.col("dup_loser")
        | (F.col("n_words_g") < 25)
        | (F.col("alpha_word_ratio") <= 0.8)
        | (F.col("symbol_ratio") >= 0.1)
    )
    tier = (
        F.when(rejected, F.lit("reject"))
        .when(
            (F.col("n_words_g") >= 70)
            & (F.col("mean_word_len_g") >= 3.0)
            & (F.col("mean_word_len_g") <= 10.0),
            F.lit("head"),
        )
        .otherwise(F.lit("mid"))
    )
    return j.select("doc_id", "dup_loser", "keep", tier.alias("tier"))


def _q_mirror_domains(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mirror-site detection (urls.mirror_domains): every 10th doc is
    republished byte-identical under a second registrable domain (.org
    mirror); the operator must flag exactly those content hashes with
    both domains listed, and no near-unique doc may leak in."""
    from pdf_to_epub_spark.operators import mirror_domains

    d = _t(spark, sf_dir, "documents")
    site = (F.col("doc_id") % 13).cast("string")
    pages = d.select(
        F.concat(
            F.lit("https://site"), site, F.lit(".com/doc/"),
            F.col("doc_id").cast("string"),
        ).alias("url"),
        "text",
    )
    mirrored = d.where((F.col("doc_id") % 10) == 0).select(
        F.concat(
            F.lit("https://mirror-site"), site, F.lit(".org/copy/"),
            F.col("doc_id").cast("string"),
        ).alias("url"),
        "text",
    )
    return mirror_domains(pages.unionByName(mirrored))


def _q_c4_filters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style line/page cleaning (textstats.c4_filters): terminal-punct
    + ≥3-words + no-'javascript' line keep, ≥5-sentence / no-lorem /
    no-curly page keep; cleaned text checked via md5.  The oracle
    replays the line predicates with DuckDB list_filter (RE2-portable
    by construction)."""
    from pdf_to_epub_spark.operators import c4_filters

    d = _t(spark, sf_dir, "documents")
    return c4_filters(d.select("doc_id", "text"), id_col="doc_id")


def _q_hll_domain_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog distinct-URL count per domain (operators/sketch.py):
    md5-60 hash split into 8 bucket bits + 52-bit rank suffix, integer
    harmonic sum (order-independent, exact), small-range linear-counting
    branch.  The oracle replays registers, the integer sum, and the same
    branch in SQL; `exact_distinct` + relative error ride along so the
    row is self-auditing."""
    from pdf_to_epub_spark.operators import hll_estimate, hll_sketch

    d = _t(spark, sf_dir, "documents")
    domain = F.concat(
        F.lit("site"), (F.col("doc_id") % 13).cast("string"), F.lit(".com")
    )
    pages = d.select(
        domain.alias("domain"),
        F.concat(
            F.lit("https://"), domain, F.lit("/doc/"),
            F.col("doc_id").cast("string"),
        ).alias("url"),
    )
    regs = hll_sketch(pages, "url", p=8, group_cols=["domain"])
    est = hll_estimate(regs, p=8, group_cols=["domain"])
    exact = pages.groupBy("domain").agg(
        F.count_distinct("url").alias("exact_distinct")
    )
    return est.join(exact, "domain").select(
        "domain",
        "exact_distinct",
        "est_distinct",
        F.round(
            F.abs(F.col("est_distinct") - F.col("exact_distinct"))
            / F.col("exact_distinct"),
            4,
        ).alias("rel_error"),
    )


def _q_histogram_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable histogram quantile sketch (operators/sketch.py): 50
    fixed-width bins over n_chars in [0, 5000), interpolated estimates at
    4 quantiles — the data-INdependent-edges sketch that merges across
    corpora by counter addition (exact percentile and GK cannot).  The
    oracle replays binning, cumulative walk, and interpolation."""
    from pdf_to_epub_spark.operators import histogram_quantiles, histogram_sketch

    d = _t(spark, sf_dir, "documents")
    sk = histogram_sketch(d, "n_chars", lo=0.0, hi=5000.0, n_bins=50)
    return histogram_quantiles(
        sk, [0.25, 0.5, 0.9, 0.99], lo=0.0, hi=5000.0, n_bins=50
    )


def _q_bloom_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter crawl membership (operators/sketch.py): the filter is
    built over the already-crawled third of the url space and every url
    probes it — no false negatives by construction, false positives
    deterministic (and oracle-replayed) because the bit hashes are md5-60.
    Output: (doc_id, might_contain, actually_in)."""
    from pdf_to_epub_spark.operators import bloom_build, bloom_probe

    d = _t(spark, sf_dir, "documents")
    urls = d.select(
        "doc_id",
        F.concat(
            F.lit("https://crawl.invalid/doc/"), F.col("doc_id").cast("string")
        ).alias("url"),
    )
    bloom = bloom_build(urls.where((F.col("doc_id") % 3) == 0))
    return bloom_probe(urls, bloom).select(
        "doc_id",
        "might_contain",
        ((F.col("doc_id") % 3) == 0).alias("actually_in"),
    )


def _q_domain_quality_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wilson-lower-bound domain curation (urls.domain_quality_rank) over
    the 13 deterministic domains with a length-based quality bit: the
    95%-confident floor of each domain's pass rate — the rank a
    crawl-budget allocator should use instead of the raw fraction.  The
    oracle replays the bound with the identical expression shape."""
    from pdf_to_epub_spark.operators import domain_quality_rank

    d = _t(spark, sf_dir, "documents")
    pages = d.select(
        F.concat(
            F.lit("site"), (F.col("doc_id") % 13).cast("string"), F.lit(".com")
        ).alias("domain"),
        (F.col("n_chars") >= 400).alias("keep"),
    )
    return domain_quality_rank(pages)


def _q_bpe_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility per language (textstats.bpe_fertility): the
    corpus-learned 8-merge BPE applied per (lang, word) vocab row — a
    merge list dominated by the majority language over-fragments the
    rest, and this table quantifies it.  Oracle = pure-Python
    learn+encode+aggregate replay (golden-VALUES)."""
    from pdf_to_epub_spark.operators import bpe_fertility, bpe_learn_merges

    d = _t(spark, sf_dir, "documents")
    m = bpe_learn_merges(d, n_merges=8, min_weight=2).orderBy("rank").collect()
    return bpe_fertility(d, [(r["left"], r["right"]) for r in m])


def _q_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch (operators/sketch.py): 4×1024 counter grid over
    the corpus token stream, point estimates for the true top-30 tokens —
    ``(tok, true_n, cms_est)`` with est ≥ true by construction.  The
    sketch shuffle is a fixed ≤4096 groups regardless of corpus size; the
    estimate stage is broadcast-only.  The oracle replays the md5 bucket
    arithmetic, the counters, and the min-over-rows exactly."""
    from pdf_to_epub_spark.operators import cms_estimate, cms_sketch
    from pdf_to_epub_spark.operators.textstats import _tokens

    d = _t(spark, sf_dir, "documents")
    sketch = cms_sketch(d, depth=4, width=1024)
    true = (
        d.select(F.explode(_tokens("text")).alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").cast("long").alias("true_n"))
        .orderBy(F.desc("true_n"), F.col("tok").asc())
        .limit(30)
    )
    est = cms_estimate(sketch, true.select("tok"), depth=4, width=1024)
    return true.join(est, "tok").select("tok", "true_n", "cms_est")


def _q_collapse_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-document repeated-line collapse (dedup.collapse_repeated_lines):
    each doc is wrapped with a repeated NAV chrome line plus a duplicate of
    its own first line; the collapse must keep first occurrences and blanks
    only, entirely in per-row HOF algebra (zero shuffles).  The oracle
    replays the index-lambda filter in DuckDB."""
    from pdf_to_epub_spark.operators import collapse_repeated_lines

    d = _t(spark, sf_dir, "documents")
    body = F.coalesce(F.col("text"), F.lit(""))
    pages = d.select(
        "doc_id",
        F.concat(
            F.lit("NAV MENU\n"),
            body,
            F.lit("\nNAV MENU\n"),
            F.element_at(F.split(body, "\n"), 1),
        ).alias("text"),
    )
    return collapse_repeated_lines(pages)


def _q_term_blocklist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style blocklist gate (textstats.term_blocklist_signals): every
    7th doc gains a spam footer; token-sequence term counts must flag
    exactly those.  Both engines count by the separator-doubling
    normalize + literal replace — the RE2-safe mirror of whole-token
    phrase matching."""
    from pdf_to_epub_spark.operators import term_blocklist_signals

    d = _t(spark, sf_dir, "documents")
    pages = d.select(
        "doc_id",
        F.when(
            (F.col("doc_id") % 7) == 2,
            F.concat(
                F.coalesce(F.col("text"), F.lit("")),
                F.lit(
                    " Click here to subscribe. Casino winner! Click here now."
                ),
            ),
        ).otherwise(F.col("text")).alias("text"),
    )
    terms = (
        "click here", "subscribe", "casino", "winner", "buy now",
        "lorem ipsum",
    )
    return term_blocklist_signals(pages, terms).select(
        "doc_id", "n_blocklist_hits", "blocked_ratio", "is_blocked"
    )


def _q_dsir_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gumbel top-k DSIR selection (sampling.dsir_resample): draw 50
    documents without replacement with probability ∝ importance weight —
    deterministic Gumbel noise from the md5 unit hash, rank on the
    6-dp-rounded key, TakeOrderedAndProject cut."""
    from pdf_to_epub_spark.operators import dsir_resample, md5_hash60

    d = _t(spark, sf_dir, "documents")
    return dsir_resample(
        d, d.where(F.col("lang") == "en"), k=50, token_hash=md5_hash60
    )


def _q_corpus_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source-mixture planning + deterministic application
    (operators/sampling.py `mixture_plan`/`apply_mixture`): a 40/30/20/10
    char-weighted target over four sources, largest-achievable budget
    with no upsampling, membership by md5 unit hash.  Returns the plan
    joined with the post-sample per-source summary; the oracle replays
    T*, the rates, and the hash filter relationally."""
    from pdf_to_epub_spark.operators import apply_mixture, mixture_plan

    d = _t(spark, sf_dir, "documents")
    targets = {"src0": 0.4, "src1": 0.3, "src2": 0.2, "src3": 0.1}
    plan = mixture_plan(d, targets, weight_col="n_chars")
    kept = (
        apply_mixture(d, targets, weight_col="n_chars")
        .groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_docs_kept"),
            F.sum("n_chars").cast("long").alias("chars_kept"),
        )
    )
    return plan.join(kept, "source", "left").select(
        "source",
        F.round("target_frac", 6).alias("target_frac"),
        "available",
        F.round("rate", 6).alias("rate"),
        F.coalesce("n_docs_kept", F.lit(0)).cast("long").alias("n_docs_kept"),
        F.coalesce("chars_kept", F.lit(0)).cast("long").alias("chars_kept"),
    )


def _q_soft404(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Soft-404 detection (textstats.soft404_signals): every 11th document
    is rewritten into an HTTP-200 error page (body + /404 URL path) and
    the phrase/length/URL heuristic must flag exactly those — the crawl
    contaminant that survives status-code filtering.  Pure codegen column
    algebra; the oracle mirrors each signal."""
    from pdf_to_epub_spark.operators import soft404_signals

    d = _t(spark, sf_dir, "documents")
    sid = F.col("doc_id").cast("string")
    is_err = (F.col("doc_id") % 11) == 3
    pages = d.select(
        "doc_id",
        F.when(
            is_err,
            F.concat(
                F.lit("404 Page Not Found - The requested URL /doc/"),
                sid,
                F.lit(" was not found on this server."),
            ),
        ).otherwise(F.col("text")).alias("text"),
        F.when(
            is_err, F.concat(F.lit("https://crawl.invalid/"), sid, F.lit("/404"))
        ).otherwise(
            F.concat(F.lit("https://crawl.invalid/doc/"), sid)
        ).alias("url"),
    )
    return soft404_signals(pages, url_col="url").select(
        "doc_id", "n_error_phrases", "n_word_tokens", "url_error_hint",
        "is_soft404",
    )


def _q_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric shingle-containment detection (operators/dedup.py
    `containment_pairs`) over documents ∪ first-half excerpts: an excerpt
    is ~fully contained in its source (c ≈ 1) while the pair's Jaccard is
    only ~0.5 — the syndication/quote case the Jaccard queries
    structurally miss.  Probe-side-only prefix filter; exact
    string-shingle verification.  The oracle recomputes containment
    through a shared-shingle inverted index."""
    from pdf_to_epub_spark.operators import containment_pairs

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    t = d.select("doc_id", F.split(F.trim("text"), r"\s+").alias("_tk"))
    excerpts = t.select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.concat_ws(
            " ",
            F.slice("_tk", F.lit(1), ((F.size("_tk") + 1) / 2).cast("int")),
        ).alias("text"),
    )
    return containment_pairs(d.unionByName(excerpts), k=5, threshold=0.8)


def _q_containment_df_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Template-pressure audit for the capped containment default
    (operators/dedup.py `containment_df_stats` — VERDICT r4 #1): every
    doc gets one shared boilerplate sentence prepended (the cookie-banner
    shape), so its 6 pure-template 5-shingles carry df = n_docs and the
    max_df=50 cap must trip at BOTH driver scales.  One row: distinct
    shingle count, hottest df, shingles over the cap, and the Σdf the
    capped plan's hot-side shuffle would carry.  Oracle recomputes the
    shingle document frequencies over string shingles (the hash-identity
    distribution is the same up to ~2⁻⁶³ collisions)."""
    from pdf_to_epub_spark.operators import containment_df_stats

    tpl = "this site uses cookies to improve your browsing experience"
    d = _t(spark, sf_dir, "documents").select(
        "doc_id", F.concat(F.lit(tpl + " "), F.col("text")).alias("text")
    )
    return containment_df_stats(d, k=5, max_df=50)


def _q_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance weights (operators/sampling.py `dsir_log_weights`,
    Xie et al. 2023): hashed unigram+bigram bucket distributions of the
    raw corpus vs the English-target subset, per-document log importance
    weight as an order-independent integer micro-nat sum.  The 4096-row
    ratio table broadcasts; the corpus shuffles only on doc_id.  The
    oracle replays buckets (md5-60 arithmetic), smoothing, and the sum
    relationally."""
    from pdf_to_epub_spark.operators import dsir_log_weights, md5_hash60

    d = _t(spark, sf_dir, "documents")
    return dsir_log_weights(
        d, d.where(F.col("lang") == "en"), token_hash=md5_hash60
    )


def _q_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer APPLICATION (textstats.bpe_encode_symbols): the corpus is
    re-encoded with the 8 merges learned by `bpe_merges` and the resulting
    subword symbol table (symbol, n_words, occurrences) is returned — the
    encode runs per DISTINCT vocabulary word in an Arrow batch, so corpus
    text crosses into Python exactly zero times.  The ≤8-row merge-table
    collect is the tokenizer artifact itself (bounded driver data).  The
    oracle replays learn+encode+count in pure Python (golden-VALUES)."""
    from pdf_to_epub_spark.operators import (
        bpe_encode_symbols,
        bpe_learn_merges,
    )

    d = _t(spark, sf_dir, "documents")
    m = bpe_learn_merges(d, n_merges=8, min_weight=2).orderBy("rank").collect()
    return bpe_encode_symbols(d, [(r["left"], r["right"]) for r in m])


def _q_minimizer_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing minimizer fingerprints (operators/dedup.py
    `minimizer_fingerprints`, k=3-token shingles, w=4 windows) with the
    md5-backed 60-bit hash so DuckDB replays the sketch exactly —
    shingle hashing, sliding-window minima, and the short-document
    degenerate cases all included."""
    from pdf_to_epub_spark.operators import md5_hash60, minimizer_fingerprints

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return minimizer_fingerprints(d, k=3, w=4, token_hash=md5_hash60)


def _q_minimizer_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared-minimizer overlap candidates over the mutated re-crawl
    corpus (each doc + its last-word-dropped twin): position-local
    fingerprints catch the copied-passage case whole-document MinHash
    dilutes.  The oracle recomputes the sketch AND the full pair join
    with shared counts."""
    from pdf_to_epub_spark.operators import md5_hash60, minimizer_overlap_pairs

    return minimizer_overlap_pairs(
        mutated_recrawl(spark, sf_dir),
        k=3, w=4, min_shared=5, token_hash=md5_hash60,
    )


def _q_kmeans_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed Lloyd's iteration profile (similarity.kmeans_step):
    full-corpus nearest-centroid assignment against the deterministic
    sample-trained quantizer, then the per-cluster update — member count,
    inertia (mean member distance), and centroid shift.  The oracle
    replays the seeding in Python (the _ivf_topk_oracle pattern) and the
    assignment/update relationally."""
    from pdf_to_epub_spark.operators import kmeans_step

    e = _t(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    return kmeans_step(e, n_centroids=16)


def _q_quarantine_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-isolation surface, oracled: documents are inflated ×50 and
    extracted under a 100k-char cap — oversized docs must become
    ``quarantined`` status rows (never task failures), everything else
    extracts normally.  The oracle recomputes the expected status split
    from lengths alone."""
    _ship_package(spark)
    from pdf_to_epub_spark.operators import extract_documents, status_summary

    docs = _docs_as_pages(_t(spark, sf_dir, "documents")).select(
        "url", "warc_ts", "lang", F.repeat("text", 50).alias("text")
    )
    extracted = extract_documents(docs, max_doc_chars=100_000)
    return status_summary(extracted).select(
        "status", F.col("docs").cast("long").alias("n_docs")
    )


def _q_resume_pending(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S2/S3 checkpoint resume: first half committed → second half pending."""
    from pdf_to_epub_spark.operators import pending_documents, with_doc_hash

    d = with_doc_hash(_t(spark, sf_dir, "documents"), payload_col="text")
    done = d.where(F.col("doc_id") % 2 == 0).select("doc_hash")
    return pending_documents(d, done).select("doc_id")


def _q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort-retention triangle over the events table: users cohorted by
    first-touch epoch day, distinct-active counts per (cohort, offset)
    cell (operators/analytics.py).  Epoch-day arithmetic end to end — no
    timezone dependence."""
    from pdf_to_epub_spark.operators import cohort_retention

    e = _t(spark, sf_dir, "events").select("user_id", "ts")
    return cohort_retention(e)


def _q_funnel_stages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """signup → view → purchase funnel walk per user: one HOF-aggregate
    pass over each user's time-sorted events (operators/analytics.py);
    the oracle replays the identical fixpoint as three chained
    conditional-min CTEs."""
    from pdf_to_epub_spark.operators import funnel_stages

    e = _t(spark, sf_dir, "events").select("user_id", "ts", "event_type")
    return funnel_stages(e)


def _q_chunk_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window training-example chunking (64-token windows, stride
    48; operators/packing.py chunk_by_tokens) — zero-shuffle codegen;
    the oracle replays starts/slices via generate_series + list_slice."""
    from pdf_to_epub_spark.operators import chunk_by_tokens

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return chunk_by_tokens(d, size=64, stride=48)


def _q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-language stratified sample: ceil(n/5) smallest-hash rows
    per stratum via the two-phase salted rank (operators/sampling.py
    stratified_sample_exact); the oracle is the single-window form the
    salted plan reconstructs exactly."""
    from pdf_to_epub_spark.operators import stratified_sample_exact

    d = _t(spark, sf_dir, "documents").select("doc_id", "lang")
    return stratified_sample_exact(d, num=1, den=5, strata_col="lang").select(
        "doc_id", "lang"
    )


def _q_hits_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HITS hubs/authorities over the same deterministic domain webgraph
    as domain_pagerank (operators/urls.py hits_scores, 5 L1-normalized
    iterations); the oracle is a pure-Python replay over the static edge
    set."""
    from pdf_to_epub_spark.operators import (
        domain_graph,
        extract_outlinks,
        hits_scores,
    )

    d = _t(spark, sf_dir, "documents").select("doc_id")
    pages = _link_pages(d)
    return hits_scores(domain_graph(extract_outlinks(pages)), iterations=5)


def _q_jsonl_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSONL sink/source round-trip (sources/jsonl.py), disk-free: docs →
    to_json lines → from_json under the explicit schema.  The oracle
    recomputes the payload md5/byte-length from documents directly, so
    any serialization loss (escaping, nulls, field order) breaks the
    hash; parsed_ok pins the PERMISSIVE corrupt column to all-clean."""
    from pdf_to_epub_spark.sources.jsonl import (
        parse_jsonl_lines,
        to_jsonl_lines,
    )

    d = _t(spark, sf_dir, "documents").select("doc_id", "text", "lang", "source")
    back = parse_jsonl_lines(
        to_jsonl_lines(d, ("doc_id", "text", "lang", "source"))
    )
    return back.select(
        "doc_id",
        F.md5(F.coalesce("text", F.lit(""))).alias("text_md5"),
        F.octet_length(F.coalesce("text", F.lit("")))
        .cast("long")
        .alias("text_bytes"),
        F.coalesce("lang", F.lit("")).alias("lang"),
        F.coalesce("source", F.lit("")).alias("source"),
        F.col("_corrupt").isNull().alias("parsed_ok"),
    )


def _q_classifier_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashed-feature linear quality classifier (operators/classify.py):
    md5-bucket features, deterministic weights, sigmoid keep-probability —
    zero-shuffle HOF scoring; the oracle replays hash, weights, and
    summation order bit-for-bit."""
    from pdf_to_epub_spark.operators import classifier_scores

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return classifier_scores(d)


def _q_event_rolling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-hour RANGE-frame rolling count/sum/avg per user
    (operators/analytics.py rolling_window) — the burst-detection
    primitive; epoch-second ordering, inclusive wall-clock bounds."""
    from pdf_to_epub_spark.operators import rolling_window

    e = _t(spark, sf_dir, "events").select("event_id", "user_id", "ts", "value")
    return rolling_window(e)


def _q_event_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user event-type pivot with an explicit column vocabulary
    (operators/analytics.py pivot_counts) — wide ML feature rows from
    the event log, one map-side-combined shuffle."""
    from pdf_to_epub_spark.operators import pivot_counts

    e = _t(spark, sf_dir, "events").select("user_id", "event_type")
    return pivot_counts(e)


def _q_click_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution: each purchase joined as-of to the same
    user's most recent click at-or-before purchase time, attributed only
    within a 24 h lookback.  Reuses the union-sort-window as-of operator
    (operators/asof.py) on a second domain; the oracle uses DuckDB's
    native ASOF JOIN plus the same window postfilter."""
    from pdf_to_epub_spark.operators.asof import asof_join

    e = _t(spark, sf_dir, "events")
    purchases = e.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = (
        e.where(F.col("event_type") == "click")
        # dedupe per (user, ts): deterministic pick on timestamp ties
        .groupBy("user_id", F.col("ts").alias("click_ts"))
        .agg(F.min("event_id").alias("click_id"))
    )
    joined = asof_join(
        purchases, clicks,
        key_left="user_id", key_right="user_id",
        time_left="ts", time_right="click_ts",
        value_cols=["click_id", "click_ts"],
    )
    # parquet timestamps read as NTZ; cast to LTZ (UTC session) for
    # unix_micros — same coercion funnel_stages' array cast performs
    gap = F.unix_micros(F.col("ts").cast("timestamp")) - F.unix_micros(
        F.col("click_ts").cast("timestamp")
    )
    within = F.col("click_ts").isNotNull() & (gap <= 86_400_000_000)
    return joined.select(
        "event_id",
        "user_id",
        F.when(within, F.col("click_id")).alias("click_id"),
        F.when(within, gap).alias("gap_us"),
    )


def _q_compact_postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSM-style index compaction (operators/ir.py compact_postings):
    segment 0 = full-corpus postings, segment 1 = a recrawl of every
    5th doc with the last word dropped; compaction must keep exactly the
    newest segment per document — one doc-keyed window, no join-back."""
    from pdf_to_epub_spark.operators import compact_postings, term_postings

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    seg0 = term_postings(d).withColumn("segment", F.lit(0))
    recrawled = d.where(F.col("doc_id") % 5 == 0).select(
        "doc_id",
        F.regexp_replace("text", r"\s+\S+\s*$", "").alias("text"),
    )
    seg1 = term_postings(recrawled).withColumn("segment", F.lit(1))
    return compact_postings(seg0.unionByName(seg1))


def _q_snapshot_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset set-ops between two corpus snapshots (EXCEPT ALL /
    INTERSECT ALL — the §2.7 surface): snapshot A carries intentional
    duplicates (docs divisible by 7 appear twice) so the ALL-multiplicity
    semantics are actually exercised, not just the distinct special
    case.  Spark's exceptAll/intersectAll compile to count-aggregated
    generate plans — one shuffle per operand, no row explosion."""
    d = _t(spark, sf_dir, "documents").select("doc_id", "lang")
    a = d.where(F.col("doc_id") % 3 != 0).unionAll(
        d.where(F.col("doc_id") % 7 == 0)
    )
    b = d.where(F.col("doc_id") % 2 == 0)
    return (
        a.exceptAll(b)
        .select(F.lit("a_minus_b").alias("op"), "doc_id", "lang")
        .unionAll(
            b.exceptAll(a).select(
                F.lit("b_minus_a").alias("op"), "doc_id", "lang"
            )
        )
        .unionAll(
            a.intersectAll(b).select(
                F.lit("common").alias("op"), "doc_id", "lang"
            )
        )
    )


def _q_edit_verify_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-level candidate verification (dedup.edit_similarity_pairs):
    the planted near-dup pairs (doc, last-word-dropped recrawl copy) are
    scored by prefix Levenshtein — the final edit-distance check after the
    sketch stages.  The oracle replays levenshtein over the same 300-char
    prefixes in DuckDB (both engines implement plain unit-cost edit
    distance), so dist, the 6-dp similarity, and the 0.75 verdict must all
    hash-match."""
    from pdf_to_epub_spark.operators import edit_similarity_pairs

    corpus = mutated_recrawl(spark, sf_dir)
    ids = _t(spark, sf_dir, "documents").select("doc_id")
    pairs = ids.select(
        F.col("doc_id").alias("id_a"),
        (F.col("doc_id") + F.lit(1_000_000)).alias("id_b"),
    )
    return edit_similarity_pairs(
        pairs, corpus, prefix_chars=300, threshold=0.75
    )


def _q_dedup_best_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-aware cluster survivor policy (dedup.dedup_keep_best): the
    mutated-recrawl corpus with word count as the quality score — in every
    planted cluster {i, i+1e6} the untruncated original must win (higher
    count, or the tie falls to the smaller id when the mutation was a
    no-op on single-word/short docs).  The oracle replays the component
    labels arithmetically (cluster = id mod 1e6 is exact for the planted
    pair graph) and the (score desc, id asc) window."""
    from pdf_to_epub_spark.operators import dedup_keep_best

    corpus = mutated_recrawl(spark, sf_dir)
    docs = corpus.select(
        "doc_id",
        F.expr("regexp_count(lower(text), '[a-zà-öø-ÿ]+')")
        .cast("long")
        .alias("n_words"),
    )
    pairs = (
        _t(spark, sf_dir, "documents")
        .select("doc_id")
        .select(
            F.col("doc_id").alias("id_a"),
            (F.col("doc_id") + F.lit(1_000_000)).alias("id_b"),
        )
    )
    return dedup_keep_best(docs, pairs, score_col="n_words")


def _q_robots_sitemap_urls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """robots.txt Sitemap discovery (robots.robots_sitemaps): global
    directives across casing/tab/comment forms, a `NotSitemap:` decoy
    that must NOT match (the key is line-anchored), and duplicate
    declarations across captures collapsing via distinct."""
    from pdf_to_epub_spark.operators import robots_sitemaps

    d13 = (
        _t(spark, sf_dir, "documents")
        .select((F.col("doc_id") % 13).alias("r"))
        .distinct()
    )
    r = F.col("r")
    rs = r.cast("string")
    site = F.concat(F.lit("https://site"), rs, F.lit(".example"))
    body = (
        F.when(
            r % 3 == 0,
            F.concat(
                F.lit("User-agent: *\nDisallow: /x\nSitemap: "),
                site, F.lit("/sitemap.xml\n\tSITEMAP:\t"),
                site, F.lit("/news.xml\n"),
            ),
        )
        .when(
            r % 3 == 1,
            F.concat(
                F.lit("sitemap: "), site,
                F.lit("/s.xml # primary\nNotSitemap: https://decoy.example/no.xml\n"
                      "Sitemap: "), site, F.lit("/s.xml\n"),
            ),
        )
        .otherwise(F.lit("User-agent: *\nDisallow: /private/\n"))
    )
    robots = d13.select(
        F.concat(F.lit("site"), rs, F.lit(".example")).alias("domain"),
        body.alias("body"),
    )
    return robots_sitemaps(robots)


def _q_unigram_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot drift monitor (textstats.unigram_drift): the new snapshot
    appends a cookie-banner phrase to every third document, so its tokens
    must dominate the KL movers table.  The oracle replays the add-one
    smoothing, the nano-nat quantization (floor(x·1e9 + 0.5) — exact
    either sign in both engines), and the (|contrib| desc, token) cut."""
    from pdf_to_epub_spark.operators import unigram_drift

    old = _t(spark, sf_dir, "documents").select("doc_id", "text")
    new = old.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(F.col("text"), F.lit(" cookie banner accept tracking")),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    return unigram_drift(old, new, top_k=20)


def _q_wet_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WET (extracted-text archive) round-trip: docs grouped 8 ways →
    conversion-record WARC bytes (build_warc_bytes(record_type=
    'conversion'), the CC WET layout this engine's extraction output
    ships in) → parsed back by the same record scanner.  The oracle
    reconstructs url/date/md5/length from documents directly, so the
    conversion-record writer+parser pair is exactly hash-checked."""
    import pandas as pd

    from pdf_to_epub_spark.sources.warc import (
        build_warc_bytes,
        parse_warc_contents,
    )

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        import datetime as dt

        pdf = pdf.sort_values("doc_id")
        epoch = dt.datetime(2024, 1, 1)
        recs = [
            (
                f"http://corpus.example/doc/{i}",
                (epoch + dt.timedelta(seconds=int(i))).strftime(
                    "%Y-%m-%dT%H:%M:%SZ"
                ),
                t.encode("utf-8"),
            )
            for i, t in zip(pdf["doc_id"], pdf["text"])
        ]
        return pd.DataFrame(
            {
                "content": [
                    build_warc_bytes(
                        recs, gzip_members=True, record_type="conversion"
                    )
                ]
            }
        )

    files = (
        d.withColumn("g", F.pmod("doc_id", F.lit(8)))
        .groupBy("g")
        .applyInPandas(build, "content binary")
    )
    return parse_warc_contents(files).select(
        "url",
        "warc_date",
        "record_type",
        F.md5("html").alias("text_md5"),
        F.length("html").cast("long").alias("n_bytes"),
    )


def _q_publish_dates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Publication-date extraction (urls.extract_publish_dates) across
    the full resolution ladder: OG meta tag (valid and deliberately
    malformed content), JSON-LD datePublished, the /YYYY/MM/DD/ URL
    convention, and pages with no date at all; the malformed meta row
    must keep its raw string with a NULL parsed date (ANSI-safe
    try_to_date)."""
    from pdf_to_epub_spark.operators import extract_publish_dates

    d = _t(spark, sf_dir, "documents").select("doc_id")
    i = F.col("doc_id")
    iso = F.concat(
        (F.lit(2020) + i % 6).cast("string"),
        F.lit("-"),
        F.lpad((F.lit(1) + i % 12).cast("string"), 2, "0"),
        F.lit("-"),
        F.lpad((F.lit(1) + i % 28).cast("string"), 2, "0"),
    )
    meta_content = F.when(i % 3 == 0, F.lit("not-a-date")).otherwise(
        F.concat(iso, F.lit("T10:00:00Z"))
    )
    r = i % 4
    html = (
        F.when(
            r == 0,
            F.concat(
                F.lit('<html><head><meta property="article:published_time" content="'),
                meta_content,
                F.lit('"></head><body>x</body></html>'),
            ),
        )
        .when(
            r == 1,
            F.concat(
                F.lit('<html><head><script type="application/ld+json">'
                      '{"@type":"Article","datePublished":"'),
                iso,
                F.lit('"}</script></head><body>x</body></html>'),
            ),
        )
        .otherwise(F.lit("<html><body>undated page</body></html>"))
    )
    url = F.when(
        r == 2,
        F.concat(
            F.lit("https://blog.example/"),
            F.translate(iso, "-", "/"),
            F.lit("/post-"), i.cast("string"), F.lit(".html"),
        ),
    ).otherwise(
        F.concat(F.lit("https://site.example/p"), i.cast("string"))
    )
    pages = d.select(url.alias("url"), html.alias("html"))
    return extract_publish_dates(pages)


def _q_link_reciprocity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal-link ratio (urls.link_reciprocity) over a deterministic
    7-domain graph: the ring edges (r → r±1) are all mutual, the %5 chord
    edges (r → r+3) are one-way, so ratios land strictly between the
    organic and link-farm poles."""
    from pdf_to_epub_spark.operators import link_reciprocity

    d = _t(spark, sf_dir, "documents").select("doc_id")
    i = F.col("doc_id")
    r = i % 7
    dom = lambda c: F.concat(F.lit("s"), c.cast("string"), F.lit(".example"))  # noqa: E731
    ring = d.select(
        dom(r).alias("src_domain"),
        dom(
            F.when(i % 2 == 0, (r + 1) % 7).otherwise((r + 6) % 7)
        ).alias("dst_domain"),
    )
    chords = d.where(i % 5 == 0).select(
        dom(r).alias("src_domain"), dom((r + 3) % 7).alias("dst_domain")
    )
    return link_reciprocity(ring.unionAll(chords))


def _q_gate_attrition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filter-funnel report (metrics.gate_attrition): four ordered gates
    (word floor, alpha ratio, code-brace tell, plausible lang tag) over
    the documents table — per gate, docs reaching it, surviving it, and
    cumulative survival, computed in ONE corpus aggregate."""
    from pdf_to_epub_spark.operators import gate_attrition

    d = _t(spark, sf_dir, "documents")
    n_words = F.expr("regexp_count(lower(text), '[a-zà-öø-ÿ]+')")
    alpha = F.round(
        F.length(F.regexp_replace("text", "[^A-Za-zÀ-ÖØ-öø-ÿ]", ""))
        / F.greatest(F.length("text"), F.lit(1)),
        6,
    )
    gates = [
        ("min_words", n_words >= 20),
        ("alpha_ratio", alpha >= F.lit(0.6)),
        ("no_braces", F.instr("text", "{") == 0),
        ("lang_known", F.col("lang").rlike("^[a-z]{2}$")),
    ]
    return gate_attrition(d, gates)


def _q_leakage_safe_splits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-aware split assignment (sampling.leakage_safe_splits) over
    the mutated-recrawl corpus: both members of every planted near-dup
    pair must land in the SAME split because the hash keys the component
    label, not the doc id — the fix for what the split_leakage audit
    detects."""
    from pdf_to_epub_spark.operators import leakage_safe_splits

    corpus = mutated_recrawl(spark, sf_dir)
    pairs = (
        _t(spark, sf_dir, "documents")
        .select("doc_id")
        .select(
            F.col("doc_id").alias("id_a"),
            (F.col("doc_id") + F.lit(1_000_000)).alias("id_b"),
        )
    )
    return leakage_safe_splits(
        corpus, pairs, weights={"train": 0.5, "val": 0.25, "test": 0.25}
    )


def _q_domain_lang_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain language-mix audit (urls.domain_lang_consistency): pages
    spread over the 13 deterministic site domains with every 11th page's
    lang overridden to 'zz' — per domain the majority language, its
    share, and the mixed-domain flag must reproduce."""
    from pdf_to_epub_spark.operators import domain_lang_consistency

    d = _t(spark, sf_dir, "documents").select("doc_id", "lang")
    i = F.col("doc_id")
    url = F.concat(
        F.lit("https://sub"), (i % 7).cast("string"),
        F.lit(".site"), (i % 13).cast("string"),
        F.lit(".com/doc/"), i.cast("string"),
    )
    pages = d.select(
        url.alias("url"),
        F.when(i % 11 == 0, F.lit("zz")).otherwise(F.col("lang")).alias(
            "lang"
        ),
    )
    return domain_lang_consistency(pages)


def _q_feed_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feed discovery scan (urls.extract_feed_items): every 3k page is an
    RSS channel (two items — one CDATA title, one plain, plus a link-less
    item that must drop), every 3k+1 an Atom feed (href attribute form),
    every 3k+2 a plain page contributing nothing."""
    from pdf_to_epub_spark.operators import extract_feed_items

    d = _t(spark, sf_dir, "documents").select("doc_id")
    i = F.col("doc_id")
    s = i.cast("string")
    r = i % 3
    rss = F.concat(
        F.lit("<rss><channel><item><title><![CDATA[Post "), s,
        F.lit("a]]></title><link>https://feed.example/"), s,
        F.lit("/a</link></item>"
              "<item><title>Post "), s,
        F.lit("b</title><link> https://feed.example/"), s,
        F.lit("/b </link></item>"
              "<item><title>orphan</title></item>"
              "</channel></rss>"),
    )
    atom = F.concat(
        F.lit('<feed xmlns="http://www.w3.org/2005/Atom"><entry>'
              "<title>Entry "), s,
        F.lit('</title><link rel="alternate" href="https://feed.example/'),
        s,
        F.lit('/atom"/></entry></feed>'),
    )
    html = (
        F.when(r == 0, rss)
        .when(r == 1, atom)
        .otherwise(F.lit("<html><body>not a feed</body></html>"))
    )
    pages = d.select(
        F.concat(F.lit("https://feed.example/f"), s).alias("url"),
        html.alias("html"),
    )
    return extract_feed_items(pages)


def _q_hreflang_alternates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declared translation graph (urls.extract_hreflang): alternate
    links in both attribute orders, a stylesheet decoy, and an alternate
    without hreflang that must drop; hreflang values fold to
    lowercase."""
    from pdf_to_epub_spark.operators import extract_hreflang

    d = _t(spark, sf_dir, "documents").select("doc_id")
    i = F.col("doc_id")
    s = i.cast("string")
    html = F.concat(
        F.lit('<head><link rel="alternate" hreflang="DE" href="https://x.example/de/'),
        s,
        F.lit('"><link hreflang="fr" href="https://x.example/fr/'),
        s,
        F.lit('" rel="alternate"/>'
              '<link rel="stylesheet" href="/s.css">'
              '<link rel="alternate" href="/feed.xml"></head>'),
    )
    pages = d.select(
        F.concat(F.lit("https://x.example/en/"), s).alias("url"),
        html.alias("html"),
    )
    return extract_hreflang(pages)


# Mojibake fixture fragments, one per doc_id%8 residue class — shared
# by the Spark query and the golden-VALUES oracle replay.  Each fragment
# ends in clean ASCII so the per-doc ASCII tail cannot extend a run.
# Classes: repairable cp1252 (0, 3, 4-double, 6, 7-nbsp), clean ASCII
# (1), genuine accents that must survive (2), an undecodable surrogate
# run that must stay byte-identical (5).
_MOJI_FRAGS: tuple[str, ...] = (
    "CafÃ© crÃ¨me brulee.",
    "plain ascii text only.",
    "déjà vu naïve café.",
    "quoteâ€™s â€“ dashâ€¦ end.",
    "cafÃƒÂ© twice baked.",
    "bad í € run stays.",
    "MÃ¼nchen Ãœber alles.",
    "Â  leading nbsp gap.",
)
