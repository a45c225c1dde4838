"""Driver query builders (part 7/7 of the mechanical __spark_entry__ split; verbatim)."""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from entry._shared import _ship_package, _t
from entry.queries_06 import _subtitle_cues


def _q_srt_transcripts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transcript assembly (subtitles.cues_to_transcript): silences
    longer than 1 s open paragraphs — the fixture schedules a 5 s
    silence before every 10th cue, so paragraph structure is exact."""
    from pdf_to_epub_spark.sources.subtitles import cues_to_transcript

    return cues_to_transcript(_subtitle_cues(spark, sf_dir), gap_ms=1000)


def _q_wikitext_blocks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MediaWiki wikitext source, oracled end-to-end: each documents row
    renders into markup-heavy wikitext (sources/wikitext.make_wikitext —
    alternating h2/h3 headings, plain + piped links, bold/italic quote
    runs, {{cite}} templates, <ref> footnotes) and parses back through
    the Arrow-batched extractor; the oracle recomputes the expected
    plain-text blocks relationally from the raw tokens, so a parser that
    leaks template/ref text, mangles a link anchor, or drops emphasis
    content fails the hash."""
    _ship_package(spark)
    from pdf_to_epub_spark.sources.wikitext import (
        documents_as_wikitext,
        parse_wikitext_payloads,
    )

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return parse_wikitext_payloads(documents_as_wikitext(d)).select(
        "doc_id",
        F.col("block_id").cast("long").alias("block_id"),
        "block_type",
        "text",
    )


def _q_wikitext_links(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wiki link-graph extraction (wikitext.extract_wikitext_links): the
    (target, anchor) edge list in document order — plain links anchor on
    their target, piped links on their label."""
    _ship_package(spark)
    from pdf_to_epub_spark.sources.wikitext import (
        documents_as_wikitext,
        extract_wikitext_links,
    )

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return extract_wikitext_links(documents_as_wikitext(d)).select(
        "doc_id",
        F.col("link_id").cast("long").alias("link_id"),
        "target",
        "anchor",
    )


def _q_pdf_two_column_blocks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-column layout analysis, oracled end-to-end: documents render
    into journal-style two-column PDFs (lines flow down the left column
    then the right, blocks content-shuffled per page), and
    blocks_in_column_order must detect the column split from x spread
    and reconstruct the ORIGINAL linear flow — a naive (page, y, x)
    sort row-interleaves the columns and fails the hash."""
    _ship_package(spark)
    from pdf_to_epub_spark.sources.pdf import (
        blocks_in_column_order,
        documents_as_two_column_pdfs,
        parse_pdf_payloads,
    )

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", F.coalesce(F.col("text"), F.lit("")).alias("text")
    )
    blocks = blocks_in_column_order(
        parse_pdf_payloads(documents_as_two_column_pdfs(docs))
    )
    return blocks.select(
        "doc_id",
        F.col("block_id").cast("long").alias("block_id"),
        F.col("page").cast("long").alias("page"),
        F.col("column").cast("long").alias("column"),
        "block_type",
        "text",
    )


def _q_mbox_messages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mbox mailing-list source, oracled end-to-end: each documents row
    renders into a deterministic mboxo thread (sources/mbox.make_mbox —
    From_ separators, headers, quoted replies, signature blocks, and a
    body opener that forces the ``>From `` escape on every message) and
    parses back; quotes/signatures must strip, the escape must reverse,
    and the oracle recomputes the expected clean bodies relationally
    from the raw tokens."""
    _ship_package(spark)
    from pdf_to_epub_spark.sources.mbox import (
        documents_as_mbox,
        parse_mbox_payloads,
    )

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return parse_mbox_payloads(documents_as_mbox(d)).select(
        "doc_id",
        F.col("msg_id").cast("long").alias("msg_id"),
        "subject",
        F.col("n_quoted").cast("long").alias("n_quoted"),
        "body",
    )


def _q_dialogue_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adjacent-turn SFT shaping (dialogue.dialogue_pairs) over the
    parsed mbox threads: every reply becomes a (prompt, response) pair
    whose prompt is the previous ≤2 turns joined in thread order —
    multi-turn context windows, one bounded per-thread window frame."""
    _ship_package(spark)
    from pdf_to_epub_spark.operators.dialogue import dialogue_pairs
    from pdf_to_epub_spark.sources.mbox import (
        documents_as_mbox,
        parse_mbox_payloads,
    )

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    msgs = parse_mbox_payloads(documents_as_mbox(d))
    return dialogue_pairs(msgs, context_turns=2)


def _q_sedump_posts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stack-Exchange ``Posts.xml`` dump source, oracled end-to-end:
    each documents row renders into a deterministic Q&A dump
    (sources/sedump.make_sedump — one question + score-varied answers,
    bodies as HTML ``<p>`` paragraphs inside XML-escaped attributes, an
    escape-bait opener on every body) and parses back; both escape
    layers must reverse and the oracle recomputes every attribute
    relationally from the raw tokens."""
    _ship_package(spark)
    from pdf_to_epub_spark.sources.sedump import (
        documents_as_sedump,
        parse_sedump_payloads,
    )

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return parse_sedump_payloads(documents_as_sedump(d)).select(
        "doc_id",
        F.col("post_id").cast("long").alias("post_id"),
        F.col("post_type").cast("long").alias("post_type"),
        F.col("parent_id").cast("long").alias("parent_id"),
        F.col("accepted_id").cast("long").alias("accepted_id"),
        F.col("score").cast("long").alias("score"),
        "title",
        "body",
    )


def _q_qa_sft_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q&A SFT pairing (sedump.qa_best_answer_pairs) over the parsed
    dump: answers hash-join their question on (doc_id, parent_id), the
    best answer wins by (score desc, post_id asc) in one bounded
    per-question window, and the winner must equal the question's
    ``AcceptedAnswerId`` — the join+argmax shape of real dump SFT
    mining."""
    _ship_package(spark)
    from pdf_to_epub_spark.sources.sedump import (
        documents_as_sedump,
        parse_sedump_payloads,
        qa_best_answer_pairs,
    )

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return qa_best_answer_pairs(
        parse_sedump_payloads(documents_as_sedump(d))
    )


def _quasi_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared privacy fixture: documents with quasi-identifiers (lang,
    source, a 400-char length band) and doc_id as the sensitive
    attribute stand-in."""
    return _t(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        "source",
        (F.coalesce(F.col("n_chars"), F.lit(0)) / 400)
        .cast("long")
        .alias("band"),
    )


def _q_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity / l-diversity audit (privacy.k_anonymity_audit) over
    the (lang, source, band) quasi-identifier: one row per equivalence
    class with strict >= flags at k=5, l=3."""
    from pdf_to_epub_spark.operators.privacy import k_anonymity_audit

    return k_anonymity_audit(
        _quasi_docs(spark, sf_dir),
        ["lang", "source", "band"],
        "doc_id",
        k=5,
        l=3,
    )


def _q_quasi_suppression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cell suppression (privacy.suppress_small_classes): documents in
    sub-k equivalence classes get their quasi columns NULLed; per-doc
    output so the release table is directly checkable."""
    from pdf_to_epub_spark.operators.privacy import suppress_small_classes

    return suppress_small_classes(
        _quasi_docs(spark, sf_dir), ["lang", "source", "band"], k=5
    )


def _q_diversity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entropy + recursive (c,l)-diversity audit (privacy.diversity_audit)
    over (lang, band) equivalence classes with source as the sensitive
    attribute (l=3, c=2): the stronger Machanavajjhala variants that
    distinct-l misses — integer micro-nat entropy vs the ln(3) literal,
    sorted-count top-vs-tail integer test."""
    from pdf_to_epub_spark.operators.privacy import diversity_audit

    d = _t(spark, sf_dir, "documents").select(
        "lang",
        "source",
        (F.coalesce(F.col("n_chars"), F.lit(0)) / 400)
        .cast("long")
        .alias("band"),
    )
    return diversity_audit(d, ["lang", "band"], "source", l=3, c=2)


def _q_spearman_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank-correlation matrix (textstats.rank_correlations)
    over the same signal triple as signal_correlations — tie-averaged
    ranks via value-level counts + global_prefix_sums (no global
    window), doubled ranks keep everything exact-integer until the one
    final division; the constant column exercises the zero-variance
    NULL branch."""
    from pdf_to_epub_spark.operators import rank_correlations

    d = _t(spark, sf_dir, "documents").select(
        F.col("n_chars"),
        F.expr(
            "size(regexp_extract_all(lower(text), '[a-zà-öø-ÿ]+', 0))"
        ).alias("n_words"),
        F.lit(7).alias("n_const"),
    )
    return rank_correlations(d, signal_cols=("n_chars", "n_words", "n_const"))


def _q_mink_prob_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Min-K% Prob membership-inference audit (lm.mink_prob_scores,
    Shi et al. 2024) under the top-64 KN model: per doc the mean cost of
    its 20% least-probable bigrams — low means "no surprising tokens",
    the memorization/contamination tell.  Integer top-⌈n/5⌉-by-value
    sums; the only float is the final 6-dp mean."""
    from pdf_to_epub_spark.operators import mink_prob_scores, train_kn_bigram

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return mink_prob_scores(
        d, train_kn_bigram(d, vocab_size=64), vocab_size=64, k_pct=20
    )


def _q_t_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-closeness audit (privacy.t_closeness_audit) over the (lang,
    band) classes with source sensitive, t=0.2: exact-integer TVD
    numerator over the global domain, one 6-dp division, literal
    threshold — the deviation leak l-diversity can't see."""
    from pdf_to_epub_spark.operators.privacy import t_closeness_audit

    d = _t(spark, sf_dir, "documents").select(
        "lang",
        "source",
        (F.coalesce(F.col("n_chars"), F.lit(0)) / 400)
        .cast("long")
        .alias("band"),
    )
    return t_closeness_audit(d, ["lang", "band"], "source", t=0.2)


def _q_k_generalization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generalization ladder (privacy.generalize_to_k): coarsen the
    n_chars band (400·2^j, j ≤ 6) under (lang, source) until every
    class reaches k=5 — all rungs' class tables in ONE groupBy via a
    narrow width explode; rung audit + smallest satisfying width."""
    from pdf_to_epub_spark.operators.privacy import generalize_to_k

    d = _t(spark, sf_dir, "documents").select("lang", "source", "n_chars")
    return generalize_to_k(
        d, "n_chars", ["lang", "source"], k=5, base_width=400,
        max_doublings=6,
    )


def _q_anchor_query_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retriever weak supervision (ir.anchor_query_pairs): every doc
    links to its decade-leader doc with a deterministic anchor phrase;
    the operator joins (query, positive) and attaches the md5-bucketed
    negative — single-doc-bucket NULL semantics included."""
    from pdf_to_epub_spark.operators.ir import anchor_query_pairs

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    corpus = d.select(
        F.concat(F.lit("doc://"), F.col("doc_id").cast("string")).alias(
            "url"
        ),
        "text",
    )
    pos_id = F.col("doc_id") - (F.col("doc_id") % 10)
    anchors = d.select(
        F.concat(
            F.lit("topic "),
            (F.col("doc_id") % 17).cast("string"),
            F.lit(" guide "),
            (F.col("doc_id") % 4).cast("string"),
        ).alias("anchor"),
        F.concat(F.lit("doc://"), pos_id.cast("string")).alias("target"),
    )
    return anchor_query_pairs(anchors, corpus, buckets=16)


def _q_markdown_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Markdown structure signals (markdown.markdown_meta) over a
    deterministic Markdown wrapping of the documents table: YAML front
    matter (title/lang by doc_id), one fenced code block per doc
    (python/js/sql info string cycling), prose around it — pure
    codegen regexp algebra both in the fixture and the operator."""
    from pdf_to_epub_spark.operators.markdown import markdown_meta

    d = _t(spark, sf_dir, "documents").select(
        "doc_id", F.coalesce(F.col("text"), F.lit("")).alias("text")
    )
    toks = F.filter(
        F.split(F.col("text"), r"\s+"), lambda x: x != F.lit("")
    )
    lang = F.element_at(
        F.array(F.lit("en"), F.lit("de"), F.lit("fr")),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    fence_lang = F.element_at(
        F.array(F.lit("python"), F.lit("js"), F.lit("sql")),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    md = F.concat(
        F.lit("---\ntitle: Doc "),
        F.col("doc_id").cast("string"),
        F.lit("\nlang: "),
        lang,
        F.lit("\n---\n"),
        F.array_join(F.slice(toks, 1, 40), " "),
        F.lit("\n```"),
        fence_lang,
        F.lit("\ncode_line("),
        F.col("doc_id").cast("string"),
        F.lit(")\nx = "),
        (F.col("doc_id") % 9).cast("string"),
        F.lit("\n```\n"),
        F.array_join(
            F.slice(
                toks, 41, F.greatest(F.size(toks) - 40, F.lit(0))
            ),
            " ",
        ),
    )
    return markdown_meta(d.select("doc_id", md.alias("text")))


def _q_unidiff_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unified-diff ingestion (sources/unidiff): documents render as
    multi-file commit diffs and the RELATIONAL parser (line explode +
    cumulative +++ section numbering + prefix rollup) must recover the
    per-file add/del/context stats the oracle computes in closed form."""
    _ship_package(spark)
    from pdf_to_epub_spark.sources.unidiff import (
        documents_as_unidiffs,
        unidiff_file_stats,
    )

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return unidiff_file_stats(documents_as_unidiffs(d))


def _q_ipynb_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jupyter-notebook ingestion (sources/ipynb): documents render as
    nbformat-v4 JSON and the pure-Catalyst parser (from_json +
    posexplode(cells) — JVM Jackson, zero Python) must recover the
    per-cell type/line/char stats the oracle computes in closed form."""
    _ship_package(spark)
    from pdf_to_epub_spark.sources.ipynb import (
        documents_as_ipynb,
        ipynb_cell_stats,
    )

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return ipynb_cell_stats(documents_as_ipynb(d))


def _q_latex_sections(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LaTeX article ingestion (sources/latex): documents render as
    sectioned arXiv-style articles and the RELATIONAL parser (line
    explode + cumulative section count + running begin/end equation
    sums) must recover per-section title / equation / comment /
    citation / prose-line stats the oracle computes in closed form."""
    _ship_package(spark)
    from pdf_to_epub_spark.sources.latex import (
        documents_as_latex,
        latex_section_stats,
    )

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return latex_section_stats(documents_as_latex(d))


def _q_llr_keyness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dunning log-likelihood keyness (ir.llr_keyness) between the
    English half and the rest of the documents table: per-word G² with
    the 0·ln0 guard and a fixed pooled-expectation operation order the
    oracle replays term-for-term; enrichment direction decided by the
    exact decimal cross-product, never a float rate."""
    from pdf_to_epub_spark.operators import llr_keyness

    d = _t(spark, sf_dir, "documents").select("text", "lang")
    return llr_keyness(
        d.where(F.col("lang") == "en"),
        d.where(F.col("lang") != "en"),
        min_count=5,
    )


def _q_rank_sum_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U rank-sum test (evaluate.rank_sum_test) between
    residue-split halves of an integer score with a built-in +5 shift
    and heavy ties — average ranks and the tie-corrected variance are
    assembled from the DISTINCT-VALUE table only (exact decimal
    integers), so the oracle's closed-form window replay matches
    bit-for-bit."""
    from pdf_to_epub_spark.operators import rank_sum_test

    d = _t(spark, sf_dir, "documents").select("doc_id")
    i = F.col("doc_id")
    df = d.select(
        (i % 2).cast("string").alias("group"),
        ((i * 13) % 40 + F.lit(5) * (i % 2)).cast("long").alias("value"),
    )
    return rank_sum_test(df)


def _q_surt_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURT archive keys (urls.surt_key) over deterministically-built
    dirty URLs exercising every rule: mixed case, www/www2 stripping
    (and an 'm.' label that must NOT strip), ports, query sorting with
    empty-param drops, fragments, and empty paths."""
    from pdf_to_epub_spark.operators import surt_keys

    d = _t(spark, sf_dir, "documents").select("doc_id")
    i = F.col("doc_id")
    url = F.concat(
        F.lit("HTTP://"),
        F.when(i % 4 == 0, F.lit("WWW."))
        .when(i % 4 == 1, F.lit("www2."))
        .when(i % 4 == 2, F.lit("M."))
        .otherwise(F.lit("")),
        F.lit("News"),
        (i % 7).cast("string"),
        F.lit(".Example.COM"),
        F.when(i % 3 == 0, F.lit(":8080")).otherwise(F.lit("")),
        F.when(i % 2 == 0, F.concat(F.lit("/Path/"), i.cast("string")))
        .otherwise(F.lit("")),
        F.when(i % 5 == 0, F.lit("?b=2&a=1"))
        .when(i % 5 == 1, F.lit("?z=9&&a=1"))
        .otherwise(F.lit("")),
        F.when(i % 6 == 0, F.lit("#Frag")).otherwise(F.lit("")),
    )
    return surt_keys(d.select("doc_id", url.alias("url"))).select(
        "doc_id", "url", "surt"
    )


def _q_cdx_prefixes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDX-style capture counts per SURT prefix (urls.cdx_prefix_counts,
    depth 2 ≈ registrable domain): synthesized multi-subdomain URLs with
    deliberate path collisions so n_urls < n_captures on some prefixes;
    the oracle derives prefix and SURT in closed form from the same
    residues — an independent derivation, not a transform replay."""
    from pdf_to_epub_spark.operators import cdx_prefix_counts

    d = _t(spark, sf_dir, "documents").select("doc_id")
    i = F.col("doc_id")
    url = F.concat(
        F.lit("https://sub"),
        (i % 5).cast("string"),
        F.lit(".site"),
        (i % 11).cast("string"),
        F.lit(".com/p/"),
        (i % 20).cast("string"),
    )
    return cdx_prefix_counts(d.select(url.alias("url")), depth=2)


def _q_matryoshka_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka dimension-truncation audit (similarity.matryoshka_recall):
    recall@10 of prefix-truncated cosine retrieval (4/8/16 of 64 dims)
    against the full-dimension top-10, first 20 vectors as queries —
    the storage-tier pricing table for an MRL-style index.  Rank order
    relies on the engine-bit-identical sequential cosine the ann
    oracles pin."""
    from pdf_to_epub_spark.operators import matryoshka_recall

    e = _t(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    q = e.where("vec_id < 20").select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return matryoshka_recall(e, q, dims=[4, 8, 16], k=10)


def _q_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DPR-style hard-negative mining (ir.mine_hard_negatives): queries
    are each 7th document's first three tokens with the document itself
    as the positive; the miner must return the top BM25-confusable
    OTHER document.  Scores quantize to integer micro-units before the
    per-query sum (order-free), and the oracle replays the whole
    postings/df/avgdl algebra term-for-term."""
    from pdf_to_epub_spark.operators import mine_hard_negatives
    from pdf_to_epub_spark.operators.textstats import _tokens

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    pairs = d.where(F.col("doc_id") % 7 == 0).select(
        F.col("doc_id").alias("query_id"),
        F.concat_ws(" ", F.slice(_tokens("text"), 1, 3)).alias("query"),
        F.col("doc_id").alias("pos_id"),
    )
    return mine_hard_negatives(pairs, d, k_candidates=10, max_df=400)
