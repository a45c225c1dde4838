"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship extraction pipeline at sf0.001.
``queries()`` — one entry per implemented operator family from SURVEY.md §2
plus the training-data operators (dedup / similarity / text analysis).
``oracle_sql()`` — DuckDB-equivalent SQL for every SQL-expressible query;
non-relational extraction/LSH queries are rows-only by design.

Column names and float rounding are kept identical between each Spark query
and its oracle (the driver hashes values with columns sorted by name).
"""

from __future__ import annotations

import pathlib
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))

_SHIPPED: set[int] = set()


def _ship_package(spark: SparkSession) -> None:
    """Make ``pdf_to_epub_spark`` importable on executors regardless of the
    driver's cwd: zip the package once per SparkContext and addPyFile it
    (the same mechanism as ``spark-submit --py-files``)."""
    sc = spark.sparkContext
    if id(sc) in _SHIPPED:
        return
    import tempfile
    import zipfile

    pkg = pathlib.Path(__file__).resolve().parent / "pdf_to_epub_spark"
    tmp = tempfile.NamedTemporaryFile(
        prefix="pdf_to_epub_spark_", suffix=".zip", delete=False
    )
    with zipfile.ZipFile(tmp.name, "w") as z:
        for p in sorted(pkg.rglob("*.py")):
            z.write(p, f"pdf_to_epub_spark/{p.relative_to(pkg)}")
    sc.addPyFile(tmp.name)
    _SHIPPED.add(id(sc))

# sources/pdf.py layout constants, inlined into the pdf_extract_blocks
# oracle (import kept lazy there; these two are the whole contract)
_PDF_WPL = 8   # words per rendered line  (= sources.pdf.WORDS_PER_LINE)
_PDF_LPP = 6   # line blocks per page     (= sources.pdf.LINES_PER_PAGE)

_LANG_MARKER_SQL = {
    "en": "('the','and','of','to','a','in','is','was')",
    "fr": "('le','la','les','et','de','un','une','est')",
    "de": "('der','die','das','und','ist','ein','nicht')",
    "es": "('el','la','los','y','de','que','es')",
    "it": "('il','la','di','e','che','un','per')",
    "la": "('et','in','est','non','cum','ad','quod')",
}


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _docs_as_pages(docs: DataFrame) -> DataFrame:
    """Adapt the testdata documents table (doc_id, text, lang, …) to the
    engine's page-input shape (url, warc_ts, lang, text)."""
    return docs.select(
        F.concat(F.lit("doc://"), F.col("doc_id").cast("string")).alias("url"),
        F.to_timestamp(F.lit("2025-01-01 00:00:00")).alias("warc_ts"),
        F.col("lang"),
        F.col("text"),
    )


# --------------------------------------------------------------------------
# flagship
# --------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full extraction pipeline (stage1-3 → blocks → assembly)
    over sf0.001 documents; returns one structured row per document."""
    _ship_package(spark)
    from pdf_to_epub_spark.operators import (
        assemble_documents,
        blocks_table,
        extract_documents,
    )

    docs = _docs_as_pages(_t(spark, "/root/testdata/sf0.001", "documents"))
    extracted = extract_documents(docs)
    assembled = assemble_documents(blocks_table(extracted))
    return assembled.select(
        "url",
        "n_blocks",
        "n_chapters",
        F.concat_ws("|", "toc").alias("toc"),
        F.length("assembled_text").alias("n_chars"),
    )


# --------------------------------------------------------------------------
# queries — relational operator surface (SURVEY §2) with DuckDB oracles
# --------------------------------------------------------------------------

def _q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3/agg surface: grouped sums/averages with pushed-down date filter."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-01"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.count("*").alias("count_order"),
        )
    )


def _q_latest_order_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O2 top-1-per-group via window row_number."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_orderdate"), F.desc("o_orderkey")
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .where("rn = 1")
        .select(
            "o_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
        )
    )


def _q_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1/S2 resume surface: broadcast left_anti join."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return c.join(
        F.broadcast(o.select(F.col("o_custkey").alias("c_custkey")).distinct()),
        on="c_custkey",
        how="left_anti",
    ).select("c_custkey", "c_name")


def _q_building_segment_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2 semi-join filter + aggregation."""
    c = _t(spark, sf_dir, "customer").where("c_mktsegment = 'BUILDING'")
    o = _t(spark, sf_dir, "orders")
    return (
        o.join(F.broadcast(c.select("c_custkey")), o.o_custkey == F.col("c_custkey"), "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_orders"))
    )


def _q_ordered_lineitem_concat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S8/A1 reading-order reconstruction: ordered concat per key."""
    from pdf_to_epub_spark.operators import ordered_concat

    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", F.col("l_linenumber").cast("string").alias("ln")
    )
    return ordered_concat(li, "l_orderkey", "ln", "ln", out_col="lines", sep=",")


def _q_event_deltas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1-style neighbor window: value minus previous value per user."""
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        "event_id",
        F.round(F.col("value") - F.lag("value").over(w), 4).alias("delta"),
    )


def _q_error_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W3 sandwich test: isolated 'error' events (non-error neighbors)."""
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    lagv = F.lag("event_type").over(w)
    leadv = F.lead("event_type").over(w)
    return (
        e.select("event_id", "event_type", lagv.alias("prev"), leadv.alias("nxt"))
        .where(
            (F.col("event_type") == "error")
            & (F.coalesce(F.col("prev"), F.lit("_")) != "error")
            & (F.coalesce(F.col("nxt"), F.lit("_")) != "error")
        )
        .select("event_id")
    )


def _q_doc_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1/F2 rlike predicate classification, aggregated per lang."""
    d = _t(spark, sf_dir, "documents")
    cls = (
        F.when(F.col("text").rlike(r"\bspark\b"), F.lit("spark"))
        .when(F.col("text").rlike(r"\bjoin\b"), F.lit("join"))
        .otherwise(F.lit("other"))
    )
    return (
        d.select("lang", cls.alias("doc_class"))
        .groupBy("lang", "doc_class")
        .agg(F.count("*").alias("n_docs"))
    )


def _q_trim_leading_blanks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S9 leading-blank trim as column algebra (anchored regexp_replace)."""
    d = _t(spark, sf_dir, "documents")
    padded = F.concat(F.lit("   \n  "), F.col("text"))
    return d.select(
        "doc_id",
        F.length(F.regexp_replace(padded, r"^\s+", "")).cast("long").alias("trimmed_len"),
    )


def _q_top_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O1/O3 global sort + limit with deterministic tiebreak."""
    p = _t(spark, sf_dir, "part")
    return (
        p.orderBy(F.desc("p_retailprice"), F.asc("p_partkey"))
        .limit(10)
        .select("p_partkey", "p_name", F.round("p_retailprice", 2).alias("price"))
    )


# --------------------------------------------------------------------------
# queries — training-data operators with oracles
# --------------------------------------------------------------------------

def _q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup over a self-union (simulated re-crawl): every text is
    duplicated once; groups report size + kept id."""
    from pdf_to_epub_spark.operators import exact_duplicate_groups

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    recrawl = d.union(d.select(F.col("doc_id") + F.lit(1_000_000), "text"))
    return exact_duplicate_groups(recrawl)


def _q_dedup_exact_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-dedup REMOVAL: after drop_exact_duplicates on the self-union
    re-crawl, exactly one row (the minimum id) survives per distinct
    content."""
    from pdf_to_epub_spark.operators import drop_exact_duplicates

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    recrawl = d.union(d.select(F.col("doc_id") + F.lit(1_000_000), "text"))
    return drop_exact_duplicates(recrawl).select("doc_id")


def _q_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.expr("regexp_count(lower(text), '[a-zà-öø-ÿ]+')")
        .cast("long")
        .alias("n_words"),
    )


def _q_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full quality-feature surface through the actual operator: alpha /
    punctuation density, mean word length, stopword ratio — every column
    oracled in DuckDB."""
    from pdf_to_epub_spark.operators import quality_features

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return quality_features(d).select(
        "doc_id", "alpha_ratio", "punct_ratio", "mean_word_len", "stopword_ratio"
    )


def _q_lang_guess(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pdf_to_epub_spark.operators import guess_language

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return guess_language(d).select("doc_id", "lang_guess")


def _q_doc_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting (whole-text + rolling min-shingle identity)
    with the md5-based 60-bit hash so both fingerprints are reproducible in
    the DuckDB oracle; the scale path keeps the xxhash64 default."""
    from pdf_to_epub_spark.operators import document_fingerprint, md5_hash60

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return document_fingerprint(d, token_hash=md5_hash60).select(
        "doc_id", "fingerprint", "min_shingle_hash"
    )


def _q_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-10 for the first 5 vectors as queries."""
    from pdf_to_epub_spark.operators import brute_force_topk

    e = _t(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    q = e.where("vec_id < 5").select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return brute_force_topk(e, q, k=10).withColumn("rank", F.col("rank").cast("long"))


def _q_embedding_near_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact all-pairs cosine ≥ 0.4 (verification form; the LSH-bucketed
    scale path is the rows-only `embedding_near_dups_lsh`)."""
    from pdf_to_epub_spark.operators.similarity import cosine

    e = _t(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    a, b = e.alias("a"), e.alias("b")
    return (
        a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("id_a"),
            F.col("b.vec_id").alias("id_b"),
            F.round(cosine(F.col("a.embedding"), F.col("b.embedding")), 6).alias(
                "cosine"
            ),
        )
        .where(F.col("cosine") >= 0.4)
    )


# --------------------------------------------------------------------------
# queries — extraction / LSH surfaces (rows-only: not SQL-expressible)
# --------------------------------------------------------------------------

def _q_extract_blocks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The headline extraction contract, oracled: per url, the sha256 of
    the block texts concatenated in reading order must equal the
    REFERENCE-pipeline Step3 output hash (tests/golden/
    extraction_golden.parquet, produced by tests/make_extraction_goldens.py
    running /root/reference/text-processing/Step{1,2,3}_*.py on every doc),
    and the block spans must tile [0, n_chars) exactly (span_gap = 0,
    first_span = 0)."""
    _ship_package(spark)
    from pdf_to_epub_spark.operators import blocks_table, extract_documents

    docs = _docs_as_pages(_t(spark, sf_dir, "documents"))
    blocks = blocks_table(extract_documents(docs))
    ordered_text = F.concat_ws(
        "",
        F.transform(
            F.array_sort(F.collect_list(F.struct("block_id", "text"))),
            lambda b: b["text"],
        ),
    )
    return blocks.groupBy("url").agg(
        F.sha2(F.encode(ordered_text, "UTF-8"), 256).alias("text_sha"),
        F.max("span_end").alias("n_chars"),
        (
            F.sum(F.col("span_end") - F.col("span_start")) - F.max("span_end")
        ).alias("span_gap"),
        F.min("span_start").alias("first_span"),
    )


def _q_assemble_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocks → document assembly, oracled against the same reference
    goldens: sha256(assembled_text) per url must equal the reference Step3
    output hash — the north_rule's byte-identical-text contract as a green
    hash_match row, not only a pytest invariant."""
    _ship_package(spark)
    from pdf_to_epub_spark.operators import (
        assemble_documents,
        blocks_table,
        extract_documents,
    )

    docs = _docs_as_pages(_t(spark, sf_dir, "documents"))
    asm = assemble_documents(blocks_table(extract_documents(docs)))
    return asm.select(
        "url",
        F.sha2(F.encode("assembled_text", "UTF-8"), 256).alias("text_sha"),
        F.length("assembled_text").cast("long").alias("n_chars"),
    )


def _q_extraction_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whole-corpus pass-counter rollup, oracled against the summed
    reference ``--log`` JSONs (tests/golden/extraction_counters_golden
    .parquet).  Restricted to the step1./step2. keys the reference itself
    emits; the engine-side step3.* / blocks_emitted keys have no reference
    analog and are covered by the pytest metrics tests instead."""
    _ship_package(spark)
    from pdf_to_epub_spark.operators import corpus_counters, extract_documents

    docs = _docs_as_pages(_t(spark, sf_dir, "documents"))
    return corpus_counters(extract_documents(docs)).where(
        F.col("counter").rlike(r"^step[12]\.")
    )


def mutated_recrawl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents ∪ last-word-dropped copies (id + 1e6) — the shared
    near-duplicate test corpus for the minhash/simhash/ngram queries (each
    doc gains one high-similarity partner).

    The id-hash repartition is the same spread-before-CPU story as
    extract_documents(salt_partitions=…): the testdata table is ONE parquet
    split, so without it the shingle/signature/token narrow stages — the
    dominant cost of every dedup query — run on a single core regardless of
    cluster size (measured 2.6× on minhash at local[32]).  At 100 TB the
    scan has thousands of splits and a real pipeline would skip this; for a
    small-file corpus the one slim shuffle buys full parallelism."""
    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    mutated = d.select(
        (F.col("doc_id") + F.lit(1_000_000)).alias("doc_id"),
        F.regexp_replace(F.col("text"), r"\s+\S+\s*$", "").alias("text"),
    )
    return d.union(mutated).repartition(
        spark.sparkContext.defaultParallelism, "doc_id"
    )


def _html_escape_expr(col: F.Column) -> F.Column:
    """&/</> escape chain — the JVM twin of the Python escaping in
    sources/synth.make_boilerplate_page; shared by every synthetic-page
    construction so the rule exists in exactly one place."""
    return F.replace(
        F.replace(
            F.replace(col, F.lit("&"), F.lit("&amp;")),
            F.lit("<"), F.lit("&lt;"),
        ),
        F.lit(">"), F.lit("&gt;"),
    )


def _page_lines_expr() -> F.Column:
    """HTML-escaped non-blank lines of ``text`` as an array Column — the
    shared fragment of the paragraph-bearing page-construction twins (the
    escape chain and the NONBLANK_PATTERN blankness rule are load-bearing
    for query/oracle agreement)."""
    from pdf_to_epub_spark.sources.synth import NONBLANK_PATTERN

    return F.filter(
        F.split(_html_escape_expr(F.col("text")), "\n"),
        lambda x: x.rlike(NONBLANK_PATTERN),
    )


def _boilerplate_page_expr() -> F.Column:
    """The synthetic Common-Crawl-style page as a Column over (doc_id,
    text) — JVM-side twin of sources/synth.make_boilerplate_page, shared
    by the extraction and extraction-eval queries."""
    from pdf_to_epub_spark.sources.synth import _AD, _ASIDE, _NAV

    doc_id = F.col("doc_id").cast("string")
    url = F.concat(F.lit("doc://"), doc_id)
    lines = _page_lines_expr()
    paras = F.concat_ws(
        "",
        F.transform(
            lines,
            lambda x, i: F.concat(
                F.lit("<p>"), x, F.lit("</p>"),
                F.when(i % 4 == 2, F.lit(_AD)).otherwise(F.lit("")),
            ),
        ),
    )
    return F.concat(
        F.lit("<html><head><title>"), url,
        F.lit("</title></head><body>" + _NAV + "<header><p>Crawl header "),
        doc_id,
        F.lit("</p></header><h1>Document "), doc_id, F.lit("</h1>"),
        paras,
        F.lit(_ASIDE + "<footer><p>(c) 2025 crawl.invalid "), doc_id,
        F.lit("</p></footer></body></html>"),
    )


def _q_html_boilerplate_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HTML main-content extraction (north_star's Boilerpipe-style DOM
    surface): each document's non-blank lines are wrapped JVM-side into a
    realistic page — nav/header/footer/aside boilerplate plus interleaved
    link-dense ad divs (exact twin of sources/synth.make_boilerplate_page)
    — then parsed back through the tag-aware link-density classifier
    (extractlib/htmlblocks.py).  Recovered main content must be exactly
    heading 'Document <id>' + the non-blank lines, which the DuckDB oracle
    computes directly from the documents table."""
    _ship_package(spark)
    from pdf_to_epub_spark.operators import (
        assemble_documents,
        blocks_table,
        extract_html_documents,
    )

    d = _t(spark, sf_dir, "documents")
    doc_id = F.col("doc_id").cast("string")
    url = F.concat(F.lit("doc://"), doc_id)
    page = _boilerplate_page_expr()
    pages = d.select(
        url.alias("url"),
        F.to_timestamp(F.lit("2025-01-01 00:00:00")).alias("warc_ts"),
        F.col("lang"),
        F.encode(page, "UTF-8").alias("html"),
    )
    asm = assemble_documents(blocks_table(extract_html_documents(pages)))
    return asm.select(
        "url",
        F.sha2(F.encode("assembled_text", "UTF-8"), 256).alias("text_sha"),
        F.length("assembled_text").cast("long").alias("n_chars"),
        F.col("n_chapters").cast("long").alias("n_headings"),
        (F.col("n_blocks") - F.col("n_chapters")).cast("long").alias("n_paragraphs"),
    )


def _q_readability_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Readability-style top-candidate extraction (the THIRD extractor
    mode, extractlib/htmlblocks.readability_blocks): same synthetic
    boilerplate page, scored by arc90's comma/length points with
    integer cross-multiplied link-density scaling — the body container
    wins, ads are cleaned (cleanConditionally), nav/header/footer are
    prior-stripped, so recovered content must again equal heading +
    non-blank lines; docs with NO ≥25-char prose line extract empty
    (no candidate scores), which the oracle encodes explicitly."""
    _ship_package(spark)
    from pdf_to_epub_spark.operators import (
        assemble_documents,
        blocks_table,
        extract_html_documents,
    )

    d = _t(spark, sf_dir, "documents")
    doc_id = F.col("doc_id").cast("string")
    url = F.concat(F.lit("doc://"), doc_id)
    page = _boilerplate_page_expr()
    pages = d.select(
        url.alias("url"),
        F.to_timestamp(F.lit("2025-01-01 00:00:00")).alias("warc_ts"),
        F.col("lang"),
        F.encode(page, "UTF-8").alias("html"),
    )
    asm = assemble_documents(
        blocks_table(extract_html_documents(pages, mode="readability"))
    )
    return asm.select(
        "url",
        F.sha2(F.encode("assembled_text", "UTF-8"), 256).alias("text_sha"),
        F.length("assembled_text").cast("long").alias("n_chars"),
        F.col("n_chapters").cast("long").alias("n_headings"),
        (F.col("n_blocks") - F.col("n_chapters")).cast("long").alias(
            "n_paragraphs"
        ),
    )


def _q_image_caption_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image segmentation + (image, caption) manifest (the north_star's
    heading/paragraph/IMAGE leg): each document is wrapped JVM-side into
    a page carrying a nav logo image (chrome), one content figure after
    every 3rd non-blank line (src and alt are pure functions of
    (doc_id, figure index)), and a protocol-relative footer badge —
    then parsed back through the tag-stack image classifier
    (extractlib/htmlblocks.parse_image_refs) and resolved with the shared
    crawler href resolution.  The DuckDB oracle regenerates every
    expected row directly from the documents table: n non-blank lines →
    a boilerplate logo at seq 0, ⌊n/3⌋ content figures, and a
    boilerplate badge at seq 1+⌊n/3⌋ with the scheme inherited from the
    page origin."""
    _ship_package(spark)
    from pdf_to_epub_spark.operators import extract_image_refs
    from pdf_to_epub_spark.operators.urls import _resolve_href

    d = _t(spark, sf_dir, "documents")
    doc_id = F.col("doc_id").cast("string")
    url = F.concat(F.lit("http://crawl.invalid/doc/"), doc_id)
    lines = _page_lines_expr()
    fig = lambda i: F.floor(i / 3).cast("int").cast("string")  # noqa: E731
    paras = F.concat_ws(
        "",
        F.transform(
            lines,
            lambda x, i: F.concat(
                F.lit("<p>"), x, F.lit("</p>"),
                F.when(
                    i % 3 == 2,
                    F.concat(
                        F.lit('<img src="/img/'), doc_id, F.lit("/"),
                        fig(i), F.lit('.jpg" alt="Figure '), fig(i),
                        F.lit(" of document "), doc_id, F.lit('">'),
                    ),
                ).otherwise(F.lit("")),
            ),
        ),
    )
    page = F.concat(
        F.lit("<html><head><title>"), url,
        F.lit(
            '</title></head><body><nav><a href="/">Home</a> '
            '<img src="/logo.png" alt="site logo"></nav><h1>Document '
        ),
        doc_id, F.lit("</h1>"),
        paras,
        F.lit(
            '<footer><img src="//cdn.crawl.invalid/badge.png" alt="">'
            "<p>(c) 2025 crawl.invalid "
        ),
        doc_id, F.lit("</p></footer></body></html>"),
    )
    pages = d.select(url.alias("url"), F.encode(page, "UTF-8").alias("html"))
    refs = extract_image_refs(pages)
    return refs.select(
        "url",
        F.col("seq").cast("long").alias("seq"),
        "src",
        F.col("alt").alias("caption"),
        "boilerplate",
        _resolve_href(F.col("src"), F.col("url")).alias("img_url"),
    )


def _q_minhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup candidates over a mutated re-crawl (each doc
    duplicated with its last word dropped → high-Jaccard pair)."""
    from pdf_to_epub_spark.operators import minhash_candidate_pairs

    return minhash_candidate_pairs(
        mutated_recrawl(spark, sf_dir),
        k=3, num_hashes=32, bands=8, jaccard_threshold=0.7,
    ).select("id_a", "id_b", F.round("jaccard", 4).alias("jaccard"))


def _q_warc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WARC source round-trip (sources/warc.py), fully distributed and
    disk-free: docs grouped 8 ways -> applyInPandas serializes each group
    as a per-record-gzip WARC file (the Common Crawl layout) -> the Arrow
    parser reads the records back.  The oracle reconstructs every field
    from documents (url/date are pure functions of doc_id; payload md5 and
    byte length replay in SQL), so the parser+writer pair is exactly
    hash-checked."""
    import pandas as pd

    from pdf_to_epub_spark.sources.warc import build_warc_bytes, parse_warc_contents

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        import datetime as dt

        pdf = pdf.sort_values("doc_id")
        epoch = dt.datetime(2024, 1, 1)
        recs = [
            (
                f"http://corpus.example/doc/{i}",
                # real datetime arithmetic: rolls over days exactly like
                # the oracle's TIMESTAMP + INTERVAL for doc_id >= 86400
                (epoch + dt.timedelta(seconds=int(i))).strftime(
                    "%Y-%m-%dT%H:%M:%SZ"
                ),
                ("<html><body>" + t + "</body></html>").encode("utf-8"),
            )
            for i, t in zip(pdf["doc_id"], pdf["text"])
        ]
        return pd.DataFrame(
            {"content": [build_warc_bytes(recs, gzip_members=True)]}
        )

    files = (
        d.withColumn("g", F.pmod("doc_id", F.lit(8)))
        .groupBy("g")
        .applyInPandas(build, "content binary")
    )
    return parse_warc_contents(files).select(
        "url",
        "warc_date",
        F.md5("html").alias("html_md5"),
        F.length("html").cast("long").alias("n_bytes"),
    )


def _q_tfrecord_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TFRecord source round-trip (sources/tfrecord.py), disk-free like
    warc_roundtrip: docs grouped 8 ways -> applyInPandas serializes each
    group as one TFRecord shard (hand-encoded tf.train.Example protos +
    masked-CRC32C framing, pure stdlib) -> the Arrow parser reads the
    records back with CRC verification ON.  The float feature passes
    through the format's float32 — doc_id/4 is exactly representable in
    f32, so the oracle's REAL cast replays the precision loss exactly
    and the whole writer+parser pair is hash-checked."""
    import pandas as pd

    from pdf_to_epub_spark.sources.tfrecord import (
        build_tfrecord_bytes,
        encode_example,
        parse_tfrecord_contents,
    )

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id")
        exs = [
            encode_example(
                {
                    "url": f"tfr://doc/{i}".encode("ascii"),
                    "text": (t or "").encode("utf-8"),
                    "n_chars": [len(t or "")],
                    "score": [i / 4.0],
                }
            )
            for i, t in zip(pdf["doc_id"], pdf["text"])
        ]
        return pd.DataFrame({"content": [build_tfrecord_bytes(exs)]})

    files = (
        d.withColumn("g", F.pmod("doc_id", F.lit(8)))
        .groupBy("g")
        .applyInPandas(build, "content binary")
    )
    parsed = parse_tfrecord_contents(
        files,
        bytes_cols=("url", "text"),
        int_cols=("n_chars",),
        float_cols=("score",),
    )
    return parsed.select(
        "url",
        F.md5(F.col("text").cast("binary")).alias("text_md5"),
        F.element_at("n_chars", 1).alias("n_chars"),
        F.element_at("score", 1).alias("score_f32"),
    )


def _synth_frags() -> list[str]:
    """The ONE shared 7-fragment pool (~800 ASCII bytes each) behind the
    cdc / snapshot-delta / dict-compression fixtures — they are
    documented as sharing bytes (cross-class chunk dedup depends on it),
    so the builder must not fork."""
    import hashlib as _hl

    return [
        "".join(
            _hl.md5(f"frag{f}:{j}".encode("ascii")).hexdigest()
            for j in range(25)
        )
        for f in range(7)
    ]


def _cdc_class_texts() -> list[str]:
    """13 deterministic residue-class documents built from a shared pool
    of 7 fragments (~800 ASCII bytes each) so content-defined chunks
    dedup ACROSS classes — the property the query measures."""
    frags = _synth_frags()
    return [
        " ".join(frags[(r + 2 * k) % 7] for k in range(5)) for r in range(13)
    ]


def _q_cdc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined chunking dedup (operators/cdc.py): every doc gets
    one of 13 fragment-composed texts; the gear-hash chunker (numpy
    vector form) splits them and the corpus chunk store is one groupBy
    on chunk_hash.  The oracle replays chunking with the INDEPENDENT
    pure-Python reference loop (`cdc_boundaries`) per class and scales
    occurrence counts by per-class doc counts — engine path and oracle
    path share only the GEAR table spec."""
    from pdf_to_epub_spark.operators.cdc import cdc_chunks, chunk_dedup_table

    texts = _cdc_class_texts()
    d = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.element_at(
            F.array(*[F.lit(t) for t in texts]), (F.col("doc_id") % 13 + 1).cast("int")
        ).alias("text"),
    )
    return chunk_dedup_table(cdc_chunks(d)).select(
        "chunk_hash", "chunk_bytes", "n_copies"
    )


def _cdc_oracle() -> str:
    """Golden VALUES: per-class chunk (hash, bytes, occurrences) from the
    pure reference chunker, scaled by per-class doc counts in SQL."""
    import collections
    import hashlib as _hl

    from pdf_to_epub_spark.operators.cdc import chunk_bytes

    vals = []
    for r, t in enumerate(_cdc_class_texts()):
        occ: collections.Counter = collections.Counter()
        sizes: dict[str, int] = {}
        for piece in chunk_bytes(t.encode("ascii")):
            h = _hl.md5(piece).hexdigest()
            occ[h] += 1
            sizes[h] = len(piece)
        for h, c in sorted(occ.items()):
            vals.append(f"({r}, '{h}', {sizes[h]}, {c})")
    rows = ",\n            ".join(vals)
    return f"""
        WITH golden(r, chunk_hash, chunk_bytes, occ) AS (VALUES
            {rows}),
        cls AS (
            SELECT doc_id % 13 AS r, count(*)::BIGINT AS n
            FROM documents GROUP BY 1
        )
        SELECT g.chunk_hash,
               min(g.chunk_bytes) AS chunk_bytes,
               SUM(g.occ * cls.n)::BIGINT AS n_copies
        FROM golden g JOIN cls USING (r)
        GROUP BY g.chunk_hash
    """


def _delta_class_pairs() -> list[tuple[str, str]]:
    """13 deterministic (old, new) snapshot texts: 5 fragment lines, the
    new side edited by residue (unchanged / insert / delete / replace)."""
    frags = _synth_frags()
    pairs = []
    for r in range(13):
        lines = [frags[(r + 2 * k) % 7] for k in range(5)]
        old = "\n".join(lines)
        nl = list(lines)
        if r % 4 == 1:
            nl.insert(2, f"INSERTED LINE {r}")
        elif r % 4 == 2:
            del nl[0]
        elif r % 4 == 3:
            nl[2] = f"REPLACED LINE {r}"
        pairs.append((old, "\n".join(nl)))
    return pairs


def _q_snapshot_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recrawl delta storage (operators/delta.py): old/new snapshots per
    doc from 13 deterministic (old, new) class pairs, docs dropped from
    new (doc_id%17==0 -> deleted) or absent from old (doc_id%19==3 ->
    added).  The query runs delta_encode AND delta_apply and emits the
    reconstruction md5 — the oracle asserts rt_md5 == new_md5 from the
    pure-Python patch replay, so encode+apply roundtrip is hash-gated."""
    from pdf_to_epub_spark.operators.delta import delta_apply, delta_encode

    pairs = _delta_class_pairs()
    d = _t(spark, sf_dir, "documents").select("doc_id")
    r1 = (F.col("doc_id") % 13 + 1).cast("int")
    olds = F.element_at(F.array(*[F.lit(o) for o, _ in pairs]), r1)
    news = F.element_at(F.array(*[F.lit(n) for _, n in pairs]), r1)
    old_df = d.filter(F.col("doc_id") % 19 != 3).select(
        "doc_id", olds.alias("text")
    )
    new_df = d.filter(F.col("doc_id") % 17 != 0).select(
        "doc_id", news.alias("text")
    )
    deltas = delta_encode(old_df, new_df)
    rebuilt = delta_apply(old_df, deltas).select(
        "doc_id", F.md5(F.col("text").cast("binary")).alias("rt_md5")
    )
    return deltas.join(rebuilt, "doc_id", "left").select(
        "doc_id",
        "status",
        "old_md5",
        "new_md5",
        "patch_bytes",
        "full_bytes",
        "rt_md5",
    )


def _snapshot_delta_oracle() -> str:
    """Golden VALUES per residue class: md5s and patch sizes from the
    pure-Python serialize_patch replay; statuses derive from doc_id mods
    in SQL; rt_md5 is asserted equal to new_md5 (byte-exact rebuild)."""
    import hashlib as _hl

    from pdf_to_epub_spark.operators.delta import serialize_patch

    vals = []
    for r, (old, new) in enumerate(_delta_class_pairs()):
        omd5 = _hl.md5(old.encode()).hexdigest()
        nmd5 = _hl.md5(new.encode()).hexdigest()
        changed = old != new
        pb = len(serialize_patch(old, new).encode()) if changed else "NULL"
        apb = len(serialize_patch("", new).encode())
        fb = len(new.encode())
        vals.append(
            f"({r}, '{omd5}', '{nmd5}', {str(changed).upper()}, {pb}, {apb}, {fb})"
        )
    rows = ",\n            ".join(vals)
    return f"""
        WITH golden(r, old_md5, new_md5, changed, patch_bytes,
                    add_patch_bytes, full_bytes) AS (VALUES
            {rows}),
        d AS (
            SELECT doc_id, doc_id % 13 AS r,
                   doc_id % 17 = 0 AS is_del, doc_id % 19 = 3 AS is_add
            FROM documents
            WHERE NOT (doc_id % 17 = 0 AND doc_id % 19 = 3)
        )
        SELECT d.doc_id,
               CASE WHEN is_del THEN 'deleted' WHEN is_add THEN 'added'
                    WHEN g.changed THEN 'changed'
                    ELSE 'unchanged' END AS status,
               CASE WHEN is_add THEN NULL ELSE g.old_md5 END AS old_md5,
               CASE WHEN is_del THEN NULL ELSE g.new_md5 END AS new_md5,
               (CASE WHEN is_del THEN NULL
                     WHEN is_add THEN g.add_patch_bytes
                     WHEN g.changed THEN g.patch_bytes
                     ELSE NULL END)::INTEGER AS patch_bytes,
               (CASE WHEN is_del THEN NULL
                     ELSE g.full_bytes END)::INTEGER AS full_bytes,
               CASE WHEN is_del THEN NULL ELSE g.new_md5 END AS rt_md5
        FROM d JOIN golden g USING (r)
    """


_LANG_SPAN_SENTS = {
    "en": "the cat and the dog was in the house.",
    "fr": "le chat et la fille est une belle personne.",
    "de": "der hund und die katze ist ein gutes tier.",
    "es": "el perro y la casa es de los amigos.",
}


def _lang_spans_layout(r: int) -> list[tuple[str, int]]:
    """Deterministic code-switching layout for residue class r: four
    segments (en, fr, de-or-es, en) with residue-varied run lengths."""
    return [
        ("en", 1 + r % 2),
        ("fr", 1 + (r // 2) % 2),
        ("de" if r % 3 == 0 else "es", 1),
        ("en", 2),
    ]


def _lang_spans_text(r: int) -> str:
    return " ".join(
        _LANG_SPAN_SENTS[lang]
        for lang, n in _lang_spans_layout(r)
        for _ in range(n)
    )


def _q_lang_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Code-switching segmentation (textstats.lang_spans): docs carry one
    of 13 deterministic multilingual layouts; the operator sentence-
    splits, votes per-sentence language, and compresses runs into spans.
    The oracle replays split+vote+runs in independent pure Python
    (golden-VALUES; only the marker table is shared, by design)."""
    from pdf_to_epub_spark.operators import lang_spans

    d = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.element_at(
            F.array(*[F.lit(_lang_spans_text(r)) for r in range(13)]),
            (F.col("doc_id") % 13 + 1).cast("int"),
        ).alias("text"),
    )
    return lang_spans(d)


def _lang_spans_oracle() -> str:
    """Independent replay: re-based tokenizer + marker vote + run
    compression per residue class, inlined as VALUES."""
    import re as _re

    from pdf_to_epub_spark.operators.textstats import LANG_MARKERS

    def guess(sent: str) -> str:
        toks = _re.findall("[a-zà-öø-ÿ]+", sent.lower())
        scores = {
            lang: sum(t in set(m) for t in toks)
            for lang, m in LANG_MARKERS.items()
        }
        return sorted(scores, key=lambda l: (-scores[l], l))[0]

    vals = []
    for r in range(13):
        text = _lang_spans_text(r)
        sents = [
            x.strip(" ")
            for x in _re.findall(r"[^.!?]+[.!?]*", text)
            if x.strip(" ") != ""
        ]
        langs = [guess(s) for s in sents]
        span_idx = -1
        spans: list[list] = []
        for i, (s, lg) in enumerate(zip(sents, langs)):
            if span_idx < 0 or spans[-1][0] != lg:
                span_idx += 1
                spans.append([lg, 0, 0, i, i])
            spans[-1][1] += 1
            spans[-1][2] += len(s)
            spans[-1][4] = i
        for si, (lg, ns, nc, a, b) in enumerate(spans):
            vals.append(f"({r}, {si}, '{lg}', {ns}, {nc}, {a}, {b})")
    rows = ",\n            ".join(vals)
    return f"""
        WITH golden(r, span_idx, lang, n_sentences, n_chars,
                    start_idx, end_idx) AS (VALUES
            {rows})
        SELECT d.doc_id, g.span_idx, g.lang,
               g.n_sentences::INTEGER AS n_sentences,
               g.n_chars::BIGINT AS n_chars,
               g.start_idx::INTEGER AS start_idx,
               g.end_idx::INTEGER AS end_idx
        FROM documents d JOIN golden g ON d.doc_id % 13 = g.r
    """


def _q_nb_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train-your-own quality classifier (classify.nb_train_scores):
    multinomial NB trained ON-CLUSTER from the doc_id%3==0 subset
    (label = even doc_id), then zero-shuffle HOF scoring of every doc
    with integer micro-nat costs.  The oracle replays training AND
    scoring entirely in SQL — counts, Laplace smoothing, ln costs,
    priors, argmin — over the same parquet."""
    from pdf_to_epub_spark.operators.classify import nb_train_scores

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    labels = d.filter(F.col("doc_id") % 3 == 0).select(
        "doc_id", (F.col("doc_id") % 2 == 0).alias("label")
    )
    return nb_train_scores(d, labels)


def _q_classifier_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Held-out evaluation of the trained NB (evaluate.
    binary_classifier_eval): train on doc_id%3==0, evaluate on the
    %3==1 docs against parity truth — confusion counts plus EXACT
    tie-aware AUC via the integer Mann-Whitney statistic.  The oracle
    composes the shared relational NB replay with the same eval
    aggregation in SQL."""
    from pdf_to_epub_spark.operators.classify import nb_train_scores
    from pdf_to_epub_spark.operators.evaluate import binary_classifier_eval

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    labels = d.filter(F.col("doc_id") % 3 == 0).select(
        "doc_id", (F.col("doc_id") % 2 == 0).alias("label")
    )
    scored = nb_train_scores(d, labels)
    ev = scored.filter(F.col("doc_id") % 3 == 1).select(
        "margin_micro", (F.col("doc_id") % 2 == 0).alias("truth")
    )
    return binary_classifier_eval(ev)


def _q_embedding_covariance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed covariance of the embeddings table (similarity.
    embedding_covariance): one Arrow pass accumulates integer-nano
    first/second moments (order-independent sums, dim^2-bounded output),
    the final formula runs on exact integers — the PCA primitive whose
    eigen step (pca_top_component) is then driver-side constant cost.
    The oracle mirrors the per-product nano rounding via a vec_id
    self-join in SQL."""
    from pdf_to_epub_spark.operators.similarity import embedding_covariance

    e = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    return embedding_covariance(e)


def _q_cdc_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O(batch) chunk-store maintenance (cdc.cdc_incremental): the
    snapshot_delta class pairs drive a recrawl — changed docs (class
    edit), added (%19==3), deleted (%17==0) — and the query emits the
    per-chunk refcount delta.  The oracle replays per-class old/new
    chunk multisets with the pure reference chunker and weights them by
    each doc's status in SQL."""
    from pdf_to_epub_spark.operators.cdc import cdc_chunks, cdc_incremental

    pairs = _delta_class_pairs()
    d = _t(spark, sf_dir, "documents").select("doc_id")
    r1 = (F.col("doc_id") % 13 + 1).cast("int")
    olds = F.element_at(F.array(*[F.lit(o) for o, _ in pairs]), r1)
    news = F.element_at(F.array(*[F.lit(n) for _, n in pairs]), r1)
    is_del = F.col("doc_id") % 17 == 0
    is_add = F.col("doc_id") % 19 == 3
    changed_r = F.col("doc_id") % 13 % 4 != 0
    old_df = d.filter(~is_add).select("doc_id", olds.alias("text"))
    old_chunks = cdc_chunks(old_df)
    batch = d.filter(~is_del & (is_add | changed_r)).select(
        "doc_id", news.alias("text")
    )
    deleted = d.filter(is_del & ~is_add).select("doc_id")
    return cdc_incremental(old_chunks, batch, deleted)


def _cdc_incremental_oracle() -> str:
    """Golden VALUES: per class the old/new chunk occurrence counts from
    the pure chunker; per-doc status weights them in SQL."""
    import collections
    import hashlib as _hl

    from pdf_to_epub_spark.operators.cdc import chunk_bytes

    vals = []
    for r, (old, new) in enumerate(_delta_class_pairs()):
        occ_old: collections.Counter = collections.Counter()
        occ_new: collections.Counter = collections.Counter()
        sizes: dict[str, int] = {}
        for piece in chunk_bytes(old.encode("ascii")):
            h = _hl.md5(piece).hexdigest()
            occ_old[h] += 1
            sizes[h] = len(piece)
        for piece in chunk_bytes(new.encode("ascii")):
            h = _hl.md5(piece).hexdigest()
            occ_new[h] += 1
            sizes[h] = len(piece)
        changed = "TRUE" if old != new else "FALSE"
        for h in sorted(set(occ_old) | set(occ_new)):
            vals.append(
                f"({r}, '{h}', {sizes[h]}, {occ_old[h]}, {occ_new[h]}, {changed})"
            )
    rows = ",\n            ".join(vals)
    return f"""
        WITH golden(r, chunk_hash, chunk_bytes, occ_old, occ_new,
                    changed) AS (VALUES
            {rows}),
        d AS (
            SELECT doc_id, doc_id % 13 AS r,
                   doc_id % 17 = 0 AS is_del, doc_id % 19 = 3 AS is_add
            FROM documents
            WHERE NOT (doc_id % 17 = 0 AND doc_id % 19 = 3)
        )
        SELECT g.chunk_hash,
               min(g.chunk_bytes) AS chunk_bytes,
               SUM(CASE WHEN d.is_del THEN -g.occ_old
                        WHEN d.is_add THEN g.occ_new
                        WHEN g.changed THEN g.occ_new - g.occ_old
                        ELSE 0 END)::BIGINT AS ref_delta
        FROM d JOIN golden g USING (r)
        GROUP BY g.chunk_hash
        HAVING SUM(CASE WHEN d.is_del THEN -g.occ_old
                        WHEN d.is_add THEN g.occ_new
                        WHEN g.changed THEN g.occ_new - g.occ_old
                        ELSE 0 END) <> 0
    """


def _delta_chain_texts() -> list[tuple[str, str, str]]:
    """Three-generation snapshot texts per residue class: the
    _delta_class_pairs (old, new) plus a third generation appending a
    class-stamped line (and dropping line 0 when r%5==0)."""
    out = []
    for r, (s1, s2) in enumerate(_delta_class_pairs()):
        lines = s2.split("\n")
        if r % 5 == 0 and len(lines) > 1:
            lines = lines[1:]
        lines.append(f"GENERATION THREE {r}")
        out.append((s1, s2, "\n".join(lines)))
    return out


def _q_delta_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot-chain storage (operators/delta.py composed): three
    generations per doc, stored as base + two patch layers; the query
    reconstructs generation 3 by applying the chain and reports the
    storage ledger.  The oracle replays serialize/apply per class in
    pure Python and asserts rt_md5 == the generation-3 md5."""
    from pdf_to_epub_spark.operators.delta import delta_apply, delta_encode

    texts = _delta_chain_texts()
    d = _t(spark, sf_dir, "documents").select("doc_id")
    r1 = (F.col("doc_id") % 13 + 1).cast("int")

    def snap(k: int) -> DataFrame:
        return d.select(
            "doc_id",
            F.element_at(
                F.array(*[F.lit(t[k]) for t in texts]), r1
            ).alias("text"),
        )

    s1, s2, s3 = snap(0), snap(1), snap(2)
    d12 = delta_encode(s1, s2)
    d23 = delta_encode(s2, s3)
    rebuilt = delta_apply(delta_apply(s1, d12), d23)
    pb = lambda dd, name: dd.select(  # noqa: E731
        "doc_id", F.coalesce("patch_bytes", F.lit(0)).alias(name)
    )
    return (
        rebuilt.select(
            "doc_id", F.md5(F.col("text").cast("binary")).alias("rt_md5")
        )
        .join(pb(d12, "pb1"), "doc_id")
        .join(pb(d23, "pb2"), "doc_id")
        .join(
            s1.select(
                "doc_id",
                F.length(F.col("text").cast("binary")).alias("base_bytes"),
            ),
            "doc_id",
        )
        .select(
            "doc_id",
            "rt_md5",
            (F.col("base_bytes") + F.col("pb1") + F.col("pb2"))
            .cast("long")
            .alias("stored_bytes"),
        )
    )


def _delta_chain_oracle() -> str:
    """Golden VALUES per class: generation-3 md5 (asserting byte-exact
    chain reconstruction) and the patch-ledger byte total."""
    import hashlib as _hl

    from pdf_to_epub_spark.operators.delta import apply_patch, serialize_patch

    vals = []
    for r, (s1, s2, s3) in enumerate(_delta_chain_texts()):
        p12 = serialize_patch(s1, s2)
        p23 = serialize_patch(s2, s3)
        assert apply_patch(apply_patch(s1, p12), p23) == s3
        pb1 = len(p12.encode()) if s1 != s2 else 0
        pb2 = len(p23.encode()) if s2 != s3 else 0
        stored = len(s1.encode()) + pb1 + pb2
        vals.append(f"({r}, '{_hl.md5(s3.encode()).hexdigest()}', {stored})")
    rows = ",\n            ".join(vals)
    return f"""
        WITH golden(r, rt_md5, stored_bytes) AS (VALUES
            {rows})
        SELECT d.doc_id, g.rt_md5, g.stored_bytes::BIGINT AS stored_bytes
        FROM documents d JOIN golden g ON d.doc_id % 13 = g.r
    """


def _dict_compression_inputs() -> list[tuple[str, str]]:
    """(text, zdict) per residue class: the cdc fragment compositions as
    page text, the class's lead fragment as the site dictionary."""
    frags = _synth_frags()
    texts = _cdc_class_texts()
    return [(texts[r], frags[r % 7]) for r in range(13)]


def _q_dict_compression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared-dictionary storage win (textstats.dict_compression_ratio):
    each doc carries its class text plus the class's template fragment
    as the zlib preset dictionary; the golden oracle replays both
    compressions with the same stdlib zlib per class."""
    from pdf_to_epub_spark.operators.textstats import dict_compression_ratio

    pairs = _dict_compression_inputs()
    d = _t(spark, sf_dir, "documents").select("doc_id")
    r1 = (F.col("doc_id") % 13 + 1).cast("int")
    df = d.select(
        "doc_id",
        F.element_at(F.array(*[F.lit(t) for t, _ in pairs]), r1).alias("text"),
        F.element_at(F.array(*[F.lit(z) for _, z in pairs]), r1).alias(
            "zdict"
        ),
    )
    return dict_compression_ratio(df).select(
        "doc_id", "ratio_plain", "ratio_dict", "dict_gain"
    )


def _dict_compression_oracle() -> str:
    """Golden VALUES: per-class plain/dict ratios from the same zlib."""
    import zlib as _zlib

    vals = []
    for r, (t, z) in enumerate(_dict_compression_inputs()):
        raw = t.encode("utf-8")
        rp = round(len(_zlib.compress(raw, 6)) / len(raw), 6)
        co = _zlib.compressobj(
            6, _zlib.DEFLATED, 15, 8, _zlib.Z_DEFAULT_STRATEGY, z.encode("utf-8")
        )
        rd = round(len(co.compress(raw) + co.flush()) / len(raw), 6)
        vals.append(f"({r}, {rp!r}, {rd!r}, {round(rp - rd, 6)!r})")
    rows = ",\n            ".join(vals)
    return f"""
        WITH golden(r, ratio_plain, ratio_dict, dict_gain) AS (VALUES
            {rows})
        SELECT d.doc_id, g.ratio_plain::DOUBLE AS ratio_plain,
               g.ratio_dict::DOUBLE AS ratio_dict,
               g.dict_gain::DOUBLE AS dict_gain
        FROM documents d JOIN golden g ON d.doc_id % 13 = g.r
    """


def _q_unicode_nfc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unicode NFC canonicalization (operators/textstats.py
    `normalize_unicode`): every doc gets a deterministic denormalized
    suffix (combining acute, ligature, superscript) so the pass has known
    work; the oracle is DuckDB's utf8proc `nfc_normalize` over the same
    construction, compared via md5 of the normalized text."""
    from pdf_to_epub_spark.operators import normalize_unicode

    d = _t(spark, sf_dir, "documents").select(
        "doc_id",
        # suffix: 'e'+combining-acute (U+0301, NFC-composes), the fi
        # ligature U+FB01 and superscript U+00B9 (both NFC-stable)
        F.concat(
            F.col("text"), F.lit(" cafe\u0301 \ufb01n 2\u00b9")
        ).alias("text"),
    )
    return normalize_unicode(d).select(
        "doc_id", F.md5("text_norm").alias("norm_md5"), "changed"
    )


def _q_split_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-split contamination audit: MinHash-verified near-dup pairs
    whose endpoints landed in DIFFERENT train/val/test splits — the
    leakage check a training pipeline runs after splitting (a near-dup of
    a training doc sitting in test inflates eval).  Pure composition of
    two oracled surfaces: hash_split membership + verified near-dup pairs;
    the oracle replays both (split hash arithmetic over the brute-force
    shingle-Jaccard pair scan)."""
    from pdf_to_epub_spark.operators import hash_split, minhash_candidate_pairs

    corpus = mutated_recrawl(spark, sf_dir)
    pairs = minhash_candidate_pairs(
        corpus, k=3, num_hashes=32, bands=8, jaccard_threshold=0.7
    )
    splits = hash_split(
        corpus.select("doc_id"), {"train": 0.5, "val": 0.25, "test": 0.25}
    )
    sa = splits.select(
        F.col("doc_id").alias("id_a"), F.col("split").alias("split_a")
    )
    sb = splits.select(
        F.col("doc_id").alias("id_b"), F.col("split").alias("split_b")
    )
    return (
        pairs.join(sa, "id_a")
        .join(sb, "id_b")
        .where(F.col("split_a") != F.col("split_b"))
        .select(
            "id_a", "id_b", "split_a", "split_b",
            F.round("jaccard", 4).alias("jaccard"),
        )
    )


def _q_dedup_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style global paragraph dedup (operators/dedup.py
    `dedup_lines_global`) over the mutated re-crawl corpus (each doc's
    recrawl copy shares almost every line, so the keep-first rule has
    heavy real work).  The rebuilt per-doc text is hash-checked; the
    oracle replays hashing, first-occurrence choice, and reassembly."""
    from pdf_to_epub_spark.operators import dedup_lines_global

    out = dedup_lines_global(mutated_recrawl(spark, sf_dir))
    return out.select(
        "doc_id", F.md5("text").alias("dedup_md5"), "n_lines", "n_kept"
    )


def _q_template_strip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain chrome removal (operators/dedup.py
    `strip_template_lines`): deterministic site chrome is injected ahead
    of each document's prose — a copyright banner on every page of the
    domain (100 % → stripped), a cookie notice on 13/25 pages (52 % —
    crosses the ≥50 % threshold exactly), and a promo line on 5/25 pages
    (20 % — kept, even though the SAME literal line appears on every
    domain: the frequency test is domain-scoped).  The oracle replays the
    injection, the distinct-doc frequency test, and the reassembly."""
    from pdf_to_epub_spark.operators import strip_template_lines

    d = _t(spark, sf_dir, "documents")
    j = F.floor(F.col("doc_id") / 20)
    banner = F.concat(
        F.lit("(c) "), F.col("source"), F.lit(" - all rights reserved\n")
    )
    cookie = F.when(
        j % 2 == 0,
        F.concat(F.lit("We use cookies on "), F.col("source"), F.lit("\n")),
    ).otherwise(F.lit(""))
    promo = F.when(
        j % 5 == 0, F.lit("Limited promo - subscribe today\n")
    ).otherwise(F.lit(""))
    mutated = d.select(
        "doc_id",
        "source",
        F.concat(banner, cookie, promo, F.coalesce("text", F.lit(""))).alias(
            "text"
        ),
    )
    out = strip_template_lines(mutated)
    return out.select(
        "doc_id",
        "source",
        F.md5("text").alias("text_md5"),
        "n_lines",
        "n_removed",
    )


def _q_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing over documents with deterministic injected PII (email
    per doc, IPv4 per doc, phone on every third doc) so the scrubber has
    known work; counts per class plus the md5 of the redacted text make the
    whole rewrite oracle-checkable.  Patterns are Java/RE2-portable by
    construction (operators/textstats.PII_PATTERNS)."""
    from pdf_to_epub_spark.operators import scrub_pii

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    injected = d.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com from 10.0."),
            (F.col("doc_id") % 256).cast("string"),
            F.lit(".7"),
            F.when(
                F.col("doc_id") % 3 == 0,
                F.concat(
                    F.lit(" call +1 415 555 0"),
                    F.lpad((F.col("doc_id") % 100).cast("string"), 3, "0"),
                ),
            ).otherwise(F.lit("")),
        ).alias("text"),
    )
    out = scrub_pii(injected)
    return out.select(
        "doc_id",
        F.col("n_email").cast("long").alias("n_email"),
        F.col("n_ip").cast("long").alias("n_ip"),
        F.col("n_phone").cast("long").alias("n_phone"),
        F.md5("clean_text").alias("clean_md5"),
    )


def _q_gopher_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-rule quality gate (Rae et al. 2021 §A1.1) over documents —
    every signal plus the combined keep verdict, all column algebra,
    replicated exactly in the DuckDB oracle."""
    from pdf_to_epub_spark.operators import gopher_quality

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    out = gopher_quality(d)
    return out.select(
        "doc_id",
        F.col("n_words_g").cast("long").alias("n_words"),
        F.col("mean_word_len_g").alias("mean_word_len"),
        "symbol_ratio",
        "bullet_line_ratio",
        "ellipsis_line_ratio",
        "alpha_word_ratio",
        F.col("stopword_hits").cast("long").alias("stopword_hits"),
        "keep",
    )


def _q_benchmark_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eval-leakage check: docs sharing ≥1 distinct 8-word shingle with a
    benchmark set (here: the first 20 documents' own texts, so each
    benchmark row must at minimum flag its source doc).  Corpus side
    streams through a broadcast probe of the slim benchmark shingle-hash
    table; the oracle recomputes shared counts on string shingles."""
    from pdf_to_epub_spark.operators import benchmark_contamination

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    bench = d.where(F.col("doc_id") < 20).select(
        F.col("doc_id").alias("bench_id"), F.col("text")
    )
    return benchmark_contamination(d, bench, k=8).select(
        "doc_id", "bench_id", F.col("shared_shingles").cast("long").alias("shared_shingles")
    )


def _q_contamination_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional leak audit (dedup.contamination_spans): same benchmark
    construction as benchmark_contamination (first 20 docs), but the
    output is the MAXIMAL leaked token spans per (doc, bench) — the
    oracle replays positional shingles on STRINGS (no hashes) and the
    interval merge in SQL windows: two independent algorithms, one
    result set."""
    from pdf_to_epub_spark.operators.dedup import contamination_spans

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    bench = d.where(F.col("doc_id") < 20).select(
        F.col("doc_id").alias("bench_id"), F.col("text")
    )
    return contamination_spans(d, bench, k=8)


def _q_mask_contaminated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decontamination ACT step (dedup.mask_spans over
    contamination_spans): leaked token spans — merged across benchmark
    docs — are rewritten to <REDACTED>; untouched docs keep their text
    byte-identical.  The oracle composes the shared span-replay CTEs
    with a SQL token rewrite (correlated list lambda over
    generate_series positions)."""
    from pdf_to_epub_spark.operators.dedup import (
        contamination_spans,
        mask_spans,
    )

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    bench = d.where(F.col("doc_id") < 20).select(
        F.col("doc_id").alias("bench_id"), F.col("text")
    )
    spans = contamination_spans(d, bench, k=8).select(
        "doc_id", "span_start", "span_end"
    )
    return mask_spans(d, spans).select(
        "doc_id",
        F.md5(F.col("text").cast("binary")).alias("masked_md5"),
        "n_tokens",
        "n_masked",
    )


def _q_recrawl_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy recrawl change detection (dedup.recrawl_drift): simhash
    Hamming distance between the snapshot_delta class pairs, md5-hash60
    token form so the oracle replays the fingerprints bit-for-bit in
    pure Python."""
    from pdf_to_epub_spark.operators.dedup import md5_hash60, recrawl_drift

    pairs = _delta_class_pairs()
    d = _t(spark, sf_dir, "documents").select("doc_id")
    r1 = (F.col("doc_id") % 13 + 1).cast("int")
    old = d.select(
        "doc_id",
        F.element_at(F.array(*[F.lit(o) for o, _ in pairs]), r1).alias("text"),
    )
    new = d.select(
        "doc_id",
        F.element_at(F.array(*[F.lit(n) for _, n in pairs]), r1).alias("text"),
    )
    return recrawl_drift(old, new, token_hash=md5_hash60)


def _recrawl_drift_oracle() -> str:
    """Pure-Python simhash replay per class: md5-60bit token hashes,
    per-occurrence +-1 bit votes, same class thresholds."""
    import hashlib as _hl
    import re as _re

    def simhash(text: str) -> int:
        votes = [0] * 64
        for tok in _re.split(r"\s+", text.strip(" ").lower()):
            h = int(_hl.md5(tok.encode("utf-8")).hexdigest()[:15], 16)
            for i in range(64):
                votes[i] += 1 if (h >> i) & 1 else -1
        return sum(1 << i for i in range(64) if votes[i] > 0)

    vals = []
    for r, (old, new) in enumerate(_delta_class_pairs()):
        ham = bin(simhash(old) ^ simhash(new)).count("1")
        cls = (
            "identical" if ham == 0
            else "minor" if ham <= 3
            else "moderate" if ham <= 16
            else "rewrite"
        )
        vals.append(f"({r}, {ham}, '{cls}')")
    rows = ",\n            ".join(vals)
    return f"""
        WITH golden(r, hamming, drift_class) AS (VALUES
            {rows})
        SELECT d.doc_id, g.hamming::INTEGER AS hamming, g.drift_class
        FROM documents d JOIN golden g ON d.doc_id % 13 = g.r
    """


def _q_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-health Zipf fit (textstats.zipf_fit): OLS ln(freq) vs
    ln(rank) over the top-64 vocabulary; integer-nano quantization +
    decimal sums make the fit engine-exact, and the oracle replays the
    full pipeline (counts, deterministic top-k, logs, OLS) in SQL."""
    from pdf_to_epub_spark.operators.textstats import zipf_fit

    return zipf_fit(_t(spark, sf_dir, "documents").select("text"))


def _q_ngram_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eval-split novelty check (textstats.ngram_coverage): distinct
    1/2/3-gram coverage of the doc_id%3==1 test slice by the rest of
    the corpus; the oracle replays gram construction and the semi-join
    membership per n in SQL."""
    from pdf_to_epub_spark.operators.textstats import ngram_coverage

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return ngram_coverage(
        d.filter(F.col("doc_id") % 3 != 1), d.filter(F.col("doc_id") % 3 == 1)
    )


def _q_corpus_splits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test assignment by id hash (md5-based so the
    oracle replays the exact arithmetic; weights 0.5/0.25/0.25 make the
    cumulative thresholds exactly representable doubles).  Membership is a
    pure function of (id, salt) — repartition/retry stable, unlike
    DataFrame.sample."""
    from pdf_to_epub_spark.operators import hash_split

    d = _t(spark, sf_dir, "documents").select("doc_id")
    return hash_split(
        d, {"train": 0.5, "val": 0.25, "test": 0.25}
    ).select("doc_id", "split")


def _docs_with_domain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents + the deterministic 7x13 url scheme's registrable domain
    (same construction as _q_domain_stats)."""
    doc_id = F.col("doc_id")
    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return d.withColumn(
        "domain",
        F.concat(F.lit("site"), (doc_id % 13).cast("string"), F.lit(".com")),
    )


def _q_domain_quota(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Proportional per-domain quota (operators/sampling.py
    `domain_quota_sample`): keep-rate = min(1, cap/n_domain), membership
    decided by the md5 id hash — no window, no per-domain sort; the scale
    path for domain balancing.  The oracle replays count, rate, and hash
    arithmetic exactly."""
    from pdf_to_epub_spark.operators import domain_quota_sample

    d = _docs_with_domain(spark, sf_dir)
    return domain_quota_sample(d, cap=20).select("doc_id", "domain")


def _q_domain_caps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-domain cap (operators/sampling.py `domain_caps_exact`):
    the cap smallest id-hashes per domain survive (window rank).  Exact
    form of the quota op; hot-domain skew note in the docstring."""
    from pdf_to_epub_spark.operators import domain_caps_exact

    d = _docs_with_domain(spark, sf_dir)
    return domain_caps_exact(d, cap=20).select("doc_id", "domain")


def _q_length_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language document-length profile (p50/p90/p99 of n_chars) — the
    corpus-analytics rollup every ingest publishes.  Exact percentile here
    (bit-identical interpolation to DuckDB quantile_cont, verified); at
    100 TB swap in approx_percentile(..., accuracy) — same plan shape,
    bounded-memory sketch instead of per-group sort."""
    d = _t(spark, sf_dir, "documents")
    return d.groupBy("lang").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.round(F.expr("percentile(n_chars, 0.5)"), 4).alias("p50_chars"),
        F.round(F.expr("percentile(n_chars, 0.9)"), 4).alias("p90_chars"),
        F.round(F.expr("percentile(n_chars, 0.99)"), 4).alias("p99_chars"),
    )


def _q_blocked_urls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL blocklist gate (operators/urls.py `filter_blocked_urls`):
    broadcast anti-join on the registrable domain — the UT1-shape filter.
    Three of the 13 deterministic domains are blocked; survivors are
    hash-checked."""
    from pdf_to_epub_spark.operators import filter_blocked_urls

    d = _docs_with_domain(spark, sf_dir).select(
        "doc_id",
        F.concat(F.lit("http://sub."), F.col("domain"), F.lit("/p/"),
                 F.col("doc_id").cast("string")).alias("url"),
    )
    blocked = spark.createDataFrame(
        [("site1.com",), ("site4.com",), ("site11.com",)], "domain string"
    )
    return filter_blocked_urls(d, blocked).select("doc_id", "url")


def _q_vocab_oov(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocab induction + per-doc OOV stats (operators/textstats.py
    `build_vocab`/`oov_rates`): top-200 corpus vocabulary (count desc,
    word asc — a total order, so the set is engine-identical), then the
    per-doc out-of-vocab word counts.  Integer outputs, hash-stable."""
    from pdf_to_epub_spark.operators import oov_rates

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return oov_rates(d, k=200)


def _q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing (operators/packing.py): greedy fixed-capacity
    training-context assembly, parallel per md5 id-hash shard.  The oracle
    replays the exact fold with a recursive CTE — per-doc (shard, seq_id)
    assignment is a pure function of the id/token-count multiset, so the
    whole placement decision is hash-checkable."""
    from pdf_to_epub_spark.operators import pack_sequences

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return pack_sequences(d, max_tokens=512, n_shards=16)


def _q_packed_texts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialized packed contexts (operators/packing.py `packed_texts`):
    member docs concatenated in doc_id order per (shard, seq_id).  The
    oracle replays the pack fold then string_agg's the same join — the
    full concatenated text is hash-checked."""
    from pdf_to_epub_spark.operators import packed_texts

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return packed_texts(d, max_tokens=512, n_shards=16)


def _q_bigram_lm_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style LM quality signal (operators/lm.py): add-one-smoothed
    char-bigram model trained on the corpus, every doc scored under it.
    Scores are sums of integer micro-nat costs, so the oracle hash-matches
    exactly — float summation order never enters the result."""
    from pdf_to_epub_spark.operators import bigram_lm_scores

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return bigram_lm_scores(d)


def _q_lm_partition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet §4.3 perplexity partition: head/middle/tail thirds by mean
    bigram cost.  Tertile cutoffs from ONE exact percentile aggregation
    (no global sort/window); means and cutoffs rounded to 6 dp before the
    boundary compare so the DuckDB quantile_cont replay classifies
    identically."""
    from pdf_to_epub_spark.operators import bigram_lm_scores, lm_partition

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return lm_partition(bigram_lm_scores(d))


def _q_good_turing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Good-Turing frequency-of-frequencies table (lm.good_turing): for
    each observed word count r, the number of word types seen r times
    and the floor-quantized exact-integer discounted estimates
    r* = (r+1)N_{r+1}/N_r (micro) and p_GT = r*/T (nano) — DECIMAL(38,0)
    div, no float anywhere, the unseen mass readable off the r=1 row."""
    from pdf_to_epub_spark.operators import good_turing

    d = _t(spark, sf_dir, "documents").select("text")
    return good_turing(d)


def _q_snm_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sorted-neighborhood blocking (dedup.sorted_neighborhood_pairs,
    Hernandez & Stolfo): every doc pair within 3 positions in the global
    sort by a 12-char letters-only key — global row_number computed
    scalably (range partition + per-partition window + broadcast
    cumulative offsets; candidate join is an equi-join on position)."""
    from pdf_to_epub_spark.operators import sorted_neighborhood_pairs

    d = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.substring(
            F.regexp_replace(F.lower(F.col("text")), "[^a-z]", ""), 1, 12
        ).alias("snm_key"),
    )
    return sorted_neighborhood_pairs(
        d, key_col="snm_key", id_col="doc_id", window=4
    )


def _q_kn_doc_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated Kneser-Ney word-bigram scoring (lm.train_kn_bigram +
    lm.kn_bigram_scores, the KenLM/CCNet model family): top-64 vocab,
    OOV -> <unk> on both sides, D = 3/4 kept as an exact rational so
    every pair probability is one correctly-rounded log of exact
    integers; doc totals are integer micro-nat sums."""
    from pdf_to_epub_spark.operators import kn_bigram_scores, train_kn_bigram

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return kn_bigram_scores(d, train_kn_bigram(d, vocab_size=64), vocab_size=64)


def _q_kn_partition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet §4.3 head/middle/tail tertiles under the Kneser-Ney model
    (the paper's actual pipeline shape: KenLM-family perplexity feeding
    the partition, not the char-bigram proxy).  Same lm_partition
    mechanics — one exact percentile aggregation for the two cutoffs,
    6-dp rounding on both means and cutoffs before the boundary compare,
    bigram-less docs pinned to ``tail``."""
    from pdf_to_epub_spark.operators import (
        kn_bigram_scores,
        lm_partition,
        train_kn_bigram,
    )

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    scores = kn_bigram_scores(
        d, train_kn_bigram(d, vocab_size=64), vocab_size=64
    )
    return lm_partition(scores)


def _q_hrw_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rendezvous-hash shard assignment (sampling.hrw_shards, n=8):
    argmax-of-hashes per key, computed row-locally (transform →
    array_max, zero shuffle) — growing n moves only ~1/(n+1) of keys,
    all of them to the new shard (pinned in test_s14_ops)."""
    from pdf_to_epub_spark.operators import hrw_shards

    d = _t(spark, sf_dir, "documents").select("doc_id")
    return hrw_shards(d, n_shards=8)


def _q_paired_bootstrap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Paired Poisson-bootstrap comparison (sampling.paired_bootstrap):
    is the chars/5 word-count estimate biased vs the real tokenizer?
    Per-doc DELTA resampled with md5-seeded Poisson(1) weights —
    mean delta, percentile CI, and the win-rate readout."""
    from pdf_to_epub_spark.operators import paired_bootstrap

    d = _t(spark, sf_dir, "documents").select(
        "doc_id",
        (F.col("n_chars").cast("double") / F.lit(5.0)).alias("est_words"),
        F.expr(
            "size(regexp_extract_all(lower(text), '[a-zà-öø-ÿ]+', 0))"
        ).alias("n_words"),
    )
    return paired_bootstrap(d, "est_words", "n_words", n_reps=32)


def _q_kn_arpa_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ARPA-shaped export of the top-64 KN model (lm.kn_arpa_table):
    continuation unigrams + interpolation-mass backoffs + full
    interpolated bigram probabilities, all signed micro-nats — the
    KenLM interop table (backoff·P_cont reproduces the scorer's
    unseen-pair cost, pinned in test_s14_ops)."""
    from pdf_to_epub_spark.operators import kn_arpa_table, train_kn_bigram

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return kn_arpa_table(train_kn_bigram(d, vocab_size=64))


_WP_CHARS = "abcdefghijklmnopqrstuvwxyz" + "".join(
    chr(c) for c in list(range(0xE0, 0xF7)) + list(range(0xF8, 0x100))
)


def _q_wordpiece_symbols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WordPiece greedy longest-match encode
    (textstats.wordpiece_encode_symbols) under a deterministic demo
    vocabulary — top-8 corpus words (a bounded 8-row model-fit
    collect, the package's IVF/LM precedent) plus the tokenizer
    alphabet as start+##-continuation pieces: most corpus words fall
    OUTSIDE the top-8 and segment char-by-char through the greedy loop
    (a top-k covering the whole vocabulary would make every encode a
    single piece and the oracle check vacuous — review finding);
    symbol table mirrors the BPE encoder's shape so the families
    compare directly."""
    from pdf_to_epub_spark.operators import build_vocab
    from pdf_to_epub_spark.operators.textstats import (
        wordpiece_encode_symbols,
    )

    d = _t(spark, sf_dir, "documents").select("text")
    top = [r.word for r in build_vocab(d, k=8).collect()]
    vocab = sorted(
        set(top)
        | set(_WP_CHARS)
        | {"##" + ch for ch in _WP_CHARS}
    )
    return wordpiece_encode_symbols(d, vocab)


def _q_quantile_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-group quantile normalization (sampling.quantile_normalize):
    per-language n_chars distributions mapped rank-wise onto the pooled
    distribution — the domain-debiasing step before one global quality
    threshold.  The mapped value is an OBSERVED pooled score at an
    integer-exact midpoint-quantile index (DECIMAL div), computed with
    the scalable global-position lift (never a single-partition
    window)."""
    from pdf_to_epub_spark.operators import quantile_normalize

    d = _t(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    return quantile_normalize(
        d, score_col="n_chars", group_col="lang", id_col="doc_id"
    )


def _q_chi2_lang_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson chi-square independence audit (evaluate.chi2_independence)
    over the (lang, source) contingency table: exact integer per-cell
    numerator/denominator, ONE identically-associated double expression
    per cell nano-quantized, then an order-free integer sum."""
    from pdf_to_epub_spark.operators import chi2_independence

    d = _t(spark, sf_dir, "documents").select("lang", "source")
    return chi2_independence(d, "lang", "source")


def _q_cramers_v(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cramér's V effect size (evaluate.cramers_v) over the same
    lang × source contingency as chi2_lang_source — the strength
    companion to the significance test; one identically-associated
    float chain over exact-integer inputs."""
    from pdf_to_epub_spark.operators.evaluate import cramers_v

    d = _t(spark, sf_dir, "documents").select("lang", "source")
    return cramers_v(d, "lang", "source")


def _q_colbert_maxsim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Late-interaction MaxSim retrieval (similarity.colbert_maxsim):
    labels 0-1 play query token bags, every label a document bag;
    per-pair cosines quantize to integer micro-units BEFORE the
    max-per-query-token / sum-per-document reductions, so both engines
    reduce exact integers."""
    from pdf_to_epub_spark.operators import colbert_maxsim

    e = _t(spark, sf_dir, "embeddings").select(
        "vec_id",
        "label",
        F.col("embedding").cast("array<double>").alias("embedding"),
    )
    return colbert_maxsim(
        e.where(F.col("label") <= 1).select(
            F.col("label").alias("qid"), "vec_id", "embedding"
        ),
        e.select(F.col("label").alias("did"), "embedding"),
        q_id="qid",
        q_tok="vec_id",
        d_id="did",
    )


def _q_luhn_card_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Checksum-validated credit-card detection (textstats.
    credit_card_hits): Luhn mod-10 over maximal digit/space/dash runs —
    planted valid, invalid-check-digit, and spaced-valid cards per
    doc_id residue; counts are pure integer column algebra in both
    engines."""
    from pdf_to_epub_spark.operators.textstats import credit_card_hits

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    marker = (
        F.when(
            F.col("doc_id") % 4 == 0, F.lit(" card 4532015112830366 end")
        )
        .when(F.col("doc_id") % 4 == 1, F.lit(" card 4532015112830367 end"))
        .when(
            F.col("doc_id") % 4 == 2,
            F.lit(" card 4532 0151 1283 0366 end"),
        )
        .otherwise(F.lit(""))
    )
    injected = d.select(
        "doc_id",
        F.concat(F.coalesce(F.col("text"), F.lit("")), marker).alias("text"),
    )
    return credit_card_hits(injected)


def _q_text_reuse_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Passim-style text-reuse alignment (dedup.text_reuse_spans): every
    doc gains a synthetic plagiarist (10 doc-unique filler tokens + its
    own tokens 21-50), and the operator must recover the copied
    interval as a single diagonal run — positions/intervals are pure
    integers, engine-exact; the oracle joins on shingle STRINGS where
    Spark joins rotation-XOR hashes (identical up to ~2^-63)."""
    from pdf_to_epub_spark.operators import text_reuse_spans

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    ws = F.split(
        F.trim(F.lower(F.coalesce(F.col("text"), F.lit("")))), r"\s+"
    )
    fillers = F.array(
        *[
            F.concat(
                F.lit("filler"),
                F.col("doc_id").cast("string"),
                F.lit("x" + str(j)),
            )
            for j in range(10)
        ]
    )
    plag = d.select(
        (F.col("doc_id") + F.lit(2_000_000)).alias("doc_id"),
        F.concat_ws(" ", F.concat(fillers, F.slice(ws, 21, 30))).alias(
            "text"
        ),
    )
    pairs = d.select(
        F.col("doc_id").alias("id_a"),
        (F.col("doc_id") + F.lit(2_000_000)).alias("id_b"),
    )
    return text_reuse_spans(d.union(plag), pairs, k=5, min_run=3)


def _q_text_reuse_merged(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The passim two-stage pipeline (dedup.text_reuse_spans →
    dedup.merge_reuse_spans): the synthetic plagiarist here contains an
    INSERTION mid-copy (fillers + tokens 21-35 + a foreign token +
    tokens 36-50), splitting the alignment into two diagonals that the
    gappy merge must reunite into one passage with n_runs = 2."""
    from pdf_to_epub_spark.operators import (
        merge_reuse_spans,
        text_reuse_spans,
    )

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    ws = F.split(
        F.trim(F.lower(F.coalesce(F.col("text"), F.lit("")))), r"\s+"
    )
    fillers = F.array(
        *[
            F.concat(
                F.lit("gfill"),
                F.col("doc_id").cast("string"),
                F.lit("x" + str(j)),
            )
            for j in range(10)
        ]
    )
    body = F.concat(
        fillers,
        F.slice(ws, 21, 15),
        F.array(F.concat(F.lit("zzins"), F.col("doc_id").cast("string"))),
        F.slice(ws, 36, 15),
    )
    plag = d.select(
        (F.col("doc_id") + F.lit(3_000_000)).alias("doc_id"),
        F.concat_ws(" ", body).alias("text"),
    )
    pairs = d.select(
        F.col("doc_id").alias("id_a"),
        (F.col("doc_id") + F.lit(3_000_000)).alias("id_b"),
    )
    spans = text_reuse_spans(d.union(plag), pairs, k=5, min_run=3)
    return merge_reuse_spans(spans, gap=8)


def _q_epub_export(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's FINAL artifact as a distributed column: extraction →
    assembly → per-doc EPUB3 zip bytes (export.epub_bytes — mimetype-first
    STORED entry, fixed timestamps ⇒ byte-deterministic), hash-compared
    against a pure-Python replay of the same transform.  Bounded to 40
    docs per corpus so the oracle VALUES stay small; the plan shape is the
    full-corpus one (narrow extract → one assembly shuffle → narrow
    export)."""
    _ship_package(spark)
    from pdf_to_epub_spark.operators import (
        assemble_documents,
        blocks_table,
        extract_documents,
    )

    docs = _t(spark, sf_dir, "documents").where("doc_id < 40").select(
        F.concat(F.lit("doc://"), F.col("doc_id").cast("string")).alias("url"),
        F.lit(None).cast("timestamp").alias("warc_ts"),
        F.col("lang"),
        F.col("text"),
    )
    # LEFT join from the doc list: a doc whose extraction yields zero
    # blocks would otherwise vanish in blocks_table's explode while the
    # oracle still carries its (valid, empty-body) EPUB row
    assembled = assemble_documents(blocks_table(extract_documents(docs)))
    with_lang = docs.select("url", "lang").join(
        assembled.select("url", "blocks"), "url", "left"
    )

    def gen(batches):
        import hashlib as _h

        import pandas as pd

        from pdf_to_epub_spark.export import epub_bytes

        for pdf in batches:
            urls, md5s, sizes = [], [], []
            for url, lang, blocks in zip(pdf["url"], pdf["lang"], pdf["blocks"]):
                payload = epub_bytes(
                    [dict(b) for b in blocks] if blocks is not None else [],
                    title=url, lang=lang, url=url,
                )
                urls.append(url)
                md5s.append(_h.md5(payload).hexdigest())
                sizes.append(len(payload))
            yield pd.DataFrame(
                {"url": urls, "epub_md5": md5s, "n_bytes": sizes}
            )

    return with_lang.mapInPandas(gen, "url string, epub_md5 string, n_bytes long")


def _q_epub_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EPUB round trip: extraction → assembly → per-doc EPUB3 zip →
    re-ingest through the EPUB SOURCE (sources/epub.parse_epub_payloads,
    container→OPF→spine walk) — one row per recovered chapter.  The
    oracle derives the expected chapters from the block structure
    directly (chapter_struct + the exporter's front-matter/Body rules)
    WITHOUT touching zip or XHTML, so the parser is checked against an
    independent derivation, not against itself."""
    _ship_package(spark)
    from pdf_to_epub_spark.operators import (
        assemble_documents,
        blocks_table,
        extract_documents,
    )
    from pdf_to_epub_spark.sources.epub import parse_epub_payloads

    docs = _t(spark, sf_dir, "documents").where("doc_id < 40").select(
        F.col("doc_id"),
        F.concat(F.lit("doc://"), F.col("doc_id").cast("string")).alias("url"),
        F.lit(None).cast("timestamp").alias("warc_ts"),
        F.col("lang"),
        F.col("text"),
    )
    assembled = assemble_documents(
        blocks_table(extract_documents(docs.drop("doc_id")))
    )
    with_lang = docs.select("doc_id", "url", "lang").join(
        assembled.select("url", "blocks"), "url", "left"
    )

    def gen(batches):
        import pandas as pd

        from pdf_to_epub_spark.export import epub_bytes

        for pdf in batches:
            ids, payloads = [], []
            for doc_id, url, lang, blocks in zip(
                pdf["doc_id"], pdf["url"], pdf["lang"], pdf["blocks"]
            ):
                ids.append(doc_id)
                payloads.append(
                    epub_bytes(
                        [dict(b) for b in blocks] if blocks is not None else [],
                        title=url, lang=lang, url=url,
                    )
                )
            yield pd.DataFrame({"doc_id": ids, "epub": payloads})

    payloads = with_lang.mapInPandas(gen, "doc_id long, epub binary")
    parsed = parse_epub_payloads(payloads)
    return parsed.select(
        "doc_id",
        F.col("chapter_idx").cast("int").alias("chapter_idx"),
        "heading",
        F.md5(F.encode(F.col("text"), "utf-8")).alias("text_md5"),
        F.col("n_paras").cast("int").alias("n_paras"),
        "status",
    )


def _epub_roundtrip_oracle(limit: int = 40) -> str | None:
    """Expected chapters computed from the BLOCK structure (the exporter's
    chapter list: front matter if non-empty, chapter_struct chapters,
    'Body' fallback) — the zip/XHTML layers never run here, so the
    round-trip oracle is an independent derivation (same VALUES pattern
    as `_epub_export_oracle`, keyed by the corpus' doc-0 text md5)."""
    import hashlib

    import pyarrow.parquet as pq

    from pdf_to_epub_spark.export import _paragraphs
    from pdf_to_epub_spark.extractlib.blocks import chapter_struct
    from pdf_to_epub_spark.extractlib.pipeline import extract_document

    def q(s: str) -> str:
        return s.replace("'", "''")

    rows: list[str] = []
    for sf_dir in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        path = pathlib.Path(sf_dir) / "documents.parquet"
        if not path.exists():
            return None
        t = pq.read_table(path, columns=["doc_id", "text"])
        recs = sorted(zip(t["doc_id"].to_pylist(), t["text"].to_pylist()))
        key = hashlib.md5((recs[0][1] or "").encode()).hexdigest()
        for doc_id, text in recs:
            if doc_id >= limit:
                continue
            res = extract_document(text)
            dicts = [b._asdict() for b in res.blocks]
            doc = chapter_struct(res.blocks)
            chapters: list[tuple[str, list[str]]] = []
            if doc["front_matter"]:
                paras = _paragraphs(doc["front_matter"])
                if paras:
                    chapters.append(("Front Matter", paras))
            for ch in doc["chapters"]:
                chapters.append((ch["heading"], _paragraphs(ch["blocks"])))
            if not chapters:
                chapters.append(("Body", _paragraphs(dicts)))
            for i, (heading, paras) in enumerate(chapters, start=1):
                body = "\n".join(paras)
                rows.append(
                    f"('{key}',{doc_id},{i},'{q(' '.join(heading.split()))}',"
                    f"'{hashlib.md5(body.encode()).hexdigest()}',"
                    f"{len(paras)},'ok')"
                )
    vals = ",\n            ".join(rows)
    return f"""
        WITH golden(corpus_key, doc_id, chapter_idx, heading, text_md5,
                    n_paras, status) AS (VALUES
            {vals})
        SELECT doc_id::BIGINT AS doc_id, chapter_idx::INT AS chapter_idx,
               heading, text_md5, n_paras::INT AS n_paras, status
        FROM golden
        WHERE corpus_key = (SELECT md5(text) FROM documents
                            WHERE doc_id = 0)
    """


def _epub_export_oracle(limit: int = 40) -> str | None:
    """Pure-Python replay of the EPUB export over the same 40 docs per
    corpus (same pattern as the IVF-centroid oracle: computed once at
    oracle-build time from the testdata parquet, keyed by the corpus'
    doc-0 text md5, inlined as VALUES)."""
    import hashlib

    import pyarrow.parquet as pq

    from pdf_to_epub_spark.export import epub_bytes
    from pdf_to_epub_spark.extractlib.pipeline import extract_document

    rows: list[str] = []
    for sf_dir in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        path = pathlib.Path(sf_dir) / "documents.parquet"
        if not path.exists():
            return None
        t = pq.read_table(path, columns=["doc_id", "text", "lang"])
        recs = sorted(
            zip(
                t["doc_id"].to_pylist(),
                t["text"].to_pylist(),
                t["lang"].to_pylist(),
            )
        )
        key = hashlib.md5((recs[0][1] or "").encode()).hexdigest()
        for doc_id, text, lang in recs:
            if doc_id >= limit:
                continue
            url = f"doc://{doc_id}"
            res = extract_document(text)
            payload = epub_bytes(
                [b._asdict() for b in res.blocks], title=url, lang=lang, url=url
            )
            rows.append(
                f"('{key}','{url}','{hashlib.md5(payload).hexdigest()}',"
                f"{len(payload)})"
            )
    vals = ",\n            ".join(rows)
    return f"""
        WITH golden(corpus_key, url, epub_md5, n_bytes) AS (VALUES
            {vals})
        SELECT url, epub_md5, n_bytes::BIGINT AS n_bytes FROM golden
        WHERE corpus_key = (SELECT md5(text) FROM documents WHERE doc_id = 0)
    """


def _link_pages(d: DataFrame, extra_anchors: bool = False) -> DataFrame:
    """Deterministic (url, html) link pages shared by page_outlinks and
    domain_pagerank: one absolute, one scheme-relative and one
    path-absolute anchor per doc.  ``extra_anchors`` adds a
    directory-relative anchor, an UNQUOTED-href anchor (legal HTML the
    extractor must still see) and a dropped mailto — all of which resolve
    to the page's own domain (or vanish), so enabling them never changes
    the DISTINCT domain edge set the static pagerank oracle replays."""
    i = F.col("doc_id")
    url = F.concat(
        F.lit("https://sub"), (i % 7).cast("string"),
        F.lit(".site"), (i % 13).cast("string"),
        F.lit(".example/dir"), (i % 3).cast("string"),
        F.lit("/page"), i.cast("string"), F.lit(".html"),
    )
    parts = [
        F.lit('<html><body><a href="https://ext'), (i % 5).cast("string"),
        F.lit('.example.org/x'), i.cast("string"),
        F.lit('">a</a><a href=\'//cdn'), (i % 2).cast("string"),
        F.lit(".example.net/y'>b</a>"),
        F.lit('<a href="/root'), (i % 4).cast("string"), F.lit('.html">c</a>'),
    ]
    if extra_anchors:
        parts += [
            F.lit('<a href="rel'), (i % 6).cast("string"),
            F.lit('.html">d</a><a href=uq'), (i % 6).cast("string"),
            F.lit('.html>e</a><a href="mailto:x@y.z">f</a>'),
        ]
    parts.append(F.lit("</body></html>"))
    html = F.encode(F.concat(*parts), "UTF-8")
    return d.select(url.alias("url"), html.alias("html"))


def _q_page_outlinks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Outlink extraction + crawler-style resolution over deterministic
    link pages (absolute, scheme-relative, path-absolute,
    directory-relative and UNQUOTED anchors per doc, plus a dropped
    mailto) — the frontier/webgraph primitive, JVM-side end to end."""
    from pdf_to_epub_spark.operators import extract_outlinks

    d = _t(spark, sf_dir, "documents").select("doc_id")
    pages = _link_pages(d, extra_anchors=True)
    return extract_outlinks(pages).select("url", "target")


def _q_page_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Head-metadata extraction (title / robots noindex-nofollow /
    rel=canonical) over deterministic page heads — the polite-crawl gate's
    input columns."""
    from pdf_to_epub_spark.operators import page_meta

    d = _t(spark, sf_dir, "documents").select("doc_id")
    i = F.col("doc_id")
    robots = (
        F.when(i % 6 == 0, F.lit('<meta name="robots" content="noindex, nofollow">'))
        .when(i % 6 == 1, F.lit("<meta name='robots' content='nofollow'>"))
        .when(i % 6 == 2, F.lit("<meta name=robots content=noindex>"))
        .when(i % 6 == 3, F.lit(""))
        # reversed attribute order + the 'none' directive
        .when(i % 6 == 4, F.lit('<meta content="none" name="robots">'))
        # multiple robots metas whose directives union
        .otherwise(
            F.lit(
                '<meta name=robots content=noindex>'
                '<meta name="robots" content="nofollow">'
            )
        )
    )
    canonical = F.when(
        i % 3 == 0,
        F.concat(F.lit('<link rel="canonical" href="https://c.example/p'),
                 i.cast("string"), F.lit('">')),
    ).otherwise(F.lit(""))
    html = F.encode(
        F.concat(
            F.lit("<html><head><title> Doc "), i.cast("string"),
            F.lit(" </title>"), robots, canonical,
            F.lit("</head><body>x</body></html>"),
        ),
        "UTF-8",
    )
    pages = d.select("doc_id", html.alias("html"))
    return page_meta(pages).select(
        "doc_id",
        F.col("page_title").alias("title"),
        F.col("page_noindex").alias("noindex"),
        F.col("page_nofollow").alias("nofollow"),
        F.col("page_canonical").alias("canonical"),
    )


def _q_domain_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the registrable-domain webgraph built from the same
    deterministic link pages as page_outlinks — the full chain
    extract_outlinks → domain_graph → 10 iterations of domain_rank.  The
    distinct edge set depends only on doc_id residues (full coverage at
    both test scales), so the oracle is one static pure-Python replay."""
    from pdf_to_epub_spark.operators import (
        domain_graph,
        domain_rank,
        extract_outlinks,
    )

    d = _t(spark, sf_dir, "documents").select("doc_id")
    pages = _link_pages(d)
    return domain_rank(domain_graph(extract_outlinks(pages)))


def _communities_edge_residues() -> list[tuple[int, int]]:
    """Deterministic two-cluster graph over the 13 site residues: two
    cliques (0..5 and 6..12) joined by one weak bridge (5,6) — dense
    internal cohesion so the bridge cannot flip either side."""
    edges = [(a, b) for a in range(6) for b in range(a + 1, 6)]
    edges += [(a, b) for a in range(6, 13) for b in range(a + 1, 13)]
    edges += [(5, 6)]
    return edges


def _q_domain_communities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Label-propagation communities (urls.label_propagation): the
    deterministic two-cluster domain graph (rings + chords + one weak
    bridge) must resolve into two communities — the op min-label
    connected_components cannot express (CC would merge them through
    the bridge).  Synchronous updates + smallest-label ties make the
    fixed-point replayable; the oracle is a pure-Python replay of the
    same 8 rounds."""
    from pdf_to_epub_spark.operators.urls import label_propagation

    d = _t(spark, sf_dir, "documents").select(
        (F.col("doc_id") % 13).alias("r")
    ).distinct()
    pred = None
    for a, b in _communities_edge_residues():
        term = (F.col("ra") == a) & (F.col("rb") == b)
        pred = term if pred is None else (pred | term)
    pairs = d.select(F.col("r").alias("ra")).crossJoin(
        d.select(F.col("r").alias("rb"))
    )
    edges = pairs.filter(pred).select(
        F.concat(F.lit("site"), F.col("ra").cast("string")).alias("src"),
        F.concat(F.lit("site"), F.col("rb").cast("string")).alias("dst"),
    )
    return label_propagation(edges, iters=8)


def _domain_communities_oracle() -> str:
    """Pure-Python replay of 8 synchronous min-tie LPA rounds over the
    same static edge set."""
    import collections

    edges = [
        (f"site{a}", f"site{b}") for a, b in _communities_edge_residues()
    ]
    adj: dict[str, set] = collections.defaultdict(set)
    for s, t in edges:
        adj[s].add(t)
        adj[t].add(s)
    nodes = sorted(adj)
    labels = {v: v for v in nodes}
    for _ in range(8):
        labels = {
            v: sorted(
                collections.Counter(
                    # the self-vote, mirroring the operator
                    [labels[u] for u in adj[v]] + [labels[v]]
                ).items(),
                key=lambda kv: (-kv[1], kv[0]),
            )[0][0]
            for v in nodes
        }
    vals = ",\n            ".join(
        f"('{v}', '{labels[v]}')" for v in nodes
    )
    return f"""
        WITH golden(node, label) AS (VALUES
            {vals})
        SELECT node, label FROM golden
    """


def _q_project_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JL projection (similarity.project_embeddings): 64-d embeddings
    onto 8 seeded Gaussian directions, long-form rows; the oracle inlines
    the SAME seeded planes and replays via list_dot_product."""
    from pdf_to_epub_spark.operators import project_embeddings

    e = _t(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    return project_embeddings(e, dim=64, out_dim=8, seed=3)


def _project_embeddings_oracle(dim: int = 64, out_dim: int = 8, seed: int = 3) -> str:
    """Same seeded hyperplanes inlined as literals; one UNION ALL branch
    per component."""
    from pdf_to_epub_spark.operators.similarity import _hyperplanes

    planes = _hyperplanes(dim, out_dim, seed)
    branches = "\nUNION ALL\n".join(
        f"SELECT vec_id, {j} AS component,"
        f" round(list_dot_product(embedding::DOUBLE[], {_vec_lit(p)}), 6)"
        f" AS value FROM embeddings"
        for j, p in enumerate(planes)
    )
    return branches


def _q_calibrated_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language score calibration (classify.calibrate_scores):
    alpha-ratio quality mapped to its within-language percent-rank via
    the skew-safe two-phase bucket-rank form; the oracle is DuckDB's
    native percent_rank window, which the reconstruction must equal."""
    from pdf_to_epub_spark.operators import calibrate_scores

    d = _t(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        (
            F.length(F.regexp_replace("text", "[^A-Za-zÀ-ÖØ-öø-ÿ]", ""))
            / F.greatest(F.length("text"), F.lit(1))
        ).alias("score"),
    )
    return calibrate_scores(d, score_col="score", group_col="lang")


def _q_trust_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TrustRank over the same deterministic domain graph as
    domain_pagerank, seeded at site0/site1 (urls.trust_rank) — trust
    decays one hop into {example.org, example.net, self}; unreachable
    site domains must land at exactly 0.  Static pure-Python oracle."""
    from pdf_to_epub_spark.operators import (
        domain_graph,
        extract_outlinks,
        trust_rank,
    )

    d = _t(spark, sf_dir, "documents").select("doc_id")
    pages = _link_pages(d)
    return trust_rank(
        domain_graph(extract_outlinks(pages)),
        seeds=["site0.example", "site1.example"],
    )


def _trust_rank_oracle() -> str:
    """Pure-Python replay of trust_rank over the static synthetic edge
    set (13 site domains each → {example.org, example.net, itself}),
    seeds site0/site1."""
    srcs = [f"site{r}.example" for r in range(13)]
    edges = sorted(
        {(s, d) for s in srcs for d in ("example.org", "example.net", s)}
    )
    nodes = sorted({x for e in edges for x in e})
    out: dict[str, int] = {}
    for s, _ in edges:
        out[s] = out.get(s, 0) + 1
    seeds = {"site0.example", "site1.example"}
    damp = 0.85
    tp = {v: (1.0 / len(seeds) if v in seeds else 0.0) for v in nodes}
    r = dict(tp)
    for _ in range(10):
        nxt = {v: (1 - damp) * tp[v] for v in nodes}
        for s, t in edges:
            nxt[t] += damp * r[s] / out[s]
        r = nxt
    vals = ",\n            ".join(
        f"('{v}', {round(r[v], 9)!r})" for v in nodes
    )
    return f"""
        WITH golden(domain, trust) AS (VALUES
            {vals})
        SELECT domain, trust::DOUBLE AS trust FROM golden
    """


def _domain_pagerank_oracle() -> str:
    """Pure-Python replay of the simple-variant PageRank over the exact
    distinct edge set the synthetic pages produce: 13 site domains each →
    {example.org, example.net, itself}."""
    srcs = [f"site{r}.example" for r in range(13)]
    edges = sorted(
        {(s, d) for s in srcs for d in ("example.org", "example.net", s)}
    )
    nodes = sorted({x for e in edges for x in e})
    out: dict[str, int] = {}
    for s, _ in edges:
        out[s] = out.get(s, 0) + 1
    n, damp = len(nodes), 0.85
    r = {v: 1.0 / n for v in nodes}
    for _ in range(10):
        nxt = {v: (1 - damp) / n for v in nodes}
        for s, t in edges:
            nxt[t] += damp * r[s] / out[s]
        r = nxt
    vals = ",\n            ".join(
        f"('{v}', {round(r[v], 9)!r})" for v in nodes
    )
    return f"""
        WITH golden(domain, rank) AS (VALUES
            {vals})
        SELECT domain, rank::DOUBLE AS rank FROM golden
    """


def _hits_oracle() -> str:
    """Pure-Python replay of hits_scores (5 L1-normalized Kleinberg
    iterations) over the same static edge set as the PageRank oracle:
    13 site domains each → {example.org, example.net, itself}."""
    srcs = [f"site{r}.example" for r in range(13)]
    edges = sorted(
        {(s, d) for s in srcs for d in ("example.org", "example.net", s)}
    )
    nodes = sorted({x for e in edges for x in e})
    n = len(nodes)
    hub = {v: 1.0 / n for v in nodes}
    auth = {v: 1.0 / n for v in nodes}
    for _ in range(5):
        raw = {v: 0.0 for v in nodes}
        for s, t in edges:
            raw[t] += hub[s]
        tot = sum(raw[v] for v in nodes)
        auth = {v: (raw[v] / tot if tot > 0 else 0.0) for v in nodes}
        raw = {v: 0.0 for v in nodes}
        for s, t in edges:
            raw[s] += auth[t]
        tot = sum(raw[v] for v in nodes)
        hub = {v: (raw[v] / tot if tot > 0 else 0.0) for v in nodes}
    vals = ",\n            ".join(
        f"('{v}', {round(hub[v], 9)!r}, {round(auth[v], 9)!r})" for v in nodes
    )
    return f"""
        WITH golden(domain, hub, authority) AS (VALUES
            {vals})
        SELECT domain, hub::DOUBLE AS hub, authority::DOUBLE AS authority
        FROM golden
    """


def _robots_fixture(d13: DataFrame) -> DataFrame:
    """Deterministic robots.txt table over the 13 site domains (input: a
    one-column ``r`` frame of the distinct doc_id%13 residues): r%3==0 has
    a star group with a plain and a wildcard Disallow, r%3==1 buries the
    star group behind a named group and stacked UA lines plus an empty
    Disallow, r%3==2 has only a named group (no rules for us)."""
    r = F.col("r")
    body = (
        F.when(
            r % 3 == 0,
            F.concat(
                F.lit("# corpus politeness\nUser-agent: *\nDisallow: /private"),
                r.cast("string"),
                F.lit("/\nDisallow: /tmp"),
                r.cast("string"),
                F.lit("*x\n"),
            ),
        )
        .when(
            r % 3 == 1,
            F.concat(
                F.lit(
                    "User-agent: Googlebot\nDisallow: /g/\n\n"
                    "User-agent: FooBot\nUser-agent: *\nDisallow: /only"
                ),
                r.cast("string"),
                F.lit("/\nDisallow:\nCrawl-delay: 2\n"),
            ),
        )
        .otherwise(F.lit("User-agent: Googlebot\nDisallow: /g/\n"))
    )
    return d13.select(
        F.concat(F.lit("site"), r.cast("string"), F.lit(".example")).alias(
            "domain"
        ),
        body.alias("body"),
    )


def _q_robots_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """robots.txt star-group parsing over the deterministic per-domain
    fixture — comments, named groups, stacked user-agent lines, empty and
    wildcard Disallows (operators/robots.py)."""
    from pdf_to_epub_spark.operators import robots_rules

    d13 = (
        _t(spark, sf_dir, "documents")
        .select((F.col("doc_id") % 13).alias("r"))
        .distinct()
    )
    return robots_rules(_robots_fixture(d13)).select(
        "domain", F.array_join("disallow", "|").alias("rules"), "crawl_delay"
    )


def _q_robots_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full crawl-politeness chain: parse the robots fixture, then
    broadcast-filter deterministic page URLs whose paths hit (or miss)
    the star-group Disallow prefixes, including the conservative
    wildcard-prefix match."""
    from pdf_to_epub_spark.operators import filter_disallowed, robots_rules

    d = _t(spark, sf_dir, "documents").select("doc_id")
    i = F.col("doc_id")
    path = (
        F.when(
            i % 4 == 0,
            F.concat(
                F.lit("/private"), (i % 13).cast("string"),
                F.lit("/p"), i.cast("string"), F.lit(".html"),
            ),
        )
        .when(i % 4 == 1, F.concat(F.lit("/ok/p"), i.cast("string"), F.lit(".html")))
        .when(
            i % 4 == 2,
            F.concat(F.lit("/only"), (i % 13).cast("string"), F.lit("/x")),
        )
        .otherwise(F.concat(F.lit("/tmp"), (i % 13).cast("string"), F.lit("zz")))
    )
    url = F.concat(
        F.lit("https://sub"), (i % 7).cast("string"),
        F.lit(".site"), (i % 13).cast("string"),
        F.lit(".example"), path,
    )
    pages = d.select("doc_id", url.alias("url"))
    d13 = d.select((i % 13).alias("r")).distinct()
    rules = robots_rules(_robots_fixture(d13))
    return filter_disallowed(pages, rules).select("doc_id", "url")


def _anchor_pages(d: DataFrame) -> DataFrame:
    """Deterministic anchor-text pages: a tag-wrapped double-spaced
    external anchor, a relative local anchor, a dropped mailto and a
    dropped empty/image anchor per doc."""
    i = F.col("doc_id")
    url = F.concat(
        F.lit("https://sub"), (i % 7).cast("string"),
        F.lit(".site"), (i % 13).cast("string"),
        F.lit(".example/a/page"), i.cast("string"), F.lit(".html"),
    )
    html = F.encode(
        F.concat(
            F.lit('<html><body><a href="https://t'), (i % 3).cast("string"),
            F.lit(".example/x"), (i % 5).cast("string"),
            F.lit('"><b>Guide  '), (i % 4).cast("string"),
            F.lit('</b></a><a href="/p'), i.cast("string"),
            F.lit('">Local '), (i % 2).cast("string"),
            F.lit('</a><a href="mailto:a@b.c">m</a>'),
            F.lit('<a href="https://t0.example/empty"> <img src="x"> </a>'),
            F.lit("</body></html>"),
        ),
        "UTF-8",
    )
    return d.select(url.alias("url"), html.alias("html"))


def _q_anchor_texts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anchor-text extraction: (url, target, anchor) with inner tags
    stripped, whitespace collapsed, empty/mailto anchors dropped and
    relative targets resolved (operators/urls.py extract_anchor_texts)."""
    from pdf_to_epub_spark.operators import extract_anchor_texts

    d = _t(spark, sf_dir, "documents").select("doc_id")
    return extract_anchor_texts(_anchor_pages(d)).select(
        "url", "target", "anchor"
    )


def _q_top_anchors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-target-domain top-2 anchor texts (count desc, lexical ties) —
    the aggregated web-IR signal over the same deterministic anchor
    pages."""
    from pdf_to_epub_spark.operators import (
        extract_anchor_texts,
        top_anchors_per_domain,
    )

    d = _t(spark, sf_dir, "documents").select("doc_id")
    return top_anchors_per_domain(
        extract_anchor_texts(_anchor_pages(d)), k=2
    ).select("domain", "anchor", "n_refs", F.col("rank").cast("long").alias("rank"))


def _q_canonical_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Publisher-declared URL dedup: every 3k+1 page declares page 3k as
    canonical (collapses onto it), every 3k+2 page declares one shared
    external canonical (the lexically-smallest member represents the
    cluster), 3k pages stand alone."""
    from pdf_to_epub_spark.operators import canonical_dedup

    d = _t(spark, sf_dir, "documents").select("doc_id")
    i = F.col("doc_id")
    url = F.concat(F.lit("https://d.example/p"), i.cast("string"))
    canon = (
        F.when(
            i % 3 == 1,
            F.concat(
                F.lit('<link rel="canonical" href="https://d.example/p'),
                (i - 1).cast("string"), F.lit('">'),
            ),
        )
        .when(
            i % 3 == 2,
            F.lit('<link rel="canonical" href="https://x.example/shared">'),
        )
        .otherwise(F.lit(""))
    )
    html = F.encode(
        F.concat(F.lit("<html><head>"), canon, F.lit("</head><body>x</body></html>")),
        "UTF-8",
    )
    pages = d.select("doc_id", url.alias("url"), html.alias("html"))
    return canonical_dedup(pages).select("doc_id", "url")


def _q_sitemap_urls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sitemap scan over deterministic XML: even docs are urlsets (one
    plain and one CDATA loc), odd docs are sitemapindexes (one child
    sitemap loc) — the frontier-seeding walk, JVM-side."""
    from pdf_to_epub_spark.operators import extract_sitemap_urls

    d = _t(spark, sf_dir, "documents").select("doc_id")
    i = F.col("doc_id")
    urlset = F.concat(
        F.lit('<?xml version="1.0"?><urlset><url><loc> https://s'),
        (i % 3).cast("string"), F.lit(".example/u"), i.cast("string"),
        F.lit(" </loc></url><url><loc><![CDATA[https://s"),
        (i % 3).cast("string"), F.lit(".example/c"), i.cast("string"),
        F.lit("]]></loc></url></urlset>"),
    )
    index = F.concat(
        F.lit('<?xml version="1.0"?><sitemapindex><sitemap><loc>'),
        F.lit("https://s"), (i % 3).cast("string"),
        F.lit(".example/child"), i.cast("string"),
        F.lit(".xml</loc></sitemap></sitemapindex>"),
    )
    xml = F.encode(F.when(i % 2 == 0, urlset).otherwise(index), "UTF-8")
    sitemaps = d.select(
        F.concat(
            F.lit("https://s"), (i % 3).cast("string"),
            F.lit(".example/sm"), i.cast("string"), F.lit(".xml"),
        ).alias("url"),
        xml.alias("xml"),
    )
    return extract_sitemap_urls(sitemaps).select("url", "loc", "is_index")


def _q_crawl_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed next-wave frontier over the shared link pages:
    outlinks → canonicalized distinct targets → minus the (even-doc ext)
    crawled set → per-domain cap of 5 in lexical order."""
    from pdf_to_epub_spark.operators import crawl_frontier

    d = _t(spark, sf_dir, "documents").select("doc_id")
    i = F.col("doc_id")
    pages = _link_pages(d, extra_anchors=True)
    crawled = d.where(i % 2 == 0).select(
        F.concat(
            F.lit("https://ext"), (i % 5).cast("string"),
            F.lit(".example.org/x"), i.cast("string"),
        ).alias("url")
    )
    return crawl_frontier(pages, crawled, per_domain_limit=5).select(
        "domain", "target", F.col("rank").cast("long").alias("rank")
    )


def _q_recrawl_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot diff between two deterministic crawls: every 11th page
    vanishes, every 5th changes text, every 13th gains a new sibling —
    the re-crawl scheduler's added/removed/changed/unchanged statuses."""
    from pdf_to_epub_spark.operators import recrawl_diff

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    i = F.col("doc_id")
    url = F.concat(F.lit("https://d.example/p"), i.cast("string"))
    old = d.select(url.alias("url"), "text")
    changed = F.when(i % 5 == 0, F.concat(F.col("text"), F.lit("X"))).otherwise(
        F.col("text")
    )
    new = (
        d.where(i % 11 != 0)
        .select(url.alias("url"), changed.alias("text"))
        .unionByName(
            d.where(i % 13 == 0).select(
                F.concat(F.lit("https://d.example/new"), i.cast("string")).alias(
                    "url"
                ),
                "text",
            )
        )
    )
    return recrawl_diff(old, new).select("url", "status")


def _q_crawl_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The politeness-aware fetch plan over the composed frontier: the
    Crawl-delay domains (r%3==1 in the robots fixture) pace at 2 s, all
    others at the 1 s default — eta_s = (rank−1)·delay."""
    from pdf_to_epub_spark.operators import (
        crawl_frontier,
        crawl_schedule,
        robots_rules,
    )

    d = _t(spark, sf_dir, "documents").select("doc_id")
    i = F.col("doc_id")
    pages = _link_pages(d, extra_anchors=True)
    crawled = d.where(i % 2 == 0).select(
        F.concat(
            F.lit("https://ext"), (i % 5).cast("string"),
            F.lit(".example.org/x"), i.cast("string"),
        ).alias("url")
    )
    frontier = crawl_frontier(pages, crawled, per_domain_limit=5)
    d13 = d.select((i % 13).alias("r")).distinct()
    rules = robots_rules(_robots_fixture(d13))
    return crawl_schedule(frontier, rules).select(
        "domain",
        "target",
        F.col("rank").cast("long").alias("rank"),
        F.round("eta_s", 6).alias("eta_s"),
    )


def _q_url_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL-shape quality signals over deterministically-dirty URLs
    (hyphened hosts, digit-heavy paths, variable-depth paths, optional
    query strings); the oracle recomputes every feature with DuckDB's own
    string functions over the same constructed URL — an independent
    implementation, not a closed form."""
    from pdf_to_epub_spark.operators import url_quality_features

    d = _t(spark, sf_dir, "documents").select("doc_id")
    i = F.col("doc_id")
    url = F.concat(
        F.lit("https://"),
        F.when(i % 3 == 0, F.lit("my-spam-")).otherwise(F.lit("s")),
        F.lit("site"), (i % 13).cast("string"), F.lit(".example"),
        F.when(i % 4 == 0, F.concat(F.lit("/a/b"), i.cast("string"))).otherwise(
            F.lit("/p")
        ),
        F.lit("/page"), i.cast("string"), F.lit(".html"),
        F.when(i % 5 == 0, F.lit("?x=1&utm_source=9&y=22")).otherwise(F.lit("")),
    )
    return url_quality_features(d.select("doc_id", url.alias("url"))).select(
        "doc_id", "url_len", "host_len", "host_hyphens", "path_depth",
        "n_digits", "digit_ratio", "n_params",
    )


def _q_term_postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted index over the documents table: one row per (term, doc)
    with the term frequency — the retrieval-side companion to the dedup
    shingle index (operators/ir.py; one (term, doc)-keyed shuffle)."""
    from pdf_to_epub_spark.operators import term_postings

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return term_postings(d).select("term", "doc_id", "tf")


def _q_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 ranked retrieval (Lucene idf variant, k1=1.2 b=0.75) for the
    query {spark, window, merge}: top-25 docs by rounded score.  The
    oracle replays the full math — df, avgdl, idf, per-term weight —
    in DuckDB SQL; ranking uses the ROUNDED score + doc_id so the k-cut
    is engine-reproducible."""
    from pdf_to_epub_spark.operators import bm25_topk

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return bm25_topk(d, ["spark", "window", "merge"], k=25)


def _q_tfidf_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Smoothed TF-IDF weights per (term, doc) over the full postings
    table — (1+ln tf)·ln((1+N)/(1+df)), 6-dp rounded."""
    from pdf_to_epub_spark.operators import tfidf_weights

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return tfidf_weights(d).select("term", "doc_id", "tf", "df", "tfidf")


def _q_phrase_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 3-token phrase retrieval over text with residue-planted
    phrases (full phrase, 2/3 prefix, none).  The Spark plan is the
    positional-postings adjacency-join chain; the oracle is an
    INDEPENDENT algorithm — a boundary-anchored regex over the raw
    text — so agreement is cross-algorithm, not replay."""
    from pdf_to_epub_spark.operators import phrase_search

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    i = F.col("doc_id")
    txt = F.concat(
        F.substring("text", 1, 120),
        F.when(i % 5 == 0, F.lit(" spark window merge end"))
        .when(i % 5 == 1, F.lit(" spark window only"))
        .otherwise(F.lit(" filler")),
    )
    return phrase_search(
        d.select("doc_id", txt.alias("text")), ["spark", "window", "merge"]
    ).select("doc_id")


def _q_boolean_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean retrieval (spark AND window AND NOT slow) as posting-list
    set algebra (intersect/except on slim id sets); the oracle checks
    token membership per document directly."""
    from pdf_to_epub_spark.operators import boolean_search

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return boolean_search(d, ["spark", "window"], ["slow"]).select("doc_id")


def _q_proximity_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Proximity retrieval (ir.proximity_search): docs where 'spark' and
    'window' co-occur within 12 token positions, plus the min distance —
    zero-shuffle array algebra vs an independent positional self-join
    oracle."""
    from pdf_to_epub_spark.operators.ir import proximity_search

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return proximity_search(d, "spark", "window", window=12)


def _q_update_postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental index maintenance for a daily re-crawl: even docs form
    yesterday's index, odd docs are new, every fourth doc is re-crawled
    with truncated text (delete + re-add) — the final index must equal a
    from-scratch build over the logical corpus, which is exactly what
    the oracle computes."""
    from pdf_to_epub_spark.operators import term_postings, update_postings

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    evens = d.filter(F.col("doc_id") % 2 == 0)
    old = term_postings(evens)
    recrawl = d.filter(F.col("doc_id") % 4 == 0).select(
        "doc_id", F.substring("text", 1, 100).alias("text")
    )
    news = (
        d.filter(F.col("doc_id") % 2 == 1)
        .select("doc_id", "text")
        .unionByName(recrawl)
    )
    deleted = d.filter(F.col("doc_id") % 4 == 0).select("doc_id")
    return update_postings(old, news, deleted).select("term", "doc_id", "tf")


def _q_keyword_snippets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KWIC snippet (25 chars context each side of the first whole-token
    'merge') per document, NULL when absent — the same lookaround-free
    regex runs under Java and RE2."""
    from pdf_to_epub_spark.operators import keyword_snippets

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return keyword_snippets(d, "merge", width=25).select(
        "doc_id", "snippet"
    )


def _q_dedup_cluster_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-size histogram of the transitive near-dup components —
    the audit a dedup run ships with (how much mass sits in how-big
    clusters); oracled against the recursive-CTE true components."""
    from pdf_to_epub_spark.operators import (
        connected_components,
        minhash_candidate_pairs,
    )

    corpus = mutated_recrawl(spark, sf_dir)
    pairs = minhash_candidate_pairs(
        corpus, k=3, num_hashes=32, bands=8, jaccard_threshold=0.7
    )
    comps = connected_components(
        pairs.select("id_a", "id_b"), corpus.select("doc_id")
    )
    return (
        comps.groupBy("component")
        .agg(F.count(F.lit(1)).cast("long").alias("size"))
        .groupBy("size")
        .agg(F.count(F.lit(1)).cast("long").alias("n_clusters"))
    )


def _q_script_ratios(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unicode script-mix signal over deterministically multilingual text
    (residue-selected Cyrillic/Greek/CJK snippets appended to the Latin
    base) — counts, Latin share, and the fixed-precedence dominant
    label, all replayed by the oracle with the same literal ranges."""
    from pdf_to_epub_spark.operators import script_ratios

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    i = F.col("doc_id")
    txt = F.concat(
        F.substring("text", 1, 30),
        F.when(i % 4 == 0, F.lit(" привет мир здравствуй"))
        .when(i % 4 == 1, F.lit(" γειά σου κόσμε"))
        .when(i % 4 == 2, F.lit(" 你好世界再见"))
        .otherwise(F.lit(" plain")),
        F.when(i % 8 == 2, F.lit(" 漢字漢字漢字漢字漢字漢字漢字漢字漢字漢字漢字漢字漢字漢字"))
        .otherwise(F.lit("")),
    )
    return script_ratios(d.select("doc_id", txt.alias("text"))).select(
        "doc_id", "n_latin", "n_cyrillic", "n_greek", "n_cjk",
        "latin_ratio", "dominant_script",
    )


def _q_event_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-hour rollup of the events table keyed
    (bucket, event_type) — epoch-arithmetic windows, no timezone
    dependence."""
    from pdf_to_epub_spark.operators import hourly_rollup

    e = _t(spark, sf_dir, "events")
    return hourly_rollup(e).select(
        "bucket_epoch", "event_type", "n_events", "sum_value", "avg_value"
    )


def _q_bigram_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collocation mining (PMI over adjacent word pairs, min_count=5)
    over the documents table; the oracle replays bigram construction via
    generate_series indexing and the exact division/multiplication
    order."""
    from pdf_to_epub_spark.operators import bigram_pmi

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return bigram_pmi(d, min_count=5).select("w1", "w2", "c_ab", "pmi")


def _q_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language top-5 terms by corpus frequency with deterministic
    tie-break (count desc, term asc) — the group-wise top-k pattern
    windowed over the aggregated vocabulary table."""
    from pdf_to_epub_spark.operators import top_terms

    d = _t(spark, sf_dir, "documents").select("lang", "text")
    return top_terms(d, group_col="lang", k=5).select(
        "lang", "term", "n", "rank"
    )


def _q_compression_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """zlib compression-ratio quality signal over residue-deterministic
    text (repeated prose + run-length junk, 13 classes) — the one
    pandas_udf quality signal; the oracle is a pure-Python zlib replay
    of the 13 classes joined back on doc_id % 13."""
    from pdf_to_epub_spark.operators import compression_ratio

    d = _t(spark, sf_dir, "documents").select("doc_id")
    txt = F.concat(
        F.expr(
            "repeat('lorem ipsum dolor sit amet ',"
            " cast(doc_id % 13 as int) + 1)"
        ),
        F.expr("repeat('ab', 10 * cast(doc_id % 13 as int))"),
        F.lit(" tail "),
        (F.col("doc_id") % 13).cast("string"),
    )
    return compression_ratio(d.select("doc_id", txt.alias("text"))).select(
        "doc_id", "compression_ratio"
    )


def _compression_oracle() -> str:
    """Golden VALUES: the 13 residue-class ratios computed by the same
    pure-Python zlib call the pandas_udf makes."""
    import zlib

    vals = []
    for r in range(13):
        t = (
            "lorem ipsum dolor sit amet " * (r + 1)
            + "ab" * (10 * r)
            + " tail "
            + str(r)
        )
        raw = t.encode("utf-8")
        vals.append(f"({r}, {round(len(zlib.compress(raw, 6)) / len(raw), 6)!r})")
    rows = ",\n            ".join(vals)
    return f"""
        WITH golden(r, ratio) AS (VALUES
            {rows})
        SELECT d.doc_id, g.ratio::DOUBLE AS compression_ratio
        FROM documents d JOIN golden g ON d.doc_id % 13 = g.r
    """


def _q_corpus_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-level corpus profile (leaf / per-lang / grand total) in one
    ROLLUP aggregate — three report levels for one shuffle."""
    from pdf_to_epub_spark.operators import corpus_rollup

    d = _t(spark, sf_dir, "documents").select("lang", "source", "n_chars")
    return corpus_rollup(d).select(
        "lang", "source", "gid", "n_docs", "total_chars", "avg_chars"
    )


def _q_sentence_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sentence segmentation stats over deterministically-punctuated text
    (fragments of the document joined by './!/?' terminators, residue-
    varied tails) — the RE2-portable segmentation replayed in DuckDB via
    list_transform/list_filter."""
    from pdf_to_epub_spark.operators import sentence_stats

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    i = F.col("doc_id")
    txt = F.concat(
        F.substring("text", 1, 40), F.lit(". "),
        F.substring("text", 41, 60), F.lit("! "),
        F.substring("text", 101, 50),
        F.when(i % 3 == 0, F.lit("? Short tail.")).otherwise(F.lit("...")),
    )
    return sentence_stats(d.select("doc_id", txt.alias("text"))).select(
        "doc_id", "n_sentences", "avg_sentence_chars",
        "max_sentence_chars", "short_sentence_ratio",
    )


def _q_dedup_paragraphs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-global exact paragraph dedup over docs carrying a shared
    boilerplate header, a unique body paragraph, and a 7-way shared
    footer — the header survives once, each footer 7 times fewer, every
    body paragraph always."""
    from pdf_to_epub_spark.operators import dedup_paragraphs

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    i = F.col("doc_id")
    txt = F.concat_ws(
        "\n\n",
        F.lit("Shared boilerplate header unit"),
        F.concat(F.substring("text", 1, 80), F.lit(" tail "), i.cast("string")),
        F.concat(F.lit("Footer block "), (i % 7).cast("string")),
    )
    return dedup_paragraphs(d.select("doc_id", txt.alias("text"))).select(
        "doc_id", "text", "n_paras", "n_kept"
    )


def _q_html_outline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heading outline (h1–h6 in document order) over deterministic pages
    exercising mixed case, nested inline tags, attribute-bearing open
    tags, and whitespace-bearing close tags."""
    from pdf_to_epub_spark.operators import extract_headings

    d = _t(spark, sf_dir, "documents").select("doc_id")
    i = F.col("doc_id")
    html = F.encode(
        F.concat(
            F.lit('<html><body><h1 class="t">Doc '), i.cast("string"),
            F.lit("</h1>"),
            F.when(
                i % 3 == 0,
                F.concat(
                    F.lit("<h2> Intro <em>"), i.cast("string"),
                    F.lit("</em></h2><p>xx</p><h2>Methods</h2>"),
                ),
            )
            .when(i % 3 == 1, F.lit("<H2>Only</H2>"))
            .otherwise(F.lit("")),
            F.when(
                i % 4 == 0,
                F.concat(F.lit("<h3>Deep "), (i % 5).cast("string"),
                         F.lit("</h3 >")),
            ).otherwise(F.lit("")),
            F.lit("</body></html>"),
        ),
        "UTF-8",
    )
    return extract_headings(d.select("doc_id", html.alias("html"))).select(
        "doc_id", "pos", "level", "heading"
    )


def _q_html_tables(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HTML table extraction (tables → rows → joined cell texts) over
    deterministic pages with th/td mixes, inline markup in cells,
    attribute-bearing tr/td tags, variable row counts, and a second
    table on every fourth page."""
    from pdf_to_epub_spark.operators import extract_tables

    d = _t(spark, sf_dir, "documents").select("doc_id")
    i = F.col("doc_id")
    r1 = F.concat(
        F.lit("<tr><td>a"), i.cast("string"),
        F.lit("</td><td><b>bold</b> "), (i % 9).cast("string"),
        F.lit("</td></tr>"),
    )
    r2 = F.lit("<tr ><td>x</td><td>y</td></tr>")
    r3 = F.concat(
        F.lit("<tr><td colspan=2>wide "), (i % 4).cast("string"),
        F.lit("</td></tr>"),
    )
    html = F.encode(
        F.concat(
            F.lit('<html><body><table id="t">'),
            F.lit("<tr><th>Name</th><th> Value </th></tr>"),
            r1,
            F.when(i % 3 >= 1, r2).otherwise(F.lit("")),
            F.when(i % 3 == 2, r3).otherwise(F.lit("")),
            F.lit("</table>"),
            F.when(
                i % 4 == 0, F.lit("<table><tr><td>z</td></tr></table >")
            ).otherwise(F.lit("")),
            F.lit("</body></html>"),
        ),
        "UTF-8",
    )
    return extract_tables(d.select("doc_id", html.alias("html"))).select(
        "doc_id", "table_id", "row_id", "n_cells", "cells"
    )


def _q_domain_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-registrable-domain corpus stats over deterministically-built
    urls (7 subdomains × 13 domains) — the quota/filter input table."""
    from pdf_to_epub_spark.operators import domain_stats

    doc_id = F.col("doc_id")
    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    url = F.concat(
        F.lit("http://sub"), (doc_id % 7).cast("string"),
        F.lit(".site"), (doc_id % 13).cast("string"),
        F.lit(".com/p/"), doc_id.cast("string"),
    )
    return domain_stats(d.select(url.alias("url"), "text")).select(
        "domain", F.col("n_docs").cast("long").alias("n_docs"), "total_chars"
    )


def _q_url_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization over deterministically-built dirty URLs (mixed
    host case, default ports, tracking params, unsorted queries,
    fragments); every rule is replayed by the DuckDB oracle — RE2-portable
    patterns by construction (operators/urls.py)."""
    from pdf_to_epub_spark.operators import canonicalize_urls

    doc_id = F.col("doc_id")
    d = _t(spark, sf_dir, "documents").select("doc_id")
    url = F.concat(
        F.lit("HTTP://Example.COM"),
        F.when(doc_id % 2 == 0, F.lit(":80")).otherwise(F.lit("")),
        F.lit("/Path/"),
        doc_id.cast("string"),
        F.when(doc_id % 3 == 0, F.lit("?utm_source=feed&b=2&a=1"))
        .when(doc_id % 3 == 1, F.lit("?z=9&a=1&fbclid=XYZ"))
        .otherwise(F.lit("")),
        F.when(doc_id % 5 == 0, F.lit("#frag")).otherwise(F.lit("")),
    )
    return canonicalize_urls(d.select("doc_id", url.alias("url"))).select(
        "doc_id", "canon_url"
    )


def _q_quality_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fused pre-training quality gate, arrow engine: Gopher + line-dup
    signals in codegen column algebra and the top-bigram coverage in a
    vectorized Arrow batch — ZERO shuffles (plan-pinned in tests).  The
    oracle replays the relational composition (gopher ⋈ repetition) in
    DuckDB, so the per-row histogram path is verified against the
    explode/groupBy algebra term-for-term."""
    _ship_package(spark)
    from pdf_to_epub_spark.operators import quality_gate

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    out = quality_gate(d, id_col="doc_id", min_words=20, max_words=100_000)
    return out.select(
        "doc_id", "keep", "dup_line_ratio", "dup_line_char_ratio",
        "top_bigram_char_ratio", "keep_all",
    )


def _q_repetition_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher repetition filters over documents: duplicate-line fractions
    (count + char mass) and top-2-gram char coverage; the bigram leg is the
    explode → groupBy → window path (linear, unlike the O(len²) in-array
    count), recomputed relationally by the oracle."""
    from pdf_to_epub_spark.operators import repetition_signals

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return repetition_signals(d)


def _q_incremental_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily-recrawl near-dup: yesterday's run left a signature store for
    the original documents; today's batch (the mutated copies, found
    pending by the resume anti-join shape) gets signatures computed ONLY
    for itself, appended to the store, and LSH-joined new-vs-all.  Output
    must equal the batch minhash_pairs run restricted to pairs touching a
    new id (old–old near-dups were yesterday's output); the oracle is the
    brute-force shingle-Jaccard set under the same restriction."""
    import tempfile

    from pdf_to_epub_spark.operators import (
        incremental_near_dup_pairs,
        minhash_signatures,
    )

    corpus = mutated_recrawl(spark, sf_dir)
    old = corpus.where(F.col("doc_id") < 1_000_000)
    store = tempfile.mkdtemp(prefix="sigstore_") + "/signatures"
    minhash_signatures(old, k=3, num_hashes=32).write.parquet(store)
    pending = corpus.where(F.col("doc_id") >= 1_000_000).select("doc_id")
    return incremental_near_dup_pairs(
        corpus, pending, store, k=3, num_hashes=32, bands=8,
        jaccard_threshold=0.7,
    ).select("id_a", "id_b", F.round("jaccard", 4).alias("jaccard"))


def _q_dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transitive near-dup clustering: connected components (iterative
    min-label propagation) over the verified MinHash pair graph — every
    doc labeled with the smallest id reachable through any pair chain
    (singletons keep their own id).  The oracle recomputes true components
    from the brute-force pair set with a recursive CTE, so the iterative
    algorithm is hash-checked, not rows-only."""
    from pdf_to_epub_spark.operators import (
        connected_components,
        minhash_candidate_pairs,
    )

    corpus = mutated_recrawl(spark, sf_dir)
    pairs = minhash_candidate_pairs(
        corpus, k=3, num_hashes=32, bands=8, jaccard_threshold=0.7
    )
    return connected_components(
        pairs.select("id_a", "id_b"), corpus.select("doc_id")
    )


def _q_dedup_near_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate REMOVAL end-to-end: the mutated-recrawl corpus after
    drop_near_duplicates must keep exactly the ids that never appear as
    the higher id of a true near-dup pair (greedy keep-lowest policy) —
    the oracle recomputes the survivor set from brute-force shingle
    Jaccard."""
    from pdf_to_epub_spark.operators import drop_near_duplicates

    kept = drop_near_duplicates(
        mutated_recrawl(spark, sf_dir),
        k=3, num_hashes=32, bands=8, jaccard_threshold=0.7,
    )
    return kept.select("doc_id")


def _q_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs with the md5-based 60-bit token hash so the
    whole fingerprint pipeline is reproducible in the DuckDB oracle.  The
    banding is pigeonhole-exact for Hamming ≤ max_hamming, so the output
    must equal the oracle's brute-force all-pairs set — an exact oracle,
    not a recall assertion.  (The scale path keeps the faster xxhash64
    default; same operator, same plan shape.)"""
    from pdf_to_epub_spark.operators import md5_hash60, simhash_near_pairs

    return simhash_near_pairs(
        mutated_recrawl(spark, sf_dir), max_hamming=3, token_hash=md5_hash60
    ).select("id_a", "id_b", F.col("hamming").cast("long").alias("hamming"))


def _q_ann_topk_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-table hyperplane LSH top-k (bits=4 × 12 tables ⇒ recall@10 ≈
    0.90 on this uniform-random corpus — ANN's worst case; the candidate
    union covers ~53% of it, the recall/scan-fraction trade the table
    count controls.  Audited against the brute-force oracle by
    tests/test_training_ops.py and reported in bench.py)."""
    from pdf_to_epub_spark.operators import lsh_topk

    e = _t(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    q = e.where("vec_id < 5").select(F.col("vec_id").alias("query_id"), "embedding")
    return lsh_topk(e, q, dim=64, k=10, bits=4, n_tables=12)


def _q_embedding_near_dups_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed embedding near-dup — the SCALE path (the all-pairs
    `embedding_near_pairs` is its sf-small verification form).  Construction
    with guaranteed recall: the corpus is unioned with positively-scaled
    copies (×1.001), whose hyperplane signatures are bit-identical to the
    originals (sign(v·r) is scale-invariant), so every true pair (cosine=1)
    shares every bucket deterministically; natural pairs top out at ~0.51
    cosine on this corpus, far below the 0.99 threshold."""
    from pdf_to_epub_spark.operators import embedding_near_duplicates

    e = _t(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    scaled = e.select(
        (F.col("vec_id") + F.lit(1_000_000)).alias("vec_id"),
        F.transform("embedding", lambda x: x * F.lit(1.001)).alias("embedding"),
    )
    return embedding_near_duplicates(
        e.union(scaled), dim=64, threshold=0.99, bits=10
    )


def _q_asof_latest_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (custom operator — Spark has no native one): for each
    event, the customer's most recent order at event time.  Implemented as
    the single-shuffle union-sort-window construction; oracle uses DuckDB's
    native ASOF JOIN."""
    from pdf_to_epub_spark.operators.asof import asof_join

    e = _t(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    o = (
        _t(spark, sf_dir, "orders")
        .groupBy("o_custkey", "o_orderdate")
        .agg(F.max("o_orderkey").alias("o_orderkey"))
    )
    joined = asof_join(
        e, o,
        key_left="user_id", key_right="o_custkey",
        time_left="ts", time_right="o_orderdate",
        value_cols=["o_orderkey"],
    )
    return joined.select("event_id", "o_orderkey")


def _q_event_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (lag + conditional cumsum)."""
    from pdf_to_epub_spark.operators.asof import sessionize

    e = _t(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    out = sessionize(e, gap_seconds=3600, order_tiebreak="event_id")
    return out.select("event_id", F.col("session_id").cast("long").alias("session_id"))


def _q_example_samples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4/O3 truncated example sampling: keep the first ≤5 examples per
    group (reference keeps ≤5 header-block examples per log,
    Step1_ocr_cleanup_v11.py:184-191) — slice(sort_array(collect_list))."""
    e = _t(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.concat_ws(
            ",",
            F.slice(F.sort_array(F.collect_list(F.col("event_id"))), 1, 5),
        ).alias("first_ids"),
        F.count("*").alias("n_events"),
    )


def _q_shard_merge_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S6/S7/S8 lossless roundtrip: split each document into span-addressed
    Document-AI-style JSON shards, parse with from_json, slice spans, merge
    in shard order — merged length must equal the original text length
    (which is exactly what the DuckDB oracle computes independently)."""
    from pyspark.sql import functions as FF

    from pdf_to_epub_spark.sources.shards import (
        make_shards_from_documents,
        merge_shards,
        parse_shard_json,
        shard_text_plain,
    )

    docs = _t(spark, sf_dir, "documents").select(
        FF.col("doc_id"), FF.col("text")
    )
    shards = make_shards_from_documents(
        docs.withColumnRenamed("doc_id", "url"), n_shards=4
    )
    parsed = parse_shard_json(shards).withColumn(
        "shard_text", shard_text_plain(F.col("shard"))
    )
    merged = merge_shards(parsed)
    return merged.select(
        F.col("url").cast("long").alias("doc_id"),
        F.length("text").cast("long").alias("merged_len"),
    )


def _q_shard_pagebreak_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S7 page-break-aware span scan: each synthesized shard carries one
    page covering its whole text, so the jq-parity extractor emits
    shard_text + sentinel per shard and the merged length is exactly
    len(text) + n_shards · len(sentinel) — pure arithmetic for the
    oracle."""
    from pdf_to_epub_spark.sources.shards import (
        make_shards_from_documents,
        merge_shards,
        parse_shard_json,
        shard_text_with_pagebreaks,
    )

    docs = _t(spark, sf_dir, "documents").select(
        F.col("doc_id"), F.col("text")
    )
    shards = make_shards_from_documents(
        docs.withColumnRenamed("doc_id", "url"), n_shards=4
    )
    parsed = parse_shard_json(shards).withColumn(
        "shard_text", shard_text_with_pagebreaks(F.col("shard"))
    )
    merged = merge_shards(parsed)
    return merged.select(
        F.col("url").cast("long").alias("doc_id"),
        F.length("text").cast("long").alias("merged_len"),
    )


def _q_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal decode: binary payload + typed metadata → features via
    Arrow-batched mapInPandas.  Decode is REAL where the stdlib suffices
    (BMP pixels, WAV PCM, GIF block walk, PNG/JPEG headers, MP3 frame
    walk, MP4 box walk); ID3/ftyp wrappers around junk surface as honest
    ``unsupported`` (audio/video payload codecs absent in this image).
    Oracle: the corpus is deterministic, so expected features are computed
    once by the same pure codecs and inlined as a VALUES golden
    (_media_features_oracle); the Spark side exercises the JVM sniff +
    Arrow batch path end-to-end against it."""
    _ship_package(spark)
    from pdf_to_epub_spark.operators.multimodal import (
        extract_media_features,
        make_media_corpus,
    )

    media = spark.createDataFrame(
        make_media_corpus(200),
        "media_id long, url string, media_type string, payload binary",
    )
    feats = extract_media_features(media, salt_partitions=8)
    return feats.select(
        "media_id", "media_type", "container", "n_bytes", "width", "height",
        "n_frames", "status",
    )


def _q_dup_ngram_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicated-substring spans (Lee et al. substring-level dedup):
    maximal token intervals covered by corpus-repeated 8-grams over the
    mutated-recrawl corpus — each doc's surviving prefix is an exact
    duplicate of its recrawl partner, so spans must recover it."""
    from pdf_to_epub_spark.operators import duplicate_ngram_spans

    return duplicate_ngram_spans(
        mutated_recrawl(spark, sf_dir), id_col="doc_id", k=8
    ).select("doc_id", "span_start", "span_end", "n_tokens")


def _q_masked_dup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Actionable substring dedup: documents rebuilt with their duplicated
    spans removed (case-preserving token rebuild, hash-compared)."""
    from pdf_to_epub_spark.operators import mask_duplicate_spans

    out = mask_duplicate_spans(mutated_recrawl(spark, sf_dir), id_col="doc_id", k=8)
    return out.select(
        "doc_id", F.md5(F.col("text")).alias("masked_md5"), "n_masked_tokens"
    )


def _q_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs via inverted-index pre-join."""
    from pdf_to_epub_spark.operators import ngram_jaccard_pairs

    return ngram_jaccard_pairs(
        mutated_recrawl(spark, sf_dir), k=4, threshold=0.8
    ).select("id_a", "id_b", F.round("jaccard", 4).alias("jaccard"))


def _q_pdf_extract_blocks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PDF/layout-parse surface, oracled end-to-end: each documents row is
    rendered into a real PDF (sources/pdf.make_pdf_bytes — FlateDecode
    content streams, xref, page tree) whose per-page blocks are emitted in
    a doc-seeded SCRAMBLED content order; the parse side inflates the
    streams, walks the BT/ET text operators, and the reading-order stage
    must reconstruct the layout from (page, y, x) coordinates and classify
    blocks by font size.  The oracle recomputes the expected reading-order
    lines relationally from the raw text — so a parser that trusts content
    order, mis-tracks Td, or drops a page fails the hash."""
    _ship_package(spark)
    from pdf_to_epub_spark.sources.pdf import (
        blocks_in_reading_order,
        documents_as_pdfs,
        parse_pdf_payloads,
    )

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", F.coalesce(F.col("text"), F.lit("")).alias("text")
    )
    blocks = blocks_in_reading_order(parse_pdf_payloads(documents_as_pdfs(docs)))
    return blocks.select(
        "doc_id",
        F.col("block_id").cast("long").alias("block_id"),
        F.col("page").cast("long").alias("page"),
        "block_type",
        "text",
    )


def _q_binary_decode_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-source surface, oracled end-to-end: the documents table is
    wrapped into ``html: binary`` pages JVM-side (exact replica of
    sources/synth.wrap_html), decoded back through the Arrow-batched pandas
    UDF, and run through the full extraction — per-url output hashes must
    equal the reference-pipeline goldens, proving the binary decode path is
    byte-transparent."""
    _ship_package(spark)
    from pdf_to_epub_spark.operators import (
        assemble_documents,
        blocks_table,
        decode_binary_pages,
        extract_documents,
    )

    docs = _docs_as_pages(_t(spark, sf_dir, "documents"))
    body = _html_escape_expr(F.col("text"))
    page = F.concat(
        F.lit("<html><head><title>"), F.col("url"),
        F.lit("</title></head><body><pre>"), body,
        F.lit("</pre></body></html>"),
    )
    pages = docs.select(
        "url", "warc_ts", "lang", F.encode(page, "UTF-8").alias("html")
    )
    decoded = decode_binary_pages(pages)
    asm = assemble_documents(blocks_table(extract_documents(decoded)))
    return asm.select(
        "url",
        F.sha2(F.encode("assembled_text", "UTF-8"), 256).alias("text_sha"),
        F.length("assembled_text").cast("long").alias("n_chars"),
    )


def _q_ann_topk_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF approximate top-k: coarse-quantizer cells + nprobe probing
    (the second ANN scale path alongside the LSH buckets)."""
    from pdf_to_epub_spark.operators import ivf_topk

    e = _t(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    q = e.where("vec_id < 5").select(F.col("vec_id").alias("query_id"), "embedding")
    return ivf_topk(e, q, k=10, n_centroids=16, nprobe=10)


def _q_extraction_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extraction-quality eval harness (operators/evaluate.py
    `token_overlap_eval`): a NAIVE tag-strip extractor over the synthetic
    boilerplate pages is scored against the ground-truth main content —
    recall stays 1.0 (stripping never loses article tokens) while
    precision drops to the boilerplate fraction, which is exactly the gap
    the link-density classifier closes (`html_boilerplate_extract` is
    byte-perfect on the same pages).  The oracle rebuilds the page, the
    strip, and the multiset P/R/F1 relationally."""
    from pdf_to_epub_spark.operators import token_overlap_eval

    d = _t(spark, sf_dir, "documents")
    pair = d.select(
        "doc_id",
        F.regexp_replace(_boilerplate_page_expr(), "<[^>]*>", " ").alias(
            "pred"
        ),
        F.concat(
            F.lit("Document\n"), F.coalesce(F.col("text"), F.lit(""))
        ).alias("gold"),
    )
    return token_overlap_eval(pair)


def _q_bpe_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-BPE-merge pair statistics (textstats.bpe_pair_counts):
    within-word adjacent character pairs weighted by corpus word
    frequency, overlapping occurrences counted separately — all symbol
    work on the vocabulary table, never the corpus."""
    from pdf_to_epub_spark.operators import bpe_pair_counts

    return bpe_pair_counts(
        _t(spark, sf_dir, "documents"), min_weight=5
    )


def _q_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The first 8 learned BPE merges (textstats.bpe_learn_merges) — an
    iterative distributed algorithm: per round one vocabulary-sized pair
    aggregation, a 1-row argmax collect, and a greedy HOF rewrite of the
    symbol arrays.  The oracle is an independent pure-Python Sennrich
    replay over the same parquet (golden-VALUES pattern)."""
    from pdf_to_epub_spark.operators import bpe_learn_merges

    return bpe_learn_merges(
        _t(spark, sf_dir, "documents"), n_merges=8, min_weight=2
    )


def _q_jsonld_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-LD structured-data mining (urls.extract_jsonld): pages carry
    an Article block, every 5th a second BreadcrumbList block, every 7th
    a MALFORMED block — typed fields must parse out via the real JSON
    parser and the bad block must yield NULLs, not errors.  The oracle
    replays block extraction and uses DuckDB's JSON parser behind a
    json_valid guard (its extract raises where Spark's returns null)."""
    from pdf_to_epub_spark.operators import extract_jsonld

    d = _t(spark, sf_dir, "documents")
    sid = F.col("doc_id").cast("string")
    day = F.lpad(((F.col("doc_id") % 28) + 1).cast("string"), 2, "0")
    article = F.concat(
        F.lit('{"@type":"Article","name":"Document '), sid,
        F.lit('","datePublished":"2025-01-'), day, F.lit('"}'),
    )
    crumbs = F.when(
        (F.col("doc_id") % 5) == 0,
        F.concat(
            F.lit('<script type="application/ld+json">'
                  '{"@type":"BreadcrumbList","name":"crumbs '),
            sid, F.lit('"}</script>'),
        ),
    ).otherwise(F.lit(""))
    bad = F.when(
        (F.col("doc_id") % 7) == 3,
        F.lit('<script type="application/ld+json">{oops not json'
              "</script>"),
    ).otherwise(F.lit(""))
    html = F.concat(
        F.lit('<html><head><script type="application/ld+json">'),
        article,
        F.lit("</script>"), crumbs, bad,
        F.lit("</head><body>x</body></html>"),
    )
    pages = d.select(
        F.concat(F.lit("doc://"), sid).alias("url"),
        html.cast("binary").alias("html"),
    )
    return extract_jsonld(pages)


def _q_license_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """License routing (textstats.license_signals): deterministic grant/
    reservation footers are appended by doc_id residue; the conservative
    class rule (any reservation wins) must replay.  The oracle composes
    the SAME pattern tuple the operator uses (imported, not retyped) so
    the two sides cannot drift."""
    from pdf_to_epub_spark.operators import license_signals

    d = _t(spark, sf_dir, "documents")
    footer = (
        F.when(
            (F.col("doc_id") % 6) == 0,
            F.lit(" Licensed under Creative Commons Attribution 4.0."),
        )
        .when(
            (F.col("doc_id") % 6) == 1,
            F.lit(" All Rights Reserved. Copyright 2021 Site."),
        )
        .when(
            (F.col("doc_id") % 6) == 2,
            F.lit(" Released into the Public Domain (CC0)."),
        )
        .when(
            (F.col("doc_id") % 6) == 3,
            F.lit(" Shared as CC-BY-SA. (c) 2020 Someone."),
        )
        .otherwise(F.lit(""))
    )
    docs = d.select(
        "doc_id",
        F.concat(F.coalesce(F.col("text"), F.lit("")), footer).alias("text"),
    )
    return license_signals(docs)


def _q_flesch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch reading ease (textstats.flesch_reading_ease) over raw
    documents; counts and the two ratio terms replay exactly in RE2
    with the mirrored division order."""
    from pdf_to_epub_spark.operators import flesch_reading_ease

    d = _t(spark, sf_dir, "documents")
    return flesch_reading_ease(d.select("doc_id", "text"))


def _q_embedding_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding outlier z-scores (similarity.embedding_outliers)
    over the embeddings table's natural label clusters; the oracle
    replays centroid, distance, and moments relationally with the same
    naive-moment formulas (no builtin stddev on either side)."""
    from pdf_to_epub_spark.operators import embedding_outliers

    e = _t(spark, sf_dir, "embeddings")
    return embedding_outliers(e)


# Deterministic corruption tails for the encoding/OCR signal queries —
# built from escapes (never typed literals: the artifact bytes include
# NBSP and C1 controls).  The oracle builders splice the SAME constants
# into the SQL, so the bytes cannot drift between engines.
_MOJI_TAIL = " Caf\u00c3\u00a9 d\u00c3\u00a9j\u00c3\u00a0 vu \u00e2\u20ac\u2122na\u00c3\u00afve"
_OCR_TAIL = "\nthe exam-\nple con-\ntinued w1th c0nfusi0n b q\nab\n"


def _q_bitext_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Margin-based bitext mining (similarity.bitext_margin_mine): even
    vec_ids play the source language, odd the target; top-1 target per
    source at margin ≥ 1.02 with k=4 neighborhoods.  Integer micro-unit
    cosine sums make the margins replay hash-exactly in SQL."""
    from pdf_to_epub_spark.operators import bitext_margin_mine

    e = _t(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    return bitext_margin_mine(
        e.where(F.col("vec_id") % 2 == 0),
        e.where(F.col("vec_id") % 2 == 1),
        k=4,
        threshold=1.02,
    )


def _q_training_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic epoch shuffle (sampling.training_shards): salted
    md5-60 hash → shard assignment + in-shard position, 16 shards; the
    oracle replays the hash and the per-shard rank as one window."""
    from pdf_to_epub_spark.operators import training_shards

    d = _t(spark, sf_dir, "documents")
    return training_shards(d, n_shards=16, salt="epoch0")


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


def _q_amp_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declared AMP twin graph (urls.extract_amp_pairs): every 3k page
    declares its AMP twin, every 3k+1 is the AMP page pointing back
    (html-attribute marker + rel=canonical), every 3k+2 is a plain page
    with a canonical link that must NOT emit (not an AMP page)."""
    from pdf_to_epub_spark.operators import extract_amp_pairs

    d = _t(spark, sf_dir, "documents").select("doc_id")
    i = F.col("doc_id")
    s = i.cast("string")
    r = i % 3
    html = (
        F.when(
            r == 0,
            F.concat(
                F.lit('<html><head><link rel="amphtml" href="https://e/amp/'),
                s, F.lit('"></head></html>'),
            ),
        )
        .when(
            r == 1,
            F.concat(
                F.lit('<html amp lang="en"><head><link rel="canonical" href="https://e/'),
                s, F.lit('"></head></html>'),
            ),
        )
        .otherwise(
            F.concat(
                F.lit('<html><link rel="canonical" href="https://e/x/'),
                s, F.lit('"></html>'),
            )
        )
    )
    pages = d.select(
        F.concat(F.lit("https://e/p"), s).alias("url"), html.alias("html")
    )
    return extract_amp_pairs(pages)


def _q_declared_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Publisher-declared language ladder (urls.extract_declared_lang):
    html lang attr (region-tagged, mixed case) > http-equiv list >
    og:locale underscore form > nothing declared."""
    from pdf_to_epub_spark.operators import extract_declared_lang

    d = _t(spark, sf_dir, "documents").select("doc_id")
    i = F.col("doc_id")
    s = i.cast("string")
    r = i % 4
    html = (
        F.when(r == 0, F.lit('<html lang="PT-br"><head></head></html>'))
        .when(
            r == 1,
            # content BEFORE http-equiv: attribute order is free in the
            # wild, and the tag-scoped extractor must not care.
            F.lit('<head><meta content="fr, en" http-equiv="Content-Language"></head>'),
        )
        .when(
            r == 2,
            F.lit('<head><meta property="og:locale" content="de_DE"></head>'),
        )
        .otherwise(F.lit("<html><body>nothing declared</body></html>"))
    )
    pages = d.select(
        F.concat(F.lit("https://e/l"), s).alias("url"), html.alias("html")
    )
    return extract_declared_lang(pages)


def _q_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Loader manifest over the training-shard layout
    (sampling.shard_manifest): per-shard doc/token/char volumes and the
    order-independent sorted-md5 checksum, same salt/shard-count
    conventions as the training_shards query."""
    from pdf_to_epub_spark.operators import shard_manifest

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return shard_manifest(d, n_shards=16, salt="epoch0")


def _phash_media_payloads() -> list[tuple[int, bytes]]:
    """The 8 residue-class media payloads for the perceptual-dedup
    query (pure function — shared by the Spark query and the oracle
    replay): base image, its 2× rescale (aHash-equal), a one-cell
    perturbation (Hamming 1), a far image, an audio pair, far audio,
    and a junk row that must surface as unsupported."""
    import math

    from pdf_to_epub_spark.functions.mediacodec import make_bmp, make_wav

    def grad(d):
        return lambda x, y: ((x * 255 // d) & 0xFF,) * 3

    def near(x, y):
        return (
            min(255, (x * 255 // 16) + (200 if (x < 2 and y < 2) else 0)),
        ) * 3

    def far(x, y):
        return ((y * 255 // 16) & 0xFF, (x * 17) & 0xFF, 0)

    def sine(f1, f2, amp):
        return [
            int(amp * math.sin(2 * math.pi * f1 * t / 8000)
                + 4000 * math.sin(2 * math.pi * f2 * t / 8000))
            for t in range(1600)
        ]

    return [
        (0, make_bmp(16, 16, grad(16))),
        (1, make_bmp(32, 32, grad(32))),
        (2, make_bmp(16, 16, near)),
        (3, make_bmp(16, 16, far)),
        (4, make_wav(sine(300, 1200, 9000))),
        (5, make_wav(sine(300, 1200, 9000))),
        (6, make_wav(sine(700, 2500, 2000))),
        (7, b"not media at all"),
    ]


def _q_media_phash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual media dedup (multimodal.media_fingerprints +
    media_dedup_clusters): every document carries one of 8 residue-class
    payloads; rescaled copies must hash EQUAL, the one-cell perturbation
    must cluster within Hamming 1, far content must stand alone, junk
    must drop as unsupported."""
    _ship_package(spark)
    from pdf_to_epub_spark.operators.multimodal import (
        media_dedup_clusters,
        media_fingerprints,
    )

    payloads = spark.createDataFrame(
        [(r, bytearray(p)) for r, p in _phash_media_payloads()],
        "cls long, payload binary",
    )
    docs = _t(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("media_id"),
        (F.col("doc_id") % 8).alias("cls"),
    )
    media = docs.join(F.broadcast(payloads), "cls").select(
        "media_id", "payload"
    )
    fps = media_fingerprints(media, salt_partitions=8)
    return media_dedup_clusters(fps)


def _media_phash_oracle() -> str:
    """Golden VALUES: per-class fingerprint + one-hop min-label rep
    replayed in pure Python over the distinct class fingerprints."""
    from pdf_to_epub_spark.functions.mediacodec import (
        ahash64,
        audio_fingerprint64,
        decode_bmp,
        decode_wav,
        hamming64,
        to_signed64,
    )

    rows = []
    for r, payload in _phash_media_payloads():
        if payload[:2] == b"BM":
            w, h, gray = decode_bmp(payload)
            rows.append((r, "image", to_signed64(ahash64(gray, w, h))))
        elif payload[:4] == b"RIFF":
            _, _, samples = decode_wav(payload)
            rows.append((r, "audio", to_signed64(audio_fingerprint64(samples))))
    reps: dict[int, int] = {}
    for r, kind, fp in rows:
        within = [
            fp2 for _, k2, fp2 in rows
            if k2 == kind and hamming64(fp, fp2) <= 3
        ]
        reps[r] = min(within)
    vals = ",\n            ".join(
        f"({r}, '{kind}', {fp}, {reps[r]})" for r, kind, fp in rows
    )
    return f"""
        WITH golden(r, kind, fp, rep_fp) AS (VALUES
            {vals})
        SELECT d.doc_id AS media_id, g.kind, g.fp::BIGINT AS fp,
               g.rep_fp::BIGINT AS rep_fp, 'ok' AS status
        FROM documents d JOIN golden g ON d.doc_id % 8 = g.r
    """


def _q_repair_mojibake(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gated cp1252 round-trip repair (textstats.repair_mojibake) over 8
    residue classes of damage — repairable mojibake, double-encoding,
    clean ASCII, genuine accents, and an undecodable surrogate run that
    must pass through byte-identical.  The oracle replays the repair in
    pure Python per class (golden-VALUES, the compression_ratio
    convention)."""
    from pdf_to_epub_spark.operators import repair_mojibake

    d = _t(spark, sf_dir, "documents").select("doc_id")
    frag = F.lit(_MOJI_FRAGS[0])
    for r in range(1, 8):
        frag = F.when(F.col("doc_id") % 8 == r, F.lit(_MOJI_FRAGS[r])).otherwise(frag)
    text = F.concat(frag, F.lit(" tail "), F.col("doc_id").cast("string"))
    return repair_mojibake(d.select("doc_id", text.alias("text")))


def _mojibake_oracle() -> str:
    """Golden VALUES: per residue class the repaired fragment, run
    count, and repaired verdict computed by the same pure-Python
    function the Arrow UDF maps."""
    from pdf_to_epub_spark.operators import fix_mojibake_text
    from pdf_to_epub_spark.operators.textstats import _moji_run_re

    vals = []
    for r, frag in enumerate(_MOJI_FRAGS):
        fixed = fix_mojibake_text(frag)
        n_runs = len(_moji_run_re().findall(frag))
        rep = "TRUE" if fixed != frag else "FALSE"
        vals.append(f"({r}, '{fixed}', {n_runs}, {rep})")
    rows = ",\n            ".join(vals)
    return f"""
        WITH golden(r, fixed, n_runs, repaired) AS (VALUES
            {rows})
        SELECT d.doc_id,
               g.fixed || ' tail ' || CAST(d.doc_id AS VARCHAR) AS text,
               g.n_runs::INT AS n_runs,
               g.repaired AS repaired
        FROM documents d JOIN golden g ON d.doc_id % 8 = g.r
    """


def _q_lang_mismatch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declared-lang vs script-evidence audit
    (textstats.lang_script_mismatch) over the script_ratios fixture text
    (residue-class script suffixes) with the real lang column — zh-tagged
    docs whose letters stay Latin-dominant must flag, unknown-script
    residues abstain."""
    from pdf_to_epub_spark.operators import lang_script_mismatch

    d = _t(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    suffix = (
        F.when(F.col("doc_id") % 4 == 0, " привет мир здравствуй")
        .when(F.col("doc_id") % 4 == 1, " γειά σου κόσμε")
        .when(F.col("doc_id") % 4 == 2, " 你好世界再见")
        .otherwise(" plain")
    )
    text = F.concat(F.substring("text", 1, 30), suffix)
    pages = d.select("doc_id", "lang", text.alias("text"))
    return lang_script_mismatch(pages)


def _q_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps-law vocabulary growth (textstats.vocab_growth): 16
    deterministic ingest batches, new-type attribution via min(batch)
    per type — cumulative type/token curve must reproduce exactly."""
    from pdf_to_epub_spark.operators import vocab_growth

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return vocab_growth(d, n_batches=16)


def _q_filter_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RefinedWeb-style line corrections (textstats.filter_lines) over
    documents rebuilt as multi-line pages with injected junk lines
    (numeric, counter, all-caps nav, short boilerplate) — the cleaned
    text, drop counts, and whole-doc flag must reproduce."""
    from pdf_to_epub_spark.operators import filter_lines

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    i = F.col("doc_id")
    text = F.concat(
        F.substring("text", 1, 60),
        F.lit("\n1,234\n42 likes\nHOME | ABOUT | CONTACT\n"),
        F.when(i % 3 == 0, F.lit("Please enable JavaScript now\n")).otherwise(
            F.lit("A second surviving prose line follows here.\n")
        ),
        F.substring("text", 61, 40),
    )
    return filter_lines(d.select("doc_id", text.alias("text")))


def _q_corpus_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus concentration profile (analytics.corpus_diversity) over a
    deterministic skewed domain assignment — entropy / effective-domain
    count / exact Gini / top-share from the counts-of-counts table."""
    from pdf_to_epub_spark.operators import corpus_diversity

    d = _t(spark, sf_dir, "documents").select("doc_id")
    domain = F.concat(
        F.lit("site"),
        F.least(F.col("doc_id") % 16, F.col("doc_id") % 7).cast("string"),
    )
    return corpus_diversity(d.select(domain.alias("domain")), "domain")


# Shared relational NB replay (train + per-doc costs) — used by the
# nb_classifier oracle and composed further by classifier_eval.
_NB_SQL_CORE = """WITH lab AS (
                SELECT doc_id, doc_id % 2 = 0 AS label,
                       lower(coalesce(text, '')) AS t
                FROM documents WHERE doc_id % 3 = 0
            ),
            tok AS (
                SELECT label,
                       unnest(regexp_extract_all(t, '[a-zà-öø-ÿ]+')) AS tk
                FROM lab
            ),
            tokb AS (
                SELECT label,
                       ('0x' || substr(md5('nb:' || tk), 1, 15))::BIGINT % 512
                           AS bucket
                FROM tok
            ),
            cnt AS (
                SELECT label, bucket, count(*)::DOUBLE AS c
                FROM tokb GROUP BY 1, 2
            ),
            tot AS (
                SELECT label, count(*)::DOUBLE AS n FROM tokb GROUP BY 1
            ),
            grid AS (
                SELECT l.label, g.bucket
                FROM (SELECT DISTINCT label FROM lab) l
                CROSS JOIN (
                    SELECT unnest(generate_series(0, 511)) AS bucket) g
            ),
            cost AS (
                SELECT grid.label, grid.bucket,
                       floor(-ln((coalesce(cnt.c, 0) + 1.0)
                                 / (tot.n + 512.0)) * 1e6 + 0.5)::BIGINT
                           AS cost
                FROM grid
                JOIN tot USING (label)
                LEFT JOIN cnt ON cnt.label = grid.label
                             AND cnt.bucket = grid.bucket
            ),
            prior AS (SELECT label, count(*)::DOUBLE AS nd FROM lab GROUP BY 1),
            pcost AS (
                SELECT label,
                       floor(-ln(nd / (SELECT sum(nd) FROM prior)) * 1e6
                             + 0.5)::BIGINT AS pc
                FROM prior
            ),
            alltok AS (
                SELECT doc_id,
                       ('0x' || substr(md5('nb:' || tk), 1, 15))::BIGINT % 512
                           AS bucket
                FROM (
                    SELECT doc_id,
                           unnest(regexp_extract_all(
                               lower(coalesce(text, '')),
                               '[a-zà-öø-ÿ]+')) AS tk
                    FROM documents)
            ),
            dsum AS (
                SELECT a.doc_id, c.label, sum(c.cost)::BIGINT AS s,
                       count(*)::INTEGER AS nt
                FROM alltok a JOIN cost c USING (bucket)
                GROUP BY 1, 2
            ),
            pivoted AS (
                SELECT b.doc_id,
                       coalesce(max(CASE WHEN NOT d.label THEN d.s END), 0)
                           + (SELECT pc FROM pcost WHERE NOT label) AS cf,
                       coalesce(max(CASE WHEN d.label THEN d.s END), 0)
                           + (SELECT pc FROM pcost WHERE label) AS ct,
                       coalesce(max(d.nt), 0) AS n_tokens
                FROM (SELECT doc_id FROM documents) b
                LEFT JOIN dsum d ON d.doc_id = b.doc_id
                GROUP BY b.doc_id
            )"""


# Shared positional-shingle contamination replay (CTEs through the
# per-(doc, bench) interval merge g2) — composed by the
# contamination_spans and mask_contaminated oracles.
_CONTAM_SPANS_SQL_CORE = r"""WITH t AS (
                SELECT doc_id,
                       regexp_split_to_array(trim(lower(text)), '\s+') AS toks
                FROM documents),
            c AS (
                SELECT doc_id, len(toks) AS nt,
                       unnest(generate_series(
                           1, greatest(len(toks) - 7, 1))) AS i,
                       unnest(list_transform(
                           generate_series(1, greatest(len(toks) - 7, 1)),
                           i -> array_to_string(
                               list_slice(toks, i, i + 7), ' '))) AS sh
                FROM t),
            bench AS (
                SELECT DISTINCT doc_id AS bench_id,
                       unnest(CASE WHEN len(toks) >= 8 THEN
                           list_distinct(list_transform(
                               generate_series(1, len(toks) - 7),
                               i -> array_to_string(
                                   list_slice(toks, i, i + 7), ' ')))
                       ELSE [array_to_string(toks, ' ')] END) AS sh
                FROM t WHERE doc_id < 20),
            m AS (
                SELECT c.doc_id, b.bench_id, c.i - 1 AS pos,
                       least(c.i + 6, c.nt - 1) AS e
                FROM c JOIN bench b USING (sh)),
            g0 AS (
                SELECT *, max(e) OVER (
                    PARTITION BY doc_id, bench_id ORDER BY pos
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                    AS pmax
                FROM m),
            g1 AS (
                SELECT *, CASE WHEN pmax IS NULL OR pos > pmax + 1
                               THEN 1 ELSE 0 END AS flag
                FROM g0),
            g2 AS (
                SELECT *, sum(flag) OVER (
                    PARTITION BY doc_id, bench_id ORDER BY pos
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp
                FROM g1)"""


def _q_crawl_cadence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain fetch-cadence profile (urls.crawl_cadence): lag-window
    inter-arrival gaps over deterministic (domain, epoch) captures, then
    order-independent gap stats — integer gap sums drive the variance in
    a fixed parse shape and the median is Spark's exact percentile
    (== DuckDB quantile_cont)."""
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
    return crawl_cadence(pages).select(
        "domain", "n_fetches", "mean_gap_s", "median_gap_s", "var_gap_s"
    )


def _q_cocitation_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain co-citation mining (urls.cocitation_pairs): unordered
    domain pairs linked from the same page, counted across pages — the
    no-self-join HOF-combinations shape; the oracle replays it as a
    distinct self-join in DuckDB."""
    from pdf_to_epub_spark.operators import cocitation_pairs

    d = _t(spark, sf_dir, "documents").select("doc_id")
    i = F.col("doc_id")
    url = F.concat(F.lit("https://p"), i.cast("string"), F.lit(".example/x"))
    targets = F.array(
        F.concat(F.lit("https://a"), (i % 5).cast("string"), F.lit(".example/")),
        F.concat(F.lit("https://b"), (i % 3).cast("string"), F.lit(".example/")),
        F.concat(F.lit("https://c"), (i % 4).cast("string"), F.lit(".example/")),
        # duplicate target — the per-page set must be DISTINCT domains
        F.concat(F.lit("https://a"), (i % 5).cast("string"), F.lit(".example/dup")),
        # conditional 4th domain so per-page set sizes vary 3 / 4
        F.when(
            i % 2 == 0, F.lit("https://hub.example/")
        ).otherwise(
            F.concat(F.lit("https://c"), (i % 4).cast("string"), F.lit(".example/z"))
        ),
    )
    outlinks = d.select(
        url.alias("url"), F.explode(targets).alias("target")
    )
    return cocitation_pairs(outlinks, min_count=2).select(
        "domain_a", "domain_b", "n_pages"
    )


def _q_sentence_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAG-style overlapping sentence-window chunking
    (textstats.sentence_chunks, 3-sentence windows, stride 2) over the
    same deterministically-punctuated text as sentence_stats; the oracle
    replays the windows via 1-based DuckDB list slices over
    unnest(generate_series(...))."""
    from pdf_to_epub_spark.operators import sentence_chunks

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    i = F.col("doc_id")
    txt = F.concat(
        F.substring("text", 1, 40), F.lit(". "),
        F.substring("text", 41, 60), F.lit("! "),
        F.substring("text", 101, 50),
        F.when(i % 3 == 0, F.lit("? Short tail.")).otherwise(F.lit("...")),
    )
    return sentence_chunks(
        d.select("doc_id", txt.alias("text")), chunk_sents=3, stride=2
    ).select("doc_id", "chunk_id", "n_sents", "chunk_text")


def _q_quality_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language quantile normalization + curriculum bucketing
    (sampling.quality_percentiles): percent_rank and ntile(4) over
    (score, doc_id) — deterministic tie-break, identical window
    semantics in DuckDB."""
    from pdf_to_epub_spark.operators import quality_percentiles

    d = _t(spark, sf_dir, "documents").select(
        "doc_id", "lang", F.col("n_chars").alias("score")
    )
    return quality_percentiles(d, buckets=4).select(
        "doc_id", "lang", "score", "pct", "bucket"
    )


def _q_event_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Traffic-burst detection (analytics.event_anomalies): hourly counts
    per event type, z-scored against the type's own hourly distribution
    from exact integer sums in a fixed parse shape — the telemetry
    anomaly monitor; z_threshold=2 so the synthetic stream yields true
    bursts."""
    from pdf_to_epub_spark.operators import event_anomalies

    e = _t(spark, sf_dir, "events")
    return event_anomalies(e, z_threshold=2.0).select(
        "event_type", "bucket_epoch", "n_events", "z", "is_burst"
    )


def _q_title_body_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clickbait signal (textstats.title_body_overlap): fraction of
    distinct title words grounded in the body — titles synthesized from
    the body prefix plus residue-varied alien tokens, with an
    empty-title branch."""
    from pdf_to_epub_spark.operators import title_body_overlap

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    i = F.col("doc_id")
    title = F.when(i % 17 == 0, F.lit("")).otherwise(
        F.concat(
            F.substring("text", 1, 25),
            F.when(i % 4 == 0, F.lit(" zzqx")).otherwise(F.lit("")),
            F.when(i % 4 == 1, F.lit(" vvwy qqkj")).otherwise(F.lit("")),
        )
    )
    return title_body_overlap(
        d.select("doc_id", title.alias("title"), "text")
    ).select("doc_id", "n_title_tokens", "n_overlap", "overlap_ratio")


def _q_quote_density(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quotation profile (textstats.quote_density) over text with
    synthesized quote segments (paired, residue-varied second quote, and
    a trailing unmatched quote) — one RE2-portable regex scan, replayed
    verbatim in DuckDB."""
    from pdf_to_epub_spark.operators import quote_density

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    i = F.col("doc_id")
    txt = F.concat(
        F.substring("text", 1, 60), F.lit(' "'),
        F.substring("text", 61, 20), F.lit('" said.'),
        F.when(i % 5 == 0, F.lit(' "Another quote."')).otherwise(F.lit("")),
        F.when(i % 7 == 0, F.lit(' "unclosed')).otherwise(F.lit("")),
    )
    return quote_density(d.select("doc_id", txt.alias("text"))).select(
        "doc_id", "n_quotes", "quoted_chars", "quote_char_ratio"
    )


def _q_outlink_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neighborhood-quality signal (urls.outlink_quality): broadcast-join
    page outlink domains to a domain-score table (a/b domains scored,
    c domains unscored — exercises the left-join NULL path), then
    per-page mean/min over scored neighbors."""
    from pdf_to_epub_spark.operators import outlink_quality

    d = _t(spark, sf_dir, "documents").select("doc_id")
    i = F.col("doc_id")
    url = F.concat(F.lit("https://p"), i.cast("string"), F.lit(".example/x"))
    targets = F.array(
        F.concat(F.lit("https://a"), (i % 5).cast("string"), F.lit(".example/")),
        F.concat(F.lit("https://b"), (i % 3).cast("string"), F.lit(".example/")),
        F.concat(F.lit("https://c"), (i % 4).cast("string"), F.lit(".example/")),
    )
    outlinks = d.select(url.alias("url"), F.explode(targets).alias("target"))
    scores = (
        d.select(
            F.concat(F.lit("a"), (i % 5).cast("string"), F.lit(".example"))
            .alias("domain"),
            ((i % 5).cast("double") / F.lit(10.0)).alias("score"),
        )
        .union(
            d.select(
                F.concat(F.lit("b"), (i % 3).cast("string"), F.lit(".example")),
                (i % 3).cast("double") * F.lit(0.2) + F.lit(0.05),
            )
        )
        .distinct()
    )
    return outlink_quality(outlinks, scores).select(
        "url", "n_outlinks", "n_scored", "mean_score", "min_score"
    )


def _q_redirect_chains(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Redirect-chain resolution (urls.redirect_chains): pointer-doubling
    over deterministic decade chains — every doc i links u{i}->u{i+1}
    within its decade, every 5th decade closes into a 10-cycle (hop-cap
    16, unresolved), the rest terminate.  The oracle walks the same
    chains step-by-step with a recursive CTE capped at 16 hops."""
    from pdf_to_epub_spark.operators import redirect_chains

    d = _t(spark, sf_dir, "documents").select("doc_id")
    i = F.col("doc_id")
    dst_i = F.when(i % 10 != 9, i + 1).otherwise(i - 9)
    edges = d.filter(
        (i % 10 != 9) | ((i % 10 == 9) & (F.floor(i / 10) % 5 == 0))
    ).select(
        F.concat(F.lit("u"), i.cast("string")).alias("src"),
        F.concat(F.lit("u"), dst_i.cast("string")).alias("dst"),
    )
    return redirect_chains(edges, max_hops=16).select(
        "src", "final", "hops", "resolved"
    )


def _q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted sampling without replacement
    (sampling.weighted_sample, Efraimidis–Spirakis with md5-derived
    uniforms, k=25): top-k by 6-dp-rounded ln(u)/w with an id
    tie-break — retry-stable and exactly replayable in SQL."""
    from pdf_to_epub_spark.operators import weighted_sample

    d = _t(spark, sf_dir, "documents").select(
        "doc_id", ((F.col("doc_id") % 7) + 1).cast("double").alias("weight")
    )
    return weighted_sample(d, k=25).select(
        "doc_id", "weight", "priority", "rank"
    )


def _q_partition_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-key skew audit (sampling.partition_skew) over a
    deliberately skewed key (source || a doc_id residue class that
    collapses most rows onto one value) — max/mean straggler ratio and
    CV from exact integer sums."""
    from pdf_to_epub_spark.operators import partition_skew

    d = _t(spark, sf_dir, "documents").select(
        F.concat(
            F.col("source"),
            F.lit(":"),
            F.when(F.col("doc_id") % 10 < 7, F.lit("hot"))
            .otherwise((F.col("doc_id") % 10).cast("string")),
        ).alias("skewkey")
    )
    return partition_skew(d, "skewkey", n_buckets=16).select(
        "n_buckets", "n_rows", "n_empty", "max_bucket_rows",
        "skew_ratio", "cv",
    )


def _q_length_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-language length outliers (textstats.length_outliers):
    median/MAD flagging with the z computed on the 6-dp-rounded MAD —
    doc lengths inflated for a residue class so true outliers exist."""
    from pdf_to_epub_spark.operators import length_outliers

    d = _t(spark, sf_dir, "documents").select(
        "doc_id", "lang",
        F.when(
            F.col("doc_id") % 97 == 0, F.col("n_chars") * 50
        ).otherwise(F.col("n_chars")).alias("n_chars"),
    )
    return length_outliers(d).select(
        "doc_id", "lang", "n_chars", "robust_z", "is_outlier"
    )


def _q_domain_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle census (urls.domain_triangles) over a circulant domain
    graph (node i%12 links to i%12 + 1..4) — the degree-ordered
    node-iterator; the oracle counts the same triangles with an
    INDEPENDENT canonical triple-join."""
    from pdf_to_epub_spark.operators import domain_triangles

    d = _t(spark, sf_dir, "documents").select("doc_id")
    i = F.col("doc_id")
    edges = d.select(
        F.concat(F.lit("d"), (i % 12).cast("string")).alias("src"),
        F.concat(
            F.lit("d"), ((i % 12 + 1 + i % 4) % 12).cast("string")
        ).alias("dst"),
    )
    return domain_triangles(edges).select(
        "n_nodes", "n_edges", "n_wedges", "n_triangles", "global_clustering"
    )


def _q_range_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range-join enrichment (asof.range_enrich): values land in
    residue-derived [k*100, k*100+49] bands plus one overlapping 'wide'
    band — the grid-cell broadcast equi-join form; smallest-lo wins on
    overlap, NULL in the gaps."""
    from pdf_to_epub_spark.operators import range_enrich

    d = _t(spark, sf_dir, "documents").select("doc_id")
    i = F.col("doc_id")
    vals = d.select(
        i.alias("id"), ((i * 37) % 1000).cast("long").alias("v")
    )
    ranges = (
        d.select(
            ((i % 10) * 100).cast("long").alias("lo"),
            ((i % 10) * 100 + 49).cast("long").alias("hi"),
            F.concat(F.lit("r"), (i % 10).cast("string")).alias("label"),
        )
        .union(
            d.select(
                F.lit(25).cast("long"),
                F.lit(125).cast("long"),
                F.lit("wide"),
            )
        )
        .distinct()
    )
    return range_enrich(vals, ranges, cell=64).select(
        "id", "v", "range_label"
    )


def _q_signal_correlations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Signal correlation matrix (textstats.signal_correlations) over
    (n_chars, letter-run word count, a constant) — one aggregate row
    fans out to the pair rows; the constant column exercises the
    zero-variance NULL branch."""
    from pdf_to_epub_spark.operators import signal_correlations

    d = _t(spark, sf_dir, "documents").select(
        F.col("n_chars"),
        F.expr(
            "size(regexp_extract_all(lower(text), '[a-zà-öø-ÿ]+', 0))"
        ).alias("n_words"),
        F.lit(7).alias("n_const"),
    )
    return signal_correlations(
        d, signal_cols=("n_chars", "n_words", "n_const")
    ).select("signal_a", "signal_b", "r")


def _q_corpus_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative ingest growth (analytics.corpus_growth): per-day
    counts with running total and running share — cumulative and
    grand-total window frames over the day-grain table."""
    from pdf_to_epub_spark.operators import corpus_growth

    e = _t(spark, sf_dir, "events")
    return corpus_growth(e).select(
        "bucket_epoch", "n_events", "cum_events", "pct_of_total"
    )


def _q_markup_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Markup spam profile (urls.markup_signals) over residue-built
    pages (varying script/iframe/form/anchor counts) — pure
    regexp_count column algebra; the oracle replays the same RE2
    patterns over the same constructed text in DuckDB."""
    from pdf_to_epub_spark.operators import markup_signals

    d = _t(spark, sf_dir, "documents").select("doc_id")
    i = F.col("doc_id")
    html = F.encode(
        F.concat(
            F.lit("<html><body>"),
            F.expr("repeat('<script src=x></script>', cast(doc_id % 4 as int))"),
            F.expr("repeat('<iframe>', cast(doc_id % 3 as int))"),
            F.when(i % 5 == 0, F.lit("<form action=/s>")).otherwise(F.lit("")),
            F.expr("repeat('<a href=x>t</a>', cast(doc_id % 6 as int))"),
            F.expr("repeat('plain text ', cast(doc_id % 7 as int) + 1)"),
            F.lit("</body></html>"),
        ),
        "UTF-8",
    )
    pages = d.select(
        F.concat(F.lit("m://"), i.cast("string")).alias("url"),
        html.alias("html"),
    )
    return markup_signals(pages).select(
        "url", "n_script", "n_iframe", "n_form", "n_links", "tag_density"
    )


def _q_meta_redirects(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Client-side refresh extraction (urls.meta_redirects) over five
    residue variants (quoted, reversed-attr/upper-URL, no-url reload,
    absent, duplicate-first-wins) — construction oracle."""
    from pdf_to_epub_spark.operators import meta_redirects

    d = _t(spark, sf_dir, "documents").select("doc_id")
    i = F.col("doc_id")
    meta = (
        F.when(i % 5 == 0, F.concat(
            F.lit('<meta http-equiv="refresh" content="5; url=https://t.example/a'),
            i.cast("string"), F.lit('">')))
        .when(i % 5 == 1, F.concat(
            F.lit("<meta content='0;URL=/next"), i.cast("string"),
            F.lit("' http-equiv=refresh>")))
        .when(i % 5 == 2, F.lit('<meta http-equiv="refresh" content="30">'))
        .when(i % 5 == 3, F.lit('<meta name="viewport" content="width=1">'))
        .otherwise(F.concat(
            F.lit('<meta http-equiv=refresh content="1;url=first'),
            i.cast("string"),
            F.lit('"><meta http-equiv="refresh" content="9;url=second">')))
    )
    html = F.encode(
        F.concat(F.lit("<html><head>"), meta, F.lit("</head><body>x</body></html>")),
        "UTF-8",
    )
    pages = d.select(
        F.concat(F.lit("r://"), i.cast("string")).alias("url"),
        html.alias("html"),
    )
    return meta_redirects(pages).select("url", "delay_s", "target")


def _q_rel_pagination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pagination-hint extraction (urls.rel_pagination) over four
    residue variants (next-only, multi-token prev with reversed attrs,
    both + duplicate-first-wins, stylesheet-only) — construction
    oracle."""
    from pdf_to_epub_spark.operators import rel_pagination

    d = _t(spark, sf_dir, "documents").select("doc_id")
    i = F.col("doc_id")
    links = (
        F.when(i % 4 == 0, F.concat(
            F.lit('<link rel="next" href="https://s.example/p'),
            (i + 1).cast("string"), F.lit('">')))
        .when(i % 4 == 1, F.concat(
            F.lit("<link href='/p"), (i - 1).cast("string"),
            F.lit("' rel='prev nofollow'>")))
        .when(i % 4 == 2, F.concat(
            F.lit("<link rel=next href=/n"), i.cast("string"),
            F.lit("><link rel=prev href=/p"), i.cast("string"),
            F.lit('><link rel="next" href="/dup">')))
        .otherwise(F.lit('<link rel="stylesheet" href="/css">'))
    )
    html = F.encode(
        F.concat(F.lit("<html><head>"), links, F.lit("</head><body>x</body></html>")),
        "UTF-8",
    )
    pages = d.select(
        F.concat(F.lit("g://"), i.cast("string")).alias("url"),
        html.alias("html"),
    )
    return rel_pagination(pages).select(
        "url", "next_url", "prev_url", "is_paginated"
    )


def _q_og_cards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OpenGraph / Twitter-card extraction (urls.og_cards) over four
    residue variants (full set with a duplicate og:title whose FIRST
    declaration wins, reversed single-quoted attrs with spaces in the
    value, unquoted twitter-only, none) — construction oracle."""
    from pdf_to_epub_spark.operators import og_cards

    d = _t(spark, sf_dir, "documents").select("doc_id")
    i = F.col("doc_id")
    metas = (
        F.when(i % 4 == 0, F.concat(
            F.lit('<meta property="og:title" content="First '),
            i.cast("string"),
            F.lit('"><meta property="og:title" content="Second">'
                  '<meta property="og:type" content="article">'
                  '<meta property="og:image" content="https://img.example/'),
            i.cast("string"),
            F.lit('.jpg"><meta name="twitter:card" content="summary_large_image">')))
        .when(i % 4 == 1, F.concat(
            F.lit("<meta content='Title "), i.cast("string"),
            F.lit(" here' property='og:title'>")))
        .when(i % 4 == 2, F.lit(
            "<meta name=twitter:card content=summary>"))
        .otherwise(F.lit('<meta charset="utf-8">'))
    )
    html = F.encode(
        F.concat(F.lit("<html><head>"), metas, F.lit("</head><body>x</body></html>")),
        "UTF-8",
    )
    pages = d.select(
        F.concat(F.lit("o://"), i.cast("string")).alias("url"),
        html.alias("html"),
    )
    return og_cards(pages).select(
        "url", "og_title", "og_type", "og_image", "twitter_card"
    )


def _q_k_core(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-core peeling (urls.k_core, k=3) over a circulant C20{1,2} core
    (degree 4 everywhere) dressed with two-hop pendant chains
    (q_j - p_j, p_j - c_j, p_j - c_{j+1}) — the q nodes peel in round
    one, which drops p below k in round two: a genuine cascade.  The
    construction oracle is the surviving core with its degrees."""
    from pdf_to_epub_spark.operators import k_core

    d = _t(spark, sf_dir, "documents").select("doc_id")
    j = (F.col("doc_id") % 20).cast("string")
    j1 = ((F.col("doc_id") % 20 + 1) % 20).cast("string")
    j2 = ((F.col("doc_id") % 20 + 2) % 20).cast("string")
    c, c1, c2 = (
        F.concat(F.lit("c"), j),
        F.concat(F.lit("c"), j1),
        F.concat(F.lit("c"), j2),
    )
    p, q = F.concat(F.lit("p"), j), F.concat(F.lit("q"), j)
    edges = (
        d.select(c.alias("src"), c1.alias("dst"))
        .union(d.select(c, c2))
        .union(d.select(p, c))
        .union(d.select(p, c1))
        .union(d.select(q, p))
    )
    return k_core(edges, k=3).select("node", "deg")


def _q_client_redirect_chains(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composition: meta-refresh extraction feeding pointer-doubling
    chain resolution — pages u{i} declare a refresh to u{i+1} within
    their decade, every 5th decade closes into a 10-cycle, the rest
    terminate.  Extraction bugs and resolution bugs both break the
    recursive-CTE oracle."""
    from pdf_to_epub_spark.operators import meta_redirects, redirect_chains

    d = _t(spark, sf_dir, "documents").select("doc_id")
    i = F.col("doc_id")
    dst_i = F.when(i % 10 != 9, i + 1).otherwise(i - 9)
    refresh = F.when(
        (i % 10 != 9) | ((i % 10 == 9) & (F.floor(i / 10) % 5 == 0)),
        F.concat(
            F.lit('<meta http-equiv="refresh" content="0; url=u'),
            dst_i.cast("string"), F.lit('">'),
        ),
    ).otherwise(F.lit("<meta charset=utf-8>"))
    html = F.encode(
        F.concat(F.lit("<html><head>"), refresh,
                 F.lit("</head><body>x</body></html>")),
        "UTF-8",
    )
    pages = d.select(
        F.concat(F.lit("u"), i.cast("string")).alias("url"),
        html.alias("html"),
    )
    edges = meta_redirects(pages).select(
        F.col("url").alias("src"), F.col("target").alias("dst")
    )
    return redirect_chains(edges, max_hops=16).select(
        "src", "final", "hops", "resolved"
    )


def _q_cluster_pair_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pair-counting dedup-cluster evaluation (evaluate.cluster_pair_eval):
    predicted clusters mostly match the residue-class truth with a
    deterministic error minority (every 11th doc shifts one class) —
    exact integer C(n,2) sums, 6-dp divisions."""
    from pdf_to_epub_spark.operators import cluster_pair_eval

    d = _t(spark, sf_dir, "documents").select("doc_id")
    i = F.col("doc_id")
    a = d.select(
        ((i + F.when(i % 11 == 0, 1).otherwise(0)) % 6).alias("pred"),
        (i % 6).alias("truth"),
    )
    return cluster_pair_eval(a).select(
        "n_items", "tp_pairs", "pred_pairs", "true_pairs",
        "precision", "recall", "f1",
    )


def _rater_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 3-rater annotation run over the documents table:
    the true label is doc_id%3, rater r flips to the next label on every
    (doc_id+r)%5 == 0 item, and rater r2 skips doc_id%7 == 0 items —
    variable raters-per-item, skewed-but-agreeing marginals (the regime
    where raw agreement overstates reliability)."""
    d = _t(spark, sf_dir, "documents").select("doc_id")
    i = F.col("doc_id")
    r = F.col("r")
    return (
        d.select(i, F.explode(F.array(F.lit(0), F.lit(1), F.lit(2))).alias("r"))
        .where(~((r == 2) & (i % 7 == 0)))
        .select(
            i.alias("item_id"),
            F.concat(F.lit("r"), r.cast("string")).alias("rater"),
            F.concat(
                F.lit("L"),
                (
                    (i % 3 + F.when((i + r) % 5 == 0, 1).otherwise(0)) % 3
                ).cast("string"),
            ).alias("label"),
        )
    )


def _q_rater_kappa_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa per rater pair (evaluate.cohen_kappa_pairs) over the
    deterministic 3-rater run — chance-corrected agreement cleared of
    fractions, so both sides of the single 6-dp division are exact
    integers (kappa = (n·agree − Σ a_l·b_l)/(n² − Σ a_l·b_l))."""
    from pdf_to_epub_spark.operators import cohen_kappa_pairs

    return cohen_kappa_pairs(_rater_table(spark, sf_dir)).select(
        "rater_a", "rater_b", "n_items", "n_agree", "po", "pe", "kappa"
    )


def _q_fleiss_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fleiss' kappa (evaluate.fleiss_kappa) over the same 3-rater run —
    variable raters-per-item handled by excluding n_i<2 items; per-item
    agreement nano-quantized with exact integral `div` so the mean is
    order-independent and SQL-replayable."""
    from pdf_to_epub_spark.operators import fleiss_kappa

    return fleiss_kappa(_rater_table(spark, sf_dir)).select(
        "n_items", "n_ratings", "p_bar", "p_e", "kappa"
    )


def _routing_payload(doc_id: int) -> bytes | None:
    """Deterministic mixed-container payload per doc_id (shared by the
    Spark query's generator and the oracle replica): all eight detected
    classes plus empty/NULL, content a pure function of the id."""
    import gzip as _gzip

    from pdf_to_epub_spark.export import epub_bytes
    from pdf_to_epub_spark.sources.docx import make_docx_bytes
    from pdf_to_epub_spark.sources.pdf import make_pdf_bytes

    k = doc_id % 10
    if k == 0:
        return make_pdf_bytes([[(72.0, 700.0, 12.0, f"doc {doc_id}")]])
    if k == 1:
        return epub_bytes([], title=f"doc {doc_id}", url=f"doc://{doc_id}")
    if k == 2:
        return make_docx_bytes(doc_id, f"doc {doc_id}")
    if k == 3:
        return b"{\\rtf1\\ansi doc %d}" % doc_id
    if k == 4:
        return _gzip.compress(b"doc %d" % doc_id, mtime=0)
    if k == 5:
        return b"  <html><body>doc %d</body></html>" % doc_id
    if k == 6:
        return b"\xef\xbb\xbf<?xml version='1.0'?><d i='%d'/>" % doc_id
    if k == 7:
        return b"plain text doc %d\n" % doc_id
    if k == 8:
        return bytes([doc_id % 7, 0x01, 0xFE]) + b"%d" % doc_id
    return b"" if doc_id % 2 == 0 else None


def _q_payload_routing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Front-door container dispatch (extract.route_payloads /
    sniff_document): a deterministic mixed store — real PDF / EPUB /
    OOXML / RTF / gzip / HTML / XML / text / binary / empty payloads,
    one class per doc_id residue — routed by JVM-side magic-byte
    column algebra (no Python, no shuffle).  The oracle replays
    `py_sniff_document` over the same generated bytes into a VALUES
    table keyed by the corpus."""
    _ship_package(spark)
    from pdf_to_epub_spark.operators.extract import route_payloads

    docs = _t(spark, sf_dir, "documents").where("doc_id < 200").select(
        "doc_id"
    )

    def gen(batches):
        import pandas as pd

        for pdf in batches:
            ids = pdf["doc_id"].tolist()
            yield pd.DataFrame(
                {"doc_id": ids, "payload": [_routing_payload(i) for i in ids]}
            )

    payloads = docs.mapInPandas(gen, "doc_id long, payload binary")
    return route_payloads(payloads).select(
        "doc_id",
        "detected",
        F.coalesce(F.length("payload"), F.lit(-1)).cast("int").alias(
            "n_bytes"
        ),
    )


def _payload_routing_oracle(limit: int = 200) -> str | None:
    """VALUES oracle for `payload_routing`: the pure-Python sniffer
    replica (`py_sniff_document`, kept bit-for-bit with the JVM
    when-chain) over the same deterministic payloads."""
    import hashlib

    import pyarrow.parquet as pq

    from pdf_to_epub_spark.operators.extract import py_sniff_document

    rows: list[str] = []
    for sf_dir in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        path = pathlib.Path(sf_dir) / "documents.parquet"
        if not path.exists():
            return None
        t = pq.read_table(path, columns=["doc_id", "text"])
        recs = sorted(zip(t["doc_id"].to_pylist(), t["text"].to_pylist()))
        key = hashlib.md5((recs[0][1] or "").encode()).hexdigest()
        for doc_id, _ in recs:
            if doc_id >= limit:
                continue
            p = _routing_payload(doc_id)
            rows.append(
                f"('{key}',{doc_id},'{py_sniff_document(p)}',"
                f"{len(p) if p is not None else -1})"
            )
    vals = ",\n            ".join(rows)
    return f"""
        WITH golden(corpus_key, doc_id, detected, n_bytes) AS (VALUES
            {vals})
        SELECT doc_id::BIGINT AS doc_id, detected, n_bytes::INT AS n_bytes
        FROM golden
        WHERE corpus_key = (SELECT md5(text) FROM documents
                            WHERE doc_id = 0)
    """


def _isotonic_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic noisy-monotone calibration set: score is the doc's
    percent residue, the label fires when a hash residue clears a
    score-proportional threshold — so bin means mostly rise but violate
    monotonicity locally (the shape PAV exists to pool)."""
    d = _t(spark, sf_dir, "documents").select("doc_id")
    i = F.col("doc_id")
    return d.select(
        F.concat(F.lit("src"), (i % 2).cast("string")).alias("source"),
        ((i % 100) / F.lit(100.0)).alias("score"),
        (
            (i * 7919) % 100
            < 15 + F.expr("CAST((doc_id % 100) * 7 div 10 AS INT)")
        ).alias("label"),
    )


def _q_isotonic_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Isotonic (PAV) calibration table (classify.isotonic_calibration,
    20 bins, per source): exact integer-weight violator pooling over the
    one (group, bin) corpus aggregation.  The oracle derives the same
    fit via the greatest-convex-minorant slopes of the cumulative
    (Σn, Σn_pos) diagram — an independent algorithm, provably equal to
    PAV — precomputed into a VALUES table per corpus."""
    from pdf_to_epub_spark.operators import isotonic_calibration

    return isotonic_calibration(
        _isotonic_table(spark, sf_dir), group_col="source", bins=20
    ).select("source", "bin", "score_lo", "score_hi", "n", "n_pos", "p_cal")


def _isotonic_oracle(bins: int = 20) -> str | None:
    """VALUES-table oracle for `isotonic_calibration`, computed with the
    GCM/convex-hull characterization (NOT the operator's PAV merge):
    fitted value per bin = slope of the lower convex hull segment of the
    cumulative (Σn, Σn_pos) diagram covering that bin."""
    import hashlib

    import pyarrow.parquet as pq

    rows: list[str] = []
    for sf_dir in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        path = pathlib.Path(sf_dir) / "documents.parquet"
        if not path.exists():
            return None
        t = pq.read_table(path, columns=["doc_id", "text"])
        recs = sorted(zip(t["doc_id"].to_pylist(), t["text"].to_pylist()))
        key = hashlib.md5((recs[0][1] or "").encode()).hexdigest()
        by_group: dict[str, dict[int, list[int]]] = {}
        for doc_id, _ in recs:
            g = f"src{doc_id % 2}"
            score = (doc_id % 100) / 100.0
            label = (doc_id * 7919) % 100 < 15 + ((doc_id % 100) * 7) // 10
            b = min(max(int(score * bins), 0), bins - 1)
            cell = by_group.setdefault(g, {}).setdefault(b, [0, 0])
            cell[0] += 1
            cell[1] += 1 if label else 0
        for g in sorted(by_group):
            bd = by_group[g]
            order = sorted(bd)
            pts = [(0, 0)]
            cx = cy = 0
            for b in order:
                cx += bd[b][0]
                cy += bd[b][1]
                pts.append((cx, cy))
            hull: list[tuple[int, int]] = []
            for pt in pts:
                while len(hull) >= 2:
                    (x1, y1), (x2, y2) = hull[-2], hull[-1]
                    if (x2 - x1) * (pt[1] - y1) <= (pt[0] - x1) * (y2 - y1):
                        hull.pop()
                    else:
                        break
                hull.append(pt)
            seg = 0
            cx = 0
            for b in order:
                n, pos = bd[b]
                cx += n
                while seg + 1 < len(hull) and hull[seg + 1][0] < cx:
                    seg += 1
                (x1, y1), (x2, y2) = hull[seg], hull[seg + 1]
                p_cal = round((y2 - y1) / (x2 - x1), 6)
                rows.append(
                    f"('{key}','{g}',{b},{b / bins!r},{(b + 1) / bins!r},"
                    f"{n},{pos},{p_cal!r})"
                )
    vals = ",\n            ".join(rows)
    return f"""
        WITH golden(corpus_key, source, bin, score_lo, score_hi, n,
                    n_pos, p_cal) AS (VALUES
            {vals})
        SELECT source, bin::INT AS bin, score_lo::DOUBLE AS score_lo,
               score_hi::DOUBLE AS score_hi, n::BIGINT AS n,
               n_pos::BIGINT AS n_pos, p_cal::DOUBLE AS p_cal
        FROM golden
        WHERE corpus_key = (SELECT md5(text) FROM documents
                            WHERE doc_id = 0)
    """


def _q_negative_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """word2vec negative-sampling table (ir.negative_sampling_table,
    5000 slots over the top-200 vocab): unigram^0.75 computed as
    sqrt(sqrt(n³)) — IEEE-correctly-rounded in both engines, unlike
    libm pow — micro-floor-quantized, then exact largest-remainder
    apportionment (allocations sum to exactly 5000)."""
    from pdf_to_epub_spark.operators.ir import negative_sampling_table

    d = _t(spark, sf_dir, "documents").select("text")
    return negative_sampling_table(d, table_size=5000, k=200).select(
        "word", "n", "w_micro", "slots"
    )


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


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        # relational operator surface (oracle-checked)
        "pricing_summary": _q_pricing_summary,
        "latest_order_per_customer": _q_latest_order_per_customer,
        "customers_without_orders": _q_customers_without_orders,
        "building_segment_orders": _q_building_segment_orders,
        "ordered_lineitem_concat": _q_ordered_lineitem_concat,
        "event_deltas": _q_event_deltas,
        "error_islands": _q_error_islands,
        "doc_classification": _q_doc_classification,
        "trim_leading_blanks": _q_trim_leading_blanks,
        "top_parts": _q_top_parts,
        # training-data operators (oracle-checked)
        "dedup_exact": _q_dedup_exact,
        "dedup_exact_survivors": _q_dedup_exact_survivors,
        "token_counts": _q_token_counts,
        "quality_scores": _q_quality_scores,
        "lang_guess": _q_lang_guess,
        "doc_fingerprints": _q_doc_fingerprints,
        "pii_scrub": _q_pii_scrub,
        "pseudonymize_pii": _q_pseudonymize_pii,
        "gopher_quality": _q_gopher_quality,
        "quality_gate": _q_quality_gate,
        "repetition_signals": _q_repetition_signals,
        "url_canonical": _q_url_canonical,
        "corpus_splits": _q_corpus_splits,
        "pack_sequences": _q_pack_sequences,
        "packed_texts": _q_packed_texts,
        "split_leakage": _q_split_leakage,
        "dedup_lines": _q_dedup_lines,
        "unicode_nfc": _q_unicode_nfc,
        "warc_roundtrip": _q_warc_roundtrip,
        "wet_roundtrip": _q_wet_roundtrip,
        "tfrecord_roundtrip": _q_tfrecord_roundtrip,
        "cdc_chunks": _q_cdc_chunks,
        "snapshot_delta": _q_snapshot_delta,
        "lang_spans": _q_lang_spans,
        "nb_classifier": _q_nb_classifier,
        "embedding_covariance": _q_embedding_covariance,
        "cdc_incremental": _q_cdc_incremental,
        "proximity_search": _q_proximity_search,
        "delta_chain": _q_delta_chain,
        "contamination_spans": _q_contamination_spans,
        "dict_compression": _q_dict_compression,
        "classifier_eval": _q_classifier_eval,
        "domain_communities": _q_domain_communities,
        "mask_contaminated": _q_mask_contaminated,
        "ngram_coverage": _q_ngram_coverage,
        "recrawl_drift": _q_recrawl_drift,
        "zipf_fit": _q_zipf_fit,
        "crawl_cadence": _q_crawl_cadence,
        "cocitation_pairs": _q_cocitation_pairs,
        "sentence_chunks": _q_sentence_chunks,
        "quality_percentiles": _q_quality_percentiles,
        "event_anomalies": _q_event_anomalies,
        "title_body_overlap": _q_title_body_overlap,
        "quote_density": _q_quote_density,
        "outlink_quality": _q_outlink_quality,
        "redirect_chains": _q_redirect_chains,
        "weighted_sample": _q_weighted_sample,
        "partition_skew": _q_partition_skew,
        "length_outliers": _q_length_outliers,
        "domain_triangles": _q_domain_triangles,
        "range_enrich": _q_range_enrich,
        "signal_correlations": _q_signal_correlations,
        "spearman_signals": _q_spearman_signals,
        "corpus_growth": _q_corpus_growth,
        "markup_signals": _q_markup_signals,
        "meta_redirects": _q_meta_redirects,
        "rel_pagination": _q_rel_pagination,
        "og_cards": _q_og_cards,
        "k_core": _q_k_core,
        "client_redirect_chains": _q_client_redirect_chains,
        "cluster_pair_eval": _q_cluster_pair_eval,
        "rater_kappa_pairs": _q_rater_kappa_pairs,
        "fleiss_kappa": _q_fleiss_kappa,
        "krippendorff_alpha": _q_krippendorff_alpha,
        "burrows_delta": _q_burrows_delta,
        "isotonic_calibration": _q_isotonic_calibration,
        "payload_routing": _q_payload_routing,
        "negative_sampling": _q_negative_sampling,
        "rank_agreement": _q_rank_agreement,
        "score_drift_ks": _q_score_drift_ks,
        "retrieval_eval": _q_retrieval_eval,
        "event_transitions": _q_event_transitions,
        "template_fingerprints": _q_template_fingerprints,
        "allocate_budget": _q_allocate_budget,
        "temporal_splits": _q_temporal_splits,
        "politeness_audit": _q_politeness_audit,
        "compaction_plan": _q_compaction_plan,
        "dom_depth": _q_dom_depth,
        "url_lifespan": _q_url_lifespan,
        "latency_bands": _q_latency_bands,
        "json_props": _q_json_props,
        "variant_props": _q_variant_props,
        "count_cusum": _q_count_cusum,
        "domain_churn": _q_domain_churn,
        "threshold_for_rate": _q_threshold_for_rate,
        "hapax_stats": _q_hapax_stats,
        "bfs_distances": _q_bfs_distances,
        "zorder_layout": _q_zorder_layout,
        "kmv_similarity": _q_kmv_similarity,
        "calibration_bins": _q_calibration_bins,
        "session_paths": _q_session_paths,
        "tracking_params": _q_tracking_params,
        "bootstrap_ci": _q_bootstrap_ci,
        "paired_bootstrap": _q_paired_bootstrap,
        "term_burstiness": _q_term_burstiness,
        "pdf_outline": _q_pdf_outline,
        "embedding_quantize": _q_embedding_quantize,
        "pdf_chapters": _q_pdf_chapters,
        "graph_modularity": _q_graph_modularity,
        "proportion_test": _q_proportion_test,
        "snapshot_expiry": _q_snapshot_expiry,
        "extract_lists": _q_extract_lists,
        "change_rate": _q_change_rate,
        "skipgram_pairs": _q_skipgram_pairs,
        "interleave_strata": _q_interleave_strata,
        "punct_profile": _q_punct_profile,
        "publish_dates": _q_publish_dates,
        "link_reciprocity": _q_link_reciprocity,
        "gate_attrition": _q_gate_attrition,
        "leakage_safe_splits": _q_leakage_safe_splits,
        "domain_lang_mix": _q_domain_lang_mix,
        "feed_items": _q_feed_items,
        "hreflang_alternates": _q_hreflang_alternates,
        "repair_mojibake": _q_repair_mojibake,
        "media_phash_dedup": _q_media_phash_dedup,
        "amp_pairs": _q_amp_pairs,
        "declared_lang": _q_declared_lang,
        "shard_manifest": _q_shard_manifest,
        "lang_mismatch": _q_lang_mismatch,
        "vocab_growth": _q_vocab_growth,
        "filter_lines": _q_filter_lines,
        "corpus_diversity": _q_corpus_diversity,
        "edit_verify_pairs": _q_edit_verify_pairs,
        "dedup_best_survivors": _q_dedup_best_survivors,
        "robots_sitemap_urls": _q_robots_sitemap_urls,
        "unigram_drift": _q_unigram_drift,
        "domain_quota": _q_domain_quota,
        "domain_caps": _q_domain_caps,
        "vocab_oov": _q_vocab_oov,
        "blocked_urls": _q_blocked_urls,
        "length_quantiles": _q_length_quantiles,
        "good_turing": _q_good_turing,
        "snm_candidate_pairs": _q_snm_pairs,
        "kn_doc_scores": _q_kn_doc_scores,
        "kn_partition": _q_kn_partition,
        "mink_prob_audit": _q_mink_prob_audit,
        "wordpiece_symbols": _q_wordpiece_symbols,
        "kn_arpa_table": _q_kn_arpa_table,
        "quantile_normalize": _q_quantile_normalize,
        "chi2_lang_source": _q_chi2_lang_source,
        "cramers_v": _q_cramers_v,
        "colbert_maxsim": _q_colbert_maxsim,
        "luhn_card_audit": _q_luhn_card_audit,
        "text_reuse_spans": _q_text_reuse_spans,
        "text_reuse_merged": _q_text_reuse_merged,
        "bigram_lm_scores": _q_bigram_lm_scores,
        "lm_partition": _q_lm_partition,
        "page_outlinks": _q_page_outlinks,
        "page_meta": _q_page_meta,
        "domain_pagerank": _q_domain_pagerank,
        "benchmark_contamination": _q_benchmark_contamination,
        "domain_stats": _q_domain_stats,
        "robots_rules": _q_robots_rules,
        "sitemap_urls": _q_sitemap_urls,
        "crawl_frontier": _q_crawl_frontier,
        "recrawl_diff": _q_recrawl_diff,
        "crawl_schedule": _q_crawl_schedule,
        "url_features": _q_url_features,
        "term_postings": _q_term_postings,
        "bm25_topk": _q_bm25_topk,
        "tfidf_weights": _q_tfidf_weights,
        "corpus_rollup": _q_corpus_rollup,
        "phrase_search": _q_phrase_search,
        "keyword_snippets": _q_keyword_snippets,
        "dedup_cluster_sizes": _q_dedup_cluster_sizes,
        "boolean_search": _q_boolean_search,
        "update_postings": _q_update_postings,
        "script_ratios": _q_script_ratios,
        "event_hourly": _q_event_hourly,
        "bigram_pmi": _q_bigram_pmi,
        "top_terms": _q_top_terms,
        "compression_ratio": _q_compression_ratio,
        "sentence_stats": _q_sentence_stats,
        "dedup_paragraphs": _q_dedup_paragraphs,
        "html_outline": _q_html_outline,
        "html_tables": _q_html_tables,
        "robots_gate": _q_robots_gate,
        "anchor_texts": _q_anchor_texts,
        "top_anchors": _q_top_anchors,
        "canonical_dedup": _q_canonical_dedup,
        "ann_topk": _q_ann_topk,
        "embedding_near_pairs": _q_embedding_near_pairs,
        "embedding_near_dups_lsh": _q_embedding_near_dups_lsh,
        "resume_pending": _q_resume_pending,
        "quarantine_summary": _q_quarantine_summary,
        "shard_merge_roundtrip": _q_shard_merge_roundtrip,
        "shard_pagebreak_roundtrip": _q_shard_pagebreak_roundtrip,
        "example_samples": _q_example_samples,
        "asof_latest_order": _q_asof_latest_order,
        "event_sessions": _q_event_sessions,
        # extraction surfaces (golden / construction oracles)
        "html_boilerplate_extract": _q_html_boilerplate_extract,
        "readability_extract": _q_readability_extract,
        "image_caption_pairs": _q_image_caption_pairs,
        "extract_blocks": _q_extract_blocks,
        "assemble_documents": _q_assemble_documents,
        "epub_export": _q_epub_export,
        "extraction_metrics": _q_extraction_metrics,
        "minhash_pairs": _q_minhash_pairs,
        "incremental_near_dups": _q_incremental_near_dups,
        "dedup_components": _q_dedup_components,
        "dedup_near_survivors": _q_dedup_near_survivors,
        "simhash_pairs": _q_simhash_pairs,
        "ann_topk_lsh": _q_ann_topk_lsh,
        "ann_topk_ivf": _q_ann_topk_ivf,
        "binary_decode_extract": _q_binary_decode_extract,
        "pdf_extract_blocks": _q_pdf_extract_blocks,
        "ngram_jaccard_pairs": _q_ngram_jaccard,
        "dup_ngram_spans": _q_dup_ngram_spans,
        "masked_dup_spans": _q_masked_dup_spans,
        "media_features": _q_media_features,
        # behavioral analytics / training-example shaping / graph (r4 s4)
        "cohort_retention": _q_cohort_retention,
        "funnel_stages": _q_funnel_stages,
        "chunk_tokens": _q_chunk_tokens,
        "stratified_sample": _q_stratified_sample,
        "hits_scores": _q_hits_scores,
        "jsonl_roundtrip": _q_jsonl_roundtrip,
        "classifier_scores": _q_classifier_scores,
        "event_rolling": _q_event_rolling,
        "event_pivot": _q_event_pivot,
        "snapshot_set_ops": _q_snapshot_set_ops,
        "click_attribution": _q_click_attribution,
        "compact_postings": _q_compact_postings,
        "template_strip": _q_template_strip,
        "kmeans_profile": _q_kmeans_profile,
        "minimizer_sketch": _q_minimizer_sketch,
        "minimizer_pairs": _q_minimizer_pairs,
        "bpe_pairs": _q_bpe_pairs,
        "bpe_merges": _q_bpe_merges,
        "bpe_encode": _q_bpe_encode,
        "dsir_weights": _q_dsir_weights,
        "containment_pairs": _q_containment_pairs,
        "containment_df_stats": _q_containment_df_stats,
        "soft404_detect": _q_soft404,
        "corpus_mixture": _q_corpus_mixture,
        "dsir_resample": _q_dsir_resample,
        "collapse_lines": _q_collapse_lines,
        "term_blocklist": _q_term_blocklist,
        "cms_heavy_hitters": _q_cms_heavy_hitters,
        "bpe_fertility": _q_bpe_fertility,
        "domain_quality_rank": _q_domain_quality_rank,
        "bloom_membership": _q_bloom_membership,
        "c4_page_filter": _q_c4_filters,
        "code_signals": _q_code_signals,
        "embedding_outliers": _q_embedding_outliers,
        "semantic_dedup": _q_semantic_dedup,
        "token_budget": _q_token_budget,
        "encoding_signals": _q_encoding_signals,
        "ocr_artifacts": _q_ocr_artifacts,
        "training_shards": _q_training_shards,
        "hrw_shards": _q_hrw_shards,
        "bitext_mining": _q_bitext_mining,
        "trust_rank": _q_trust_rank,
        "calibrated_scores": _q_calibrated_scores,
        "project_embeddings": _q_project_embeddings,
        "license_signals": _q_license_signals,
        "flesch_scores": _q_flesch,
        "temperature_mixture": _q_temperature_mixture,
        "corpus_tiers": _q_corpus_tiers,
        "url_templates": _q_url_templates,
        "mirror_domains": _q_mirror_domains,
        "histogram_quantiles": _q_histogram_quantiles,
        "hll_domain_distinct": _q_hll_domain_distinct,
        "jsonld_extract": _q_jsonld_extract,
        "extraction_eval": _q_extraction_eval,
        "degree_assortativity": _q_degree_assortativity,
        "span_overlap": _q_span_overlap,
        "rrf_fusion": _q_rrf_fusion,
        "rake_keywords": _q_rake_keywords,
        "feature_mi": _q_feature_mi,
        "pq_quantize": _q_pq_quantize,
        "continuation_pairs": _q_continuation_pairs,
        "capitalized_phrases": _q_capitalized_phrases,
        "otsu_threshold": _q_otsu_threshold,
        "heading_body_pairs": _q_heading_body_pairs,
        "site_sections": _q_site_sections,
        "winsorize_scores": _q_winsorize_scores,
        "oph_minhash_pairs": _q_oph_minhash_pairs,
        "prf_expansion": _q_prf_expansion,
        "lsh_plan": _q_lsh_plan,
        "ngram_novelty": _q_ngram_novelty,
        "domain_dup_rates": _q_domain_dup_rates,
        "jl_project": _q_jl_project,
        "docx_extract_blocks": _q_docx_extract_blocks,
        "docx_chapters": _q_docx_chapters,
        "gate_signals": _q_gate_signals,
        "gate_rates": _q_gate_rates,
        "texttiling_gaps": _q_texttiling_gaps,
        "text_segments": _q_text_segments,
        "srt_cues": _q_srt_cues,
        "srt_transcripts": _q_srt_transcripts,
        "wikitext_blocks": _q_wikitext_blocks,
        "wikitext_links": _q_wikitext_links,
        "pdf_two_column_blocks": _q_pdf_two_column_blocks,
        "mbox_messages": _q_mbox_messages,
        "dialogue_pairs": _q_dialogue_pairs,
        "sedump_posts": _q_sedump_posts,
        "qa_sft_pairs": _q_qa_sft_pairs,
        "k_anonymity": _q_k_anonymity,
        "quasi_suppression": _q_quasi_suppression,
        "diversity_audit": _q_diversity_audit,
        "t_closeness": _q_t_closeness,
        "k_generalization": _q_k_generalization,
        "anchor_query_pairs": _q_anchor_query_pairs,
        "markdown_meta": _q_markdown_meta,
        "unidiff_stats": _q_unidiff_stats,
        "ipynb_cells": _q_ipynb_cells,
        "latex_sections": _q_latex_sections,
        "llr_keyness": _q_llr_keyness,
        "rank_sum_test": _q_rank_sum_test,
        "surt_keys": _q_surt_keys,
        "cdx_prefixes": _q_cdx_prefixes,
        "matryoshka_recall": _q_matryoshka_recall,
        "hard_negatives": _q_hard_negatives,
        "epub_roundtrip": _q_epub_roundtrip,
    }


def _gate_oracle(final_select: str) -> str:
    """DuckDB replica of the access-gate fixture + signals: the marker
    regex lists come straight from operators/gates.py so the Spark and
    oracle sides cannot drift; ``final_select`` runs over the shared
    ``sig`` CTE of per-page counts."""
    from pdf_to_epub_spark.operators.gates import (
        CONSENT_MARKERS,
        PAYWALL_MARKERS,
    )

    pw = " + ".join(
        f"len(regexp_extract_all(lt, '{p}'))" for p in PAYWALL_MARKERS
    )
    cs = " + ".join(
        f"len(regexp_extract_all(lt, '{p}'))" for p in CONSENT_MARKERS
    )
    return f"""
        WITH toks AS (
            SELECT doc_id,
                   list_filter(
                       regexp_split_to_array(coalesce(text, ''), '\\s+'),
                       x -> x <> '') AS tk,
                   coalesce(text, '') AS orig
            FROM documents
        ), base AS (
            SELECT doc_id, 'd' || (doc_id % 7) AS domain,
                   CASE WHEN doc_id % 7 = 3 THEN
                       array_to_string(list_slice(tk, 1, 25), ' ')
                       || ' Subscribe to continue reading.'
                       || ' Already a subscriber? Sign in.'
                       || ' Unlock unlimited digital access.'
                   WHEN doc_id % 7 = 1 THEN
                       'We value your privacy. We and our partners use'
                       || ' cookies. Accept all cookies or manage your'
                       || ' preferences. ' || orig
                   ELSE orig END AS text
            FROM toks
        ), lowered AS (
            SELECT doc_id, domain, text, lower(text) AS lt FROM base
        ), sig AS (
            SELECT doc_id, domain,
                   len(regexp_extract_all(text, '\\S+'))::BIGINT AS n_words,
                   ({pw})::BIGINT AS paywall_hits,
                   ({cs})::BIGINT AS consent_hits
            FROM lowered
        )
        {final_select}
    """


def _texttiling_oracle(final_select: str) -> str:
    """DuckDB replica of operators/segment.py (w=10, k=2): pseudo-
    sentence term counts (grouped by the term STRING — the Spark side's
    64-bit hash is equality-only, exact up to 2⁻⁶⁴ collisions), full-
    window gaps only, integer micro-Dice, local-valley depth, cross-
    multiplied at-or-above-mean boundary rule.  ``final_select`` runs
    over the ``scored`` (gaps) and ``np`` (doc lengths) CTEs."""
    return f"""
        WITH t AS (
            SELECT doc_id,
                   list_filter(
                       regexp_split_to_array(coalesce(text, ''), '\\s+'),
                       x -> x <> '') AS toks
            FROM documents
        ), tok AS (
            SELECT doc_id, (i - 1) // 10 AS ps, lower(toks[i]) AS term
            FROM t, unnest(generate_series(1, len(toks))) AS u(i)
        ), pc AS (
            SELECT doc_id, ps, term, count(*)::BIGINT AS cnt
            FROM tok GROUP BY doc_id, ps, term
        ), np AS (
            SELECT doc_id, max(ps) + 1 AS n_ps FROM pc GROUP BY doc_id
        ), contrib AS (
            SELECT pc.doc_id, g.gap, term, cnt AS cl, 0::BIGINT AS cr
            FROM pc JOIN np USING (doc_id),
                 unnest(generate_series(greatest(ps + 1, 2),
                                        least(ps + 2, n_ps - 2))) AS g(gap)
            WHERE greatest(ps + 1, 2) <= least(ps + 2, n_ps - 2)
            UNION ALL
            SELECT pc.doc_id, g.gap, term, 0::BIGINT, cnt
            FROM pc JOIN np USING (doc_id),
                 unnest(generate_series(greatest(ps - 1, 2),
                                        least(ps, n_ps - 2))) AS g(gap)
            WHERE greatest(ps - 1, 2) <= least(ps, n_ps - 2)
        ), per_term AS (
            SELECT doc_id, gap, term,
                   sum(cl) AS cl, sum(cr) AS cr
            FROM contrib GROUP BY doc_id, gap, term
        ), per_gap AS (
            SELECT doc_id, gap,
                   sum(least(cl, cr)) AS inter,
                   sum(cl) + sum(cr) AS total
            FROM per_term GROUP BY doc_id, gap
        ), sims AS (
            SELECT doc_id, gap,
                   (2000000 * inter) // total AS sim_micro
            FROM per_gap
        ), depths AS (
            SELECT doc_id, gap, sim_micro,
                   greatest(coalesce(
                       lag(sim_micro) OVER w - sim_micro, 0), 0)
                   + greatest(coalesce(
                       lead(sim_micro) OVER w - sim_micro, 0), 0)
                       AS depth_micro
            FROM sims WINDOW w AS (PARTITION BY doc_id ORDER BY gap)
        ), scored AS (
            SELECT doc_id, gap, sim_micro, depth_micro,
                   (depth_micro > 0 AND
                    depth_micro * (count(*) OVER d)
                        >= (sum(depth_micro) OVER d)) AS is_boundary
            FROM depths WINDOW d AS (PARTITION BY doc_id)
        )
        {final_select}
    """


def _subtitle_oracle(final_select: str) -> str:
    """DuckDB replica of the subtitle fixture derivation
    (sources/subtitles.py constants: 8-token cues, 2.5 s pitch, 5 s
    silence before every 10th cue): ``final_select`` runs over the
    ``cu`` CTE of per-cue token slices."""
    return f"""
        WITH t AS (
            SELECT doc_id,
                   list_filter(
                       regexp_split_to_array(coalesce(text, ''), '\\s+'),
                       x -> x <> '') AS toks
            FROM documents
        ), c AS (
            SELECT doc_id, toks,
                   unnest(generate_series(0, (len(toks) + 7) // 8 - 1))
                       AS cue
            FROM t WHERE len(toks) >= 1
        ), cu AS (
            SELECT doc_id, cue,
                   list_slice(toks, cue * 8 + 1, cue * 8 + 8) AS ct
            FROM c
        )
        {final_select}
    """


def _mbox_oracle(final_select: str) -> str:
    """DuckDB replica of the mbox fixture derivation (sources/mbox.py
    constants: 50-token messages, 10-token body lines, 'From the desk…'
    openers, Re:-chained subjects): ``final_select`` runs over the
    ``msgs`` CTE of per-message (m, subject, n_quoted, body) rows."""
    return f"""
        WITH d AS (
            SELECT doc_id,
                   list_filter(
                       regexp_split_to_array(coalesce(text, ''), '\\s+'),
                       x -> x <> '') AS toks
            FROM documents
        ), n AS (
            SELECT doc_id, toks,
                   greatest((len(toks) + 49) // 50, 1) AS nm
            FROM d
        ), ms AS (
            SELECT doc_id, toks,
                   unnest(generate_series(0, nm - 1)) AS m
            FROM n
        ), ch AS (
            SELECT doc_id, m,
                   list_slice(toks, m * 50 + 1, m * 50 + 50) AS chunk
            FROM ms
        ), lj AS (
            SELECT doc_id, m, u.j,
                   array_to_string(
                       list_slice(chunk, u.j * 10 + 1, u.j * 10 + 10),
                       ' ') AS line
            FROM ch,
                 unnest(generate_series(0, (len(chunk) + 9) // 10 - 1))
                     AS u(j)
            WHERE len(chunk) > 0
        ), bodies AS (
            SELECT doc_id, m,
                   string_agg(line, chr(10) ORDER BY j) AS rest
            FROM lj GROUP BY doc_id, m
        ), msgs AS (
            SELECT ch.doc_id, ch.m,
                   CASE WHEN ch.m = 0 THEN 'Thread ' || ch.doc_id
                        ELSE 'Re: Thread ' || ch.doc_id END AS subject,
                   CASE WHEN ch.m = 0 THEN 0 ELSE 1 END AS n_quoted,
                   'From the desk of user ' || ch.m ||
                   CASE WHEN b.rest IS NULL THEN ''
                        ELSE chr(10) || b.rest END AS body
            FROM ch LEFT JOIN bodies b USING (doc_id, m)
        )
        {final_select}
    """


def _sedump_oracle(final_select: str) -> str:
    """DuckDB replica of the Stack-Exchange dump derivation
    (sources/sedump.py constants: 40-token posts, 8-token body lines,
    the 'A & B <c> "m"' opener, scores ``doc_id % 5`` for the question
    and ``(doc_id + 3·m) % 7 − 1`` for answer ordinal m, accepted =
    argmax(score, −m)): ``final_select`` runs over the ``posts`` CTE of
    (doc_id, post_id, post_type, parent_id, accepted_id, score, title,
    body, np, m) rows."""
    return f"""
        WITH d AS (
            SELECT doc_id,
                   list_filter(
                       regexp_split_to_array(coalesce(text, ''), '\\s+'),
                       x -> x <> '') AS toks
            FROM documents
        ), n AS (
            SELECT doc_id, toks,
                   greatest((len(toks) + 39) // 40, 2) AS np
            FROM d
        ), ms AS (
            SELECT doc_id, toks, np,
                   unnest(generate_series(0, np - 1)) AS m
            FROM n
        ), ch AS (
            SELECT doc_id, np, m,
                   list_slice(toks, m * 40 + 1, m * 40 + 40) AS chunk
            FROM ms
        ), lj AS (
            SELECT doc_id, m, u.j,
                   array_to_string(
                       list_slice(chunk, u.j * 8 + 1, u.j * 8 + 8),
                       ' ') AS line
            FROM ch,
                 unnest(generate_series(0, (len(chunk) + 7) // 8 - 1))
                     AS u(j)
            WHERE len(chunk) > 0
        ), bodies AS (
            SELECT doc_id, m,
                   string_agg(line, chr(10) ORDER BY j) AS rest
            FROM lj GROUP BY doc_id, m
        ), pm AS (
            SELECT ch.doc_id, ch.np, ch.m,
                   'A & B <c> "' || ch.m || '"' ||
                   CASE WHEN b.rest IS NULL THEN ''
                        ELSE chr(10) || b.rest END AS body,
                   CASE WHEN ch.m = 0 THEN ch.doc_id % 5
                        ELSE (ch.doc_id + 3 * ch.m) % 7 - 1 END AS score
            FROM ch LEFT JOIN bodies b USING (doc_id, m)
        ), best AS (
            SELECT doc_id, m AS best_m,
                   row_number() OVER (
                       PARTITION BY doc_id
                       ORDER BY score DESC, m ASC) AS rn
            FROM pm WHERE m > 0
        ), posts AS (
            SELECT pm.doc_id,
                   (pm.m + 1)::BIGINT AS post_id,
                   (CASE WHEN pm.m = 0 THEN 1 ELSE 2 END)::BIGINT
                       AS post_type,
                   (CASE WHEN pm.m = 0 THEN NULL ELSE 1 END)::BIGINT
                       AS parent_id,
                   (CASE WHEN pm.m = 0 THEN b.best_m + 1
                         ELSE NULL END)::BIGINT AS accepted_id,
                   pm.score::BIGINT AS score,
                   CASE WHEN pm.m = 0 THEN 'Question ' || pm.doc_id
                        ELSE NULL END AS title,
                   pm.body, pm.np, pm.m
            FROM pm LEFT JOIN (
                SELECT doc_id, best_m FROM best WHERE rn = 1
            ) b USING (doc_id)
        )
        {final_select}
    """


def _shingle_jaccard_oracle(k: int, threshold: float, final: str | None = None) -> str:
    """DuckDB replica of the mutated-recrawl shingle-Jaccard queries: exact
    k-word-shingle Jaccard over documents ∪ last-word-dropped copies.

    Shingle semantics mirror operators/dedup.py `_shingles_from_tokens` exactly:
    split(trim(lower(text)), '\\s+'), distinct k-grams joined by ' ', whole
    text as the single shingle when fewer than k tokens.  The min/max size
    prefilter is sound (J(A,B) ≤ min(|A|,|B|)/max(|A|,|B|)), it just prunes
    the quadratic pair scan.

    ``final`` overrides the closing SELECT (receives a ``truepairs`` CTE
    with id_a/id_b/jaccard and the ``corpus`` CTE) — used by the survivor
    oracle for the near-dup removal query."""
    final = final or """
        SELECT id_a, id_b, round(jaccard, 4) AS jaccard FROM truepairs
    """
    return f"""
        WITH corpus AS (
            SELECT doc_id, text FROM documents
            UNION ALL
            SELECT doc_id + 1000000, regexp_replace(text, '\\s+\\S+\\s*$', '')
            FROM documents
        ),
        sh AS (
            SELECT doc_id,
                CASE WHEN len(toks) >= {k} THEN
                    list_distinct(list_transform(
                        generate_series(1, len(toks)-{k}+1),
                        i -> array_to_string(list_slice(toks, i, i+{k}-1), ' ')))
                ELSE [array_to_string(toks, ' ')] END AS shingles
            FROM (SELECT doc_id,
                         regexp_split_to_array(trim(lower(text)), '\\s+') AS toks
                  FROM corpus)
        ),
        sized AS (SELECT doc_id, shingles, len(shingles) AS n FROM sh),
        truepairs AS (
            SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                   len(list_intersect(a.shingles, b.shingles))::DOUBLE
                   / (a.n + b.n - len(list_intersect(a.shingles, b.shingles)))
                   AS jaccard
            FROM sized a JOIN sized b
              ON a.doc_id < b.doc_id
             AND least(a.n, b.n)::DOUBLE / greatest(a.n, b.n) >= {threshold}
            WHERE len(list_intersect(a.shingles, b.shingles))::DOUBLE
                  / (a.n + b.n - len(list_intersect(a.shingles, b.shingles)))
                  >= {threshold}
        )
        {final}
    """


def _extraction_golden_values() -> str | None:
    """Inline-VALUES form of tests/golden/extraction_golden.parquet (the
    reference-pipeline Step3 hashes; see tests/make_extraction_goldens.py).
    Inlined rather than read_parquet'd so the oracle works regardless of
    the driver's DuckDB file-access configuration; the corpus_key column
    (md5 of doc 0's text) lets one oracle serve both sf corpora, which
    share doc_ids but not texts."""
    import pyarrow.parquet as pq

    path = (
        pathlib.Path(__file__).resolve().parent
        / "tests" / "golden" / "extraction_golden.parquet"
    )
    if not path.exists():
        return None
    t = pq.read_table(path)
    return ",\n            ".join(
        f"('{ck}','{url}','{sha}',{n})"
        for ck, url, sha, n in zip(
            t["corpus_key"].to_pylist(),
            t["url"].to_pylist(),
            t["text_sha"].to_pylist(),
            t["n_chars"].to_pylist(),
        )
    )


def _extraction_oracles() -> dict[str, str]:
    vals = _extraction_golden_values()
    if vals is None:  # goldens not generated: queries fall back to rows-only
        return {}
    base = f"""
        WITH golden(corpus_key, url, text_sha, n_chars) AS (VALUES
            {vals}),
        matched AS (
            SELECT url, text_sha, n_chars::BIGINT AS n_chars FROM golden
            WHERE corpus_key = (SELECT md5(text) FROM documents WHERE doc_id = 0)
        )
    """
    oracles = {
        "assemble_documents": base + "SELECT url, text_sha, n_chars FROM matched",
        # binary wrap → pandas-UDF decode → extract must be byte-transparent
        "binary_decode_extract": base + "SELECT url, text_sha, n_chars FROM matched",
        "extract_blocks": base
        + """SELECT url, text_sha, n_chars,
                    0::BIGINT AS span_gap, 0::BIGINT AS first_span
             FROM matched""",
    }

    cpath = (
        pathlib.Path(__file__).resolve().parent
        / "tests" / "golden" / "extraction_counters_golden.parquet"
    )
    if cpath.exists():
        import pyarrow.parquet as pq

        t = pq.read_table(cpath)
        cvals = ",\n            ".join(
            f"('{ck}','{counter}',{total})"
            for ck, counter, total in zip(
                t["corpus_key"].to_pylist(),
                t["counter"].to_pylist(),
                t["total"].to_pylist(),
            )
        )
        oracles["extraction_metrics"] = f"""
            WITH golden(corpus_key, counter, total) AS (VALUES
                {cvals})
            SELECT counter, total::BIGINT AS total FROM golden
            WHERE corpus_key = (SELECT md5(text) FROM documents WHERE doc_id = 0)
        """
    return oracles


def _media_features_oracle(n: int = 200) -> str:
    """Golden-VALUES oracle for the multimodal decode query: the corpus is
    deterministic (make_media_corpus(seed=7)), so the expected
    (container, n_bytes, width, height, n_frames, status) per media_id is
    computed ONCE here with the pure stdlib codecs (no Spark) and inlined —
    the same pattern as the reference-pipeline extraction goldens.  The
    Python sniffing below replicates the JVM-side magic-byte when-chain in
    operators/multimodal.sniff_container bit-for-bit (same _MAGIC order,
    same ftyp-at-offset-5 mp4 rule)."""
    from pdf_to_epub_spark.functions.mediacodec import UnsupportedMedia
    from pdf_to_epub_spark.operators.multimodal import (
        decode_media,
        make_media_corpus,
        py_sniff_container as sniff,
    )

    rows = []
    for r in make_media_corpus(n):
        raw = r["payload"]
        container = sniff(raw)
        try:
            feat = decode_media(raw, container)
            w, h, nf, status = feat["width"], feat["height"], feat["n_frames"], "ok"
        except UnsupportedMedia:
            w = h = nf = None
            status = "unsupported"
        sql_int = lambda v: "NULL" if v is None else str(v)  # noqa: E731
        rows.append(
            f"({r['media_id']},'{r['media_type']}','{container}',{len(raw)},"
            f"{sql_int(w)},{sql_int(h)},{sql_int(nf)},'{status}')"
        )
    vals = ",\n            ".join(rows)
    return f"""
        WITH golden(media_id, media_type, container, n_bytes, width, height,
                    n_frames, status) AS (VALUES
            {vals})
        SELECT media_id::BIGINT AS media_id, media_type, container,
               n_bytes::BIGINT AS n_bytes, width::INTEGER AS width,
               height::INTEGER AS height, n_frames::INTEGER AS n_frames,
               status
        FROM golden
    """


def _vec_lit(v: list[float]) -> str:
    return "[" + ",".join(repr(float(x)) for x in v) + "]::DOUBLE[]"


# Gopher feature algebra shared by the gopher_quality oracle and the
# corpus_tiers composition (tier rules read the same rounded signals).
_GOPHER_ORACLE = r"""
            WITH w AS (
                SELECT doc_id, text,
                       regexp_split_to_array(trim(text), '\s+') AS words,
                       list_filter(string_split(text, chr(10)),
                                   l -> regexp_matches(l, '[^ \t\r]')) AS lines
                FROM documents),
            feats AS (
                SELECT doc_id,
                    len(words) AS n_words,
                    list_aggregate(list_transform(words, x -> length(x)),
                                   'sum')::DOUBLE
                        / greatest(len(words), 1) AS mean_wlen,
                    (length(text) - length(replace(text, '#', ''))
                     + len(regexp_extract_all(text, '\.\.\.')))::DOUBLE
                        / greatest(len(words), 1) AS symbol_ratio,
                    len(list_filter(lines,
                        l -> regexp_matches(l, '^\s*[•\-\*]')))::DOUBLE
                        / greatest(len(lines), 1) AS bullet_ratio,
                    len(list_filter(lines,
                        l -> regexp_matches(l, '\.\.\.\s*$')))::DOUBLE
                        / greatest(len(lines), 1) AS ellipsis_ratio,
                    len(list_filter(words,
                        x -> regexp_matches(x, '[A-Za-zÀ-ÖØ-öø-ÿ]')))::DOUBLE
                        / greatest(len(words), 1) AS alpha_ratio,
                    len(list_intersect(
                        list_distinct(regexp_extract_all(lower(text),
                                                         '[a-zà-öø-ÿ]+')),
                        ['the','be','to','of','and','that','have','with']))
                        AS stop_hits
                FROM w)
            SELECT doc_id, n_words::BIGINT AS n_words,
                   round(mean_wlen, 4) AS mean_word_len,
                   round(symbol_ratio, 4) AS symbol_ratio,
                   round(bullet_ratio, 4) AS bullet_line_ratio,
                   round(ellipsis_ratio, 4) AS ellipsis_line_ratio,
                   round(alpha_ratio, 4) AS alpha_word_ratio,
                   stop_hits::BIGINT AS stopword_hits,
                   (n_words BETWEEN 50 AND 100000
                    AND mean_wlen BETWEEN 3.0 AND 10.0
                    AND symbol_ratio < 0.1
                    AND bullet_ratio < 0.9
                    AND ellipsis_ratio < 0.3
                    AND alpha_ratio > 0.8
                    AND stop_hits >= 2) AS keep
            FROM feats
        """


_COSINE = (
    "list_dot_product({a}, {b}) / (sqrt(list_dot_product({a}, {a}))"
    " * sqrt(list_dot_product({b}, {b})))"
)


def _lsh_topk_oracle(
    dim: int = 64, bits: int = 4, n_tables: int = 12, seed: int = 7, k: int = 10
) -> str:
    """DuckDB replica of the multi-table hyperplane LSH top-k: the SAME
    hyperplanes the Spark operator generates (similarity._hyperplanes is
    deterministic in (dim, bits, seed)) are inlined as literals, bucket
    assignment/candidate-union/exact-ranking are recomputed relationally —
    so the approximate result itself is oracle-checked, not just its
    recall."""
    from pdf_to_epub_spark.operators.similarity import _hyperplanes

    def bucket(vexpr: str, t: int) -> str:
        planes = _hyperplanes(dim, bits, seed + t)
        return " + ".join(
            f"(CASE WHEN list_dot_product({vexpr}, {_vec_lit(p)}) > 0"
            f" THEN {1 << i} ELSE 0 END)"
            for i, p in enumerate(planes)
        )

    cb = "\nUNION ALL\n".join(
        f"SELECT vec_id, {t} AS t, {bucket('v', t)} AS b FROM e"
        for t in range(n_tables)
    )
    qb = "\nUNION ALL\n".join(
        f"SELECT query_id, {t} AS t, {bucket('qv', t)} AS b FROM q"
        for t in range(n_tables)
    )
    cos = _COSINE.format(a="e.v", b="q.qv")
    return f"""
        WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 5),
        cb AS ({cb}),
        qb AS ({qb}),
        cand AS (
            SELECT DISTINCT qb.query_id, cb.vec_id
            FROM cb JOIN qb ON cb.t = qb.t AND cb.b = qb.b),
        scored AS (
            SELECT c.query_id, c.vec_id, {cos} AS raw
            FROM cand c
            JOIN e ON e.vec_id = c.vec_id
            JOIN q ON q.query_id = c.query_id),
        ranked AS (
            SELECT query_id, vec_id, raw,
                   row_number() OVER (PARTITION BY query_id
                                      ORDER BY raw DESC, vec_id ASC) AS rank
            FROM scored)
        SELECT query_id, vec_id, round(raw, 6) AS score, rank
        FROM ranked WHERE rank <= {k}
    """


def _ivf_topk_oracle(
    k: int = 10, n_centroids: int = 16, nprobe: int = 10,
    sample_size: int = 512, seed: int = 5,
) -> str | None:
    """DuckDB replica of the IVF top-k.  The coarse centroids are data-
    dependent, so they are recomputed here in plain Python with the same
    deterministic Lloyd's code over the same hash-spread 512-row sample the
    Spark operator collects (ordered by md5(str(vec_id)) — Spark
    ``md5(cast(id as string))`` sorts identically to Python
    ``hashlib.md5(str(id)).hexdigest()`` since both are lowercase-hex ASCII),
    once per testdata corpus, and inlined as a corpus-keyed VALUES table
    (key = first component of vec 0, the corpora share ids but not
    vectors).  Cell assignment, nprobe probing and exact ranking are then
    recomputed relationally."""
    import hashlib

    import pyarrow.parquet as pq

    from pdf_to_epub_spark.operators.similarity import _kmeans_centroids

    cent_rows: list[str] = []
    for sf_dir in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        path = pathlib.Path(sf_dir) / "embeddings.parquet"
        if not path.exists():
            return None
        t = pq.read_table(path, columns=["vec_id", "embedding"])
        by_id = sorted(zip(t["vec_id"].to_pylist(), t["embedding"].to_pylist()))
        spread = sorted(
            by_id,
            key=lambda r: (hashlib.md5(str(r[0]).encode()).hexdigest(), r[0]),
        )
        sample = [[float(x) for x in v] for _, v in spread[:sample_size]]
        key = round(float(by_id[0][1][0]), 6)
        for cid, c in enumerate(_kmeans_centroids(sample, n_centroids, seed=seed)):
            cent_rows.append(f"({key!r}, {cid}, {_vec_lit(c)})")
    vals = ",\n            ".join(cent_rows)
    cos = _COSINE.format(a="e.v", b="q.qv")
    return f"""
        WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 5),
        cents(corpus_key, cid, c) AS (VALUES
            {vals}),
        acts AS (
            SELECT cid, c FROM cents
            WHERE abs(corpus_key - (
                SELECT round((embedding::DOUBLE[])[1], 6)
                FROM embeddings WHERE vec_id = 0)) < 1e-9),
        cell AS (
            SELECT vec_id, cid FROM (
                SELECT e.vec_id, a.cid,
                       row_number() OVER (PARTITION BY e.vec_id
                           ORDER BY list_distance(e.v, a.c), a.cid) AS rn
                FROM e CROSS JOIN acts a)
            WHERE rn = 1),
        probe AS (
            SELECT query_id, cid FROM (
                SELECT q.query_id, a.cid,
                       row_number() OVER (PARTITION BY q.query_id
                           ORDER BY list_distance(q.qv, a.c), a.cid) AS rn
                FROM q CROSS JOIN acts a)
            WHERE rn <= {nprobe}),
        cand AS (
            SELECT p.query_id, c.vec_id
            FROM probe p JOIN cell c ON c.cid = p.cid),
        scored AS (
            SELECT cd.query_id, cd.vec_id, {cos} AS raw
            FROM cand cd
            JOIN e ON e.vec_id = cd.vec_id
            JOIN q ON q.query_id = cd.query_id),
        ranked AS (
            SELECT query_id, vec_id, raw,
                   row_number() OVER (PARTITION BY query_id
                                      ORDER BY raw DESC, vec_id ASC) AS rank
            FROM scored)
        SELECT query_id, vec_id, round(raw, 6) AS score, rank
        FROM ranked WHERE rank <= {k}
    """


def _extraction_eval_oracle() -> str:
    """DuckDB replay of the naive-strip extraction eval: page rebuild
    (constants interpolated from sources/synth so the two constructions
    cannot drift), global tag strip, tokenization, and the multiset
    P/R/F1 — NULL/zero denominators included."""
    from pdf_to_epub_spark.sources.synth import _AD, _ASIDE, _NAV

    return f"""
        WITH esc AS (
            SELECT doc_id,
                   replace(replace(replace(coalesce(text, ''),
                       '&', '&amp;'), '<', '&lt;'), '>', '&gt;') AS t,
                   coalesce(text, '') AS raw
            FROM documents
        ), lns AS (
            SELECT doc_id, raw,
                   list_filter(string_split(t, chr(10)),
                               x -> regexp_matches(x, '[^ \\t\\r]')) AS ls
            FROM esc
        ), pg AS (
            SELECT doc_id, raw,
                   '<html><head><title>doc://' || doc_id ||
                   '</title></head><body>{_NAV}<header><p>Crawl header ' ||
                   doc_id || '</p></header><h1>Document ' || doc_id ||
                   '</h1>' ||
                   array_to_string(list_transform(generate_series(1, len(ls)),
                       i -> '<p>' || ls[i] || '</p>' ||
                            CASE WHEN (i - 1) % 4 = 2
                                 THEN '{_AD}' ELSE '' END), '') ||
                   '{_ASIDE}<footer><p>(c) 2025 crawl.invalid ' || doc_id ||
                   '</p></footer></body></html>' AS page
            FROM lns
        ), tagged AS (
            SELECT doc_id,
                   unnest(regexp_extract_all(lower(
                       regexp_replace(page, '<[^>]*>', ' ', 'g')),
                       '[a-zà-öø-ÿ]+')) AS tok,
                   1 AS is_pred
            FROM pg
            UNION ALL
            SELECT doc_id,
                   unnest(regexp_extract_all(lower(
                       'Document' || chr(10) || raw), '[a-zà-öø-ÿ]+')) AS tok,
                   0 AS is_pred
            FROM pg
        ), pertok AS (
            SELECT doc_id, tok,
                   sum(CASE WHEN is_pred = 1 THEN 1 ELSE 0 END) AS c_p,
                   sum(CASE WHEN is_pred = 0 THEN 1 ELSE 0 END) AS c_g
            FROM tagged GROUP BY doc_id, tok
        ), perdoc AS (
            SELECT doc_id,
                   sum(c_p)::BIGINT AS n_pred,
                   sum(c_g)::BIGINT AS n_gold,
                   sum(least(c_p, c_g))::BIGINT AS n_overlap
            FROM pertok GROUP BY doc_id
        )
        SELECT doc_id, n_pred, n_gold, n_overlap,
               round(CASE WHEN n_pred > 0
                          THEN n_overlap::DOUBLE / n_pred END, 6) AS p,
               round(CASE WHEN n_gold > 0
                          THEN n_overlap::DOUBLE / n_gold END, 6) AS r,
               round(CASE WHEN n_pred > 0 AND n_gold > 0 THEN
                          CASE WHEN (n_overlap::DOUBLE / n_pred
                                     + n_overlap::DOUBLE / n_gold) > 0
                               THEN 2 * (n_overlap::DOUBLE / n_pred)
                                    * (n_overlap::DOUBLE / n_gold)
                                    / (n_overlap::DOUBLE / n_pred
                                       + n_overlap::DOUBLE / n_gold)
                               ELSE 0.0 END
                     END, 6) AS f1
        FROM perdoc
    """


def _bpe_merges_oracle(n_merges: int = 8, min_weight: int = 2) -> str | None:
    """Independent pure-Python Sennrich BPE replay (tokenize → weighted
    vocab → iterative pair argmax with (weight desc, pair asc) ties →
    greedy leftmost merge), inlined as a corpus-keyed VALUES table (key =
    document count, which differs across the testdata SFs)."""
    import collections
    import re as _re

    import pyarrow.parquet as pq

    rows: list[str] = []
    tok = _re.compile("[a-zà-öø-ÿ]+")
    for sf_dir in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        path = pathlib.Path(sf_dir) / "documents.parquet"
        if not path.exists():
            return None
        texts = pq.read_table(path, columns=["text"])["text"].to_pylist()
        vocab = collections.Counter()
        for t in texts:
            vocab.update(tok.findall((t or "").lower()))
        syms = {w: list(w) for w in vocab}
        # the SF dirs share the document COUNT — total text length is the
        # distinguishing corpus key
        key = sum(len(t or "") for t in texts)
        for rank in range(n_merges):
            pc: collections.Counter = collections.Counter()
            for w, n in vocab.items():
                s = syms[w]
                for x, y in zip(s, s[1:]):
                    pc[(x, y)] += n
            if not pc:
                break
            (a, b), weight = min(
                pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
            )
            if weight < min_weight:
                break
            esc_a = a.replace("'", "''")
            esc_b = b.replace("'", "''")
            rows.append(f"({key}, {rank}, '{esc_a}', '{esc_b}', {weight})")
            for w, s in syms.items():
                out: list[str] = []
                for t in s:
                    if out and out[-1] == a and t == b:
                        out[-1] = a + b
                    else:
                        out.append(t)
                syms[w] = out
    vals = ",\n            ".join(rows)
    return f"""
        WITH golden(corpus_key, rank, "left", "right", weight) AS (VALUES
            {vals})
        SELECT rank, "left", "right", weight::BIGINT AS weight
        FROM golden
        WHERE corpus_key = (SELECT sum(length(coalesce(text, '')))
                            FROM documents)
    """


# Shared lang×source chi-square CTE chain (obs→cells) — one definition
# consumed by BOTH the chi2_lang_source and cramers_v oracles so the
# cell-term association can never silently diverge between them.
_CHI2_CELLS_SQL = """WITH obs AS (SELECT lang AS a, source AS b,
                                count(*)::HUGEINT AS o
                         FROM documents
                         WHERE lang IS NOT NULL AND source IS NOT NULL
                         GROUP BY 1, 2),
            ra AS (SELECT a, sum(o)::HUGEINT AS ra FROM obs GROUP BY 1),
            cb AS (SELECT b, sum(o)::HUGEINT AS cb FROM obs GROUP BY 1),
            nn AS (SELECT sum(o)::HUGEINT AS n FROM obs),
            grid AS (SELECT ra.a, cb.b, coalesce(obs.o, 0)::HUGEINT AS o,
                            ra.ra, cb.cb, nn.n
                     FROM ra CROSS JOIN cb
                     LEFT JOIN obs ON obs.a = ra.a AND obs.b = cb.b
                     CROSS JOIN nn),
            cells AS (SELECT a, b, n,
                             CAST(round(((o * n - ra * cb)::DOUBLE
                                         * (o * n - ra * cb)::DOUBLE
                                         / ((n * ra * cb)::DOUBLE))
                                        * 1000000000, 0) AS BIGINT) AS t
                      FROM grid)"""


def _wordpiece_symbols_oracle() -> str | None:
    """Independent pure-Python WordPiece replay (tokenize → weighted
    word vocab → top-8+alphabet piece set → greedy longest-match with
    ## continuations → symbol rollup), inlined as a corpus-keyed VALUES
    table (key = total text length, the SF discriminator)."""
    import collections
    import re as _re

    import pyarrow.parquet as pq

    chars = "abcdefghijklmnopqrstuvwxyz" + "".join(
        chr(c) for c in list(range(0xE0, 0xF7)) + list(range(0xF8, 0x100))
    )
    tok = _re.compile("[a-z\u00e0-\u00f6\u00f8-\u00ff]+")
    rows: list[str] = []
    for sf_dir in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        path = pathlib.Path(sf_dir) / "documents.parquet"
        if not path.exists():
            return None
        texts = pq.read_table(path, columns=["text"])["text"].to_pylist()
        key = sum(len(t or "") for t in texts)
        vocab = collections.Counter()
        for t in texts:
            vocab.update(tok.findall((t or "").lower()))
        top = [
            w
            for w, _ in sorted(
                vocab.items(), key=lambda kv: (-kv[1], kv[0])
            )[:8]
        ]
        pieces = set(top) | set(chars) | {"##" + ch for ch in chars}

        def enc(w):
            out, i, n = [], 0, len(w)
            while i < n:
                j = n
                found = None
                while j > i:
                    sub = w[i:j] if i == 0 else "##" + w[i:j]
                    if sub in pieces:
                        found = sub
                        break
                    j -= 1
                if found is None:
                    return ["[UNK]"]
                out.append(found)
                i = j
            return out

        agg: dict[str, list[int]] = {}
        for w, n in vocab.items():
            syms = enc(w)
            # occurrences: once per symbol OCCURRENCE (weighted);
            # n_words: once per DISTINCT word containing the symbol —
            # matching countDistinct('word') on the Spark side (a symbol
            # repeated inside one word must not double-count the word)
            for sym in syms:
                agg.setdefault(sym, [0, 0])[1] += n
            for sym in set(syms):
                agg[sym][0] += 1
        for sym, (nw, occ) in sorted(agg.items()):
            esc = sym.replace("'", "''")
            rows.append(f"({key}, '{esc}', {nw}, {occ})")
    vals = ",\n            ".join(rows)
    return f"""
        WITH golden(corpus_key, symbol, n_words, occurrences) AS (VALUES
            {vals})
        SELECT symbol, n_words::BIGINT AS n_words,
               occurrences::BIGINT AS occurrences
        FROM golden
        WHERE corpus_key = (SELECT sum(length(coalesce(text, '')))
                            FROM documents)
    """


def _dsir_weights_oracle(final: str | None = None) -> str:
    """Shared DuckDB replay of the DSIR importance weights (see
    `_q_dsir_weights`): hashed unigram+bigram buckets via the md5-60
    arithmetic, add-one smoothed per-bucket log-ratios in integer
    micro-nats, doc-keyed sums.  ``final`` overrides the closing SELECT
    (receives a ``weights`` CTE with doc_id/n_feats/log_weight_micro) —
    used by the Gumbel-resample oracle."""
    final = final or """
        SELECT doc_id, n_feats, log_weight_micro FROM weights
    """
    return f"""
            WITH toks AS (
                SELECT doc_id, lang,
                       regexp_extract_all(lower(coalesce(text, '')),
                                          '[a-zà-öø-ÿ]+') AS ws
                FROM documents
            ), feats AS (
                SELECT doc_id, lang, unnest(ws) AS f FROM toks
                UNION ALL
                SELECT doc_id, lang,
                       unnest(list_transform(generate_series(1, len(ws) - 1),
                              i -> ws[i] || ' ' || ws[i + 1])) AS f
                FROM toks
            ), bk AS (
                SELECT doc_id, lang,
                       ('0x' || substr(md5(f), 1, 15))::BIGINT % 4096
                           AS bucket
                FROM feats
            ), rc AS (
                SELECT bucket, count(*)::BIGINT AS c_r FROM bk
                GROUP BY bucket
            ), tc AS (
                SELECT bucket, count(*)::BIGINT AS c_t FROM bk
                WHERE lang = 'en' GROUP BY bucket
            ), tot AS (
                SELECT (SELECT coalesce(sum(c_r), 0) FROM rc) AS n_r,
                       (SELECT coalesce(sum(c_t), 0) FROM tc) AS n_t
            ), ratio AS (
                SELECT g.bucket,
                       round((ln((coalesce(tc.c_t, 0) + 1.0)
                                 / (tot.n_t + 4096.0))
                            - ln((coalesce(rc.c_r, 0) + 1.0)
                                 / (tot.n_r + 4096.0))) * 1e6)::BIGINT
                           AS lr_micro
                FROM (SELECT unnest(generate_series(0, 4095)) AS bucket) g
                LEFT JOIN rc ON rc.bucket = g.bucket
                LEFT JOIN tc ON tc.bucket = g.bucket, tot
            ), scored AS (
                SELECT bk.doc_id, count(*)::BIGINT AS n_feats,
                       sum(r.lr_micro)::BIGINT AS lwm
                FROM bk JOIN ratio r ON r.bucket = bk.bucket
                GROUP BY bk.doc_id
            ), weights AS (
                SELECT d.doc_id,
                       coalesce(s.n_feats, 0)::BIGINT AS n_feats,
                       coalesce(s.lwm, 0)::BIGINT AS log_weight_micro
                FROM documents d LEFT JOIN scored s ON s.doc_id = d.doc_id
            )
            {final}
    """


def _bpe_encode_oracle(n_merges: int = 8, min_weight: int = 2) -> str | None:
    """Pure-Python replay of learn(8)+encode+symbol-count (the encode half
    of `_bpe_merges_oracle`'s Sennrich replay), inlined as a corpus-keyed
    VALUES table."""
    import collections
    import re as _re

    import pyarrow.parquet as pq

    rows: list[str] = []
    tok = _re.compile("[a-zà-öø-ÿ]+")
    for sf_dir in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        path = pathlib.Path(sf_dir) / "documents.parquet"
        if not path.exists():
            return None
        texts = pq.read_table(path, columns=["text"])["text"].to_pylist()
        vocab = collections.Counter()
        for t in texts:
            vocab.update(tok.findall((t or "").lower()))
        syms = {w: list(w) for w in vocab}
        key = sum(len(t or "") for t in texts)
        for _rank in range(n_merges):
            pc: collections.Counter = collections.Counter()
            for w, n in vocab.items():
                s = syms[w]
                for x, y in zip(s, s[1:]):
                    pc[(x, y)] += n
            if not pc:
                break
            (a, b), weight = min(
                pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
            )
            if weight < min_weight:
                break
            for w, s in syms.items():
                out: list[str] = []
                for t in s:
                    if out and out[-1] == a and t == b:
                        out[-1] = a + b
                    else:
                        out.append(t)
                syms[w] = out
        n_words: collections.Counter = collections.Counter()
        occ: collections.Counter = collections.Counter()
        for w, n in vocab.items():
            for sym in set(syms[w]):
                n_words[sym] += 1
            for sym in syms[w]:
                occ[sym] += n
        for sym in sorted(occ):
            esc = sym.replace("'", "''")
            rows.append(f"({key}, '{esc}', {n_words[sym]}, {occ[sym]})")
    vals = ",\n            ".join(rows)
    return f"""
        WITH golden(corpus_key, symbol, n_words, occurrences) AS (VALUES
            {vals})
        SELECT symbol, n_words::BIGINT AS n_words,
               occurrences::BIGINT AS occurrences
        FROM golden
        WHERE corpus_key = (SELECT sum(length(coalesce(text, '')))
                            FROM documents)
    """


def _bpe_fertility_oracle(n_merges: int = 8, min_weight: int = 2) -> str | None:
    """Pure-Python replay of learn(8) + per-(lang, word) encode +
    fertility aggregation, inlined as a corpus-keyed VALUES table."""
    import collections
    import re as _re

    import pyarrow.parquet as pq

    rows: list[str] = []
    tok = _re.compile("[a-zà-öø-ÿ]+")
    for sf_dir in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        path = pathlib.Path(sf_dir) / "documents.parquet"
        if not path.exists():
            return None
        t = pq.read_table(path, columns=["text", "lang"])
        texts = t["text"].to_pylist()
        langs = t["lang"].to_pylist()
        vocab = collections.Counter()
        by_lang: dict = collections.defaultdict(collections.Counter)
        for txt, lg in zip(texts, langs):
            ws = tok.findall((txt or "").lower())
            vocab.update(ws)
            by_lang[lg].update(ws)
        syms = {w: list(w) for w in vocab}
        key = sum(len(t_ or "") for t_ in texts)
        for _rank in range(n_merges):
            pc: collections.Counter = collections.Counter()
            for w, n in vocab.items():
                s = syms[w]
                for x, y in zip(s, s[1:]):
                    pc[(x, y)] += n
            if not pc:
                break
            (a, b), weight = min(
                pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
            )
            if weight < min_weight:
                break
            for w, s in syms.items():
                out: list[str] = []
                for c in s:
                    if out and out[-1] == a and c == b:
                        out[-1] = a + b
                    else:
                        out.append(c)
                syms[w] = out
        for lg in sorted(by_lang):
            n_tok = sum(by_lang[lg].values())
            n_sub = sum(n * len(syms[w]) for w, n in by_lang[lg].items())
            fert = round(n_sub / n_tok, 6) if n_tok else None
            rows.append(f"({key}, '{lg}', {n_tok}, {n_sub}, {fert})")
    vals = ",\n            ".join(rows)
    return f"""
        WITH golden(corpus_key, lang, n_tokens, n_subwords, fertility)
             AS (VALUES
            {vals})
        SELECT lang, n_tokens::BIGINT AS n_tokens,
               n_subwords::BIGINT AS n_subwords,
               fertility::DOUBLE AS fertility
        FROM golden
        WHERE corpus_key = (SELECT sum(length(coalesce(text, '')))
                            FROM documents)
    """


def _license_signals_oracle() -> str:
    """Composes the operator's own pattern tuple (imported, not retyped —
    the patterns are RE2-portable by construction) over the residue-footer
    corpus; the class rule mirrors the conservative reservation-wins
    CASE."""
    from pdf_to_epub_spark.operators.textstats import _LICENSE_PATTERNS

    cols = ",\n                       ".join(
        f"regexp_matches(lt, '{pat}') AS {name}"
        for name, pat in _LICENSE_PATTERNS
    )
    return f"""
        WITH docs AS (
            SELECT doc_id,
                   lower(coalesce(text, '') || CASE
                       WHEN doc_id % 6 = 0 THEN
                           ' Licensed under Creative Commons Attribution 4.0.'
                       WHEN doc_id % 6 = 1 THEN
                           ' All Rights Reserved. Copyright 2021 Site.'
                       WHEN doc_id % 6 = 2 THEN
                           ' Released into the Public Domain (CC0).'
                       WHEN doc_id % 6 = 3 THEN
                           ' Shared as CC-BY-SA. (c) 2020 Someone.'
                       ELSE '' END) AS lt
            FROM documents
        ), sig AS (
            SELECT doc_id,
                   {cols}
            FROM docs
        )
        SELECT doc_id, cc_license, public_domain, all_rights,
               copyright_line,
               CASE WHEN all_rights OR copyright_line THEN 'restricted'
                    WHEN cc_license OR public_domain THEN 'open'
                    ELSE 'unknown' END AS license_class
        FROM sig
    """


def _kmeans_profile_oracle(
    n_centroids: int = 16, sample_size: int = 512, seed: int = 5
) -> str | None:
    """DuckDB replica of the Lloyd's-step profile: seed centroids replayed
    in Python over the same hash-spread sample (see _ivf_topk_oracle),
    assignment by list_distance argmin, update/inertia recomputed
    relationally (component explode via the generate_series trick)."""
    import hashlib

    import pyarrow.parquet as pq

    from pdf_to_epub_spark.operators.similarity import _kmeans_centroids

    cent_rows: list[str] = []
    for sf_dir in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        path = pathlib.Path(sf_dir) / "embeddings.parquet"
        if not path.exists():
            return None
        t = pq.read_table(path, columns=["vec_id", "embedding"])
        by_id = sorted(zip(t["vec_id"].to_pylist(), t["embedding"].to_pylist()))
        spread = sorted(
            by_id,
            key=lambda r: (hashlib.md5(str(r[0]).encode()).hexdigest(), r[0]),
        )
        sample = [[float(x) for x in v] for _, v in spread[:sample_size]]
        key = round(float(by_id[0][1][0]), 6)
        for cid, c in enumerate(_kmeans_centroids(sample, n_centroids, seed=seed)):
            cent_rows.append(f"({key!r}, {cid}, {_vec_lit(c)})")
    vals = ",\n            ".join(cent_rows)
    return f"""
        WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        cents(corpus_key, cid, c) AS (VALUES
            {vals}),
        acts AS (
            SELECT cid, c FROM cents
            WHERE abs(corpus_key - (
                SELECT round((embedding::DOUBLE[])[1], 6)
                FROM embeddings WHERE vec_id = 0)) < 1e-9),
        cell AS (
            SELECT vec_id, v, cid, d FROM (
                SELECT e.vec_id, e.v, a.cid, list_distance(e.v, a.c) AS d,
                       row_number() OVER (PARTITION BY e.vec_id
                           ORDER BY list_distance(e.v, a.c), a.cid) AS rn
                FROM e CROSS JOIN acts a)
            WHERE rn = 1),
        stats AS (
            SELECT cid, count(*)::BIGINT AS n_points, avg(d) AS mean_dist
            FROM cell GROUP BY cid),
        comp AS (
            SELECT cid, u.j, avg(u.val) AS m
            FROM cell,
                 UNNEST(list_transform(generate_series(1, len(v)),
                                       j -> {{'j': j, 'val': v[j]}})) AS t(u)
            GROUP BY cid, u.j),
        shifts AS (
            SELECT comp.cid,
                   sqrt(sum((comp.m - a.c[comp.j]) * (comp.m - a.c[comp.j])))
                       AS shift
            FROM comp JOIN acts a USING (cid)
            GROUP BY comp.cid)
        SELECT s.cid AS cluster_id, s.n_points,
               round(s.mean_dist, 6) AS mean_dist,
               round(sh.shift, 6) AS shift
        FROM stats s JOIN shifts sh USING (cid)
    """


def _encoding_signals_oracle() -> str:
    """DuckDB replica of encoding_signals over the mutated corpus: the
    marker alternation and the corruption tails are spliced from the SAME
    runtime constants the Spark query uses (never retyped — the bytes
    include NBSP and C1 controls), counters via len(regexp_extract_all)."""
    from pdf_to_epub_spark.operators.textstats import mojibake_pattern

    return f"""
        WITH docs AS (
            SELECT doc_id,
                   CASE WHEN doc_id % 6 = 1 THEN text || '{_MOJI_TAIL}'
                        WHEN doc_id % 6 = 4 THEN
                            text || chr(65533) || chr(65533) || chr(7)
                                 || chr(160)
                        ELSE text END AS t
            FROM documents),
        c AS (
            SELECT doc_id, length(t) AS n_chars,
                   len(regexp_extract_all(t, '{mojibake_pattern()}'))
                       AS mojibake_hits,
                   len(regexp_extract_all(t, '\\x{{FFFD}}'))
                       AS replacement_chars,
                   len(regexp_extract_all(t,
                       '[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f]')) AS ctrl_chars,
                   len(regexp_extract_all(t, '\\x{{00A0}}')) AS nbsp_hits
            FROM docs),
        r AS (
            SELECT *,
                   round((mojibake_hits + replacement_chars + ctrl_chars)
                         / greatest(n_chars, 1), 6) AS artifact_rate
            FROM c)
        SELECT doc_id, n_chars, mojibake_hits, replacement_chars, ctrl_chars,
               nbsp_hits, artifact_rate::DOUBLE AS artifact_rate,
               (artifact_rate >= 0.001) AS flagged
        FROM r
    """


def _ocr_artifacts_oracle() -> str:
    """DuckDB replica of ocr_artifact_signals over the mutated corpus
    (same _OCR_TAIL constant spliced; real newlines ride inside the SQL
    literal)."""
    return f"""
        WITH docs AS (
            SELECT doc_id,
                   CASE WHEN doc_id % 4 = 2 THEN text || '{_OCR_TAIL}'
                        ELSE text END AS t
            FROM documents),
        c AS (
            SELECT doc_id,
                   len(regexp_extract_all(t, '\\n')) AS n_lines_break,
                   len(regexp_extract_all(t, '-\\n[a-z]')) AS hyphen_wraps,
                   len(regexp_extract_all(t, '[A-Za-z][0-9][A-Za-z]'))
                       AS digit_confusions,
                   len(regexp_extract_all(t, '(^|[ \\n])[b-hj-z]([ \\n]|$)'))
                       AS isolated_consonants,
                   len(regexp_extract_all(t, '(^|\\n).{{0,3}}(\\n|$)'))
                       AS short_lines,
                   len(regexp_extract_all(t, '[a-zà-öø-ÿ]+')) AS n_words
            FROM docs),
        r AS (
            SELECT *,
                   round((hyphen_wraps + digit_confusions
                          + isolated_consonants)
                         / greatest(n_words, 1), 6) AS damage_rate
            FROM c)
        SELECT doc_id, hyphen_wraps, digit_confusions, isolated_consonants,
               short_lines, n_words, damage_rate::DOUBLE AS damage_rate,
               (damage_rate >= 0.01) AS needs_repair
        FROM r
    """


def _semantic_dedup_oracle(
    tau: float = 0.4, n_centroids: int = 16, sample_size: int = 512, seed: int = 5
) -> str | None:
    """DuckDB replica of SemDeDup: centroids replayed in Python over the
    same md5-spread sample (per-sf VALUES keyed on vec 0's first
    component, as in _kmeans_profile_oracle), nearest-cell assignment by
    list_distance argmin (ties → cid, matching _nearest_centroids'
    struct sort), within-cell pairs, ROUNDED-cosine threshold, and the
    keep-lowest-id drop rule."""
    import hashlib

    import pyarrow.parquet as pq

    from pdf_to_epub_spark.operators.similarity import _kmeans_centroids

    cent_rows: list[str] = []
    for sf_dir in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        path = pathlib.Path(sf_dir) / "embeddings.parquet"
        if not path.exists():
            return None
        t = pq.read_table(path, columns=["vec_id", "embedding"])
        by_id = sorted(zip(t["vec_id"].to_pylist(), t["embedding"].to_pylist()))
        spread = sorted(
            by_id,
            key=lambda r: (hashlib.md5(str(r[0]).encode()).hexdigest(), r[0]),
        )
        sample = [[float(x) for x in v] for _, v in spread[:sample_size]]
        key = round(float(by_id[0][1][0]), 6)
        for cid, c in enumerate(_kmeans_centroids(sample, n_centroids, seed=seed)):
            cent_rows.append(f"({key!r}, {cid}, {_vec_lit(c)})")
    vals = ",\n            ".join(cent_rows)
    cos = _COSINE.format(a="a.v", b="b.v")
    return f"""
        WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        cents(corpus_key, cid, c) AS (VALUES
            {vals}),
        acts AS (
            SELECT cid, c FROM cents
            WHERE abs(corpus_key - (
                SELECT round((embedding::DOUBLE[])[1], 6)
                FROM embeddings WHERE vec_id = 0)) < 1e-9),
        cell AS (
            SELECT vec_id, v, cid FROM (
                SELECT e.vec_id, e.v, a.cid,
                       row_number() OVER (PARTITION BY e.vec_id
                           ORDER BY list_distance(e.v, a.c), a.cid) AS rn
                FROM e CROSS JOIN acts a)
            WHERE rn = 1),
        dropped AS (
            SELECT DISTINCT b.vec_id
            FROM cell a JOIN cell b
              ON a.cid = b.cid AND a.vec_id < b.vec_id
            WHERE round({cos}, 6) >= {tau})
        SELECT c.vec_id, c.cid AS cluster_id,
               (d.vec_id IS NULL) AS kept
        FROM cell c LEFT JOIN dropped d ON c.vec_id = d.vec_id
    """


def _simhash_oracle(max_hamming: int = 3) -> str:
    """DuckDB replica of the full SimHash pipeline over the mutated-recrawl
    corpus: 60-bit md5 token hash (identical to operators/dedup.py
    `md5_hash60`: Spark `conv(substring(md5(tok),1,15),16,10)` ≡ DuckDB
    `('0x' || substr(md5(tok),1,15))::BIGINT`), per-bit majority vote,
    fingerprint reassembly, brute-force all-pairs Hamming filter."""
    votes = ",\n                   ".join(
        f"sum(CASE WHEN (h >> {i}) & 1 = 1 THEN 1 ELSE -1 END) AS b{i}"
        for i in range(60)
    )
    fingerprint = " + ".join(
        f"(CASE WHEN b{i} > 0 THEN {1 << i}::BIGINT ELSE 0 END)" for i in range(60)
    )
    return f"""
        WITH corpus AS (
            SELECT doc_id, text FROM documents
            UNION ALL
            SELECT doc_id + 1000000, regexp_replace(text, '\\s+\\S+\\s*$', '')
            FROM documents
        ),
        toks AS (
            SELECT doc_id,
                   unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS tok
            FROM corpus
        ),
        hashed AS (
            SELECT doc_id, ('0x' || substr(md5(tok), 1, 15))::BIGINT AS h
            FROM toks
        ),
        votes AS (
            SELECT doc_id,
                   {votes}
            FROM hashed GROUP BY doc_id
        ),
        fp AS (SELECT doc_id, {fingerprint} AS simhash FROM votes)
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               bit_count(xor(a.simhash, b.simhash))::BIGINT AS hamming
        FROM fp a JOIN fp b ON a.doc_id < b.doc_id
        WHERE bit_count(xor(a.simhash, b.simhash)) <= {max_hamming}
    """


def oracle_sql() -> dict[str, str]:
    lang_votes = "\nUNION ALL\n".join(
        f"SELECT doc_id, '{lang}' AS lang, len(list_filter("
        f"regexp_extract_all(lower(text), '[a-zà-öø-ÿ]+'), w -> w IN {markers}"
        f")) AS score FROM documents"
        for lang, markers in sorted(_LANG_MARKER_SQL.items())
    )
    return {
        "pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   round(sum(l_quantity), 2) AS sum_qty,
                   round(sum(l_extendedprice), 2) AS sum_base_price,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
                   round(avg(l_quantity), 4) AS avg_qty,
                   count(*) AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-01'
            GROUP BY l_returnflag, l_linestatus
        """,
        "latest_order_per_customer": """
            SELECT o_custkey, o_orderkey,
                   strftime(o_orderdate, '%Y-%m-%d') AS order_date
            FROM (
                SELECT *, row_number() OVER (
                    PARTITION BY o_custkey
                    ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
                FROM orders)
            WHERE rn = 1
        """,
        "customers_without_orders": """
            SELECT c_custkey, c_name FROM customer
            WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
        """,
        # relational replay of sources/pdf.doc_to_pdf's layout mapping: the
        # Spark side must recover these lines FROM THE PDF BYTES (inflate,
        # text-operator walk, coordinate sort) — scrambled content order
        # makes a content-order-trusting parser fail the hash
        "pdf_extract_blocks": f"""
            WITH d AS (
                SELECT doc_id, coalesce(text, '') AS text FROM documents),
            words AS (
                SELECT doc_id,
                       CASE WHEN text = '' THEN []::VARCHAR[]
                            ELSE regexp_split_to_array(text, ' ') END AS ws
                FROM d),
            lines AS (
                SELECT doc_id, 0::BIGINT AS block_id,
                       'Document ' || doc_id AS text
                FROM words
                UNION ALL
                SELECT doc_id, i AS block_id,
                       array_to_string(
                           list_slice(ws, (i - 1) * {_PDF_WPL} + 1,
                                      i * {_PDF_WPL}), ' ') AS text
                FROM (
                    SELECT doc_id, ws,
                           unnest(generate_series(
                               1, CAST(ceil(len(ws) / {_PDF_WPL}.0) AS BIGINT)
                           )) AS i
                    FROM words))
            SELECT doc_id, block_id, block_id // {_PDF_LPP} AS page,
                   CASE WHEN block_id = 0 THEN 'heading'
                        ELSE 'paragraph' END AS block_type,
                   text
            FROM lines
        """,
        "building_segment_orders": """
            SELECT o_orderpriority, count(*) AS n_orders
            FROM orders
            WHERE o_custkey IN (
                SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
            GROUP BY o_orderpriority
        """,
        "ordered_lineitem_concat": """
            SELECT l_orderkey,
                   string_agg(CAST(l_linenumber AS VARCHAR), ','
                              ORDER BY CAST(l_linenumber AS VARCHAR)) AS lines
            FROM lineitem GROUP BY l_orderkey
        """,
        "event_deltas": """
            SELECT event_id,
                   round(value - lag(value) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id), 4) AS delta
            FROM events
        """,
        "error_islands": """
            SELECT event_id FROM (
                SELECT event_id, event_type,
                       lag(event_type) OVER w AS prev,
                       lead(event_type) OVER w AS nxt
                FROM events
                WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
            WHERE event_type = 'error'
              AND coalesce(prev, '_') <> 'error'
              AND coalesce(nxt, '_') <> 'error'
        """,
        "doc_classification": r"""
            SELECT lang,
                   CASE WHEN regexp_matches(text, '\bspark\b') THEN 'spark'
                        WHEN regexp_matches(text, '\bjoin\b') THEN 'join'
                        ELSE 'other' END AS doc_class,
                   count(*) AS n_docs
            FROM documents GROUP BY 1, 2
        """,
        "trim_leading_blanks": r"""
            SELECT doc_id,
                   length(regexp_replace('   ' || chr(10) || '  ' || text,
                                         '^\s+', '')) AS trimmed_len
            FROM documents
        """,
        "top_parts": """
            SELECT p_partkey, p_name, round(p_retailprice, 2) AS price
            FROM part ORDER BY p_retailprice DESC, p_partkey ASC LIMIT 10
        """,
        "dedup_exact": """
            WITH recrawl AS (
                SELECT doc_id, text FROM documents
                UNION ALL
                SELECT doc_id + 1000000, text FROM documents)
            SELECT md5(text) AS content_hash, count(*) AS n_docs,
                   min(doc_id) AS keeper_id
            FROM recrawl GROUP BY md5(text) HAVING count(*) > 1
        """,
        "dedup_exact_survivors": """
            WITH recrawl AS (
                SELECT doc_id, text FROM documents
                UNION ALL
                SELECT doc_id + 1000000, text FROM documents)
            SELECT min(doc_id) AS doc_id FROM recrawl GROUP BY md5(text)
        """,
        "token_counts": """
            SELECT doc_id,
                   len(regexp_extract_all(lower(text), '[a-zà-öø-ÿ]+')) AS n_words
            FROM documents
        """,
        # Single global window cumsum — the exact result the two-phase
        # score-bucket reconstruction must reproduce bit-for-bit.
        "token_budget": """
            WITH feats AS (
                SELECT doc_id,
                       round(length(regexp_replace(text,
                               '[^A-Za-zÀ-ÖØ-öø-ÿ]', '', 'g'))
                             / greatest(length(text), 1), 6) AS score,
                       len(regexp_extract_all(lower(text),
                               '[a-zà-öø-ÿ]+'))::BIGINT AS n_tokens
                FROM documents)
            SELECT doc_id, score, n_tokens,
                   (sum(n_tokens) OVER (ORDER BY score DESC, doc_id
                        ROWS UNBOUNDED PRECEDING))::BIGINT AS cum_tokens,
                   ((sum(n_tokens) OVER (ORDER BY score DESC, doc_id
                        ROWS UNBOUNDED PRECEDING)) <= 100000) AS selected
            FROM feats
        """,
        # Mirrors operators/textstats.quality_features exactly: run-delete
        # counting ≡ keep-class counting; words = accented-letter runs;
        # stopwords = the English marker set.
        "quality_scores": """
            WITH feats AS (
                SELECT doc_id,
                       length(text) AS n_chars,
                       length(regexp_replace(text,
                           '[^A-Za-zÀ-ÖØ-öø-ÿ]', '', 'g')) AS alpha_chars,
                       length(text) - length(regexp_replace(text,
                           '[\\.,;:!\\?"''—–-]+', '', 'g')) AS punct_chars,
                       regexp_extract_all(lower(text), '[a-zà-öø-ÿ]+') AS words
                FROM documents)
            SELECT doc_id,
                   round(alpha_chars / greatest(n_chars, 1), 4) AS alpha_ratio,
                   round(punct_chars / greatest(n_chars, 1), 4) AS punct_ratio,
                   round(alpha_chars / greatest(len(words), 1), 4) AS mean_word_len,
                   round(len(list_filter(words, w -> w IN
                         ('the','and','of','to','a','in','is','was')))
                         / greatest(len(words), 1), 4) AS stopword_ratio
            FROM feats
        """,
        "lang_guess": f"""
            SELECT doc_id, lang AS lang_guess FROM (
                SELECT doc_id, lang,
                       row_number() OVER (PARTITION BY doc_id
                                          ORDER BY score DESC, lang ASC) AS rn
                FROM ({lang_votes}))
            WHERE rn = 1
        """,
        # Same injection + sequential (email -> ip -> phone) scrub replayed
        # in RE2; patterns are engine-portable by construction.
        "pii_scrub": r"""
            WITH injected AS (
                SELECT doc_id,
                       text || ' contact user' || CAST(doc_id AS VARCHAR)
                            || '@example.com from 10.0.'
                            || CAST(doc_id % 256 AS VARCHAR) || '.7'
                            || CASE WHEN doc_id % 3 = 0
                               THEN ' call +1 415 555 0'
                                    || lpad(CAST(doc_id % 100 AS VARCHAR), 3, '0')
                               ELSE '' END AS text
                FROM documents),
            s1 AS (
                SELECT doc_id,
                       len(regexp_extract_all(text,
                           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
                           AS n_email,
                       regexp_replace(text,
                           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
                           '<EMAIL>', 'g') AS text
                FROM injected),
            s2 AS (
                SELECT doc_id, n_email,
                       len(regexp_extract_all(text,
                           '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS n_ip,
                       regexp_replace(text,
                           '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b',
                           '<IP>', 'g') AS text
                FROM s1),
            s3 AS (
                SELECT doc_id, n_email, n_ip,
                       len(regexp_extract_all(text, '\+?\d[\d() -]{6,}\d'))
                           AS n_phone,
                       regexp_replace(text, '\+?\d[\d() -]{6,}\d',
                           '<PHONE>', 'g') AS text
                FROM s2)
            SELECT doc_id, n_email::BIGINT AS n_email, n_ip::BIGINT AS n_ip,
                   n_phone::BIGINT AS n_phone, md5(text) AS clean_md5
            FROM s3
        """,
        # Pseudonymization replay: inject the same emails/ip, then per
        # class sort distinct matches (length desc, value asc) via
        # struct sort and fold literal replaces with list_reduce
        # (list_prepend makes the text the fold init).
        "pseudonymize_pii": r"""
            WITH inj AS (
                SELECT doc_id,
                       coalesce(text, '')
                       || ' contact u' || CAST(doc_id % 50 AS VARCHAR)
                       || '@ex' || CAST(doc_id % 7 AS VARCHAR)
                       || '.com or u' || CAST(doc_id % 50 AS VARCHAR)
                       || '@ex' || CAST(doc_id % 7 AS VARCHAR)
                       || '.com from 10.0.'
                       || CAST(doc_id % 200 AS VARCHAR)
                       || '.' || CAST(doc_id % 250 AS VARCHAR) AS text
                FROM documents),
            em AS (
                SELECT doc_id, text,
                       list_transform(
                           list_sort(list_transform(
                               list_distinct(regexp_extract_all(text,
                                   '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')),
                               m -> {'l': -length(m), 'v': m})),
                           st -> st.v) AS ms
                FROM inj),
            em2 AS (
                SELECT doc_id, len(ms)::BIGINT AS n_email_ids,
                       list_reduce(
                           list_prepend(text, ms),
                           (acc, m) -> replace(acc, m,
                               '<EMAIL:' || substr(md5('pii:' || m), 1, 12)
                               || '>')) AS text
                FROM em),
            ip AS (
                SELECT doc_id, n_email_ids, text,
                       list_transform(
                           list_sort(list_transform(
                               list_distinct(regexp_extract_all(text,
                                   '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')),
                               m -> {'l': -length(m), 'v': m})),
                           st -> st.v) AS ms
                FROM em2),
            ip2 AS (
                SELECT doc_id, n_email_ids, len(ms)::BIGINT AS n_ip_ids,
                       list_reduce(
                           list_prepend(text, ms),
                           (acc, m) -> replace(acc, m,
                               '<IP:' || substr(md5('pii:' || m), 1, 12)
                               || '>')) AS text
                FROM ip)
            SELECT doc_id, n_email_ids, n_ip_ids, text AS pseudo_text
            FROM ip2
        """,
        # Gopher §A1.1 rules recomputed relationally; ratios rounded to 4
        # in both engines, keep computed on the unrounded doubles.
        "gopher_quality": _GOPHER_ORACLE,
        # webgraph PageRank: static pure-Python replay (edge set is a pure
        # function of doc_id residues, identical at both test scales)
        "domain_pagerank": _domain_pagerank_oracle(),
        "domain_communities": _domain_communities_oracle(),
        # grams rebuilt per n on each side, SEMI JOIN membership;
        # short docs contribute nothing (len guard mirrors the gate)
        "ngram_coverage": r"""
            WITH 
            tr1 AS (
                SELECT DISTINCT unnest(list_transform(
                    generate_series(1, len(toks) - 1 + 1),
                    i -> array_to_string(list_slice(toks, i, i + 1 - 1), ' ')))
                    AS g
                FROM (SELECT regexp_split_to_array(trim(lower(text)), '\s+')
                          AS toks
                      FROM documents WHERE doc_id % 3 <> 1)
                WHERE len(toks) >= 1
            ),
            te1 AS (
                SELECT DISTINCT unnest(list_transform(
                    generate_series(1, len(toks) - 1 + 1),
                    i -> array_to_string(list_slice(toks, i, i + 1 - 1), ' ')))
                    AS g
                FROM (SELECT regexp_split_to_array(trim(lower(text)), '\s+')
                          AS toks
                      FROM documents WHERE doc_id % 3 = 1)
                WHERE len(toks) >= 1
            ),
            tr2 AS (
                SELECT DISTINCT unnest(list_transform(
                    generate_series(1, len(toks) - 2 + 1),
                    i -> array_to_string(list_slice(toks, i, i + 2 - 1), ' ')))
                    AS g
                FROM (SELECT regexp_split_to_array(trim(lower(text)), '\s+')
                          AS toks
                      FROM documents WHERE doc_id % 3 <> 1)
                WHERE len(toks) >= 2
            ),
            te2 AS (
                SELECT DISTINCT unnest(list_transform(
                    generate_series(1, len(toks) - 2 + 1),
                    i -> array_to_string(list_slice(toks, i, i + 2 - 1), ' ')))
                    AS g
                FROM (SELECT regexp_split_to_array(trim(lower(text)), '\s+')
                          AS toks
                      FROM documents WHERE doc_id % 3 = 1)
                WHERE len(toks) >= 2
            ),
            tr3 AS (
                SELECT DISTINCT unnest(list_transform(
                    generate_series(1, len(toks) - 3 + 1),
                    i -> array_to_string(list_slice(toks, i, i + 3 - 1), ' ')))
                    AS g
                FROM (SELECT regexp_split_to_array(trim(lower(text)), '\s+')
                          AS toks
                      FROM documents WHERE doc_id % 3 <> 1)
                WHERE len(toks) >= 3
            ),
            te3 AS (
                SELECT DISTINCT unnest(list_transform(
                    generate_series(1, len(toks) - 3 + 1),
                    i -> array_to_string(list_slice(toks, i, i + 3 - 1), ' ')))
                    AS g
                FROM (SELECT regexp_split_to_array(trim(lower(text)), '\s+')
                          AS toks
                      FROM documents WHERE doc_id % 3 = 1)
                WHERE len(toks) >= 3
            )

            SELECT 1 AS n,
                   (SELECT count(*) FROM te1)::BIGINT AS test_ngrams,
                   (SELECT count(*) FROM te1 SEMI JOIN tr1 USING (g))::BIGINT
                       AS covered,
                   round((SELECT count(*) FROM te1 SEMI JOIN tr1 USING (g))
                         / greatest((SELECT count(*) FROM te1), 1)::DOUBLE,
                         6) AS coverage
            UNION ALL
            SELECT 2 AS n,
                   (SELECT count(*) FROM te2)::BIGINT AS test_ngrams,
                   (SELECT count(*) FROM te2 SEMI JOIN tr2 USING (g))::BIGINT
                       AS covered,
                   round((SELECT count(*) FROM te2 SEMI JOIN tr2 USING (g))
                         / greatest((SELECT count(*) FROM te2), 1)::DOUBLE,
                         6) AS coverage
            UNION ALL
            SELECT 3 AS n,
                   (SELECT count(*) FROM te3)::BIGINT AS test_ngrams,
                   (SELECT count(*) FROM te3 SEMI JOIN tr3 USING (g))::BIGINT
                       AS covered,
                   round((SELECT count(*) FROM te3 SEMI JOIN tr3 USING (g))
                         / greatest((SELECT count(*) FROM te3), 1)::DOUBLE,
                         6) AS coverage
        """,
        # span replay core + cross-bench merge + correlated-lambda token
        # rewrite; untouched docs hash their ORIGINAL text
        "mask_contaminated": _CONTAM_SPANS_SQL_CORE + """,
            sp AS (
                -- DISTINCT + (s, e) window order: duplicate spans from
                -- two benches tie on s, and untied window passes may
                -- order them differently (flag/grp disagree, merge
                -- splits nondeterministically — observed)
                SELECT DISTINCT doc_id, s, e FROM (
                    SELECT doc_id, min(pos) AS s, max(e) AS e
                    FROM g2 GROUP BY doc_id, bench_id, grp)
            ),
            m0 AS (
                SELECT *, max(e) OVER (
                    PARTITION BY doc_id ORDER BY s, e
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                    AS pmax
                FROM sp
            ),
            m1 AS (
                SELECT *, CASE WHEN pmax IS NULL OR s > pmax + 1
                               THEN 1 ELSE 0 END AS flag
                FROM m0
            ),
            m2 AS (
                SELECT *, sum(flag) OVER (
                    PARTITION BY doc_id ORDER BY s, e
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS grp2
                FROM m1
            ),
            ms AS (
                SELECT doc_id, min(s) AS s, max(e) AS e
                FROM m2 GROUP BY doc_id, grp2
            ),
            arr AS (
                SELECT doc_id, list({'s': s, 'e': e} ORDER BY s) AS spans,
                       sum(e - s + 1)::INTEGER AS n_masked
                FROM ms GROUP BY doc_id
            ),
            rt AS (
                -- CASE-PRESERVING rebuild tokens (span indexes come from
                -- the lowered split; \\s+ indices are case-independent)
                SELECT doc_id,
                       regexp_split_to_array(trim(text), '\\s+') AS rtoks
                FROM documents
            ),
            outp AS (
                SELECT t.doc_id,
                       CASE WHEN a.spans IS NULL THEN d.text
                            ELSE array_to_string(list_transform(
                                generate_series(1, len(rt.rtoks)),
                                i -> CASE WHEN len(list_filter(a.spans,
                                         sp -> i - 1 >= sp.s
                                               AND i - 1 <= sp.e)) > 0
                                     THEN '<REDACTED>'
                                     ELSE rt.rtoks[i] END), ' ')
                       END AS text,
                       CASE WHEN d.text IS NULL THEN NULL
                            ELSE len(t.toks) END AS n_tokens,
                       coalesce(a.n_masked, 0) AS n_masked
                FROM t
                JOIN documents d USING (doc_id)
                JOIN rt USING (doc_id)
                LEFT JOIN arr a USING (doc_id)
            )
            SELECT doc_id, md5(text) AS masked_md5,
                   n_tokens::INTEGER AS n_tokens,
                   n_masked::INTEGER AS n_masked
            FROM outp
        """,
        "trust_rank": _trust_rank_oracle(),
        # head-metadata replayed arithmetically from the same doc_id rules
        # sitemap locs replayed arithmetically (even docs: two urlset
        # locs incl. the CDATA one; odd docs: one flagged index loc)
        "sitemap_urls": """
            WITH s AS (
                SELECT doc_id AS i,
                       'https://s' || (doc_id % 3) || '.example/sm'
                       || doc_id || '.xml' AS url
                FROM documents)
            SELECT url, loc, is_index FROM (
                SELECT url,
                       'https://s' || (i % 3) || '.example/u' || i AS loc,
                       FALSE AS is_index
                FROM s WHERE i % 2 = 0
                UNION ALL
                SELECT url, 'https://s' || (i % 3) || '.example/c' || i,
                       FALSE
                FROM s WHERE i % 2 = 0
                UNION ALL
                SELECT url,
                       'https://s' || (i % 3) || '.example/child' || i
                       || '.xml',
                       TRUE
                FROM s WHERE i % 2 = 1)
        """,
        # frontier replay: same target construction as page_outlinks
        # (targets are already canonical by construction), minus the
        # even-doc ext crawl set, per-domain row_number cap of 5
        "crawl_frontier": """
            WITH src AS (
                SELECT doc_id AS i,
                       'https://sub' || (doc_id % 7) || '.site'
                       || (doc_id % 13) || '.example' AS origin,
                       '/dir' || (doc_id % 3) AS dir
                FROM documents),
            tgt AS (
                SELECT DISTINCT target FROM (
                    SELECT 'https://ext' || (i % 5) || '.example.org/x'
                           || i AS target FROM src
                    UNION ALL
                    SELECT 'https://cdn' || (i % 2) || '.example.net/y'
                    FROM src
                    UNION ALL
                    SELECT origin || '/root' || (i % 4) || '.html' FROM src
                    UNION ALL
                    SELECT origin || dir || '/rel' || (i % 6) || '.html'
                    FROM src
                    UNION ALL
                    SELECT origin || dir || '/uq' || (i % 6) || '.html'
                    FROM src)),
            fresh AS (
                SELECT target FROM tgt
                WHERE target NOT IN (
                    SELECT 'https://ext' || (doc_id % 5)
                           || '.example.org/x' || doc_id
                    FROM documents WHERE doc_id % 2 = 0)),
            ranked AS (
                SELECT CASE
                           WHEN target LIKE '%.example.org/%'
                               THEN 'example.org'
                           WHEN target LIKE '%.example.net/%'
                               THEN 'example.net'
                           ELSE regexp_extract(target,
                               'https://[^./]*\\.(site[0-9]+\\.example)/', 1)
                       END AS domain,
                       target,
                       ROW_NUMBER() OVER (PARTITION BY CASE
                           WHEN target LIKE '%.example.org/%'
                               THEN 'example.org'
                           WHEN target LIKE '%.example.net/%'
                               THEN 'example.net'
                           ELSE regexp_extract(target,
                               'https://[^./]*\\.(site[0-9]+\\.example)/', 1)
                       END ORDER BY target) AS rank
                FROM fresh)
            SELECT domain, target, rank FROM ranked WHERE rank <= 5
        """,
        # snapshot-diff statuses replayed from the residue rules (11th
        # removed, 5th changed, 13th gains a sibling; removed wins over
        # changed because the page is absent from the new crawl)
        "recrawl_diff": """
            SELECT 'https://d.example/p' || doc_id AS url,
                   CASE WHEN doc_id % 11 = 0 THEN 'removed'
                        WHEN doc_id % 5 = 0 THEN 'changed'
                        ELSE 'unchanged' END AS status
            FROM documents
            UNION ALL
            SELECT 'https://d.example/new' || doc_id, 'added'
            FROM documents WHERE doc_id % 13 = 0
        """,
        # the frontier replay again, joined with the fixture's arithmetic
        # Crawl-delay (2 s on r%3==1 site domains, 1 s default elsewhere)
        "crawl_schedule": """
            WITH src AS (
                SELECT doc_id AS i,
                       'https://sub' || (doc_id % 7) || '.site'
                       || (doc_id % 13) || '.example' AS origin,
                       '/dir' || (doc_id % 3) AS dir
                FROM documents),
            tgt AS (
                SELECT DISTINCT target FROM (
                    SELECT 'https://ext' || (i % 5) || '.example.org/x'
                           || i AS target FROM src
                    UNION ALL
                    SELECT 'https://cdn' || (i % 2) || '.example.net/y'
                    FROM src
                    UNION ALL
                    SELECT origin || '/root' || (i % 4) || '.html' FROM src
                    UNION ALL
                    SELECT origin || dir || '/rel' || (i % 6) || '.html'
                    FROM src
                    UNION ALL
                    SELECT origin || dir || '/uq' || (i % 6) || '.html'
                    FROM src)),
            fresh AS (
                SELECT target FROM tgt
                WHERE target NOT IN (
                    SELECT 'https://ext' || (doc_id % 5)
                           || '.example.org/x' || doc_id
                    FROM documents WHERE doc_id % 2 = 0)),
            ranked AS (
                SELECT CASE
                           WHEN target LIKE '%.example.org/%'
                               THEN 'example.org'
                           WHEN target LIKE '%.example.net/%'
                               THEN 'example.net'
                           ELSE regexp_extract(target,
                               'https://[^./]*\\.(site[0-9]+\\.example)/', 1)
                       END AS domain,
                       target,
                       ROW_NUMBER() OVER (PARTITION BY CASE
                           WHEN target LIKE '%.example.org/%'
                               THEN 'example.org'
                           WHEN target LIKE '%.example.net/%'
                               THEN 'example.net'
                           ELSE regexp_extract(target,
                               'https://[^./]*\\.(site[0-9]+\\.example)/', 1)
                       END ORDER BY target) AS rank
                FROM fresh)
            SELECT domain, target, rank,
                   ROUND((rank - 1) * CASE
                       WHEN domain LIKE 'site%.example'
                            AND CAST(regexp_extract(domain,
                                'site([0-9]+)', 1) AS INT) % 3 = 1
                           THEN 2.0 ELSE 1.0 END, 6)::DOUBLE AS eta_s
            FROM ranked WHERE rank <= 5
        """,
        # URL features recomputed with DuckDB's OWN string functions over
        # the same constructed url — independent implementation
        "url_features": """
            WITH u AS (
                SELECT doc_id,
                       'https://'
                       || CASE WHEN doc_id % 3 = 0 THEN 'my-spam-'
                               ELSE 's' END
                       || 'site' || (doc_id % 13) || '.example'
                       || CASE WHEN doc_id % 4 = 0
                               THEN '/a/b' || doc_id ELSE '/p' END
                       || '/page' || doc_id || '.html'
                       || CASE WHEN doc_id % 5 = 0
                               THEN '?x=1&utm_source=9&y=22' ELSE '' END
                           AS url
                FROM documents),
            parts AS (
                SELECT doc_id, url,
                       regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1) AS host,
                       regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1) AS path,
                       regexp_extract(url, '\\?([^#]*)', 1) AS query
                FROM u)
            SELECT doc_id,
                   length(url)::INT AS url_len,
                   length(host)::INT AS host_len,
                   (length(host) - length(replace(host, '-', '')))::INT
                       AS host_hyphens,
                   (length(path) - length(replace(path, '/', '')))::INT
                       AS path_depth,
                   (length(url) - length(regexp_replace(url, '[0-9]', '', 'g')))::INT
                       AS n_digits,
                   ROUND((length(url) - length(regexp_replace(url, '[0-9]', '', 'g')))
                         / length(url)::DOUBLE, 6)::DOUBLE AS digit_ratio,
                   CASE WHEN query = '' THEN 0
                        ELSE length(query) - length(replace(query, '&', '')) + 1
                        END::INT AS n_params
            FROM parts
        """,
        "term_postings": """
            SELECT term, doc_id, count(*)::INT AS tf
            FROM (SELECT doc_id,
                         unnest(regexp_extract_all(lower(text),
                                                   '[a-zà-öø-ÿ]+')) AS term
                  FROM documents)
            GROUP BY term, doc_id
        """,
        "bm25_topk": """
            WITH base AS (
                SELECT doc_id,
                       regexp_extract_all(lower(text), '[a-zà-öø-ÿ]+') AS toks
                FROM documents),
            consts AS (
                SELECT count(*) AS n_docs, avg(len(toks)) AS avgdl FROM base),
            toks AS (
                SELECT doc_id, len(toks) AS dl, unnest(toks) AS term
                FROM base),
            hits AS (
                SELECT doc_id, dl, term, count(*) AS tf
                FROM toks
                WHERE term IN ('merge', 'spark', 'window')
                GROUP BY doc_id, dl, term),
            dfreq AS (SELECT term, count(*) AS df FROM hits GROUP BY term),
            scored AS (
                SELECT h.doc_id,
                       ROUND(SUM(
                           ln((c.n_docs - d.df + 0.5) / (d.df + 0.5) + 1.0)
                           * (h.tf * (1.2 + 1.0))
                           / (h.tf + 1.2 * (1.0 - 0.75
                                            + 0.75 * h.dl / c.avgdl))
                       ), 6)::DOUBLE AS score
                FROM hits h
                JOIN dfreq d USING (term)
                CROSS JOIN consts c
                GROUP BY h.doc_id)
            SELECT doc_id, score FROM scored
            ORDER BY score DESC, doc_id
            LIMIT 25
        """,
        "tfidf_weights": """
            WITH postings AS (
                SELECT term, doc_id, count(*)::INT AS tf
                FROM (SELECT doc_id,
                             unnest(regexp_extract_all(lower(text),
                                                       '[a-zà-öø-ÿ]+')) AS term
                      FROM documents)
                GROUP BY term, doc_id),
            dfreq AS (
                SELECT term, count(*)::INT AS df FROM postings GROUP BY term),
            n AS (SELECT count(*) AS n_docs FROM documents)
            SELECT p.term, p.doc_id, p.tf, d.df,
                   ROUND((1.0 + ln(p.tf::DOUBLE))
                         * ln((1.0 + n.n_docs) / (1.0 + d.df)),
                         6)::DOUBLE AS tfidf
            FROM postings p JOIN dfreq d USING (term) CROSS JOIN n
        """,
        "phrase_search": """
            WITH s AS (
                SELECT doc_id,
                       substr(text, 1, 120)
                       || CASE WHEN doc_id % 5 = 0
                               THEN ' spark window merge end'
                               WHEN doc_id % 5 = 1 THEN ' spark window only'
                               ELSE ' filler' END AS text
                FROM documents)
            SELECT doc_id FROM s
            WHERE regexp_matches(lower(text),
                '(^|[^a-zà-öø-ÿ])spark[^a-zà-öø-ÿ]+window[^a-zà-öø-ÿ]+merge([^a-zà-öø-ÿ]|$)')
        """,
        "keyword_snippets": """
            SELECT doc_id,
                   NULLIF(regexp_extract(lower(text),
                       '(?s).{0,25}(?:^|[^a-zà-öø-ÿ])merge(?:[^a-zà-öø-ÿ]|$).{0,25}',
                       0), '') AS snippet
            FROM documents
        """,
        "dedup_cluster_sizes": _shingle_jaccard_oracle(
            k=3, threshold=0.7,
            final="""
                SELECT size, count(*)::BIGINT AS n_clusters FROM (
                    SELECT component, count(*)::BIGINT AS size FROM (
                        WITH RECURSIVE und AS (
                            SELECT id_a AS a, id_b AS b FROM truepairs
                            UNION
                            SELECT id_b AS a, id_a AS b FROM truepairs),
                        reach(a, b) AS (
                            SELECT a, b FROM und
                            UNION
                            SELECT r.a, u.b FROM reach r
                            JOIN und u ON r.b = u.a),
                        comp AS (
                            SELECT a AS doc_id, least(a, min(b)) AS component
                            FROM reach GROUP BY a)
                        SELECT c.doc_id,
                               coalesce(comp.component, c.doc_id) AS component
                        FROM corpus c LEFT JOIN comp ON comp.doc_id = c.doc_id)
                    GROUP BY component)
                GROUP BY size
            """,
        ),
        "boolean_search": """
            WITH t AS (
                SELECT doc_id,
                       regexp_extract_all(lower(text), '[a-zà-öø-ÿ]+') AS ws
                FROM documents)
            SELECT doc_id FROM t
            WHERE list_contains(ws, 'spark')
              AND list_contains(ws, 'window')
              AND NOT list_contains(ws, 'slow')
        """,
        "update_postings": """
            WITH src AS (
                SELECT doc_id, text FROM documents
                WHERE doc_id % 2 = 0 AND doc_id % 4 != 0
                UNION ALL
                SELECT doc_id, text FROM documents WHERE doc_id % 2 = 1
                UNION ALL
                SELECT doc_id, substr(text, 1, 100) FROM documents
                WHERE doc_id % 4 = 0)
            SELECT term, doc_id, count(*)::INT AS tf
            FROM (SELECT doc_id,
                         unnest(regexp_extract_all(lower(text),
                                                   '[a-zà-öø-ÿ]+')) AS term
                  FROM src)
            GROUP BY term, doc_id
        """,
        "script_ratios": """
            WITH s AS (
                SELECT doc_id,
                       substr(text, 1, 30)
                       || CASE WHEN doc_id % 4 = 0
                               THEN ' привет мир здравствуй'
                               WHEN doc_id % 4 = 1 THEN ' γειά σου κόσμε'
                               WHEN doc_id % 4 = 2 THEN ' 你好世界再见'
                               ELSE ' plain' END
                       || CASE WHEN doc_id % 8 = 2
                               THEN ' 漢字漢字漢字漢字漢字漢字漢字漢字漢字漢字漢字漢字漢字漢字'
                               ELSE '' END AS text
                FROM documents),
            c AS (
                SELECT doc_id,
                       len(regexp_extract_all(text, '[A-Za-zÀ-ÖØ-öø-ÿĀ-ɏ]'))::INT AS n_latin,
                       len(regexp_extract_all(text, '[Ѐ-ӿ]'))::INT AS n_cyrillic,
                       len(regexp_extract_all(text, '[Ͱ-Ͽ]'))::INT AS n_greek,
                       len(regexp_extract_all(text, '[一-鿿]'))::INT AS n_cjk
                FROM s)
            SELECT doc_id, n_latin, n_cyrillic, n_greek, n_cjk,
                   CASE WHEN n_latin + n_cyrillic + n_greek + n_cjk > 0
                        THEN ROUND(n_latin
                             / (n_latin + n_cyrillic + n_greek + n_cjk)::DOUBLE,
                             6)
                        END::DOUBLE AS latin_ratio,
                   CASE WHEN n_latin + n_cyrillic + n_greek + n_cjk = 0
                        THEN NULL
                        WHEN n_latin >= greatest(n_cyrillic, n_greek, n_cjk)
                        THEN 'latin'
                        WHEN n_cyrillic >= greatest(n_greek, n_cjk)
                        THEN 'cyrillic'
                        WHEN n_greek >= n_cjk THEN 'greek'
                        ELSE 'cjk' END AS dominant_script
            FROM c
        """,
        "event_hourly": """
            SELECT (CAST(floor(epoch(ts)) AS BIGINT) // 3600) * 3600
                       AS bucket_epoch,
                   event_type,
                   count(*)::BIGINT AS n_events,
                   ROUND(sum(value), 4)::DOUBLE AS sum_value,
                   ROUND(avg(value), 4)::DOUBLE AS avg_value
            FROM events
            GROUP BY 1, 2
        """,
        "bigram_pmi": """
            WITH toks AS (
                SELECT doc_id,
                       regexp_extract_all(lower(text), '[a-zà-öø-ÿ]+') AS ws
                FROM documents),
            uni AS (
                SELECT w, count(*) AS c
                FROM (SELECT unnest(ws) AS w FROM toks)
                GROUP BY w),
            tt AS (SELECT sum(c) AS t_total FROM uni),
            bg AS (
                SELECT u.w1, u.w2 FROM (SELECT ws FROM toks),
                UNNEST(list_transform(generate_series(1, len(ws) - 1),
                                      j -> {'w1': ws[j], 'w2': ws[j + 1]}))
                    AS t(u)),
            big AS (
                SELECT w1, w2, count(*) AS c_ab
                FROM bg GROUP BY w1, w2
                HAVING count(*) >= 5),
            bt AS (
                SELECT sum(greatest(len(ws) - 1, 0)) AS b_total FROM toks)
            SELECT b.w1, b.w2, b.c_ab::BIGINT AS c_ab,
                   ROUND(ln(((b.c_ab / bt.b_total)
                             * (tt.t_total / ua.c))
                            * (tt.t_total / ub.c)), 6)::DOUBLE AS pmi
            FROM big b
            JOIN uni ua ON ua.w = b.w1
            JOIN uni ub ON ub.w = b.w2, tt, bt
        """,
        "top_terms": """
            WITH counts AS (
                SELECT lang, w AS term, count(*)::BIGINT AS n
                FROM (SELECT lang,
                             unnest(regexp_extract_all(lower(text),
                                                       '[a-zà-öø-ÿ]+')) AS w
                      FROM documents)
                GROUP BY lang, w)
            SELECT lang, term, n, rank::INT AS rank FROM (
                SELECT lang, term, n,
                       row_number() OVER (PARTITION BY lang
                                          ORDER BY n DESC, term) AS rank
                FROM counts)
            WHERE rank <= 5
        """,
        "compression_ratio": _compression_oracle(),
        "cdc_chunks": _cdc_oracle(),
        "snapshot_delta": _snapshot_delta_oracle(),
        "cdc_incremental": _cdc_incremental_oracle(),
        "delta_chain": _delta_chain_oracle(),
        "recrawl_drift": _recrawl_drift_oracle(),
        # same quantized OLS: nano logs as HUGEINT, mirrored formula order
        "crawl_cadence": """
            WITH pages AS (
                SELECT 'https://sub' || (doc_id % 3) || '.site'
                       || (doc_id % 7) || '.example/p' || doc_id AS url,
                       'site' || (doc_id % 7) || '.example' AS domain,
                       1735689600 + (doc_id * 997) % 86400 AS epoch
                FROM documents),
            g AS (
                SELECT domain,
                       epoch - lag(epoch) OVER (
                           PARTITION BY domain ORDER BY epoch, url) AS gap
                FROM pages),
            a AS (
                SELECT domain, count(*) AS n_fetches, count(gap) AS n_gaps,
                       sum(gap) AS sum_gap, sum(gap * gap) AS sum_gap2,
                       quantile_cont(gap, 0.5) AS med
                FROM g GROUP BY domain)
            SELECT domain, n_fetches,
                   round(sum_gap::DOUBLE / n_gaps::DOUBLE, 6) AS mean_gap_s,
                   round(med::DOUBLE, 6) AS median_gap_s,
                   CASE WHEN n_gaps > 1 THEN
                       round((n_gaps::DOUBLE * sum_gap2::DOUBLE
                              - sum_gap::DOUBLE * sum_gap::DOUBLE)
                             / (n_gaps::DOUBLE * (n_gaps::DOUBLE - 1.0)), 6)
                   END::DOUBLE AS var_gap_s
            FROM a WHERE n_fetches >= 2
        """,
        "cocitation_pairs": """
            WITH ol AS (
                SELECT DISTINCT url, dom FROM (
                    SELECT 'https://p' || doc_id || '.example/x' AS url,
                           'a' || (doc_id % 5) || '.example' AS dom
                    FROM documents
                    UNION ALL
                    SELECT 'https://p' || doc_id || '.example/x',
                           'b' || (doc_id % 3) || '.example'
                    FROM documents
                    UNION ALL
                    SELECT 'https://p' || doc_id || '.example/x',
                           'c' || (doc_id % 4) || '.example'
                    FROM documents
                    UNION ALL
                    SELECT 'https://p' || doc_id || '.example/x',
                           CASE WHEN doc_id % 2 = 0 THEN 'hub.example'
                            ELSE 'c' || (doc_id % 4) || '.example' END
                    FROM documents))
            SELECT x.dom AS domain_a, y.dom AS domain_b,
                   count(*) AS n_pages
            FROM ol x JOIN ol y ON x.url = y.url AND x.dom < y.dom
            GROUP BY 1, 2 HAVING count(*) >= 2
        """,
        "sentence_chunks": """
            WITH src AS (
                SELECT doc_id,
                       substr(text, 1, 40) || '. '
                       || substr(text, 41, 60) || '! '
                       || substr(text, 101, 50)
                       || CASE WHEN doc_id % 3 = 0 THEN '? Short tail.'
                               ELSE '...' END AS text
                FROM documents),
            s AS (
                SELECT doc_id,
                       list_filter(
                           list_transform(
                               regexp_extract_all(text, '[^.!?]+[.!?]*'),
                               x -> trim(x)),
                           x -> x != '') AS sents
                FROM src),
            c AS (
                SELECT doc_id, sents,
                       unnest(generate_series(
                           0, ((len(sents) - 1) // 2)::BIGINT)) AS chunk_id
                FROM s WHERE len(sents) > 0)
            SELECT doc_id, chunk_id::INT AS chunk_id,
                   len(sents[chunk_id * 2 + 1 : chunk_id * 2 + 3])::INT
                       AS n_sents,
                   array_to_string(
                       sents[chunk_id * 2 + 1 : chunk_id * 2 + 3], ' ')
                       AS chunk_text
            FROM c
        """,
        "quality_percentiles": """
            SELECT doc_id, lang, n_chars AS score,
                   round(percent_rank() OVER (
                       PARTITION BY lang ORDER BY n_chars, doc_id), 6)
                       + 0 AS pct,
                   ntile(4) OVER (
                       PARTITION BY lang ORDER BY n_chars, doc_id)::INT
                       AS bucket
            FROM documents
        """,
        "event_anomalies": """
            WITH h AS (
                SELECT event_type,
                       (CAST(floor(epoch(ts)) AS BIGINT) // 3600) * 3600
                           AS bucket_epoch,
                       count(*) AS n_events
                FROM events GROUP BY 1, 2),
            m AS (
                SELECT event_type, count(*) AS k, sum(n_events) AS s1,
                       sum(n_events * n_events) AS s2
                FROM h GROUP BY 1),
            s AS (
                SELECT event_type,
                       s1::DOUBLE / k::DOUBLE AS mean,
                       sqrt((k::DOUBLE * s2::DOUBLE
                             - s1::DOUBLE * s1::DOUBLE)
                            / (k::DOUBLE * (k::DOUBLE - 1.0))) AS sd
                FROM m WHERE k > 1),
            z AS (
                SELECT h.event_type, h.bucket_epoch, h.n_events,
                       CASE WHEN s.sd > 0 THEN
                           round((h.n_events::DOUBLE - s.mean) / s.sd, 6)
                           + 0
                       ELSE 0.0 END AS z
                FROM h JOIN s USING (event_type))
            SELECT event_type, bucket_epoch, n_events, z,
                   (abs(z) > 2.0) AS is_burst
            FROM z
        """,
        "title_body_overlap": """
            WITH src AS (
                SELECT doc_id,
                       CASE WHEN doc_id % 17 = 0 THEN ''
                            ELSE substr(text, 1, 25)
                                 || CASE WHEN doc_id % 4 = 0
                                         THEN ' zzqx' ELSE '' END
                                 || CASE WHEN doc_id % 4 = 1
                                         THEN ' vvwy qqkj' ELSE '' END
                       END AS title,
                       text
                FROM documents),
            tok AS (
                SELECT doc_id,
                       list_distinct(list_filter(regexp_extract_all(
                           lower(title), '[a-zà-öø-ÿ]+'),
                           x -> x != '')) AS t,
                       list_distinct(list_filter(regexp_extract_all(
                           lower(text), '[a-zà-öø-ÿ]+'),
                           x -> x != '')) AS b
                FROM src)
            SELECT doc_id,
                   len(t)::INT AS n_title_tokens,
                   len(list_filter(t, x -> list_contains(b, x)))::INT
                       AS n_overlap,
                   CASE WHEN len(t) > 0 THEN
                       round(len(list_filter(t, x -> list_contains(b, x)))
                             / len(t)::DOUBLE, 6)
                   END::DOUBLE AS overlap_ratio
            FROM tok
        """,
        "quote_density": """
            WITH src AS (
                SELECT doc_id,
                       substr(text, 1, 60) || ' "'
                       || substr(text, 61, 20) || '" said.'
                       || CASE WHEN doc_id % 5 = 0
                               THEN ' "Another quote."' ELSE '' END
                       || CASE WHEN doc_id % 7 = 0
                               THEN ' "unclosed' ELSE '' END AS text
                FROM documents),
            q AS (
                SELECT doc_id, length(text) AS n_len,
                       regexp_extract_all(text, '"[^"]*"') AS segs
                FROM src)
            SELECT doc_id,
                   len(segs)::INT AS n_quotes,
                   coalesce(list_sum(list_transform(
                       segs, x -> length(x) - 2)), 0)::BIGINT
                       AS quoted_chars,
                   CASE WHEN n_len > 0 THEN
                       round(coalesce(list_sum(list_transform(
                                 segs, x -> length(x) - 2)), 0)
                             / n_len::DOUBLE, 6)
                   END::DOUBLE AS quote_char_ratio
            FROM q
        """,
        "outlink_quality": """
            WITH ol AS (
                SELECT DISTINCT url, dom FROM (
                    SELECT 'https://p' || doc_id || '.example/x' AS url,
                           'a' || (doc_id % 5) || '.example' AS dom
                    FROM documents
                    UNION ALL
                    SELECT 'https://p' || doc_id || '.example/x',
                           'b' || (doc_id % 3) || '.example'
                    FROM documents
                    UNION ALL
                    SELECT 'https://p' || doc_id || '.example/x',
                           'c' || (doc_id % 4) || '.example'
                    FROM documents)),
            sc AS (
                SELECT DISTINCT * FROM (
                    SELECT 'a' || (doc_id % 5) || '.example' AS domain,
                           (doc_id % 5)::DOUBLE / 10.0 AS score
                    FROM documents
                    UNION ALL
                    SELECT 'b' || (doc_id % 3) || '.example',
                           (doc_id % 3)::DOUBLE * 0.2 + 0.05
                    FROM documents))
            SELECT ol.url,
                   count(*)::BIGINT AS n_outlinks,
                   count(sc.score)::BIGINT AS n_scored,
                   CASE WHEN count(sc.score) > 0 THEN
                       round(sum(sc.score)::DOUBLE
                             / count(sc.score)::DOUBLE, 6)
                   END::DOUBLE AS mean_score,
                   min(sc.score)::DOUBLE AS min_score
            FROM ol LEFT JOIN sc ON ol.dom = sc.domain
            GROUP BY ol.url
        """,
        "redirect_chains": """
            WITH RECURSIVE raw AS (
                SELECT 'u' || doc_id AS src,
                       'u' || (CASE WHEN doc_id % 10 <> 9 THEN doc_id + 1
                                    ELSE doc_id - 9 END) AS dst
                FROM documents
                WHERE doc_id % 10 <> 9
                   OR (doc_id % 10 = 9 AND (doc_id // 10) % 5 = 0)),
            e AS (SELECT src, min(dst) AS dst FROM raw GROUP BY src),
            r AS (
                SELECT src AS start, dst AS cur, 1 AS hops FROM e
                UNION ALL
                SELECT r.start, e.dst, r.hops + 1
                FROM r JOIN e ON r.cur = e.src
                WHERE r.hops < 16),
            last AS (
                SELECT start, cur, hops,
                       row_number() OVER (
                           PARTITION BY start ORDER BY hops DESC) AS rn
                FROM r)
            SELECT l.start AS src, l.cur AS final, l.hops::INT AS hops,
                   (e2.src IS NULL) AS resolved
            FROM last l LEFT JOIN e e2 ON l.cur = e2.src
            WHERE l.rn = 1
        """,
        "weighted_sample": """
            WITH cand AS (
                SELECT doc_id,
                       ((doc_id % 7) + 1)::DOUBLE AS weight,
                       round(ln((('0x' || substr(md5(doc_id::VARCHAR), 1, 15))
                                     ::BIGINT + 1)::DOUBLE
                                / (1152921504606846976::DOUBLE + 1.0))
                             / ((doc_id % 7) + 1)::DOUBLE, 6) + 0
                           AS priority
                FROM documents),
            ranked AS (
                SELECT doc_id, weight, priority,
                       row_number() OVER (
                           ORDER BY priority DESC, doc_id ASC) AS rank
                FROM cand)
            SELECT doc_id, weight, priority, rank::INT AS rank
            FROM ranked WHERE rank <= 25
        """,
        "partition_skew": """
            WITH keyed AS (
                SELECT source || ':' ||
                       (CASE WHEN doc_id % 10 < 7 THEN 'hot'
                             ELSE (doc_id % 10)::VARCHAR END) AS skewkey
                FROM documents),
            per AS (
                SELECT ('0x' || substr(md5(skewkey), 1, 15))::BIGINT % 16
                           AS b,
                       count(*) AS n
                FROM keyed GROUP BY b),
            agg AS (
                SELECT count(*) AS k, sum(n) AS s1, sum(n * n) AS s2,
                       max(n) AS mx
                FROM per)
            SELECT 16 AS n_buckets,
                   s1::BIGINT AS n_rows,
                   (16 - k)::INT AS n_empty,
                   mx::BIGINT AS max_bucket_rows,
                   CASE WHEN s1 > 0 THEN
                       round(mx::DOUBLE / (s1::DOUBLE / 16.0), 6)
                   END::DOUBLE AS skew_ratio,
                   CASE WHEN s1 > 0 THEN
                       round(sqrt((16.0 * s2::DOUBLE - s1::DOUBLE * s1::DOUBLE)
                                  / (16.0 * 16.0))
                             / (s1::DOUBLE / 16.0), 6)
                   END::DOUBLE AS cv
            FROM agg
        """,
        "length_outliers": """
            WITH src AS (
                SELECT doc_id, lang,
                       (CASE WHEN doc_id % 97 = 0 THEN n_chars * 50
                             ELSE n_chars END)::DOUBLE AS v
                FROM documents),
            med AS (
                SELECT lang, quantile_cont(v, 0.5) AS m
                FROM src GROUP BY lang),
            mad AS (
                SELECT src.lang,
                       round(quantile_cont(abs(v - m), 0.5), 6) AS d
                FROM src JOIN med ON src.lang = med.lang
                GROUP BY src.lang),
            z AS (
                SELECT doc_id, src.lang, v,
                       CASE WHEN d > 0
                            THEN round((v - m) / d, 6) + 0 END AS robust_z
                FROM src
                JOIN med ON src.lang = med.lang
                JOIN mad ON src.lang = mad.lang)
            SELECT doc_id, lang, v::BIGINT AS n_chars, robust_z,
                   coalesce(abs(robust_z) > 3.0, FALSE) AS is_outlier
            FROM z
        """,
        "domain_triangles": """
            WITH raw AS (
                SELECT 'd' || (doc_id % 12) AS x,
                       'd' || ((doc_id % 12 + 1 + doc_id % 4) % 12) AS y
                FROM documents),
            e AS (
                SELECT DISTINCT least(x, y) AS a, greatest(x, y) AS b
                FROM raw WHERE x <> y),
            deg AS (
                SELECT node, count(*) AS d FROM (
                    SELECT a AS node FROM e
                    UNION ALL SELECT b FROM e)
                GROUP BY node),
            tri AS (
                SELECT count(*) AS t
                FROM e e1
                JOIN e e2 ON e2.a = e1.b
                JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b),
            stats AS (
                SELECT count(*) AS nn, sum((d * (d - 1)) // 2) AS w
                FROM deg),
            ne AS (SELECT count(*) AS m FROM e)
            SELECT nn::BIGINT AS n_nodes, m::BIGINT AS n_edges,
                   w::BIGINT AS n_wedges, t::BIGINT AS n_triangles,
                   CASE WHEN w > 0 THEN
                       round(3.0 * t::DOUBLE / w::DOUBLE, 6)
                   END::DOUBLE AS global_clustering
            FROM stats, ne, tri
        """,
        "range_enrich": """
            WITH vals AS (
                SELECT doc_id AS id, (doc_id * 37) % 1000 AS v
                FROM documents),
            r AS (
                SELECT DISTINCT * FROM (
                    SELECT (doc_id % 10) * 100 AS lo,
                           (doc_id % 10) * 100 + 49 AS hi,
                           'r' || (doc_id % 10) AS label
                    FROM documents
                    UNION ALL
                    SELECT 25, 125, 'wide' FROM documents)),
            j AS (
                SELECT vals.id, vals.v, r.label, r.lo,
                       row_number() OVER (
                           PARTITION BY vals.id
                           ORDER BY r.lo ASC NULLS LAST,
                                    r.label ASC NULLS LAST) AS rn
                FROM vals LEFT JOIN r ON vals.v BETWEEN r.lo AND r.hi)
            SELECT id, v, label AS range_label FROM j WHERE rn = 1
        """,
        "signal_correlations": """
            WITH s AS (
                SELECT round(n_chars::DOUBLE * 1e6)::HUGEINT AS x,
                       round(len(regexp_extract_all(
                           lower(text), '[a-zà-öø-ÿ]+'))::DOUBLE
                             * 1e6)::HUGEINT AS y,
                       round(7::DOUBLE * 1e6)::HUGEINT AS z
                FROM documents),
            a AS (
                SELECT count(*) AS k,
                       sum(x) AS sx, sum(x * x) AS sxx,
                       sum(y) AS sy, sum(y * y) AS syy,
                       sum(z) AS sz, sum(z * z) AS szz,
                       sum(x * y) AS sxy, sum(x * z) AS sxz,
                       sum(y * z) AS syz
                FROM s)
            SELECT 'n_chars' AS signal_a, 'n_words' AS signal_b,
                   CASE WHEN (k::DOUBLE * sxx::DOUBLE
                              - sx::DOUBLE * sx::DOUBLE) > 0
                         AND (k::DOUBLE * syy::DOUBLE
                              - sy::DOUBLE * sy::DOUBLE) > 0 THEN
                       round((k::DOUBLE * sxy::DOUBLE
                              - sx::DOUBLE * sy::DOUBLE)
                             / (sqrt(k::DOUBLE * sxx::DOUBLE
                                     - sx::DOUBLE * sx::DOUBLE)
                                * sqrt(k::DOUBLE * syy::DOUBLE
                                       - sy::DOUBLE * sy::DOUBLE)), 6)
                       + 0
                   END::DOUBLE AS r
            FROM a
            UNION ALL
            SELECT 'n_chars', 'n_const',
                   CASE WHEN (k::DOUBLE * sxx::DOUBLE
                              - sx::DOUBLE * sx::DOUBLE) > 0
                         AND (k::DOUBLE * szz::DOUBLE
                              - sz::DOUBLE * sz::DOUBLE) > 0 THEN
                       round((k::DOUBLE * sxz::DOUBLE
                              - sx::DOUBLE * sz::DOUBLE)
                             / (sqrt(k::DOUBLE * sxx::DOUBLE
                                     - sx::DOUBLE * sx::DOUBLE)
                                * sqrt(k::DOUBLE * szz::DOUBLE
                                       - sz::DOUBLE * sz::DOUBLE)), 6)
                       + 0
                   END::DOUBLE
            FROM a
            UNION ALL
            SELECT 'n_words', 'n_const',
                   CASE WHEN (k::DOUBLE * syy::DOUBLE
                              - sy::DOUBLE * sy::DOUBLE) > 0
                         AND (k::DOUBLE * szz::DOUBLE
                              - sz::DOUBLE * sz::DOUBLE) > 0 THEN
                       round((k::DOUBLE * syz::DOUBLE
                              - sy::DOUBLE * sz::DOUBLE)
                             / (sqrt(k::DOUBLE * syy::DOUBLE
                                     - sy::DOUBLE * sy::DOUBLE)
                                * sqrt(k::DOUBLE * szz::DOUBLE
                                       - sz::DOUBLE * sz::DOUBLE)), 6)
                       + 0
                   END::DOUBLE
            FROM a
        """,
        # Spearman = the same exact-moment Pearson over DOUBLED
        # tie-averaged ranks (2*cnt_less + cnt_tied + 1, an exact
        # int64); ranks per signal from value-level counts + an
        # inclusive running sum, matching global_prefix_sums.
        "spearman_signals": """
            WITH s AS (
                SELECT round(n_chars::DOUBLE * 1e6)::HUGEINT AS x,
                       round(len(regexp_extract_all(
                           lower(text), '[a-zà-öø-ÿ]+'))::DOUBLE
                             * 1e6)::HUGEINT AS y,
                       round(7::DOUBLE * 1e6)::HUGEINT AS z
                FROM documents),
            vx AS (SELECT x AS val, count(*)::HUGEINT AS cnt
                   FROM s GROUP BY 1),
            rx AS (SELECT val,
                          2 * (sum(cnt) OVER (ORDER BY val
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND CURRENT ROW) - cnt) + cnt + 1 AS r2
                   FROM vx),
            vy AS (SELECT y AS val, count(*)::HUGEINT AS cnt
                   FROM s GROUP BY 1),
            ry AS (SELECT val,
                          2 * (sum(cnt) OVER (ORDER BY val
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND CURRENT ROW) - cnt) + cnt + 1 AS r2
                   FROM vy),
            vz AS (SELECT z AS val, count(*)::HUGEINT AS cnt
                   FROM s GROUP BY 1),
            rz AS (SELECT val,
                          2 * (sum(cnt) OVER (ORDER BY val
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND CURRENT ROW) - cnt) + cnt + 1 AS r2
                   FROM vz),
            rr AS (
                SELECT rx.r2 AS x, ry.r2 AS y, rz.r2 AS z
                FROM s
                JOIN rx ON s.x = rx.val
                JOIN ry ON s.y = ry.val
                JOIN rz ON s.z = rz.val),
            a AS (
                SELECT count(*) AS k,
                       sum(x) AS sx, sum(x * x) AS sxx,
                       sum(y) AS sy, sum(y * y) AS syy,
                       sum(z) AS sz, sum(z * z) AS szz,
                       sum(x * y) AS sxy, sum(x * z) AS sxz,
                       sum(y * z) AS syz
                FROM rr)
            SELECT 'n_chars' AS signal_a, 'n_words' AS signal_b,
                   CASE WHEN (k::DOUBLE * sxx::DOUBLE
                              - sx::DOUBLE * sx::DOUBLE) > 0
                         AND (k::DOUBLE * syy::DOUBLE
                              - sy::DOUBLE * sy::DOUBLE) > 0 THEN
                       round((k::DOUBLE * sxy::DOUBLE
                              - sx::DOUBLE * sy::DOUBLE)
                             / (sqrt(k::DOUBLE * sxx::DOUBLE
                                     - sx::DOUBLE * sx::DOUBLE)
                                * sqrt(k::DOUBLE * syy::DOUBLE
                                       - sy::DOUBLE * sy::DOUBLE)), 6)
                       + 0
                   END::DOUBLE AS r
            FROM a
            UNION ALL
            SELECT 'n_chars', 'n_const',
                   CASE WHEN (k::DOUBLE * sxx::DOUBLE
                              - sx::DOUBLE * sx::DOUBLE) > 0
                         AND (k::DOUBLE * szz::DOUBLE
                              - sz::DOUBLE * sz::DOUBLE) > 0 THEN
                       round((k::DOUBLE * sxz::DOUBLE
                              - sx::DOUBLE * sz::DOUBLE)
                             / (sqrt(k::DOUBLE * sxx::DOUBLE
                                     - sx::DOUBLE * sx::DOUBLE)
                                * sqrt(k::DOUBLE * szz::DOUBLE
                                       - sz::DOUBLE * sz::DOUBLE)), 6)
                       + 0
                   END::DOUBLE
            FROM a
            UNION ALL
            SELECT 'n_words', 'n_const',
                   CASE WHEN (k::DOUBLE * syy::DOUBLE
                              - sy::DOUBLE * sy::DOUBLE) > 0
                         AND (k::DOUBLE * szz::DOUBLE
                              - sz::DOUBLE * sz::DOUBLE) > 0 THEN
                       round((k::DOUBLE * syz::DOUBLE
                              - sy::DOUBLE * sz::DOUBLE)
                             / (sqrt(k::DOUBLE * syy::DOUBLE
                                     - sy::DOUBLE * sy::DOUBLE)
                                * sqrt(k::DOUBLE * szz::DOUBLE
                                       - sz::DOUBLE * sz::DOUBLE)), 6)
                       + 0
                   END::DOUBLE
            FROM a
        """,
        "corpus_growth": """
            WITH per AS (
                SELECT (CAST(floor(epoch(ts)) AS BIGINT) // 86400) * 86400
                           AS bucket_epoch,
                       count(*) AS n
                FROM events GROUP BY 1)
            SELECT bucket_epoch,
                   n::BIGINT AS n_events,
                   sum(n) OVER (ORDER BY bucket_epoch
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW)::BIGINT AS cum_events,
                   round(sum(n) OVER (ORDER BY bucket_epoch
                                      ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND CURRENT ROW)::DOUBLE
                         / sum(n) OVER ()::DOUBLE, 6) AS pct_of_total
            FROM per
        """,
        "markup_signals": """
            WITH src AS (
                SELECT doc_id,
                       'm://' || doc_id AS url,
                       '<html><body>'
                       || repeat('<script src=x></script>',
                                 (doc_id % 4)::INT)
                       || repeat('<iframe>', (doc_id % 3)::INT)
                       || CASE WHEN doc_id % 5 = 0
                               THEN '<form action=/s>' ELSE '' END
                       || repeat('<a href=x>t</a>', (doc_id % 6)::INT)
                       || repeat('plain text ', (doc_id % 7)::INT + 1)
                       || '</body></html>' AS t
                FROM documents)
            SELECT url,
                   len(regexp_extract_all(t, '(?is)<script[\\s>]'))::INT
                       AS n_script,
                   len(regexp_extract_all(t, '(?is)<iframe[\\s>]'))::INT
                       AS n_iframe,
                   len(regexp_extract_all(t, '(?is)<form[\\s>]'))::INT
                       AS n_form,
                   len(regexp_extract_all(t, '(?is)<a[\\s>]'))::INT
                       AS n_links,
                   CASE WHEN length(t) > 0 THEN
                       round(len(regexp_extract_all(t, '<[a-zA-Z]'))::DOUBLE
                             * 100.0 / length(t)::DOUBLE, 6)
                   END::DOUBLE AS tag_density
            FROM src
        """,
        "meta_redirects": """
            SELECT 'r://' || doc_id AS url,
                   CASE doc_id % 5
                        WHEN 0 THEN 5 WHEN 1 THEN 0
                        WHEN 2 THEN 30 ELSE 1 END AS delay_s,
                   CASE doc_id % 5
                        WHEN 0 THEN 'https://t.example/a' || doc_id
                        WHEN 1 THEN '/next' || doc_id
                        WHEN 2 THEN NULL
                        ELSE 'first' || doc_id END AS target
            FROM documents
            WHERE doc_id % 5 <> 3
        """,
        "rel_pagination": """
            SELECT 'g://' || doc_id AS url,
                   CASE doc_id % 4
                        WHEN 0 THEN 'https://s.example/p' || (doc_id + 1)
                        WHEN 2 THEN '/n' || doc_id
                        ELSE NULL END AS next_url,
                   CASE doc_id % 4
                        WHEN 1 THEN '/p' || (doc_id - 1)
                        WHEN 2 THEN '/p' || doc_id
                        ELSE NULL END AS prev_url,
                   (doc_id % 4) IN (0, 1, 2) AS is_paginated
            FROM documents
        """,
        "og_cards": """
            SELECT 'o://' || doc_id AS url,
                   CASE doc_id % 4
                        WHEN 0 THEN 'First ' || doc_id
                        WHEN 1 THEN 'Title ' || doc_id || ' here'
                        ELSE NULL END AS og_title,
                   CASE WHEN doc_id % 4 = 0 THEN 'article' END AS og_type,
                   CASE WHEN doc_id % 4 = 0
                        THEN 'https://img.example/' || doc_id || '.jpg'
                   END AS og_image,
                   CASE doc_id % 4
                        WHEN 0 THEN 'summary_large_image'
                        WHEN 2 THEN 'summary'
                        ELSE NULL END AS twitter_card
            FROM documents
        """,
        "k_core": """
            SELECT DISTINCT 'c' || (doc_id % 20) AS node, 4::BIGINT AS deg
            FROM documents
        """,
        "client_redirect_chains": """
            WITH RECURSIVE raw AS (
                SELECT 'u' || doc_id AS src,
                       'u' || (CASE WHEN doc_id % 10 <> 9 THEN doc_id + 1
                                    ELSE doc_id - 9 END) AS dst
                FROM documents
                WHERE doc_id % 10 <> 9
                   OR (doc_id % 10 = 9 AND (doc_id // 10) % 5 = 0)),
            e AS (SELECT src, min(dst) AS dst FROM raw GROUP BY src),
            r AS (
                SELECT src AS start, dst AS cur, 1 AS hops FROM e
                UNION ALL
                SELECT r.start, e.dst, r.hops + 1
                FROM r JOIN e ON r.cur = e.src
                WHERE r.hops < 16),
            last AS (
                SELECT start, cur, hops,
                       row_number() OVER (
                           PARTITION BY start ORDER BY hops DESC) AS rn
                FROM r)
            SELECT l.start AS src, l.cur AS final, l.hops::INT AS hops,
                   (e2.src IS NULL) AS resolved
            FROM last l LEFT JOIN e e2 ON l.cur = e2.src
            WHERE l.rn = 1
        """,
        "cluster_pair_eval": """
            WITH a AS (
                SELECT ((doc_id + CASE WHEN doc_id % 11 = 0
                                       THEN 1 ELSE 0 END) % 6) AS pred,
                       (doc_id % 6) AS truth
                FROM documents),
            tp AS (
                SELECT sum((n * (n - 1)) // 2) AS tp_pairs FROM (
                    SELECT count(*) AS n FROM a GROUP BY pred, truth)),
            pp AS (
                SELECT sum((n * (n - 1)) // 2) AS pred_pairs FROM (
                    SELECT count(*) AS n FROM a GROUP BY pred)),
            tt AS (
                SELECT sum((n * (n - 1)) // 2) AS true_pairs FROM (
                    SELECT count(*) AS n FROM a GROUP BY truth)),
            nn AS (SELECT count(*) AS n_items FROM a),
            j AS (SELECT * FROM nn, tp, pp, tt),
            pr AS (
                SELECT *,
                       CASE WHEN pred_pairs > 0 THEN
                           round(tp_pairs::DOUBLE / pred_pairs::DOUBLE, 6)
                       END AS precision,
                       CASE WHEN true_pairs > 0 THEN
                           round(tp_pairs::DOUBLE / true_pairs::DOUBLE, 6)
                       END AS recall
                FROM j)
            SELECT n_items::BIGINT AS n_items, tp_pairs::BIGINT AS tp_pairs,
                   pred_pairs::BIGINT AS pred_pairs,
                   true_pairs::BIGINT AS true_pairs,
                   precision::DOUBLE AS precision, recall::DOUBLE AS recall,
                   (CASE WHEN precision IS NOT NULL AND recall IS NOT NULL
                         THEN CASE WHEN precision + recall > 0
                                   THEN round(2.0 * precision * recall
                                              / (precision + recall), 6)
                                   ELSE 0.0 END
                    END)::DOUBLE AS f1
            FROM pr
        """,
        "rater_kappa_pairs": """
            WITH ratings AS (
                SELECT doc_id AS item_id,
                       'r' || r::VARCHAR AS rater,
                       'L' || ((doc_id % 3 + CASE WHEN (doc_id + r) % 5 = 0
                                             THEN 1 ELSE 0 END) % 3)::VARCHAR
                           AS label
                FROM documents, (VALUES (0), (1), (2)) AS t(r)
                WHERE NOT (r = 2 AND doc_id % 7 = 0)),
            pairs AS (
                SELECT a.rater AS rater_a, b.rater AS rater_b,
                       a.label AS la, b.label AS lb
                FROM ratings a
                JOIN ratings b
                  ON a.item_id = b.item_id AND a.rater < b.rater),
            tot AS (
                SELECT rater_a, rater_b, count(*) AS n,
                       sum(CASE WHEN la = lb THEN 1 ELSE 0 END) AS agree
                FROM pairs GROUP BY 1, 2),
            al AS (SELECT rater_a, rater_b, la AS l, count(*) AS a_l
                   FROM pairs GROUP BY 1, 2, 3),
            bl AS (SELECT rater_a, rater_b, lb AS l, count(*) AS b_l
                   FROM pairs GROUP BY 1, 2, 3),
            ch AS (
                SELECT coalesce(al.rater_a, bl.rater_a) AS rater_a,
                       coalesce(al.rater_b, bl.rater_b) AS rater_b,
                       sum(coalesce(a_l, 0) * coalesce(b_l, 0)) AS sum_ab
                FROM al FULL JOIN bl
                  ON al.rater_a = bl.rater_a AND al.rater_b = bl.rater_b
                     AND al.l = bl.l
                GROUP BY 1, 2)
            SELECT t.rater_a, t.rater_b,
                   n::BIGINT AS n_items, agree::BIGINT AS n_agree,
                   round(agree::DOUBLE / n::DOUBLE, 6) AS po,
                   round(sum_ab::DOUBLE / (n * n)::DOUBLE, 6) AS pe,
                   (CASE WHEN n * n - sum_ab != 0 THEN
                        round((n * agree - sum_ab)::DOUBLE
                              / (n * n - sum_ab)::DOUBLE, 6)
                    END)::DOUBLE AS kappa
            FROM tot t JOIN ch USING (rater_a, rater_b)
        """,
        "fleiss_kappa": """
            WITH ratings AS (
                SELECT doc_id AS item_id,
                       'L' || ((doc_id % 3 + CASE WHEN (doc_id + r) % 5 = 0
                                             THEN 1 ELSE 0 END) % 3)::VARCHAR
                           AS label
                FROM documents, (VALUES (0), (1), (2)) AS t(r)
                WHERE NOT (r = 2 AND doc_id % 7 = 0)),
            cell AS (SELECT item_id, label, count(*) AS n_il
                     FROM ratings GROUP BY 1, 2),
            item AS (SELECT item_id, sum(n_il) AS n_i,
                            sum(n_il * n_il) AS sum_sq
                     FROM cell GROUP BY 1 HAVING sum(n_il) >= 2),
            ag AS (SELECT count(*) AS n_items,
                          sum(((sum_sq - n_i) * 1000000000)
                              // (n_i * (n_i - 1))) AS sum_p_nano,
                          sum(n_i) AS n_ratings
                   FROM item),
            lab AS (SELECT sum(c_j * c_j) AS sum_cj_sq FROM (
                        SELECT sum(n_il) AS c_j
                        FROM cell JOIN item USING (item_id)
                        GROUP BY label)),
            j AS (SELECT *,
                         sum_p_nano::DOUBLE / (n_items::DOUBLE * 1e9)
                             AS p_bar_raw,
                         sum_cj_sq::DOUBLE / (n_ratings * n_ratings)::DOUBLE
                             AS p_e_raw
                  FROM ag, lab)
            SELECT n_items::BIGINT AS n_items, n_ratings::BIGINT AS n_ratings,
                   round(p_bar_raw, 6) AS p_bar,
                   round(p_e_raw, 6) AS p_e,
                   (CASE WHEN round(p_e_raw, 9) != 1.0 THEN
                        round((p_bar_raw - p_e_raw) / (1.0 - p_e_raw), 6)
                    END)::DOUBLE AS kappa
            FROM j
        """,
        "negative_sampling": """
            WITH toks AS (
                SELECT unnest(regexp_extract_all(lower(text),
                                                 '[a-zà-öø-ÿ]+')) AS word
                FROM documents),
            counts AS (SELECT word, count(*) AS n FROM toks GROUP BY 1),
            vocab AS (SELECT word, n FROM counts
                      ORDER BY n DESC, word LIMIT 200),
            w AS (SELECT word, n::BIGINT AS n,
                         floor(1e6 * sqrt(sqrt((n::HUGEINT * n * n)::DOUBLE)))::BIGINT
                             AS w_micro
                  FROM vocab),
            t AS (SELECT sum(w_micro) AS total FROM w),
            b AS (SELECT word, n, w_micro,
                         (5000 * w_micro) // total AS base,
                         (5000 * w_micro) % total AS rem
                  FROM w, t),
            l AS (SELECT 5000 - sum(base) AS leftover FROM b),
            r AS (SELECT *, row_number() OVER (
                                ORDER BY rem DESC, word ASC) AS rk
                  FROM b)
            SELECT word, n, w_micro,
                   (base + CASE WHEN rk <= (SELECT leftover FROM l)
                                THEN 1 ELSE 0 END)::BIGINT AS slots
            FROM r
        """,
        "burrows_delta": """
            WITH toks AS (
                SELECT lang AS g,
                       unnest(regexp_extract_all(lower(text),
                                                 '[a-zà-öø-ÿ]+')) AS w
                FROM documents),
            counts AS (SELECT g, w, count(*) AS n FROM toks GROUP BY 1, 2),
            totals AS (SELECT g, sum(n) AS total FROM counts GROUP BY 1),
            groups AS (SELECT g, total FROM totals WHERE total > 0
                       ORDER BY total DESC, g LIMIT 5),
            ic AS (SELECT c.g, c.w, c.n FROM counts c JOIN groups USING (g)),
            words AS (SELECT w FROM (
                          SELECT w, sum(n) AS wn FROM ic GROUP BY w)
                      ORDER BY wn DESC, w LIMIT 40),
            dense AS (
                SELECT gw.g, gw.w,
                       (coalesce(ic.n, 0) * 1000000000) // gw.total AS f
                FROM (SELECT groups.g, groups.total, words.w
                      FROM groups CROSS JOIN words) gw
                LEFT JOIN ic ON ic.g = gw.g AND ic.w = gw.w),
            stats AS (SELECT w, count(*) AS gn, sum(f) AS sum_f,
                             sum(f * f) AS sum_f2
                      FROM dense GROUP BY w),
            z AS (SELECT g, w, (f * gn - sum_f) AS num,
                         sqrt((gn * sum_f2 - sum_f * sum_f)::DOUBLE) AS den
                  FROM dense JOIN stats USING (w)),
            pt AS (SELECT a.g AS group_a, b.g AS group_b, a.den AS den,
                          CASE WHEN a.den > 0 THEN
                              floor(1e6 * abs((a.num - b.num)::DOUBLE)
                                    / a.den)
                          END AS term_micro
                   FROM z a JOIN z b ON a.w = b.w AND a.g < b.g),
            agg AS (SELECT group_a, group_b,
                           sum(CASE WHEN den > 0 THEN 1 ELSE 0 END)
                               AS n_words,
                           sum(term_micro) AS sum_micro
                    FROM pt GROUP BY 1, 2)
            SELECT group_a, group_b, n_words::BIGINT AS n_words,
                   (CASE WHEN n_words > 0 THEN
                        round(sum_micro::DOUBLE
                              / (n_words::DOUBLE * 1e6), 6)
                    END)::DOUBLE AS delta
            FROM agg
        """,
        "krippendorff_alpha": """
            WITH ratings AS (
                SELECT doc_id AS item_id,
                       'L' || ((doc_id % 3 + CASE WHEN (doc_id + r) % 5 = 0
                                             THEN 1 ELSE 0 END) % 3)::VARCHAR
                           AS label
                FROM documents, (VALUES (0), (1), (2)) AS t(r)
                WHERE NOT (r = 2 AND doc_id % 7 = 0)),
            cell AS (SELECT item_id, label, count(*) AS n_il
                     FROM ratings GROUP BY 1, 2),
            item AS (SELECT item_id, sum(n_il) AS n_i,
                            sum(n_il * n_il) AS sum_sq
                     FROM cell GROUP BY 1 HAVING sum(n_il) >= 2),
            ag AS (SELECT count(*) AS n_items,
                          sum(((n_i * n_i - sum_sq) * 1000000000)
                              // (n_i - 1)) AS sum_d_nano,
                          sum(n_i) AS n_ratings
                   FROM item),
            lab AS (SELECT sum(c_j * c_j) AS sum_cj_sq FROM (
                        SELECT sum(n_il) AS c_j
                        FROM cell JOIN item USING (item_id)
                        GROUP BY label)),
            j AS (SELECT *,
                         sum_d_nano::DOUBLE / (n_ratings::DOUBLE * 1e9)
                             AS d_o_raw,
                         (n_ratings * n_ratings - sum_cj_sq)::DOUBLE
                             / (n_ratings * (n_ratings - 1))::DOUBLE
                             AS d_e_raw
                  FROM ag, lab)
            SELECT n_items::BIGINT AS n_items, n_ratings::BIGINT AS n_ratings,
                   round(d_o_raw, 6) AS d_o,
                   round(d_e_raw, 6) AS d_e,
                   (CASE WHEN d_e_raw > 0 THEN
                        round(1.0 - d_o_raw / d_e_raw, 6)
                    END)::DOUBLE AS alpha
            FROM j
        """,
        "rank_agreement": """
            WITH s AS (
                SELECT doc_id, n_chars AS score_a,
                       n_chars + (doc_id % 13) * 7 - 42 AS score_b
                FROM documents),
            r AS (
                SELECT row_number() OVER (
                           ORDER BY score_a ASC, doc_id ASC) AS ra,
                       row_number() OVER (
                           ORDER BY score_b ASC, doc_id ASC) AS rb
                FROM s),
            a AS (
                SELECT count(*) AS n,
                       sum((ra - rb) * (ra - rb)) AS sum_d2
                FROM r)
            SELECT n::BIGINT AS n, sum_d2::BIGINT AS sum_d2,
                   (CASE WHEN n > 1 THEN
                       round(1.0 - 6.0 * sum_d2::DOUBLE
                             / (n::DOUBLE * (n::DOUBLE * n::DOUBLE - 1.0)),
                             6) + 0
                   END)::DOUBLE AS rho
            FROM a
        """,
        "score_drift_ks": """
            WITH tagged AS (
                SELECT n_chars AS v, 1 AS ia, 0 AS ib
                FROM documents WHERE doc_id % 2 = 0
                UNION ALL
                SELECT n_chars + (doc_id % 5) * 3, 0, 1
                FROM documents WHERE doc_id % 2 = 1),
            per AS (
                SELECT v, sum(ia) AS ca, sum(ib) AS cb
                FROM tagged GROUP BY v),
            curve AS (
                SELECT v,
                       sum(ca) OVER (ORDER BY v
                           ROWS BETWEEN UNBOUNDED PRECEDING
                           AND CURRENT ROW) AS cum_a,
                       sum(cb) OVER (ORDER BY v
                           ROWS BETWEEN UNBOUNDED PRECEDING
                           AND CURRENT ROW) AS cum_b,
                       sum(ca) OVER () AS n_a,
                       sum(cb) OVER () AS n_b
                FROM per),
            gaps AS (
                SELECT v, n_a, n_b,
                       round(abs(cum_a::DOUBLE / n_a::DOUBLE
                                 - cum_b::DOUBLE / n_b::DOUBLE), 6) AS gap
                FROM curve),
            best AS (
                SELECT *, row_number() OVER (
                           ORDER BY gap DESC, v ASC) AS rn
                FROM gaps)
            SELECT n_a::BIGINT AS n_a, n_b::BIGINT AS n_b,
                   gap::DOUBLE AS d_stat, v AS at_value
            FROM best WHERE rn = 1
        """,
        "retrieval_eval": """
            WITH run AS (
                SELECT doc_id % 5 AS qid, doc_id,
                       (doc_id // 5) + 1 AS rank FROM documents),
            rel AS (
                SELECT DISTINCT doc_id % 5 AS qid, doc_id
                FROM documents WHERE doc_id % 3 = 0),
            marked AS (
                SELECT r.qid, r.rank,
                       (rl.doc_id IS NOT NULL) AS isrel
                FROM run r LEFT JOIN rel rl
                  ON r.qid = rl.qid AND r.doc_id = rl.doc_id),
            per AS (
                SELECT qid,
                       count(*) FILTER (WHERE isrel AND rank <= 10)
                           AS hits_k,
                       min(CASE WHEN isrel THEN rank END) AS first_rel,
                       sum(CASE WHEN isrel AND rank <= 10
                                THEN round(1e9 / log2(rank::DOUBLE + 1.0))
                                     ::BIGINT
                                ELSE 0 END) AS dcg_nano
                FROM marked GROUP BY qid),
            nr AS (SELECT qid, count(*) AS n_rel FROM rel GROUP BY qid),
            j AS (
                SELECT nr.qid, nr.n_rel,
                       coalesce(per.hits_k, 0) AS hits_k,
                       per.first_rel,
                       coalesce(per.dcg_nano, 0) AS dcg_nano,
                       list_sum(list_transform(
                           generate_series(1, least(nr.n_rel, 10)::BIGINT),
                           r -> round(1e9 / log2(r::DOUBLE + 1.0))::BIGINT))
                           AS ideal_nano
                FROM nr LEFT JOIN per ON nr.qid = per.qid)
            SELECT qid, n_rel::BIGINT AS n_rel, hits_k::BIGINT AS hits_k,
                   round(hits_k::DOUBLE / 10.0, 6) AS p_at_k,
                   round(hits_k::DOUBLE / n_rel::DOUBLE, 6) AS r_at_k,
                   round(coalesce(1.0 / first_rel::DOUBLE, 0.0), 6) AS rr,
                   round(dcg_nano::DOUBLE / ideal_nano::DOUBLE, 6)
                       AS ndcg_k
            FROM j
        """,
        "event_transitions": """
            WITH seq AS (
                SELECT event_type,
                       lag(event_type) OVER (
                           PARTITION BY user_id
                           ORDER BY ts, event_id) AS prev_type
                FROM events),
            pairs AS (
                SELECT prev_type, event_type, count(*) AS n
                FROM seq WHERE prev_type IS NOT NULL
                GROUP BY prev_type, event_type)
            SELECT prev_type, event_type, n::BIGINT AS n,
                   round(n::DOUBLE
                         / sum(n) OVER (PARTITION BY prev_type)::DOUBLE,
                         6) AS prob
            FROM pairs
        """,
        "template_fingerprints": """
            SELECT 't://' || doc_id AS url,
                   CASE doc_id % 3
                        WHEN 0 THEN 4 WHEN 1 THEN 2 ELSE 0 END
                       AS n_class_tokens,
                   CASE doc_id % 3
                        WHEN 0 THEN md5('body|main|nav|text')
                        WHEN 1 THEN md5('main|nav')
                        ELSE NULL END AS fingerprint
            FROM documents
        """,
        "allocate_budget": """
            WITH c AS (
                SELECT lang || ':' || (doc_id % 3) AS stratum,
                       count(*) AS n
                FROM documents GROUP BY 1),
            t AS (SELECT sum(n) AS total FROM c),
            q AS (
                SELECT stratum, n,
                       (1000 * n) // total AS base,
                       (1000 * n) % total AS rem
                FROM c, t),
            l AS (SELECT 1000 - sum(base) AS leftover FROM q),
            r AS (
                SELECT *, row_number() OVER (
                           ORDER BY rem DESC, stratum ASC) AS rk
                FROM q)
            SELECT stratum, n::BIGINT AS n,
                   (base + CASE WHEN rk <= leftover THEN 1 ELSE 0 END)
                       ::BIGINT AS alloc
            FROM r, l
        """,
        "temporal_splits": """
            WITH s AS (
                SELECT doc_id,
                       1735689600 + (doc_id * 997) % 86400 AS epoch
                FROM documents),
            c AS (
                SELECT round(quantile_cont(epoch, 0.8), 6) AS b1,
                       round(quantile_cont(epoch, 0.9), 6) AS b2
                FROM s)
            SELECT doc_id, epoch,
                   CASE WHEN epoch::DOUBLE < b1 THEN 'train'
                        WHEN epoch::DOUBLE < b2 THEN 'val'
                        ELSE 'test' END AS split
            FROM s, c
        """,
        "politeness_audit": """
            WITH pages AS (
                SELECT 'https://sub' || (doc_id % 3) || '.site'
                       || (doc_id % 7) || '.example/p' || doc_id AS url,
                       'site' || (doc_id % 7) || '.example' AS domain,
                       1735689600 + (doc_id * 997) % 86400 AS epoch
                FROM documents),
            g AS (
                SELECT domain,
                       epoch - lag(epoch) OVER (
                           PARTITION BY domain ORDER BY epoch, url) AS gap
                FROM pages),
            a AS (
                SELECT domain, count(*) AS n_fetches, count(gap) AS n_gaps,
                       sum(gap) AS sum_gap
                FROM g GROUP BY domain),
            cad AS (
                SELECT domain, n_fetches,
                       round(sum_gap::DOUBLE / n_gaps::DOUBLE, 6)
                           AS mean_gap_s
                FROM a WHERE n_fetches >= 2),
            delays AS (
                SELECT DISTINCT 'site' || (doc_id % 7) || '.example'
                           AS domain,
                       ((doc_id % 7) % 4) * 1000 + 500 AS crawl_delay_s
                FROM documents)
            SELECT cad.domain, cad.n_fetches, cad.mean_gap_s,
                   delays.crawl_delay_s::BIGINT AS crawl_delay_s,
                   (cad.mean_gap_s < delays.crawl_delay_s::DOUBLE)
                       AS violates
            FROM cad JOIN delays ON cad.domain = delays.domain
        """,
        "compaction_plan": """
            WITH files AS (
                SELECT 'f' || doc_id || '.parquet' AS path,
                       (doc_id * 131) % 10000 + 100 AS bytes
                FROM documents)
            SELECT path, bytes::BIGINT AS bytes,
                   ((sum(bytes) OVER (
                         ORDER BY bytes DESC, path ASC
                         ROWS BETWEEN UNBOUNDED PRECEDING
                         AND CURRENT ROW) - bytes) // 16384)::INT AS bin
            FROM files
        """,
        "dom_depth": """
            SELECT 'd://' || doc_id AS url,
                   CASE doc_id % 4 WHEN 0 THEN 6 WHEN 1 THEN 7
                        WHEN 2 THEN 2 ELSE 5 END AS n_tags,
                   CASE doc_id % 4 WHEN 0 THEN 3 WHEN 1 THEN 2
                        WHEN 2 THEN 0 ELSE 2 END AS max_depth
            FROM documents
        """,
        "url_lifespan": """
            WITH o AS (
                SELECT 'u' || (doc_id % 100) AS url,
                       86400 * (doc_id % 7) AS snap
                FROM documents)
            SELECT url, min(snap)::BIGINT AS first_seen,
                   max(snap)::BIGINT AS last_seen,
                   count(DISTINCT snap)::BIGINT AS n_snapshots,
                   (max(snap) = (SELECT max(snap) FROM o)) AS is_active
            FROM o GROUP BY url
        """,
        "latency_bands": """
            SELECT event_type,
                   count(value)::BIGINT AS n,
                   round(quantile_cont(value, 0.5)::DOUBLE, 6) AS p50,
                   round(quantile_cont(value, 0.95)::DOUBLE, 6) AS p95,
                   CASE WHEN count(value) > 0 THEN
                       round(sum(value::DOUBLE)
                             / count(value)::DOUBLE, 6)
                   END::DOUBLE AS mean_value
            FROM events GROUP BY event_type
        """,
        "interleave_strata": """
            WITH s AS (SELECT doc_id, lang AS stratum FROM documents),
            idx AS (
                SELECT stratum,
                       row_number() OVER (ORDER BY stratum) - 1 AS i
                FROM (SELECT DISTINCT stratum FROM s)),
            k AS (SELECT count(*) AS k FROM idx),
            r AS (
                SELECT doc_id, stratum,
                       row_number() OVER (
                           PARTITION BY stratum ORDER BY doc_id) AS rn
                FROM s)
            SELECT r.doc_id, r.stratum, rn::BIGINT AS stratum_rank,
                   ((rn - 1) * k + i)::BIGINT AS train_order
            FROM r JOIN idx USING (stratum) CROSS JOIN k
        """,
        "punct_profile": """
            WITH src AS (
                SELECT doc_id,
                       substr(text, 1, 50)
                       || CASE doc_id % 3
                            WHEN 0 THEN ' “quoted” — and… more”'
                            WHEN 1 THEN ' "ascii" -- and... more'
                            ELSE ' bare words only' END AS text
                FROM documents),
            c AS (
                SELECT doc_id,
                       len(regexp_extract_all(text, '[“”‘’—…]')) AS ns,
                       len(regexp_extract_all(text, '["'']'))
                       + len(regexp_extract_all(text, '--'))
                       + len(regexp_extract_all(text, '\\.\\.\\.')) AS na
                FROM src)
            SELECT doc_id, ns::INT AS n_smart, na::INT AS n_ascii,
                   CASE WHEN ns + na > 0 THEN
                       round(ns::DOUBLE / (ns + na)::DOUBLE, 6)
                   END::DOUBLE AS smart_ratio
            FROM c
        """,
        "json_props": """
            SELECT event_id,
                   CASE WHEN event_id % 7 = 0 THEN NULL
                        WHEN event_id % 7 = 1 THEN NULL
                        ELSE json_extract_string(props, '$.k')::INT
                   END AS k,
                   (event_id % 7 <> 0) AS is_valid
            FROM events
        """,
        # Variant construction replay: every field is arithmetic on
        # event_id; the valid-row variant schema is the construction-
        # known literal Spark's schema_of_variant emits.
        "variant_props": """
            SELECT event_id,
                   CASE WHEN event_id % 11 = 0 THEN NULL
                        ELSE event_id % 100 END::BIGINT AS k,
                   CASE WHEN event_id % 11 = 0 THEN NULL
                        ELSE 'l' || CAST(event_id % 5 AS VARCHAR)
                   END AS lang,
                   CASE WHEN event_id % 11 = 0 THEN NULL
                        ELSE event_id % 7 END::BIGINT AS score,
                   CASE WHEN event_id % 11 = 0 THEN NULL
                        ELSE 'x' END AS tag1,
                   CASE WHEN event_id % 11 = 0 THEN NULL
                        ELSE 'OBJECT<k: BIGINT, meta: OBJECT<lang: STRING, '
                             || 'score: BIGINT>, tags: ARRAY<STRING>>'
                   END AS variant_schema,
                   (event_id % 11 = 0) AS corrupt
            FROM events
        """,
        "count_cusum": """
            WITH per AS (
                SELECT (CAST(floor(epoch(ts)) AS BIGINT) // 86400) * 86400
                           AS day,
                       count(*) AS c
                FROM events GROUP BY 1),
            curve AS (
                SELECT day,
                       row_number() OVER (ORDER BY day) AS i,
                       sum(c) OVER (ORDER BY day
                           ROWS BETWEEN UNBOUNDED PRECEDING
                           AND CURRENT ROW) AS cum,
                       sum(c) OVER () AS total,
                       count(*) OVER () AS n
                FROM per),
            s AS (
                SELECT day, total, n,
                       n * cum - i * total AS s
                FROM curve),
            best AS (
                SELECT *, row_number() OVER (
                           ORDER BY abs(s) DESC, day ASC) AS rn
                FROM s)
            SELECT n::BIGINT AS n_days, total::BIGINT AS total_events,
                   day AS peak_day, s::BIGINT AS peak_stat,
                   CASE WHEN total > 0 THEN
                       round(abs(s)::DOUBLE / (n * total)::DOUBLE, 6)
                   END::DOUBLE AS norm_stat
            FROM best WHERE rn = 1
        """,
        "domain_churn": """
            WITH o AS (
                SELECT 'site' || (doc_id % 7) || '.example' AS domain,
                       count(*) AS n_old
                FROM documents GROUP BY 1),
            n AS (
                SELECT 'site' || ((doc_id % 7) + 2) || '.example' AS domain,
                       count(*) AS n_new
                FROM documents GROUP BY 1)
            SELECT coalesce(o.domain, n.domain) AS domain,
                   coalesce(n_old, 0)::BIGINT AS n_old,
                   coalesce(n_new, 0)::BIGINT AS n_new,
                   CASE WHEN o.domain IS NULL THEN 'new'
                        WHEN n.domain IS NULL THEN 'lost'
                        ELSE 'retained' END AS status
            FROM o FULL OUTER JOIN n ON o.domain = n.domain
        """,
        "threshold_for_rate": """
            WITH c AS (
                SELECT round(quantile_cont(n_chars, 0.7), 6) AS cutoff
                FROM documents),
            k AS (
                SELECT cutoff, count(*) AS n_total,
                       sum(CASE WHEN n_chars::DOUBLE >= cutoff
                                THEN 1 ELSE 0 END) AS n_kept
                FROM documents, c GROUP BY cutoff)
            SELECT cutoff::DOUBLE AS cutoff, n_total::BIGINT AS n_total,
                   n_kept::BIGINT AS n_kept,
                   CASE WHEN n_total > 0 THEN
                       round(n_kept::DOUBLE / n_total::DOUBLE, 6)
                   END::DOUBLE AS achieved_rate
            FROM k
        """,
        "hapax_stats": """
            WITH toks AS (
                SELECT doc_id,
                       unnest(list_distinct(regexp_extract_all(
                           lower(text), '[a-zà-öø-ÿ]+'))) AS tok
                FROM documents),
            dfreq AS (
                SELECT tok, count(*) AS df FROM toks GROUP BY tok),
            per AS (
                SELECT doc_id, count(*) AS nd,
                       sum(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS nh
                FROM toks JOIN dfreq USING (tok) GROUP BY doc_id)
            SELECT d.doc_id,
                   coalesce(nd, 0)::INT AS n_distinct_tokens,
                   coalesce(nh, 0)::INT AS n_hapax,
                   CASE WHEN coalesce(nd, 0) > 0 THEN
                       round(nh::DOUBLE / nd::DOUBLE, 6)
                   END::DOUBLE AS hapax_ratio
            FROM documents d LEFT JOIN per USING (doc_id)
        """,
        "bfs_distances": """
            WITH RECURSIVE e AS (
                SELECT DISTINCT src, dst FROM (
                    SELECT 'a' || (doc_id % 20) AS src,
                           'a' || ((doc_id % 20 + 1) % 20) AS dst
                    FROM documents
                    UNION ALL
                    SELECT 'a' || (doc_id % 20),
                           'a' || ((3 * (doc_id % 20) + 7) % 20)
                    FROM documents
                    UNION ALL
                    SELECT 'b' || (doc_id % 10),
                           'b' || ((doc_id % 10 + 1) % 10)
                    FROM documents)),
            walk(domain, hops) AS (
                SELECT 'a0', 0
                UNION
                SELECT e.dst, w.hops + 1
                FROM walk w JOIN e ON e.src = w.domain
                WHERE w.hops < 12)
            SELECT domain, min(hops)::INT AS hops FROM walk GROUP BY domain
        """,
        "zorder_layout": """
            WITH base AS (
                SELECT doc_id AS id, n_chars::BIGINT AS x,
                       ((doc_id * 37) % 256)::BIGINT AS y
                FROM documents),
            st AS (
                SELECT min(x) AS minx, max(x) AS maxx,
                       min(y) AS miny, max(y) AS maxy
                FROM base),
            c AS (
                SELECT id, y,
                       ((x - minx) * 256) // (maxx - minx + 1) AS xi,
                       ((y - miny) * 256) // (maxy - miny + 1) AS yi
                FROM base, st),
            z AS (
                SELECT id, y,
                       ((xi>>0)&1)*1 + ((yi>>0)&1)*2 + ((xi>>1)&1)*4
                     + ((yi>>1)&1)*8 + ((xi>>2)&1)*16 + ((yi>>2)&1)*32
                     + ((xi>>3)&1)*64 + ((yi>>3)&1)*128 + ((xi>>4)&1)*256
                     + ((yi>>4)&1)*512 + ((xi>>5)&1)*1024 + ((yi>>5)&1)*2048
                     + ((xi>>6)&1)*4096 + ((yi>>6)&1)*8192
                     + ((xi>>7)&1)*16384 + ((yi>>7)&1)*32768 AS zv
                FROM c),
            b AS (
                SELECT 'natural' AS layout, y,
                       (row_number() OVER (ORDER BY id) - 1) // 50 AS file_id
                FROM z
                UNION ALL
                SELECT 'zorder', y,
                       (row_number() OVER (ORDER BY zv, id) - 1) // 50
                FROM z),
            pf AS (
                SELECT layout, file_id, min(y) AS mn, max(y) AS mx,
                       count(*) AS n,
                       sum(CASE WHEN y BETWEEN 64 AND 127 THEN 1 ELSE 0 END)
                           AS m
                FROM b GROUP BY layout, file_id),
            agg AS (
                SELECT layout, sum(n) AS n_rows, count(*) AS n_files,
                       sum(CASE WHEN mx >= 64 AND mn <= 127 THEN 1 ELSE 0 END)
                           AS files_scanned,
                       sum(CASE WHEN mx >= 64 AND mn <= 127 THEN n ELSE 0 END)
                           AS rows_scanned,
                       sum(m) AS rows_matched
                FROM pf GROUP BY layout)
            SELECT layout, n_rows::BIGINT AS n_rows, n_files::BIGINT AS n_files,
                   files_scanned::BIGINT AS files_scanned,
                   rows_scanned::BIGINT AS rows_scanned,
                   rows_matched::BIGINT AS rows_matched,
                   round(1.0::DOUBLE - files_scanned::DOUBLE / n_files::DOUBLE,
                         6) + 0.0 AS prune_ratio
            FROM agg
        """,
        "kmv_similarity": """
            WITH a AS (
                SELECT DISTINCT
                       ('0x' || substr(md5('u' || (doc_id * 2)), 1, 15))::BIGINT
                           AS h
                FROM documents ORDER BY h LIMIT 64),
            b AS (
                SELECT DISTINCT
                       ('0x' || substr(md5('u' || (doc_id * 3)), 1, 15))::BIGINT
                           AS h
                FROM documents ORDER BY h LIMIT 64),
            u AS (
                SELECT DISTINCT h FROM (
                    SELECT h FROM a UNION ALL SELECT h FROM b)
                ORDER BY h LIMIT 64),
            i AS (
                SELECT count(*) AS ni FROM u
                WHERE h IN (SELECT h FROM a) AND h IN (SELECT h FROM b)),
            nu AS (SELECT count(*) AS nu FROM u),
            sa AS (SELECT count(*) AS na, max(h) AS ha FROM a),
            sb AS (SELECT count(*) AS nb, max(h) AS hb FROM b)
            SELECT 64::INT AS k,
                   na::BIGINT AS n_sketch_old, nb::BIGINT AS n_sketch_new,
                   CASE WHEN na < 64 THEN na::DOUBLE
                        ELSE round(63.0 * 1152921504606846976.0 / ha::DOUBLE, 6)
                   END AS est_distinct_old,
                   CASE WHEN nb < 64 THEN nb::DOUBLE
                        ELSE round(63.0 * 1152921504606846976.0 / hb::DOUBLE, 6)
                   END AS est_distinct_new,
                   CASE WHEN nu > 0
                        THEN round(ni::DOUBLE / nu::DOUBLE, 6)
                        ELSE 0.0 END AS est_jaccard
            FROM sa, sb, nu, i
        """,
        "calibration_bins": """
            WITH d AS (
                SELECT ((doc_id * 37) % 101)::DOUBLE / 100.0 AS s,
                       CASE WHEN ((doc_id * 53 + 11) % 100)
                                 < ((doc_id * 37) % 101)
                            THEN 1 ELSE 0 END AS pos
                FROM documents),
            r AS (
                SELECT least(9, floor(s * 10))::INT AS bin,
                       round(s * 1e6, 0)::BIGINT AS cm, pos
                FROM d),
            per AS (
                SELECT bin, count(*) AS n, sum(cm) AS conf,
                       sum(pos) AS npos
                FROM r GROUP BY bin),
            g AS (
                SELECT bin, n, conf, npos,
                       abs(conf - npos * 1000000) AS ad
                FROM per),
            t AS (
                SELECT round(sum(ad)::DOUBLE / (1e6 * sum(n)::DOUBLE), 6)
                           + 0.0 AS ece
                FROM g)
            SELECT bin, n::BIGINT AS n,
                   round(conf::DOUBLE / (1e6 * n::DOUBLE), 6) + 0.0 AS avg_conf,
                   round(npos::DOUBLE / n::DOUBLE, 6) + 0.0 AS frac_pos,
                   round(ad::DOUBLE / (1e6 * n::DOUBLE), 6) + 0.0 AS gap,
                   ece
            FROM g, t
        """,
        "session_paths": """
            WITH r AS (
                SELECT user_id, event_type,
                       row_number() OVER (
                           PARTITION BY user_id ORDER BY ts, event_id) AS rn
                FROM events),
            p AS (
                SELECT user_id,
                       string_agg(event_type, '>' ORDER BY rn) AS path
                FROM r WHERE rn <= 5 GROUP BY user_id)
            SELECT path, count(*)::BIGINT AS n_users
            FROM p GROUP BY path
            ORDER BY n_users DESC, path LIMIT 20
        """,
        "tracking_params": """
            WITH d AS (
                SELECT doc_id AS i FROM documents WHERE doc_id % 7 <> 0),
            p AS (
                SELECT 'utm_source' AS param, 'feed' AS v, i FROM d
                UNION ALL SELECT 'page', (i % 20)::VARCHAR, i FROM d
                UNION ALL SELECT 'sid', i::VARCHAR, i FROM d
                UNION ALL SELECT 'dbg', NULL, i FROM d WHERE i % 5 = 0),
            a AS (
                SELECT param, count(*) AS n_urls, count(DISTINCT v) AS nd
                FROM p GROUP BY param)
            SELECT param, n_urls::BIGINT AS n_urls,
                   nd::BIGINT AS n_distinct_values,
                   round(nd::DOUBLE / n_urls::DOUBLE, 6) + 0.0
                       AS distinct_ratio,
                   (n_urls >= 5 AND nd::DOUBLE >= 0.5 * n_urls::DOUBLE)
                       AS is_tracking
            FROM a
        """,
        "bootstrap_ci": """
            WITH reps AS (
                SELECT unnest(generate_series(0, 31)) AS rep),
            r AS (
                SELECT rep,
                       ('0x' || substr(md5(doc_id || ':' || rep), 1, 15))
                           ::BIGINT::DOUBLE / 1152921504606846976.0 AS u,
                       n_chars AS v
                FROM documents, reps),
            w AS (
                SELECT rep, v,
                       CASE WHEN u < 0.36787944117144233 THEN 0
                            WHEN u < 0.7357588823428847 THEN 1
                            WHEN u < 0.9196986029286058 THEN 2
                            WHEN u < 0.9810118431238462 THEN 3
                            WHEN u < 0.9963401531726563 THEN 4
                            WHEN u < 0.9994058151824183 THEN 5
                            ELSE 6 END AS w
                FROM r),
            m AS (
                SELECT rep, sum(w * v) AS wv, sum(w) AS sw
                FROM w GROUP BY rep),
            mm AS (
                SELECT wv::DOUBLE / sw::DOUBLE AS m FROM m WHERE sw > 0),
            ci AS (
                SELECT round(quantile_cont(m, 0.025), 6)::DOUBLE AS ci_lo,
                       round(quantile_cont(m, 0.975), 6)::DOUBLE AS ci_hi,
                       count(*)::INT AS n_reps_effective
                FROM mm),
            f AS (
                SELECT count(*) AS n_rows,
                       round(sum(n_chars)::DOUBLE / count(*)::DOUBLE, 6)
                           ::DOUBLE AS mean
                FROM documents)
            SELECT n_rows::BIGINT AS n_rows, n_reps_effective,
                   mean, ci_lo, ci_hi
            FROM f, ci
        """,
        # Paired bootstrap: same weight ladder over the per-doc DELTA
        # round((n_chars/5)*1e6) - round(n_words*1e6); win_rate = share
        # of replicate means > 0.
        "paired_bootstrap": """
            WITH base AS (
                SELECT doc_id,
                       CAST(round((n_chars::DOUBLE / 5) * 1e6) AS BIGINT)
                       - CAST(round(len(regexp_extract_all(
                             lower(text), '[a-zà-öø-ÿ]+'))::DOUBLE * 1e6)
                           AS BIGINT) AS d
                FROM documents
                WHERE n_chars IS NOT NULL AND text IS NOT NULL),
            reps AS (SELECT unnest(generate_series(0, 31)) AS rep),
            r AS (
                SELECT rep,
                       ('0x' || substr(md5(doc_id || ':' || rep), 1, 15))
                           ::BIGINT::DOUBLE / 1152921504606846976.0 AS u,
                       d
                FROM base, reps),
            w AS (
                SELECT rep, d,
                       CASE WHEN u < 0.36787944117144233 THEN 0
                            WHEN u < 0.7357588823428847 THEN 1
                            WHEN u < 0.9196986029286058 THEN 2
                            WHEN u < 0.9810118431238462 THEN 3
                            WHEN u < 0.9963401531726563 THEN 4
                            WHEN u < 0.9994058151824183 THEN 5
                            ELSE 6 END AS w
                FROM r),
            m AS (
                SELECT rep, sum(w * d) AS wd, sum(w) AS sw
                FROM w GROUP BY rep),
            mm AS (
                SELECT wd::DOUBLE / (1e6 * sw::DOUBLE) AS m
                FROM m WHERE sw > 0),
            ci AS (
                SELECT round(quantile_cont(m, 0.025), 6)::DOUBLE AS ci_lo,
                       round(quantile_cont(m, 0.975), 6)::DOUBLE AS ci_hi,
                       round(avg(CASE WHEN m > 0 THEN 1.0 ELSE 0.0 END),
                             6)::DOUBLE AS win_rate,
                       count(*)::INT AS n_reps_effective
                FROM mm),
            f AS (
                SELECT count(*) AS n_rows,
                       round(sum(d)::DOUBLE / (1e6 * count(*)::DOUBLE), 6)
                           ::DOUBLE AS mean_delta
                FROM base)
            SELECT n_rows::BIGINT AS n_rows, n_reps_effective, mean_delta,
                   ci_lo, ci_hi, win_rate
            FROM f, ci
        """,
        "term_burstiness": """
            WITH toks AS (
                SELECT doc_id,
                       unnest(regexp_extract_all(
                           lower(text), '[a-zà-öø-ÿ]+')) AS term
                FROM documents),
            tf AS (
                SELECT doc_id, term, count(*) AS tf
                FROM toks GROUP BY doc_id, term),
            per AS (
                SELECT term, count(*) AS doc_freq, sum(tf) AS total_tf,
                       sum(tf * tf) AS tf2
                FROM tf GROUP BY term),
            n AS (SELECT count(*) AS nn FROM documents)
            SELECT term, doc_freq::BIGINT AS doc_freq,
                   total_tf::BIGINT AS total_tf,
                   round(total_tf::DOUBLE / doc_freq::DOUBLE, 6) + 0.0
                       AS burstiness,
                   round((tf2::DOUBLE / nn::DOUBLE
                          - (total_tf::DOUBLE / nn::DOUBLE)
                            * (total_tf::DOUBLE / nn::DOUBLE))
                         / (total_tf::DOUBLE / nn::DOUBLE), 6) + 0.0 AS vmr
            FROM per, n
            ORDER BY total_tf DESC, term LIMIT 30
        """,
        "pdf_outline": """
            WITH d AS (
                SELECT doc_id,
                       CASE WHEN text IS NULL OR text = '' THEN 0
                            ELSE len(string_split(text, ' ')) END AS nw
                FROM documents),
            pg AS (
                SELECT doc_id,
                       ((1 + (nw + 7) // 8) + 5) // 6 AS np
                FROM d),
            parts AS (
                SELECT doc_id, unnest(generate_series(1, np - 1)) AS p
                FROM pg),
            rows_ AS (
                SELECT doc_id, 0 AS seq, 0 AS level,
                       'Document ' || doc_id AS title, 0 AS page
                FROM pg
                UNION ALL
                SELECT doc_id, p + (p - 1) // 2, 1, 'Part ' || p, p
                FROM parts
                UNION ALL
                SELECT doc_id, p + (p - 1) // 2 + 1, 2, 'Detail ' || p, p
                FROM parts WHERE p % 2 = 0)
            SELECT doc_id, seq::INT AS seq, level::INT AS level, title,
                   page::INT AS page
            FROM rows_
        """,
        "embedding_quantize": """
            WITH s AS (
                SELECT vec_id, embedding,
                       len(embedding) AS n_dims,
                       list_max(list_transform(
                           embedding, x -> abs(x::DOUBLE))) AS sc
                FROM embeddings),
            q AS (
                SELECT vec_id, embedding, n_dims, sc,
                       CASE WHEN sc > 0 THEN list_transform(
                           embedding,
                           x -> least(127.0, greatest(-127.0,
                               round(x::DOUBLE / sc * 127.0, 0)))::INT)
                       END AS qs
                FROM s),
            e AS (
                SELECT vec_id, n_dims, sc, qs,
                       CASE WHEN sc > 0 THEN list_transform(
                           embedding,
                           (x, i) -> round((x::DOUBLE
                               - qs[i]::DOUBLE * sc / 127.0) * 1e9,
                               0)::BIGINT)
                       END AS err,
                       CASE WHEN sc > 0 THEN list_sum(list_transform(
                           embedding,
                           x -> round(abs(x::DOUBLE) * 1e9, 0)::BIGINT))
                       END AS sav
                FROM q),
            g AS (
                SELECT vec_id, n_dims,
                       CASE WHEN sc > 0
                            THEN round(sc * 1e9, 0)::BIGINT END AS scale_nano,
                       CASE WHEN sc > 0 THEN list_max(
                           list_transform(qs, q -> abs(q))) END AS max_q,
                       CASE WHEN sc > 0 THEN list_sum(
                           list_transform(err, x -> abs(x)))
                       END AS mae_nano,
                       sav
                FROM e)
            SELECT vec_id, n_dims::INT AS n_dims, scale_nano,
                   max_q::INT AS max_q, mae_nano::BIGINT AS mae_nano,
                   CASE WHEN sav > 0 THEN
                       round(mae_nano::DOUBLE / sav::DOUBLE, 6) + 0.0
                   END AS rel_err
            FROM g
        """,
        "pdf_chapters": """
            WITH d AS (
                SELECT doc_id, coalesce(text, '') AS text FROM documents),
            words AS (
                SELECT doc_id,
                       CASE WHEN text = '' THEN []::VARCHAR[]
                            ELSE regexp_split_to_array(text, ' ') END AS ws
                FROM d),
            lines AS (
                SELECT doc_id, 0::BIGINT AS block_id,
                       'Document ' || doc_id AS text
                FROM words
                UNION ALL
                SELECT doc_id, i AS block_id,
                       array_to_string(
                           list_slice(ws, (i - 1) * 8 + 1, i * 8), ' ')
                           AS text
                FROM (
                    SELECT doc_id, ws,
                           unnest(generate_series(
                               1, CAST(ceil(len(ws) / 8.0) AS BIGINT)
                           )) AS i
                    FROM words)),
            blk AS (
                SELECT doc_id, block_id // 6 AS page,
                       length(text) AS chars
                FROM lines),
            np AS (
                SELECT doc_id, max(page) + 1 AS np
                FROM blk GROUP BY doc_id),
            ch AS (
                SELECT doc_id, 0 AS chapter_seq,
                       'Document ' || doc_id AS title, 0 AS first_page
                FROM np
                UNION ALL
                SELECT doc_id, (p + 1) // 2, 'Part ' || p, p
                FROM (
                    SELECT doc_id,
                           unnest(generate_series(1, np - 1, 2)) AS p
                    FROM np)),
            chr AS (
                SELECT c.doc_id, chapter_seq, title, first_page,
                       coalesce(
                           lead(first_page) OVER (
                               PARTITION BY c.doc_id
                               ORDER BY chapter_seq) - 1,
                           n.np - 1) AS last_page
                FROM ch c JOIN np n ON c.doc_id = n.doc_id),
            agg AS (
                SELECT c.doc_id, chapter_seq, title, first_page, last_page,
                       count(*) AS n_blocks, sum(chars) AS n_chars
                FROM chr c JOIN blk b
                  ON b.doc_id = c.doc_id
                 AND b.page BETWEEN c.first_page AND c.last_page
                GROUP BY c.doc_id, chapter_seq, title, first_page,
                         last_page)
            SELECT doc_id, chapter_seq::INT AS chapter_seq, title,
                   first_page::INT AS first_page,
                   last_page::INT AS last_page,
                   n_blocks::BIGINT AS n_blocks, n_chars::BIGINT AS n_chars
            FROM agg
        """,
        "graph_modularity": """
            WITH raw AS (
                SELECT 'n' || (doc_id % 20) AS s,
                       'n' || (((doc_id % 20) % 10 + 1) % 10
                               + ((doc_id % 20) - (doc_id % 20) % 10)) AS t
                FROM documents
                UNION ALL
                SELECT 'n' || (doc_id % 20),
                       'n' || ((doc_id % 20 + 10) % 20)
                FROM documents WHERE doc_id % 4 = 0),
            und AS (
                SELECT DISTINCT least(s, t) AS a, greatest(s, t) AS b
                FROM raw WHERE s <> t),
            deg AS (
                SELECT n, count(*) AS deg FROM (
                    SELECT a AS n FROM und
                    UNION ALL SELECT b FROM und) GROUP BY n),
            comm AS (
                SELECT 'n' || m AS domain,
                       CASE WHEN m >= 10 THEN 1 ELSE 0 END AS c
                FROM (SELECT DISTINCT doc_id % 20 AS m FROM documents)),
            pn AS (
                SELECT c, count(*) AS n_nodes,
                       sum(coalesce(deg, 0)) AS total_degree
                FROM comm LEFT JOIN deg ON comm.domain = deg.n
                GROUP BY c),
            intr AS (
                SELECT ca.c AS c, count(*) AS internal_edges
                FROM und
                JOIN comm ca ON und.a = ca.domain
                JOIN comm cb ON und.b = cb.domain
                WHERE ca.c = cb.c GROUP BY ca.c),
            m AS (SELECT count(*) AS mm FROM und),
            g AS (
                SELECT c, n_nodes,
                       coalesce(internal_edges, 0) AS ie, total_degree
                FROM pn LEFT JOIN intr USING (c)),
            qq AS (
                SELECT c, n_nodes, ie, total_degree,
                       CASE WHEN mm > 0 THEN
                           round((ie::DOUBLE / mm::DOUBLE
                                  - (total_degree::DOUBLE
                                     / (2.0 * mm::DOUBLE))
                                    * (total_degree::DOUBLE
                                       / (2.0 * mm::DOUBLE))) * 1e6,
                                 0)::BIGINT
                       ELSE 0 END AS qm
                FROM g, m),
            tot AS (
                SELECT round(sum(qm)::DOUBLE / 1e6, 6) + 0.0 AS modularity
                FROM qq)
            SELECT c AS community, n_nodes::BIGINT AS n_nodes,
                   ie::BIGINT AS internal_edges,
                   total_degree::BIGINT AS total_degree,
                   round(qm::DOUBLE / 1e6, 6) + 0.0 AS q_contrib,
                   modularity
            FROM qq, tot
        """,
        "proportion_test": """
            WITH d AS (
                SELECT (doc_id % 2)::VARCHAR AS g,
                       CASE WHEN ((doc_id * 13) % 100)
                                 < (55 + 13 * (doc_id % 2))
                            THEN 1 ELSE 0 END AS s
                FROM documents),
            c AS (
                SELECT
                    sum(CASE WHEN g = '0' THEN 1 ELSE 0 END) AS n_a,
                    sum(CASE WHEN g = '1' THEN 1 ELSE 0 END) AS n_b,
                    sum(CASE WHEN g = '0' THEN s ELSE 0 END) AS pos_a,
                    sum(CASE WHEN g = '1' THEN s ELSE 0 END) AS pos_b
                FROM d),
            z AS (
                SELECT n_a, n_b,
                       pos_a::DOUBLE / n_a::DOUBLE AS ra,
                       pos_b::DOUBLE / n_b::DOUBLE AS rb,
                       (pos_a + pos_b)::DOUBLE / (n_a + n_b)::DOUBLE AS pp
                FROM c),
            v AS (
                SELECT n_a, n_b, ra, rb,
                       pp * (1.0 - pp)
                           * (1.0 / n_a::DOUBLE + 1.0 / n_b::DOUBLE)
                           AS var
                FROM z)
            SELECT '0' AS group_a, '1' AS group_b,
                   n_a::BIGINT AS n_a, n_b::BIGINT AS n_b,
                   round(ra, 6) + 0.0 AS rate_a,
                   round(rb, 6) + 0.0 AS rate_b,
                   CASE WHEN var > 0
                        THEN round((ra - rb) / sqrt(var), 6) + 0.0
                   END AS z,
                   CASE WHEN var > 0 THEN
                       abs((ra - rb) / sqrt(var))
                           > 1.959963984540054::DOUBLE
                   ELSE FALSE END AS significant
            FROM v
        """,
        "snapshot_expiry": """
            WITH man AS (
                SELECT DISTINCT snap, path FROM (
                    SELECT doc_id % 5 AS snap,
                           'f' || (doc_id % 40) AS path
                    FROM documents
                    UNION ALL
                    SELECT (doc_id * 3) % 5, 'f' || (doc_id % 40)
                    FROM documents)),
            cut AS (
                SELECT min(s) AS cut FROM (
                    SELECT DISTINCT snap AS s FROM man
                    ORDER BY s DESC LIMIT 2)),
            per AS (
                SELECT path, max(snap) AS last_snapshot,
                       count(*) AS n_refs,
                       max(CASE WHEN snap >= cut THEN 1 ELSE 0 END) AS kept
                FROM man, cut GROUP BY path)
            SELECT path, last_snapshot::BIGINT AS last_snapshot,
                   n_refs::BIGINT AS n_refs,
                   kept = 1 AS referenced_by_kept,
                   CASE WHEN kept = 1 THEN 'keep' ELSE 'delete' END
                       AS action
            FROM per
        """,
        "extract_lists": """
            WITH d AS (SELECT doc_id AS i FROM documents),
            rows_ AS (
                SELECT i, 0 AS list_id, FALSE AS ordered, 0 AS item_id,
                       2 AS n_items, 'alpha' AS item_text
                FROM d WHERE i % 4 = 0
                UNION ALL SELECT i, 0, FALSE, 1, 2, 'beta'
                FROM d WHERE i % 4 = 0
                UNION ALL SELECT i, 1, TRUE, 0, 1, 'one'
                FROM d WHERE i % 4 = 0
                UNION ALL SELECT i, 0, TRUE, 0, 3, 'x'
                FROM d WHERE i % 4 = 1
                UNION ALL SELECT i, 0, TRUE, 1, 3, 'y'
                FROM d WHERE i % 4 = 1
                UNION ALL SELECT i, 0, TRUE, 2, 3, 'z'
                FROM d WHERE i % 4 = 1
                UNION ALL SELECT i, 0, FALSE, 0, 1, 'unclosed item closed'
                FROM d WHERE i % 4 = 3)
            SELECT i AS doc_id, list_id::INT AS list_id, ordered,
                   item_id::INT AS item_id, n_items::INT AS n_items,
                   item_text
            FROM rows_
        """,
        "change_rate": """
            WITH obs AS (
                SELECT DISTINCT
                       'u' || (doc_id % 50) AS url,
                       doc_id % 6 AS snap,
                       md5('c' || (doc_id % 50) || ':'
                           || ((doc_id % 6) // 2)) AS h
                FROM documents),
            lagged AS (
                SELECT url, h,
                       lag(h) OVER (PARTITION BY url ORDER BY snap) AS ph
                FROM obs),
            per AS (
                SELECT url, count(*) AS n_obs,
                       sum(CASE WHEN ph IS NOT NULL AND ph <> h
                                THEN 1 ELSE 0 END) AS n_changes
                FROM lagged GROUP BY url)
            SELECT url, n_obs::BIGINT AS n_obs,
                   n_changes::BIGINT AS n_changes,
                   CASE WHEN n_obs > 1 THEN
                       round(n_changes::DOUBLE / (n_obs - 1)::DOUBLE, 6)
                           + 0.0
                   END AS change_rate
            FROM per
        """,
        "skipgram_pairs": """
            WITH toks AS (
                SELECT doc_id,
                       regexp_extract_all(lower(text), '[a-zà-öø-ÿ]+') AS ws
                FROM documents),
            pos AS (
                SELECT doc_id, ws, unnest(generate_series(1, len(ws))) AS i
                FROM toks),
            pr AS (
                SELECT doc_id, ws, i,
                       unnest(generate_series(
                           i + 1, least(i + 3, len(ws)))) AS j
                FROM pos),
            pairs AS (
                SELECT least(ws[i], ws[j]) AS term_a,
                       greatest(ws[i], ws[j]) AS term_b
                FROM pr),
            cnt AS (
                SELECT term_a, term_b, count(*) AS n_cooc
                FROM pairs GROUP BY term_a, term_b)
            SELECT term_a, term_b, n_cooc::BIGINT AS n_cooc
            FROM cnt WHERE n_cooc >= 2
            ORDER BY n_cooc DESC, term_a, term_b LIMIT 40
        """,
        "zipf_fit": """
            WITH cnt AS (
                SELECT unnest(regexp_extract_all(lower(text),
                                                 '[a-zà-öø-ÿ]+')) AS t
                FROM documents),
            top AS (
                SELECT t, count(*)::BIGINT AS c FROM cnt
                GROUP BY t ORDER BY c DESC, t ASC LIMIT 64),
            pts AS (
                SELECT round(ln(row_number() OVER (ORDER BY c DESC, t ASC))
                             * 1e9)::HUGEINT AS x,
                       round(ln(c) * 1e9)::HUGEINT AS y
                FROM top),
            s AS (
                SELECT count(*)::BIGINT AS k, sum(x) AS sx, sum(y) AS sy,
                       sum(x * y) AS sxy, sum(x * x) AS sxx
                FROM pts)
            SELECT k::INTEGER AS n_terms,
                   CASE WHEN k::DOUBLE * sxx::DOUBLE
                             - sx::DOUBLE * sx::DOUBLE <> 0 THEN
                   round((k::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE)
                         / (k::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE),
                         6) END AS slope,
                   CASE WHEN k::DOUBLE * sxx::DOUBLE
                             - sx::DOUBLE * sx::DOUBLE <> 0 THEN
                   round(((sy::DOUBLE
                           - ((k::DOUBLE * sxy::DOUBLE
                               - sx::DOUBLE * sy::DOUBLE)
                              / (k::DOUBLE * sxx::DOUBLE
                                 - sx::DOUBLE * sx::DOUBLE)) * sx::DOUBLE)
                          / k::DOUBLE) / 1e9, 6) END AS intercept
            FROM s
        """,
        "dict_compression": _dict_compression_oracle(),
        # NB replay core + the same integer Mann-Whitney eval aggregation
        "classifier_eval": _NB_SQL_CORE + """,
            ev AS (
                SELECT (cf - ct)::BIGINT AS margin,
                       doc_id % 2 = 0 AS truth
                FROM pivoted WHERE doc_id % 3 = 1
            ),
            per AS (
                SELECT margin,
                       sum(CASE WHEN truth THEN 1 ELSE 0 END)::BIGINT AS np,
                       sum(CASE WHEN truth THEN 0 ELSE 1 END)::BIGINT AS nn
                FROM ev GROUP BY margin
            ),
            cum AS (
                SELECT *, coalesce(sum(nn) OVER (
                    ORDER BY margin
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                    0) AS cb
                FROM per
            ),
            agg AS (
                SELECT sum(np)::BIGINT AS n_pos, sum(nn)::BIGINT AS n_neg,
                       sum(CASE WHEN margin > 0 THEN np ELSE 0 END)::BIGINT
                           AS tp,
                       sum(CASE WHEN margin > 0 THEN nn ELSE 0 END)::BIGINT
                           AS fp,
                       sum(CASE WHEN margin <= 0 THEN nn ELSE 0 END)::BIGINT
                           AS tn,
                       sum(CASE WHEN margin <= 0 THEN np ELSE 0 END)::BIGINT
                           AS fn,
                       sum(np * (2 * cb + nn))::BIGINT AS u2
                FROM cum
            )
            SELECT n_pos, n_neg, tp, fp, tn, fn,
                   CASE WHEN tp + fp > 0
                        THEN round(tp / (tp + fp), 6) END AS precision,
                   CASE WHEN n_pos > 0
                        THEN round(tp / n_pos, 6) END AS recall,
                   CASE WHEN tp + fp > 0 AND n_pos > 0
                        THEN round(2 * tp / (2 * tp + fp + fn), 6) END AS f1,
                   CASE WHEN n_pos > 0 AND n_neg > 0
                        THEN round(u2::DOUBLE / (2 * n_pos * n_neg), 6)
                   END AS auc
            FROM agg
        """,
        # independent algorithm: positional rows (parallel unnest) +
        # within-doc self-join; position BASE (0- vs 1-) cancels in the
        # difference.
        "proximity_search": """
            WITH tok AS (
                SELECT doc_id, unnest(tk) AS tk,
                       unnest(generate_series(1, len(tk))) AS pos
                FROM (
                    SELECT doc_id,
                           regexp_extract_all(lower(text),
                                              '[a-zà-öø-ÿ]+') AS tk
                    FROM documents)
            )
            SELECT a.doc_id, min(abs(a.pos - b.pos))::INTEGER AS min_dist
            FROM tok a JOIN tok b USING (doc_id)
            WHERE a.tk = 'spark' AND b.tk = 'window'
            GROUP BY a.doc_id
            HAVING min(abs(a.pos - b.pos)) <= 12
        """,
        "lang_spans": _lang_spans_oracle(),
        # Covariance from integer-nano moment sums: per-product
        # round-half-away nanos summed as BIGINT (order-independent),
        # final formula shape mirrored exactly.
        "embedding_covariance": """
            WITH x AS (
                SELECT vec_id, unnest(embedding)::DOUBLE AS v,
                       unnest(generate_series(1, len(embedding))) AS i
                FROM embeddings
            ),
            n AS (SELECT count(*)::BIGINT AS n FROM embeddings),
            sv AS (
                SELECT i, sum(round(v * 1e9)::BIGINT) AS svn
                FROM x GROUP BY i
            ),
            sp AS (
                SELECT a.i AS i, b.i AS j,
                       sum(round(a.v * b.v * 1e9)::BIGINT) AS spn
                FROM x a JOIN x b USING (vec_id)
                GROUP BY 1, 2
            )
            SELECT sp.i::INTEGER AS i, sp.j::INTEGER AS j,
                   -- + 0 normalizes negative zero (engines disagree)
                   round((sp.spn / 1e9) / n.n
                         - (sa.svn / 1e9 / n.n) * (sb.svn / 1e9 / n.n),
                         6) + 0 AS cov
            FROM sp
            CROSS JOIN n
            JOIN sv sa ON sa.i = sp.i
            JOIN sv sb ON sb.i = sp.j
        """,
        # NB train+score replayed relationally: token buckets via the
        # 60-bit md5-prefix idiom, Laplace costs in integer micro-nats
        # (floor(x*1e6+0.5) == the driver-side Python rounding; ln is the
        # same glibc on this box), priors from class doc counts.
        "nb_classifier": _NB_SQL_CORE + """
            SELECT doc_id, n_tokens::INTEGER AS n_tokens,
                   cf::BIGINT AS cost_false_micro,
                   ct::BIGINT AS cost_true_micro,
                   ct < cf AS pred_label,
                   (cf - ct)::BIGINT AS margin_micro
            FROM pivoted
        """,
        "corpus_rollup": """
            SELECT lang, source,
                   GROUPING(lang, source)::INT AS gid,
                   count(*)::BIGINT AS n_docs,
                   sum(n_chars)::BIGINT AS total_chars,
                   ROUND(avg(n_chars), 6)::DOUBLE AS avg_chars
            FROM documents
            GROUP BY ROLLUP(lang, source)
        """,
        "sentence_stats": """
            WITH s AS (
                SELECT doc_id,
                       substr(text, 1, 40) || '. '
                       || substr(text, 41, 60) || '! '
                       || substr(text, 101, 50)
                       || CASE WHEN doc_id % 3 = 0 THEN '? Short tail.'
                               ELSE '...' END AS text
                FROM documents),
            t AS (
                SELECT doc_id,
                       list_filter(
                           list_transform(
                               regexp_extract_all(text, '[^.!?]+[.!?]*'),
                               x -> trim(x)),
                           x -> x != '') AS sents
                FROM s),
            m AS (
                SELECT doc_id, sents, len(sents) AS n,
                       list_transform(sents, x -> length(x)) AS lens
                FROM t)
            SELECT doc_id,
                   n::INT AS n_sentences,
                   CASE WHEN n > 0
                        THEN ROUND(list_sum(lens) / n::DOUBLE, 6)
                        END::DOUBLE AS avg_sentence_chars,
                   CASE WHEN n > 0 THEN list_max(lens) END::INT
                       AS max_sentence_chars,
                   CASE WHEN n > 0
                        THEN ROUND(len(list_filter(sents,
                                                   x -> length(x) < 20))
                                   / n::DOUBLE, 6)
                        END::DOUBLE AS short_sentence_ratio
            FROM m
        """,
        "dedup_paragraphs": """
            WITH src AS (
                SELECT doc_id,
                       'Shared boilerplate header unit'
                       || chr(10) || chr(10)
                       || substr(text, 1, 80) || ' tail ' || doc_id
                       || chr(10) || chr(10)
                       || 'Footer block ' || (doc_id % 7) AS text
                FROM documents),
            paras AS (
                SELECT doc_id, u.pos, u.para FROM (
                    SELECT doc_id,
                           string_split(text, chr(10) || chr(10)) AS lst
                    FROM src),
                UNNEST(list_transform(generate_series(1, len(lst)),
                                      j -> {'pos': j - 1, 'para': lst[j]}))
                    AS t(u)
                -- same unit-is-content class as the Spark side
                -- (space/tab/CR/NL), not space-only trim
                WHERE regexp_matches(u.para, '[^ \\t\\r\\n]')),
            keep AS (
                SELECT doc_id, pos, para FROM (
                    SELECT doc_id, pos, para,
                           row_number() OVER (PARTITION BY para
                                              ORDER BY doc_id, pos) AS rn
                    FROM paras)
                WHERE rn = 1),
            tot AS (
                SELECT doc_id, count(*)::BIGINT AS n_paras
                FROM paras GROUP BY doc_id),
            agg AS (
                SELECT doc_id,
                       string_agg(para, chr(10) || chr(10) ORDER BY pos)
                           AS text,
                       count(*)::BIGINT AS n_kept
                FROM keep GROUP BY doc_id)
            SELECT t.doc_id,
                   coalesce(a.text, '') AS text,
                   t.n_paras,
                   coalesce(a.n_kept, 0)::BIGINT AS n_kept
            FROM tot t LEFT JOIN agg a USING (doc_id)
        """,
        "html_outline": """
            WITH pages AS (
                SELECT doc_id,
                       '<html><body><h1 class="t">Doc ' || doc_id || '</h1>'
                       || CASE WHEN doc_id % 3 = 0
                               THEN '<h2> Intro <em>' || doc_id
                                    || '</em></h2><p>xx</p><h2>Methods</h2>'
                               WHEN doc_id % 3 = 1 THEN '<H2>Only</H2>'
                               ELSE '' END
                       || CASE WHEN doc_id % 4 = 0
                               THEN '<h3>Deep ' || (doc_id % 5) || '</h3 >'
                               ELSE '' END
                       || '</body></html>' AS html
                FROM documents),
            hm AS (
                SELECT doc_id, u.pos, u.m FROM (
                    SELECT doc_id,
                           regexp_extract_all(html,
                               '(?is)<h[1-6][^>]*>.*?</h[1-6]\\s*>') AS lst
                    FROM pages),
                UNNEST(list_transform(generate_series(1, len(lst)),
                                      j -> {'pos': j - 1, 'm': lst[j]}))
                    AS t(u))
            SELECT doc_id, pos::INT AS pos,
                   regexp_extract(m, '(?i)<h([1-6])', 1)::INT AS level,
                   trim(regexp_replace(regexp_replace(m,
                        '(?s)<[^>]*>', ' ', 'g'), '\\s+', ' ', 'g'))
                       AS heading
            FROM hm
        """,
        "html_tables": """
            WITH pages AS (
                SELECT doc_id,
                       '<html><body><table id="t">'
                       || '<tr><th>Name</th><th> Value </th></tr>'
                       || '<tr><td>a' || doc_id
                       || '</td><td><b>bold</b> ' || (doc_id % 9)
                       || '</td></tr>'
                       || CASE WHEN doc_id % 3 >= 1
                               THEN '<tr ><td>x</td><td>y</td></tr>'
                               ELSE '' END
                       || CASE WHEN doc_id % 3 = 2
                               THEN '<tr><td colspan=2>wide '
                                    || (doc_id % 4) || '</td></tr>'
                               ELSE '' END
                       || '</table>'
                       || CASE WHEN doc_id % 4 = 0
                               THEN '<table><tr><td>z</td></tr></table >'
                               ELSE '' END
                       || '</body></html>' AS html
                FROM documents),
            tb AS (
                SELECT doc_id, u.table_id, u.t FROM (
                    SELECT doc_id,
                           regexp_extract_all(html,
                               '(?is)<table[^>]*>.*?</table\\s*>') AS lst
                    FROM pages),
                UNNEST(list_transform(generate_series(1, len(lst)),
                                      j -> {'table_id': j - 1,
                                            't': lst[j]})) AS x(u)),
            rw AS (
                SELECT doc_id, table_id, u.row_id, u.r FROM (
                    SELECT doc_id, table_id,
                           regexp_extract_all(t,
                               '(?is)<tr[^>]*>(.*?)</tr\\s*>', 1) AS lst
                    FROM tb),
                UNNEST(list_transform(generate_series(1, len(lst)),
                                      j -> {'row_id': j - 1,
                                            'r': lst[j]})) AS x(u)),
            cl AS (
                SELECT doc_id, table_id, row_id,
                       list_transform(
                           regexp_extract_all(r,
                               '(?is)<t[dh][^>]*>(.*?)</t[dh]\\s*>', 1),
                           x -> trim(regexp_replace(regexp_replace(x,
                                '(?s)<[^>]*>', ' ', 'g'), '\\s+', ' ', 'g')))
                           AS cells
                FROM rw)
            SELECT doc_id, table_id::INT AS table_id, row_id::INT AS row_id,
                   len(cells)::INT AS n_cells,
                   array_to_string(cells, '|') AS cells
            FROM cl
        """,
        # robots.txt star-group parsing replayed arithmetically from the
        # residue rules the fixture encodes (r%3==2 domains have no star
        # group and are absent)
        "robots_rules": """
            WITH rs AS (SELECT DISTINCT doc_id % 13 AS r FROM documents)
            SELECT 'site' || r || '.example' AS domain,
                   CASE WHEN r % 3 = 0
                        THEN '/private' || r || '/|/tmp' || r || '*x'
                        ELSE '/only' || r || '/' END AS rules,
                   CASE WHEN r % 3 = 1 THEN 2.0 END::DOUBLE AS crawl_delay
            FROM rs WHERE r % 3 IN (0, 1)
        """,
        # the politeness gate: blocked iff the path case hits the domain's
        # star-group Disallow set (incl. the conservative /tmp{r} wildcard
        # prefix)
        "robots_gate": """
            WITH p AS (
                SELECT doc_id, doc_id % 13 AS r, doc_id % 4 AS m,
                       'https://sub' || (doc_id % 7) || '.site'
                       || (doc_id % 13) || '.example' ||
                       CASE doc_id % 4
                           WHEN 0 THEN '/private' || (doc_id % 13) || '/p'
                                       || doc_id || '.html'
                           WHEN 1 THEN '/ok/p' || doc_id || '.html'
                           WHEN 2 THEN '/only' || (doc_id % 13) || '/x'
                           ELSE '/tmp' || (doc_id % 13) || 'zz'
                       END AS url
                FROM documents)
            SELECT doc_id, url FROM p
            WHERE NOT ((r % 3 = 0 AND m IN (0, 3)) OR (r % 3 = 1 AND m = 2))
        """,
        # anchor extraction replayed arithmetically (two surviving anchors
        # per page: the tag-stripped external one, the resolved local one)
        "anchor_texts": """
            WITH src AS (
                SELECT doc_id AS i,
                       'https://sub' || (doc_id % 7) || '.site'
                       || (doc_id % 13) || '.example' AS origin,
                       'https://sub' || (doc_id % 7) || '.site'
                       || (doc_id % 13) || '.example/a/page' || doc_id
                       || '.html' AS url
                FROM documents)
            SELECT url, target, anchor FROM (
                SELECT url,
                       'https://t' || (i % 3) || '.example/x' || (i % 5)
                           AS target,
                       'Guide ' || (i % 4) AS anchor
                FROM src
                UNION ALL
                SELECT url, origin || '/p' || i, 'Local ' || (i % 2)
                FROM src)
        """,
        # the per-domain top-2 replay: same counts, same (count desc,
        # lexical) tie-break
        "top_anchors": """
            WITH a AS (
                SELECT 't' || (doc_id % 3) || '.example' AS domain,
                       'Guide ' || (doc_id % 4) AS anchor
                FROM documents
                UNION ALL
                SELECT 'site' || (doc_id % 13) || '.example',
                       'Local ' || (doc_id % 2)
                FROM documents),
            c AS (SELECT domain, anchor, COUNT(*) AS n_refs
                  FROM a GROUP BY domain, anchor)
            SELECT domain, anchor, n_refs, rank FROM (
                SELECT domain, anchor, n_refs,
                       ROW_NUMBER() OVER (PARTITION BY domain
                           ORDER BY n_refs DESC, anchor) AS rank
                FROM c)
            WHERE rank <= 2
        """,
        # publisher-declared dedup replayed: cluster by declared canonical
        # (or self), keep the canonical member else the lexical min
        "canonical_dedup": """
            WITH p AS (
                SELECT doc_id, 'https://d.example/p' || doc_id AS url,
                       CASE WHEN doc_id % 3 = 1
                            THEN 'https://d.example/p' || (doc_id - 1)
                            WHEN doc_id % 3 = 2
                            THEN 'https://x.example/shared' END AS canon
                FROM documents),
            c AS (SELECT doc_id, url, COALESCE(canon, url) AS cluster FROM p)
            SELECT doc_id, url FROM (
                SELECT doc_id, url,
                       ROW_NUMBER() OVER (PARTITION BY cluster
                           ORDER BY (url = cluster) DESC, url) AS rn
                FROM c)
            WHERE rn = 1
        """,
        "page_meta": """
            SELECT doc_id,
                   'Doc ' || doc_id AS title,
                   (doc_id % 6) IN (0, 2, 4, 5) AS noindex,
                   (doc_id % 6) IN (0, 1, 4, 5) AS nofollow,
                   CASE WHEN doc_id % 3 = 0
                        THEN 'https://c.example/p' || doc_id
                        ELSE NULL END AS canonical
            FROM documents
        """,
        # outlink resolution replayed arithmetically: the synthetic pages
        # are pure functions of doc_id, so the expected (url, target) set
        # is constructed directly — any regex/when-chain bug on the Spark
        # side (missed quote form, wrong base join, undropped mailto)
        # breaks the hash
        "page_outlinks": """
            WITH src AS (
                SELECT doc_id AS i,
                       'https://sub' || (doc_id % 7) || '.site'
                       || (doc_id % 13) || '.example/dir' || (doc_id % 3)
                       || '/page' || doc_id || '.html' AS url
                FROM documents)
            SELECT url, target FROM (
                SELECT url,
                       'https://ext' || (i % 5) || '.example.org/x' || i
                           AS target
                FROM src
                UNION ALL
                SELECT url, 'https://cdn' || (i % 2) || '.example.net/y'
                FROM src
                UNION ALL
                SELECT url,
                       'https://sub' || (i % 7) || '.site' || (i % 13)
                       || '.example/root' || (i % 4) || '.html'
                FROM src
                UNION ALL
                SELECT url,
                       'https://sub' || (i % 7) || '.site' || (i % 13)
                       || '.example/dir' || (i % 3) || '/rel' || (i % 6)
                       || '.html'
                FROM src
                UNION ALL
                SELECT url,
                       'https://sub' || (i % 7) || '.site' || (i % 13)
                       || '.example/dir' || (i % 3) || '/uq' || (i % 6)
                       || '.html'
                FROM src)
        """,
        # fused gate: the gopher feats and repetition replicas joined, with
        # keep_all computed from the ROUNDED ratios exactly as the Spark
        # out_cols do — verifies the zero-shuffle arrow engine end-to-end
        "quality_gate": r"""
            WITH w AS (
                SELECT doc_id, text,
                       regexp_split_to_array(trim(text), '\s+') AS words,
                       list_filter(string_split(text, chr(10)),
                                   l -> regexp_matches(l, '[^ \t\r]')) AS lines
                FROM documents),
            feats AS (
                SELECT doc_id,
                    len(words) AS n_words,
                    list_aggregate(list_transform(words, x -> length(x)),
                                   'sum')::DOUBLE
                        / greatest(len(words), 1) AS mean_wlen,
                    (length(text) - length(replace(text, '#', ''))
                     + len(regexp_extract_all(text, '\.\.\.')))::DOUBLE
                        / greatest(len(words), 1) AS symbol_ratio,
                    len(list_filter(lines,
                        l -> regexp_matches(l, '^\s*[•\-\*]')))::DOUBLE
                        / greatest(len(lines), 1) AS bullet_ratio,
                    len(list_filter(lines,
                        l -> regexp_matches(l, '\.\.\.\s*$')))::DOUBLE
                        / greatest(len(lines), 1) AS ellipsis_ratio,
                    len(list_filter(words,
                        x -> regexp_matches(x, '[A-Za-zÀ-ÖØ-öø-ÿ]')))::DOUBLE
                        / greatest(len(words), 1) AS alpha_ratio,
                    len(list_intersect(
                        list_distinct(regexp_extract_all(lower(text),
                                                         '[a-zà-öø-ÿ]+')),
                        ['the','be','to','of','and','that','have','with']))
                        AS stop_hits
                FROM w),
            verdicts AS (
                SELECT doc_id,
                       (n_words BETWEEN 20 AND 100000
                        AND mean_wlen BETWEEN 3.0 AND 10.0
                        AND symbol_ratio < 0.1
                        AND bullet_ratio < 0.9
                        AND ellipsis_ratio < 0.3
                        AND alpha_ratio > 0.8
                        AND stop_hits >= 2) AS keep
                FROM feats),
            base AS (
                SELECT doc_id, length(text) AS n_chars,
                       len(lines) AS n_lines,
                       len(list_distinct(lines)) AS n_dlines,
                       coalesce(list_aggregate(list_transform(lines,
                           l -> length(l)), 'sum'), 0) AS chars,
                       coalesce(list_aggregate(list_transform(
                           list_distinct(lines), l -> length(l)), 'sum'), 0)
                           AS dchars
                FROM w),
            grams AS (
                SELECT doc_id,
                       unnest(list_transform(
                           generate_series(1, len(words) - 1),
                           i -> words[i] || ' ' || words[i + 1])) AS gram
                FROM w WHERE len(words) >= 2),
            counts AS (
                SELECT doc_id, gram, count(*) AS cnt
                FROM grams GROUP BY doc_id, gram),
            top AS (
                SELECT doc_id, cnt * length(gram) AS covered
                FROM (SELECT doc_id, gram, cnt,
                             row_number() OVER (PARTITION BY doc_id
                                 ORDER BY cnt DESC, gram ASC) AS rn
                      FROM counts)
                WHERE rn = 1),
            reps AS (
                SELECT b.doc_id,
                       CASE WHEN n_lines > 0 THEN
                            round((n_lines - n_dlines)::DOUBLE / n_lines, 4)
                       ELSE 0.0 END AS dup_line_ratio,
                       CASE WHEN chars > 0 THEN
                            round((chars - dchars)::DOUBLE / chars, 4)
                       ELSE 0.0 END AS dup_line_char_ratio,
                       round(coalesce(t.covered::DOUBLE
                                      / greatest(b.n_chars, 1), 0.0), 4)
                           AS top_bigram_char_ratio
                FROM base b LEFT JOIN top t ON t.doc_id = b.doc_id)
            SELECT v.doc_id, v.keep,
                   r.dup_line_ratio, r.dup_line_char_ratio,
                   r.top_bigram_char_ratio,
                   (v.keep AND r.dup_line_char_ratio < 0.2
                    AND r.top_bigram_char_ratio < 0.2) AS keep_all
            FROM verdicts v JOIN reps r ON r.doc_id = v.doc_id
        """,
        # Same line/bigram constructions in DuckDB; top bigram by
        # (count desc, gram asc) — overlapping occurrences counted, so the
        # coverage ratio can exceed 1 by construction (both engines agree).
        "repetition_signals": r"""
            WITH lined AS (
                SELECT doc_id, text,
                       list_filter(string_split(text, chr(10)),
                                   l -> regexp_matches(l, '[^ \t\r]')) AS lines
                FROM documents),
            base AS (
                SELECT doc_id, text, length(text) AS n_chars,
                       len(lines) AS n_lines,
                       len(list_distinct(lines)) AS n_dlines,
                       coalesce(list_aggregate(list_transform(lines,
                           l -> length(l)), 'sum'), 0) AS chars,
                       coalesce(list_aggregate(list_transform(
                           list_distinct(lines), l -> length(l)), 'sum'), 0)
                           AS dchars
                FROM lined),
            words AS (
                SELECT doc_id,
                       regexp_split_to_array(trim(text), '\s+') AS w
                FROM documents),
            grams AS (
                SELECT doc_id,
                       unnest(list_transform(
                           generate_series(1, len(w) - 1),
                           i -> w[i] || ' ' || w[i + 1])) AS gram
                FROM words WHERE len(w) >= 2),
            counts AS (
                SELECT doc_id, gram, count(*) AS cnt
                FROM grams GROUP BY doc_id, gram),
            top AS (
                SELECT doc_id, cnt * length(gram) AS covered
                FROM (SELECT doc_id, gram, cnt,
                             row_number() OVER (PARTITION BY doc_id
                                 ORDER BY cnt DESC, gram ASC) AS rn
                      FROM counts)
                WHERE rn = 1)
            SELECT b.doc_id,
                   CASE WHEN n_lines > 0 THEN
                        round((n_lines - n_dlines)::DOUBLE / n_lines, 4)
                   ELSE 0.0 END AS dup_line_ratio,
                   CASE WHEN chars > 0 THEN
                        round((chars - dchars)::DOUBLE / chars, 4)
                   ELSE 0.0 END AS dup_line_char_ratio,
                   round(coalesce(t.covered::DOUBLE
                                  / greatest(b.n_chars, 1), 0.0), 4)
                       AS top_bigram_char_ratio
            FROM base b LEFT JOIN top t ON t.doc_id = b.doc_id
        """,
        # Every canonicalization rule replayed in RE2 (fragment, lowercase
        # scheme+host, default ports, tracking params, param sort, empty
        # path -> /).
        "url_canonical": r"""
            WITH built AS (
                SELECT doc_id,
                       'HTTP://Example.COM'
                       || CASE WHEN doc_id % 2 = 0 THEN ':80' ELSE '' END
                       || '/Path/' || CAST(doc_id AS VARCHAR)
                       || CASE WHEN doc_id % 3 = 0
                               THEN '?utm_source=feed&b=2&a=1'
                               WHEN doc_id % 3 = 1
                               THEN '?z=9&a=1&fbclid=XYZ'
                               ELSE '' END
                       || CASE WHEN doc_id % 5 = 0 THEN '#frag' ELSE '' END
                           AS url
                FROM documents),
            s1 AS (SELECT doc_id, regexp_replace(url, '#.*$', '') AS u
                   FROM built),
            s2 AS (SELECT doc_id, u,
                          regexp_extract(u,
                              '^([A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*)', 1)
                              AS head0
                   FROM s1),
            s3 AS (SELECT doc_id,
                          regexp_replace(regexp_replace(lower(head0),
                              '^(http://[^:/]*):80$', '\1'),
                              '^(https://[^:/]*):443$', '\1') AS head,
                          substr(u, length(head0) + 1) AS rest
                   FROM s2),
            s4 AS (SELECT doc_id, head,
                          regexp_extract(rest, '^([^?]*)', 1) AS path,
                          regexp_extract(rest, '^[^?]*\?(.*)$', 1) AS query
                   FROM s3),
            s5 AS (SELECT doc_id, head, path,
                          array_to_string(list_sort(list_filter(
                              string_split(query, '&'),
                              p -> p <> '' AND NOT regexp_matches(p,
                                  '^(utm_[^=]*|fbclid|gclid|msclkid|mc_eid)='))),
                              '&') AS qs
                   FROM s4)
            SELECT doc_id,
                   head || CASE WHEN path = '' THEN '/' ELSE path END
                        || CASE WHEN qs <> '' THEN '?' || qs ELSE '' END
                       AS canon_url
            FROM s5
        """,
        # md5-bucket split arithmetic replayed exactly (2^60 divisor, same
        # cumulative thresholds — exactly-representable doubles by choice).
        "corpus_splits": """
            SELECT doc_id,
                   CASE WHEN u < 0.5 THEN 'train'
                        WHEN u < 0.75 THEN 'val'
                        ELSE 'test' END AS split
            FROM (
                SELECT doc_id,
                       ('0x' || substr(md5('split:' || CAST(doc_id AS VARCHAR)),
                                       1, 15))::BIGINT
                       / 1152921504606846976.0 AS u
                FROM documents)
        """,
        # Replay of the CCNet line dedup: keyed on the LINE VALUE (exact,
        # collision-free), same (doc_id, pos) first-occurrence rule, same
        # blank passthrough and reassembly order, over the recrawl CTE.
        "dedup_lines": """
            WITH corpus AS (
                SELECT doc_id, text FROM documents
                UNION ALL
                SELECT doc_id + 1000000, regexp_replace(text, '\\s+\\S+\\s*$', '')
                FROM documents
            ), lines AS (
                SELECT doc_id, u.pos, u.ln FROM (
                    SELECT doc_id, string_split(text, chr(10)) AS lst FROM corpus
                ), UNNEST(list_transform(generate_series(1, len(lst)),
                                         j -> {'pos': j - 1, 'ln': lst[j]})) AS t(u)
            ), nb AS (
                SELECT doc_id, pos, ln
                FROM lines WHERE regexp_matches(ln, '[^ \\t\\r]')
            ), firsts AS (
                SELECT doc_id, pos, ln FROM (
                    SELECT doc_id, pos, ln,
                           row_number() OVER (PARTITION BY ln
                                              ORDER BY doc_id, pos) AS rn
                    FROM nb)
                WHERE rn = 1
            ), kept AS (
                SELECT doc_id, pos, ln FROM firsts
                UNION ALL
                SELECT doc_id, pos, ln FROM lines
                WHERE NOT regexp_matches(ln, '[^ \\t\\r]')
            ), reb AS (
                SELECT doc_id,
                       string_agg(ln, chr(10) ORDER BY pos) AS text,
                       count(*)::BIGINT AS n_kept
                FROM kept GROUP BY doc_id
            ), tot AS (
                SELECT doc_id, count(*)::BIGINT AS n_lines FROM lines GROUP BY doc_id
            )
            SELECT t.doc_id,
                   md5(coalesce(r.text, '')) AS dedup_md5,
                   t.n_lines,
                   coalesce(r.n_kept, 0)::BIGINT AS n_kept
            FROM tot t LEFT JOIN reb r USING (doc_id)
        """,
        # Reconstruct every parsed-WARC field from documents: url/date are
        # pure functions of doc_id, payload md5/bytes of text.
        # Domain language mix: counts + (n desc, lang) window replay.
        "domain_lang_mix": """
            WITH pages AS (
                SELECT 'site' || CAST(doc_id % 13 AS VARCHAR) || '.com'
                           AS domain,
                       CASE WHEN doc_id % 11 = 0 THEN 'zz' ELSE lang END
                           AS lang
                FROM documents
            ), counts AS (
                SELECT domain, lang, count(*)::BIGINT AS n
                FROM pages GROUP BY domain, lang
            ), ranked AS (
                SELECT domain, lang, n,
                       row_number() OVER (PARTITION BY domain
                           ORDER BY n DESC, lang ASC NULLS LAST) AS r,
                       sum(n) OVER (PARTITION BY domain) AS tot
                FROM counts
            )
            SELECT domain, tot::BIGINT AS n_docs, lang AS majority_lang,
                   n AS n_majority,
                   round(n / tot::DOUBLE, 6) AS consistency,
                   (round(n / tot::DOUBLE, 6) < 0.8) AS is_mixed
            FROM ranked WHERE r = 1
        """,
        # Feed items: the fixture rows reconstruct arithmetically (the
        # page_meta arithmetic-replay convention) — two RSS items per 3k
        # page (orphan drops), one Atom entry per 3k+1 page.
        "feed_items": """
            WITH d AS (
                SELECT CAST(doc_id AS VARCHAR) AS s, doc_id % 3 AS r
                FROM documents
            )
            SELECT 'https://feed.example/f' || s AS url,
                   'Post ' || s || 'a' AS item_title,
                   'https://feed.example/' || s || '/a' AS item_link,
                   'rss' AS kind
            FROM d WHERE r = 0
            UNION ALL
            SELECT 'https://feed.example/f' || s,
                   'Post ' || s || 'b',
                   'https://feed.example/' || s || '/b', 'rss'
            FROM d WHERE r = 0
            UNION ALL
            SELECT 'https://feed.example/f' || s,
                   'Entry ' || s,
                   'https://feed.example/' || s || '/atom', 'atom'
            FROM d WHERE r = 1
        """,
        # hreflang alternates: arithmetic replay — de (uppercased in the
        # page, folded) + fr (reversed attribute order) per page; the
        # stylesheet and hreflang-less alternates contribute nothing.
        "hreflang_alternates": """
            WITH d AS (
                SELECT CAST(doc_id AS VARCHAR) AS s FROM documents
            )
            SELECT 'https://x.example/en/' || s AS url, 'de' AS hreflang,
                   'https://x.example/de/' || s AS href
            FROM d
            UNION ALL
            SELECT 'https://x.example/en/' || s, 'fr',
                   'https://x.example/fr/' || s
            FROM d
        """,
        # Mojibake repair: golden-VALUES pure-Python replay per residue
        # class (the compression_ratio convention).
        "repair_mojibake": _mojibake_oracle(),
        # AMP twins: arithmetic replay of both edge directions.
        "amp_pairs": """
            WITH d AS (
                SELECT CAST(doc_id AS VARCHAR) AS s, doc_id % 3 AS r
                FROM documents
            )
            SELECT 'https://e/p' || s AS url, FALSE AS is_amp,
                   'https://e/amp/' || s AS twin_url,
                   'amphtml' AS edge
            FROM d WHERE r = 0
            UNION ALL
            SELECT 'https://e/p' || s, TRUE, 'https://e/' || s, 'canonical'
            FROM d WHERE r = 1
        """,
        # Declared language: arithmetic replay of the precedence ladder.
        "declared_lang": """
            WITH d AS (
                SELECT CAST(doc_id AS VARCHAR) AS s, doc_id % 4 AS r
                FROM documents
            )
            SELECT 'https://e/l' || s AS url,
                   CASE r WHEN 0 THEN 'pt-br' WHEN 1 THEN 'fr, en'
                          WHEN 2 THEN 'de_de' END AS declared_lang_raw,
                   CASE r WHEN 0 THEN 'pt' WHEN 1 THEN 'fr'
                          WHEN 2 THEN 'de' END AS declared_lang,
                   CASE r WHEN 0 THEN 'html_lang' WHEN 1 THEN 'http_equiv'
                          WHEN 2 THEN 'og_locale' END AS declared_source
            FROM d
        """,
        # Shard manifest: md5-60 shard replay + ORDER BY inside
        # string_agg reproduces the sorted-concat checksum.
        "shard_manifest": r"""
            WITH h AS (
                SELECT ('0x' || substr(md5('epoch0:' ||
                           CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT AS hv,
                       coalesce(text, '') AS t
                FROM documents),
            m AS (
                SELECT (hv % 16)::INTEGER AS shard,
                       md5(t) AS dmd5,
                       length(t)::BIGINT AS chars,
                       len(regexp_extract_all(t,
                           '[A-Za-zÀ-ÖØ-öø-ÿ]+|[0-9]+|[^A-Za-zÀ-ÖØ-öø-ÿ0-9\s]'
                       ))::BIGINT AS toks
                FROM h)
            SELECT shard, count(*)::BIGINT AS n_docs,
                   sum(toks)::BIGINT AS n_tokens,
                   sum(chars)::BIGINT AS n_chars,
                   md5(string_agg(dmd5, '' ORDER BY dmd5)) AS checksum
            FROM m GROUP BY shard
        """,
        # Media perceptual dedup: golden-VALUES python replay of the
        # class fingerprints and the one-hop min-label reps.
        "media_phash_dedup": _media_phash_oracle(),
        # Lang/script mismatch: script_ratios counting classes + the
        # expected-script CASE + the abstention rule, all in SQL.
        "lang_mismatch": """
            WITH s AS (
                SELECT doc_id, lang,
                       substr(text, 1, 30)
                       || CASE WHEN doc_id % 4 = 0
                               THEN ' привет мир здравствуй'
                               WHEN doc_id % 4 = 1 THEN ' γειά σου κόσμε'
                               WHEN doc_id % 4 = 2 THEN ' 你好世界再见'
                               ELSE ' plain' END AS text
                FROM documents),
            c AS (
                SELECT doc_id, lang,
                       len(regexp_extract_all(text, '[A-Za-zÀ-ÖØ-öø-ÿĀ-ɏ]'))::INT AS n_latin,
                       len(regexp_extract_all(text, '[Ѐ-ӿ]'))::INT AS n_cyrillic,
                       len(regexp_extract_all(text, '[Ͱ-Ͽ]'))::INT AS n_greek,
                       len(regexp_extract_all(text, '[一-鿿]'))::INT AS n_cjk
                FROM s),
            e AS (
                SELECT *,
                       n_latin + n_cyrillic + n_greek + n_cjk AS total,
                       CASE lang
                            WHEN 'en' THEN 'latin' WHEN 'fr' THEN 'latin'
                            WHEN 'de' THEN 'latin' WHEN 'es' THEN 'latin'
                            WHEN 'it' THEN 'latin' WHEN 'pt' THEN 'latin'
                            WHEN 'nl' THEN 'latin' WHEN 'la' THEN 'latin'
                            WHEN 'ru' THEN 'cyrillic' WHEN 'uk' THEN 'cyrillic'
                            WHEN 'bg' THEN 'cyrillic' WHEN 'sr' THEN 'cyrillic'
                            WHEN 'el' THEN 'greek'
                            WHEN 'zh' THEN 'cjk' WHEN 'ja' THEN 'cjk'
                            END AS expected_script,
                       CASE WHEN n_latin + n_cyrillic + n_greek + n_cjk = 0
                            THEN NULL
                            WHEN n_latin >= greatest(n_cyrillic, n_greek, n_cjk)
                            THEN 'latin'
                            WHEN n_cyrillic >= greatest(n_greek, n_cjk)
                            THEN 'cyrillic'
                            WHEN n_greek >= n_cjk THEN 'greek'
                            ELSE 'cjk' END AS dominant_script
                FROM c)
            SELECT doc_id, lang, n_latin, n_cyrillic, n_greek, n_cjk,
                   dominant_script, expected_script,
                   CASE WHEN expected_script IS NULL OR total < 20
                        THEN NULL
                        ELSE dominant_script != expected_script
                        END AS mismatch
            FROM e
        """,
        # Heaps-law growth: min(batch) per type replaces the
        # cumulative-distinct scan; window sums over the 16-row result.
        "vocab_growth": """
            WITH toks AS (
                SELECT CAST(doc_id % 16 AS INT) AS batch,
                       unnest(regexp_extract_all(lower(text), '[a-zà-öø-ÿ]+'))
                           AS token
                FROM documents),
            vol AS (
                SELECT batch, count(*)::BIGINT AS batch_tokens
                FROM toks GROUP BY batch),
            first AS (
                SELECT token, min(batch) AS batch FROM toks GROUP BY token),
            fresh AS (
                SELECT batch, count(*)::BIGINT AS new_types
                FROM first GROUP BY batch),
            per AS (
                SELECT coalesce(v.batch, f.batch) AS batch,
                       coalesce(v.batch_tokens, 0)::BIGINT AS batch_tokens,
                       coalesce(f.new_types, 0)::BIGINT AS new_types
                FROM vol v FULL JOIN fresh f ON v.batch = f.batch)
            SELECT batch, batch_tokens, new_types,
                   (sum(batch_tokens) OVER w)::BIGINT AS cum_tokens,
                   (sum(new_types) OVER w)::BIGINT AS cum_types,
                   round((sum(new_types) OVER w)
                         / greatest(sum(batch_tokens) OVER w, 1)::DOUBLE,
                         6) AS type_token_ratio
            FROM per
            WINDOW w AS (ORDER BY batch
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        """,
        # Line corrections: the same drop predicates as list_filter
        # lambdas (RE2 == Java on these ASCII-keyword patterns).
        "filter_lines": """
            WITH pages AS (
                SELECT doc_id,
                       substr(text, 1, 60) || chr(10)
                       || '1,234' || chr(10) || '42 likes' || chr(10)
                       || 'HOME | ABOUT | CONTACT' || chr(10)
                       || CASE WHEN doc_id % 3 = 0
                               THEN 'Please enable JavaScript now'
                               ELSE 'A second surviving prose line follows here.'
                               END
                       || chr(10) || substr(text, 61, 40) AS text
                FROM documents),
            k AS (
                SELECT doc_id,
                       len(string_split(text, chr(10)))::INT AS n_lines,
                       list_filter(
                           string_split(text, chr(10)),
                           x -> NOT (
                               regexp_matches(x,
                                   '(?:^[0-9 .,:/%()+-]*[0-9][0-9 .,:/%()+-]*$)'
                                   || '|(?:(?i)^ *[0-9]+ *(likes?|shares?|comments?|views?|votes?|replies|points?) *$)'
                                   || '|(?:^[^a-zà-öø-ÿ]*[A-Z][^a-zà-öø-ÿ]*$)')
                               OR (length(x) < 80 AND regexp_matches(x,
                                   '(?i)(javascript|cookies?|sign in|log in|subscribe|newsletter|read more|click here|all rights reserved)'))
                           )) AS keep
                FROM pages)
            SELECT doc_id,
                   array_to_string(keep, chr(10)) AS text,
                   n_lines,
                   (n_lines - len(keep))::INT AS n_dropped,
                   round((n_lines - len(keep))
                         / greatest(n_lines, 1)::DOUBLE, 6) AS drop_ratio,
                   (round((n_lines - len(keep))
                          / greatest(n_lines, 1)::DOUBLE, 6)
                    > 0.5) AS doc_flagged
            FROM k
        """,
        # Corpus diversity: full counts-of-counts replay — integer-exact
        # rank sums (HUGEINT vs decimal(38,0)) and micro-nat entropy
        # terms keep both engines order-independent.
        "corpus_diversity": """
            WITH pages AS (
                SELECT 'site' || CAST(least(doc_id % 16, doc_id % 7)
                                      AS VARCHAR) AS domain
                FROM documents),
            counts AS (
                SELECT domain, count(*)::BIGINT AS n
                FROM pages GROUP BY domain),
            cc AS (
                SELECT n, count(*)::BIGINT AS cnt FROM counts GROUP BY n),
            staged AS (
                SELECT n, cnt,
                       sum(cnt) OVER (ORDER BY n
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                           - cnt AS off,
                       sum(cnt) OVER (ORDER BY n DESC
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                           AS cum_desc
                FROM cc),
            agg AS (
                SELECT sum(n * cnt)::BIGINT AS n_pages,
                       sum(cnt)::BIGINT AS n_groups,
                       sum((n::HUGEINT) * cnt * (2 * off + cnt + 1))
                           AS rank_sum2,
                       max(n) AS max_n,
                       sum(greatest(least(10, cum_desc)
                                    - (cum_desc - cnt), 0) * n)::BIGINT
                           AS top_n_pages,
                       sum(round(ln(n) * 1e6)::HUGEINT * n * cnt)
                           AS nlogn_micro
                FROM staged),
            ent AS (
                SELECT *,
                       round(ln(n_pages::DOUBLE)
                             - (nlogn_micro::DOUBLE / 1e6)
                               / n_pages::DOUBLE, 6) AS entropy
                FROM agg)
            SELECT n_pages, n_groups, entropy,
                   round(exp(entropy), 6) AS effective_groups,
                   round(rank_sum2::DOUBLE
                         / (n_groups::DOUBLE * n_pages::DOUBLE)
                         - (n_groups + 1.0::DOUBLE) / n_groups, 6) AS gini,
                   round(max_n / n_pages::DOUBLE, 6) AS top1_share,
                   round(top_n_pages / n_pages::DOUBLE, 6) AS topn_share
            FROM ent
        """,
        # Gate attrition: each cumulative conjunction is a SUM(CASE) in
        # one aggregate; the funnel pivots via VALUES.
        "gate_attrition": r"""
            WITH g AS (
                SELECT (len(regexp_extract_all(lower(text),
                            '[a-zà-öø-ÿ]+')) >= 20) AS g1,
                       (round(length(regexp_replace(text,
                            '[^A-Za-zÀ-ÖØ-öø-ÿ]', '', 'g'))
                            / greatest(length(text), 1), 6) >= 0.6) AS g2,
                       (NOT contains(text, '{')) AS g3,
                       regexp_matches(lang, '^[a-z]{2}$') AS g4
                FROM documents
            ), s AS (
                SELECT count(*)::BIGINT AS n0,
                       sum(CASE WHEN g1 THEN 1 ELSE 0 END)::BIGINT AS n1,
                       sum(CASE WHEN g1 AND g2 THEN 1 ELSE 0 END)::BIGINT
                           AS n2,
                       sum(CASE WHEN g1 AND g2 AND g3 THEN 1 ELSE 0
                           END)::BIGINT AS n3,
                       sum(CASE WHEN g1 AND g2 AND g3 AND g4 THEN 1 ELSE 0
                           END)::BIGINT AS n4
                FROM g
            )
            SELECT v.gate_idx::INT AS gate_idx, v.gate,
                   CASE v.gate_idx WHEN 1 THEN n0 WHEN 2 THEN n1
                        WHEN 3 THEN n2 ELSE n3 END AS n_in,
                   CASE v.gate_idx WHEN 1 THEN n1 WHEN 2 THEN n2
                        WHEN 3 THEN n3 ELSE n4 END AS n_pass,
                   CASE v.gate_idx WHEN 1 THEN n0 - n1 WHEN 2 THEN n1 - n2
                        WHEN 3 THEN n2 - n3 ELSE n3 - n4 END AS n_killed,
                   round(CASE v.gate_idx WHEN 1 THEN n1 WHEN 2 THEN n2
                         WHEN 3 THEN n3 ELSE n4 END
                         / greatest(n0, 1)::DOUBLE, 6) AS cum_survival
            FROM s, (VALUES (1, 'min_words'), (2, 'alpha_ratio'),
                            (3, 'no_braces'), (4, 'lang_known'))
                 AS v(gate_idx, gate)
        """,
        # Leakage-safe splits: cluster = id mod 1e6 on the planted pair
        # graph; the split replays the same md5 unit-hash thresholds as
        # corpus_splits, keyed on the CLUSTER label.
        "leakage_safe_splits": """
            WITH corpus AS (
                SELECT doc_id FROM documents
                UNION ALL
                SELECT doc_id + 1000000 FROM documents
            ), labeled AS (
                SELECT doc_id, (doc_id % 1000000)::BIGINT AS cluster
                FROM corpus
            )
            SELECT doc_id, cluster,
                   CASE WHEN u < 0.5 THEN 'train'
                        WHEN u < 0.75 THEN 'val'
                        ELSE 'test' END AS split
            FROM (
                SELECT doc_id, cluster,
                       ('0x' || substr(md5('split:'
                            || CAST(cluster AS VARCHAR)), 1, 15))::BIGINT
                       / 1152921504606846976.0 AS u
                FROM labeled)
        """,
        # Publish dates: the fixture's resolution ladder replays
        # arithmetically — meta (incl. the malformed row), JSON-LD, URL
        # path date, none; TRY_CAST mirrors try_to_date's NULL-on-junk.
        "publish_dates": """
            WITH base AS (
                SELECT doc_id,
                       CAST(2020 + doc_id % 6 AS VARCHAR) || '-'
                       || lpad(CAST(1 + doc_id % 12 AS VARCHAR), 2, '0')
                       || '-'
                       || lpad(CAST(1 + doc_id % 28 AS VARCHAR), 2, '0')
                           AS iso,
                       (doc_id % 4) AS r
                FROM documents
            ), resolved AS (
                SELECT doc_id, r, iso,
                       CASE WHEN r = 0 THEN
                                CASE WHEN doc_id % 3 = 0 THEN 'not-a-date'
                                     ELSE iso || 'T10:00:00Z' END
                            WHEN r = 1 THEN iso
                            WHEN r = 2 THEN iso
                       END AS published_raw,
                       CASE WHEN r = 0 THEN 'meta'
                            WHEN r = 1 THEN 'jsonld'
                            WHEN r = 2 THEN 'url' END AS published_src
                FROM base
            )
            SELECT CASE WHEN r = 2 THEN
                       'https://blog.example/' || replace(iso, '-', '/')
                       || '/post-' || CAST(doc_id AS VARCHAR) || '.html'
                   ELSE 'https://site.example/p' || CAST(doc_id AS VARCHAR)
                   END AS url,
                   published_raw,
                   published_src,
                   TRY_CAST(substr(published_raw, 1, 10) AS DATE)
                       AS published_date
            FROM resolved
        """,
        # Link reciprocity: the ring/chord construction, the distinct
        # edge set, the reversed semi-join and the outdegree ratio all
        # replay as plain SQL.
        "link_reciprocity": """
            WITH raw_edges AS (
                SELECT 's' || CAST(doc_id % 7 AS VARCHAR) || '.example' AS src,
                       's' || CAST(CASE WHEN doc_id % 2 = 0
                                        THEN (doc_id % 7 + 1) % 7
                                        ELSE (doc_id % 7 + 6) % 7 END
                                   AS VARCHAR) || '.example' AS dst
                FROM documents
                UNION ALL
                SELECT 's' || CAST(doc_id % 7 AS VARCHAR) || '.example',
                       's' || CAST((doc_id % 7 + 3) % 7 AS VARCHAR)
                           || '.example'
                FROM documents WHERE doc_id % 5 = 0
            ), e AS (
                SELECT DISTINCT src, dst FROM raw_edges WHERE src != dst
            ), recip AS (
                SELECT a.src, a.dst FROM e a
                SEMI JOIN e b ON a.src = b.dst AND a.dst = b.src
            ), outs AS (
                SELECT src, count(*)::BIGINT AS n_out FROM e GROUP BY src
            ), recs AS (
                SELECT src, count(*)::BIGINT AS n_recip
                FROM recip GROUP BY src
            )
            SELECT o.src AS domain, o.n_out,
                   coalesce(r.n_recip, 0)::BIGINT AS n_recip,
                   round(coalesce(r.n_recip, 0) / o.n_out::DOUBLE, 6)
                       AS reciprocity
            FROM outs o LEFT JOIN recs r ON o.src = r.src
        """,
        # WET round-trip: conversion records carry the raw text bytes, so
        # url/date/md5/length all reconstruct arithmetically.
        "wet_roundtrip": """
            SELECT 'http://corpus.example/doc/' || CAST(doc_id AS VARCHAR) AS url,
                   strftime(TIMESTAMP '2024-01-01 00:00:00'
                            + INTERVAL (doc_id) SECOND,
                            '%Y-%m-%dT%H:%M:%SZ') AS warc_date,
                   'conversion' AS record_type,
                   md5(text) AS text_md5,
                   strlen(text)::BIGINT AS n_bytes
            FROM documents
        """,
        # Edit verification: DuckDB levenshtein is the same unit-cost edit
        # distance; prefixes, the 6-dp similarity, and the 0.75 verdict
        # mirror the operator exactly.
        "edit_verify_pairs": r"""
            WITH m AS (
                SELECT doc_id,
                       substr(text, 1, 300) AS pa,
                       substr(regexp_replace(text, '\s+\S+\s*$', ''),
                              1, 300) AS pb
                FROM documents
            )
            SELECT doc_id AS id_a,
                   (doc_id + 1000000)::BIGINT AS id_b,
                   levenshtein(pa, pb)::INT AS edit_dist,
                   round(CASE WHEN greatest(len(pa), len(pb)) = 0 THEN 1.0
                         ELSE 1.0 - levenshtein(pa, pb)
                              / greatest(len(pa), len(pb))::DOUBLE END,
                         6) AS sim,
                   (round(CASE WHEN greatest(len(pa), len(pb)) = 0 THEN 1.0
                          ELSE 1.0 - levenshtein(pa, pb)
                               / greatest(len(pa), len(pb))::DOUBLE END,
                          6) >= 0.75) AS is_dup
            FROM m
        """,
        # Keep-best survivors: the planted pair graph {i, i+1e6} makes the
        # component label arithmetic (id mod 1e6); the (score desc, id)
        # window replays the survivor policy.
        "dedup_best_survivors": r"""
            WITH corpus AS (
                SELECT doc_id, text FROM documents
                UNION ALL
                SELECT doc_id + 1000000,
                       regexp_replace(text, '\s+\S+\s*$', '')
                FROM documents
            ), scored AS (
                SELECT doc_id,
                       (doc_id % 1000000)::BIGINT AS cluster,
                       len(regexp_extract_all(lower(text),
                           '[a-zà-öø-ÿ]+'))::BIGINT AS score
                FROM corpus
            )
            SELECT doc_id, cluster, score,
                   (row_number() OVER (PARTITION BY cluster
                        ORDER BY score DESC, doc_id) = 1) AS keep
            FROM scored
        """,
        # Sitemap discovery: RE2 (?im)^ anchors after \n only, which is
        # exactly what the Spark side's (?dim) pins Java to.
        "robots_sitemap_urls": r"""
            WITH r AS (
                SELECT DISTINCT (doc_id % 13) AS r FROM documents
            ), b AS (
                SELECT 'site' || CAST(r AS VARCHAR) || '.example' AS domain,
                       CASE WHEN r % 3 = 0 THEN
                           'User-agent: *' || chr(10) || 'Disallow: /x'
                           || chr(10) || 'Sitemap: https://site'
                           || CAST(r AS VARCHAR) || '.example/sitemap.xml'
                           || chr(10) || chr(9) || 'SITEMAP:' || chr(9)
                           || 'https://site' || CAST(r AS VARCHAR)
                           || '.example/news.xml' || chr(10)
                       WHEN r % 3 = 1 THEN
                           'sitemap: https://site' || CAST(r AS VARCHAR)
                           || '.example/s.xml # primary' || chr(10)
                           || 'NotSitemap: https://decoy.example/no.xml'
                           || chr(10) || 'Sitemap: https://site'
                           || CAST(r AS VARCHAR) || '.example/s.xml'
                           || chr(10)
                       ELSE 'User-agent: *' || chr(10)
                           || 'Disallow: /private/' || chr(10) END AS body
                FROM r
            )
            SELECT DISTINCT domain, u AS sitemap_url
            FROM b, UNNEST(regexp_extract_all(body,
                '(?im)^[ \t]*sitemap[ \t]*:[ \t]*([^ \t\r\n#]+)', 1)) AS t(u)
        """,
        # Unigram KL drift: add-one smoothing over the union vocab,
        # nano-nat quantization floor(x*1e9 + 0.5) with the same
        # multiplication order, (|contrib| desc, token) top-20.
        "unigram_drift": r"""
            WITH oldc AS (
                SELECT u AS token, count(*)::BIGINT AS c_old
                FROM documents,
                     UNNEST(regexp_extract_all(lower(text),
                            '[a-zà-öø-ÿ]+')) AS t(u)
                GROUP BY u
            ), newdocs AS (
                SELECT doc_id,
                       CASE WHEN doc_id % 3 = 0 THEN
                           text || ' cookie banner accept tracking'
                       ELSE text END AS text
                FROM documents
            ), newc AS (
                SELECT u AS token, count(*)::BIGINT AS c_new
                FROM newdocs,
                     UNNEST(regexp_extract_all(lower(text),
                            '[a-zà-öø-ÿ]+')) AS t(u)
                GROUP BY u
            ), j AS (
                SELECT coalesce(o.token, n.token) AS token,
                       coalesce(c_old, 0)::BIGINT AS c_old,
                       coalesce(c_new, 0)::BIGINT AS c_new
                FROM oldc o FULL OUTER JOIN newc n ON o.token = n.token
            ), tot AS (
                SELECT sum(c_old)::BIGINT AS no_, sum(c_new)::BIGINT AS nn,
                       count(*)::BIGINT AS v
                FROM j
            ), contrib AS (
                SELECT token, c_old, c_new,
                       floor((c_new + 1.0) / (nn + v)
                             * ln(((c_new + 1.0) / (nn + v))
                                  / ((c_old + 1.0) / (no_ + v)))
                             * 1e9 + 0.5)::BIGINT AS contrib_nano
                FROM j CROSS JOIN tot
            )
            SELECT token, c_old, c_new, contrib_nano
            FROM contrib
            ORDER BY abs(contrib_nano) DESC, token
            LIMIT 20
        """,
        "warc_roundtrip": """
            SELECT 'http://corpus.example/doc/' || CAST(doc_id AS VARCHAR) AS url,
                   strftime(TIMESTAMP '2024-01-01 00:00:00'
                            + INTERVAL (doc_id) SECOND,
                            '%Y-%m-%dT%H:%M:%SZ') AS warc_date,
                   md5('<html><body>' || text || '</body></html>') AS html_md5,
                   strlen('<html><body>' || text || '</body></html>')::BIGINT
                       AS n_bytes
            FROM documents
        """,
        # text passes through tf.train.Example bytes features losslessly
        # (valid UTF-8 in == same bytes out); the float32 feature is
        # replayed by the REAL cast (doc_id/4 is f32-exact anyway).
        "tfrecord_roundtrip": """
            SELECT 'tfr://doc/' || CAST(doc_id AS VARCHAR) AS url,
                   md5(coalesce(text, '')) AS text_md5,
                   length(coalesce(text, ''))::BIGINT AS n_chars,
                   CAST(doc_id / 4.0 AS REAL)::DOUBLE AS score_f32
            FROM documents
        """,
        # utf8proc NFC over the same combining-acute construction; changed
        # is always true (the suffix denormalizes every doc).
        "unicode_nfc": """
            SELECT doc_id,
                   md5(nfc_normalize(text || ' cafe' || chr(769) || ' '
                                     || chr(64257) || 'n 2' || chr(185)))
                       AS norm_md5,
                   (text || ' cafe' || chr(769)
                    <> nfc_normalize(text || ' cafe' || chr(769))) AS changed
            FROM documents
        """,
        # Proportional quota: rate = least(1, 20/n_domain); membership =
        # md5-unit-hash(quota:id) < rate — identical double arithmetic.
        "domain_quota": """
            WITH d AS (
                SELECT doc_id,
                       'site' || CAST(doc_id % 13 AS VARCHAR) || '.com' AS domain
                FROM documents
            ), caps AS (
                SELECT domain, count(*)::BIGINT AS n_domain FROM d GROUP BY domain
            )
            SELECT d.doc_id, d.domain
            FROM d JOIN caps USING (domain)
            WHERE ('0x' || substr(md5('quota:' || CAST(d.doc_id AS VARCHAR)),
                                  1, 15))::BIGINT
                  / 1152921504606846976.0
                  < least(1.0, 20.0 / caps.n_domain)
        """,
        # Exact cap: the 20 smallest md5 id-hashes per domain survive.
        "domain_caps": """
            WITH d AS (
                SELECT doc_id,
                       'site' || CAST(doc_id % 13 AS VARCHAR) || '.com' AS domain,
                       ('0x' || substr(md5('quota:' || CAST(doc_id AS VARCHAR)),
                                       1, 15))::BIGINT AS h
                FROM documents
            )
            SELECT doc_id, domain
            FROM (SELECT doc_id, domain,
                         row_number() OVER (PARTITION BY domain
                                            ORDER BY h ASC, doc_id ASC) AS rn
                  FROM d)
            WHERE rn <= 20
        """,
        # quantile_cont interpolates identically to Spark's exact
        # percentile ((n-1)*p linear), verified bit-for-bit.
        "length_quantiles": """
            SELECT lang,
                   count(*)::BIGINT AS n_docs,
                   round(quantile_cont(n_chars, 0.5), 4) AS p50_chars,
                   round(quantile_cont(n_chars, 0.9), 4) AS p90_chars,
                   round(quantile_cont(n_chars, 0.99), 4) AS p99_chars
            FROM documents GROUP BY lang
        """,
        "blocked_urls": """
            SELECT doc_id,
                   'http://sub.site' || CAST(doc_id % 13 AS VARCHAR)
                       || '.com/p/' || CAST(doc_id AS VARCHAR) AS url
            FROM documents
            WHERE doc_id % 13 NOT IN (1, 4, 11)
        """,
        # Top-200 vocab by (count desc, word asc) — a total order, so the
        # set is engine-identical; per-doc OOV counts under it.
        "vocab_oov": """
            WITH words AS (
                SELECT doc_id,
                       unnest(regexp_extract_all(lower(text), '[a-zà-öø-ÿ]+')) AS word
                FROM documents
            ), vocab AS (
                SELECT word FROM (
                    SELECT word, count(*) AS n FROM words GROUP BY word
                ) ORDER BY n DESC, word ASC LIMIT 200
            ), sc AS (
                SELECT w.doc_id,
                       count(*)::BIGINT AS n_words,
                       (count(*) - count(v.word))::BIGINT AS n_oov
                FROM words w LEFT JOIN vocab v USING (word)
                GROUP BY w.doc_id
            )
            SELECT d.doc_id,
                   coalesce(s.n_words, 0)::BIGINT AS n_words,
                   coalesce(s.n_oov, 0)::BIGINT AS n_oov
            FROM documents d LEFT JOIN sc s USING (doc_id)
        """,
        # Full replay of the char-bigram LM: same normalization, same
        # add-one smoothing, same integer micro-nat costs.  Train corpus =
        # score corpus here, so every scored bigram is in the model and
        # the inner join is total (the floor/uniform fallbacks only fire
        # with a separate train split — unit-tested instead).
        # sampling.quantile_normalize replica: same (score, id) tie
        # order on both rankings, same integer midpoint-quantile index.
        "quantile_normalize": """
            WITH d AS (SELECT doc_id, lang, n_chars AS s FROM documents),
            p AS (SELECT s, row_number() OVER (ORDER BY s, doc_id) AS g
                  FROM d),
            n AS (SELECT count(*)::HUGEINT AS N FROM d),
            r AS (SELECT doc_id, lang, s,
                         row_number() OVER (PARTITION BY lang
                                            ORDER BY s, doc_id) AS rk,
                         count(*) OVER (PARTITION BY lang) AS cnt
                  FROM d)
            SELECT r.doc_id, r.lang, r.s::BIGINT AS n_chars,
                   p.s::BIGINT AS norm_score
            FROM r CROSS JOIN n
            JOIN p ON p.g = ((2 * r.rk - 1)::HUGEINT * n.N)
                          // (2 * r.cnt)::HUGEINT + 1
        """,
        # evaluate.chi2_independence replica: q and den exact HUGEINTs,
        # the cell term the identical double association
        # (q::D * q::D / den::D) * 1e9, nano-rounded then integer-summed.
        "chi2_lang_source": f"""
            {_CHI2_CELLS_SQL}
            SELECT max(n)::BIGINT AS n,
                   count(DISTINCT a)::BIGINT AS a_levels,
                   count(DISTINCT b)::BIGINT AS b_levels,
                   ((count(DISTINCT a) - 1)
                    * (count(DISTINCT b) - 1))::BIGINT AS dof,
                   sum(t)::BIGINT AS chi2_nano
            FROM cells
        """,
        # chi2 chain + the V tail: round(sqrt((chi2/1e9)/(n*m))*1e6).
        "cramers_v": f"""
            {_CHI2_CELLS_SQL},
            agg AS (SELECT max(n)::BIGINT AS n,
                           count(DISTINCT a)::BIGINT AS a_levels,
                           count(DISTINCT b)::BIGINT AS b_levels,
                           sum(t)::BIGINT AS chi2_nano
                    FROM cells)
            SELECT n, a_levels, b_levels,
                   ((a_levels - 1) * (b_levels - 1))::BIGINT AS dof,
                   chi2_nano,
                   CASE WHEN least(a_levels - 1, b_levels - 1) > 0 THEN
                       CAST(round(sqrt((chi2_nano::DOUBLE / 1e9)
                                       / (n * least(a_levels - 1,
                                                    b_levels - 1))::DOUBLE)
                                  * 1e6, 0) AS BIGINT)
                   END AS v_micro
            FROM agg
        """,
        # similarity.colbert_maxsim term for term: micro-unit cosines,
        # max per (query token, doc), integer sum per (query, doc).
        "colbert_maxsim": f"""
            WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v
                       FROM embeddings),
            q AS (SELECT label AS qid, vec_id AS qtok, v FROM e
                  WHERE label <= 1),
            d AS (SELECT label AS did, v FROM e),
            sc AS (SELECT q.qid, q.qtok, d.did,
                          round({_COSINE.format(a='q.v', b='d.v')}
                                * 1000000, 0)::BIGINT AS c6
                   FROM q CROSS JOIN d),
            mx AS (SELECT qid, qtok, did, max(c6) AS m
                   FROM sc GROUP BY 1, 2, 3)
            SELECT qid::BIGINT AS qid, did::BIGINT AS did,
                   count(*)::BIGINT AS n_qtokens,
                   sum(m)::BIGINT AS maxsim_micro
            FROM mx GROUP BY 1, 2
        """,
        # textstats.credit_card_hits replica: same maximal-run regex (no
        # lookaround, Java == RE2), same separator strip, same reversed
        # positional Luhn arithmetic in list lambdas.
        "luhn_card_audit": """
            WITH injected AS (
                SELECT doc_id,
                       coalesce(text, '') ||
                       CASE doc_id % 4
                         WHEN 0 THEN ' card 4532015112830366 end'
                         WHEN 1 THEN ' card 4532015112830367 end'
                         WHEN 2 THEN ' card 4532 0151 1283 0366 end'
                         ELSE ''
                       END AS text
                FROM documents),
            runs AS (
                SELECT doc_id,
                       regexp_extract_all(text,
                                          '[0-9][0-9 -]{11,30}[0-9]') AS rs
                FROM injected),
            checked AS (
                SELECT doc_id, rs,
                       list_filter(
                           list_transform(rs,
                               r -> replace(replace(r, ' ', ''),
                                            '-', '')),
                           d -> length(d) BETWEEN 13 AND 19
                                AND list_sum(list_transform(
                                        range(1, length(d) + 1),
                                        i -> CASE WHEN i % 2 = 0 THEN
                                                 CASE WHEN (ascii(
                                                     reverse(d)[i]) - 48)
                                                     * 2 > 9
                                                 THEN (ascii(reverse(d)[i])
                                                       - 48) * 2 - 9
                                                 ELSE (ascii(reverse(d)[i])
                                                       - 48) * 2
                                                 END
                                             ELSE ascii(reverse(d)[i]) - 48
                                             END)) % 10 = 0) AS ok
                FROM runs)
            SELECT doc_id, len(rs)::INT AS n_card_candidates,
                   len(ok)::INT AS n_cards_valid
            FROM checked
        """,
        # dedup.text_reuse_spans replica on shingle STRINGS: same
        # plagiarist construction, same within-doc-unique filter, same
        # diagonal rollup; 1-based oracle positions vs 0-based Spark
        # positions cancel in every output column.
        "text_reuse_spans": """
            WITH base AS (SELECT doc_id, coalesce(text, '') AS text
                          FROM documents),
            bt AS (SELECT doc_id,
                          regexp_split_to_array(trim(lower(text)),
                                                '\\s+') AS ws
                   FROM base),
            plag AS (SELECT doc_id + 2000000 AS doc_id,
                            array_to_string(
                                list_transform(range(0, 10),
                                    j -> 'filler' || doc_id::VARCHAR
                                         || 'x' || j::VARCHAR)
                                || ws[21:50], ' ') AS text
                     FROM bt),
            corpus AS (SELECT doc_id, text FROM base
                       UNION ALL SELECT doc_id, text FROM plag),
            toks AS (SELECT doc_id,
                            regexp_split_to_array(trim(lower(text)),
                                                  '\\s+') AS ws
                     FROM corpus),
            occ AS (SELECT doc_id, i,
                           array_to_string(ws[i:i+4], ' ') AS sh
                    FROM (SELECT doc_id, ws,
                                 unnest(generate_series(1, len(ws) - 4))
                                     AS i
                          FROM toks WHERE len(ws) >= 5)),
            uniq AS (SELECT doc_id, sh, min(i) AS pos FROM occ
                     GROUP BY 1, 2 HAVING count(*) = 1),
            pairs AS (SELECT doc_id AS id_a, doc_id + 2000000 AS id_b
                      FROM base),
            m AS (SELECT p.id_a, p.id_b, a.pos AS pa, b.pos AS pb
                  FROM pairs p
                  JOIN uniq a ON a.doc_id = p.id_a
                  JOIN uniq b ON b.doc_id = p.id_b AND b.sh = a.sh),
            g AS (SELECT id_a, id_b, pa - pb AS diag, count(*) AS n,
                         min(pa) AS a0, max(pa) AS a1
                  FROM m GROUP BY 1, 2, 3 HAVING count(*) >= 3)
            SELECT id_a, id_b, diag::BIGINT AS diag,
                   a0::BIGINT AS a_start, (a1 + 4)::BIGINT AS a_end,
                   (a0 - diag)::BIGINT AS b_start,
                   (a1 + 4 - diag)::BIGINT AS b_end,
                   n::BIGINT AS n_shingles
            FROM g
        """,
        # two-stage passim replica: string-shingle alignment (as in
        # text_reuse_spans) over the insertion fixture, then the same
        # prev-max window interval merge with gap bridging.
        "text_reuse_merged": """
            WITH base AS (SELECT doc_id, coalesce(text, '') AS text
                          FROM documents),
            bt AS (SELECT doc_id,
                          regexp_split_to_array(trim(lower(text)),
                                                '\\s+') AS ws
                   FROM base),
            plag AS (SELECT doc_id + 3000000 AS doc_id,
                            array_to_string(
                                list_transform(range(0, 10),
                                    j -> 'gfill' || doc_id::VARCHAR
                                         || 'x' || j::VARCHAR)
                                || ws[21:35]
                                || ['zzins' || doc_id::VARCHAR]
                                || ws[36:50], ' ') AS text
                     FROM bt),
            corpus AS (SELECT doc_id, text FROM base
                       UNION ALL SELECT doc_id, text FROM plag),
            toks AS (SELECT doc_id,
                            regexp_split_to_array(trim(lower(text)),
                                                  '\\s+') AS ws
                     FROM corpus),
            occ AS (SELECT doc_id, i,
                           array_to_string(ws[i:i+4], ' ') AS sh
                    FROM (SELECT doc_id, ws,
                                 unnest(generate_series(1, len(ws) - 4))
                                     AS i
                          FROM toks WHERE len(ws) >= 5)),
            uniq AS (SELECT doc_id, sh, min(i) AS pos FROM occ
                     GROUP BY 1, 2 HAVING count(*) = 1),
            pairs AS (SELECT doc_id AS id_a, doc_id + 3000000 AS id_b
                      FROM base),
            m AS (SELECT p.id_a, p.id_b, a.pos AS pa, b.pos AS pb
                  FROM pairs p
                  JOIN uniq a ON a.doc_id = p.id_a
                  JOIN uniq b ON b.doc_id = p.id_b AND b.sh = a.sh),
            g AS (SELECT id_a, id_b, pa - pb AS diag, count(*) AS n,
                         min(pa) AS a0, max(pa) AS a1
                  FROM m GROUP BY 1, 2, 3 HAVING count(*) >= 3),
            spans AS (SELECT DISTINCT id_a, id_b,
                             a0 AS a_start, a1 + 4 AS a_end,
                             a0 - diag AS b_start,
                             a1 + 4 - diag AS b_end,
                             n AS n_shingles
                      FROM g),
            flagged AS (
                SELECT *, CASE WHEN pm IS NULL
                                    OR a_start > pm + 1 + 8
                               THEN 1 ELSE 0 END AS flag
                FROM (SELECT *,
                             max(a_end) OVER (
                                 PARTITION BY id_a, id_b
                                 ORDER BY a_start, a_end
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                          AND 1 PRECEDING) AS pm
                      FROM spans)),
            ig AS (SELECT *,
                          sum(flag) OVER (
                              PARTITION BY id_a, id_b
                              ORDER BY a_start, a_end
                              ROWS BETWEEN UNBOUNDED PRECEDING
                                       AND CURRENT ROW) AS grp
                   FROM flagged)
            SELECT id_a, id_b,
                   min(a_start)::BIGINT AS a_start,
                   max(a_end)::BIGINT AS a_end,
                   min(b_start)::BIGINT AS b_start,
                   max(b_end)::BIGINT AS b_end,
                   count(*)::BIGINT AS n_runs,
                   sum(n_shingles)::BIGINT AS n_shingles
            FROM ig GROUP BY id_a, id_b, grp
        """,
        # lm.good_turing term for term: exact-integer floor division
        # (HUGEINT // == DECIMAL(38,0) div for non-negative operands).
        "good_turing": """
            WITH toks AS (
                SELECT unnest(regexp_extract_all(lower(text),
                                                 '[a-z\u00e0-\u00f6\u00f8-\u00ff]+')) AS word
                FROM documents),
            counts AS (SELECT word, count(*)::HUGEINT AS r
                       FROM toks GROUP BY 1),
            fof AS (SELECT r, count(*)::HUGEINT AS n_r
                    FROM counts GROUP BY 1),
            tot AS (SELECT sum(r * n_r)::HUGEINT AS t FROM fof)
            SELECT f.r::BIGINT AS r, f.n_r::BIGINT AS n_r,
                   ((1000000::HUGEINT * (f.r + 1) * nx.n_r)
                    // f.n_r)::BIGINT AS r_star_micro,
                   ((1000000000::HUGEINT * (f.r + 1) * nx.n_r)
                    // (f.n_r * t.t))::BIGINT AS p_gt_nano
            FROM fof f LEFT JOIN fof nx ON nx.r = f.r + 1
            CROSS JOIN tot t
        """,
        # global-order pairs via one window; the Spark side's range
        # partition + offset lift produces the identical total order.
        "snm_candidate_pairs": """
            WITH d AS (
                SELECT doc_id,
                       substr(regexp_replace(lower(text), '[^a-z]', '',
                                             'g'), 1, 12) AS k
                FROM documents),
            o AS (SELECT doc_id, k,
                         row_number() OVER (ORDER BY k, doc_id) AS g
                  FROM d)
            SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                   a.k AS key_a, b.k AS key_b,
                   (b.g - a.g)::BIGINT AS gap
            FROM o a JOIN o b ON b.g > a.g AND b.g <= a.g + 3
        """,
        # lm.train_kn_bigram + kn_bigram_scores replica: same top-64
        # vocab (ties n desc, word asc), same exact-rational P(w2|w1) =
        # (max(4c12-3,0)*n1all + 3*n1f*n1b)/(4*c1*n1all), one
        # correctly-rounded ln of exact integers per pair, integer
        # micro-nat doc sums; the uniform fallback constant is the same
        # Python-computed literal both engines embed.
        "kn_doc_scores": """
            WITH toks AS (
                SELECT doc_id,
                       regexp_extract_all(lower(text),
                                          '[a-z\u00e0-\u00f6\u00f8-\u00ff]+') AS ws
                FROM documents),
            wc AS (SELECT unnest(ws) AS word FROM toks),
            cnt AS (SELECT word, count(*) AS n FROM wc GROUP BY 1),
            vocab AS (SELECT word FROM cnt
                      ORDER BY n DESC, word ASC LIMIT 64),
            rp AS (
                SELECT doc_id, ws[i] AS w1r, ws[i + 1] AS w2r
                FROM (SELECT doc_id, ws,
                             unnest(generate_series(1, len(ws) - 1)) AS i
                      FROM toks WHERE len(ws) >= 2)),
            mp AS (
                SELECT doc_id,
                       coalesce(v1.word, '<unk>') AS w1,
                       coalesce(v2.word, '<unk>') AS w2
                FROM rp LEFT JOIN vocab v1 ON v1.word = rp.w1r
                        LEFT JOIN vocab v2 ON v2.word = rp.w2r),
            pc AS (SELECT w1, w2, count(*)::HUGEINT AS c12
                   FROM mp GROUP BY 1, 2),
            ctx AS (SELECT w1, sum(c12)::HUGEINT AS c1,
                           count(*)::HUGEINT AS n1f
                    FROM pc GROUP BY 1),
            cont AS (SELECT w2, count(*)::HUGEINT AS n1b
                     FROM pc GROUP BY 1),
            sca AS (SELECT count(*)::HUGEINT AS n1all FROM pc),
            costs AS (
                SELECT mp.doc_id,
                       CASE
                         WHEN ctx.c1 IS NOT NULL AND
                              (greatest(4 * coalesce(pc.c12, 0) - 3, 0)
                                   * sca.n1all
                               + 3 * ctx.n1f * coalesce(cont.n1b, 0)) > 0
                         THEN CAST(round(-ln(
                                (greatest(4 * coalesce(pc.c12, 0) - 3, 0)
                                     * sca.n1all
                                 + 3 * ctx.n1f * coalesce(cont.n1b, 0)
                                )::DOUBLE
                                / (4 * ctx.c1 * sca.n1all)::DOUBLE)
                                * 1000000) AS BIGINT)
                         WHEN ctx.c1 IS NULL AND coalesce(cont.n1b, 0) > 0
                         THEN CAST(round(-ln(cont.n1b::DOUBLE
                                             / sca.n1all::DOUBLE)
                                         * 1000000) AS BIGINT)
                         ELSE 4174387
                       END AS cost
                FROM mp
                LEFT JOIN pc ON pc.w1 = mp.w1 AND pc.w2 = mp.w2
                LEFT JOIN ctx ON ctx.w1 = mp.w1
                LEFT JOIN cont ON cont.w2 = mp.w2
                CROSS JOIN sca),
            sc AS (SELECT doc_id, count(*)::BIGINT AS n_bigrams,
                          sum(cost)::BIGINT AS cost_micro_total
                   FROM costs GROUP BY 1)
            SELECT d.doc_id,
                   coalesce(s.n_bigrams, 0)::BIGINT AS n_bigrams,
                   coalesce(s.cost_micro_total, 0)::BIGINT
                       AS cost_micro_total
            FROM documents d LEFT JOIN sc s USING (doc_id)
        """,
        # lm_partition over the KN doc scores: identical CTE chain to
        # kn_doc_scores, then the same 6-dp mean / quantile_cont tertile
        # tail as the lm_partition oracle.
        "kn_partition": """
            WITH toks AS (
                SELECT doc_id,
                       regexp_extract_all(lower(text),
                                          '[a-zà-öø-ÿ]+') AS ws
                FROM documents),
            wc AS (SELECT unnest(ws) AS word FROM toks),
            cnt AS (SELECT word, count(*) AS n FROM wc GROUP BY 1),
            vocab AS (SELECT word FROM cnt
                      ORDER BY n DESC, word ASC LIMIT 64),
            rp AS (
                SELECT doc_id, ws[i] AS w1r, ws[i + 1] AS w2r
                FROM (SELECT doc_id, ws,
                             unnest(generate_series(1, len(ws) - 1)) AS i
                      FROM toks WHERE len(ws) >= 2)),
            mp AS (
                SELECT doc_id,
                       coalesce(v1.word, '<unk>') AS w1,
                       coalesce(v2.word, '<unk>') AS w2
                FROM rp LEFT JOIN vocab v1 ON v1.word = rp.w1r
                        LEFT JOIN vocab v2 ON v2.word = rp.w2r),
            pc AS (SELECT w1, w2, count(*)::HUGEINT AS c12
                   FROM mp GROUP BY 1, 2),
            ctx AS (SELECT w1, sum(c12)::HUGEINT AS c1,
                           count(*)::HUGEINT AS n1f
                    FROM pc GROUP BY 1),
            cont AS (SELECT w2, count(*)::HUGEINT AS n1b
                     FROM pc GROUP BY 1),
            sca AS (SELECT count(*)::HUGEINT AS n1all FROM pc),
            costs AS (
                SELECT mp.doc_id,
                       CASE
                         WHEN ctx.c1 IS NOT NULL AND
                              (greatest(4 * coalesce(pc.c12, 0) - 3, 0)
                                   * sca.n1all
                               + 3 * ctx.n1f * coalesce(cont.n1b, 0)) > 0
                         THEN CAST(round(-ln(
                                (greatest(4 * coalesce(pc.c12, 0) - 3, 0)
                                     * sca.n1all
                                 + 3 * ctx.n1f * coalesce(cont.n1b, 0)
                                )::DOUBLE
                                / (4 * ctx.c1 * sca.n1all)::DOUBLE)
                                * 1000000) AS BIGINT)
                         WHEN ctx.c1 IS NULL AND coalesce(cont.n1b, 0) > 0
                         THEN CAST(round(-ln(cont.n1b::DOUBLE
                                             / sca.n1all::DOUBLE)
                                         * 1000000) AS BIGINT)
                         ELSE 4174387
                       END AS cost
                FROM mp
                LEFT JOIN pc ON pc.w1 = mp.w1 AND pc.w2 = mp.w2
                LEFT JOIN ctx ON ctx.w1 = mp.w1
                LEFT JOIN cont ON cont.w2 = mp.w2
                CROSS JOIN sca),
            sc AS (SELECT doc_id, count(*)::BIGINT AS n_bigrams,
                          sum(cost)::BIGINT AS cost_micro_total
                   FROM costs GROUP BY 1),
            means AS (
                SELECT d.doc_id,
                       coalesce(s.n_bigrams, 0) AS n_bigrams,
                       round(coalesce(s.cost_micro_total, 0)::DOUBLE
                             / greatest(coalesce(s.n_bigrams, 0), 1) / 1e6,
                             6) AS mean_nats
                FROM documents d LEFT JOIN sc s USING (doc_id)
            ), cuts AS (
                SELECT round(quantile_cont(mean_nats, 1.0/3), 6) AS c1,
                       round(quantile_cont(mean_nats, 2.0/3), 6) AS c2
                FROM means WHERE n_bigrams > 0
            )
            SELECT m.doc_id, m.mean_nats,
                   CASE WHEN m.n_bigrams = 0 THEN 'tail'
                        WHEN m.mean_nats <= c.c1 THEN 'head'
                        WHEN m.mean_nats <= c.c2 THEN 'middle'
                        ELSE 'tail' END AS lm_bucket
            FROM means m CROSS JOIN cuts c
        """,
        # Min-K% Prob (Shi et al. 2024): same KN cost chain, then per
        # doc the sum of the top-ceil(n/5) costs BY VALUE (tie order
        # can't change a sum); exact-integer ceil; the 6-dp mean is the
        # only float.
        "mink_prob_audit": """
            WITH toks AS (
                SELECT doc_id,
                       regexp_extract_all(lower(text),
                                          '[a-z\u00e0-\u00f6\u00f8-\u00ff]+') AS ws
                FROM documents),
            wc AS (SELECT unnest(ws) AS word FROM toks),
            cnt AS (SELECT word, count(*) AS n FROM wc GROUP BY 1),
            vocab AS (SELECT word FROM cnt
                      ORDER BY n DESC, word ASC LIMIT 64),
            rp AS (
                SELECT doc_id, ws[i] AS w1r, ws[i + 1] AS w2r
                FROM (SELECT doc_id, ws,
                             unnest(generate_series(1, len(ws) - 1)) AS i
                      FROM toks WHERE len(ws) >= 2)),
            mp AS (
                SELECT doc_id,
                       coalesce(v1.word, '<unk>') AS w1,
                       coalesce(v2.word, '<unk>') AS w2
                FROM rp LEFT JOIN vocab v1 ON v1.word = rp.w1r
                        LEFT JOIN vocab v2 ON v2.word = rp.w2r),
            pc AS (SELECT w1, w2, count(*)::HUGEINT AS c12
                   FROM mp GROUP BY 1, 2),
            ctx AS (SELECT w1, sum(c12)::HUGEINT AS c1,
                           count(*)::HUGEINT AS n1f
                    FROM pc GROUP BY 1),
            cont AS (SELECT w2, count(*)::HUGEINT AS n1b
                     FROM pc GROUP BY 1),
            sca AS (SELECT count(*)::HUGEINT AS n1all FROM pc),
            costs AS (
                SELECT mp.doc_id,
                       CASE
                         WHEN ctx.c1 IS NOT NULL AND
                              (greatest(4 * coalesce(pc.c12, 0) - 3, 0)
                                   * sca.n1all
                               + 3 * ctx.n1f * coalesce(cont.n1b, 0)) > 0
                         THEN CAST(round(-ln(
                                (greatest(4 * coalesce(pc.c12, 0) - 3, 0)
                                     * sca.n1all
                                 + 3 * ctx.n1f * coalesce(cont.n1b, 0)
                                )::DOUBLE
                                / (4 * ctx.c1 * sca.n1all)::DOUBLE)
                                * 1000000) AS BIGINT)
                         WHEN ctx.c1 IS NULL AND coalesce(cont.n1b, 0) > 0
                         THEN CAST(round(-ln(cont.n1b::DOUBLE
                                             / sca.n1all::DOUBLE)
                                         * 1000000) AS BIGINT)
                         ELSE 4174387
                       END AS cost
                FROM mp
                LEFT JOIN pc ON pc.w1 = mp.w1 AND pc.w2 = mp.w2
                LEFT JOIN ctx ON ctx.w1 = mp.w1
                LEFT JOIN cont ON cont.w2 = mp.w2
                CROSS JOIN sca),
            sc AS (SELECT doc_id, count(*)::BIGINT AS n_bigrams,
                          list(cost ORDER BY cost DESC) AS cs
                   FROM costs GROUP BY 1),
            mk AS (SELECT doc_id, n_bigrams,
                          ((n_bigrams * 20 + 99) // 100)::BIGINT AS mink_n,
                          coalesce(list_sum(list_slice(
                              cs, 1,
                              ((n_bigrams * 20 + 99) // 100)::INT)),
                              0)::BIGINT AS mink_cost_micro
                   FROM sc)
            SELECT d.doc_id,
                   coalesce(m.n_bigrams, 0)::BIGINT AS n_bigrams,
                   coalesce(m.mink_n, 0)::BIGINT AS mink_n,
                   coalesce(m.mink_cost_micro, 0)::BIGINT AS mink_cost_micro,
                   CASE WHEN coalesce(m.mink_n, 0) > 0 THEN
                       round(m.mink_cost_micro::DOUBLE
                             / m.mink_n::DOUBLE / 1e6, 6) + 0
                   END::DOUBLE AS mink_mean_nats
            FROM documents d LEFT JOIN mk m USING (doc_id)
        """,
        # ARPA export: same word-level KN count chain; continuation
        # unigrams, 3·n1f/(4·c1) backoffs, full interpolated bigram
        # probs — all signed micro-nats of exact-integer rationals.
        "kn_arpa_table": """
            WITH toks AS (
                SELECT doc_id,
                       regexp_extract_all(lower(text),
                                          '[a-zà-öø-ÿ]+') AS ws
                FROM documents),
            wc AS (SELECT unnest(ws) AS word FROM toks),
            cnt AS (SELECT word, count(*) AS n FROM wc GROUP BY 1),
            vocab AS (SELECT word FROM cnt
                      ORDER BY n DESC, word ASC LIMIT 64),
            rp AS (
                SELECT doc_id, ws[i] AS w1r, ws[i + 1] AS w2r
                FROM (SELECT doc_id, ws,
                             unnest(generate_series(1, len(ws) - 1)) AS i
                      FROM toks WHERE len(ws) >= 2)),
            mp AS (
                SELECT doc_id,
                       coalesce(v1.word, '<unk>') AS w1,
                       coalesce(v2.word, '<unk>') AS w2
                FROM rp LEFT JOIN vocab v1 ON v1.word = rp.w1r
                        LEFT JOIN vocab v2 ON v2.word = rp.w2r),
            pc AS (SELECT w1, w2, count(*)::HUGEINT AS c12
                   FROM mp GROUP BY 1, 2),
            ctx AS (SELECT w1, sum(c12)::HUGEINT AS c1,
                           count(*)::HUGEINT AS n1f
                    FROM pc GROUP BY 1),
            cont AS (SELECT w2, count(*)::HUGEINT AS n1b
                     FROM pc GROUP BY 1),
            sca AS (SELECT count(*)::HUGEINT AS n1all FROM pc),
            words AS (
                SELECT word FROM vocab
                UNION ALL SELECT '<unk>'),
            uni AS (
                SELECT 1 AS ngram_order, w.word AS ngram,
                       CASE WHEN cont.n1b IS NOT NULL THEN
                           CAST(round(ln(cont.n1b::DOUBLE
                                         / sca.n1all::DOUBLE) * 1e6)
                                AS BIGINT)
                       END AS logp_micro_nats,
                       CASE WHEN ctx.c1 IS NOT NULL THEN
                           CAST(round(ln((3 * ctx.n1f)::DOUBLE
                                         / (4 * ctx.c1)::DOUBLE) * 1e6)
                                AS BIGINT)
                       END AS backoff_micro_nats
                FROM words w
                LEFT JOIN cont ON cont.w2 = w.word
                LEFT JOIN ctx ON ctx.w1 = w.word
                CROSS JOIN sca),
            bi AS (
                SELECT 2 AS ngram_order,
                       pc.w1 || ' ' || pc.w2 AS ngram,
                       CAST(round(ln(
                           (greatest(4 * pc.c12 - 3, 0) * sca.n1all
                            + 3 * ctx.n1f * cont.n1b)::DOUBLE
                           / (4 * ctx.c1 * sca.n1all)::DOUBLE) * 1e6)
                            AS BIGINT) AS logp_micro_nats,
                       NULL::BIGINT AS backoff_micro_nats
                FROM pc
                JOIN ctx ON ctx.w1 = pc.w1
                JOIN cont ON cont.w2 = pc.w2
                CROSS JOIN sca)
            SELECT * FROM uni UNION ALL SELECT * FROM bi
        """,
        "bigram_lm_scores": """
            WITH norm AS (
                SELECT doc_id,
                       regexp_replace(lower(text), '[^a-z ]', '#', 'g') AS s
                FROM documents
            ), bg AS (
                SELECT doc_id,
                       unnest(list_transform(generate_series(1, length(s) - 1),
                                             i -> s[i:i+1])) AS bg
                FROM norm WHERE length(s) >= 2
            ), counts AS (
                SELECT bg, count(*)::BIGINT AS n_bg FROM bg GROUP BY bg
            ), c1 AS (
                SELECT substr(bg, 1, 1) AS c1, sum(n_bg)::BIGINT AS n_c1
                FROM counts GROUP BY 1
            ), model AS (
                SELECT bg,
                       CAST(round(-ln((n_bg + 1.0) / (n_c1 + 28.0)) * 1000000)
                            AS BIGINT) AS cost
                FROM counts JOIN c1 ON substr(counts.bg, 1, 1) = c1.c1
            ), scored AS (
                SELECT b.doc_id,
                       count(*)::BIGINT AS n_bigrams,
                       sum(m.cost)::BIGINT AS cost_micro_total
                FROM bg b JOIN model m USING (bg)
                GROUP BY b.doc_id
            )
            SELECT d.doc_id,
                   coalesce(s.n_bigrams, 0)::BIGINT AS n_bigrams,
                   coalesce(s.cost_micro_total, 0)::BIGINT AS cost_micro_total
            FROM documents d LEFT JOIN scored s USING (doc_id)
        """,
        # CCNet head/middle/tail thirds over the same LM replica: mean
        # nats rounded to 6 dp, tertile cutoffs = quantile_cont (the same
        # p*(n-1) linear interpolation as Spark's exact percentile), also
        # rounded before the boundary compare.
        "lm_partition": """
            WITH norm AS (
                SELECT doc_id,
                       regexp_replace(lower(text), '[^a-z ]', '#', 'g') AS s
                FROM documents
            ), bg AS (
                SELECT doc_id,
                       unnest(list_transform(generate_series(1, length(s) - 1),
                                             i -> s[i:i+1])) AS bg
                FROM norm WHERE length(s) >= 2
            ), counts AS (
                SELECT bg, count(*)::BIGINT AS n_bg FROM bg GROUP BY bg
            ), c1 AS (
                SELECT substr(bg, 1, 1) AS c1, sum(n_bg)::BIGINT AS n_c1
                FROM counts GROUP BY 1
            ), model AS (
                SELECT bg,
                       CAST(round(-ln((n_bg + 1.0) / (n_c1 + 28.0)) * 1000000)
                            AS BIGINT) AS cost
                FROM counts JOIN c1 ON substr(counts.bg, 1, 1) = c1.c1
            ), scored AS (
                SELECT b.doc_id,
                       count(*)::BIGINT AS n_bigrams,
                       sum(m.cost)::BIGINT AS cost_micro_total
                FROM bg b JOIN model m USING (bg)
                GROUP BY b.doc_id
            ), means AS (
                SELECT d.doc_id,
                       coalesce(s.n_bigrams, 0) AS n_bigrams,
                       round(coalesce(s.cost_micro_total, 0)::DOUBLE
                             / greatest(coalesce(s.n_bigrams, 0), 1) / 1e6,
                             6) AS mean_nats
                FROM documents d LEFT JOIN scored s USING (doc_id)
            ), cuts AS (
                SELECT round(quantile_cont(mean_nats, 1.0/3), 6) AS c1,
                       round(quantile_cont(mean_nats, 2.0/3), 6) AS c2
                FROM means WHERE n_bigrams > 0
            )
            SELECT m.doc_id, m.mean_nats,
                   CASE WHEN m.n_bigrams = 0 THEN 'tail'
                        WHEN m.mean_nats <= c.c1 THEN 'head'
                        WHEN m.mean_nats <= c.c2 THEN 'middle'
                        ELSE 'tail' END AS lm_bucket
            FROM means m CROSS JOIN cuts c
        """,
        # Exact replay of the greedy per-shard pack: shard = md5-hash of
        # the id mod 16, walk docs in id order, new sequence whenever
        # fill + tok would exceed 512.  The recursive CTE advances every
        # shard one row per iteration (rn join), i.e. the same O(rows)
        # integer fold packing.py runs in pandas.
        "pack_sequences": """
            WITH RECURSIVE docs AS (
                SELECT CAST(('0x' || substr(md5('shard:' || CAST(doc_id AS VARCHAR)),
                                            1, 15))::BIGINT % 16 AS INTEGER) AS shard,
                       doc_id,
                       len(regexp_extract_all(lower(text), '[a-zà-öø-ÿ]+'))::BIGINT AS tok
                FROM documents
            ), ordered AS (
                SELECT shard, doc_id, tok,
                       row_number() OVER (PARTITION BY shard ORDER BY doc_id) AS rn
                FROM docs
            ), pack AS (
                SELECT shard, doc_id, tok, rn,
                       0::BIGINT AS seq_id, tok AS fill
                FROM ordered WHERE rn = 1
                UNION ALL
                SELECT d.shard, d.doc_id, d.tok, d.rn,
                       CASE WHEN p.fill + d.tok <= 512 THEN p.seq_id
                            ELSE p.seq_id + 1 END,
                       CASE WHEN p.fill + d.tok <= 512 THEN p.fill + d.tok
                            ELSE d.tok END
                FROM pack p
                JOIN ordered d ON d.shard = p.shard AND d.rn = p.rn + 1
            )
            SELECT shard, doc_id, tok, seq_id FROM pack
        """,
        # Same pack fold, then the materialization join: docs concatenated
        # in doc_id order per (shard, seq_id) with a blank-line separator.
        "packed_texts": """
            WITH RECURSIVE docs AS (
                SELECT CAST(('0x' || substr(md5('shard:' || CAST(doc_id AS VARCHAR)),
                                            1, 15))::BIGINT % 16 AS INTEGER) AS shard,
                       doc_id,
                       len(regexp_extract_all(lower(text), '[a-zà-öø-ÿ]+'))::BIGINT AS tok
                FROM documents
            ), ordered AS (
                SELECT shard, doc_id, tok,
                       row_number() OVER (PARTITION BY shard ORDER BY doc_id) AS rn
                FROM docs
            ), pack AS (
                SELECT shard, doc_id, tok, rn,
                       0::BIGINT AS seq_id, tok AS fill
                FROM ordered WHERE rn = 1
                UNION ALL
                SELECT d.shard, d.doc_id, d.tok, d.rn,
                       CASE WHEN p.fill + d.tok <= 512 THEN p.seq_id
                            ELSE p.seq_id + 1 END,
                       CASE WHEN p.fill + d.tok <= 512 THEN p.fill + d.tok
                            ELSE d.tok END
                FROM pack p
                JOIN ordered d ON d.shard = p.shard AND d.rn = p.rn + 1
            )
            SELECT p.shard, p.seq_id,
                   count(*)::BIGINT AS n_docs,
                   sum(p.tok)::BIGINT AS fill_tokens,
                   string_agg(d.text, chr(10) || chr(10) ORDER BY p.doc_id) AS text
            FROM pack p JOIN documents d USING (doc_id)
            GROUP BY p.shard, p.seq_id
        """,
        "domain_stats": """
            SELECT 'site' || CAST(doc_id % 13 AS VARCHAR) || '.com' AS domain,
                   count(*) AS n_docs,
                   sum(length(text))::BIGINT AS total_chars
            FROM documents GROUP BY 1
        """,
        # String-shingle recomputation of the contamination counts (the
        # Spark side joins on 64-bit shingle hashes; collision probability
        # is the documented ~2^-64 bound).
        "benchmark_contamination": r"""
            WITH sh AS (
                SELECT doc_id,
                    CASE WHEN len(toks) >= 8 THEN
                        list_distinct(list_transform(
                            generate_series(1, len(toks)-7),
                            i -> array_to_string(list_slice(toks, i, i+7), ' ')))
                    ELSE [array_to_string(toks, ' ')] END AS shingles
                FROM (SELECT doc_id,
                             regexp_split_to_array(trim(lower(text)), '\s+') AS toks
                      FROM documents)),
            bench AS (SELECT doc_id AS bench_id, shingles FROM sh
                      WHERE doc_id < 20),
            pairs AS (
                SELECT c.doc_id, b.bench_id,
                       len(list_intersect(c.shingles, b.shingles))
                           AS shared_shingles
                FROM sh c CROSS JOIN bench b)
            SELECT doc_id, bench_id, shared_shingles::BIGINT AS shared_shingles
            FROM pairs WHERE shared_shingles >= 1
        """,
        # positional shingles on strings + window interval-merge — no
        # hashing anywhere on the oracle side.
        "contamination_spans": _CONTAM_SPANS_SQL_CORE + """
            SELECT doc_id, bench_id,
                   min(pos)::INTEGER AS span_start,
                   max(e)::INTEGER AS span_end,
                   count(*)::INTEGER AS n_shingles
            FROM g2
            GROUP BY doc_id, bench_id, grp
        """,
        "ann_topk": """
            WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
            q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 5),
            scored AS (
                SELECT q.query_id, e.vec_id,
                       list_dot_product(e.v, q.qv)
                       / (sqrt(list_dot_product(e.v, e.v))
                          * sqrt(list_dot_product(q.qv, q.qv))) AS raw
                FROM e CROSS JOIN q),
            ranked AS (
                SELECT query_id, vec_id, raw,
                       row_number() OVER (PARTITION BY query_id
                                          ORDER BY raw DESC, vec_id ASC) AS rank
                FROM scored)
            SELECT query_id, vec_id, round(raw, 6) AS score, rank
            FROM ranked WHERE rank <= 10
        """,
        "embedding_near_pairs": """
            WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
            SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                   round(list_dot_product(a.v, b.v)
                         / (sqrt(list_dot_product(a.v, a.v))
                            * sqrt(list_dot_product(b.v, b.v))), 6) AS cosine
            FROM e a JOIN e b ON a.vec_id < b.vec_id
            WHERE list_dot_product(a.v, b.v)
                  / (sqrt(list_dot_product(a.v, a.v))
                     * sqrt(list_dot_product(b.v, b.v))) >= 0.4
        """,
        # Exact oracle via guaranteed-recall construction: scaled copies
        # share every LSH bucket with their originals, so the bucketed
        # candidate set covers all true pairs and the exact-cosine verify
        # removes everything else.
        "embedding_near_dups_lsh": """
            WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
            u AS (
                SELECT vec_id, v FROM e
                UNION ALL
                SELECT vec_id + 1000000, list_transform(v, x -> x * 1.001) FROM e),
            scored AS (
                SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                       list_dot_product(a.v, b.v)
                       / (sqrt(list_dot_product(a.v, a.v))
                          * sqrt(list_dot_product(b.v, b.v))) AS raw
                FROM u a JOIN u b ON a.vec_id < b.vec_id)
            SELECT id_a, id_b, round(raw, 6) AS cosine
            FROM scored WHERE raw >= 0.99
        """,
        "resume_pending": """
            SELECT doc_id FROM documents WHERE doc_id % 2 <> 0
        """,
        "quarantine_summary": """
            SELECT CASE WHEN length(text) * 50 > 100000
                        THEN 'quarantined' ELSE 'ok' END AS status,
                   count(*) AS n_docs
            FROM documents GROUP BY 1
        """,
        "shard_merge_roundtrip": """
            SELECT doc_id, length(text) AS merged_len FROM documents
        """,
        # 4 shards × one page each; sentinel '\n---Page-Break---\n' = 18 chars
        "shard_pagebreak_roundtrip": """
            SELECT doc_id, length(text) + 4 * 18 AS merged_len FROM documents
        """,
        "asof_latest_order": """
            WITH r AS (
                SELECT o_custkey, o_orderdate, max(o_orderkey) AS o_orderkey
                FROM orders GROUP BY o_custkey, o_orderdate)
            SELECT e.event_id, r.o_orderkey
            FROM events e ASOF LEFT JOIN r
            ON e.user_id = r.o_custkey AND e.ts >= r.o_orderdate
        """,
        "event_sessions": """
            SELECT event_id,
                   CAST(sum(new_session) OVER (
                        PARTITION BY user_id ORDER BY ts, event_id
                        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
            FROM (
                SELECT event_id, user_id, ts,
                       CASE WHEN lag(ts) OVER w IS NULL
                                 OR CAST(floor(epoch(ts)) AS BIGINT)
                                    - CAST(floor(epoch(lag(ts) OVER w)) AS BIGINT)
                                    > 3600
                            THEN 1 ELSE 0 END AS new_session
                FROM events
                WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
        """,
        "example_samples": """
            SELECT event_type,
                   array_to_string(list_slice(list_sort(list(event_id)), 1, 5),
                                   ',') AS first_ids,
                   count(*) AS n_events
            FROM events GROUP BY event_type
        """,
        # Exact oracle: the inverted-index pre-join is an exact algorithm,
        # so its output must equal the brute-force all-pairs set.
        "ngram_jaccard_pairs": _shingle_jaccard_oracle(k=4, threshold=0.8),
        # duplicated-substring spans: same 60-bit md5 gram hash as the
        # Spark side (Spark conv(substr(md5),16,10) ≡ DuckDB
        # ('0x'||substr(md5,1,15))::BIGINT), same gaps-and-islands merge
        "dup_ngram_spans": r"""
            WITH corpus AS (
                SELECT doc_id, text FROM documents
                UNION ALL
                SELECT doc_id + 1000000, regexp_replace(text, '\s+\S+\s*$', '')
                FROM documents
            ), toks AS (
                SELECT doc_id,
                       regexp_split_to_array(trim(lower(text)), '\s+') AS t
                FROM corpus
            ), pos AS (
                SELECT doc_id, i - 1 AS pos,
                       ('0x' || substr(md5(array_to_string(
                            list_slice(t, i, i + 7), ' ')), 1, 15))::BIGINT AS h
                FROM (SELECT doc_id, t,
                             unnest(generate_series(1, len(t) - 7)) AS i
                      FROM toks WHERE len(t) >= 8)
            ), dups AS (
                SELECT h FROM pos GROUP BY h HAVING count(*) >= 2
            ), hits AS (
                SELECT doc_id, pos FROM pos SEMI JOIN dups USING (h)
            ), islands AS (
                SELECT doc_id, pos,
                       CASE WHEN coalesce(pos > max(pos + 8) OVER (
                                PARTITION BY doc_id ORDER BY pos
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                         AND 1 PRECEDING), TRUE)
                            THEN 1 ELSE 0 END AS newi
                FROM hits
            ), labeled AS (
                SELECT doc_id, pos,
                       sum(newi) OVER (PARTITION BY doc_id ORDER BY pos
                                       ROWS UNBOUNDED PRECEDING) AS island
                FROM islands
            )
            SELECT doc_id,
                   min(pos)::BIGINT AS span_start,
                   (max(pos) + 8)::BIGINT AS span_end,
                   (max(pos) + 8 - min(pos))::BIGINT AS n_tokens
            FROM labeled GROUP BY doc_id, island
        """,
        # mask rebuild: same span pipeline, then tokens outside every span
        # re-joined in order (case-preserving split — span indices come
        # from the lowered tokenization but \s+ positions are case-free)
        "masked_dup_spans": r"""
            WITH corpus AS (
                SELECT doc_id, text FROM documents
                UNION ALL
                SELECT doc_id + 1000000, regexp_replace(text, '\s+\S+\s*$', '')
                FROM documents
            ), toks AS (
                SELECT doc_id,
                       regexp_split_to_array(trim(lower(text)), '\s+') AS t
                FROM corpus
            ), pos AS (
                SELECT doc_id, i - 1 AS pos,
                       ('0x' || substr(md5(array_to_string(
                            list_slice(t, i, i + 7), ' ')), 1, 15))::BIGINT AS h
                FROM (SELECT doc_id, t,
                             unnest(generate_series(1, len(t) - 7)) AS i
                      FROM toks WHERE len(t) >= 8)
            ), dups AS (
                SELECT h FROM pos GROUP BY h HAVING count(*) >= 2
            ), hits AS (
                SELECT doc_id, pos FROM pos SEMI JOIN dups USING (h)
            ), islands AS (
                SELECT doc_id, pos,
                       CASE WHEN coalesce(pos > max(pos + 8) OVER (
                                PARTITION BY doc_id ORDER BY pos
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                         AND 1 PRECEDING), TRUE)
                            THEN 1 ELSE 0 END AS newi
                FROM hits
            ), labeled AS (
                SELECT doc_id, pos,
                       sum(newi) OVER (PARTITION BY doc_id ORDER BY pos
                                       ROWS UNBOUNDED PRECEDING) AS island
                FROM islands
            ), spans AS (
                SELECT doc_id, min(pos) AS s, max(pos) + 8 AS e
                FROM labeled GROUP BY doc_id, island
            ), raw AS (
                SELECT doc_id,
                       regexp_split_to_array(trim(text), '\s+') AS t2
                FROM corpus
            ), tok_idx AS (
                SELECT doc_id, i - 1 AS idx, t2[i] AS tok
                FROM (SELECT doc_id, t2,
                             unnest(generate_series(1, len(t2))) AS i
                      FROM raw)
            ), masked AS (
                SELECT k.doc_id,
                       string_agg(k.tok, ' ' ORDER BY k.idx) AS text
                FROM tok_idx k
                WHERE NOT EXISTS (
                    SELECT 1 FROM spans s
                    WHERE s.doc_id = k.doc_id
                      AND k.idx >= s.s AND k.idx < s.e)
                GROUP BY k.doc_id
            ), masked_counts AS (
                SELECT doc_id, sum(e - s)::BIGINT AS n FROM spans GROUP BY doc_id
            )
            SELECT c.doc_id,
                   CASE WHEN mc.n IS NULL THEN md5(c.text)
                        ELSE md5(coalesce(m.text, '')) END AS masked_md5,
                   coalesce(mc.n, 0)::BIGINT AS n_masked_tokens
            FROM corpus c
            LEFT JOIN masked m USING (doc_id)
            LEFT JOIN masked_counts mc USING (doc_id)
        """,
        # Recall oracle: LSH banding is probabilistic in general, but with
        # this (num_hashes=32, bands=8) config on the mutated-recrawl corpus
        # the candidate set provably-in-practice (deterministic signatures,
        # miss prob ≈ 3e-8 per true pair at J≈0.97) covers every true pair,
        # and the operator's exact-Jaccard verification removes all false
        # positives — so output == all pairs with true Jaccard ≥ 0.7.
        "minhash_pairs": _shingle_jaccard_oracle(k=3, threshold=0.7),
        "oph_minhash_pairs": _shingle_jaccard_oracle(k=3, threshold=0.7),
        # Same true-pair scan, endpoints tagged with the md5 hash_split
        # assignment; only cross-split pairs survive (the leakage audit).
        "split_leakage": _shingle_jaccard_oracle(
            k=3,
            threshold=0.7,
            final="""
            , splits AS (
                SELECT doc_id,
                       CASE WHEN u < 0.5 THEN 'train'
                            WHEN u < 0.75 THEN 'val'
                            ELSE 'test' END AS split
                FROM (
                    SELECT doc_id,
                           ('0x' || substr(md5('split:' || CAST(doc_id AS VARCHAR)),
                                           1, 15))::BIGINT
                           / 1152921504606846976.0 AS u
                    FROM corpus)
            )
            SELECT t.id_a, t.id_b,
                   sa.split AS split_a, sb.split AS split_b,
                   round(t.jaccard, 4) AS jaccard
            FROM truepairs t
            JOIN splits sa ON sa.doc_id = t.id_a
            JOIN splits sb ON sb.doc_id = t.id_b
            WHERE sa.split <> sb.split
            """,
        ),
        # The incremental (signature-store) path emits only pairs touching a
        # new id — old–old near-dups were yesterday's batch's output (some
        # exist: original docs that are near-dups of each other).
        "incremental_near_dups": _shingle_jaccard_oracle(
            k=3, threshold=0.7,
            final="""
                SELECT id_a, id_b, round(jaccard, 4) AS jaccard FROM truepairs
                WHERE id_a >= 1000000 OR id_b >= 1000000
            """,
        ),
        # Survivor oracle for the greedy near-dup removal (same recall
        # argument as minhash_pairs; exact verify removes false positives,
        # so dropped == distinct id_b of the true pair set).
        "dedup_near_survivors": _shingle_jaccard_oracle(
            k=3, threshold=0.7,
            final="""
                SELECT doc_id FROM corpus
                WHERE doc_id NOT IN (SELECT DISTINCT id_b FROM truepairs)
            """,
        ),
        # Transitive closure of the true pair set via recursive CTE — the
        # iterative label-propagation result is hash-checked end-to-end.
        "dedup_components": _shingle_jaccard_oracle(
            k=3, threshold=0.7,
            final="""
                SELECT doc_id, component FROM (
                    WITH RECURSIVE und AS (
                        SELECT id_a AS a, id_b AS b FROM truepairs
                        UNION
                        SELECT id_b AS a, id_a AS b FROM truepairs),
                    reach(a, b) AS (
                        SELECT a, b FROM und
                        UNION
                        SELECT r.a, u.b FROM reach r JOIN und u ON r.b = u.a),
                    comp AS (
                        SELECT a AS doc_id, least(a, min(b)) AS component
                        FROM reach GROUP BY a)
                    SELECT c.doc_id,
                           coalesce(comp.component, c.doc_id) AS component
                    FROM corpus c LEFT JOIN comp ON comp.doc_id = c.doc_id)
            """,
        ),
        # Exact oracle: banding recall is 1 by pigeonhole, and the md5-based
        # token hash is reproduced bit-for-bit in SQL.
        "simhash_pairs": _simhash_oracle(max_hamming=3),
        # Exact oracle: md5-based 60-bit fingerprints reproduced in SQL
        # (same normalization: trim spaces, lower, collapse \s runs).
        "doc_fingerprints": r"""
            WITH normed AS (
                SELECT doc_id,
                       regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS norm
                FROM documents),
            w AS (SELECT doc_id, norm, string_split(norm, ' ') AS words
                  FROM normed),
            sh AS (
                SELECT doc_id, norm,
                       list_transform(
                           generate_series(1, greatest(len(words) - 3, 1)),
                           i -> ('0x' || substr(md5(array_to_string(
                                    list_slice(words, i, i + 3), ' ')), 1, 15)
                                )::BIGINT) AS shs
                FROM w)
            SELECT doc_id,
                   ('0x' || substr(md5(norm), 1, 15))::BIGINT AS fingerprint,
                   list_aggregate(shs, 'min') AS min_shingle_hash
            FROM sh
        """,
        # Construction oracle: the page builder is deterministic, so the
        # classifier's recovered main content is a pure SQL function of the
        # documents table (heading + non-blank lines; boilerplate and ad
        # blocks must vanish by tag prior / link density).
        "html_boilerplate_extract": """
            WITH lined AS (
                SELECT doc_id,
                       list_filter(string_split(text, chr(10)),
                                   x -> regexp_matches(x, '[^ \\t\\r]')) AS lines
                FROM documents),
            built AS (
                SELECT doc_id, len(lines) AS n_paragraphs,
                       'Document ' || CAST(doc_id AS VARCHAR) || chr(10) ||
                       CASE WHEN len(lines) = 0 THEN ''
                            ELSE array_to_string(lines, chr(10)) || chr(10)
                       END AS expected
                FROM lined)
            SELECT 'doc://' || CAST(doc_id AS VARCHAR) AS url,
                   sha256(expected) AS text_sha,
                   length(expected)::BIGINT AS n_chars,
                   1::BIGINT AS n_headings,
                   n_paragraphs::BIGINT AS n_paragraphs
            FROM built
        """,
        # Readability mode over the same constructed page: when any
        # non-blank line has trim-length >= 25 the body candidate wins
        # and ads/nav are removed -> identical content to the density
        # mode; otherwise nothing scores and the doc extracts EMPTY.
        "readability_extract": """
            WITH lined AS (
                SELECT doc_id,
                       list_filter(string_split(text, chr(10)),
                                   x -> regexp_matches(x, '[^ \t\r]')) AS lines
                FROM documents),
            flags AS (
                SELECT doc_id, lines,
                       len(list_filter(lines,
                           x -> length(trim(x, ' ' || chr(9) || chr(13)
                                             || chr(10))) >= 25)) > 0
                           AS has_prose
                FROM lined),
            built AS (
                SELECT doc_id,
                       CASE WHEN has_prose THEN len(lines) ELSE 0 END
                           AS n_paragraphs,
                       CASE WHEN has_prose THEN 1 ELSE 0 END AS n_headings,
                       CASE WHEN NOT has_prose THEN ''
                            ELSE 'Document ' || CAST(doc_id AS VARCHAR)
                                 || chr(10) ||
                                 CASE WHEN len(lines) = 0 THEN ''
                                      ELSE array_to_string(lines, chr(10))
                                           || chr(10) END
                       END AS expected
                FROM flags)
            SELECT 'doc://' || CAST(doc_id AS VARCHAR) AS url,
                   sha256(expected) AS text_sha,
                   length(expected)::BIGINT AS n_chars,
                   n_headings::BIGINT AS n_headings,
                   n_paragraphs::BIGINT AS n_paragraphs
            FROM built
        """,
        "image_caption_pairs": """
            WITH d AS (
                SELECT doc_id,
                       len(list_filter(string_split(text, chr(10)),
                           x -> regexp_matches(x, '[^ \\t\\r]'))) AS n
                FROM documents),
            imgs AS (
                SELECT doc_id, 0::BIGINT AS seq, '/logo.png' AS src,
                       'site logo' AS caption, TRUE AS boilerplate,
                       'http://crawl.invalid/logo.png' AS img_url
                FROM d
                UNION ALL
                SELECT doc_id, (1 + k)::BIGINT,
                       '/img/' || CAST(doc_id AS VARCHAR) || '/'
                           || CAST(k AS VARCHAR) || '.jpg',
                       'Figure ' || CAST(k AS VARCHAR) || ' of document '
                           || CAST(doc_id AS VARCHAR),
                       FALSE,
                       'http://crawl.invalid/img/'
                           || CAST(doc_id AS VARCHAR) || '/'
                           || CAST(k AS VARCHAR) || '.jpg'
                FROM (SELECT doc_id,
                             unnest(generate_series(0, n // 3 - 1)) AS k
                      FROM d)
                UNION ALL
                SELECT doc_id, (1 + n // 3)::BIGINT,
                       '//cdn.crawl.invalid/badge.png', '', TRUE,
                       'http://cdn.crawl.invalid/badge.png'
                FROM d)
            SELECT 'http://crawl.invalid/doc/' || CAST(doc_id AS VARCHAR)
                       AS url,
                   seq, src, caption, boilerplate, img_url
            FROM imgs
        """,
        # Deterministic-corpus golden: expected features per media_id
        # computed once by the same pure stdlib codecs, inlined as VALUES.
        "media_features": _media_features_oracle(),
        # Reference-derived goldens: byte-identical extracted text per url.
        **_extraction_oracles(),
        # Approximate-ANN oracles: same hyperplanes/centroids inlined as
        # literals, bucket/cell assignment and ranking recomputed in SQL.
        "ann_topk_lsh": _lsh_topk_oracle(),
        "project_embeddings": _project_embeddings_oracle(),
        **(
            {"ann_topk_ivf": o} if (o := _ivf_topk_oracle()) is not None else {}
        ),
        **(
            {"kmeans_profile": o}
            if (o := _kmeans_profile_oracle()) is not None
            else {}
        ),
        **(
            {"semantic_dedup": o}
            if (o := _semantic_dedup_oracle()) is not None
            else {}
        ),
        "encoding_signals": _encoding_signals_oracle(),
        "ocr_artifacts": _ocr_artifacts_oracle(),
        # Native percent_rank window — the per-(lang,bucket) rank +
        # cross-bucket offset reconstruction must equal it exactly.
        "calibrated_scores": """
            WITH feats AS (
                SELECT doc_id, lang,
                       round(length(regexp_replace(text,
                               '[^A-Za-zÀ-ÖØ-öø-ÿ]', '', 'g'))
                             / greatest(length(text), 1), 6) AS score
                FROM documents)
            SELECT doc_id, lang, score,
                   round(percent_rank() OVER (PARTITION BY lang
                         ORDER BY score), 6)::DOUBLE AS pct_rank
            FROM feats
        """,
        # Artetxe-Schwenk margin: micro-unit cosine ints, exact top-k
        # neighborhood sums, one double division — mirrors
        # similarity.bitext_margin_mine term for term.
        "bitext_mining": f"""
            WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v
                       FROM embeddings),
            s AS (SELECT vec_id AS src_id, v FROM e WHERE vec_id % 2 = 0),
            t AS (SELECT vec_id AS tgt_id, v FROM e WHERE vec_id % 2 = 1),
            scored AS (
                SELECT s.src_id, t.tgt_id,
                       round({_COSINE.format(a='s.v', b='t.v')} * 1000000,
                             0)::BIGINT AS c6
                FROM s CROSS JOIN t),
            nx AS (
                SELECT src_id, sum(c6) AS sx, count(*) AS cx FROM (
                    SELECT src_id, c6,
                           row_number() OVER (PARTITION BY src_id
                               ORDER BY c6 DESC, tgt_id) AS r
                    FROM scored) WHERE r <= 4 GROUP BY src_id),
            ny AS (
                SELECT tgt_id, sum(c6) AS sy, count(*) AS cy FROM (
                    SELECT tgt_id, c6,
                           row_number() OVER (PARTITION BY tgt_id
                               ORDER BY c6 DESC, src_id) AS r
                    FROM scored) WHERE r <= 4 GROUP BY tgt_id),
            m AS (
                SELECT sc.src_id, sc.tgt_id, sc.c6,
                       round(sc.c6 * 2.0 * nx.cx * ny.cy
                             / (nx.sx * ny.cy + ny.sy * nx.cx), 6) AS margin
                FROM scored sc
                JOIN nx ON sc.src_id = nx.src_id
                JOIN ny ON sc.tgt_id = ny.tgt_id
                WHERE round(sc.c6 * 2.0 * nx.cx * ny.cy
                            / (nx.sx * ny.cy + ny.sy * nx.cx), 6) >= 1.02)
            SELECT src_id, tgt_id, (c6 / 1000000)::DOUBLE AS cosine,
                   margin::DOUBLE AS margin
            FROM (SELECT *, row_number() OVER (PARTITION BY src_id
                      ORDER BY margin DESC, tgt_id) AS rk FROM m)
            WHERE rk = 1
        """,
        # Salted md5-60 shard hash + per-shard rank, one window.
        "training_shards": """
            WITH h AS (
                SELECT doc_id,
                       ('0x' || substr(md5('epoch0:' ||
                           CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT AS hv
                FROM documents)
            SELECT doc_id,
                   (hv % 16)::INTEGER AS shard,
                   row_number() OVER (PARTITION BY hv % 16
                                      ORDER BY hv, doc_id)::INTEGER AS pos
            FROM h
        """,
        # Rendezvous hashing: argmax over 8 per-shard hashes; QUALIFY
        # (h DESC, s DESC) matches array_max's lexicographic struct
        # order (max hash, ties to max s).
        "hrw_shards": """
            WITH c AS (
                SELECT doc_id, s,
                       ('0x' || substr(md5(doc_id || ':hrw:' || s), 1, 15))
                           ::BIGINT AS h
                FROM documents,
                     (SELECT unnest(generate_series(0, 7)) AS s)
            )
            SELECT doc_id, s::INTEGER AS shard, h::BIGINT AS shard_weight
            FROM c
            QUALIFY row_number() OVER (PARTITION BY doc_id
                                       ORDER BY h DESC, s DESC) = 1
        """,
        **(
            {"bpe_merges": o}
            if (o := _bpe_merges_oracle()) is not None
            else {}
        ),
        "extraction_eval": _extraction_eval_oracle(),
        **(
            {"bpe_encode": o}
            if (o := _bpe_encode_oracle()) is not None
            else {}
        ),
        **(
            {"wordpiece_symbols": o}
            if (o := _wordpiece_symbols_oracle()) is not None
            else {}
        ),
        **(
            {"bpe_fertility": o}
            if (o := _bpe_fertility_oracle()) is not None
            else {}
        ),
        # JSON-LD: replay the synthetic block layout directly (Article
        # always block 0; BreadcrumbList next when doc_id%5=0; the
        # malformed block takes the following slot when doc_id%7=3) and
        # parse with DuckDB's JSON parser behind a json_valid guard —
        # its json_extract RAISES on malformed input where Spark's
        # get_json_object returns NULL.
        "jsonld_extract": """
            WITH docs AS (
                SELECT doc_id,
                       'doc://' || CAST(doc_id AS VARCHAR) AS url,
                       (doc_id % 5 = 0) AS has_crumbs,
                       (doc_id % 7 = 3) AS has_bad
                FROM documents
            ), blocks AS (
                SELECT url, 0 AS block_id,
                       '{"@type":"Article","name":"Document '
                           || CAST(doc_id AS VARCHAR)
                           || '","datePublished":"2025-01-'
                           || lpad(CAST((doc_id % 28) + 1 AS VARCHAR),
                                   2, '0')
                           || '"}' AS block
                FROM docs
                UNION ALL
                SELECT url, 1,
                       '{"@type":"BreadcrumbList","name":"crumbs '
                           || CAST(doc_id AS VARCHAR) || '"}'
                FROM docs WHERE has_crumbs
                UNION ALL
                SELECT url, CASE WHEN has_crumbs THEN 2 ELSE 1 END,
                       '{oops not json'
                FROM docs WHERE has_bad
            )
            SELECT url, block_id::INT AS block_id,
                   CASE WHEN json_valid(block) THEN
                       json_extract_string(block, '$."@type"') END
                       AS ld_type,
                   CASE WHEN json_valid(block) THEN
                       json_extract_string(block, '$.name') END
                       AS ld_name,
                   CASE WHEN json_valid(block) THEN
                       json_extract_string(block, '$.datePublished') END
                       AS ld_date
            FROM blocks
        """,
        # Templates: same skeleton regexes (hex-run pass before digit
        # pass, global flag explicit in DuckDB), same share window.
        "url_templates": r"""
            WITH urls AS (
                SELECT CASE
                    WHEN doc_id % 4 = 0 THEN
                        'https://site' || CAST(doc_id % 5 AS VARCHAR)
                        || '.com/cal/2024/'
                        || lpad(CAST((doc_id % 12) + 1 AS VARCHAR), 2, '0')
                        || '/' || CAST(doc_id AS VARCHAR)
                    WHEN doc_id % 4 = 1 THEN
                        'https://site' || CAST(doc_id % 5 AS VARCHAR)
                        || '.com/article/' || CAST(doc_id AS VARCHAR)
                        || '-page'
                    WHEN doc_id % 4 = 2 THEN
                        'https://site' || CAST(doc_id % 5 AS VARCHAR)
                        || '.com/session/'
                        || substr(md5(CAST(doc_id AS VARCHAR)), 1, 16)
                        || '/view?sid=' || CAST(doc_id AS VARCHAR)
                    ELSE 'https://site' || CAST(doc_id % 5 AS VARCHAR)
                         || '.com/about' END AS url
                FROM documents
            ), slim AS (
                SELECT regexp_extract(lower(url),
                           '^[a-z][a-z0-9+.\-]*://([^/:?#]*)', 1)
                           AS host,
                       regexp_replace(regexp_replace(
                           regexp_extract(url,
                               '^[a-z][a-z0-9+.\-]*://[^/]*(/[^?#]*)?', 1),
                           '[0-9a-f]{8,}', '{H}', 'g'),
                           '[0-9]+', '{N}', 'g') AS template
                FROM urls
            ), named AS (
                SELECT CASE WHEN regexp_extract(host, '([^.]+\.[^.]+)$', 1)
                                 <> ''
                            THEN regexp_extract(host, '([^.]+\.[^.]+)$', 1)
                            ELSE host END AS domain,
                       CASE WHEN template = '' THEN '/' ELSE template END
                           AS template
                FROM slim
            ), counts AS (
                SELECT domain, template, count(*)::BIGINT AS n_urls
                FROM named GROUP BY domain, template
            )
            SELECT domain, template, n_urls,
                   round(n_urls / (sum(n_urls) OVER (PARTITION BY domain))
                         ::DOUBLE, 6) AS share
            FROM counts WHERE n_urls >= 2
        """,
        "license_signals": _license_signals_oracle(),
        # Flesch: same counts, same division order, round 4.
        "flesch_scores": """
            WITH base AS (
                SELECT doc_id, lower(coalesce(text, '')) AS lt
                FROM documents
            ), c AS (
                SELECT doc_id,
                       len(regexp_extract_all(lt, '[.!?]+')) AS n_sentences,
                       len(regexp_extract_all(lt, '[a-zà-öø-ÿ]+'))
                           AS n_words,
                       len(regexp_extract_all(lt, '[aeiouy]+')) AS vg
                FROM base
            )
            SELECT doc_id,
                   n_sentences::INT AS n_sentences,
                   n_words::INT AS n_words,
                   greatest(vg, n_words)::INT AS n_syllables,
                   CASE WHEN n_sentences > 0 AND n_words > 0 THEN
                       round(206.835::DOUBLE
                             - 1.015::DOUBLE * (n_words / n_sentences)
                             - 84.6::DOUBLE
                               * (greatest(vg, n_words) / n_words), 4)
                   END AS flesch
            FROM c
        """,
        # Outliers: component explode via generate_series, same naive
        # moments, z compared on the rounded value.
        "embedding_outliers": """
            WITH comp AS (
                SELECT vec_id, label, u.j AS j, u.val AS val
                FROM (SELECT vec_id, label,
                             embedding::DOUBLE[] AS v FROM embeddings),
                     UNNEST(list_transform(generate_series(1, len(v)),
                            j -> {'j': j, 'val': v[j]})) AS t(u)
            ), cent AS (
                SELECT label, j, avg(val) AS m FROM comp GROUP BY label, j
            ), d AS (
                SELECT c.vec_id, c.label,
                       sqrt(sum((c.val - ct.m) * (c.val - ct.m))) AS dist
                FROM comp c JOIN cent ct ON c.label = ct.label AND c.j = ct.j
                GROUP BY c.vec_id, c.label
            ), base AS (
                -- every input vector keeps its verdict row: NULL/empty
                -- embeddings (no comp rows) surface with dist NULL and
                -- is_outlier = true, mirroring the Spark operator
                SELECT e.vec_id, e.label, d.dist
                FROM embeddings e
                LEFT JOIN d ON e.vec_id = d.vec_id AND e.label = d.label
            ), stats AS (
                SELECT label, avg(dist) AS mu, avg(dist * dist) AS m2
                FROM base GROUP BY label
            )
            SELECT b.vec_id, b.label,
                   round(b.dist, 6) AS dist,
                   round(CASE WHEN sqrt(s.m2 - s.mu * s.mu) > 0
                              THEN (b.dist - s.mu)
                                   / sqrt(s.m2 - s.mu * s.mu) END, 4) AS z,
                   CASE WHEN b.dist IS NULL THEN TRUE
                        ELSE coalesce(round(CASE WHEN sqrt(s.m2 - s.mu * s.mu) > 0
                              THEN (b.dist - s.mu)
                                   / sqrt(s.m2 - s.mu * s.mu) END, 4)
                            > 2.0::DOUBLE, FALSE) END AS is_outlier
            FROM base b LEFT JOIN stats s ON b.label = s.label
        """,
        # Temperature sampling: n^alpha as exp(a ln n) quantized to
        # integer micro-units (the 1-ulp libm difference dies in the
        # floor), integer normalizing sum, one division at the end.
        "temperature_mixture": """
            WITH sizes AS (
                SELECT lang, sum(n_chars)::BIGINT AS n_units
                FROM documents GROUP BY lang
                HAVING sum(n_chars) > 0
            ), wtd AS (
                SELECT lang, n_units,
                       floor(exp(0.5::DOUBLE * ln(n_units))
                             * 1000000.0::DOUBLE + 0.5)::BIGINT AS w
                FROM sizes
            ), tot AS (
                SELECT sum(w)::BIGINT AS tw, sum(n_units)::BIGINT AS tn
                FROM wtd
            )
            SELECT lang, n_units,
                   round(n_units / tn, 6) AS share_raw,
                   round(w / tw, 6) AS share_temp,
                   floor((w / tw) * 10000000)::BIGINT AS target_units,
                   round(floor((w / tw) * 10000000) / n_units, 4) AS epochs
            FROM wtd CROSS JOIN tot
        """,
        # Code signals: same four families under RE2 (?m); thresholds
        # compare the same rounded values.
        "code_signals": r"""
            WITH docs AS (
                SELECT doc_id,
                       CASE WHEN doc_id % 7 = 3 THEN
                           'def handler_' || CAST(doc_id AS VARCHAR)
                           || '(x):' || chr(10) || '    return x + '
                           || CAST(doc_id AS VARCHAR) || ';' || chr(10)
                           || chr(10) || 'class Page'
                           || CAST(doc_id AS VARCHAR) || ':' || chr(10)
                           || '    import os' || chr(10)
                           || '    var cache = {};' || chr(10)
                           || '    const LIMIT = '
                           || CAST(doc_id AS VARCHAR) || ';' || chr(10)
                       ELSE text END AS text
                FROM documents
            ), base AS (
                SELECT doc_id, coalesce(text, '') AS t FROM docs
            ), feats AS (
                SELECT doc_id,
                    greatest(length(t), 1)::DOUBLE AS n_chars,
                    greatest(CASE WHEN t = '' THEN 0
                             ELSE len(regexp_extract_all(t, '\n')) + 1 END,
                             1)::DOUBLE AS n_lines,
                    len(regexp_extract_all(t, '[{}();=<>]')) AS n_punct,
                    len(regexp_extract_all(t, '(?m)^[ \t]{2,}\S'))
                        AS n_indent,
                    len(regexp_extract_all(t, '(?m)[;{}][ \t\r]*$'))
                        AS n_termin,
                    (CASE WHEN regexp_matches(t, '\bdef\b') THEN 1 ELSE 0 END
                     + CASE WHEN regexp_matches(t, '\breturn\b') THEN 1 ELSE 0 END
                     + CASE WHEN regexp_matches(t, '\bimport\b') THEN 1 ELSE 0 END
                     + CASE WHEN regexp_matches(t, '\bfunction\b') THEN 1 ELSE 0 END
                     + CASE WHEN regexp_matches(t, '\bvar\b') THEN 1 ELSE 0 END
                     + CASE WHEN regexp_matches(t, '\bconst\b') THEN 1 ELSE 0 END
                     + CASE WHEN regexp_matches(t, '\bclass\b') THEN 1 ELSE 0 END
                     + CASE WHEN regexp_matches(t, '\bvoid\b') THEN 1 ELSE 0 END
                     + CASE WHEN regexp_matches(t, '\binclude\b') THEN 1 ELSE 0 END
                     + CASE WHEN regexp_matches(t, '\bpublic\b') THEN 1 ELSE 0 END
                    )::INT AS keyword_hits
                FROM base
            ), sig AS (
                SELECT doc_id,
                       round(n_punct / n_chars, 6) AS punct_density,
                       round(n_indent / n_lines, 6) AS indent_ratio,
                       round(n_termin / n_lines, 6) AS terminator_ratio,
                       keyword_hits
                FROM feats
            )
            SELECT doc_id, punct_density, indent_ratio, terminator_ratio,
                   keyword_hits,
                   ((punct_density >= 0.02 AND indent_ratio >= 0.2)
                    OR (keyword_hits >= 3 AND punct_density >= 0.01))
                       AS is_code
            FROM sig
        """,
        # Tiers: gopher algebra as a CTE + the keep-lowest exact-dup
        # window; thresholds compare the same rounded signals.
        "corpus_tiers": """
            WITH g AS (""" + _GOPHER_ORACLE + """),
            dup AS (
                SELECT doc_id,
                       doc_id <> min(doc_id) OVER (
                           PARTITION BY md5(coalesce(text, ''))
                       ) AS dup_loser
                FROM documents
            )
            SELECT g.doc_id, d.dup_loser, g.keep,
                   CASE WHEN d.dup_loser OR g.n_words < 25
                             OR g.alpha_word_ratio <= 0.8
                             OR g.symbol_ratio >= 0.1 THEN 'reject'
                        WHEN g.n_words >= 70
                             AND g.mean_word_len BETWEEN 3.0 AND 10.0
                             THEN 'head'
                        ELSE 'mid' END AS tier
            FROM g JOIN dup d ON g.doc_id = d.doc_id
        """,
        # Mirrors: same registrable-domain extraction (last two host
        # labels), same md5-of-coalesced-text key, sorted distinct CSV.
        "mirror_domains": """
            WITH pages AS (
                SELECT 'site' || CAST(doc_id % 13 AS VARCHAR) || '.com'
                           AS domain,
                       md5(coalesce(text, '')) AS content_md5
                FROM documents
                UNION ALL
                SELECT 'mirror-site' || CAST(doc_id % 13 AS VARCHAR)
                           || '.org' AS domain,
                       md5(coalesce(text, '')) AS content_md5
                FROM documents WHERE doc_id % 10 = 0
            )
            SELECT content_md5,
                   count(*)::BIGINT AS n_pages,
                   count(DISTINCT domain)::INT AS n_domains,
                   array_to_string(list_sort(list_distinct(list(domain))),
                                   ',') AS domains_csv
            FROM pages GROUP BY content_md5
            HAVING count(DISTINCT domain) >= 2
        """,
        # C4: same line predicates via list_filter (RE2 both sides),
        # same page rules; cleaned bytes compared by md5.
        "c4_page_filter": r"""
            WITH lined AS (
                SELECT doc_id,
                       coalesce(text, '') AS t,
                       string_split(coalesce(text, ''), chr(10)) AS lines
                FROM documents
            ), kept AS (
                SELECT doc_id, t, len(lines) AS n_lines,
                       list_filter(lines, x ->
                           regexp_matches(x, '[.!?"][ \t\r]*$')
                           AND len(regexp_extract_all(x, '\S+')) >= 3
                           AND NOT contains(lower(x), 'javascript')
                       ) AS keptl
                FROM lined
            ), c AS (
                SELECT doc_id, n_lines, len(keptl) AS n_kept,
                       coalesce(array_to_string(keptl, chr(10)), '')
                           AS cleaned, t
                FROM kept
            )
            SELECT doc_id,
                   n_lines::INT AS n_lines,
                   n_kept::INT AS n_kept,
                   len(regexp_extract_all(cleaned, '[.!?]'))::INT
                       AS n_sentences,
                   (len(regexp_extract_all(cleaned, '[.!?]')) >= 5
                    AND NOT contains(lower(t), 'lorem ipsum')
                    AND NOT contains(t, '{')) AS page_kept,
                   md5(cleaned) AS cleaned_md5
            FROM c
        """,
        # HLL: same md5-60 bucket/rank split, integer harmonic sum in
        # units of 2^-53 (exact, order-independent), same linear-counting
        # branch; alpha mirrored as the same expression shape.
        "hll_domain_distinct": """
            WITH pages AS (
                SELECT 'site' || CAST(doc_id % 13 AS VARCHAR) || '.com'
                           AS domain,
                       'https://site' || CAST(doc_id % 13 AS VARCHAR)
                           || '.com/doc/' || CAST(doc_id AS VARCHAR) AS url
                FROM documents
            ), hashed AS (
                SELECT domain,
                       ('0x' || substr(md5(url), 1, 15))::BIGINT AS h
                FROM pages
            ), regs AS (
                SELECT domain, h >> 52 AS bucket,
                       max(CASE WHEN (h & 4503599627370495) = 0 THEN 53
                                ELSE 52 - length(bin(h & 4503599627370495))
                                     + 1 END) AS max_rho
                FROM hashed GROUP BY domain, bucket
            ), agg AS (
                SELECT domain,
                       sum((1::BIGINT << (53 - max_rho)))::BIGINT
                           AS present_sum,
                       count(*)::BIGINT AS n_present
                FROM regs GROUP BY domain
            ), raws AS (
                SELECT domain,
                       (0.7213::DOUBLE / (1 + 1.079::DOUBLE / 256)) * 256
                           * 256 * 9007199254740992::DOUBLE
                           / (present_sum
                              + (256 - n_present) * 9007199254740992)
                           AS raw,
                       256 - n_present AS v
                FROM agg
            ), ests AS (
                SELECT domain,
                       round(CASE WHEN raw <= 2.5::DOUBLE * 256 AND v > 0
                                  THEN 256 * ln(256 / v::DOUBLE)
                                  ELSE raw END, 4) AS est_distinct
                FROM raws
            ), exact AS (
                SELECT domain, count(DISTINCT url)::BIGINT AS exact_distinct
                FROM pages GROUP BY domain
            )
            SELECT e.domain, x.exact_distinct, e.est_distinct,
                   round(abs(e.est_distinct - x.exact_distinct)
                         / x.exact_distinct, 4) AS rel_error
            FROM ests e JOIN exact x ON e.domain = x.domain
        """,
        # Histogram sketch: same bin clamp, cumulative walk, and linear
        # interpolation (width 100.0 = (5000-0)/50, exact in double).
        "histogram_quantiles": """
            WITH vals AS (
                SELECT n_chars::DOUBLE AS x FROM documents
                WHERE n_chars IS NOT NULL
            ), bins AS (
                SELECT least(greatest(floor((x - 0.0) / 100.0), 0),
                             49)::BIGINT AS bin,
                       count(*)::BIGINT AS c
                FROM vals GROUP BY 1
            ), cum AS (
                SELECT bin, c,
                       sum(c) OVER (ORDER BY bin) AS cum,
                       coalesce(sum(c) OVER (ORDER BY bin
                           ROWS BETWEEN UNBOUNDED PRECEDING
                           AND 1 PRECEDING), 0) AS cum_before
                FROM bins
            ), tot AS (SELECT sum(c)::BIGINT AS n FROM bins),
            qs AS (
                SELECT unnest([0.25, 0.5, 0.9, 0.99]::DOUBLE[]) AS q
            ), hit AS (
                SELECT q.q, t.n, c.bin, c.c, c.cum_before,
                       row_number() OVER (PARTITION BY q.q
                                          ORDER BY c.bin) AS rn
                FROM qs q CROSS JOIN tot t
                JOIN cum c ON c.cum >= q.q * t.n
            )
            SELECT q,
                   round(0.0 + (bin + (q * n - cum_before) / c) * 100.0, 6)
                       AS estimate
            FROM hit WHERE rn = 1
        """,
        # Bloom: same md5-60 bit arithmetic; all-6-bits-set membership.
        "bloom_membership": """
            WITH urls AS (
                SELECT doc_id,
                       'https://crawl.invalid/doc/' || doc_id AS url
                FROM documents
            ), ks AS (
                SELECT unnest(generate_series(0, 5)) AS i
            ), bits AS (
                SELECT DISTINCT
                       ('0x' || substr(md5(CAST(i AS VARCHAR) || ':'
                           || url), 1, 15))::BIGINT % 8192 AS bit
                FROM urls CROSS JOIN ks
                WHERE doc_id % 3 = 0
            ), probes AS (
                SELECT u.doc_id,
                       ('0x' || substr(md5(CAST(i AS VARCHAR) || ':'
                           || u.url), 1, 15))::BIGINT % 8192 AS bit
                FROM urls u CROSS JOIN ks
            ), hits AS (
                SELECT doc_id,
                       (sum(CASE WHEN b.bit IS NOT NULL THEN 1 ELSE 0 END)
                        = 6) AS might_contain
                FROM probes p LEFT JOIN bits b ON b.bit = p.bit
                GROUP BY doc_id
            )
            SELECT doc_id, might_contain,
                   (doc_id % 3 = 0) AS actually_in
            FROM hits
        """,
        # Wilson bound: identical expression shape (z² as the double
        # product 1.96::DOUBLE * 1.96::DOUBLE, same nesting), rounded 6 dp.
        "domain_quality_rank": """
            WITH d AS (
                SELECT 'site' || CAST(doc_id % 13 AS VARCHAR) || '.com'
                           AS domain,
                       (n_chars >= 400) AS keep
                FROM documents
            ), agg AS (
                SELECT domain, count(*)::BIGINT AS n_docs,
                       sum(CASE WHEN keep THEN 1 ELSE 0 END)::BIGINT
                           AS n_quality
                FROM d GROUP BY domain
            )
            SELECT domain, n_docs, n_quality,
                   round(n_quality / n_docs::DOUBLE, 6) AS quality_rate,
                   round(((n_quality / n_docs::DOUBLE)
                          + (1.96::DOUBLE * 1.96::DOUBLE)
                              / (2 * n_docs::DOUBLE)
                          - 1.96::DOUBLE * sqrt((
                                (n_quality / n_docs::DOUBLE)
                                * (1 - (n_quality / n_docs::DOUBLE))
                                + (1.96::DOUBLE * 1.96::DOUBLE)
                                    / (4 * n_docs::DOUBLE)
                            ) / n_docs::DOUBLE))
                         / (1 + (1.96::DOUBLE * 1.96::DOUBLE)
                                / n_docs::DOUBLE), 6) AS wilson_lb
            FROM agg
        """,
        # CMS: same md5 bucket arithmetic, counters, and min-over-rows;
        # the top-30 cut orders by (count desc, token asc) in both engines.
        "cms_heavy_hitters": """
            WITH toks AS (
                SELECT unnest(regexp_extract_all(lower(coalesce(text, '')),
                              '[a-zà-öø-ÿ]+')) AS tok
                FROM documents
            ), truec AS (
                SELECT tok, count(*)::BIGINT AS true_n FROM toks GROUP BY tok
            ), top AS (
                SELECT tok, true_n FROM truec
                ORDER BY true_n DESC, tok LIMIT 30
            ), rows_ AS (
                SELECT unnest(generate_series(0, 3)) AS row
            ), counters AS (
                SELECT r.row,
                       ('0x' || substr(md5(CAST(r.row AS VARCHAR) || ':'
                           || t.tok), 1, 15))::BIGINT % 1024 AS bucket,
                       count(*)::BIGINT AS c
                FROM toks t CROSS JOIN rows_ r
                GROUP BY 1, 2
            ), probes AS (
                SELECT top.tok, top.true_n, r.row,
                       ('0x' || substr(md5(CAST(r.row AS VARCHAR) || ':'
                           || top.tok), 1, 15))::BIGINT % 1024 AS bucket
                FROM top CROSS JOIN rows_ r
            )
            SELECT p.tok, p.true_n,
                   min(coalesce(c.c, 0))::BIGINT AS cms_est
            FROM probes p
            LEFT JOIN counters c ON c.row = p.row AND c.bucket = p.bucket
            GROUP BY p.tok, p.true_n
        """,
        # Intra-doc line collapse: the same index-lambda filter (keep line
        # i iff blank or first occurrence) replayed with DuckDB lambdas.
        "collapse_lines": """
            WITH pages AS (
                SELECT doc_id,
                       'NAV MENU' || chr(10) || coalesce(text, '')
                       || chr(10) || 'NAV MENU' || chr(10)
                       || split_part(coalesce(text, ''), chr(10), 1) AS t
                FROM documents
            ), arr AS (
                SELECT doc_id, string_split(t, chr(10)) AS ls FROM pages
            ), kept AS (
                SELECT doc_id, ls,
                       list_filter(ls, (x, i) -> x = ''
                                   OR list_position(ls, x) = i) AS ks
                FROM arr
            )
            SELECT doc_id,
                   array_to_string(ks, chr(10)) AS text_clean,
                   len(ls)::INT AS n_lines,
                   (len(ls) - len(ks))::INT AS n_dropped
            FROM kept
        """,
        # Blocklist: identical separator-doubling normalize + literal
        # replace arithmetic in both engines.
        "term_blocklist": """
            WITH pages AS (
                SELECT doc_id,
                       CASE WHEN doc_id % 7 = 2 THEN coalesce(text, '')
                            || ' Click here to subscribe. Casino winner!'
                            || ' Click here now.'
                       ELSE text END AS text
                FROM documents
            ), low AS (
                SELECT doc_id, lower(coalesce(text, '')) AS lt FROM pages
            ), norm AS (
                SELECT doc_id, lt,
                       ' ' || regexp_replace(lt, '[^a-zà-öø-ÿ]+', '  ', 'g')
                       || ' ' AS nm
                FROM low
            ), hits AS (
                SELECT doc_id,
                       ((length(nm) - length(replace(nm, ' click  here ', '')))
                            // length(' click  here ')
                        + (length(nm) - length(replace(nm, ' subscribe ', '')))
                            // length(' subscribe ')
                        + (length(nm) - length(replace(nm, ' casino ', '')))
                            // length(' casino ')
                        + (length(nm) - length(replace(nm, ' winner ', '')))
                            // length(' winner ')
                        + (length(nm) - length(replace(nm, ' buy  now ', '')))
                            // length(' buy  now ')
                        + (length(nm) - length(replace(nm,
                              ' lorem  ipsum ', ''))) // length(' lorem  ipsum ')
                       )::INT AS n_blocklist_hits,
                       len(regexp_extract_all(lt, '[a-zà-öø-ÿ]+'))
                           AS n_words
                FROM norm
            )
            SELECT doc_id, n_blocklist_hits,
                   round(n_blocklist_hits
                         / greatest(n_words, 1)::DOUBLE, 6) AS blocked_ratio,
                   (n_blocklist_hits >= 1) AS is_blocked
            FROM hits
        """,
        # Mixture: T* = min(available/frac), rate = frac*T*/available,
        # membership by the md5 unit hash; target fractions cast ::DOUBLE
        # immediately (a bare VALUES 0.4 is DECIMAL in DuckDB and would
        # poison the arithmetic/formatting).
        "corpus_mixture": """
            WITH targets AS (
                SELECT source, target_frac::DOUBLE AS target_frac
                FROM (VALUES ('src0', 0.4), ('src1', 0.3),
                             ('src2', 0.2), ('src3', 0.1))
                     t(source, target_frac)
            ), avail AS (
                SELECT source, sum(n_chars)::BIGINT AS available
                FROM documents GROUP BY source
            ), plan AS (
                SELECT t.source, t.target_frac,
                       coalesce(a.available, 0)::BIGINT AS available
                FROM targets t LEFT JOIN avail a ON a.source = t.source
            ), tstar AS (
                SELECT min(available / target_frac) AS t FROM plan
            ), rates AS (
                SELECT source, target_frac, available,
                       CASE WHEN available > 0
                            THEN target_frac * tstar.t / available
                            ELSE 0.0 END AS rate
                FROM plan, tstar
            ), kept AS (
                SELECT d.source, count(*)::BIGINT AS n_docs_kept,
                       sum(d.n_chars)::BIGINT AS chars_kept
                FROM documents d JOIN rates r ON r.source = d.source
                WHERE ('0x' || substr(md5('mixture:'
                          || CAST(d.doc_id AS VARCHAR)), 1, 15))::BIGINT
                      / 1152921504606846976.0 < r.rate
                GROUP BY d.source
            )
            SELECT r.source, round(r.target_frac, 6) AS target_frac,
                   r.available, round(r.rate, 6) AS rate,
                   coalesce(k.n_docs_kept, 0)::BIGINT AS n_docs_kept,
                   coalesce(k.chars_kept, 0)::BIGINT AS chars_kept
            FROM rates r LEFT JOIN kept k ON k.source = r.source
        """,
        # Soft-404: phrase membership via contains() on the lowered body,
        # word tokens via the shared token class, URL hint via the same
        # RE2-safe pattern; every-11th doc rewritten as in the Spark query.
        "soft404_detect": """
            WITH pages AS (
                SELECT doc_id,
                       CASE WHEN doc_id % 11 = 3 THEN
                           '404 Page Not Found - The requested URL /doc/'
                           || doc_id || ' was not found on this server.'
                       ELSE text END AS text,
                       CASE WHEN doc_id % 11 = 3 THEN
                           'https://crawl.invalid/' || doc_id || '/404'
                       ELSE 'https://crawl.invalid/doc/' || doc_id
                       END AS url
                FROM documents
            ), low AS (
                SELECT doc_id, url,
                       lower(coalesce(text, '')) AS t
                FROM pages
            ), sig AS (
                SELECT doc_id,
                       (contains(t, 'page not found')::INT
                        + contains(t, '404 not found')::INT
                        + contains(t, 'error 404')::INT
                        + contains(t, 'not found on this server')::INT
                        + contains(t, 'access denied')::INT
                        + contains(t, 'no longer available')::INT
                        + contains(t, 'temporarily unavailable')::INT
                        + contains(t, 'this page does not exist')::INT
                       )::INT AS n_error_phrases,
                       len(regexp_extract_all(t, '[a-zà-öø-ÿ]+'))::INT
                           AS n_word_tokens,
                       coalesce(regexp_matches(lower(url),
                           '(404|not-found|error)([/.?]|$)'), false)
                           AS url_error_hint
                FROM low
            )
            SELECT doc_id, n_error_phrases, n_word_tokens, url_error_hint,
                   (n_error_phrases >= 1
                    AND (n_word_tokens <= 40 OR url_error_hint))
                       AS is_soft404
            FROM sig
        """,
        # Containment over documents ∪ half-excerpts: shingle semantics as
        # in _shingle_jaccard_oracle; candidates via a shared-shingle
        # inverted index (sound: threshold > 0 needs shared ≥ 1); filter on
        # ROUNDED c to mirror the Spark boundary exactly.
        "containment_pairs": """
            WITH corpus AS (
                SELECT doc_id, text FROM documents
                UNION ALL
                SELECT doc_id + 1000000,
                       array_to_string(list_slice(
                           regexp_split_to_array(trim(text), '\\s+'), 1,
                           (len(regexp_split_to_array(trim(text), '\\s+'))
                            + 1) // 2), ' ')
                FROM documents
            ),
            sh AS (
                SELECT doc_id,
                    CASE WHEN len(toks) >= 5 THEN
                        list_distinct(list_transform(
                            generate_series(1, len(toks) - 4),
                            i -> array_to_string(
                                     list_slice(toks, i, i + 4), ' ')))
                    ELSE [array_to_string(toks, ' ')] END AS shingles
                FROM (SELECT doc_id,
                             regexp_split_to_array(trim(lower(text)),
                                                   '\\s+') AS toks
                      FROM corpus)
            ),
            sized AS (SELECT doc_id, shingles, len(shingles) AS n FROM sh),
            inv AS (SELECT doc_id, unnest(shingles) AS s FROM sized),
            cand AS (
                SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
                FROM inv a JOIN inv b
                  ON a.s = b.s AND a.doc_id < b.doc_id
            ),
            scored AS (
                SELECT c.id_a, c.id_b,
                       len(list_intersect(a.shingles, b.shingles))::BIGINT
                           AS shared,
                       a.n AS n_a, b.n AS n_b
                FROM cand c
                JOIN sized a ON a.doc_id = c.id_a
                JOIN sized b ON b.doc_id = c.id_b
            )
            SELECT id_a, id_b, shared,
                   round(shared::DOUBLE / n_a, 4) AS c_a,
                   round(shared::DOUBLE / n_b, 4) AS c_b
            FROM scored
            WHERE greatest(round(shared::DOUBLE / n_a, 4),
                           round(shared::DOUBLE / n_b, 4)) >= 0.8
        """,
        # Template-pressure audit: string-shingle document frequencies
        # (the hash-identity df distribution up to ~2⁻⁶³ collisions),
        # aggregated to the four audit numbers the capped containment
        # plan needs.  Same shingling CASE as containment_pairs.
        "containment_df_stats": """
            WITH corpus AS (
                SELECT doc_id,
                       coalesce('this site uses cookies to improve '
                                || 'your browsing experience ' || text,
                                '') AS text
                FROM documents
            ),
            sh AS (
                SELECT doc_id,
                    CASE WHEN len(toks) >= 5 THEN
                        list_distinct(list_transform(
                            generate_series(1, len(toks) - 4),
                            i -> array_to_string(
                                     list_slice(toks, i, i + 4), ' ')))
                    ELSE [array_to_string(toks, ' ')] END AS shingles
                FROM (SELECT doc_id,
                             regexp_split_to_array(trim(lower(text)),
                                                   '\\s+') AS toks
                      FROM corpus)
            ),
            inv AS (SELECT unnest(shingles) AS s FROM sh),
            dfreq AS (SELECT s, count(*) AS df FROM inv GROUP BY s)
            SELECT count(*)::BIGINT AS n_shingles,
                   max(df)::BIGINT AS max_df_observed,
                   coalesce(sum(CASE WHEN df > 50 THEN 1 ELSE 0 END),
                            0)::BIGINT AS n_over_cap,
                   coalesce(sum(CASE WHEN df > 50 THEN df ELSE 0 END),
                            0)::BIGINT AS hot_occurrences
            FROM dfreq
        """,
        # DSIR: hashed-feature buckets via the md5-60 arithmetic, add-one
        # smoothed log-ratio per bucket in integer micro-nats, doc-keyed
        # sum; docs with no features kept at (0, 0).
        "dsir_weights": _dsir_weights_oracle(),
        # Gumbel top-k resampling over the same weights: deterministic
        # Gumbel from the md5 unit hash, rank on the ROUNDED key.
        "dsir_resample": _dsir_weights_oracle(
            final="""
            SELECT doc_id, log_weight_micro,
                   round(log_weight_micro / 1000000.0
                         - ln(-ln((('0x' || substr(md5('dsir:'
                               || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
                               + 0.5) / 1152921504606846976.0)), 6)
                       AS gumbel_key
            FROM weights
            ORDER BY gumbel_key DESC, doc_id
            LIMIT 50
            """
        ),
        # EPUB final-artifact golden: pure-Python replay of extraction →
        # assembly → byte-deterministic EPUB3 zip, md5 per url.
        **(
            (
                {"epub_export": e}
                if (e := _epub_export_oracle()) is not None
                else {}
            )
            | (
                {"epub_roundtrip": r}
                if (r := _epub_roundtrip_oracle()) is not None
                else {}
            )
            | (
                {"isotonic_calibration": iso}
                if (iso := _isotonic_oracle()) is not None
                else {}
            )
            | (
                {"payload_routing": pr}
                if (pr := _payload_routing_oracle()) is not None
                else {}
            )
        ),
        "cohort_retention": """
            WITH d AS (
                SELECT user_id,
                       CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day
                FROM events),
            c AS (
                SELECT user_id, day,
                       min(day) OVER (PARTITION BY user_id) AS cohort
                FROM d)
            SELECT cohort AS cohort_day,
                   day - cohort AS day_offset,
                   count(DISTINCT user_id) AS active_users
            FROM c
            GROUP BY 1, 2
        """,
        # chained conditional-min fixpoint == the Spark side's sorted-array
        # walk: stage k is the min event time of its type STRICTLY after
        # stage k-1 (see operators/analytics.py funnel_stages docstring)
        "funnel_stages": """
            WITH u AS (SELECT DISTINCT user_id FROM events),
            s1 AS (
                SELECT user_id, min(ts) AS t1 FROM events
                WHERE event_type = 'signup' GROUP BY 1),
            s2 AS (
                SELECT e.user_id, min(e.ts) AS t2
                FROM events e JOIN s1 USING (user_id)
                WHERE e.event_type = 'view' AND e.ts > s1.t1
                GROUP BY e.user_id),
            s3 AS (
                SELECT e.user_id, min(e.ts) AS t3
                FROM events e JOIN s2 USING (user_id)
                WHERE e.event_type = 'purchase' AND e.ts > s2.t2
                GROUP BY e.user_id)
            SELECT u.user_id,
                   (CASE WHEN t3 IS NOT NULL THEN 3
                         WHEN t2 IS NOT NULL THEN 2
                         WHEN t1 IS NOT NULL THEN 1
                         ELSE 0 END)::INT AS stages_reached,
                   epoch_us(t1) AS t1_us,
                   epoch_us(t2) AS t2_us,
                   epoch_us(t3) AS t3_us
            FROM u
            LEFT JOIN s1 USING (user_id)
            LEFT JOIN s2 USING (user_id)
            LEFT JOIN s3 USING (user_id)
        """,
        "chunk_tokens": """
            WITH t AS (
                SELECT doc_id,
                       regexp_split_to_array(trim(text), '\\s+') AS toks
                FROM documents),
            s AS (
                SELECT doc_id, toks, len(toks) AS n,
                       list_filter(
                           generate_series(1, greatest(1, len(toks)), 48),
                           s -> s = 1 OR s - 48 + 64 - 1 < len(toks)
                       ) AS starts
                FROM t),
            e AS (
                SELECT doc_id, toks, n, starts,
                       unnest(generate_series(1, len(starts))) AS i
                FROM s)
            SELECT doc_id,
                   (i - 1)::INT AS chunk_id,
                   starts[i]::INT AS start_tok,
                   least(64, n - starts[i] + 1)::INT AS n_toks,
                   md5(array_to_string(
                       list_slice(toks, starts[i], starts[i] + 63), ' '))
                       AS chunk_md5
            FROM e
        """,
        # single-window form of the two-phase salted rank (the salted plan
        # reconstructs exactly this kept set); integer ceil, never float
        "stratified_sample": """
            WITH d AS (
                SELECT doc_id, lang,
                       ('0x' || substr(md5('strat:' || CAST(doc_id AS VARCHAR)),
                                       1, 15))::BIGINT AS h
                FROM documents),
            c AS (SELECT lang, count(*) AS n FROM documents GROUP BY 1),
            r AS (
                SELECT doc_id, lang,
                       row_number() OVER (PARTITION BY lang
                                          ORDER BY h ASC, doc_id ASC) AS rn
                FROM d)
            SELECT r.doc_id, r.lang
            FROM r JOIN c USING (lang)
            WHERE rn <= (n * 1 + 5 - 1) // 5
        """,
        "hits_scores": _hits_oracle(),
        "jsonl_roundtrip": """
            SELECT doc_id,
                   md5(coalesce(text, '')) AS text_md5,
                   strlen(coalesce(text, '')) AS text_bytes,
                   coalesce(lang, '') AS lang,
                   coalesce(source, '') AS source,
                   TRUE AS parsed_ok
            FROM documents
        """,
        # bit-for-bit replay of the hashed linear model: same md5-prefix
        # bucket, same weight arithmetic, same left-to-right token-array
        # summation order (list_sum == HOF aggregate order)
        "classifier_scores": """
            WITH toks AS (
                SELECT doc_id,
                       regexp_extract_all(lower(text), '[a-zà-öø-ÿ]+') AS ts
                FROM documents),
            f AS (
                SELECT doc_id, len(ts) AS n,
                       coalesce(list_sum(list_transform(ts, t ->
                           ((('0x' || substr(md5('feat:' || t), 1, 15))::BIGINT
                             % 1024) % 997) / 996.0 - 0.5)), 0.0) AS s
                FROM toks)
            SELECT doc_id,
                   n::BIGINT AS n_feats,
                   round(s / greatest(1, n), 6)::DOUBLE AS raw_score,
                   round(1.0 / (1.0 + exp(-4.0 * (s / greatest(1, n)))), 6)::DOUBLE
                       AS prob,
                   (1.0 / (1.0 + exp(-4.0 * (s / greatest(1, n)))) >= 0.5)
                       AS keep
            FROM f
        """,
        "event_rolling": """
            SELECT event_id, user_id,
                   count(*) OVER w AS roll_n,
                   round(sum(value) OVER w, 4)::DOUBLE AS roll_sum,
                   round(avg(value) OVER w, 4)::DOUBLE AS roll_avg
            FROM (SELECT event_id, user_id, value,
                         CAST(floor(epoch(ts)) AS BIGINT) AS sec
                  FROM events)
            WINDOW w AS (PARTITION BY user_id ORDER BY sec
                         RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
        """,
        "click_attribution": """
            WITH p AS (
                SELECT event_id, user_id, ts FROM events
                WHERE event_type = 'purchase'),
            c AS (
                SELECT user_id, ts AS click_ts, min(event_id) AS click_id
                FROM events WHERE event_type = 'click'
                GROUP BY user_id, ts)
            SELECT p.event_id, p.user_id,
                   CASE WHEN c.click_ts IS NOT NULL
                             AND epoch_us(p.ts) - epoch_us(c.click_ts)
                                 <= 86400000000
                        THEN c.click_id END AS click_id,
                   CASE WHEN c.click_ts IS NOT NULL
                             AND epoch_us(p.ts) - epoch_us(c.click_ts)
                                 <= 86400000000
                        THEN epoch_us(p.ts) - epoch_us(c.click_ts)
                        END AS gap_us
            FROM p ASOF LEFT JOIN c
              ON p.user_id = c.user_id AND c.click_ts <= p.ts
        """,
        "compact_postings": """
            WITH src AS (
                SELECT doc_id, text, 0 AS segment FROM documents
                UNION ALL
                SELECT doc_id,
                       regexp_replace(text, '\\s+\\S+\\s*$', '') AS text,
                       1 AS segment
                FROM documents WHERE doc_id % 5 = 0),
            post AS (
                SELECT term, doc_id, count(*)::INT AS tf, segment
                FROM (SELECT doc_id, segment,
                             unnest(regexp_extract_all(lower(text),
                                                       '[a-zà-öø-ÿ]+')) AS term
                      FROM src)
                GROUP BY term, doc_id, segment)
            SELECT term, doc_id, tf
            FROM post
            -- mirror the operator: winner = max segment among rows that
            -- EXIST (a recrawl yielding zero postings leaves the old
            -- segment in place; deletions need update_postings'
            -- deleted_ids, not compaction)
            QUALIFY segment = max(segment) OVER (PARTITION BY doc_id)
        """,
        "bpe_pairs": """
            WITH vocab AS (
                SELECT word, count(*)::BIGINT AS n FROM (
                    SELECT unnest(regexp_extract_all(
                               lower(coalesce(text, '')),
                               '[a-zà-öø-ÿ]+')) AS word
                    FROM documents)
                GROUP BY word
            ), pairs AS (
                SELECT substr(word, i, 2) AS pair, n
                FROM vocab, UNNEST(generate_series(1, length(word) - 1)) AS t(i)
                WHERE length(word) >= 2
            )
            SELECT pair, sum(n)::BIGINT AS weight
            FROM pairs GROUP BY pair
            HAVING sum(n) >= 5
        """,
        "minimizer_sketch": """
            WITH toks AS (
                SELECT doc_id,
                       regexp_extract_all(lower(coalesce(text, '')),
                                          '[a-zà-öø-ÿ]+') AS tk
                FROM documents
            ), grams AS (
                SELECT doc_id,
                       CASE WHEN len(tk) >= 3 THEN
                           list_transform(generate_series(1, len(tk) - 2),
                               i -> ('0x' || substr(md5(array_to_string(
                                        list_slice(tk, i, i + 2), ' ')),
                                     1, 15))::BIGINT)
                       ELSE []::BIGINT[] END AS gs
                FROM toks
            ), mins AS (
                SELECT doc_id,
                       CASE WHEN len(gs) = 0 THEN []::BIGINT[]
                            WHEN len(gs) <= 4 THEN [list_min(gs)]
                            ELSE list_distinct(list_transform(
                                     generate_series(1, len(gs) - 3),
                                     j -> list_min(list_slice(gs, j, j + 3))))
                       END AS ms
                FROM grams
            )
            SELECT doc_id, unnest(ms) AS minimizer FROM mins
        """,
        "minimizer_pairs": """
            WITH corpus AS (
                SELECT doc_id, text FROM documents
                UNION ALL
                SELECT doc_id + 1000000,
                       regexp_replace(text, '\\s+\\S+\\s*$', '')
                FROM documents
            ), toks AS (
                SELECT doc_id,
                       regexp_extract_all(lower(coalesce(text, '')),
                                          '[a-zà-öø-ÿ]+') AS tk
                FROM corpus
            ), grams AS (
                SELECT doc_id,
                       CASE WHEN len(tk) >= 3 THEN
                           list_transform(generate_series(1, len(tk) - 2),
                               i -> ('0x' || substr(md5(array_to_string(
                                        list_slice(tk, i, i + 2), ' ')),
                                     1, 15))::BIGINT)
                       ELSE []::BIGINT[] END AS gs
                FROM toks
            ), mins AS (
                SELECT doc_id,
                       CASE WHEN len(gs) = 0 THEN []::BIGINT[]
                            WHEN len(gs) <= 4 THEN [list_min(gs)]
                            ELSE list_distinct(list_transform(
                                     generate_series(1, len(gs) - 3),
                                     j -> list_min(list_slice(gs, j, j + 3))))
                       END AS ms
                FROM grams
            ), sk AS (
                SELECT doc_id, unnest(ms) AS minimizer FROM mins
            )
            SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                   count(*)::BIGINT AS n_shared
            FROM sk a JOIN sk b
              ON b.minimizer = a.minimizer AND a.doc_id < b.doc_id
            GROUP BY 1, 2
            HAVING count(*) >= 5
        """,
        "template_strip": """
            WITH mutated AS (
                SELECT doc_id, source,
                       '(c) ' || source || ' - all rights reserved' || chr(10) ||
                       CASE WHEN (doc_id // 20) % 2 = 0
                            THEN 'We use cookies on ' || source || chr(10)
                            ELSE '' END ||
                       CASE WHEN (doc_id // 20) % 5 = 0
                            THEN 'Limited promo - subscribe today' || chr(10)
                            ELSE '' END ||
                       coalesce(text, '') AS text
                FROM documents
            ), lines AS (
                SELECT doc_id, source, u.pos, u.ln FROM (
                    SELECT doc_id, source,
                           string_split(text, chr(10)) AS lst FROM mutated
                ), UNNEST(list_transform(generate_series(1, len(lst)),
                                         j -> {'pos': j - 1, 'ln': lst[j]})) AS t(u)
            ), gd AS (
                SELECT source, count(DISTINCT doc_id) AS gdocs
                FROM mutated GROUP BY source
            ), tpl AS (
                SELECT d.source, d.ln
                FROM (SELECT DISTINCT source, ln, doc_id FROM lines
                      WHERE regexp_matches(ln, '[^ \\t\\r]')) d
                JOIN gd USING (source)
                GROUP BY d.source, d.ln, gd.gdocs
                HAVING gd.gdocs >= 3 AND count(*) * 2 >= gd.gdocs
            ), marked AS (
                SELECT l.doc_id, l.source, l.pos, l.ln,
                       (t.ln IS NOT NULL) AS is_tpl
                FROM lines l
                LEFT JOIN tpl t ON t.source = l.source AND t.ln = l.ln
            )
            SELECT doc_id, source,
                   md5(coalesce(string_agg(ln, chr(10) ORDER BY pos)
                                FILTER (WHERE NOT is_tpl), '')) AS text_md5,
                   count(*)::BIGINT AS n_lines,
                   coalesce(sum(CASE WHEN is_tpl THEN 1 ELSE 0 END),
                            0)::BIGINT AS n_removed
            FROM marked GROUP BY doc_id, source
        """,
        "snapshot_set_ops": """
            WITH a AS (
                SELECT doc_id, lang FROM documents WHERE doc_id % 3 != 0
                UNION ALL
                SELECT doc_id, lang FROM documents WHERE doc_id % 7 = 0),
            b AS (SELECT doc_id, lang FROM documents WHERE doc_id % 2 = 0)
            SELECT 'a_minus_b' AS op, doc_id, lang
            FROM (SELECT * FROM a EXCEPT ALL SELECT * FROM b)
            UNION ALL
            SELECT 'b_minus_a' AS op, doc_id, lang
            FROM (SELECT * FROM b EXCEPT ALL SELECT * FROM a)
            UNION ALL
            SELECT 'common' AS op, doc_id, lang
            FROM (SELECT * FROM a INTERSECT ALL SELECT * FROM b)
        """,
        "event_pivot": """
            SELECT user_id,
                   CAST(sum((event_type = 'click')::BIGINT) AS BIGINT) AS n_click,
                   CAST(sum((event_type = 'error')::BIGINT) AS BIGINT) AS n_error,
                   CAST(sum((event_type = 'purchase')::BIGINT) AS BIGINT) AS n_purchase,
                   CAST(sum((event_type = 'signup')::BIGINT) AS BIGINT) AS n_signup,
                   CAST(sum((event_type = 'view')::BIGINT) AS BIGINT) AS n_view,
                   count(*) AS n_total
            FROM events
            GROUP BY user_id
        """,
        # Degree assortativity: the star+chain construction, canonical
        # distinct edges, degree joins, and exact integer moments all
        # replay as plain SQL; HUGEINT sums == Spark decimal(38,0).
        "degree_assortativity": """
            WITH raw_edges AS (
                SELECT 'hub.example' AS s,
                       's' || CAST(doc_id % 23 AS VARCHAR) || '.example' AS t
                FROM documents
                UNION ALL
                SELECT 's' || CAST(doc_id % 23 AS VARCHAR) || '.example',
                       's' || CAST(doc_id % 23 + 1 AS VARCHAR) || '.example'
                FROM documents WHERE doc_id % 23 < 10
            ), e AS (
                SELECT DISTINCT least(s, t) AS a, greatest(s, t) AS b
                FROM raw_edges WHERE s != t
            ), deg AS (
                SELECT node, count(*)::BIGINT AS deg FROM (
                    SELECT a AS node FROM e
                    UNION ALL SELECT b FROM e
                ) GROUP BY node
            ), ed AS (
                SELECT da.deg AS da, db.deg AS db
                FROM e JOIN deg da ON e.a = da.node
                       JOIN deg db ON e.b = db.node
            ), mom AS (
                SELECT count(*)::BIGINT AS n_edges,
                       sum(da + db)::HUGEINT AS sx,
                       sum(2 * da * db)::HUGEINT AS sxy,
                       sum(da * da + db * db)::HUGEINT AS sxx
                FROM ed
            )
            SELECT (SELECT count(*)::BIGINT FROM deg) AS n_nodes,
                   n_edges,
                   CASE WHEN (2 * n_edges * sxx - sx * sx) > 0 THEN
                       round((2 * n_edges * sxy - sx * sx)::DOUBLE
                             / (2 * n_edges * sxx - sx * sx)::DOUBLE, 6)
                   END AS assortativity
            FROM mom
        """,
        # Span overlap: the oracle is the NAIVE theta-join the operator
        # refuses to run — grid bucketing + owner-cell dedup must
        # reproduce it exactly, duplicates and all.
        "span_overlap": """
            WITH left_spans AS (
                SELECT doc_id, doc_id * 2 AS a_id,
                       (doc_id % 7) * 10 AS a_start,
                       (doc_id % 7) * 10 + 15 + doc_id % 4 AS a_end
                FROM documents
                UNION ALL
                SELECT doc_id, doc_id * 2 + 1,
                       100 + (doc_id % 5) * 8,
                       112 + (doc_id % 5) * 8
                FROM documents
            ), right_spans AS (
                SELECT doc_id, b_id, b_id * 25 AS b_start,
                       b_id * 25 + 25 AS b_end
                FROM (SELECT doc_id, unnest(generate_series(0, 7)) AS b_id
                      FROM documents)
            )
            SELECT l.doc_id, l.a_id, r.b_id,
                   greatest(a_start, b_start)::BIGINT AS ov_start,
                   least(a_end, b_end)::BIGINT AS ov_end,
                   (least(a_end, b_end)
                    - greatest(a_start, b_start))::BIGINT AS ov_len
            FROM left_spans l JOIN right_spans r
              ON l.doc_id = r.doc_id
             AND l.a_start < r.b_end AND r.b_start < l.a_end
            WHERE l.a_end > l.a_start
        """,
        # RRF fusion: per-(query, run) row_number ranks, integer
        # nano-unit contributions, exact sums, query-local top-10.
        "rrf_fusion": """
            WITH runs AS (
                SELECT doc_id % 5 AS query_id, doc_id,
                       length(text)::DOUBLE AS score, 'lex' AS run_id
                FROM documents
                UNION ALL
                SELECT doc_id % 5, doc_id,
                       ((doc_id * 2654435761) % 1000)::DOUBLE, 'dense'
                FROM documents
            ), ranked AS (
                SELECT query_id, doc_id,
                       CAST(round(1e9 / (60 + row_number() OVER (
                           PARTITION BY query_id, run_id
                           ORDER BY score DESC, doc_id ASC)), 0) AS BIGINT)
                           AS nano
                FROM runs
            ), fused AS (
                SELECT query_id, doc_id,
                       count(*)::BIGINT AS n_runs,
                       sum(nano)::BIGINT AS rrf_nano
                FROM ranked GROUP BY query_id, doc_id
            )
            SELECT query_id, doc_id, n_runs, rrf_nano,
                   fused_rank::INT AS fused_rank
            FROM (
                SELECT *, row_number() OVER (
                    PARTITION BY query_id
                    ORDER BY rrf_nano DESC, doc_id ASC) AS fused_rank
                FROM fused
            ) WHERE fused_rank <= 10
        """,
        # RAKE: the two-pass stopword cut, distinct-phrase scoring and
        # integer micro-unit deg/freq sums all replay in SQL (the
        # stopword alternation is generated from the SAME tuple).
        "rake_keywords": """
            WITH norm AS (
                SELECT ' ' || regexp_replace(lower(text),
                           '[^a-zà-öø-ÿ]+', ' ', 'g') || ' ' AS t
                FROM documents WHERE text IS NOT NULL
            ), cut1 AS (
                SELECT regexp_replace(t, ' (the|and|of|to|a|in|is|was|it|for|on|as|with|that|this|his|her|they|be|at|by|an|are|or|from|had|has|have|not|but|were|which|you|he|she|we|their) ', ' | ', 'g') AS t
                FROM norm
            ), cut2 AS (
                SELECT regexp_replace(t, ' (the|and|of|to|a|in|is|was|it|for|on|as|with|that|this|his|her|they|be|at|by|an|are|or|from|had|has|have|not|but|were|which|you|he|she|we|their) ', ' | ', 'g') AS t
                FROM cut1
            ), phrases AS (
                SELECT trim(regexp_replace(raw, ' +', ' ', 'g')) AS phrase
                FROM (SELECT unnest(string_split(t, '|')) AS raw FROM cut2)
                WHERE trim(regexp_replace(raw, ' +', ' ', 'g')) != ''
            ), occ AS (
                SELECT phrase, count(*)::BIGINT AS n_occ
                FROM phrases GROUP BY phrase HAVING count(*) >= 2
            ), words AS (
                SELECT phrase, n_occ,
                       len(string_split(phrase, ' '))::BIGINT AS n_words,
                       unnest(string_split(phrase, ' ')) AS word
                FROM occ
            ), wscore AS (
                SELECT word,
                       CAST(round(1e6 * sum(n_occ * n_words)::DOUBLE
                                  / sum(n_occ)::DOUBLE, 0) AS BIGINT)
                           AS w_micro
                FROM words GROUP BY word
            ), scored AS (
                SELECT w.phrase, sum(s.w_micro)::BIGINT AS score_micro
                FROM words w JOIN wscore s USING (word)
                GROUP BY w.phrase
            )
            SELECT o.phrase,
                   len(string_split(o.phrase, ' '))::INT AS n_words,
                   o.n_occ AS n_occurrences,
                   sc.score_micro
            FROM occ o JOIN scored sc ON o.phrase = sc.phrase
            ORDER BY sc.score_micro DESC, o.phrase ASC
            LIMIT 40
        """,
        # Feature MI: stack-unpivot as UNION ALL, equal-width bins,
        # micro-nat terms with the count products in doubles.
        "feature_mi": """
            WITH feats AS (
                SELECT 'f_len' AS feature, length(text)::DOUBLE AS x,
                       CAST((doc_id % 3 = 0)::INT AS VARCHAR) AS y
                FROM documents WHERE text IS NOT NULL
                UNION ALL
                SELECT 'f_noise', ((doc_id * 37) % 100)::DOUBLE,
                       CAST((doc_id % 3 = 0)::INT AS VARCHAR)
                FROM documents
                UNION ALL
                SELECT 'f_mod', (doc_id % 3)::DOUBLE,
                       CAST((doc_id % 3 = 0)::INT AS VARCHAR)
                FROM documents
            ), ranges AS (
                SELECT feature, min(x) AS lo, max(x) AS hi
                FROM feats GROUP BY feature
            ), binned AS (
                SELECT f.feature, f.y,
                       CASE WHEN r.hi > r.lo THEN least(9,
                           CAST(floor((f.x - r.lo) / (r.hi - r.lo) * 10)
                                AS INT))
                       ELSE 0 END AS bin
                FROM feats f JOIN ranges r ON f.feature = r.feature
            ), nxy AS (
                SELECT feature, bin, y, count(*)::BIGINT AS n_xy
                FROM binned GROUP BY feature, bin, y
            ), nx AS (
                SELECT feature, bin, sum(n_xy)::BIGINT AS n_x
                FROM nxy GROUP BY feature, bin
            ), ny AS (
                SELECT feature, y, sum(n_xy)::BIGINT AS n_y
                FROM nxy GROUP BY feature, y
            ), nn AS (
                SELECT feature, sum(n_xy)::BIGINT AS n
                FROM nxy GROUP BY feature
            ), cells AS (
                SELECT c.feature, c.bin,
                       CAST(round(1e6
                            * (c.n_xy::DOUBLE / t.n::DOUBLE)
                            * ln((c.n_xy::DOUBLE * t.n::DOUBLE)
                                 / (x.n_x::DOUBLE * yy.n_y::DOUBLE)), 0)
                            AS BIGINT) AS term,
                       t.n
                FROM nxy c
                JOIN nx x ON c.feature = x.feature AND c.bin = x.bin
                JOIN ny yy ON c.feature = yy.feature AND c.y = yy.y
                JOIN nn t ON c.feature = t.feature
            )
            SELECT feature, max(n)::BIGINT AS n_rows,
                   count(DISTINCT bin)::INT AS n_bins_used,
                   sum(term)::BIGINT AS mi_micro_nats
            FROM cells GROUP BY feature
            ORDER BY mi_micro_nats DESC, feature ASC
        """,
        # PQ assignment: the arithmetic codebook, inclusive list_slice
        # subvectors, per-dimension nano-rounded squared deltas and the
        # (dist, code) lexicographic argmin replay exactly.
        "pq_quantize": """
            WITH cent AS (
                SELECT s.subspace, c.code,
                       list_transform(generate_series(0, 7), j ->
                           (((s.subspace * 131 + c.code * 31 + j * 17)
                             % 200) - 100)::DOUBLE / 100.0) AS cvec
                FROM (SELECT unnest(generate_series(0, 7)) AS subspace) s,
                     (SELECT unnest(generate_series(0, 15)) AS code) c
            ), sub AS (
                SELECT vec_id, s.subspace,
                       list_slice(embedding, s.subspace * 8 + 1,
                                  s.subspace * 8 + 8) AS sv
                FROM embeddings,
                     (SELECT unnest(generate_series(0, 7)) AS subspace) s
            ), scored AS (
                SELECT vec_id, sub.subspace, cent.code,
                       list_sum(list_transform(generate_series(1, 8), j ->
                           CAST(round((sv[j]::DOUBLE - cvec[j])
                                      * (sv[j]::DOUBLE - cvec[j])
                                      * 1e9, 0) AS BIGINT)))::BIGINT AS d
                FROM sub JOIN cent ON sub.subspace = cent.subspace
            )
            SELECT vec_id, subspace::INT AS subspace, code::INT AS code,
                   d AS dist_nano
            FROM (
                SELECT *, row_number() OVER (
                    PARTITION BY vec_id, subspace
                    ORDER BY d ASC, code ASC) AS rn
                FROM scored
            ) WHERE rn = 1
        """,
        # Continuation pairs: the synthetic continuation corpus, the
        # whitespace tokenization, head/tail md5-60 bridge hashes, the
        # >16 fanout drop and the equi-join replay in SQL.
        "continuation_pairs": """
            WITH elig AS (
                SELECT doc_id, text,
                       string_split_regex(trim(lower(text)), '\\s+') AS t
                FROM documents
                WHERE len(string_split_regex(trim(lower(text)), '\\s+')) >= 8
            ), corpus AS (
                SELECT doc_id * 2 AS id, text FROM elig
                UNION ALL
                SELECT doc_id * 2 + 1,
                       array_to_string(
                           list_slice(t, len(t) - 7, len(t)), ' ')
                       || ' continued section ' || CAST(doc_id AS VARCHAR)
                FROM elig
            ), toks AS (
                SELECT id,
                       string_split_regex(trim(lower(text)), '\\s+') AS t
                FROM corpus
                WHERE len(string_split_regex(trim(lower(text)), '\\s+')) >= 8
            ), hashed AS (
                SELECT id,
                       ('0x' || substr(md5(array_to_string(
                           list_slice(t, 1, 8), ' ')), 1, 15))::BIGINT AS h,
                       ('0x' || substr(md5(array_to_string(
                           list_slice(t, len(t) - 7, len(t)), ' ')),
                           1, 15))::BIGINT AS tl
                FROM toks
            ), hot AS (
                SELECT h AS bridge FROM hashed GROUP BY h
                HAVING count(*) > 16
                UNION
                SELECT tl FROM hashed GROUP BY tl HAVING count(*) > 16
            )
            SELECT a.id AS id_a, b.id AS id_b, a.tl AS bridge_hash
            FROM hashed a JOIN hashed b ON a.tl = b.h AND a.id != b.id
            WHERE a.tl NOT IN (SELECT bridge FROM hot)
        """,
        # Capitalized runs: the augmented corpus, the multi-word
        # [A-Z][a-z]+ run regex and the capitalized-stopword-first
        # filter (list generated from the SAME tuple) replay in SQL.
        "capitalized_phrases": """
            WITH names(nm, i) AS (
                VALUES ('Arlon', 0), ('Brixton', 1), ('Calder', 2),
                       ('Dorset', 3), ('Elgin', 4), ('Farrow', 5),
                       ('Galway', 6)
            ), aug AS (
                SELECT d.text || ' Saint ' || n1.nm
                       || ' went to the The Old ' || n2.nm || '.' AS text
                FROM documents d
                JOIN names n1 ON n1.i = d.doc_id % 7
                JOIN names n2 ON n2.i = (d.doc_id * 2) % 7
            ), runs AS (
                SELECT unnest(regexp_extract_all(text,
                    '[A-Z][a-z]+( [A-Z][a-z]+)+', 0)) AS phrase
                FROM aug
            ), kept AS (
                SELECT phrase, count(*)::BIGINT AS n_mentions
                FROM runs
                WHERE string_split(phrase, ' ')[1] NOT IN ('The', 'And', 'Of', 'To', 'A', 'In', 'Is', 'Was', 'It', 'For', 'On', 'As', 'With', 'That', 'This', 'His', 'Her', 'They', 'Be', 'At', 'By', 'An', 'Are', 'Or', 'From', 'Had', 'Has', 'Have', 'Not', 'But', 'Were', 'Which', 'You', 'He', 'She', 'We', 'Their')
                GROUP BY phrase
                HAVING count(*) >= 2
            )
            SELECT phrase,
                   len(string_split(phrase, ' '))::INT AS n_words,
                   n_mentions
            FROM kept
            ORDER BY n_mentions DESC, phrase ASC
            LIMIT 40
        """,
        # Otsu: equal-width histogram, cumulative moments over the
        # bins table, micro-unit between-class variance, lower-bin
        # tie-break.
        "otsu_threshold": """
            WITH clean AS (
                SELECT (CASE WHEN doc_id % 3 = 0 THEN 80 + doc_id % 7
                             ELSE 20 + doc_id % 11 END)::DOUBLE AS x
                FROM documents
            ), rng AS (
                SELECT min(x) AS lo, max(x) AS hi,
                       count(*)::BIGINT AS n FROM clean
            ), hist AS (
                SELECT CASE WHEN r.hi > r.lo THEN least(31,
                           CAST(floor((c.x - r.lo) / (r.hi - r.lo) * 32)
                                AS INT))
                       ELSE 0 END AS bin,
                       count(*)::BIGINT AS n
                FROM clean c, rng r
                GROUP BY 1
            ), cum AS (
                SELECT bin,
                       sum(n) OVER (ORDER BY bin)::BIGINT AS w0,
                       sum(n * bin) OVER (ORDER BY bin)::BIGINT AS s0,
                       (SELECT sum(n)::BIGINT FROM hist) AS W,
                       (SELECT sum(n * bin)::BIGINT FROM hist) AS S
                FROM hist
            ), scored AS (
                SELECT bin, w0, W,
                       CAST(round(1e6
                           * ((w0::DOUBLE / W::DOUBLE)
                              * (1.0 - w0::DOUBLE / W::DOUBLE))
                           * (((s0::DOUBLE / w0::DOUBLE)
                               - ((S - s0)::DOUBLE / (W - w0)::DOUBLE))
                              * ((s0::DOUBLE / w0::DOUBLE)
                                 - ((S - s0)::DOUBLE / (W - w0)::DOUBLE))),
                           0) AS BIGINT) AS var_micro
                FROM cum WHERE w0 < W
            ), best AS (
                SELECT * FROM scored
                ORDER BY var_micro DESC, bin ASC LIMIT 1
            )
            SELECT r.n AS n_rows,
                   round(r.lo, 6) AS lo,
                   round(r.hi, 6) AS hi,
                   b.bin::INT AS threshold_bin,
                   CASE WHEN b.bin IS NOT NULL THEN
                       round(r.lo + (b.bin + 1) * ((r.hi - r.lo) / 32), 6)
                   END AS threshold_value,
                   b.var_micro,
                   b.w0 AS n_below,
                   (b.W - b.w0)::BIGINT AS n_above
            FROM rng r LEFT JOIN best b ON TRUE
        """,
        # Heading→body pairs: one combined regex stream, window cumsum
        # section ids, ORDER BY pos string_agg bodies.
        "heading_body_pairs": """
            WITH pages AS (
                SELECT doc_id,
                       '<html><body><p>orphan intro</p><h1>Title '
                       || doc_id || '</h1><p>alpha ' || (doc_id % 7)
                       || '</p><p>beta <b>bold</b></p>'
                       || CASE WHEN doc_id % 3 = 0
                               THEN '<h2>Methods</h2><p>gamma '
                                    || (doc_id % 5) || '</p>'
                               ELSE '<h2>Empty Section</h2>' END
                       || '</body></html>' AS html
                FROM documents
            ), m AS (
                SELECT doc_id, u.pos, u.m FROM (
                    SELECT doc_id,
                           regexp_extract_all(html,
                               '(?is)<h[1-6][^>]*>.*?</h[1-6]\\s*>|<p[^>]*>.*?</p\\s*>')
                               AS lst
                    FROM pages),
                UNNEST(list_transform(generate_series(1, len(lst)),
                                      j -> {'pos': j - 1, 'm': lst[j]}))
                    AS t(u)
            ), tagged AS (
                SELECT doc_id, pos,
                       regexp_matches(m, '(?is)^<h[1-6]') AS is_h,
                       regexp_extract(m, '(?i)^<h([1-6])', 1) AS lvl,
                       trim(regexp_replace(regexp_replace(m,
                            '(?s)<[^>]*>', ' ', 'g'), '\\s+', ' ', 'g'))
                           AS txt,
                       sum(CASE WHEN regexp_matches(m, '(?is)^<h[1-6]')
                                THEN 1 ELSE 0 END)
                           OVER (PARTITION BY doc_id ORDER BY pos) AS sec
                FROM m
            ), heads AS (
                SELECT doc_id, sec::INT AS section_id, lvl::INT AS level,
                       txt AS heading
                FROM tagged WHERE is_h
            ), bodies AS (
                SELECT doc_id, sec::INT AS section_id,
                       count(*)::BIGINT AS n_paras,
                       string_agg(txt, ' ' ORDER BY pos) AS body
                FROM tagged WHERE NOT is_h AND sec > 0
                GROUP BY doc_id, sec
            )
            SELECT h.doc_id, h.section_id, h.level, h.heading,
                   coalesce(b.n_paras, 0)::BIGINT AS n_paras, b.body
            FROM heads h LEFT JOIN bodies b
              ON h.doc_id = b.doc_id AND h.section_id = b.section_id
        """,
        # Site sections: URL parse, first/second path segments, per-
        # domain top cut.
        "site_sections": """
            WITH urls AS (
                SELECT CASE WHEN doc_id % 4 = 3
                    THEN 'https://s' || (doc_id % 5) || '.example'
                    ELSE 'https://s' || (doc_id % 5) || '.example/'
                         || CASE WHEN doc_id % 4 = 0 THEN 'news'
                                 WHEN doc_id % 4 = 1 THEN 'blog'
                                 ELSE 'shop' END
                         || '/'
                         || CASE WHEN doc_id % 4 = 0
                                 THEN 'y' || (doc_id % 3)
                                 ELSE 'p' || (doc_id % 9) END
                         || '?ref=' || (doc_id % 2)
                    END AS url
                FROM documents
            ), parsed AS (
                SELECT regexp_extract(url,
                           '^[a-z][a-z0-9+.-]*://([^/?#]+)', 1) AS domain,
                       list_filter(string_split(regexp_extract(url,
                           '^[a-z][a-z0-9+.-]*://[^/?#]*([^?#]*)', 1), '/'),
                           x -> x != '') AS segs
                FROM urls
            ), keyed AS (
                SELECT domain,
                       CASE WHEN len(segs) >= 1 THEN segs[1]
                            ELSE '(root)' END AS section,
                       CASE WHEN len(segs) >= 2 THEN segs[2] END AS sub
                FROM parsed WHERE domain != ''
            ), agg AS (
                SELECT domain, section, count(*)::BIGINT AS n_pages,
                       count(DISTINCT sub)::BIGINT AS n_subsections
                FROM keyed GROUP BY domain, section
            )
            SELECT domain, section, n_pages, n_subsections FROM (
                SELECT *, row_number() OVER (
                    PARTITION BY domain
                    ORDER BY n_pages DESC, section ASC) AS rn
                FROM agg
            ) WHERE rn <= 3
        """,
        # Winsorize: quantile_cont == Spark exact percentile; bounds
        # rounded BEFORE clamping on both sides.
        "winsorize_scores": """
            WITH d AS (
                SELECT doc_id, 'd' || (doc_id % 7) AS domain,
                       (CASE WHEN doc_id % 97 = 0 THEN 500 + doc_id % 13
                             ELSE 50 + doc_id % 23 END)::DOUBLE AS score
                FROM documents
            ), b AS (
                SELECT domain,
                       round(quantile_cont(score, 0.05), 6) AS lo_bound,
                       round(quantile_cont(score, 0.95), 6) AS hi_bound
                FROM d GROUP BY domain
            )
            SELECT d.doc_id, d.domain, d.score, b.lo_bound, b.hi_bound,
                   round(least(greatest(d.score, b.lo_bound), b.hi_bound),
                         6) AS score_w,
                   (d.score < b.lo_bound OR d.score > b.hi_bound)
                       AS clipped
            FROM d LEFT JOIN b ON d.domain = b.domain
        """,
        # PRF expansion: the explode+group BM25 replica picks the same
        # rounded-score top-25; expansion weights are exact micro sums.
        "prf_expansion": """
            WITH base AS (
                SELECT doc_id,
                       regexp_extract_all(lower(text), '[a-zà-öø-ÿ]+') AS toks
                FROM documents),
            consts AS (
                SELECT count(*) AS n_docs, avg(len(toks)) AS avgdl FROM base),
            toks AS (
                SELECT doc_id, len(toks) AS dl, unnest(toks) AS term
                FROM base),
            hits AS (
                SELECT doc_id, dl, term, count(*) AS tf
                FROM toks
                WHERE term IN ('merge', 'spark', 'window')
                GROUP BY doc_id, dl, term),
            dfreq AS (SELECT term, count(*) AS df FROM hits GROUP BY term),
            scored AS (
                SELECT h.doc_id,
                       ROUND(SUM(
                           ln((c.n_docs - d.df + 0.5) / (d.df + 0.5) + 1.0)
                           * (h.tf * (1.2 + 1.0))
                           / (h.tf + 1.2 * (1.0 - 0.75
                                            + 0.75 * h.dl / c.avgdl))
                       ), 6)::DOUBLE AS score
                FROM hits h
                JOIN dfreq d USING (term)
                CROSS JOIN consts c
                GROUP BY h.doc_id),
            fb AS (
                SELECT doc_id FROM scored
                ORDER BY score DESC, doc_id LIMIT 25),
            ftoks AS (
                SELECT t.doc_id, t.dl, t.term
                FROM toks t SEMI JOIN fb ON t.doc_id = fb.doc_id),
            filt AS (
                SELECT * FROM ftoks
                WHERE length(term) >= 3 AND term NOT IN ('a', 'an', 'and', 'are', 'as', 'at', 'be', 'but', 'by', 'for', 'from', 'had', 'has', 'have', 'he', 'her', 'his', 'in', 'is', 'it', 'merge', 'not', 'of', 'on', 'or', 'she', 'spark', 'that', 'the', 'their', 'they', 'this', 'to', 'was', 'we', 'were', 'which', 'window', 'with', 'you')),
            per_doc AS (
                SELECT doc_id, term, dl, count(*)::BIGINT AS tf
                FROM filt GROUP BY doc_id, term, dl),
            contrib AS (
                SELECT term,
                       CAST(round(1e6 * tf::DOUBLE / dl::DOUBLE, 0)
                            AS BIGINT) AS w
                FROM per_doc)
            SELECT term, count(*)::BIGINT AS n_docs,
                   sum(w)::BIGINT AS weight_micro
            FROM contrib GROUP BY term
            ORDER BY weight_micro DESC, term ASC
            LIMIT 15
        """,
        # LSH banding planner: pure S-curve arithmetic replay.
        "lsh_plan": """
            WITH divs AS (
                SELECT b::INT AS bands, (64 // b)::INT AS "rows"
                FROM (SELECT unnest(generate_series(1, 64)) AS b)
                WHERE 64 % b = 0
            ), g AS (
                SELECT bands, "rows",
                       unnest(generate_series(1, 99)) AS gi
                FROM divs
            ), t2 AS (
                SELECT bands, "rows", gi, gi::DOUBLE / 100.0 AS j,
                       1.0 - pow(1.0 - pow(gi::DOUBLE / 100.0,
                                           "rows"::DOUBLE),
                                 bands::DOUBLE) AS p
                FROM g
            ), micro AS (
                SELECT bands, "rows",
                       CASE WHEN j < 0.5
                            THEN CAST(round(1e6 * p, 0) AS BIGINT)
                            ELSE 0 END AS fp_t,
                       CASE WHEN j < 0.5 THEN 0
                            ELSE CAST(round(1e6 * (1.0 - p), 0) AS BIGINT)
                            END AS fn_t
                FROM t2
            ), agg AS (
                SELECT bands, "rows", sum(fp_t)::BIGINT AS fp_micro,
                       sum(fn_t)::BIGINT AS fn_micro
                FROM micro GROUP BY bands, "rows"
            )
            SELECT bands, "rows", round(pow(1.0 / bands::DOUBLE,
                       1.0 / "rows"::DOUBLE), 6) AS threshold_est,
                   fp_micro, fn_micro,
                   (fp_micro + fn_micro)::BIGINT AS err_micro
            FROM agg ORDER BY err_micro, bands
        """,
        # N-gram novelty: shingle strings replay exactly (the Spark
        # side hashes them 64-bit only for shuffle width; novelty
        # depends on equality alone, exact up to 2^-64 collisions).
        "ngram_novelty": """
            WITH corpus AS (
                SELECT doc_id, text FROM documents
                UNION ALL
                SELECT doc_id + 10000000, text FROM documents
                WHERE doc_id % 10 = 0
            ), sh AS (
                SELECT doc_id,
                       CASE WHEN len(toks) >= 5 THEN
                           list_distinct(list_transform(
                               generate_series(1, len(toks) - 5 + 1),
                               i -> array_to_string(
                                   list_slice(toks, i, i + 5 - 1), ' ')))
                       ELSE [array_to_string(toks, ' ')] END AS shingles
                FROM (SELECT doc_id,
                             regexp_split_to_array(trim(lower(text)),
                                                   '\\s+') AS toks
                      FROM corpus)
            ), ex AS (
                SELECT doc_id, unnest(shingles) AS s FROM sh
            ), firsts AS (
                SELECT s, min(doc_id) AS first_id FROM ex GROUP BY s
            )
            SELECT e.doc_id, count(*)::BIGINT AS n_shingles,
                   sum((f.first_id = e.doc_id)::INT)::BIGINT AS n_novel,
                   round(sum((f.first_id = e.doc_id)::INT)::DOUBLE
                         / count(*)::DOUBLE, 6) AS novelty
            FROM ex e JOIN firsts f ON e.s = f.s
            GROUP BY e.doc_id
        """,
        # Domain dup rates: md5 keeper-min + domain rollup.
        "domain_dup_rates": """
            WITH corpus AS (
                SELECT doc_id, 'd' || (doc_id % 7) AS domain, text
                FROM documents
                UNION ALL
                SELECT doc_id + 10000000,
                       'd' || ((doc_id + 10000000) % 7), text
                FROM documents WHERE doc_id % 5 = 4
            ), h AS (
                SELECT domain, doc_id, md5(text) AS m FROM corpus
            ), keep AS (
                SELECT m, min(doc_id) AS k FROM h GROUP BY m
            )
            SELECT h.domain, count(*)::BIGINT AS n_docs,
                   sum((h.doc_id != k.k)::INT)::BIGINT AS n_dups,
                   round(sum((h.doc_id != k.k)::INT)::DOUBLE
                         / count(*)::DOUBLE, 6) AS dup_rate
            FROM h JOIN keep k ON h.m = k.m
            GROUP BY h.domain
        """,
        # JL projection: md5-parity signs, micro-rounded per-dimension
        # products, exact integer fold, shared /1e6/sqrt(16) finish.
        "jl_project": """
            WITH dims AS (
                SELECT unnest(generate_series(0, 15)) AS dim
            ), proj AS (
                SELECT vec_id, d.dim,
                       list_sum(list_transform(
                           generate_series(1, len(embedding)), j ->
                           CAST((CASE WHEN (1e6 * embedding[j]::DOUBLE
                               * (CASE WHEN ('0x' || substr(md5(
                                     'jl:' || d.dim || ':' || j), 1, 15)
                                     )::BIGINT % 2 = 0
                                   THEN 1.0 ELSE -1.0 END)) >= 0
                             THEN floor(1e6 * embedding[j]::DOUBLE
                               * (CASE WHEN ('0x' || substr(md5(
                                     'jl:' || d.dim || ':' || j), 1, 15)
                                     )::BIGINT % 2 = 0
                                   THEN 1.0 ELSE -1.0 END) + 0.5)
                             ELSE ceil(1e6 * embedding[j]::DOUBLE
                               * (CASE WHEN ('0x' || substr(md5(
                                     'jl:' || d.dim || ':' || j), 1, 15)
                                     )::BIGINT % 2 = 0
                                   THEN 1.0 ELSE -1.0 END) - 0.5)
                             END) AS BIGINT)))::BIGINT AS m
                FROM embeddings, dims d
            )
            SELECT vec_id, dim::INT AS dim,
                   (CASE WHEN m >= 0 THEN floor(m::DOUBLE / 4.0 + 0.5)
                         ELSE ceil(m::DOUBLE / 4.0 - 0.5)
                    END) / 1e6 AS proj
            FROM proj
        """,
        # DOCX extraction: replay sources/docx.doc_blocks relationally —
        # tokens (str.split semantics via filtered \s+ split) chunk into
        # 40-token paragraphs, a Heading1 "Section {doc}.{k} — R&D
        # <draft>" opens every 6th chunk, every 4th body chunk opens
        # with a hard tab; empty docs still emit their opening heading.
        "docx_extract_blocks": """
            WITH d AS (
                SELECT doc_id,
                       list_filter(
                           regexp_split_to_array(coalesce(text, ''), '\\s+'),
                           x -> x <> '') AS toks
                FROM documents
            ), c AS (
                SELECT doc_id, toks, (len(toks) + 39) // 40 AS nc FROM d
            ), ks AS (
                SELECT doc_id, toks, nc,
                       unnest(generate_series(0, greatest(nc, 1) - 1)) AS k
                FROM c
            ), rows_ AS (
                SELECT doc_id, k, 0 AS sub, 'heading' AS block_type,
                       'Section ' || doc_id || '.' || (k // 6)
                           || ' — R&D <draft>' AS text
                FROM ks WHERE k % 6 = 0
                UNION ALL
                SELECT doc_id, k, 1, 'para',
                       CASE WHEN k % 4 = 0 THEN chr(9) ELSE '' END ||
                       array_to_string(
                           list_slice(toks, k * 40 + 1, (k + 1) * 40), ' ')
                FROM ks WHERE k < nc
            )
            SELECT doc_id,
                   row_number() OVER (
                       PARTITION BY doc_id ORDER BY k, sub)::BIGINT
                       AS block_id,
                   block_type, text
            FROM rows_
        """,
        # DOCX chapters: running heading count over the same block
        # replay, then a per-(doc, chapter) rollup.
        "docx_chapters": """
            WITH d AS (
                SELECT doc_id,
                       list_filter(
                           regexp_split_to_array(coalesce(text, ''), '\\s+'),
                           x -> x <> '') AS toks
                FROM documents
            ), c AS (
                SELECT doc_id, toks, (len(toks) + 39) // 40 AS nc FROM d
            ), ks AS (
                SELECT doc_id, toks, nc,
                       unnest(generate_series(0, greatest(nc, 1) - 1)) AS k
                FROM c
            ), rows_ AS (
                SELECT doc_id, k, 0 AS sub, 'heading' AS block_type,
                       'Section ' || doc_id || '.' || (k // 6)
                           || ' — R&D <draft>' AS text
                FROM ks WHERE k % 6 = 0
                UNION ALL
                SELECT doc_id, k, 1, 'para',
                       CASE WHEN k % 4 = 0 THEN chr(9) ELSE '' END ||
                       array_to_string(
                           list_slice(toks, k * 40 + 1, (k + 1) * 40), ' ')
                FROM ks WHERE k < nc
            ), numbered AS (
                SELECT doc_id, block_type, text,
                       sum((block_type = 'heading')::INT) OVER (
                           PARTITION BY doc_id ORDER BY k, sub
                           ROWS UNBOUNDED PRECEDING)::BIGINT AS chapter_id
                FROM rows_
            )
            SELECT doc_id, chapter_id,
                   max(CASE WHEN block_type = 'heading' THEN text END)
                       AS title,
                   sum((block_type = 'para')::INT)::BIGINT AS n_paras,
                   coalesce(sum(CASE WHEN block_type = 'para'
                                     THEN length(text) ELSE 0 END),
                            0)::BIGINT AS n_chars
            FROM numbered
            GROUP BY doc_id, chapter_id
        """,
        # Access gates: replay the fixture mutation + marker regexp
        # counts (marker lists imported from operators/gates.py so the
        # two sides cannot drift).
        "gate_signals": _gate_oracle(
            """
            SELECT doc_id, domain, n_words, paywall_hits, consent_hits,
                   (paywall_hits >= 2 AND n_words <= 120) AS is_paywalled,
                   (consent_hits >= 2) AS is_consent_gated
            FROM sig
            """
        ),
        "gate_rates": _gate_oracle(
            """
            SELECT domain, count(*)::BIGINT AS n_pages,
                   sum((paywall_hits >= 2 AND n_words <= 120)::INT)::BIGINT
                       AS n_paywalled,
                   sum((consent_hits >= 2)::INT)::BIGINT AS n_consent_gated,
                   round(sum((paywall_hits >= 2 AND n_words <= 120)::INT
                         )::DOUBLE / count(*)::DOUBLE, 6) AS paywall_rate,
                   round(sum((consent_hits >= 2)::INT)::DOUBLE
                         / count(*)::DOUBLE, 6) AS consent_rate
            FROM sig
            GROUP BY domain
            """
        ),
        # TextTiling: the shared scoring pipeline, gaps surfaced as-is.
        "texttiling_gaps": _texttiling_oracle(
            """
            SELECT doc_id, gap::BIGINT AS gap,
                   sim_micro::BIGINT AS sim_micro,
                   depth_micro::BIGINT AS depth_micro, is_boundary
            FROM scored
            """
        ),
        # Tiles: boundary gaps open segments; a boundary-free (or
        # single-pseudo-sentence) document is one tile.
        "text_segments": _texttiling_oracle(
            """
            , starts AS (
                SELECT doc_id, 0::BIGINT AS start_ps FROM np
                UNION ALL
                SELECT doc_id, gap FROM scored WHERE is_boundary
            )
            SELECT s.doc_id,
                   row_number() OVER (
                       PARTITION BY s.doc_id ORDER BY start_ps) AS seg_id,
                   start_ps,
                   coalesce(lead(start_ps) OVER (
                       PARTITION BY s.doc_id ORDER BY start_ps),
                       n.n_ps) - 1 AS end_ps,
                   coalesce(lead(start_ps) OVER (
                       PARTITION BY s.doc_id ORDER BY start_ps),
                       n.n_ps) - start_ps AS n_ps
            FROM starts s JOIN np n USING (doc_id)
            """
        ),
        # Subtitle cues: expected timing/text straight from the tokens
        # (8-token cues, 2.5 s pitch, 5 s silence before every 10th cue,
        # first 4 tokens on line 1) — independent of the string
        # round-trip, so writer∘parser must be the identity.
        "srt_cues": _subtitle_oracle(
            """
            SELECT doc_id, (cue + 1)::BIGINT AS cue_id,
                   (cue * 2500 + (cue // 10) * 5000)::BIGINT AS start_ms,
                   (cue * 2500 + (cue // 10) * 5000 + 2400)::BIGINT
                       AS end_ms,
                   array_to_string(list_slice(ct, 1, 4), ' ')
                   || CASE WHEN len(ct) > 4
                           THEN chr(10) || array_to_string(
                               list_slice(ct, 5, len(ct)), ' ')
                           ELSE '' END AS text
            FROM cu
            """
        ),
        # Transcripts: paragraphs at the scheduled silences (cue // 10),
        # cue-internal line breaks flatten to spaces.
        "srt_transcripts": _subtitle_oracle(
            """
            , fl AS (
                SELECT doc_id, cue, cue // 10 AS para,
                       array_to_string(ct, ' ') AS flat
                FROM cu
            ), paras AS (
                SELECT doc_id, para, count(*) AS n,
                       string_agg(flat, ' ' ORDER BY cue) AS ptext
                FROM fl GROUP BY doc_id, para
            )
            SELECT doc_id, sum(n)::BIGINT AS n_cues,
                   count(*)::BIGINT AS n_paras,
                   string_agg(ptext, chr(10) || chr(10) ORDER BY para)
                       AS transcript
            FROM paras GROUP BY doc_id
            """
        ),
        # Wikitext blocks: replay sources/wikitext.doc_wiki_blocks —
        # 30-token chunks, an alternating h2/h3 heading before every 5th
        # chunk, markup resolving back to the bare tokens.
        "wikitext_blocks": """
            WITH d AS (
                SELECT doc_id,
                       list_filter(
                           regexp_split_to_array(coalesce(text, ''), '\\s+'),
                           x -> x <> '') AS toks
                FROM documents
            ), c AS (
                SELECT doc_id, toks, (len(toks) + 29) // 30 AS nc FROM d
            ), ks AS (
                SELECT doc_id, toks, nc,
                       unnest(generate_series(0, greatest(nc, 1) - 1)) AS k
                FROM c
            ), rows_ AS (
                SELECT doc_id, k, 0 AS sub,
                       CASE WHEN (k // 5) % 2 = 0 THEN 'h2' ELSE 'h3' END
                           AS block_type,
                       'Heading ' || doc_id || '.' || (k // 5) AS text
                FROM ks WHERE k % 5 = 0
                UNION ALL
                SELECT doc_id, k, 1, 'para',
                       array_to_string(
                           list_slice(toks, k * 30 + 1, (k + 1) * 30), ' ')
                FROM ks WHERE k < nc
            )
            SELECT doc_id,
                   row_number() OVER (
                       PARTITION BY doc_id ORDER BY k, sub)::BIGINT
                       AS block_id,
                   block_type, text
            FROM rows_
        """,
        # Wikitext links: within-chunk positions i%11==0 are plain links
        # (target = token), i%11==5 piped links (target = 'T:'||token);
        # link_id numbers document order.
        "wikitext_links": """
            WITH d AS (
                SELECT doc_id,
                       list_filter(
                           regexp_split_to_array(coalesce(text, ''), '\\s+'),
                           x -> x <> '') AS toks
                FROM documents
            ), c AS (
                SELECT doc_id, toks, len(toks) AS nw,
                       (len(toks) + 29) // 30 AS nc
                FROM d
            ), ks AS (
                SELECT doc_id, toks, nw, nc,
                       unnest(generate_series(0, nc - 1)) AS k
                FROM c WHERE nc >= 1
            ), pos AS (
                SELECT doc_id, k, u.i - 1 AS i, toks[k * 30 + u.i] AS tok
                FROM ks, unnest(generate_series(1, 30)) AS u(i)
                WHERE k * 30 + u.i <= nw
            )
            SELECT doc_id,
                   row_number() OVER (
                       PARTITION BY doc_id ORDER BY k, i)::BIGINT
                       AS link_id,
                   CASE WHEN i % 11 = 0 THEN tok
                        ELSE 'T:' || tok END AS target,
                   tok AS anchor
            FROM pos WHERE i % 11 IN (0, 5)
        """,
        # Two-column PDFs: the column-aware sort must recover the
        # ORIGINAL linear flow, so the expected rows derive straight
        # from the words — title line, then 8-word lines flowing down
        # 6-row columns, two columns per page.
        "pdf_two_column_blocks": """
            WITH d AS (
                SELECT doc_id, coalesce(text, '') AS text FROM documents
            ), w AS (
                SELECT doc_id,
                       CASE WHEN text = '' THEN []::VARCHAR[]
                            ELSE string_split(text, ' ') END AS words
                FROM d
            ), n AS (
                SELECT doc_id, words,
                       1 + (len(words) + 7) // 8 AS n_lines
                FROM w
            ), ls AS (
                SELECT doc_id, words,
                       unnest(generate_series(0, n_lines - 1)) AS l
                FROM n
            )
            SELECT doc_id, l::BIGINT AS block_id,
                   (l // 12)::BIGINT AS page,
                   ((l % 12) // 6)::BIGINT AS "column",
                   CASE WHEN l = 0 THEN 'heading'
                        ELSE 'paragraph' END AS block_type,
                   CASE WHEN l = 0 THEN 'Document ' || doc_id
                        ELSE array_to_string(
                            list_slice(words, (l - 1) * 8 + 1, l * 8), ' ')
                        END AS text
            FROM ls
        """,
        # mbox: expected clean messages straight from the tokens —
        # 50-token messages, a "From the desk…" opener, 10-token body
        # lines, Re:-chained subjects, one quoted line per reply.
        "mbox_messages": _mbox_oracle(
            """
            SELECT doc_id, (m + 1)::BIGINT AS msg_id, subject,
                   n_quoted::BIGINT AS n_quoted, body
            FROM msgs
            """
        ),
        # Dialogue pairs: each reply answers the previous <=2 turns.
        "dialogue_pairs": _mbox_oracle(
            """
            SELECT doc_id, m::BIGINT AS pair_id,
                   CASE WHEN lag2 IS NULL THEN lag1
                        ELSE lag2 || chr(10) || '---' || chr(10) || lag1
                        END AS prompt,
                   body AS response
            FROM (
                SELECT doc_id, m, body,
                       lag(body, 1) OVER (
                           PARTITION BY doc_id ORDER BY m) AS lag1,
                       lag(body, 2) OVER (
                           PARTITION BY doc_id ORDER BY m) AS lag2
                FROM msgs
            )
            WHERE lag1 IS NOT NULL
            """
        ),
        # Stack-Exchange dump: every post row straight from the tokens —
        # 40-token posts, 8-token lines, deterministic scores, argmax
        # accepted answer.
        "sedump_posts": _sedump_oracle(
            """
            SELECT doc_id, post_id, post_type, parent_id, accepted_id,
                   score, title, body
            FROM posts
            """
        ),
        # Q&A SFT pairs: question joined to its accepted (= argmax)
        # answer; n_answers = posts − 1 by construction.
        "qa_sft_pairs": _sedump_oracle(
            """
            SELECT q.doc_id, q.title, q.body AS prompt,
                   a.body AS response, a.score AS best_score,
                   (q.np - 1)::BIGINT AS n_answers,
                   (a.post_id = q.accepted_id) AS is_accepted
            FROM posts q JOIN posts a
              ON a.doc_id = q.doc_id AND a.post_id = q.accepted_id
            WHERE q.post_type = 1
            """
        ),
        # k-anonymity / l-diversity: equivalence classes of the quasi
        # triple with strict >= flags.
        "k_anonymity": """
            WITH q AS (
                SELECT doc_id, lang, source,
                       coalesce(n_chars, 0) // 400 AS band
                FROM documents
            )
            SELECT lang, source, band,
                   count(*)::BIGINT AS class_size,
                   count(DISTINCT doc_id)::BIGINT AS n_sensitive,
                   (count(*) >= 5) AS k_anonymous,
                   (count(DISTINCT doc_id) >= 3) AS l_diverse
            FROM q GROUP BY lang, source, band
        """,
        # Entropy / recursive-(c,l) diversity: per-value counts joined
        # to class totals, each entropy term one correctly-rounded
        # float of exact ints quantized to micro-nats (order-free sum),
        # ln(3)*1e6 threshold as the shared Python literal 1098612.
        "diversity_audit": """
            WITH q AS (
                SELECT lang, coalesce(n_chars, 0) // 400 AS band, source
                FROM documents
            ), pv AS (
                SELECT lang, band, source AS v, count(*)::BIGINT AS rv
                FROM q GROUP BY 1, 2, 3
            ), tot AS (
                SELECT lang, band, sum(rv)::BIGINT AS n
                FROM pv GROUP BY 1, 2
            ), terms AS (
                SELECT pv.lang, pv.band, pv.rv,
                       CAST(round(-(pv.rv::DOUBLE / t.n)
                                  * ln(pv.rv::DOUBLE / t.n)
                                  * 1e6) AS BIGINT) AS term
                FROM pv JOIN tot t USING (lang, band)
            ), cls AS (
                SELECT lang, band,
                       sum(rv)::BIGINT AS class_size,
                       count(*)::BIGINT AS n_sensitive,
                       sum(term)::BIGINT AS entropy_micro,
                       list(rv ORDER BY rv DESC) AS rs
                FROM terms GROUP BY 1, 2
            )
            SELECT lang, band, class_size, n_sensitive, entropy_micro,
                   (entropy_micro >= 1098612) AS entropy_l_diverse,
                   rs[1]::BIGINT AS top_count,
                   coalesce(list_sum(list_slice(rs, 3, len(rs))), 0)::BIGINT
                       AS tail_sum,
                   (n_sensitive >= 3 AND
                    rs[1] < 2 * coalesce(list_sum(list_slice(rs, 3, len(rs))), 0))
                       AS recursive_cl_diverse
            FROM cls
        """,
        # t-closeness: class-vs-global TVD over the full sensitive
        # domain (absent values contribute their global mass); exact
        # HUGEINT numerator, one rounded division, literal 200000.
        "t_closeness": """
            WITH q AS (
                SELECT lang, coalesce(n_chars, 0) // 400 AS band, source
                FROM documents
            ), pv AS (
                SELECT lang, band, source AS v, count(*)::HUGEINT AS cv
                FROM q GROUP BY 1, 2, 3
            ), g AS (
                SELECT source AS v, count(*)::HUGEINT AS gv
                FROM q GROUP BY 1
            ), tot AS (SELECT count(*)::HUGEINT AS N FROM q),
            cls AS (
                SELECT lang, band, sum(cv)::HUGEINT AS class_size
                FROM pv GROUP BY 1, 2
            ), x AS (
                SELECT c.lang, c.band, c.class_size,
                       abs(coalesce(pv.cv, 0) * tot.N
                           - g.gv * c.class_size) AS term
                FROM cls c
                CROSS JOIN g
                LEFT JOIN pv ON pv.lang IS NOT DISTINCT FROM c.lang
                            AND pv.band IS NOT DISTINCT FROM c.band
                            AND pv.v IS NOT DISTINCT FROM g.v
                CROSS JOIN tot
            )
            SELECT lang, band, class_size::BIGINT AS class_size,
                   CAST(round(sum(term)::DOUBLE
                              / (2::DOUBLE * class_size::DOUBLE
                                 * (SELECT N FROM tot)::DOUBLE)
                              * 1e6) AS BIGINT) AS tvd_micro,
                   (CAST(round(sum(term)::DOUBLE
                               / (2::DOUBLE * class_size::DOUBLE
                                  * (SELECT N FROM tot)::DOUBLE)
                               * 1e6) AS BIGINT) <= 200000) AS t_close
            FROM x GROUP BY lang, band, class_size
        """,
        # Generalization ladder: unnest widths, one class count per
        # rung, argmin satisfying width via a scalar subquery.
        "k_generalization": """
            WITH w AS (
                SELECT unnest([400, 800, 1600, 3200, 6400, 12800, 25600])
                           AS width),
            cls AS (
                SELECT w.width, lang, source,
                       coalesce(n_chars, 0) // w.width AS band,
                       count(*)::BIGINT AS n
                FROM documents CROSS JOIN w
                GROUP BY 1, 2, 3, 4),
            rungs AS (
                SELECT width, count(*)::BIGINT AS n_classes,
                       min(n)::BIGINT AS min_class_size
                FROM cls GROUP BY 1),
            best AS (
                SELECT min(width) AS b FROM rungs
                WHERE min_class_size >= 5)
            SELECT r.width::INTEGER AS width, r.n_classes,
                   r.min_class_size,
                   (r.min_class_size >= 5) AS k_anonymous,
                   coalesce(r.width = (SELECT b FROM best), FALSE)
                       AS chosen
            FROM rungs r
        """,
        # Suppression: quasi cells NULLed for rows in sub-k classes.
        "quasi_suppression": """
            WITH q AS (
                SELECT doc_id, lang, source,
                       coalesce(n_chars, 0) // 400 AS band
                FROM documents
            ), sized AS (
                SELECT doc_id, lang, source, band,
                       count(*) OVER (PARTITION BY lang, source, band)
                           AS cs
                FROM q
            )
            SELECT doc_id,
                   CASE WHEN cs < 5 THEN NULL ELSE lang END AS lang,
                   CASE WHEN cs < 5 THEN NULL ELSE source END AS source,
                   CASE WHEN cs < 5 THEN NULL ELSE band END AS band,
                   (cs < 5) AS suppressed
            FROM sized
        """,
        # Anchor weak supervision: md5-bucketed negatives replayed with
        # the same 60-bit md5-prefix arithmetic as the Spark side.
        "anchor_query_pairs": """
            WITH corpus AS (
                SELECT 'doc://' || doc_id AS url, text FROM documents
            ), pairs AS (
                SELECT 'topic ' || (d.doc_id % 17) || ' guide '
                           || (d.doc_id % 4) AS query,
                       'doc://' || (d.doc_id - d.doc_id % 10) AS pos_url
                FROM documents d
            ), pos AS (
                SELECT p.query, p.pos_url, c.text AS pos_text
                FROM pairs p JOIN corpus c ON p.pos_url = c.url
            ), reps AS (
                SELECT ('0x' || substr(md5(url), 1, 15))::BIGINT % 16 AS b,
                       min(url) AS lo_url,
                       arg_min(text, url) AS lo_text,
                       max(url) AS hi_url,
                       arg_max(text, url) AS hi_text
                FROM corpus GROUP BY 1
            ), qb AS (
                SELECT query, pos_url, pos_text,
                       ('0x' || substr(md5(query || chr(31) || pos_url),
                                       1, 15))::BIGINT % 16 AS qb
                FROM pos
            )
            SELECT query, pos_url, pos_text,
                   CASE WHEN lo_url <> pos_url THEN lo_url
                        WHEN hi_url <> pos_url THEN hi_url END AS neg_url,
                   CASE WHEN lo_url <> pos_url THEN lo_text
                        WHEN hi_url <> pos_url THEN hi_text END AS neg_text
            FROM qb LEFT JOIN reps ON qb.qb = reps.b
        """,
        # Markdown meta: the fixture is fully deterministic, so every
        # output column replays as closed-form string arithmetic.
        "markdown_meta": """
            WITH d AS (
                SELECT doc_id,
                       list_filter(
                           regexp_split_to_array(coalesce(text, ''), '\\s+'),
                           x -> x <> '') AS toks
                FROM documents
            ), s AS (
                SELECT doc_id, toks,
                       CASE doc_id % 3 WHEN 0 THEN 'en'
                            WHEN 1 THEN 'de' ELSE 'fr' END AS lang,
                       CASE doc_id % 3 WHEN 0 THEN 'python'
                            WHEN 1 THEN 'js' ELSE 'sql' END AS flang
                FROM d
            )
            SELECT doc_id, true AS has_front_matter,
                   'Doc ' || doc_id AS fm_title,
                   lang AS fm_lang,
                   1::BIGINT AS n_fences,
                   flang AS first_fence_lang,
                   length('```' || flang || chr(10) || 'code_line('
                          || doc_id || ')' || chr(10) || 'x = '
                          || (doc_id % 9) || chr(10) || '```')::BIGINT
                       AS code_chars,
                   (length(array_to_string(list_slice(toks, 1, 40), ' '))
                    + 2 +
                    length(coalesce(array_to_string(
                        list_slice(toks, 41, len(toks)), ' '), '')))::BIGINT
                       AS prose_chars
            FROM s
        """,
        # Unified diffs: closed-form replay of the fixture spec —
        # 60-token files of 10-token lines, j%4==1 dels, j%4==2 adds.
        "unidiff_stats": """
            WITH d AS (
                SELECT doc_id,
                       list_filter(
                           regexp_split_to_array(coalesce(text, ''), '\\s+'),
                           x -> x <> '') AS toks
                FROM documents
            ), n AS (
                SELECT doc_id, toks, (len(toks) + 59) // 60 AS nf
                FROM d WHERE len(toks) >= 1
            ), fs AS (
                SELECT doc_id, toks,
                       unnest(generate_series(0, nf - 1)) AS f
                FROM n
            ), ch AS (
                SELECT doc_id, f,
                       (len(list_slice(toks, f * 60 + 1, f * 60 + 60)) + 9)
                           // 10 AS nl
                FROM fs
            ), js AS (
                SELECT doc_id, f, unnest(generate_series(0, nl - 1)) AS j
                FROM ch
            )
            SELECT doc_id, (f + 1)::BIGINT AS file_id,
                   'src/mod_' || doc_id || '_' || f || '.py' AS path,
                   1::BIGINT AS n_hunks,
                   sum((j % 4 = 2)::INT)::BIGINT AS n_adds,
                   sum((j % 4 = 1)::INT)::BIGINT AS n_dels,
                   sum((j % 4 NOT IN (1, 2))::INT)::BIGINT AS n_context
            FROM js GROUP BY doc_id, f
        """,
        # Jupyter notebooks: closed-form replay of the fixture spec —
        # 12-token cells of 4-token lines, cell i is code iff i%3==2.
        # n_chars = reassembled source text = token lengths + one
        # separator per gap (line joins use ' ', line breaks '\n').
        "ipynb_cells": """
            WITH d AS (
                SELECT doc_id,
                       list_filter(
                           regexp_split_to_array(coalesce(text, ''), '\\s+'),
                           x -> x <> '') AS toks
                FROM documents
            ), n AS (
                SELECT doc_id, toks, (len(toks) + 11) // 12 AS nc
                FROM d WHERE len(toks) >= 1
            ), cs AS (
                SELECT doc_id, toks,
                       unnest(generate_series(0, nc - 1)) AS i
                FROM n
            ), c AS (
                SELECT doc_id, i,
                       list_slice(toks, i * 12 + 1, i * 12 + 12) AS ct
                FROM cs
            )
            SELECT doc_id, (i + 1)::BIGINT AS cell_id,
                   CASE WHEN i % 3 = 2 THEN 'code'
                        ELSE 'markdown' END AS cell_type,
                   CASE WHEN i % 3 = 2 THEN (i + 1)::INT
                        END AS execution_count,
                   ((len(ct) + 3) // 4)::INT AS n_lines,
                   length(array_to_string(ct, ' '))::INT AS n_chars
            FROM c
        """,
        # LaTeX articles: closed-form replay of the fixture spec —
        # 40-token sections (3-token title, 8-token body lines); body
        # line j: equation iff j%5==3, comment iff j%5==4, else prose
        # with one cite on even j.  LEFT JOIN keeps body-less sections.
        "latex_sections": """
            WITH d AS (
                SELECT doc_id,
                       list_filter(
                           regexp_split_to_array(coalesce(text, ''), '\\s+'),
                           x -> x <> '') AS toks
                FROM documents
            ), n AS (
                SELECT doc_id, toks, (len(toks) + 39) // 40 AS ns
                FROM d WHERE len(toks) >= 1
            ), sec AS (
                SELECT doc_id, toks,
                       unnest(generate_series(0, ns - 1)) AS s
                FROM n
            ), sb AS (
                SELECT doc_id, s,
                       array_to_string(
                           list_slice(toks, s * 40 + 1, s * 40 + 3), ' ')
                           AS title,
                       (len(list_slice(toks, s * 40 + 4, s * 40 + 40)) + 7)
                           // 8 AS nl
                FROM sec
            ), js AS (
                SELECT doc_id, s, unnest(generate_series(0, nl - 1)) AS j
                FROM sb
            ), agg AS (
                SELECT doc_id, s,
                       sum((j % 5 = 3)::INT) AS n_eq,
                       sum((j % 5 = 4)::INT) AS n_comment,
                       sum((j % 5 NOT IN (3, 4) AND j % 2 = 0)::INT)
                           AS n_cite,
                       sum((j % 5 NOT IN (3, 4))::INT) AS n_prose
                FROM js GROUP BY doc_id, s
            )
            SELECT sb.doc_id, (sb.s + 1)::BIGINT AS sec_id, sb.title,
                   coalesce(agg.n_eq, 0)::BIGINT AS n_eq,
                   coalesce(agg.n_comment, 0)::BIGINT AS n_comment,
                   coalesce(agg.n_cite, 0)::BIGINT AS n_cite,
                   coalesce(agg.n_prose, 0)::BIGINT AS n_prose_lines
            FROM sb LEFT JOIN agg
                ON sb.doc_id = agg.doc_id AND sb.s = agg.s
        """,
        "llr_keyness": """
            WITH toks AS (
                SELECT lang,
                       unnest(regexp_extract_all(lower(text),
                                                 '[a-zà-öø-ÿ]+')) AS w
                FROM documents),
            ca AS (SELECT w, count(*)::BIGINT AS k_a FROM toks
                   WHERE lang = 'en' GROUP BY w),
            cb AS (SELECT w, count(*)::BIGINT AS k_b FROM toks
                   WHERE lang <> 'en' GROUP BY w),
            na AS (SELECT sum(k_a)::BIGINT AS n_a FROM ca),
            nb AS (SELECT sum(k_b)::BIGINT AS n_b FROM cb),
            j AS (
                SELECT coalesce(ca.w, cb.w) AS word,
                       coalesce(k_a, 0)::BIGINT AS k_a,
                       coalesce(k_b, 0)::BIGINT AS k_b
                FROM ca FULL OUTER JOIN cb ON ca.w = cb.w
                WHERE coalesce(k_a, 0) + coalesce(k_b, 0) >= 5),
            m AS (
                SELECT word, k_a, k_b,
                       k_a::DOUBLE AS ka, k_b::DOUBLE AS kb,
                       n_a, n_b,
                       n_a::DOUBLE AS da, n_b::DOUBLE AS db
                FROM j, na, nb)
            SELECT word, k_a, k_b,
                   round(2.0 * (
                       (CASE WHEN ka > 0 THEN ka * ln(ka /
                            (da * ((ka + kb) / (da + db)))) ELSE 0.0 END)
                     + (CASE WHEN kb > 0 THEN kb * ln(kb /
                            (db * ((ka + kb) / (da + db)))) ELSE 0.0 END)
                   ), 6) + 0.0 AS g2,
                   CASE WHEN k_a::HUGEINT * n_b::HUGEINT
                             > k_b::HUGEINT * n_a::HUGEINT THEN 'a'
                        WHEN k_a::HUGEINT * n_b::HUGEINT
                             < k_b::HUGEINT * n_a::HUGEINT THEN 'b'
                        ELSE 'tie' END AS enriched_in
            FROM m
        """,
        "rank_sum_test": """
            WITH d AS (
                SELECT (doc_id % 2)::VARCHAR AS g,
                       ((doc_id * 13) % 40 + 5 * (doc_id % 2))::BIGINT AS v
                FROM documents),
            pv AS (
                SELECT v, count(*)::HUGEINT AS c,
                       sum((g = '0')::INT)::HUGEINT AS c_a
                FROM d GROUP BY v),
            rk AS (
                SELECT v, c, c_a,
                       coalesce(sum(c) OVER (ORDER BY v
                           ROWS BETWEEN UNBOUNDED PRECEDING
                           AND 1 PRECEDING), 0) AS off
                FROM pv),
            s AS (
                SELECT sum(c_a * (2 * off + c + 1)) AS two_r_a,
                       sum(c * c * c - c) AS tie_sum,
                       sum(c_a)::BIGINT AS n_a,
                       sum(c - c_a)::BIGINT AS n_b
                FROM rk),
            m AS (
                SELECT n_a, n_b,
                       two_r_a::DOUBLE / 2.0
                           - n_a::DOUBLE * (n_a::DOUBLE + 1.0) / 2.0 AS u_a,
                       n_a::DOUBLE AS na, n_b::DOUBLE AS nb,
                       tie_sum::DOUBLE AS ts
                FROM s),
            v2 AS (
                SELECT n_a, n_b, u_a, na, nb,
                       na * nb - u_a AS u_b,
                       (na * nb / 12.0) * ((na + nb + 1.0)
                           - ts / ((na + nb) * (na + nb - 1.0))) AS var
                FROM m)
            SELECT '0' AS group_a, '1' AS group_b, n_a, n_b,
                   u_a + 0.0 AS u_a, u_b + 0.0 AS u_b,
                   CASE WHEN var > 0
                        THEN round((u_a - na * nb / 2.0) / sqrt(var), 6)
                             + 0.0
                   END AS z,
                   CASE WHEN var > 0 THEN
                       abs((u_a - na * nb / 2.0) / sqrt(var))
                           > 1.959963984540054::DOUBLE
                   ELSE FALSE END AS significant
            FROM v2
        """,
        "surt_keys": r"""
            WITH built AS (
                SELECT doc_id,
                       'HTTP://'
                       || CASE WHEN doc_id % 4 = 0 THEN 'WWW.'
                               WHEN doc_id % 4 = 1 THEN 'www2.'
                               WHEN doc_id % 4 = 2 THEN 'M.'
                               ELSE '' END
                       || 'News' || CAST(doc_id % 7 AS VARCHAR)
                       || '.Example.COM'
                       || CASE WHEN doc_id % 3 = 0 THEN ':8080'
                               ELSE '' END
                       || CASE WHEN doc_id % 2 = 0
                               THEN '/Path/' || CAST(doc_id AS VARCHAR)
                               ELSE '' END
                       || CASE WHEN doc_id % 5 = 0 THEN '?b=2&a=1'
                               WHEN doc_id % 5 = 1 THEN '?z=9&&a=1'
                               ELSE '' END
                       || CASE WHEN doc_id % 6 = 0 THEN '#Frag'
                               ELSE '' END AS url
                FROM documents),
            s1 AS (SELECT doc_id, url,
                          regexp_replace(
                              regexp_replace(lower(url), '#.*$', ''),
                              '^[a-z][a-z0-9+.\-]*://', '') AS u
                   FROM built),
            s2 AS (SELECT doc_id, url, u,
                          regexp_extract(u, '^([^/?]*)', 1) AS head
                   FROM s1),
            s3 AS (SELECT doc_id, url,
                          substr(u, length(head) + 1) AS rest,
                          regexp_extract(head, ':(\d+)$', 1) AS port,
                          regexp_replace(
                              regexp_replace(head, ':\d+$', ''),
                              '^www\d*\.', '') AS host
                   FROM s2),
            s4 AS (SELECT doc_id, url, port,
                          array_to_string(
                              list_reverse(string_split(host, '.')),
                              ',') AS rev,
                          regexp_extract(rest, '^([^?]*)', 1) AS path,
                          regexp_extract(rest, '^[^?]*\?(.*)$', 1)
                              AS query
                   FROM s3),
            s5 AS (SELECT doc_id, url, port, rev, path,
                          array_to_string(list_sort(list_filter(
                              string_split(query, '&'),
                              p -> p <> '')), '&') AS qs
                   FROM s4)
            SELECT doc_id, url,
                   rev
                   || CASE WHEN port <> '' THEN ':' || port ELSE '' END
                   || ')'
                   || CASE WHEN path = '' THEN '/' ELSE path END
                   || CASE WHEN qs <> '' THEN '?' || qs ELSE '' END
                       AS surt
            FROM s5
        """,
        "cdx_prefixes": """
            WITH built AS (
                SELECT 'com,site' || CAST(doc_id % 11 AS VARCHAR)
                           AS surt_prefix,
                       'com,site' || CAST(doc_id % 11 AS VARCHAR)
                           || ',sub' || CAST(doc_id % 5 AS VARCHAR)
                           || ')/p/' || CAST(doc_id % 20 AS VARCHAR)
                           AS surt
                FROM documents)
            SELECT surt_prefix, count(*)::BIGINT AS n_captures,
                   count(DISTINCT surt)::BIGINT AS n_urls
            FROM built GROUP BY surt_prefix
        """,
        "matryoshka_recall": """
            WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v
                       FROM embeddings),
            q AS (SELECT vec_id AS query_id, v AS qv FROM e
                  WHERE vec_id < 20),
            nq AS (SELECT count(DISTINCT query_id)::BIGINT AS n_queries
                   FROM q),
            fullr AS (
                SELECT query_id, vec_id FROM (
                    SELECT q.query_id, e.vec_id,
                           row_number() OVER (PARTITION BY q.query_id
                               ORDER BY list_dot_product(e.v, q.qv)
                                   / (sqrt(list_dot_product(e.v, e.v))
                                      * sqrt(list_dot_product(q.qv, q.qv)))
                                   DESC,
                               e.vec_id ASC) AS rnk
                    FROM e CROSS JOIN q)
                WHERE rnk <= 10),
            dims(dim) AS (VALUES (4), (8), (16)),
            truncr AS (
                SELECT dim, query_id, vec_id FROM (
                    SELECT d.dim, q.query_id, e.vec_id,
                           row_number() OVER (
                               PARTITION BY d.dim, q.query_id
                               ORDER BY
                                   list_dot_product(e.v[1:d.dim],
                                                    q.qv[1:d.dim])
                                   / (sqrt(list_dot_product(e.v[1:d.dim],
                                                            e.v[1:d.dim]))
                                      * sqrt(list_dot_product(
                                            q.qv[1:d.dim],
                                            q.qv[1:d.dim]))) DESC,
                               e.vec_id ASC) AS rnk
                    FROM e CROSS JOIN q CROSS JOIN dims d)
                WHERE rnk <= 10),
            hits AS (
                SELECT d.dim, count(*)::BIGINT AS hits
                FROM dims d
                LEFT JOIN (
                    SELECT t.dim FROM truncr t
                    JOIN fullr f ON t.query_id = f.query_id
                                AND t.vec_id = f.vec_id) m
                    ON m.dim = d.dim
                GROUP BY d.dim)
            SELECT h.dim::INT AS dim, nq.n_queries,
                   (CASE WHEN h.hits IS NULL THEN 0 ELSE h.hits END)
                       AS hits,
                   round(h.hits::DOUBLE / (nq.n_queries::DOUBLE * 10.0),
                         6) + 0.0 AS recall
            FROM hits h, nq
        """,
        "hard_negatives": """
            WITH docs AS (
                SELECT doc_id,
                       regexp_extract_all(lower(text),
                                          '[a-zà-öø-ÿ]+') AS ws
                FROM documents),
            stats AS (SELECT count(*)::DOUBLE AS n,
                             sum(len(ws))::DOUBLE AS sumdl
                      FROM docs),
            post AS (
                SELECT term, doc_id, dl, count(*)::INT AS tf FROM (
                    SELECT doc_id, len(ws) AS dl, unnest(ws) AS term
                    FROM docs)
                GROUP BY term, doc_id, dl),
            dfreq AS (
                SELECT term, count(*)::INT AS df FROM post
                GROUP BY term HAVING count(*) <= 400),
            pairs AS (
                SELECT doc_id AS query_id, doc_id AS pos_id,
                       ws[1:3] AS qws
                FROM docs WHERE doc_id % 7 = 0),
            qt AS (
                SELECT DISTINCT query_id, unnest(qws) AS term
                FROM pairs),
            cand AS (
                SELECT qt.query_id, p.doc_id,
                       sum(round(
                           ln((s.n - d.df + 0.5) / (d.df + 0.5) + 1.0)
                           * ((p.tf * (1.2 + 1.0))
                              / (p.tf + 1.2 * (1.0 - 0.75
                                  + (0.75 * p.dl) / (s.sumdl / s.n))))
                           * 1e6)::BIGINT)::BIGINT AS sm
                FROM qt
                JOIN post p ON qt.term = p.term
                JOIN dfreq d ON qt.term = d.term, stats s
                GROUP BY qt.query_id, p.doc_id),
            ranked AS (
                SELECT query_id, doc_id, sm::DOUBLE / 1e6 AS score,
                       row_number() OVER (PARTITION BY query_id
                           ORDER BY sm DESC, doc_id ASC) AS rnk
                FROM cand),
            negs AS (
                SELECT t.query_id, t.doc_id, t.score,
                       row_number() OVER (PARTITION BY t.query_id
                           ORDER BY t.rnk) AS rn
                FROM (SELECT * FROM ranked WHERE rnk <= 10) t
                JOIN pairs pr ON t.query_id = pr.query_id
                             AND t.doc_id <> pr.pos_id)
            SELECT pr.query_id, pr.pos_id,
                   n.doc_id AS neg_id, n.score + 0.0 AS neg_score
            FROM pairs pr
            LEFT JOIN (SELECT * FROM negs WHERE rn = 1) n
                ON pr.query_id = n.query_id
        """,
    }
