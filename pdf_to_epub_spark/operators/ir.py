"""Web-IR scoring operators: inverted index (postings), document
frequencies, TF-IDF weights, and BM25 ranked retrieval.

The reference pipeline has no retrieval surface (it is a per-file
converter); these operators extend the engine toward the corpus-query
side a Common-Crawl-scale store needs — "find the documents about X" over
the extracted text, the standard companion to dedup/quality filtering
when curating training data.

Scale design (the part that matters at 100 TB):

* ``term_postings`` is ONE shuffle keyed on ``(term, doc)`` — the doc id
  rides in the key, so a stop-word that appears in every document does
  not concentrate on one reducer (the classic inverted-index skew).
  Counts are map-side partial (``groupBy().count()`` hash aggregate).
* ``document_frequencies`` re-aggregates postings by term only.  Its
  input rows are already unique per (term, doc), so a ``count(*)`` — a
  map-side-combinable agg — equals ``count(distinct doc)`` without the
  distinct's extra exchange.
* ``bm25_topk`` never materializes any index for a query: per-term tf is
  a lookaround-anchored ``regexp_count`` per row, every corpus constant
  (N, avgdl, per-term df) rides ONE slim 1-row aggregate broadcast back
  (no ``collect()``), and the top-k is TakeOrderedAndProject
  (per-partition heaps + driver merge).  Zero data exchanges —
  plan-pinned.

Scores are rounded to 6 dp and ranking uses the ROUNDED score (then doc
id) so the ordering is reproducible bit-for-bit across engines — the
DuckDB oracle in ``__spark_entry__`` replays the same math.
"""

from __future__ import annotations

import functools
import re
from operator import or_

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# Word tokens: lowercase letter runs (accented Latin included) — the ONE
# token class, imported from textstats so the two modules cannot drift
# (identical oracles depend on it).
from .textstats import _TOKEN_CLASS, _tokens  # noqa: E402


def term_postings(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Inverted index: one row per (term, document) with the term
    frequency.  Output columns: ``term``, ``<id_col>``, ``tf``."""
    toks = docs.select(
        F.col(id_col), F.explode(_tokens(text_col)).alias("term")
    )
    return toks.groupBy("term", id_col).agg(
        F.count(F.lit(1)).cast("int").alias("tf")
    )


def document_frequencies(postings: DataFrame) -> DataFrame:
    """Per-term document frequency from a postings table (rows unique per
    (term, doc) by construction, so count(*) == count(distinct doc))."""
    return postings.groupBy("term").agg(
        F.count(F.lit(1)).cast("int").alias("df")
    )


def bm25_topk(
    docs: DataFrame,
    query_terms: list[str],
    k: int = 10,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """BM25 ranked retrieval for a bag-of-terms query: top-``k`` documents
    by ``sum over matching terms of idf(t) * tf*(k1+1)/(tf + k1*(1-b+b*dl/avgdl))``
    with ``idf(t) = ln((N - df + 0.5)/(df + 0.5) + 1)`` (the Lucene
    non-negative variant).

    Output: ``(<id_col>, score)`` ordered by (score desc, id) — the score
    is rounded to 6 dp and the ROUNDED value is what ranks, so the cut at
    k is engine-reproducible.

    Plan shape: for a bounded query-term set the whole retrieval is
    per-row codegen — ``tf`` per term via a lookaround-anchored
    ``regexp_count`` (Java regex; the token boundaries consume nothing,
    so adjacent occurrences all count), ``df``/``avgdl``/``N`` in ONE
    slim 1-row aggregate broadcast back, score as column arithmetic, and
    the k-cut as TakeOrderedAndProject.  The corpus never shuffles and
    no token stream is ever exploded — the earlier explode+groupBy form
    paid a (doc, term)-keyed exchange of every matching token (measured
    6.8 → 2.3 s on the high-df bench query; plan-pinned to zero data
    exchanges).  The DuckDB oracle keeps the explode+group formulation:
    two independent algorithms, one result.
    """
    # a term that is not a single token (digits, punctuation, spaces)
    # can never equal an exploded token — drop it up front so the regex
    # path cannot accidentally match it as a raw substring
    terms = sorted(
        {
            t.lower()
            for t in query_terms
            if re.fullmatch(f"{_TOKEN_CLASS}+", t.lower())
        }
    )
    if not terms:
        return docs.select(F.col(id_col)).limit(0).withColumn(
            "score", F.lit(None).cast("double")
        )

    def tf_of(t: str) -> Column:
        return F.expr(
            f"regexp_count(lower({text_col}),"
            f" '(?<!{_TOKEN_CLASS}){t}(?!{_TOKEN_CLASS})')"
        )

    dl = F.expr(f"regexp_count(lower({text_col}), '{_TOKEN_CLASS}+')")
    base = docs.select(
        F.col(id_col),
        dl.alias("__dl"),
        *[tf_of(t).alias(f"__tf_{i}") for i, t in enumerate(terms)],
    )

    # N, avgdl, and every term's df in ONE 1-row aggregate.
    consts = base.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg("__dl").alias("avgdl"),
        *[
            F.sum((F.col(f"__tf_{i}") > 0).cast("long")).alias(f"__df_{i}")
            for i in range(len(terms))
        ],
    )

    matched = base.filter(
        functools.reduce(or_, [F.col(f"__tf_{i}") > 0 for i in range(len(terms))])
    ).crossJoin(F.broadcast(consts))

    def weight(i: int) -> Column:
        tf = F.col(f"__tf_{i}")
        idf = F.log(
            (F.col("n_docs") - F.col(f"__df_{i}") + F.lit(0.5))
            / (F.col(f"__df_{i}") + F.lit(0.5))
            + F.lit(1.0)
        )
        w = (
            idf
            * (tf * (F.lit(k1) + 1.0))
            / (
                tf
                + F.lit(k1)
                * (F.lit(1.0) - F.lit(b) + F.lit(b) * F.col("__dl") / F.col("avgdl"))
            )
        )
        return F.when(tf > 0, w).otherwise(F.lit(0.0))

    total = weight(0)
    for i in range(1, len(terms)):
        total = total + weight(i)
    scored = matched.select(
        id_col, F.round(total, 6).alias("score")
    )
    return scored.orderBy(F.desc("score"), F.col(id_col)).limit(k)


def tfidf_weights(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Classic smoothed TF-IDF per (term, doc):
    ``(1 + ln tf) * ln((1 + N)/(1 + df))``, rounded to 6 dp.  One postings
    shuffle + one term agg; the df/N sides join back as broadcasts."""
    postings = term_postings(docs, id_col, text_col)
    dfreq = document_frequencies(postings)
    n = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    return (
        postings.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(n))
        .select(
            "term",
            id_col,
            "tf",
            "df",
            F.round(
                (F.lit(1.0) + F.log(F.col("tf").cast("double")))
                * F.log(
                    (F.lit(1.0) + F.col("n_docs"))
                    / (F.lit(1.0) + F.col("df"))
                ),
                6,
            ).alias("tfidf"),
        )
    )


def bigram_pmi(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_count: int = 5,
) -> DataFrame:
    """Collocation mining: pointwise mutual information over adjacent
    word pairs, ``pmi = ln(((c_ab/B) * (T/c_a)) * (T/c_b))`` with c_ab
    the corpus bigram count, c_a/c_b unigram counts, B/T the bigram and
    token totals.  The phrase-detection pass of a training-data pipeline
    (word2vec-style phrase merging, stock-phrase diagnostics).

    Output: ``(w1, w2, c_ab, pmi)`` for pairs with ``c_ab >= min_count``,
    pmi rounded to 6 dp.  The division/multiplication order is fixed
    (and mirrored in the oracle) so the float result is reproducible.

    Scale shape: bigrams explode once and aggregate keyed (w1, w2) with
    map-side partials; the unigram side aggregates keyed on the word.
    Both joins attach VOCABULARY-sized tables (≪ corpus) — Spark
    broadcasts them when they fit, and the totals are 1-row broadcast
    cross-joins.  The O(len) slice/zip_with pair build follows the
    lm.py pattern (arrays materialized before the lambda — the measured
    60x re-evaluation trap)."""
    toks = docs.select(
        F.col(id_col), _tokens(text_col).alias("__toks")
    )
    n = F.size("__toks")
    pairs = F.when(
        n >= 2,
        F.zip_with(
            F.slice("__toks", 1, n - 1),
            F.slice(F.col("__toks"), 2, n - 1),
            lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
        ),
    ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))

    uni = (
        toks.select(F.explode("__toks").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    big = (
        toks.select(F.explode(pairs).alias("p"))
        .select("p.w1", "p.w2")
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c_ab"))
        .filter(F.col("c_ab") >= min_count)
    )
    tot_t = uni.agg(F.sum("c").alias("t_total"))
    b_total = (
        toks.select(
            F.greatest(n - 1, F.lit(0)).alias("nb")
        ).agg(F.sum("nb").alias("b_total"))
    )
    ua = uni.select(F.col("w").alias("w1"), F.col("c").alias("c_a"))
    ub = uni.select(F.col("w").alias("w2"), F.col("c").alias("c_b"))
    return (
        big.join(ua, "w1")
        .join(ub, "w2")
        .crossJoin(F.broadcast(tot_t))
        .crossJoin(F.broadcast(b_total))
        .select(
            "w1",
            "w2",
            F.col("c_ab").cast("long").alias("c_ab"),
            F.round(
                F.log(
                    (F.col("c_ab") / F.col("b_total"))
                    * (F.col("t_total") / F.col("c_a"))
                    * (F.col("t_total") / F.col("c_b"))
                ),
                6,
            ).alias("pmi"),
        )
    )


def top_terms(
    docs: DataFrame,
    group_col: str = "lang",
    text_col: str = "text",
    k: int = 5,
) -> DataFrame:
    """Group-wise top-k terms by corpus frequency: ``(group, term, n,
    rank)`` with rank 1..k per group, ties broken by term (ascending) so
    the cut is deterministic.

    The window runs over the AGGREGATED (group, term) count table —
    vocabulary-sized, orders of magnitude smaller than the corpus — so
    the per-group sort is bounded by vocabulary, not document volume;
    the corpus itself only pays the one counting shuffle."""
    counts = (
        docs.select(F.col(group_col).alias("grp"), F.explode(_tokens(text_col)).alias("term"))
        .groupBy("grp", "term")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("grp").orderBy(F.desc("n"), F.asc("term"))
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(F.col("grp").alias(group_col), "term", "n",
                F.col("rank").cast("int").alias("rank"))
    )


def phrase_search(
    docs: DataFrame,
    phrase: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact phrase retrieval: ids of documents containing the token
    sequence ``phrase`` (adjacent positions, any non-token separator
    between words).  Positional-postings plan: tokenize with positions,
    keep ONLY the phrase's terms (an ``isin`` prune inside the scan
    stage), then chain position-adjacency joins term-by-term — the
    classic positional inverted-index intersection, with per-join key
    ``(id, pos)`` so skew follows documents, not terms.

    ONE corpus scan, ONE shuffle: an all-terms ``array_contains``
    prefilter drops non-candidate docs inside the scan stage, the
    surviving (pos, term) hits group per doc, and the adjacency test is
    per-row array algebra — each term's position list shifted by its
    phrase offset, then intersected (a k-leg join chain would re-run the
    tokenize subtree once per term; measured as the double-execution
    class in PLANS.md).

    The DuckDB oracle is a genuinely independent implementation (a
    boundary-anchored regex over the raw text), which is the point: two
    different algorithms agreeing on the result set."""
    terms = [t.lower() for t in phrase]
    if not terms:
        return docs.select(F.col(id_col)).limit(0)
    base = docs.select(F.col(id_col), _tokens(text_col).alias("__toks"))
    for t in set(terms):
        base = base.filter(F.array_contains("__toks", t))
    hits = (
        base.select(
            id_col, F.posexplode("__toks").alias("pos", "term")
        )
        .filter(F.col("term").isin(list(set(terms))))
        .groupBy(id_col)
        .agg(F.collect_list(F.struct("pos", "term")).alias("tp"))
    )
    # positions of term k, shifted back by k — the phrase exists iff the
    # shifted lists share a start position.  (A closure factory, not
    # default-arg lambdas: a 2-parameter lambda would be read by the
    # higher-order-function API as (element, index).)
    def _shifted(t: str, k: int) -> Column:
        return F.transform(
            F.filter(F.col("tp"), lambda s: s["term"] == F.lit(t)),
            lambda s: s["pos"] - k,
        )

    shifted = [_shifted(t, k) for k, t in enumerate(terms)]
    common = shifted[0]
    for arr in shifted[1:]:
        common = F.array_intersect(common, arr)
    return hits.filter(F.size(common) > 0).select(id_col)


def boolean_search(
    docs: DataFrame,
    must: list[str],
    must_not: list[str] | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Boolean retrieval (AND over ``must``, NOT over ``must_not``):
    logically the posting-list set algebra (intersect the must sets,
    subtract the must-not union), executed as ONE corpus scan with a
    per-row membership test on the token array — a per-term
    intersect/except chain would re-tokenize the corpus once per term
    (the double-execution class in PLANS.md).  The result is a DISTINCT
    id set (set semantics, like the posting-list algebra it models), so
    a corpus carrying duplicate id rows still yields each id once; the
    dedup aggregate runs over the slim post-filter id stream — the only
    shuffle in the plan."""
    if not must:
        return docs.select(F.col(id_col)).limit(0)
    base = docs.select(F.col(id_col), _tokens(text_col).alias("__toks"))
    for t in must:
        base = base.filter(F.array_contains("__toks", t.lower()))
    for t in must_not or []:
        base = base.filter(~F.array_contains("__toks", t.lower()))
    return base.select(id_col).distinct()


def update_postings(
    postings: DataFrame,
    new_docs: DataFrame,
    deleted_ids: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Incremental inverted-index maintenance for the daily re-crawl:
    drop postings of deleted/re-crawled ids (broadcast anti-join on the
    slim id set), tokenize ONLY the new batch, and union — the existing
    index is never re-tokenized, so the daily cost is O(batch), matching
    the incremental-dedup design (operators/dedup.py incremental path).
    Re-crawled ids should appear in BOTH ``deleted_ids`` and
    ``new_docs`` (replace semantics)."""
    kept = postings
    if deleted_ids is not None:
        kept = postings.join(
            F.broadcast(deleted_ids.select(id_col).distinct()),
            id_col,
            "left_anti",
        )
    fresh = term_postings(new_docs, id_col, text_col)
    return kept.unionByName(fresh)


def compact_postings(
    segments: DataFrame,
    id_col: str = "doc_id",
    seg_col: str = "segment",
) -> DataFrame:
    """Merge a segmented inverted index into one segment: a document
    appearing in segment *s* means *s* holds that document's COMPLETE
    postings (the :func:`update_postings` replace contract), so
    compaction keeps, per document, only the rows of its newest segment.

    The read-side resolve-on-read does this per query; compaction
    materializes it once so queries stop paying it — the LSM-style
    background merge every incremental index needs.

    One window (max(segment) over the doc partition) — a single shuffle
    on the doc key, NO join-back (a max-agg + join plan would re-scan
    the postings subtree twice).  Doc-keyed partitioning also means a
    posting store bucketed by doc_id compacts with zero exchanges.
    Output: the input columns minus ``seg_col``."""
    from pyspark.sql.window import Window

    w = Window.partitionBy(id_col)
    return (
        segments.withColumn("__max_seg", F.max(seg_col).over(w))
        .where(F.col(seg_col) == F.col("__max_seg"))
        .drop("__max_seg", seg_col)
    )


def keyword_snippets(
    docs: DataFrame,
    term: str,
    width: int = 30,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """KWIC snippet per document: up to ``width`` chars of context on
    each side of the FIRST whole-token occurrence of ``term``, NULL when
    absent — the result-presentation companion to :func:`bm25_topk`.
    Snippets are LOWERCASED: the match runs over ``lower(text)`` with a
    case-sensitive pattern, because ``(?i)`` folds ASCII-only under Java
    but full-Unicode under RE2 — an uppercase accented letter adjacent
    to the term would make the two engines disagree about the token
    boundary.  Lowering first gives one deterministic answer that the
    DuckDB oracle reproduces with the literally identical regex (no
    lookarounds, so it runs under RE2 too); pure codegen, no shuffle."""
    t = term.lower()
    if not re.fullmatch(f"{_TOKEN_CLASS}+", t):
        return docs.select(
            F.col(id_col), F.lit(None).cast("string").alias("snippet")
        )
    pat = (
        f"(?s).{{0,{width}}}(?:^|[^{_TOKEN_CLASS[1:-1]}]){t}"
        f"(?:[^{_TOKEN_CLASS[1:-1]}]|$).{{0,{width}}}"
    )
    sn = F.regexp_extract(F.lower(F.col(text_col)), pat, 0)
    return docs.select(
        F.col(id_col),
        F.when(F.length(sn) > 0, sn).alias("snippet"),
    )


def proximity_search(
    docs: DataFrame,
    term_a: str,
    term_b: str,
    window: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Proximity retrieval: documents where ``term_a`` and ``term_b``
    occur within ``window`` token positions; returns ``(id, min_dist)``.

    ZERO-shuffle plan (the boolean_search shape): an ``array_contains``
    prefilter gates non-candidates inside the scan stage, then per-doc
    array algebra — index-aware HOF extracts each term's position list
    from the ONE materialized token array, a nested transform takes all
    pairwise |pa - pb|, and array_min is the proximity.  Position-list
    sizes are per-doc term frequencies, so the pairwise step is tiny;
    no posting explode, no join, no exchange.

    The DuckDB oracle is an independent algorithm: positional rows via
    parallel unnest + a within-doc self-join."""
    ta, tb = term_a.lower(), term_b.lower()

    def _positions(term: str) -> Column:
        # NB: a 2-parameter HOF lambda is ALWAYS (element, index)
        return F.filter(
            F.transform(
                F.col("__toks"),
                lambda x, i: F.when(x == F.lit(term), i).otherwise(F.lit(-1)),
            ),
            lambda v: v >= 0,
        )

    base = (
        docs.select(F.col(id_col), _tokens(text_col).alias("__toks"))
        .filter(F.array_contains("__toks", ta))
        .filter(F.array_contains("__toks", tb))
        # MATERIALIZE both position arrays before the pairwise step: an
        # unbound _positions(tb) expression inside the outer transform's
        # lambda would re-scan the whole token array once per term_a
        # occurrence (the per-element re-evaluation trap — see
        # dedup._shingles_from_tokens)
        .select(id_col, _positions(ta).alias("__pa"), _positions(tb).alias("__pb"))
    )
    dists = F.flatten(
        F.transform(
            "__pa",
            lambda a: F.transform("__pb", lambda b: F.abs(a - b)),
        )
    )
    return (
        base.withColumn("min_dist", F.array_min(dists).cast("int"))
        .where(F.col("min_dist") <= window)
        .select(id_col, "min_dist")
    )


def skipgram_pairs(
    df: DataFrame,
    window: int = 4,
    top: int = 50,
    min_count: int = 2,
    text_col: str = "text",
) -> DataFrame:
    """Window co-occurrence (skip-gram) pair counts: unordered token
    pairs appearing within ``window`` tokens of each other, the
    word2vec/GloVe co-occurrence statistic and the term-association
    signal one notch wider than bigram_pmi's adjacent pairs.

    NO token-table self-join (that would re-key the corpus against
    itself): pairs are generated per document inside the projection —
    an index-aware transform pairs each token with the ``window``
    tokens after it via slice, flattened, then one combiner-enabled
    groupBy on the unordered pair.  The token array is materialized in
    its own projection first and the explode is the explode_outer +
    null-filter form, so InferFiltersFromGenerate cannot re-inline the
    pair lambda below the generator (the 60× re-evaluation class,
    plan-pinned elsewhere).

    Returns ``(term_a, term_b, n_cooc)`` — the ``top`` most frequent
    pairs at ``min_count``+, boundary ties broken by the pair strings.
    """
    toks = df.select(_tokens(text_col).alias("_toks"))
    pairs = F.flatten(
        F.transform(
            F.col("_toks"),
            lambda t, i: F.transform(
                F.slice(F.col("_toks"), i + 2, window),
                lambda u: F.struct(
                    F.least(t, u).alias("a"), F.greatest(t, u).alias("b")
                ),
            ),
        )
    )
    ex = (
        toks.select(F.explode_outer(pairs).alias("p"))
        .where(F.col("p").isNotNull())
        .select(F.col("p.a").alias("term_a"), F.col("p.b").alias("term_b"))
    )
    return (
        ex.groupBy("term_a", "term_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_cooc"))
        .where(F.col("n_cooc") >= min_count)
        .orderBy(F.desc("n_cooc"), F.asc("term_a"), F.asc("term_b"))
        .limit(top)
    )


def rrf_fuse(
    runs: DataFrame,
    query_col: str = "query_id",
    id_col: str = "doc_id",
    score_col: str = "score",
    run_col: str = "run_id",
    k: int = 60,
    topn: int = 10,
) -> DataFrame:
    """Reciprocal-rank fusion of several retrieval runs per query —
    the standard way to merge a lexical (BM25) and a dense (embedding)
    ranking without score calibration: ``rrf(d) = Σ_runs 1/(k + rank)``.

    Scale shape: ranks are ``row_number`` windows partitioned by
    ``(query, run)`` — never a global window, so the sort parallelizes
    across queries; fusion is one map-side-combinable groupBy on
    ``(query, doc)``; the final per-query top-``n`` is another
    query-partitioned window.  Contributions are summed as INTEGER
    nano-units (``round(1e9/(k+rank))``) so the fused score is exact
    and order-independent — a double Σ would drift with partition
    order.  Ties in both rankings break on doc id, so the output is
    bit-stable across engines (the DuckDB oracle replays the same
    arithmetic).

    Returns ``(query, doc, n_runs, rrf_nano, fused_rank)``, the top
    ``topn`` docs per query, best first.
    """
    w_run = Window.partitionBy(query_col, run_col).orderBy(
        F.desc(score_col), F.asc(id_col)
    )
    contrib = runs.select(
        query_col,
        id_col,
        F.round(F.lit(1e9) / (F.lit(k) + F.row_number().over(w_run)), 0)
        .cast("long")
        .alias("_nano"),
    )
    fused = contrib.groupBy(query_col, id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_runs"),
        F.sum("_nano").cast("long").alias("rrf_nano"),
    )
    w_q = Window.partitionBy(query_col).orderBy(
        F.desc("rrf_nano"), F.asc(id_col)
    )
    return (
        fused.withColumn("fused_rank", F.row_number().over(w_q).cast("int"))
        .where(F.col("fused_rank") <= topn)
    )


def prf_expand(
    docs: DataFrame,
    query_terms: list[str],
    k_docs: int = 10,
    top_terms: int = 10,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_term_len: int = 3,
    stopwords: tuple[str, ...] | None = None,
) -> DataFrame:
    """Pseudo-relevance-feedback query expansion (RM1-flavored): run
    the query, take the top ``k_docs`` BM25 documents as the feedback
    set, and rank the terms of that set by their relevance-model
    weight ``Σ_d tf(t,d)/|d|`` — the standard automatic
    query-expansion step of a retrieval stack (Lavrenko & Croft 2001),
    minus the per-document RSV reweighting (uniform feedback-doc
    weights keep every sum an exact integer).

    Scale shape: the feedback set is ``k_docs`` rows — the ONLY token
    explode runs over those rows (semi-join first, then tokenize), so
    the expansion cost is independent of corpus size; BM25 itself is
    the zero-exchange ``bm25_topk``.  Per-document contributions are
    micro-unit integers (``round(1e6·tf/dl)``), summed exactly.
    Original query terms, stopwords, and sub-``min_term_len`` tokens
    never expand.

    Returns ``(term, n_docs, weight_micro)``, top ``top_terms`` by
    (weight, term).
    """
    from .textstats import RAKE_STOPWORDS

    stops = set(stopwords if stopwords is not None else RAKE_STOPWORDS)
    exclude = stops | {t.lower() for t in query_terms}
    fb = bm25_topk(
        docs, query_terms, k=k_docs, id_col=id_col, text_col=text_col
    ).select(id_col)
    toks = (
        docs.join(F.broadcast(fb), id_col, "left_semi")
        .select(F.col(id_col), _tokens(text_col).alias("_t"))
        .select(
            id_col,
            F.size("_t").alias("_dl"),
            F.explode_outer("_t").alias("term"),
        )
        .where(
            F.col("term").isNotNull()
            & (F.length("term") >= min_term_len)
            & ~F.col("term").isin(*sorted(exclude))
        )
    )
    per_doc = toks.groupBy(id_col, "term", "_dl").agg(
        F.count(F.lit(1)).alias("_tf")
    )
    contrib = per_doc.select(
        "term",
        F.round(
            F.lit(1e6) * F.col("_tf").cast("double")
            / F.col("_dl").cast("double"),
            0,
        ).cast("long").alias("_w"),
    )
    return (
        contrib.groupBy("term")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("_w").cast("long").alias("weight_micro"),
        )
        .orderBy(F.desc("weight_micro"), F.asc("term"))
        .limit(top_terms)
    )


def anchor_query_pairs(
    anchors: DataFrame,
    docs: DataFrame,
    url_col: str = "url",
    text_col: str = "text",
    target_col: str = "target",
    anchor_col: str = "anchor",
    buckets: int = 16,
) -> DataFrame:
    """Anchor-text weak supervision for retriever training: every
    (anchor text → target page) edge becomes a (query, positive) pair —
    the classic web-IR construction (anchor text is an external
    description of the target, cf. DPR-style weak supervision) — plus a
    DETERMINISTIC hash-bucketed negative so the emitted triple is
    training-ready.

    Negative sampling without a global shuffle: documents hash into
    ``buckets`` by url (md5-based so the oracle replays it); each pair
    picks the bucket keyed by md5(query ␟ pos_url) and takes that
    bucket's min-url representative — or the max-url one when the min
    IS the positive (single-doc buckets yield a NULL negative rather
    than a false one).  Cost: one bounded ``buckets``-row aggregate +
    one broadcast-size join; the corpus never reshuffles.

    Returns ``(query, pos_url, pos_text, neg_url, neg_text)``.
    """
    from pdf_to_epub_spark.operators.dedup import md5_hash60

    d = docs.select(
        F.col(url_col).alias("_durl"), F.col(text_col).alias("_dtext")
    )
    pos = (
        anchors.select(
            F.col(anchor_col).alias("query"),
            F.col(target_col).alias("pos_url"),
        )
        .join(d, F.col("pos_url") == F.col("_durl"), "inner")
        .select("query", "pos_url", F.col("_dtext").alias("pos_text"))
    )
    reps = (
        d.withColumn("_b", F.pmod(md5_hash60(F.col("_durl")), F.lit(buckets)))
        .groupBy("_b")
        .agg(
            F.min(F.struct("_durl", "_dtext")).alias("_lo"),
            F.max(F.struct("_durl", "_dtext")).alias("_hi"),
        )
    )
    qb = pos.withColumn(
        "_qb",
        F.pmod(
            md5_hash60(F.concat_ws("\x1f", "query", "pos_url")),
            F.lit(buckets),
        ),
    )
    neg = (
        F.when(F.col("_lo._durl") != F.col("pos_url"), F.col("_lo"))
        .when(F.col("_hi._durl") != F.col("pos_url"), F.col("_hi"))
    )
    return (
        qb.join(F.broadcast(reps), F.col("_qb") == F.col("_b"), "left")
        .select(
            "query",
            "pos_url",
            "pos_text",
            neg["_durl"].alias("neg_url"),
            neg["_dtext"].alias("neg_text"),
        )
    )


def llr_keyness(
    docs_a: DataFrame,
    docs_b: DataFrame,
    text_col: str = "text",
    min_count: int = 5,
) -> DataFrame:
    """Dunning (1993) log-likelihood keyness between two corpora: for
    each word, G² = 2·(k_a·ln(k_a/e_a) + k_b·ln(k_b/e_b)) with
    e_x = n_x·(k_a+k_b)/(n_a+n_b) the expected count under the pooled
    rate — the standard "which terms distinguish corpus A from corpus B"
    table (source-mix diagnostics, topic drift between crawl snapshots,
    filter before/after comparisons).  A zero count contributes a zero
    term (lim x→0 of x·ln x), mirrored exactly in the oracle via the
    same CASE guard.

    Output: ``(word, k_a, k_b, g2, enriched_in)`` for words with
    ``k_a + k_b >= min_count``; ``g2`` rounded to 6 dp with a fixed
    operation order the SQL oracle replays term-for-term;
    ``enriched_in`` ∈ {'a','b','tie'} decided by the EXACT integer
    cross-product comparison k_a·n_b vs k_b·n_a (no float rate race) in
    a decimal(38,0) accumulator — k·n overflows int64 once a corpus
    passes ~10¹⁸ token-count-products, which a 100 TB crawl does.

    Scale shape (the dsir_log_ratios contract): each corpus aggregates
    once into its vocabulary table (map-side combined word counts — the
    corpus text never re-shuffles), the two vocab tables full-outer join
    on the word, and the two totals ride 1-row broadcast cross joins.
    At 100 TB the join touches only vocabulary-sized tables."""

    def counts(df: DataFrame, name: str) -> DataFrame:
        return (
            df.select(F.explode(_tokens(text_col)).alias("word"))
            .groupBy("word")
            .agg(F.count(F.lit(1)).cast("long").alias(name))
        )

    ca = counts(docs_a, "k_a")
    cb = counts(docs_b, "k_b")
    tot_a = ca.agg(F.sum("k_a").alias("n_a"))
    tot_b = cb.agg(F.sum("k_b").alias("n_b"))
    joined = (
        ca.join(cb, "word", "full_outer")
        .select(
            "word",
            F.coalesce("k_a", F.lit(0)).alias("k_a"),
            F.coalesce("k_b", F.lit(0)).alias("k_b"),
        )
        .where((F.col("k_a") + F.col("k_b")) >= min_count)
        .crossJoin(F.broadcast(tot_a))
        .crossJoin(F.broadcast(tot_b))
    )
    k_a, k_b = F.col("k_a").cast("double"), F.col("k_b").cast("double")
    n_a, n_b = F.col("n_a").cast("double"), F.col("n_b").cast("double")
    pooled = (k_a + k_b) / (n_a + n_b)
    e_a, e_b = n_a * pooled, n_b * pooled

    def term(k: Column, e: Column) -> Column:
        return F.when(k > 0, k * F.log(k / e)).otherwise(F.lit(0.0))

    g2 = F.lit(2.0) * (term(k_a, e_a) + term(k_b, e_b))
    dec = "decimal(38,0)"
    xa = F.col("k_a").cast(dec) * F.col("n_b").cast(dec)
    xb = F.col("k_b").cast(dec) * F.col("n_a").cast(dec)
    enriched = (
        F.when(xa > xb, F.lit("a"))
        .when(xa < xb, F.lit("b"))
        .otherwise(F.lit("tie"))
    )
    return joined.select(
        "word",
        "k_a",
        "k_b",
        (F.round(g2, 6) + F.lit(0.0)).alias("g2"),
        enriched.alias("enriched_in"),
    )


def bm25_batch_topk(
    docs: DataFrame,
    queries: DataFrame,
    k: int = 10,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    query_id_col: str = "query_id",
    query_col: str = "query",
    k1: float = 1.2,
    b: float = 0.75,
    max_df: int | None = None,
) -> DataFrame:
    """BM25 top-k for a TABLE of queries — the batch-retrieval shape
    `bm25_topk`'s single-query codegen form cannot take (its per-term
    ``regexp_count`` columns are compiled per query; a thousand queries
    need the inverted index).  Same Lucene scoring:
    ``idf = ln((N − df + 0.5)/(df + 0.5) + 1)``, tf saturation with
    ``k1``/``b`` length normalization; the 6-dp ROUNDED score ranks
    (ties by doc id), so the k-cut is engine-reproducible.

    Output: ``(<query_id_col>, <id_col>, score, rank)``.

    Plan shape: ONE postings build (term, doc, tf, dl — the doc length
    rides the posting row so no per-doc join-back is needed), df and
    the 1-row (N, avgdl) aggregate broadcast onto it, distinct query
    terms join the postings keyed on term, and the per-query score sum
    + top-k window shuffle only candidate rows.  The skew risk is a
    stop-word query term: its postings list is the whole corpus.
    ``max_df`` prunes such terms from candidate generation (their idf
    is near zero, so dropping them is the WAND-style approximation
    every production engine makes) — None keeps exact scoring.

    Determinism: per-term contributions quantize to integer
    MICRO-units before the per-query sum (the `operators/lm.py`
    contract) — a float sum over a shuffled candidate set is
    order-dependent in its last bits, and a 6-dp rounding of it can
    flip the k-cut between engines; integer sums cannot.
    """
    toks = docs.select(
        F.col(id_col).alias("_doc"), _tokens(text_col).alias("__t")
    )
    stats = toks.agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum(F.size("__t")).alias("_sumdl"),
    )
    post = (
        toks.select(
            "_doc",
            F.size("__t").alias("_dl"),
            F.explode_outer("__t").alias("term"),
        )
        .where(F.col("term").isNotNull())
        .groupBy("term", "_doc", "_dl")
        .agg(F.count(F.lit(1)).cast("int").alias("tf"))
    )
    dfreq = post.groupBy("term").agg(
        F.count(F.lit(1)).cast("int").alias("_df")
    )
    if max_df is not None:
        dfreq = dfreq.where(F.col("_df") <= max_df)
    qt = (
        queries.select(
            F.col(query_id_col), F.explode_outer(_tokens(query_col)).alias("term")
        )
        .where(F.col("term").isNotNull())
        .distinct()
    )
    n_d = F.col("_n").cast("double")
    avgdl = F.col("_sumdl").cast("double") / n_d
    idf = F.log(
        (n_d - F.col("_df") + F.lit(0.5)) / (F.col("_df") + F.lit(0.5))
        + F.lit(1.0)
    )
    tf = F.col("tf").cast("double")
    contrib = idf * (
        tf
        * (F.lit(k1) + 1.0)
        / (
            tf
            + F.lit(k1)
            * (F.lit(1.0) - F.lit(b) + F.lit(b) * F.col("_dl") / avgdl)
        )
    )
    cand = (
        qt.join(post.join(F.broadcast(dfreq), "term"), "term")
        .crossJoin(F.broadcast(stats))
        .groupBy(query_id_col, "_doc")
        .agg(
            (
                F.sum(F.round(contrib * F.lit(1e6)).cast("long")).cast(
                    "double"
                )
                / F.lit(1e6)
            ).alias("score")
        )
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.desc("score"), F.asc("_doc")
    )
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            query_id_col,
            F.col("_doc").alias(id_col),
            (F.col("score") + F.lit(0.0)).alias("score"),
            F.col("rank").cast("int").alias("rank"),
        )
    )


def mine_hard_negatives(
    pairs: DataFrame,
    docs: DataFrame,
    k_candidates: int = 10,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    query_id_col: str = "query_id",
    query_col: str = "query",
    pos_col: str = "pos_id",
    max_df: int | None = None,
) -> DataFrame:
    """DPR-style hard-negative mining: for each (query, positive-doc)
    training pair, the top BM25-ranked document that is NOT the
    positive — the standard upgrade from random negatives (which
    `extract_anchor_texts`' weak-supervision triples use) to
    retrieval-confusable ones, the single biggest data-side lever on
    dense-retriever quality.

    Output: ``(<query_id_col>, <pos_col>, neg_id, neg_score)``; a query
    whose every candidate is its own positive yields a NULL neg_id
    (left join keeps the pair visible rather than silently dropping
    the training row).

    Shape: one `bm25_batch_topk` pass (its postings/df/stats plan),
    then a slim per-query min-rank pick over candidates with the
    positive anti-filtered — everything after retrieval shuffles only
    (query, candidate) rows.  ``k_candidates`` bounds how deep past
    the positive the miner may look; raise it if positives often
    dominate several top slots."""
    topk = bm25_batch_topk(
        docs,
        pairs.select(query_id_col, F.col(query_col)),
        k=k_candidates,
        id_col=id_col,
        text_col=text_col,
        query_id_col=query_id_col,
        query_col=query_col,
        max_df=max_df,
    )
    keyed = pairs.select(query_id_col, pos_col)
    negs = topk.join(keyed, query_id_col).where(
        F.col(id_col) != F.col(pos_col)
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.asc("rank")
    )
    best = (
        negs.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select(
            query_id_col,
            F.col(id_col).alias("neg_id"),
            F.col("score").alias("neg_score"),
        )
    )
    return keyed.join(best, query_id_col, "left").select(
        query_id_col, pos_col, "neg_id", "neg_score"
    )


def negative_sampling_table(
    df: DataFrame,
    table_size: int = 100_000,
    k: int = 1000,
    text_col: str = "text",
) -> DataFrame:
    """word2vec-style negative-sampling table: the top-``k`` corpus
    vocabulary apportioned ``table_size`` sampling slots proportional to
    unigram_count^0.75 (Mikolov's smoothing — raw frequency oversamples
    stopwords, uniform undersamples them).  Companion to
    :func:`skipgram_pairs`, which mines the positive pairs.

    Exactness: count^0.75 = sqrt(sqrt(count³)) — count³ stays an exact
    integer and ``sqrt`` is IEEE-correctly-rounded in every engine,
    unlike libm ``pow``, whose last-ulp drift across platforms would
    poison a floor().  The bit-identical double is floor-quantized to
    micro-units, and the slot split is largest-remainder (Hamilton)
    apportionment over those exact integers
    (:func:`~pdf_to_epub_spark.operators.sampling.allocate_budget`), so
    allocations sum to EXACTLY ``table_size`` and the whole table
    replays in SQL.

    Scale: one map-side-combined word count + a bounded top-k
    (TakeOrdered); the apportionment runs driver-side over ≤ k rows.
    Returns ``(word, n, w_micro, slots)``.
    """
    from pdf_to_epub_spark.operators.sampling import allocate_budget
    from pdf_to_epub_spark.operators.textstats import build_vocab

    vocab = build_vocab(df, k=k, text_col=text_col)
    n = F.col("n").cast("decimal(38,0)")
    # lazy checkpoint: `w` feeds BOTH allocate_budget's bounded collect
    # and the final join — without it the corpus word count runs twice
    w = vocab.select(
        "word",
        F.col("n").cast("long").alias("n"),
        F.floor(
            F.lit(1e6) * F.sqrt(F.sqrt((n * n * n).cast("double")))
        ).cast("long").alias("w_micro"),
    ).localCheckpoint(eager=False)
    # allocate_budget keeps the caller's column names: (word, w_micro,
    # alloc) here
    alloc = allocate_budget(
        w, table_size, stratum_col="word", n_col="w_micro"
    )
    return w.join(
        alloc.select("word", F.col("alloc").alias("slots")), "word"
    ).select("word", "n", "w_micro", "slots")
