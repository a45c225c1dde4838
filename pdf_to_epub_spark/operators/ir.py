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
* ``bm25_topk`` never materializes the full index for a query: the
  postings build is filtered with ``term IN (query terms)`` BEFORE the
  tokenize explode leaves the scan stage (an ``array_contains`` prefilter
  on the token array drops non-matching docs pre-explode), the per-term
  ``df``/``idf`` table is a handful of rows joined back via broadcast,
  and the final top-k is ``ORDER BY … LIMIT k`` which Spark executes as
  TakeOrderedAndProject (per-partition heaps + driver merge, no global
  sort shuffle).
* Corpus constants (N, avgdl) come from one tiny aggregate cross-joined
  back as a broadcast — no ``collect()``.

Scores are rounded to 6 dp and ranking uses the ROUNDED score (then doc
id) so the ordering is reproducible bit-for-bit across engines — the
DuckDB oracle in ``__spark_entry__`` replays the same math.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Word tokens: lowercase letter runs (accented Latin included) — the same
# token class textstats uses, RE2-portable for the oracle.
_TOKEN_RE = "[a-zà-öø-ÿ]+"


def _tokens(text_col: str) -> Column:
    return F.expr(f"regexp_extract_all(lower({text_col}), '{_TOKEN_RE}', 0)")


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


def document_frequencies(
    postings: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
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
    """
    terms = sorted(set(t.lower() for t in query_terms))
    dl = F.expr(f"regexp_count(lower({text_col}), '{_TOKEN_RE}')")
    base = docs.select(F.col(id_col), _tokens(text_col).alias("__toks"))

    # Corpus constants: one 1-row aggregate, broadcast back.
    consts = base.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg(F.size("__toks")).alias("avgdl"),
    )

    # Pre-explode prune: only docs containing at least one query term
    # survive to the explode; then the exploded stream keeps query terms
    # only.  Both predicates sit inside the scan/codegen stage.
    any_match = None
    for t in terms:
        c = F.array_contains("__toks", t)
        any_match = c if any_match is None else (any_match | c)
    matched = base.filter(any_match if any_match is not None else F.lit(False))
    hits = (
        matched.select(
            id_col,
            F.size("__toks").alias("dl"),
            F.explode("__toks").alias("term"),
        )
        .filter(F.col("term").isin(terms))
        .groupBy(id_col, "dl", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )

    # df per query term — tiny (≤ |terms| rows), broadcast back onto hits.
    dfreq = hits.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = (
        hits.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(consts))
        .withColumn(
            "__idf",
            F.log(
                (F.col("n_docs") - F.col("df") + F.lit(0.5))
                / (F.col("df") + F.lit(0.5))
                + F.lit(1.0)
            ),
        )
        .withColumn(
            "__w",
            F.col("__idf")
            * (F.col("tf") * (F.lit(k1) + 1.0))
            / (
                F.col("tf")
                + F.lit(k1)
                * (F.lit(1.0) - F.lit(b) + F.lit(b) * F.col("dl") / F.col("avgdl"))
            ),
        )
        .groupBy(id_col)
        .agg(F.round(F.sum("__w"), 6).alias("score"))
    )
    return scored.orderBy(F.desc("score"), F.col(id_col)).limit(k)


def tfidf_weights(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Classic smoothed TF-IDF per (term, doc):
    ``(1 + ln tf) * ln((1 + N)/(1 + df))``, rounded to 6 dp.  One postings
    shuffle + one term agg; the df/N sides join back as broadcasts."""
    postings = term_postings(docs, id_col, text_col)
    dfreq = document_frequencies(postings, id_col)
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
