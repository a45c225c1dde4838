"""Web-IR operators (operators/ir.py): inverted index, TF-IDF, BM25.

Hand-computed goldens on a tiny corpus plus physical-plan pins for the
scale-critical properties (broadcast df join, TakeOrderedAndProject
top-k — no global sort shuffle)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from pdf_to_epub_spark.operators import (
    bigram_pmi,
    bm25_topk,
    document_frequencies,
    term_postings,
    tfidf_weights,
    top_terms,
)

CORPUS = [
    (1, "the cat sat on the mat"),
    (2, "the dog sat"),
    (3, "a cat and a dog"),
    (4, "numbers 123 only!"),  # no letter-run tokens besides 'numbers'/'only'
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(CORPUS, ["doc_id", "text"]).cache()


def test_postings_unique_and_tf(docs):
    rows = {
        (r.term, r.doc_id): r.tf for r in term_postings(docs).collect()
    }
    assert rows[("the", 1)] == 2
    assert rows[("the", 2)] == 1
    assert rows[("cat", 3)] == 1
    assert ("123", 4) not in rows  # digits are not word tokens
    # unique per (term, doc)
    assert len(rows) == len(set(rows))


def test_document_frequencies(docs):
    dfreq = {
        r.term: r.df
        for r in document_frequencies(term_postings(docs)).collect()
    }
    assert dfreq["the"] == 2
    assert dfreq["cat"] == 2
    assert dfreq["mat"] == 1


def _bm25_hand(tf: int, df: int, dl: int, n: int, avgdl: float,
               k1: float = 1.2, b: float = 0.75) -> float:
    idf = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
    return idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))


def test_bm25_matches_hand_computation(docs):
    # corpus: dl = [6, 3, 5, 2], N=4, avgdl=16/4
    got = {r.doc_id: r.score for r in bm25_topk(docs, ["cat"], k=10).collect()}
    avgdl = 16 / 4
    exp1 = round(_bm25_hand(1, 2, 6, 4, avgdl), 6)
    exp3 = round(_bm25_hand(1, 2, 5, 4, avgdl), 6)
    assert got == {1: pytest.approx(exp1, abs=1e-9),
                   3: pytest.approx(exp3, abs=1e-9)}
    # shorter doc scores higher for equal tf
    assert got[3] > got[1]


def test_bm25_multi_term_sum_and_order(docs):
    rows = bm25_topk(docs, ["cat", "dog"], k=10).collect()
    ids = [r.doc_id for r in rows]
    # doc 3 has both terms -> highest
    assert ids[0] == 3
    assert set(ids) == {1, 2, 3}
    # scores strictly ordered by (score desc, doc_id)
    scores = [r.score for r in rows]
    assert scores == sorted(scores, reverse=True) or all(
        (a > b) or (a == b and i < j)
        for (i, a), (j, b) in zip(
            [(r.doc_id, r.score) for r in rows],
            [(r.doc_id, r.score) for r in rows[1:]],
        )
    )


def test_bm25_empty_query_and_no_match(docs):
    assert bm25_topk(docs, [], k=5).count() == 0
    assert bm25_topk(docs, ["zebra"], k=5).count() == 0


def test_bm25_case_folding(docs):
    a = {r.doc_id: r.score for r in bm25_topk(docs, ["CAT"], k=5).collect()}
    b = {r.doc_id: r.score for r in bm25_topk(docs, ["cat"], k=5).collect()}
    assert a == b


def test_tfidf_golden(docs):
    rows = {
        (r.term, r.doc_id): r
        for r in tfidf_weights(docs).collect()
    }
    r = rows[("the", 1)]
    assert r.tf == 2 and r.df == 2
    exp = round((1 + math.log(2.0)) * math.log((1 + 4) / (1 + 2)), 6)
    assert r.tfidf == pytest.approx(exp, abs=1e-9)
    # a term appearing in every doc with tf=1 gets weight ln(5/ (1+df))
    r = rows[("sat", 1)]
    assert r.tf == 1 and r.df == 2


def test_bm25_plan_topk_and_broadcasts(docs):
    """Scale pins: the k-cut is TakeOrderedAndProject (no global sort
    Exchange) and the df/consts joins are broadcasts, never shuffled
    joins."""
    plan = (
        bm25_topk(docs, ["cat", "dog"], k=3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan, plan[:2000]
    assert "SortMergeJoin" not in plan, plan[:2000]


def test_postings_single_exchange(docs):
    """The inverted-index build is exactly one shuffle, keyed on
    (term, doc) — the doc id in the key is the stop-word skew guard."""
    plan = (
        term_postings(docs)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange") == 1, plan[:2000]


def test_bigram_pmi_golden(spark):
    import math

    # "a b" appears 3x, tokens: a:3, b:3, T=6, B=3 (three 2-token docs)
    docs = spark.createDataFrame(
        [(1, "a b"), (2, "a b"), (3, "a b")], ["doc_id", "text"]
    )
    rows = bigram_pmi(docs, min_count=2).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.w1, r.w2, r.c_ab) == ("a", "b", 3)
    exp = round(math.log(((3 / 3) * (6 / 3)) * (6 / 3)), 6)
    assert r.pmi == pytest.approx(exp, abs=1e-9)


def test_bigram_pmi_min_count_and_short_docs(spark):
    docs = spark.createDataFrame(
        [(1, "x y"), (2, "solo"), (3, "")], ["doc_id", "text"]
    )
    # "x y" occurs once < min_count=2; 1-token and empty docs contribute
    # no pairs and must not error
    assert bigram_pmi(docs, min_count=2).count() == 0


def test_top_terms_rank_and_ties(spark):
    docs = spark.createDataFrame(
        [("en", "b b a a c"), ("en", "a"), ("fr", "z z y")],
        ["lang", "text"],
    )
    rows = {(r.lang, r.rank): (r.term, r.n) for r in
            top_terms(docs, k=2).collect()}
    assert rows[("en", 1)] == ("a", 3)
    assert rows[("en", 2)] == ("b", 2)
    assert rows[("fr", 1)] == ("z", 2)
    assert rows[("fr", 2)] == ("y", 1)
    assert len(rows) == 4  # k cut applied per group


def test_top_terms_tie_broken_by_term(spark):
    docs = spark.createDataFrame([("en", "b a")], ["lang", "text"])
    rows = top_terms(docs, k=2).orderBy("rank").collect()
    # equal counts -> lexicographic term order decides rank
    assert [r.term for r in rows] == ["a", "b"]


def test_phrase_search_adjacency(spark):
    from pdf_to_epub_spark.operators import phrase_search

    docs = spark.createDataFrame(
        [
            (1, "big data spark window merge now"),
            (2, "spark then window merge"),        # not adjacent
            (3, "spark window merge"),             # whole doc is the phrase
            (4, "SPARK window, merge!"),           # case + punctuation seps
            (5, "window merge spark"),             # wrong order
        ],
        ["doc_id", "text"],
    )
    got = {r.doc_id for r in
           phrase_search(docs, ["spark", "window", "merge"]).collect()}
    assert got == {1, 3, 4}


def test_phrase_search_repeated_token_phrase(spark):
    from pdf_to_epub_spark.operators import phrase_search

    docs = spark.createDataFrame(
        [(1, "go go go"), (2, "go stop go")], ["doc_id", "text"]
    )
    assert {r.doc_id for r in phrase_search(docs, ["go", "go"]).collect()} \
        == {1}
    assert phrase_search(docs, []).count() == 0


def test_boolean_search_set_algebra(spark):
    from pdf_to_epub_spark.operators import boolean_search

    docs = spark.createDataFrame(
        [
            (1, "spark window fast"),
            (2, "spark window slow"),   # excluded by must_not
            (3, "spark only"),          # missing a must term
            (4, "window spark window"), # dup terms collapse to one id row
        ],
        ["doc_id", "text"],
    )
    got = {r.doc_id for r in
           boolean_search(docs, ["spark", "window"], ["slow"]).collect()}
    assert got == {1, 4}
    rows = boolean_search(docs, ["window"]).collect()
    assert sorted(r.doc_id for r in rows) == [1, 2, 4]  # distinct ids
    assert boolean_search(docs, []).count() == 0


def test_update_postings_equals_fresh_build(spark):
    from pdf_to_epub_spark.operators import term_postings, update_postings

    v1 = spark.createDataFrame(
        [(1, "a b a"), (2, "b c"), (3, "c d")], ["doc_id", "text"]
    )
    # recrawl doc 2 with new text, add doc 4, delete doc 3
    new = spark.createDataFrame([(2, "x y"), (4, "a z")], ["doc_id", "text"])
    deleted = spark.createDataFrame([(2,), (3,)], ["doc_id"])
    updated = update_postings(term_postings(v1), new, deleted)

    logical = spark.createDataFrame(
        [(1, "a b a"), (2, "x y"), (4, "a z")], ["doc_id", "text"]
    )
    exp = {(r.term, r.doc_id, r.tf) for r in term_postings(logical).collect()}
    got = {(r.term, r.doc_id, r.tf) for r in updated.collect()}
    assert got == exp
    # no deletions: pure append
    app = update_postings(
        term_postings(v1), spark.createDataFrame([(5, "q")], ["doc_id", "text"])
    )
    assert ("q", 5, 1) in {(r.term, r.doc_id, r.tf) for r in app.collect()}


def test_bm25_zero_corpus_exchange(docs):
    """The count-based BM25 plan never shuffles the corpus: tf per term
    is lookaround-anchored regexp_count (per-row codegen), df/avgdl ride
    one 1-row broadcast aggregate, the k-cut is TakeOrderedAndProject."""
    import re

    plan = (
        bm25_topk(docs, ["cat", "dog"], k=3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert not re.findall(r"Exchange (hash|range)partitioning", plan), plan[:3000]


def test_bm25_adjacent_occurrences_count(spark):
    """Lookaround boundaries consume nothing: 'the the the' must count
    tf=3, not 2 (a consuming-boundary regex undercounts alternates)."""
    docs = spark.createDataFrame([(1, "the the the")], ["doc_id", "text"])
    r = bm25_topk(docs, ["the"], k=1).collect()[0]
    # tf=3, df=1, N=1, dl=3, avgdl=3
    import math
    idf = math.log((1 - 1 + 0.5) / (1 + 0.5) + 1.0)
    exp = round(idf * 3 * 2.2 / (3 + 1.2 * (0.25 + 0.75 * 1.0)), 6)
    assert r.score == pytest.approx(exp, abs=1e-9)


def test_bm25_non_token_terms_ignored(spark):
    """Digits/punctuation can never equal a token — '123' must not match
    raw text as a substring via the regex path."""
    docs = spark.createDataFrame([(1, "price 123 only")], ["doc_id", "text"])
    assert bm25_topk(docs, ["123"], k=5).count() == 0
    got = {r.doc_id for r in bm25_topk(docs, ["price", "123"], k=5).collect()}
    assert got == {1}  # the valid term still scores


def test_keyword_snippets(spark):
    from pdf_to_epub_spark.operators import keyword_snippets

    docs = spark.createDataFrame(
        [
            (1, "aaa bbb ccc MERGE ddd eee fff"),
            (2, "no hit here"),
            (3, "merged edges only"),   # substring, not a whole token
            (4, "merge at start"),
        ],
        ["doc_id", "text"],
    )
    rows = {r.doc_id: r.snippet
            for r in keyword_snippets(docs, "merge", width=8).collect()}
    # snippets are lowercased (matching runs over lower(text) so Java and
    # RE2 agree on boundaries — no (?i) folding divergence)
    assert "merge" in rows[1] and "MERGE" not in rows[1]
    # at most width chars each side (plus the boundary chars)
    assert len(rows[1]) <= 8 + 1 + 5 + 1 + 8
    assert rows[2] is None
    assert rows[3] is None           # token boundary respected
    assert rows[4].startswith("merge")  # ^ anchor at doc start
    # non-token terms yield all-NULL, never a raw substring match
    rows = {r.doc_id: r.snippet
            for r in keyword_snippets(docs, "a+b", width=8).collect()}
    assert all(v is None for v in rows.values())


def test_boolean_search_duplicate_id_rows(spark):
    from pdf_to_epub_spark.operators import boolean_search

    docs = spark.createDataFrame(
        [(1, "spark window"), (1, "spark window again")],
        ["doc_id", "text"],
    )
    rows = boolean_search(docs, ["spark"]).collect()
    assert [r.doc_id for r in rows] == [1]  # distinct ids, set semantics


def test_keyword_snippets_accented_boundary_parity(spark):
    """Uppercase accented letter adjacent to the term: lower() first makes
    it part of the token run, so 'merge' is NOT a whole token — the exact
    case where (?i) folding diverged between Java and RE2."""
    from pdf_to_epub_spark.operators import keyword_snippets

    docs = spark.createDataFrame([(1, "zÀmerge ok")], ["doc_id", "text"])
    assert keyword_snippets(docs, "merge").collect()[0].snippet is None


def test_proximity_search_window_semantics(spark):
    from pdf_to_epub_spark.operators.ir import proximity_search

    df = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta"),          # dist 2 (alpha..gamma)
            (2, "alpha x x x x x gamma"),            # dist 6
            (3, "gamma y alpha"),                    # order-free, dist 2
            (4, "alpha only here"),                  # missing term b
            (5, "gamma gamma alpha gamma"),          # repeats -> min 1
            (6, None),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["min_dist"]
           for r in proximity_search(df, "ALPHA", "gamma", window=4).collect()}
    assert got == {1: 2, 3: 2, 5: 1}
    wide = {r["doc_id"]: r["min_dist"]
            for r in proximity_search(df, "alpha", "gamma", window=6).collect()}
    assert wide == {1: 2, 2: 6, 3: 2, 5: 1}
