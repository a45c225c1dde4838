"""Unit tests for ngram_novelty, domain_dup_rates (dedup) and
jl_project (similarity)."""

from __future__ import annotations

import math

import pytest

from pdf_to_epub_spark.operators import (
    domain_dup_rates,
    jl_project,
    ngram_novelty,
)


# -------------------------------------------------------------- ngram_novelty


def test_novelty_copy_scores_zero(spark):
    t = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    docs = spark.createDataFrame(
        [(1, t), (2, t), (3, "completely fresh words appear only here now")],
        "doc_id bigint, text string",
    )
    out = {r["doc_id"]: r for r in ngram_novelty(docs, k=5).collect()}
    assert out[1]["novelty"] == 1.0
    assert out[2]["novelty"] == 0.0 and out[2]["n_novel"] == 0
    assert out[3]["novelty"] == 1.0
    assert out[1]["n_shingles"] == 6  # 10 tokens, k=5 -> 6 shingles


def test_novelty_partial_overlap(spark):
    docs = spark.createDataFrame(
        [
            (1, "one two three four five"),
            (2, "one two three four five six"),
        ],
        "doc_id bigint, text string",
    )
    out = {r["doc_id"]: r for r in ngram_novelty(docs, k=5).collect()}
    # doc 2 has 2 shingles; "one..five" seen in doc 1, "two..six" novel
    assert out[2]["n_shingles"] == 2 and out[2]["n_novel"] == 1
    assert out[2]["novelty"] == 0.5


def test_novelty_short_docs_use_fallback_shingle(spark):
    docs = spark.createDataFrame(
        [(1, "tiny doc"), (2, "tiny doc")], "doc_id bigint, text string"
    )
    out = {r["doc_id"]: r for r in ngram_novelty(docs, k=5).collect()}
    assert out[1]["n_shingles"] == 1 and out[1]["novelty"] == 1.0
    assert out[2]["novelty"] == 0.0


# ---------------------------------------------------------- domain_dup_rates


def test_domain_dup_rates_cross_domain_copy(spark):
    docs = spark.createDataFrame(
        [
            (1, "a.com", "same text"),
            (2, "b.com", "same text"),
            (3, "b.com", "unique text"),
        ],
        "doc_id bigint, domain string, text string",
    )
    out = {r["domain"]: r for r in domain_dup_rates(docs).collect()}
    assert out["a.com"]["n_dups"] == 0  # keeper is the LOWEST id
    assert out["b.com"]["n_dups"] == 1 and out["b.com"]["n_docs"] == 2
    assert out["b.com"]["dup_rate"] == 0.5


def test_domain_dup_rates_null_text_counts(spark):
    # md5(NULL) is NULL and NULL keys never survive an equi-join: a
    # NULL-text doc must still count toward n_docs, a domain of ONLY
    # NULL-text docs must still appear, and NULL-text docs are exact
    # copies of each other for this audit
    docs = spark.createDataFrame(
        [
            (1, "a.com", "real text"),
            (2, "a.com", None),
            (3, "nulls.com", None),
            (4, "nulls.com", None),
        ],
        "doc_id bigint, domain string, text string",
    )
    out = {r["domain"]: r for r in domain_dup_rates(docs).collect()}
    assert set(out) == {"a.com", "nulls.com"}
    assert out["a.com"]["n_docs"] == 2
    # doc 2 duplicates doc 3's NULL class? keeper is min id over the
    # NULL sentinel hash = doc 2, so doc 3 and 4 are the dups
    assert out["a.com"]["n_dups"] == 0
    assert out["nulls.com"]["n_docs"] == 2 and out["nulls.com"]["n_dups"] == 2


def test_domain_dup_rates_all_unique(spark):
    docs = spark.createDataFrame(
        [(i, "d", f"text {i}") for i in range(5)],
        "doc_id bigint, domain string, text string",
    )
    row = domain_dup_rates(docs).collect()[0]
    assert row["n_dups"] == 0 and row["dup_rate"] == 0.0


# ------------------------------------------------------------------ jl_project


def test_jl_shape_and_determinism(spark):
    emb = spark.createDataFrame(
        [(1, [float(i) / 10 for i in range(8)])],
        "vec_id bigint, embedding array<float>",
    )
    a = sorted(jl_project(emb, out_dims=4).collect())
    b = sorted(jl_project(emb, out_dims=4).collect())
    assert a == b and len(a) == 4
    assert [r["dim"] for r in a] == [0, 1, 2, 3]


def test_jl_zero_vector_projects_to_zero(spark):
    emb = spark.createDataFrame(
        [(1, [0.0] * 8)], "vec_id bigint, embedding array<float>"
    )
    assert all(r["proj"] == 0.0 for r in jl_project(emb, out_dims=4).collect())


def test_jl_norm_roughly_preserved(spark):
    # JL with +-1 signs preserves squared norms in expectation; for a
    # 64->16 cut a single vector should land within a loose factor
    import random

    rng = random.Random(7)
    v = [rng.uniform(-1, 1) for _ in range(64)]
    emb = spark.createDataFrame(
        [(1, v)], "vec_id bigint, embedding array<float>"
    )
    rows = jl_project(emb, out_dims=16).collect()
    pn = sum(r["proj"] ** 2 for r in rows)
    on = sum(x * x for x in v)
    assert 0.3 * on < pn < 3.0 * on
