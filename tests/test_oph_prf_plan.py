"""Unit tests for oph_minhash (dedup), prf_expand (ir), lsh_plan
(sketch)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pdf_to_epub_spark.operators import (
    lsh_plan,
    oph_minhash_pairs,
    oph_minhash_signatures,
    prf_expand,
)


# -------------------------------------------------------------- OPH minhash


def test_oph_signature_shape_and_determinism(spark):
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta eta theta")],
        "doc_id bigint, text string",
    )
    a = oph_minhash_signatures(docs, num_hashes=16).collect()[0]["sig"]
    b = oph_minhash_signatures(docs, num_hashes=16).collect()[0]["sig"]
    assert a == b and len(a) == 16
    assert all(v is not None for v in a)


def test_oph_identical_docs_identical_sigs(spark):
    t = "the quick brown fox jumps over the lazy dog today again"
    docs = spark.createDataFrame(
        [(1, t), (2, t)], "doc_id bigint, text string"
    )
    rows = {r["doc_id"]: r["sig"] for r in oph_minhash_signatures(docs).collect()}
    assert rows[1] == rows[2]


def test_oph_densification_borrows_with_offset(spark):
    # a single shingle fills exactly ONE bin (identity at distance 0);
    # the other 15 must borrow that value salted as xxhash64(base, t)
    # for rotation distance t — the overflow-safe replacement for the
    # classic additive t*2^40 offset (which ANSI mode can throw on)
    docs = spark.createDataFrame(
        [(1, "one two three")], "doc_id bigint, text string"
    )
    sig = oph_minhash_signatures(docs, k=5, num_hashes=16).collect()[0]["sig"]

    def _xx(v: int, t: int) -> int:
        return (
            spark.range(1)
            .select(F.xxhash64(F.lit(v), F.lit(t).cast("long")))
            .collect()[0][0]
        )

    # exactly one bin holds the raw value such that every other bin is
    # its distance-salted borrow
    base_js = [
        j
        for j in range(16)
        if all(
            sig[i] == _xx(sig[j], (j - i) % 16) for i in range(16) if i != j
        )
    ]
    assert len(base_js) == 1
    base_j = base_js[0]
    for j in range(16):
        t = (base_j - j) % 16
        assert sig[j] == (sig[base_j] if t == 0 else _xx(sig[base_j], t))


def test_oph_pairs_match_exact_jaccard_contract(spark):
    t = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    docs = spark.createDataFrame(
        [(1, t), (2, t + " extra"), (3, "totally different words here now then")],
        "doc_id bigint, text string",
    )
    pairs = oph_minhash_pairs(
        docs, k=3, num_hashes=32, bands=16, jaccard_threshold=0.5
    ).collect()
    assert [(p["id_a"], p["id_b"]) for p in pairs] == [(1, 2)]
    assert pairs[0]["jaccard"] > 0.5


def test_oph_textless_docs_sign_identically(spark):
    # NULL text falls back to the single empty-string shingle (same
    # policy as minhash_signatures): both docs get the SAME signature
    docs = spark.createDataFrame(
        [(1, None), (2, None)], "doc_id bigint, text string"
    )
    sigs = {r["doc_id"]: r["sig"] for r in oph_minhash_signatures(docs).collect()}
    assert sigs[1] == sigs[2]


# ---------------------------------------------------------------- prf_expand


def test_prf_expansion_terms_from_feedback_only(spark):
    docs = spark.createDataFrame(
        [
            (1, "spark cluster tuning guide cluster cluster"),
            (2, "spark shuffle tuning notes"),
            (3, "gardening tomatoes compost soil"),
        ],
        "doc_id bigint, text string",
    )
    out = prf_expand(docs, ["spark"], k_docs=2, top_terms=5)
    terms = {r["term"] for r in out.collect()}
    assert "cluster" in terms and "tuning" in terms
    assert "spark" not in terms  # query term excluded
    assert "tomatoes" not in terms  # not in feedback set


def test_prf_weights_are_exact_micro_sums(spark):
    docs = spark.createDataFrame(
        [(1, "apple banana apple cherry")], "doc_id bigint, text string"
    )
    out = {r["term"]: r for r in prf_expand(docs, ["cherry"], k_docs=1).collect()}
    # dl = 4 tokens; apple tf=2 -> 500000; banana tf=1 -> 250000
    assert out["apple"]["weight_micro"] == 500_000
    assert out["banana"]["weight_micro"] == 250_000
    assert out["apple"]["n_docs"] == 1


def test_prf_short_and_stop_terms_excluded(spark):
    docs = spark.createDataFrame(
        [(1, "ox it the apple")], "doc_id bigint, text string"
    )
    terms = {r["term"] for r in prf_expand(docs, ["apple"], k_docs=1).collect()}
    assert terms == set()  # ox too short, it/the stopwords, apple query


# ------------------------------------------------------------------ lsh_plan


def test_lsh_plan_divisors_and_midpoints(spark):
    out = {(r["bands"], r["rows"]): r for r in lsh_plan(spark, 64, 0.5).collect()}
    assert set(out) == {(1, 64), (2, 32), (4, 16), (8, 8), (16, 4), (32, 2), (64, 1)}
    assert out[(16, 4)]["threshold_est"] == pytest.approx(
        (1 / 16) ** 0.25, abs=1e-6
    )


def test_lsh_plan_best_config_brackets_threshold(spark):
    best = lsh_plan(spark, 64, 0.5).collect()[0]
    # the minimum-error banding's S-curve midpoint should sit near T
    assert 0.2 < best["threshold_est"] < 0.8
    assert best["err_micro"] == best["fp_micro"] + best["fn_micro"]


def test_lsh_plan_extreme_threshold_prefers_wide_bands(spark):
    # very low threshold -> aggressive recall -> many bands, few rows
    best = lsh_plan(spark, 64, 0.1).collect()[0]
    assert best["bands"] >= 16
