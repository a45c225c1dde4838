"""Unit tests for rake_keywords (textstats), feature_mi (evaluate) and
pq_quantize (similarity) — hand-computed goldens."""

from __future__ import annotations

import math

import pytest

from pdf_to_epub_spark.operators import (
    feature_mi,
    pq_quantize,
    rake_keywords,
)


# ------------------------------------------------------------------ RAKE


def test_rake_hand_computed(spark):
    # "deep learning" twice, "neural networks" twice; "of the" is an
    # adjacent-stopword run the two-pass cut must fully resolve.
    docs = spark.createDataFrame(
        [
            ("deep learning is the future of the neural networks",),
            ("deep learning and neural networks",),
        ],
        "text string",
    )
    out = {r["phrase"]: r for r in rake_keywords(docs, top=10).collect()}
    assert set(out) == {"deep learning", "neural networks"}
    # each word appears in one 2-word phrase twice: deg=4, freq=2,
    # score per word = 2e6 → phrase score 4e6
    for p in out.values():
        assert p["score_micro"] == 4_000_000
        assert p["n_words"] == 2 and p["n_occurrences"] == 2


def test_rake_min_occurrences_and_single_words(spark):
    docs = spark.createDataFrame(
        [("quantum computing is amazing",), ("quantum computing",)],
        "text string",
    )
    out = rake_keywords(docs, top=10, min_occurrences=2).collect()
    assert [r["phrase"] for r in out] == ["quantum computing"]
    # "amazing" appeared once → filtered by min_occurrences


def test_rake_stopword_run_and_punctuation(spark):
    docs = spark.createDataFrame(
        [("The cat, and of the in a hat!",)] * 2, "text string"
    )
    out = {r["phrase"] for r in rake_keywords(docs, top=10).collect()}
    # every stopword in the run must vanish; punctuation splits nothing
    assert out == {"cat", "hat"}


def test_rake_null_text_ignored(spark):
    docs = spark.createDataFrame(
        [(None,), ("big data and big data",), ("big data",)], "text string"
    )
    out = rake_keywords(docs, top=10).collect()
    assert out[0]["phrase"] == "big data"


# ------------------------------------------------------------- feature_mi


def test_feature_mi_informative_vs_constant(spark):
    rows = [(float(i % 2), 7.0, i % 2) for i in range(100)]
    df = spark.createDataFrame(rows, "f_same double, f_const double, label int")
    out = {r["feature"]: r for r in feature_mi(df, ["f_same", "f_const"]).collect()}
    # f_same == label → MI = H(label) = ln 2
    assert out["f_same"]["mi_micro_nats"] == pytest.approx(
        round(1e6 * math.log(2)), abs=2
    )
    assert out["f_const"]["mi_micro_nats"] == 0
    assert out["f_const"]["n_bins_used"] == 1
    assert out["f_same"]["n_rows"] == 100


def test_feature_mi_drops_null_and_nan(spark):
    rows = [(1.0, 1), (float("nan"), 1), (None, 0), (0.0, 0)]
    df = spark.createDataFrame(rows, "f double, label int")
    out = feature_mi(df, ["f"]).collect()[0]
    assert out["n_rows"] == 2
    assert out["mi_micro_nats"] == pytest.approx(round(1e6 * math.log(2)), abs=2)


def test_feature_mi_empty_features_raises(spark):
    df = spark.createDataFrame([(1.0, 1)], "f double, label int")
    with pytest.raises(ValueError):
        feature_mi(df, [])


# ------------------------------------------------------------ pq_quantize


def _codebook(spark, rows):
    return spark.createDataFrame(
        rows, "subspace int, code int, cvec array<double>"
    )


def test_pq_assigns_nearest_centroid(spark):
    emb = spark.createDataFrame(
        [(1, [1.0, 0.0, 0.0, 10.0])],
        "vec_id bigint, embedding array<float>",
    )
    cent = _codebook(
        spark,
        [
            (0, 0, [0.0, 0.0]),
            (0, 1, [1.0, 0.0]),
            (1, 0, [0.0, 10.0]),
            (1, 1, [5.0, 5.0]),
        ],
    )
    out = {
        r["subspace"]: r for r in pq_quantize(emb, cent, m=2).collect()
    }
    assert out[0]["code"] == 1 and out[0]["dist_nano"] == 0
    assert out[1]["code"] == 0 and out[1]["dist_nano"] == 0
    assert len(out) == 2


def test_pq_tie_breaks_on_lower_code(spark):
    emb = spark.createDataFrame(
        [(1, [0.5, 0.5])], "vec_id bigint, embedding array<float>"
    )
    cent = _codebook(spark, [(0, 3, [0.0, 0.0]), (0, 1, [1.0, 1.0])])
    out = pq_quantize(emb, cent, m=1).collect()
    assert out[0]["code"] == 1  # equal distance → lower code wins


def test_pq_distance_is_nano_exact(spark):
    emb = spark.createDataFrame(
        [(1, [0.3, 0.0])], "vec_id bigint, embedding array<float>"
    )
    cent = _codebook(spark, [(0, 0, [0.0, 0.0])])
    out = pq_quantize(emb, cent, m=1).collect()[0]
    a = float(__import__("numpy").float32(0.3))
    assert out["dist_nano"] == round(a * a * 1e9)
