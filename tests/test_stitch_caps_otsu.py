"""Unit tests for continuation_pairs (dedup), capitalized_phrases
(textstats) and otsu_threshold (sampling)."""

from __future__ import annotations

import pytest

from pdf_to_epub_spark.operators import (
    capitalized_phrases,
    continuation_pairs,
    otsu_threshold,
)


# ------------------------------------------------------- continuation_pairs


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_continuation_detects_split_article(spark):
    tail = "storm broke over the eastern ridge at dawn"
    docs = _docs(
        spark,
        [
            (1, "page one body text ends with " + tail),
            (2, tail + " and the riders pressed on through mud"),
            (3, "an unrelated document about river navigation and locks"),
        ],
    )
    out = continuation_pairs(docs, k=8).collect()
    assert [(r["id_a"], r["id_b"]) for r in out] == [(1, 2)]


def test_continuation_short_docs_never_pair(spark):
    docs = _docs(spark, [(1, "too short"), (2, "too short")])
    assert continuation_pairs(docs, k=8).count() == 0


def test_continuation_hot_bridge_dropped(spark):
    # one shared footer sentence on many docs would pair quadratically
    footer = "subscribe to our newsletter for updates every week"
    docs = _docs(
        spark,
        [(i, f"body {i} unique words here padding out " + footer) for i in range(6)]
        + [(100 + i, footer + f" continuation {i} more unique trailing words") for i in range(6)],
    )
    assert continuation_pairs(docs, k=8, max_fanout=3).count() == 0
    assert continuation_pairs(docs, k=8, max_fanout=10).count() == 36


def test_continuation_case_insensitive_bridge(spark):
    tail = "Storm Broke Over The Eastern Ridge At Dawn"
    docs = _docs(
        spark,
        [
            (1, "page one body text ends with " + tail),
            (2, tail.lower() + " and the riders pressed on"),
        ],
    )
    assert continuation_pairs(docs, k=8).count() == 1


# ------------------------------------------------------ capitalized_phrases


def test_capitalized_runs_counted(spark):
    docs = spark.createDataFrame(
        [("I flew to New York City from New York City via Los Angeles",)]
        * 3,
        "text string",
    )
    out = {r["phrase"]: r for r in capitalized_phrases(docs, min_count=2).collect()}
    assert out["New York City"]["n_mentions"] == 6
    assert out["New York City"]["n_words"] == 3
    assert out["Los Angeles"]["n_mentions"] == 3


def test_capitalized_stopword_first_dropped(spark):
    docs = spark.createDataFrame(
        [("The Quick Fox jumped. We saw Port Royal.",)] * 3, "text string"
    )
    phrases = {r["phrase"] for r in capitalized_phrases(docs, min_count=2).collect()}
    assert phrases == {"Port Royal"}  # "The Quick Fox" starts with a stopword


def test_capitalized_single_words_ignored(spark):
    docs = spark.createDataFrame(
        [("Paris is lovely. Paris again.",)] * 3, "text string"
    )
    assert capitalized_phrases(docs, min_count=1).count() == 0


# ---------------------------------------------------------- otsu_threshold


def test_otsu_splits_bimodal(spark):
    vals = [float(v) for v in [1, 2, 1, 2, 1, 2, 98, 99, 98, 99]]
    df = spark.createDataFrame([(v,) for v in vals], "score double")
    row = otsu_threshold(df, bins=32).collect()[0]
    assert row["n_rows"] == 10
    assert 2 < row["threshold_value"] < 98
    assert row["n_below"] == 6 and row["n_above"] == 4


def test_otsu_constant_column_null_threshold(spark):
    df = spark.createDataFrame([(5.0,)] * 4, "score double")
    row = otsu_threshold(df).collect()[0]
    assert row["n_rows"] == 4
    assert row["threshold_bin"] is None and row["threshold_value"] is None


def test_otsu_drops_null_and_nan(spark):
    vals = [1.0, 1.0, None, float("nan"), 99.0, 99.0]
    df = spark.createDataFrame([(v,) for v in vals], "score double")
    row = otsu_threshold(df).collect()[0]
    assert row["n_rows"] == 4
    assert row["n_below"] == 2 and row["n_above"] == 2
