"""Unit tests for heading_body_pairs, site_sections (urls) and
winsorize_scores (sampling)."""

from __future__ import annotations

import pytest

from pdf_to_epub_spark.operators import (
    heading_body_pairs,
    site_sections,
    winsorize_scores,
)


def _pages(spark, rows):
    df = spark.createDataFrame(rows, "doc_id bigint, h string")
    from pyspark.sql import functions as F

    return df.select("doc_id", F.encode("h", "UTF-8").alias("html"))


# -------------------------------------------------------- heading_body_pairs


def test_heading_body_sections(spark):
    html = (
        "<p>orphan</p>"
        "<h1>Intro</h1><p>a one</p><p>a two</p>"
        "<h2>Empty</h2>"
        "<h2>Last</h2><p>tail</p>"
    )
    out = {
        r["section_id"]: r
        for r in heading_body_pairs(_pages(spark, [(1, html)])).collect()
    }
    assert len(out) == 3
    assert out[1]["heading"] == "Intro" and out[1]["level"] == 1
    assert out[1]["body"] == "a one a two" and out[1]["n_paras"] == 2
    assert out[2]["heading"] == "Empty"
    assert out[2]["n_paras"] == 0 and out[2]["body"] is None
    assert out[3]["body"] == "tail"


def test_heading_body_strips_inline_tags(spark):
    html = "<h1>A <em>B</em></h1><p>x <b>y</b> z</p>"
    row = heading_body_pairs(_pages(spark, [(1, html)])).collect()[0]
    assert row["heading"] == "A B"
    assert row["body"] == "x y z"


def test_heading_body_no_headings_no_rows(spark):
    assert (
        heading_body_pairs(_pages(spark, [(1, "<p>only paras</p>")])).count()
        == 0
    )


# ------------------------------------------------------------ site_sections


def test_site_sections_counts_and_topcut(spark):
    urls = (
        ["https://a.example/news/x1?q=1"] * 3
        + ["https://a.example/news/x2"]
        + ["https://a.example/blog/p1"] * 2
        + ["https://a.example"]
        + ["https://b.example/shop/i%d" % i for i in range(3)]
    )
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    out = {
        (r["domain"], r["section"]): r
        for r in site_sections(df, top_per_domain=10).collect()
    }
    assert out[("a.example", "news")]["n_pages"] == 4
    assert out[("a.example", "news")]["n_subsections"] == 2
    assert out[("a.example", "blog")]["n_pages"] == 2
    assert out[("a.example", "(root)")]["n_pages"] == 1
    assert out[("a.example", "(root)")]["n_subsections"] == 0
    assert out[("b.example", "shop")]["n_subsections"] == 3


def test_site_sections_uppercase_scheme(spark):
    # schemes are case-insensitive (RFC 3986): an uppercase-scheme URL
    # must count toward its section, not vanish through the domain regex
    df = spark.createDataFrame(
        [("HTTPS://a.example/news/x",), ("https://a.example/news/y",)],
        "url string",
    )
    out = site_sections(df).collect()
    assert len(out) == 1 and out[0]["n_pages"] == 2


def test_site_sections_top_per_domain(spark):
    urls = [f"https://a.example/s{i}/p" for i in range(5) for _ in range(i + 1)]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    out = site_sections(df, top_per_domain=2).collect()
    assert sorted(r["section"] for r in out) == ["s3", "s4"]


# --------------------------------------------------------- winsorize_scores


def test_winsorize_clamps_outliers(spark):
    rows = [("d", float(v)) for v in [10, 11, 12, 13, 14, 15, 16, 17, 18, 1000]]
    df = spark.createDataFrame(rows, "domain string, score double")
    out = winsorize_scores(df, p_lo=0.1, p_hi=0.9)
    top = out.where("score = 1000.0").collect()[0]
    assert top["clipped"] is True
    assert top["score_w"] == top["hi_bound"] < 1000
    mid = out.where("score = 14.0").collect()[0]
    assert mid["clipped"] is False and mid["score_w"] == 14.0


def test_winsorize_null_scores_pass_through(spark):
    rows = [("d", 1.0), ("d", 2.0), ("d", 3.0), ("d", None)]
    df = spark.createDataFrame(rows, "domain string, score double")
    out = {r["score"]: r for r in winsorize_scores(df).collect()}
    assert out[None]["score_w"] is None
    assert out[None]["clipped"] is False


def test_winsorize_groups_independent(spark):
    rows = [("a", float(v)) for v in range(1, 11)] + [
        ("b", float(v * 100)) for v in range(1, 11)
    ]
    df = spark.createDataFrame(rows, "domain string, score double")
    out = winsorize_scores(df, p_lo=0.0, p_hi=1.0).collect()
    assert all(r["clipped"] is False for r in out)
