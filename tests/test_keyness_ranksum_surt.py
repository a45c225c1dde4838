"""Unit tests for llr_keyness, rank_sum_test, and the SURT/CDX ops —
behavioral edges the driver-contract oracles don't isolate: exact G²
values against an in-test reference implementation, tie-corrected U/z
against the closed form, the two-group contract, and byte-level SURT
expectations (www-variant stripping, ports, query sorting)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------- keyness


def _ref_g2(k_a: int, k_b: int, n_a: int, n_b: int) -> float:
    def term(k: float, n: float) -> float:
        if k <= 0:
            return 0.0
        e = n * ((k_a + k_b) / (n_a + n_b))
        return k * math.log(k / e)

    return round(2.0 * (term(k_a, n_a) + term(k_b, n_b)), 6)


def test_llr_keyness_values(spark):
    from pdf_to_epub_spark.operators import llr_keyness

    a = spark.createDataFrame(
        [("spam spam spam ham",), ("spam eggs",)], "text string"
    )
    b = spark.createDataFrame(
        [("ham ham eggs eggs",), ("ham toast",)], "text string"
    )
    out = {
        r["word"]: r
        for r in llr_keyness(a, b, min_count=1).collect()
    }
    # corpus A: spam=4 ham=1 eggs=1 (n=6); B: ham=3 eggs=2 toast=1 (n=6)
    assert out["spam"]["k_a"] == 4 and out["spam"]["k_b"] == 0
    assert out["spam"]["enriched_in"] == "a"
    assert out["ham"]["enriched_in"] == "b"
    assert out["eggs"]["enriched_in"] == "b"
    for w, (ka, kb) in {
        "spam": (4, 0), "ham": (1, 3), "eggs": (1, 2), "toast": (0, 1)
    }.items():
        assert out[w]["g2"] == pytest.approx(_ref_g2(ka, kb, 6, 6), abs=1e-9)
    # equal rates tie out
    t = spark.createDataFrame([("x y",)], "text string")
    u = spark.createDataFrame([("x y",)], "text string")
    rows = llr_keyness(t, u, min_count=1).collect()
    assert all(r["enriched_in"] == "tie" and r["g2"] == 0.0 for r in rows)


def test_llr_keyness_min_count_filter(spark):
    from pdf_to_epub_spark.operators import llr_keyness

    a = spark.createDataFrame([("rare common common",)], "text string")
    b = spark.createDataFrame([("common",)], "text string")
    words = {
        r["word"] for r in llr_keyness(a, b, min_count=3).collect()
    }
    assert words == {"common"}


# ----------------------------------------------------------- rank-sum U


def _ref_rank_sum(vals_a: list[float], vals_b: list[float]):
    """Closed-form Mann-Whitney with average ranks + tie correction."""
    pooled = sorted(
        [(v, "a") for v in vals_a] + [(v, "b") for v in vals_b]
    )
    n = len(pooled)
    ranks: dict[int, float] = {}
    i = 0
    tie_sum = 0
    r_a = 0.0
    while i < n:
        j = i
        while j < n and pooled[j][0] == pooled[i][0]:
            j += 1
        t = j - i
        avg = (i + 1 + j) / 2.0
        tie_sum += t**3 - t
        r_a += avg * sum(1 for k in range(i, j) if pooled[k][1] == "a")
        i = j
    n_a, n_b = len(vals_a), len(vals_b)
    u_a = r_a - n_a * (n_a + 1) / 2.0
    var = (n_a * n_b / 12.0) * ((n + 1) - tie_sum / (n * (n - 1)))
    z = (u_a - n_a * n_b / 2.0) / math.sqrt(var) if var > 0 else None
    return u_a, n_a * n_b - u_a, None if z is None else round(z, 6)


def test_rank_sum_matches_reference(spark):
    from pdf_to_epub_spark.operators import rank_sum_test

    vals_a = [1, 2, 2, 3, 5, 5, 5, 9]
    vals_b = [2, 4, 5, 6, 6, 7]
    rows = [("a", float(v)) for v in vals_a] + [
        ("b", float(v)) for v in vals_b
    ]
    df = spark.createDataFrame(rows, "group string, value double")
    r = rank_sum_test(df).collect()[0]
    u_a, u_b, z = _ref_rank_sum(vals_a, vals_b)
    assert (r["group_a"], r["group_b"]) == ("a", "b")
    assert (r["n_a"], r["n_b"]) == (len(vals_a), len(vals_b))
    assert r["u_a"] == pytest.approx(u_a, abs=1e-9)
    assert r["u_b"] == pytest.approx(u_b, abs=1e-9)
    assert r["z"] == pytest.approx(z, abs=1e-9)


def test_rank_sum_all_tied_null_z(spark):
    from pdf_to_epub_spark.operators import rank_sum_test

    df = spark.createDataFrame(
        [("a", 7.0), ("a", 7.0), ("b", 7.0)], "group string, value double"
    )
    r = rank_sum_test(df).collect()[0]
    assert r["z"] is None and r["significant"] is False


def test_rank_sum_group_contract_and_null_hygiene(spark):
    from pdf_to_epub_spark.operators import rank_sum_test

    one = spark.createDataFrame([("a", 1.0)], "group string, value double")
    with pytest.raises(ValueError, match="exactly 2 groups"):
        rank_sum_test(one)
    three = spark.createDataFrame(
        [("a", 1.0), ("b", 2.0), ("c", 3.0)], "group string, value double"
    )
    with pytest.raises(ValueError, match="exactly 2 groups"):
        rank_sum_test(three)
    # NULL group rows and NULL/NaN values drop, not count
    messy = spark.createDataFrame(
        [
            ("a", 1.0), ("a", float("nan")), ("a", None), (None, 2.0),
            ("b", 2.0), ("b", 3.0),
        ],
        "group string, value double",
    )
    r = rank_sum_test(messy).collect()[0]
    assert (r["n_a"], r["n_b"]) == (1, 2)


# ------------------------------------------------------------- SURT/CDX


SURT_CASES = [
    (
        "HTTP://www.News.Example.com:8080/A/b?z=2&a=1#frag",
        "com,example,news:8080)/a/b?a=1&z=2",
    ),
    # www2 strips; m. is a real label and must survive
    ("https://www2.Site.org/x", "org,site)/x"),
    ("https://m.site.org/x", "org,site,m)/x"),
    # empty path -> ')/'; empty params dropped; no scheme tolerated
    ("https://example.com", "com,example)/"),
    ("https://example.com?b=2&&a=1", "com,example)/?a=1&b=2"),
    ("example.com/path", "com,example)/path"),
    # default-port keeps the port (SURT is layout, not canonical-equality)
    ("http://example.com:80/", "com,example:80)/"),
]


@pytest.mark.parametrize("url,expected", SURT_CASES)
def test_surt_key_bytes(spark, url, expected):
    from pdf_to_epub_spark.operators import surt_keys

    df = spark.createDataFrame([(url,)], "url string")
    assert surt_keys(df).collect()[0]["surt"] == expected


def test_cdx_prefix_counts_depth_and_dups(spark):
    from pdf_to_epub_spark.operators import cdx_prefix_counts

    urls = [
        "https://a.example.com/1",
        "https://b.example.com/1",
        "https://b.example.com/1",  # duplicate capture of the same url
        "https://other.net/x",
    ]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    got = {
        r["surt_prefix"]: (r["n_captures"], r["n_urls"])
        for r in cdx_prefix_counts(df, depth=2).collect()
    }
    assert got == {"com,example": (3, 2), "net,other": (1, 1)}
    deep = {
        r["surt_prefix"]: r["n_captures"]
        for r in cdx_prefix_counts(df, depth=3).collect()
    }
    assert deep == {
        "com,example,a": 1, "com,example,b": 2, "net,other": 1
    }
