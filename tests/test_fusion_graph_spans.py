"""Unit tests for rrf_fuse (ir), degree_assortativity (urls) and
span_overlap (asof) — hand-computed goldens on tiny graphs/span sets."""

from __future__ import annotations

import pytest

from pdf_to_epub_spark.operators import (
    degree_assortativity,
    rrf_fuse,
    span_overlap,
)


# ---------------------------------------------------------------- rrf_fuse


def _runs(spark, rows):
    return spark.createDataFrame(
        rows, "query_id int, doc_id bigint, score double, run_id string"
    )


def test_rrf_fuse_hand_computed(spark):
    # query 0: lex ranks d1,d2,d3; dense ranks d3,d1 (d2 absent)
    rows = [
        (0, 1, 9.0, "lex"),
        (0, 2, 5.0, "lex"),
        (0, 3, 1.0, "lex"),
        (0, 3, 8.0, "dense"),
        (0, 1, 2.0, "dense"),
    ]
    out = {
        r["doc_id"]: r
        for r in rrf_fuse(_runs(spark, rows), k=60, topn=10).collect()
    }
    nano = lambda r: round(1e9 / (60 + r))  # noqa: E731
    assert out[1]["rrf_nano"] == nano(1) + nano(2)
    assert out[2]["rrf_nano"] == nano(2)
    assert out[3]["rrf_nano"] == nano(3) + nano(1)
    assert out[1]["n_runs"] == 2 and out[2]["n_runs"] == 1
    # d1: 1/61+1/62 > d3: 1/63+1/61 > d2: 1/62
    assert [out[d]["fused_rank"] for d in (1, 3, 2)] == [1, 2, 3]


def test_rrf_fuse_score_tie_breaks_on_doc_id(spark):
    rows = [(0, 7, 5.0, "lex"), (0, 3, 5.0, "lex")]
    out = {r["doc_id"]: r for r in rrf_fuse(_runs(spark, rows)).collect()}
    # equal scores: lower doc_id takes rank 1
    assert out[3]["rrf_nano"] > out[7]["rrf_nano"]


def test_rrf_fuse_topn_cut_is_per_query(spark):
    rows = [(q, d, float(100 - d), "lex") for q in (0, 1) for d in range(20)]
    out = rrf_fuse(_runs(spark, rows), topn=5).collect()
    assert len(out) == 10
    assert all(r["fused_rank"] <= 5 for r in out)


# ------------------------------------------------- degree_assortativity


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src string, dst string")


def test_assortativity_star_is_minus_one(spark):
    star = [("h", f"l{i}") for i in range(5)]
    row = degree_assortativity(_edges(spark, star)).collect()[0]
    assert row["n_nodes"] == 6 and row["n_edges"] == 5
    assert row["assortativity"] == pytest.approx(-1.0)


def test_assortativity_regular_graph_is_null(spark):
    ring = [(f"n{i}", f"n{(i + 1) % 5}") for i in range(5)]
    row = degree_assortativity(_edges(spark, ring)).collect()[0]
    assert row["assortativity"] is None
    assert row["n_edges"] == 5


def test_assortativity_dedups_and_drops_self_loops(spark):
    star = [("h", f"l{i}") for i in range(5)]
    noisy = star + [("l0", "h"), ("h", "h"), ("h", "l1")]
    row = degree_assortativity(_edges(spark, noisy)).collect()[0]
    assert row["n_edges"] == 5
    assert row["assortativity"] == pytest.approx(-1.0)


def test_assortativity_path_hand_value(spark):
    # path a-b-c-d: degrees 1,2,2,1; edges (1,2),(2,2),(2,1)
    # doubled: M=6, Sx=2*(3+4+3)=... compute directly
    pairs = [("a", "b"), ("b", "c"), ("c", "d")]
    xy = [(1, 2), (2, 2), (2, 1), (2, 1), (2, 2), (1, 2)]
    m = len(xy)
    sx = sum(x for x, _ in xy)
    sxy = sum(x * y for x, y in xy)
    sxx = sum(x * x for x, _ in xy)
    expect = round((m * sxy - sx * sx) / (m * sxx - sx * sx), 6)
    row = degree_assortativity(_edges(spark, pairs)).collect()[0]
    assert row["assortativity"] == pytest.approx(expect)


# ---------------------------------------------------------- span_overlap


def _spans(spark, rows, side):
    i, s, e = (f"{side}_id", f"{side}_start", f"{side}_end")
    return spark.createDataFrame(
        rows, f"doc_id bigint, {i} bigint, {s} bigint, {e} bigint"
    )


def test_span_overlap_basic_and_half_open(spark):
    left = _spans(spark, [(1, 0, 10, 20), (1, 1, 20, 30)], "a")
    right = _spans(spark, [(1, 0, 0, 20), (1, 1, 25, 40)], "b")
    out = {
        (r["a_id"], r["b_id"]): r
        for r in span_overlap(left, right, cell=8).collect()
    }
    # [10,20) × [0,20) overlaps; [10,20) × [25,40) does not;
    # [20,30) × [0,20) touches at 20 → half-open, NO match
    assert set(out) == {(0, 0), (1, 1)}
    assert (out[(0, 0)]["ov_start"], out[(0, 0)]["ov_end"]) == (10, 20)
    assert out[(1, 1)]["ov_len"] == 5


def test_span_overlap_multi_cell_emits_once(spark):
    # both spans cover many cells (cell=4) — owner-cell must dedup
    left = _spans(spark, [(1, 0, 0, 100)], "a")
    right = _spans(spark, [(1, 0, 50, 90)], "b")
    out = span_overlap(left, right, cell=4).collect()
    assert len(out) == 1
    assert (out[0]["ov_start"], out[0]["ov_end"], out[0]["ov_len"]) == (
        50, 90, 40,
    )


def test_span_overlap_empty_spans_and_doc_isolation(spark):
    left = _spans(spark, [(1, 0, 5, 5), (2, 1, 0, 50)], "a")
    right = _spans(spark, [(1, 0, 0, 99), (3, 1, 0, 99)], "b")
    assert span_overlap(left, right).count() == 0
