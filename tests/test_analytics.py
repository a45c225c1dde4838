"""Unit tests for the r4-s4 operator batch: cohort retention, funnel
walk, token-window chunking, exact stratified sampling, HITS, JSONL."""

from __future__ import annotations

import datetime as dt
import hashlib
import math

import pytest
from pyspark.sql import functions as F


def _ts(day: int, hour: int = 0, minute: int = 0) -> dt.datetime:
    return dt.datetime(2024, 1, 1 + day, hour, minute)


# ---------------------------------------------------------------- cohort


def test_cohort_retention_triangle(spark):
    from pdf_to_epub_spark.operators import cohort_retention

    rows = [
        # user 1: first day 0, active days 0, 1, 3
        (1, _ts(0)), (1, _ts(0, 5)), (1, _ts(1)), (1, _ts(3)),
        # user 2: first day 0, active day 0 only
        (2, _ts(0, 23, 59)),
        # user 3: first day 1, active days 1, 3
        (3, _ts(1)), (3, _ts(3)),
    ]
    df = spark.createDataFrame(rows, "user_id int, ts timestamp")
    got = {
        (r.cohort_day, r.day_offset): r.active_users
        for r in cohort_retention(df).collect()
    }
    day0 = int(_ts(0).replace(tzinfo=dt.timezone.utc).timestamp()) // 86400
    assert got == {
        (day0, 0): 2,       # users 1+2 on their first day
        (day0, 1): 1,       # user 1
        (day0, 3): 1,       # user 1
        (day0 + 1, 0): 1,   # user 3 cohort
        (day0 + 1, 2): 1,   # user 3 on day 3
    }


# ---------------------------------------------------------------- funnel


def test_funnel_walk_order_and_partials(spark):
    from pdf_to_epub_spark.operators import funnel_stages

    rows = [
        # user 1: full funnel in order
        (1, _ts(0, 1), "signup"), (1, _ts(0, 2), "view"),
        (1, _ts(0, 3), "purchase"),
        # user 2: view BEFORE signup must not count; no view after →
        # stalls at stage 1
        (2, _ts(0, 1), "view"), (2, _ts(0, 2), "signup"),
        (2, _ts(0, 3), "purchase"),
        # user 3: never signs up → stage 0 even with view+purchase
        (3, _ts(0, 1), "view"), (3, _ts(0, 2), "purchase"),
        # user 4: purchase before the post-signup view doesn't count; the
        # later purchase does
        (4, _ts(0, 1), "signup"), (4, _ts(0, 2), "purchase"),
        (4, _ts(0, 3), "view"), (4, _ts(0, 4), "purchase"),
    ]
    df = spark.createDataFrame(rows, "user_id int, ts timestamp, event_type string")
    got = {r.user_id: r for r in funnel_stages(df).collect()}
    assert got[1].stages_reached == 3
    assert got[2].stages_reached == 1
    assert got[3].stages_reached == 0
    assert got[3].t1_us is None
    assert got[4].stages_reached == 3

    def us(d: int, h: int, m: int = 0) -> int:
        return int(
            _ts(d, h, m).replace(tzinfo=dt.timezone.utc).timestamp() * 1_000_000
        )

    assert (got[4].t1_us, got[4].t2_us, got[4].t3_us) == (
        us(0, 1), us(0, 3), us(0, 4)
    )


def test_funnel_strictly_after_tie(spark):
    """An equal-timestamp next-stage event does NOT advance (strict >) —
    the contract that makes the walk equal the chained-min oracle."""
    from pdf_to_epub_spark.operators import funnel_stages

    t = _ts(0, 1)
    rows = [(1, t, "signup"), (1, t, "view"), (1, _ts(0, 2), "view")]
    df = spark.createDataFrame(rows, "user_id int, ts timestamp, event_type string")
    r = funnel_stages(df).collect()[0]
    assert r.stages_reached == 2
    assert r.t2_us == int(
        _ts(0, 2).replace(tzinfo=dt.timezone.utc).timestamp() * 1_000_000
    )


# ---------------------------------------------------------------- chunking


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


def test_chunk_by_tokens_windows(spark):
    from pdf_to_epub_spark.operators import chunk_by_tokens

    words = [f"w{i}" for i in range(13)]
    df = spark.createDataFrame(
        [(1, " ".join(words)), (2, "a b"), (3, ""), (4, "   ")],
        "doc_id int, text string",
    )
    out = chunk_by_tokens(df, size=8, stride=6)
    got = {
        (r.doc_id, r.chunk_id): (r.start_tok, r.n_toks, r.chunk_md5)
        for r in out.collect()
    }
    # doc 1 (13 tokens): starts 1 and 7; start 13 is suppressed because
    # window [7..14] already covered token 13
    assert got[(1, 0)] == (1, 8, _md5(" ".join(words[0:8])))
    assert got[(1, 1)] == (7, 7, _md5(" ".join(words[6:13])))
    assert (1, 2) not in got
    # short doc: one short chunk
    assert got[(2, 0)] == (1, 2, _md5("a b"))
    # empty / whitespace-only: a single empty chunk (split yields [''])
    assert got[(3, 0)] == (1, 1, _md5(""))
    assert got[(4, 0)] == (1, 1, _md5(""))


def test_chunk_by_tokens_full_coverage_overlap(spark):
    """Every token index is covered; consecutive chunks overlap by
    size - stride except the (possibly shorter) tail."""
    from pdf_to_epub_spark.operators import chunk_by_tokens

    n = 100
    df = spark.createDataFrame(
        [(1, " ".join(str(i) for i in range(n)))], "doc_id int, text string"
    )
    rows = sorted(
        chunk_by_tokens(df, size=16, stride=12).collect(),
        key=lambda r: r.chunk_id,
    )
    covered = set()
    for r in rows:
        covered |= set(range(r.start_tok, r.start_tok + r.n_toks))
    assert covered == set(range(1, n + 1))
    for a, b in zip(rows, rows[1:]):
        assert b.start_tok - a.start_tok == 12


def test_chunk_by_tokens_no_shuffle(spark):
    from pdf_to_epub_spark.operators import chunk_by_tokens

    df = spark.createDataFrame([(1, "a b c")], "doc_id int, text string")
    plan = chunk_by_tokens(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_chunk_by_tokens_rejects_bad_params(spark):
    from pdf_to_epub_spark.operators import chunk_by_tokens

    df = spark.createDataFrame([(1, "a")], "doc_id int, text string")
    with pytest.raises(ValueError):
        chunk_by_tokens(df, size=0)
    with pytest.raises(ValueError):
        chunk_by_tokens(df, stride=0)


# ---------------------------------------------------------------- stratified


def test_stratified_sample_exact_counts(spark):
    from pdf_to_epub_spark.operators import stratified_sample_exact

    rows = [(i, "en" if i < 70 else ("fr" if i < 95 else "de")) for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id int, lang string")
    out = stratified_sample_exact(df, num=1, den=5, strata_col="lang")
    counts = {r.lang: r.n for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert counts == {"en": 14, "fr": 5, "de": 1}


def test_stratified_sample_matches_single_window(spark):
    """The salted two-phase plan keeps EXACTLY the single-window set."""
    from pdf_to_epub_spark.operators import stratified_sample_exact
    from pdf_to_epub_spark.operators.dedup import md5_hash60
    from pyspark.sql.window import Window

    rows = [(i, f"l{i % 3}") for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id int, lang string")
    got = {
        r.doc_id
        for r in stratified_sample_exact(
            df, num=7, den=100, strata_col="lang", salt_bits=3
        ).collect()
    }
    h = md5_hash60(F.concat_ws(":", F.lit("strat"), F.col("doc_id").cast("string")))
    w = Window.partitionBy("lang").orderBy(h.asc(), F.col("doc_id").asc())
    ref = (
        df.withColumn("rn", F.row_number().over(w))
        .withColumn("n", F.count("*").over(Window.partitionBy("lang")))
        .where(F.col("rn") <= F.expr("CAST((n * 7 + 100 - 1) DIV 100 AS BIGINT)"))
    )
    # 3 strata of 66/67 rows → ceil(67*7/100) = 5 per stratum: the float
    # form ceil(n*0.07) would keep 5 for n=66 too only by luck; the
    # rational form is exact by construction
    assert got == {r.doc_id for r in ref.select("doc_id").collect()}
    assert len(got) == 3 * 5


def test_stratified_rational_ceil_boundary(spark):
    """n=100, frac=7/100 keeps exactly 7 (ceil float trap: 100*0.07 →
    7.000000000000001 → ceil 8)."""
    from pdf_to_epub_spark.operators import stratified_sample_exact

    df = spark.createDataFrame(
        [(i, "en") for i in range(100)], "doc_id int, lang string"
    )
    out = stratified_sample_exact(df, num=7, den=100, strata_col="lang")
    assert out.count() == 7


# ---------------------------------------------------------------- HITS


def _hits_replay(edges, iters=5):
    nodes = sorted({x for e in edges for x in e})
    n = len(nodes)
    hub = {v: 1.0 / n for v in nodes}
    auth = {v: 1.0 / n for v in nodes}
    for _ in range(iters):
        raw = {v: 0.0 for v in nodes}
        for s, t in edges:
            raw[t] += hub[s]
        tot = sum(raw.values())
        auth = {v: (raw[v] / tot if tot else 0.0) for v in nodes}
        raw = {v: 0.0 for v in nodes}
        for s, t in edges:
            raw[s] += auth[t]
        tot = sum(raw.values())
        hub = {v: (raw[v] / tot if tot else 0.0) for v in nodes}
    return hub, auth


def test_hits_matches_replay(spark):
    from pdf_to_epub_spark.operators import hits_scores

    edges = [
        ("a", "hubless"), ("a", "popular"), ("b", "popular"),
        ("c", "popular"), ("c", "a"),
    ]
    df = spark.createDataFrame(edges, "src_domain string, dst_domain string")
    got = {r.domain: (r.hub, r.authority) for r in hits_scores(df).collect()}
    hub, auth = _hits_replay(edges)
    for v in hub:
        assert got[v][0] == pytest.approx(hub[v], abs=2e-9)
        assert got[v][1] == pytest.approx(auth[v], abs=2e-9)
    # the thrice-linked node is the top authority; its pointers the hubs
    assert max(got, key=lambda v: got[v][1]) == "popular"
    assert got["c"][0] > got["b"][0]  # c links 2 targets, b links 1
    # sink/source zeros
    assert got["popular"][0] == 0.0
    assert got["b"][1] == 0.0


def test_hits_duplicate_edges_and_empty(spark):
    from pdf_to_epub_spark.operators import hits_scores

    dup = spark.createDataFrame(
        [("a", "b"), ("a", "b"), ("a", "b")],
        "src_domain string, dst_domain string",
    )
    got = {r.domain: (r.hub, r.authority) for r in hits_scores(dup).collect()}
    assert got["a"] == (1.0, 0.0)
    assert got["b"] == (0.0, 1.0)

    empty = dup.limit(0)
    assert hits_scores(empty).count() == 0


# ---------------------------------------------------------------- JSONL


def test_jsonl_disk_roundtrip(spark, tmp_path):
    from pdf_to_epub_spark.sources.jsonl import read_jsonl, write_jsonl

    rows = [
        (1, 'line with "quotes" and \\ backslash\nnewline', "en", "web"),
        (2, "unicode éü中文", "fr", "books"),
        (3, None, "de", "web"),  # null text survives as null
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string, source string")
    path = str(tmp_path / "shards")
    write_jsonl(df, path)
    back = read_jsonl(spark, path)
    assert sorted((r.doc_id, r.text, r.lang, r.source) for r in back.collect()) == sorted(rows)


def test_jsonl_corrupt_lines_quarantined(spark):
    from pdf_to_epub_spark.sources.jsonl import parse_jsonl_lines

    lines = spark.createDataFrame(
        [('{"doc_id": 1, "text": "ok"}',), ("{not json",), ("",)],
        "line string",
    )
    out = parse_jsonl_lines(lines).collect()
    ok = [r for r in out if r._corrupt is None]
    bad = sorted(r._corrupt for r in out if r._corrupt is not None)
    assert len(ok) == 1 and ok[0].doc_id == 1 and ok[0].text == "ok"
    assert bad == ["", "{not json"]
