"""Unit tests for batch-2 r4-s4 operators: hash-feature classifier
scores, range-frame rolling window, event-type pivot."""

from __future__ import annotations

import datetime as dt
import hashlib
import math

import pytest

from pyspark.sql import functions as F


def _ts(minute: int, second: int = 0) -> dt.datetime:
    return dt.datetime(2024, 1, 1, 0, minute, second)


def _weight(token: str) -> float:
    h = int(hashlib.md5(f"feat:{token}".encode()).hexdigest()[:15], 16)
    return ((h % 1024) % 997) / 996.0 - 0.5


def test_classifier_scores_replay(spark):
    from pdf_to_epub_spark.operators import classifier_scores

    texts = {
        1: "Alpha beta GAMMA alpha",
        2: "",
        3: "1234 !!",  # no letter tokens at all
        4: "caféé déjà vu",
    }
    df = spark.createDataFrame(list(texts.items()), "doc_id int, text string")
    got = {r.doc_id: r for r in classifier_scores(df).collect()}
    for doc_id, text in texts.items():
        import re

        toks = re.findall(r"[a-zà-öø-ÿ]+", text.lower())
        s = 0.0
        for t in toks:
            s += _weight(t)
        raw = s / max(1, len(toks))
        prob = 1.0 / (1.0 + math.exp(-4.0 * raw))
        r = got[doc_id]
        assert r.n_feats == len(toks)
        # approx, not ==: Spark rounds HALF_UP, Python banker's
        assert r.raw_score == pytest.approx(raw, abs=1e-6)
        assert r.prob == pytest.approx(prob, abs=1e-6)
        assert r.keep == (prob >= 0.5)


def test_classifier_scores_no_shuffle(spark):
    from pdf_to_epub_spark.operators import classifier_scores

    df = spark.createDataFrame([(1, "a b")], "doc_id int, text string")
    plan = classifier_scores(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_event_rolling_trailing_hour(spark):
    from pdf_to_epub_spark.operators import rolling_window

    rows = [
        # user 1: events at 0, 30, 59, 61 minutes; value = index
        (0, 1, _ts(0), 10.0),
        (1, 1, _ts(30), 20.0),
        (2, 1, _ts(59), 30.0),
        (3, 1, dt.datetime(2024, 1, 1, 1, 1), 40.0),
        # user 2: single event
        (4, 2, _ts(5), 5.0),
    ]
    df = spark.createDataFrame(rows, "event_id int, user_id int, ts timestamp, value double")
    got = {r.event_id: r for r in rolling_window(df).collect()}
    assert (got[0].roll_n, got[0].roll_sum) == (1, 10.0)
    assert (got[1].roll_n, got[1].roll_sum) == (2, 30.0)
    assert (got[2].roll_n, got[2].roll_sum) == (3, 60.0)
    # at 61 min the event at minute 0 has fallen out of the trailing hour
    # (60*60s window, inclusive bounds: 0:00 is 3660s earlier)
    assert (got[3].roll_n, got[3].roll_sum) == (3, 90.0)
    assert (got[4].roll_n, got[4].roll_avg) == (1, 5.0)


def test_event_rolling_inclusive_boundary(spark):
    from pdf_to_epub_spark.operators import rolling_window

    rows = [
        (0, 1, dt.datetime(2024, 1, 1, 0, 0, 0), 1.0),
        # exactly 3600 s later: still inside the inclusive frame
        (1, 1, dt.datetime(2024, 1, 1, 1, 0, 0), 2.0),
        # 3601 s after event 0: event 0 out, event 1 in
        (2, 1, dt.datetime(2024, 1, 1, 1, 0, 1), 4.0),
    ]
    df = spark.createDataFrame(rows, "event_id int, user_id int, ts timestamp, value double")
    got = {r.event_id: r for r in rolling_window(df).collect()}
    assert (got[1].roll_n, got[1].roll_sum) == (2, 3.0)
    assert (got[2].roll_n, got[2].roll_sum) == (2, 6.0)


def test_event_pivot_counts(spark):
    from pdf_to_epub_spark.operators import pivot_counts

    rows = [
        (1, "click"), (1, "click"), (1, "purchase"),
        (2, "view"),
        (3, "weird_type"),  # not in the fixed vocabulary: total-only
    ]
    df = spark.createDataFrame(rows, "user_id int, event_type string")
    got = {r.user_id: r for r in pivot_counts(df).collect()}
    assert (got[1].n_click, got[1].n_purchase, got[1].n_view) == (2, 1, 0)
    assert got[1].n_total == 3
    assert (got[2].n_view, got[2].n_total) == (1, 1)
    # unknown types count toward the total but no pivot column
    assert got[3].n_total == 1
    assert (got[3].n_click + got[3].n_error + got[3].n_purchase
            + got[3].n_signup + got[3].n_view) == 0


def test_nb_train_scores_separable_corpus(spark):
    from pyspark.sql import functions as F

    from pdf_to_epub_spark.operators.classify import nb_train_scores

    docs = spark.createDataFrame(
        [
            (i, ("the good interesting text with many fine words "
                 if i % 2 == 0
                 else "bad awful terrible junk spam noise ") * 3 + f"tail{i}")
            for i in range(30)
        ]
        + [(99, None), (98, "")],
        "doc_id long, text string",
    )
    labels = docs.filter("doc_id % 3 = 0 AND doc_id < 90").select(
        "doc_id", (F.col("doc_id") % 2 == 0).alias("label")
    )
    rows = {r["doc_id"]: r for r in nb_train_scores(docs, labels).collect()}
    # fully separable vocabulary -> every unlabeled doc classified right
    assert all(rows[i]["pred_label"] == (i % 2 == 0) for i in range(30))
    # margins are consistent with predictions and sums are exact ints
    assert all(
        (rows[i]["margin_micro"] > 0) == rows[i]["pred_label"]
        for i in range(30)
    )
    # null/empty docs score priors only (equal doc counts -> equal priors
    # -> false wins the exact tie)
    for did in (98, 99):
        assert rows[did]["n_tokens"] == 0
        assert rows[did]["pred_label"] is False
        assert rows[did]["margin_micro"] == 0


def test_nb_train_scores_requires_both_classes(spark):
    import pytest
    from pyspark.sql import functions as F

    from pdf_to_epub_spark.operators.classify import nb_train_scores

    docs = spark.createDataFrame(
        [(i, "some text here") for i in range(6)], "doc_id long, text string"
    )
    one_class = docs.select("doc_id", F.lit(True).alias("label"))
    with pytest.raises(ValueError, match="BOTH classes"):
        nb_train_scores(docs, one_class)


def test_nb_train_scores_ignores_null_labels(spark):
    from pyspark.sql import functions as F

    from pdf_to_epub_spark.operators.classify import nb_train_scores

    docs = spark.createDataFrame(
        [(i, "good fine words" if i % 2 == 0 else "bad junk noise")
         for i in range(12)],
        "doc_id long, text string",
    )
    with_null = spark.createDataFrame(
        [(0, True), (2, True), (1, False), (3, False), (7, None)],
        "doc_id long, label boolean",
    )
    clean = with_null.where(F.col("label").isNotNull())
    a = {r["doc_id"]: r["pred_label"]
         for r in nb_train_scores(docs, with_null).collect()}
    b = {r["doc_id"]: r["pred_label"]
         for r in nb_train_scores(docs, clean).collect()}
    assert a == b  # the NULL-label row contributes nothing


def test_binary_classifier_eval_auc_matches_rank_reference(spark):
    import bisect
    import random

    from pdf_to_epub_spark.operators.evaluate import binary_classifier_eval

    rng = random.Random(3)
    rows = [(i, rng.choice([True, False]), rng.randrange(-5, 6))
            for i in range(200)]
    df = spark.createDataFrame(rows, "id long, truth boolean, margin_micro long")
    got = binary_classifier_eval(df).collect()[0]
    pos = sorted(m for _, t, m in rows if t)
    neg = sorted(m for _, t, m in rows if not t)
    u = sum(
        bisect.bisect_left(neg, p)
        + (bisect.bisect_right(neg, p) - bisect.bisect_left(neg, p)) / 2.0
        for p in pos
    )
    assert got["auc"] == round(u / (len(pos) * len(neg)), 6)
    assert got["tp"] == sum(1 for _, t, m in rows if t and m > 0)
    assert got["n_pos"] == len(pos) and got["n_neg"] == len(neg)
    # degenerate single-class input: AUC undefined, recall still defined
    d2 = spark.createDataFrame(
        [(1, True, 3), (2, True, -1)], "id long, truth boolean, margin_micro long"
    )
    g2 = binary_classifier_eval(d2).collect()[0]
    assert g2["auc"] is None and g2["recall"] == 0.5


def test_binary_classifier_eval_null_rows_and_zero_f1(spark):
    from pdf_to_epub_spark.operators.evaluate import binary_classifier_eval

    df = spark.createDataFrame(
        [
            (1, True, 5), (2, False, -3),
            (3, None, 4),      # unlabeled -> ignored
            (4, True, None),   # unscored -> ignored
        ],
        "id long, truth boolean, margin_micro long",
    )
    got = binary_classifier_eval(df).collect()[0]
    assert got["n_pos"] == 1 and got["n_neg"] == 1
    assert got["tp"] + got["fn"] == got["n_pos"]
    assert got["auc"] == 1.0

    # all-wrong classifier: f1 is 0.0, not NULL
    wrong = spark.createDataFrame(
        [(1, True, -2), (2, False, 3)],
        "id long, truth boolean, margin_micro long",
    )
    g2 = binary_classifier_eval(wrong).collect()[0]
    assert g2["precision"] == 0.0 and g2["recall"] == 0.0
    assert g2["f1"] == 0.0
    assert g2["auc"] == 0.0


# --------------------------------------------------------------------------
# crawl_cadence / cocitation_pairs / sentence_chunks / quality_percentiles
# --------------------------------------------------------------------------

def test_crawl_cadence_gap_stats_and_single_fetch_domains(spark):
    from pdf_to_epub_spark.operators import crawl_cadence

    rows = [
        # d1.example: epochs 100, 160, 220, 400 -> gaps 60, 60, 180
        ("https://a.d1.example/1", 100),
        ("https://a.d1.example/2", 160),
        ("https://b.d1.example/3", 220),
        ("https://b.d1.example/4", 400),
        # d2.example: single fetch -> excluded (min_fetches=2)
        ("https://d2.example/x", 500),
    ]
    df = spark.createDataFrame(rows, "url string, epoch long").selectExpr(
        "url", "timestamp_seconds(epoch) AS warc_ts"
    )
    got = {r["domain"]: r for r in crawl_cadence(df).collect()}
    assert set(got) == {"d1.example"}
    r = got["d1.example"]
    assert r["n_fetches"] == 4
    assert r["mean_gap_s"] == 100.0
    assert r["median_gap_s"] == 60.0
    # sample variance of (60, 60, 180) = 4800
    assert r["var_gap_s"] == 4800.0


def test_crawl_cadence_two_fetches_has_null_variance(spark):
    from pdf_to_epub_spark.operators import crawl_cadence

    df = spark.createDataFrame(
        [("https://one.example/a", 10), ("https://one.example/b", 70)],
        "url string, epoch long",
    ).selectExpr("url", "timestamp_seconds(epoch) AS warc_ts")
    r = crawl_cadence(df).collect()[0]
    assert r["n_fetches"] == 2 and r["mean_gap_s"] == 60.0
    assert r["var_gap_s"] is None


def test_cocitation_pairs_distinct_cap_and_min_count(spark):
    from pdf_to_epub_spark.operators import cocitation_pairs

    rows = [
        # page 1 links a+b (b twice -> distinct)
        ("p1", "https://a.example/"), ("p1", "https://b.example/"),
        ("p1", "https://b.example/dup"),
        # page 2 links a+b+c
        ("p2", "https://a.example/"), ("p2", "https://b.example/"),
        ("p2", "https://c.example/"),
        # page 3 links a+c
        ("p3", "https://a.example/"), ("p3", "https://c.example/"),
    ]
    df = spark.createDataFrame(rows, "url string, target string")
    got = {
        (r["domain_a"], r["domain_b"]): r["n_pages"]
        for r in cocitation_pairs(df, min_count=2).collect()
    }
    assert got == {("a.example", "b.example"): 2, ("a.example", "c.example"): 2}

    # max_domains=2 keeps only the 2 lexically-first domains per page:
    # p2 collapses to {a, b} so (a, c) loses its second page
    capped = {
        (r["domain_a"], r["domain_b"]): r["n_pages"]
        for r in cocitation_pairs(df, min_count=1, max_domains=2).collect()
    }
    assert capped[("a.example", "b.example")] == 2
    assert capped[("a.example", "c.example")] == 1


def test_sentence_chunks_windows_stride_and_empty_doc(spark):
    from pdf_to_epub_spark.operators import sentence_chunks

    df = spark.createDataFrame(
        [
            (1, "One. Two! Three? Four. Five."),
            (2, "Solo sentence."),
            (3, "   "),  # no sentences -> no rows
        ],
        "doc_id long, text string",
    )
    got = sentence_chunks(df, chunk_sents=3, stride=2).collect()
    by_doc = {}
    for r in got:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert 3 not in by_doc
    assert [r["chunk_text"] for r in sorted(by_doc[1], key=lambda r: r["chunk_id"])] == [
        "One. Two! Three?",
        "Three? Four. Five.",
        "Five.",
    ]
    assert [r["n_sents"] for r in sorted(by_doc[1], key=lambda r: r["chunk_id"])] == [3, 3, 1]
    assert len(by_doc[2]) == 1 and by_doc[2][0]["chunk_text"] == "Solo sentence."


def test_quality_percentiles_rank_and_buckets(spark):
    from pdf_to_epub_spark.operators import quality_percentiles

    rows = [(i, "en", i * 10) for i in range(1, 9)] + [(100, "fr", 7)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, score long")
    got = {r["doc_id"]: r for r in quality_percentiles(df, buckets=4).collect()}
    assert got[1]["pct"] == 0.0 and got[8]["pct"] == 1.0
    assert [got[i]["bucket"] for i in range(1, 9)] == [1, 1, 2, 2, 3, 3, 4, 4]
    # singleton group: percent_rank of a lone row is 0, bucket 1
    assert got[100]["pct"] == 0.0 and got[100]["bucket"] == 1


def test_event_anomalies_burst_flag_and_constant_series(spark):
    from pdf_to_epub_spark.operators import event_anomalies

    rows = []
    # type A: 5 calm hours of 2 events + one 40-event burst hour
    for h in range(5):
        rows += [("A", h * 3600 + m) for m in (10, 20)]
    rows += [("A", 5 * 3600 + m) for m in range(40)]
    # type B: constant 3/hour -> sd 0 -> z forced to 0, never a burst
    for h in range(4):
        rows += [("B", h * 3600 + m) for m in (1, 2, 3)]
    # type C: a single hour -> k=1 -> excluded entirely
    rows += [("C", 100)]
    df = spark.createDataFrame(
        rows, "event_type string, sec long"
    ).selectExpr("event_type", "timestamp_seconds(sec) AS ts")
    got = event_anomalies(df, z_threshold=2.0).collect()
    types = {r["event_type"] for r in got}
    assert types == {"A", "B"}
    bursts = [r for r in got if r["is_burst"]]
    assert [(r["event_type"], r["n_events"]) for r in bursts] == [("A", 40)]
    assert all(r["z"] == 0.0 for r in got if r["event_type"] == "B")


def test_title_body_overlap_alien_tokens_and_empty_title(spark):
    from pdf_to_epub_spark.operators import title_body_overlap

    df = spark.createDataFrame(
        [
            (1, "Big Cats Roam", "big cats roam the plains."),
            (2, "Miracle cure shocks doctors", "the plains are quiet."),
            (3, "", "anything"),
            (4, "Cats CATS cats", "cats."),  # distinct titles tokens
        ],
        "doc_id long, title string, text string",
    )
    got = {r["doc_id"]: r for r in title_body_overlap(df).collect()}
    assert got[1]["overlap_ratio"] == 1.0
    assert got[2]["n_overlap"] == 0 and got[2]["overlap_ratio"] == 0.0
    assert got[3]["n_title_tokens"] == 0 and got[3]["overlap_ratio"] is None
    assert got[4]["n_title_tokens"] == 1 and got[4]["overlap_ratio"] == 1.0


def test_quote_density_counts_and_unmatched_quote(spark):
    from pdf_to_epub_spark.operators import quote_density

    df = spark.createDataFrame(
        [
            (1, 'He said "yes" and "no".'),
            (2, "no quotes here"),
            (3, '"unclosed tail'),
            (4, ""),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in quote_density(df).collect()}
    assert got[1]["n_quotes"] == 2 and got[1]["quoted_chars"] == 5
    assert got[2]["n_quotes"] == 0 and got[2]["quoted_chars"] == 0
    assert got[3]["n_quotes"] == 0
    assert got[4]["quote_char_ratio"] is None


def test_outlink_quality_broadcast_join_and_unscored(spark):
    from pdf_to_epub_spark.operators import outlink_quality

    ol = spark.createDataFrame(
        [
            ("p1", "https://good.example/a"),
            ("p1", "https://bad.example/b"),
            ("p1", "https://unknown.example/c"),
            ("p2", "https://unknown.example/d"),
        ],
        "url string, target string",
    )
    scores = spark.createDataFrame(
        [("good.example", 0.9), ("bad.example", 0.1)],
        "domain string, score double",
    )
    got = {r["url"]: r for r in outlink_quality(ol, scores).collect()}
    assert got["p1"]["n_outlinks"] == 3 and got["p1"]["n_scored"] == 2
    assert got["p1"]["mean_score"] == 0.5 and got["p1"]["min_score"] == 0.1
    assert got["p2"]["n_scored"] == 0 and got["p2"]["mean_score"] is None
    # the score side must broadcast: no shuffle of the outlink table
    plan = outlink_quality(ol, scores)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_redirect_chains_chain_cycle_and_multi_edge(spark):
    from pdf_to_epub_spark.operators import redirect_chains

    edges = spark.createDataFrame(
        [
            ("a", "b"), ("b", "c"), ("c", "d"),   # chain a->d (3 hops)
            ("x", "y"), ("y", "x"),               # 2-cycle
            ("m", "n"), ("m", "z"),               # non-functional: min(dst)=n
            ("s", "s"),                           # self-loop
        ],
        "src string, dst string",
    )
    got = {r["src"]: r for r in redirect_chains(edges, max_hops=16).collect()}
    assert (got["a"]["final"], got["a"]["hops"], got["a"]["resolved"]) == ("d", 3, True)
    assert got["b"]["hops"] == 2 and got["c"]["hops"] == 1
    # 2-cycle: 16 hops lands back on the start node, unresolved
    assert got["x"]["final"] == "x" and got["x"]["hops"] == 16
    assert got["x"]["resolved"] is False
    assert got["s"]["final"] == "s" and got["s"]["resolved"] is False
    # multi-edge src follows min(dst); n is terminal
    assert (got["m"]["final"], got["m"]["resolved"]) == ("n", True)

    import pytest as _pt
    with _pt.raises(ValueError):
        redirect_chains(edges, max_hops=12)


def test_weighted_sample_is_deterministic_and_weight_biased(spark):
    from pdf_to_epub_spark.operators import weighted_sample

    rows = [(i, 100.0 if i < 10 else 0.01) for i in range(200)] + [(999, 0.0)]
    df = spark.createDataFrame(rows, "doc_id long, weight double")
    a = weighted_sample(df, k=10).collect()
    b = weighted_sample(df.repartition(7), k=10).collect()
    assert [r["doc_id"] for r in a] == [r["doc_id"] for r in b]
    assert [r["rank"] for r in a] == list(range(1, 11))
    # heavy rows dominate the sample; zero-weight row never appears
    heavy = sum(1 for r in a if r["doc_id"] < 10)
    assert heavy >= 8
    assert all(r["doc_id"] != 999 for r in a)
    # plan: global top-k must be TakeOrderedAndProject, not a full sort
    plan = weighted_sample(df, k=10)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_partition_skew_even_vs_hot_key(spark):
    from pdf_to_epub_spark.operators import partition_skew

    even = spark.range(0, 1600).selectExpr("id::string AS k")
    r1 = partition_skew(even, "k", n_buckets=16).collect()[0]
    assert r1["n_rows"] == 1600 and r1["n_empty"] == 0
    assert r1["skew_ratio"] < 2.0

    hot = spark.range(0, 1600).selectExpr(
        "CASE WHEN id % 100 = 0 THEN 'k' || id ELSE 'hot' END AS k"
    )
    r2 = partition_skew(hot, "k", n_buckets=16).collect()[0]
    assert r2["max_bucket_rows"] >= 1584
    assert r2["skew_ratio"] > 10.0


def test_length_outliers_mad_flag_and_zero_mad_group(spark):
    from pdf_to_epub_spark.operators import length_outliers

    rows = [(i, "en", 100 + (i % 5)) for i in range(20)] + [
        (100, "en", 100000),          # the obvious outlier
        (200, "zz", 7), (201, "zz", 7), (202, "zz", 7),  # MAD=0 group
    ]
    df = spark.createDataFrame(rows, "doc_id long, lang string, n_chars long")
    got = {r["doc_id"]: r for r in length_outliers(df).collect()}
    assert got[100]["is_outlier"] is True
    assert sum(1 for r in got.values() if r["is_outlier"]) == 1
    assert got[200]["robust_z"] is None and got[200]["is_outlier"] is False


def test_domain_triangles_known_graph(spark):
    from pdf_to_epub_spark.operators import domain_triangles

    # K4 minus one edge: nodes a,b,c,d; edges ab,ac,bc,bd,cd -> 2 triangles
    edges = spark.createDataFrame(
        [("a", "b"), ("a", "c"), ("b", "c"), ("b", "d"), ("c", "d"),
         ("b", "a"),            # reverse duplicate
         ("a", "a")],           # self-loop dropped
        "src string, dst string",
    )
    r = domain_triangles(edges).collect()[0]
    assert r["n_nodes"] == 4 and r["n_edges"] == 5
    # degrees: a=2, b=3, c=3, d=2 -> wedges 1+3+3+1 = 8
    assert r["n_wedges"] == 8 and r["n_triangles"] == 2
    assert r["global_clustering"] == 0.75


def test_domain_triangles_triangle_free(spark):
    from pdf_to_epub_spark.operators import domain_triangles

    star = spark.createDataFrame(
        [("hub", f"leaf{i}") for i in range(5)], "src string, dst string"
    )
    r = domain_triangles(star).collect()[0]
    assert r["n_triangles"] == 0 and r["n_wedges"] == 10
    assert r["global_clustering"] == 0.0


def test_range_enrich_overlap_gap_and_duplicate_values(spark):
    from pdf_to_epub_spark.operators import range_enrich

    vals = spark.createDataFrame(
        [(1, 10), (2, 10), (3, 75), (4, 999), (5, 30)],
        "id long, v long",
    )
    ranges = spark.createDataFrame(
        [(0, 49, "low"), (25, 125, "wide"), (200, 300, "mid")],
        "lo long, hi long, label string",
    )
    got = {r["id"]: r["range_label"] for r in
           range_enrich(vals, ranges, cell=64).collect()}
    # overlap resolves to smallest lo; identical values keep separate rows
    assert got == {1: "low", 2: "low", 3: "wide", 4: None, 5: "low"}
    # ranges side must broadcast
    plan = range_enrich(vals, ranges, cell=64)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "NestedLoop" not in plan


def test_signal_correlations_perfect_and_constant(spark):
    from pdf_to_epub_spark.operators import signal_correlations

    df = spark.createDataFrame(
        [(i, 2 * i, -3 * i + 100, 5) for i in range(1, 30)],
        "a long, b long, c long, k long",
    )
    got = {(r["signal_a"], r["signal_b"]): r["r"]
           for r in signal_correlations(df, ("a", "b", "c", "k")).collect()}
    assert got[("a", "b")] == 1.0
    assert got[("a", "c")] == -1.0
    assert got[("a", "k")] is None
    assert len(got) == 6


def test_corpus_growth_cumulative_and_share(spark):
    from pdf_to_epub_spark.operators import corpus_growth

    rows = [(0,)] * 2 + [(86400,)] * 3 + [(2 * 86400 + 5,)] * 5
    df = spark.createDataFrame(rows, "sec long").selectExpr(
        "timestamp_seconds(sec) AS ts"
    )
    got = sorted(corpus_growth(df).collect(), key=lambda r: r["bucket_epoch"])
    assert [r["n_events"] for r in got] == [2, 3, 5]
    assert [r["cum_events"] for r in got] == [2, 5, 10]
    assert [r["pct_of_total"] for r in got] == [0.2, 0.5, 1.0]


def _pg(spark, html: str):
    return spark.createDataFrame([("u", html.encode("utf-8"))],
                                 "url string, html binary")


def test_markup_signals_counts_and_empty_page(spark):
    from pdf_to_epub_spark.operators import markup_signals

    r = markup_signals(_pg(
        spark,
        '<html><body><script src=a></script><SCRIPT>x</SCRIPT>'
        '<iframe src=b><form method=post><a href=c>t</a>text</body></html>',
    )).collect()[0]
    assert r["n_script"] == 2      # case-insensitive, </script> not counted
    assert r["n_iframe"] == 1 and r["n_form"] == 1 and r["n_links"] == 1
    assert r["tag_density"] is not None and r["tag_density"] > 0

    empty = spark.createDataFrame([("u", b"")], "url string, html binary")
    r2 = markup_signals(empty).collect()[0]
    assert r2["n_script"] == 0 and r2["tag_density"] is None


def test_meta_redirects_variants(spark):
    from pdf_to_epub_spark.operators import meta_redirects

    # reversed attrs, uppercase URL, comma separator
    r = meta_redirects(_pg(
        spark, "<meta content='3 , URL=/go' http-equiv=REFRESH>"
    )).collect()
    assert len(r) == 1 and r[0]["delay_s"] == 3 and r[0]["target"] == "/go"
    # no refresh -> no row
    assert meta_redirects(_pg(spark, "<meta name=x content=y>")).count() == 0
    # reload-only refresh
    r3 = meta_redirects(_pg(
        spark, '<meta http-equiv="refresh" content="30">'
    )).collect()[0]
    assert r3["delay_s"] == 30 and r3["target"] is None


def test_rel_pagination_token_match_not_substring(spark):
    from pdf_to_epub_spark.operators import rel_pagination

    # rel="nexter" must NOT match the next token
    r = rel_pagination(_pg(
        spark, '<link rel="nexter" href="/x"><link rel="prev next" href="/y">'
    )).collect()[0]
    assert r["next_url"] == "/y" and r["prev_url"] == "/y"
    assert r["is_paginated"] is True

    r2 = rel_pagination(_pg(spark, "<p>no links</p>")).collect()[0]
    assert r2["next_url"] is None and r2["is_paginated"] is False


def test_og_cards_first_wins_and_attr_order(spark):
    from pdf_to_epub_spark.operators import og_cards

    r = og_cards(_pg(
        spark,
        '<meta content="T one" property="og:title">'
        '<meta property="og:title" content="T two">'
        "<meta name='twitter:card' content=summary>",
    )).collect()[0]
    assert r["og_title"] == "T one"
    assert r["twitter_card"] == "summary"
    assert r["og_type"] is None and r["og_image"] is None


def test_k_core_cascade_and_full_survival(spark):
    from pdf_to_epub_spark.operators import k_core

    # triangle abc (deg 2 each) + tail: peeling at k=2 keeps the
    # triangle; the tail d-e cascades away (e deg1 -> d deg1 -> gone)
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("a", "c"), ("c", "d"), ("d", "e")],
        "src string, dst string",
    )
    got = {r["node"]: r["deg"] for r in k_core(edges, k=2).collect()}
    assert got == {"a": 2, "b": 2, "c": 2}
    # k=3 peels everything (triangle degrees are 2)
    assert k_core(edges, k=3).count() == 0
    # k=1 keeps the whole graph with original degrees
    all1 = {r["node"]: r["deg"] for r in k_core(edges, k=1).collect()}
    assert all1 == {"a": 2, "b": 2, "c": 3, "d": 2, "e": 1}


def test_cluster_pair_eval_perfect_and_degenerate(spark):
    from pdf_to_epub_spark.operators import cluster_pair_eval

    perfect = spark.createDataFrame(
        [(0, 0), (0, 0), (1, 1), (1, 1), (2, 2)], "pred long, truth long"
    )
    r = cluster_pair_eval(perfect).collect()[0]
    assert r["precision"] == 1.0 and r["recall"] == 1.0 and r["f1"] == 1.0
    assert r["tp_pairs"] == 2 and r["n_items"] == 5

    # all singleton predictions: no predicted pairs -> precision NULL
    singletons = spark.createDataFrame(
        [(i, 0) for i in range(4)], "pred long, truth long"
    )
    r2 = cluster_pair_eval(singletons).collect()[0]
    assert r2["precision"] is None and r2["recall"] == 0.0
    assert r2["f1"] is None

    # one merged blob over two truth groups: recall 1, precision 2/6
    blob = spark.createDataFrame(
        [(0, 0), (0, 0), (0, 1), (0, 1)], "pred long, truth long"
    )
    r3 = cluster_pair_eval(blob).collect()[0]
    assert r3["recall"] == 1.0 and r3["precision"] == round(2 / 6, 6)


def test_rank_agreement_extremes(spark):
    from pdf_to_epub_spark.operators import rank_agreement

    same = spark.createDataFrame(
        [(i, i * 2, i * 5 + 1) for i in range(20)],
        "doc_id long, score_a long, score_b long",
    )
    assert rank_agreement(same).collect()[0]["rho"] == 1.0

    rev = spark.createDataFrame(
        [(i, i, -i) for i in range(20)],
        "doc_id long, score_a long, score_b long",
    )
    assert rank_agreement(rev).collect()[0]["rho"] == -1.0

    single = spark.createDataFrame(
        [(1, 1, 1)], "doc_id long, score_a long, score_b long"
    )
    assert rank_agreement(single).collect()[0]["rho"] is None


def test_score_drift_ks_identical_and_disjoint(spark):
    from pdf_to_epub_spark.operators import score_drift_ks

    a = spark.createDataFrame([(v,) for v in (1, 2, 3, 4)], "v long")
    r = score_drift_ks(a, a).collect()[0]
    assert r["d_stat"] == 0.0 and r["n_a"] == 4 and r["n_b"] == 4

    b = spark.createDataFrame([(v,) for v in (10, 11, 12, 13)], "v long")
    r2 = score_drift_ks(a, b).collect()[0]
    assert r2["d_stat"] == 1.0 and r2["at_value"] == 4

    # ties across sides absorb before the gap is read
    c = spark.createDataFrame([(1,), (1,), (2,)], "v long")
    d = spark.createDataFrame([(1,), (2,), (2,)], "v long")
    r3 = score_drift_ks(c, d).collect()[0]
    assert r3["d_stat"] == round(abs(2 / 3 - 1 / 3), 6)


# --------------------------------------------------------------------------
# review-fix regression pins
# --------------------------------------------------------------------------

def test_signal_correlations_fractional_signals(spark):
    from pdf_to_epub_spark.operators import signal_correlations

    # ratios in [0,1]: a long cast would collapse these to 0/1
    df = spark.createDataFrame(
        [(i / 100.0, (100 - i) / 200.0) for i in range(1, 50)],
        "a double, b double",
    )
    got = {(r["signal_a"], r["signal_b"]): r["r"]
           for r in signal_correlations(df, ("a", "b")).collect()}
    assert got[("a", "b")] == -1.0


def test_partition_skew_null_keys_one_real_bucket(spark):
    from pdf_to_epub_spark.operators import partition_skew

    df = spark.createDataFrame(
        [(None,), (None,), ("x",), ("y",)], "k string"
    )
    r = partition_skew(df, "k", n_buckets=8).collect()[0]
    assert r["n_rows"] == 4
    assert 0 <= r["n_empty"] <= 7  # never negative / phantom bucket


def test_k_core_raises_when_not_converged(spark):
    import pytest as _pt
    from pdf_to_epub_spark.operators import k_core

    # a 10-path at k=2 peels two endpoints per round -> needs 5 rounds
    path = spark.createDataFrame(
        [(f"n{i}", f"n{i+1}") for i in range(10)], "src string, dst string"
    )
    with _pt.raises(RuntimeError, match="did not converge"):
        k_core(path, k=2, max_iter=2)
    # with enough rounds it converges to the empty 2-core
    assert k_core(path, k=2, max_iter=10).count() == 0


def test_redirect_chains_single_hop_cap(spark):
    from pdf_to_epub_spark.operators import redirect_chains

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c")], "src string, dst string"
    )
    got = {r["src"]: r for r in redirect_chains(edges, max_hops=1).collect()}
    assert (got["a"]["final"], got["a"]["hops"], got["a"]["resolved"]) == ("b", 1, False)
    assert got["b"]["resolved"] is True


def test_outlink_quality_ignores_unparseable_targets(spark):
    from pdf_to_epub_spark.operators import outlink_quality

    ol = spark.createDataFrame(
        [("p1", "https://good.example/a"), ("p1", "/relative"),
         ("p1", "javascript:void(0)")],
        "url string, target string",
    )
    scores = spark.createDataFrame(
        [("good.example", 0.9)], "domain string, score double"
    )
    r = outlink_quality(ol, scores).collect()[0]
    assert r["n_outlinks"] == 1 and r["n_scored"] == 1


def test_range_enrich_custom_label_col(spark):
    from pdf_to_epub_spark.operators import range_enrich

    vals = spark.createDataFrame([(1, 10)], "id long, v long")
    ranges = spark.createDataFrame(
        [(0, 49, "low")], "lo long, hi long, band string"
    )
    r = range_enrich(vals, ranges, label_col="band", cell=64).collect()[0]
    assert r["range_label"] == "low"


def test_rank_agreement_with_heavy_ties(spark):
    from pdf_to_epub_spark.operators import rank_agreement

    # all score_a equal: ranks follow id; score_b identical ordering
    df = spark.createDataFrame(
        [(i, 5, i) for i in range(50)],
        "doc_id long, score_a long, score_b long",
    )
    assert rank_agreement(df).collect()[0]["rho"] == 1.0


def test_retrieval_eval_known_run(spark):
    from pdf_to_epub_spark.operators import retrieval_eval

    # q1: rel docs {1, 2, 99}; run ranks 1..3 = docs (1, 5, 2)
    run = spark.createDataFrame(
        [(1, 1, 1), (1, 5, 2), (1, 2, 3),
         (2, 7, 1)],               # q2 retrieved nothing relevant
        "qid long, doc_id long, rank long",
    )
    qrels = spark.createDataFrame(
        [(1, 1), (1, 2), (1, 99), (2, 50), (3, 60)],
        "qid long, doc_id long",
    )
    got = {r["qid"]: r for r in retrieval_eval(run, qrels, k=10).collect()}
    q1 = got[1]
    assert q1["n_rel"] == 3 and q1["hits_k"] == 2
    assert q1["p_at_k"] == 0.2 and q1["r_at_k"] == round(2 / 3, 6)
    assert q1["rr"] == 1.0
    import math
    dcg = round(1e9 / math.log2(2)) + round(1e9 / math.log2(4))
    ideal = sum(round(1e9 / math.log2(r + 1)) for r in (1, 2, 3))
    assert q1["ndcg_k"] == round(dcg / ideal, 6)
    # q2: judged but no relevant retrieved -> all zeros
    q2 = got[2]
    assert q2["hits_k"] == 0 and q2["rr"] == 0.0 and q2["ndcg_k"] == 0.0
    # q3: judged, run returned nothing -> still present, zero scores
    assert got[3]["hits_k"] == 0 and got[3]["p_at_k"] == 0.0


def test_event_transitions_probabilities(spark):
    from pdf_to_epub_spark.operators import event_transitions

    rows = [
        (1, 1, 10, "view"), (2, 1, 20, "click"), (3, 1, 30, "view"),
        (4, 2, 10, "view"), (5, 2, 20, "view"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, sec long, event_type string"
    ).selectExpr("event_id", "user_id",
                 "timestamp_seconds(sec) AS ts", "event_type")
    got = {(r["prev_type"], r["event_type"]): r for r in
           event_transitions(df).collect()}
    assert got[("view", "click")]["n"] == 1
    assert got[("view", "view")]["n"] == 1
    assert got[("view", "click")]["prob"] == 0.5
    assert got[("click", "view")]["prob"] == 1.0
    # no cross-user pair (u1 last -> u2 first never pairs)
    assert len(got) == 3


def test_template_fingerprints_same_template_same_hash(spark):
    from pdf_to_epub_spark.operators import template_fingerprints

    pages = spark.createDataFrame(
        [
            ("a", '<div class="x y"><p class="z">one</p></div>'.encode()),
            ("b", '<p class="z other">two</p><i class="x y">t</i>'.encode()),
            ("c", "<div>no classes</div>".encode()),
        ],
        "url string, html binary",
    )
    got = {r["url"]: r for r in template_fingerprints(pages).collect()}
    assert got["a"]["n_class_tokens"] == 3
    assert got["b"]["n_class_tokens"] == 4
    assert got["c"]["fingerprint"] is None
    # token-set equality => fingerprint equality regardless of order
    same = spark.createDataFrame(
        [("p", '<div class="y x"><b class="x">s</b></div>'.encode()),
         ("q", '<i class="x  y">s</i>'.encode())],
        "url string, html binary",
    )
    fps = [r["fingerprint"] for r in template_fingerprints(same).collect()]
    assert fps[0] == fps[1] is not None


def test_allocate_budget_sums_exactly_and_ties(spark):
    from pdf_to_epub_spark.operators import allocate_budget

    counts = spark.createDataFrame(
        [("a", 1), ("b", 1), ("c", 1)], "stratum string, n long"
    )
    got = {r["stratum"]: r["alloc"]
           for r in allocate_budget(counts, budget=10).collect()}
    assert sum(got.values()) == 10
    # 10/3: base 3 each, leftover 1 goes to lexically-first tie
    assert got == {"a": 4, "b": 3, "c": 3}

    skew = spark.createDataFrame(
        [("big", 997), ("tiny", 3)], "stratum string, n long"
    )
    got2 = {r["stratum"]: r["alloc"]
            for r in allocate_budget(skew, budget=100).collect()}
    assert sum(got2.values()) == 100 and got2["tiny"] >= 0

    zero = spark.createDataFrame([("z", 0)], "stratum string, n long")
    assert allocate_budget(zero, budget=5).collect()[0]["alloc"] == 0

    import pytest as _pt
    with _pt.raises(ValueError, match="strata"):
        allocate_budget(counts, budget=10, max_strata=2)


def test_temporal_splits_ordering_and_shares(spark):
    from pdf_to_epub_spark.operators import temporal_splits

    df = spark.createDataFrame(
        [(i, 1000 + i) for i in range(100)], "doc_id long, sec long"
    ).selectExpr("doc_id", "timestamp_seconds(sec) AS warc_ts")
    got = temporal_splits(df).collect()
    by_split = {}
    for r in got:
        by_split.setdefault(r["split"], []).append(r["epoch"])
    # temporal ordering: every train epoch < every val epoch < every test
    assert max(by_split["train"]) < min(by_split["val"])
    assert max(by_split["val"]) < min(by_split["test"])
    assert len(by_split["train"]) == 80


# --------------------------------------------------------------------------
# plan pins: the extraction-layer ops must stay shuffle-free
# --------------------------------------------------------------------------

def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_markup_and_metadata_ops_are_shuffle_free(spark):
    from pdf_to_epub_spark.operators import (
        markup_signals, meta_redirects, og_cards, rel_pagination,
        template_fingerprints,
    )

    pages = spark.createDataFrame(
        [("u", b"<html><head></head><body>x</body></html>")],
        "url string, html binary",
    )
    for op in (markup_signals, meta_redirects, og_cards, rel_pagination,
               template_fingerprints):
        plan = _plan(op(pages))
        assert "Exchange" not in plan, f"{op.__name__} shuffles:\n{plan}"


def test_sentence_chunks_is_shuffle_free_and_no_inferred_filter(spark):
    from pdf_to_epub_spark.operators import sentence_chunks

    df = spark.createDataFrame([(1, "A. B. C.")], "doc_id long, text string")
    plan = _plan(sentence_chunks(df))
    assert "Exchange" not in plan
    # explode_outer + null filter: the optimizer must not have pushed an
    # inferred size()>0 filter below the generator (which would inline
    # the sentence regex a second time)
    assert plan.count("regexp_extract_all") <= 2


def test_compaction_plan_bins_fill_to_target(spark):
    from pdf_to_epub_spark.operators import compaction_plan

    files = spark.createDataFrame(
        [("a", 900), ("b", 600), ("c", 300), ("d", 150), ("e", 50)],
        "path string, bytes long",
    )
    got = {r["path"]: r["bin"] for r in
           compaction_plan(files, target_bytes=1000).collect()}
    # desc order: a(900 cum900 bin0) b(600 cum1500 bin0) c(300 cum1800
    # bin1) d(150 cum1950 bin1) e(50 cum2000 bin1)
    assert got == {"a": 0, "b": 0, "c": 1, "d": 1, "e": 1}
    # every closed bin holds >= target
    sizes = {}
    for r in compaction_plan(files, target_bytes=1000).collect():
        sizes[r["bin"]] = sizes.get(r["bin"], 0) + r["bytes"]
    assert sizes[0] >= 1000


def test_dom_depth_balance_voids_and_stray_closers(spark):
    from pdf_to_epub_spark.operators import dom_depth

    pages = spark.createDataFrame(
        [
            ("deep", b"<div><ul><li><a href=x>t</a></li></ul></div>"),
            ("voids", b"<p>a<br><img src=y>b</p>"),
            ("stray", b"</div></div><b>x</b>"),
            ("selfclose", b"<div><path d='z'/><span>s</span></div>"),
        ],
        "url string, html binary",
    )
    got = {r["url"]: r for r in dom_depth(pages).collect()}
    assert got["deep"]["max_depth"] == 4
    assert got["voids"]["max_depth"] == 1 and got["voids"]["n_tags"] == 4
    assert got["stray"]["max_depth"] == 1   # closers clamp at zero
    assert got["selfclose"]["max_depth"] == 2


def test_url_lifespan_active_flag_and_distinct_snaps(spark):
    from pdf_to_epub_spark.operators import url_lifespan

    obs = spark.createDataFrame(
        [("a", 100), ("a", 100), ("a", 300),   # dup sighting collapses
         ("b", 100), ("b", 200)],
        "url string, snap_epoch long",
    )
    got = {r["url"]: r for r in url_lifespan(obs).collect()}
    assert got["a"]["n_snapshots"] == 2 and got["a"]["is_active"] is True
    assert got["b"]["last_seen"] == 200 and got["b"]["is_active"] is False


def test_interleave_strata_round_robin_order(spark):
    from pdf_to_epub_spark.operators import interleave_strata

    df = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "b"), (4, "b"), (5, "c")],
        "doc_id long, stratum string",
    )
    got = sorted(interleave_strata(df).collect(),
                 key=lambda r: r["train_order"])
    # order cycles a, b, c, a, b (c exhausted after one)
    assert [r["stratum"] for r in got] == ["a", "b", "c", "a", "b"]
    assert [r["doc_id"] for r in got] == [1, 3, 5, 2, 4]
    assert len({r["train_order"] for r in got}) == 5


def test_punct_profile_mixed_and_empty(spark):
    from pdf_to_epub_spark.operators import punct_profile

    df = spark.createDataFrame(
        [(1, "“smart” — yes… ok"), (2, '"plain" -- no... way'),
         (3, "nothing here"), (4, "mix “a” and \"b\"")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in punct_profile(df).collect()}
    assert got[1]["n_smart"] == 4 and got[1]["n_ascii"] == 0
    assert got[1]["smart_ratio"] == 1.0
    assert got[2]["n_smart"] == 0 and got[2]["n_ascii"] == 4
    assert got[3]["smart_ratio"] is None
    assert got[4]["smart_ratio"] == 0.5


def test_extract_json_field_corrupt_vs_missing_vs_null(spark):
    from pdf_to_epub_spark.operators import extract_json_field

    df = spark.createDataFrame(
        [(1, '{"k": 7}'), (2, '{"k": bad'), (3, '{"j": 1}'), (4, None),
         (5, '{"k": null}')],
        "event_id long, props string",
    )
    got = {r["event_id"]: r for r in extract_json_field(df).collect()}
    assert got[1]["k"] == 7 and got[1]["is_valid"] is True
    assert got[2]["k"] is None and got[2]["is_valid"] is False
    assert got[3]["k"] is None and got[3]["is_valid"] is True
    assert got[4]["is_valid"] is False
    assert got[5]["k"] is None and got[5]["is_valid"] is True


def test_count_cusum_level_shift_and_steady(spark):
    from pdf_to_epub_spark.operators import count_cusum

    # 5 days at 2/day then 5 days at 10/day: peak |S| at the shift day
    rows = []
    for d in range(5):
        rows += [(d * 86400 + m,) for m in range(2)]
    for d in range(5, 10):
        rows += [(d * 86400 + m,) for m in range(10)]
    df = spark.createDataFrame(rows, "sec long").selectExpr(
        "timestamp_seconds(sec) AS ts"
    )
    r = count_cusum(df).collect()[0]
    assert r["n_days"] == 10 and r["total_events"] == 60
    assert r["peak_day"] == 4 * 86400   # prefix of the cheap regime
    # steady series: statistic is 0 everywhere
    steady = spark.createDataFrame(
        [(d * 86400,) for d in range(6)], "sec long"
    ).selectExpr("timestamp_seconds(sec) AS ts")
    r2 = count_cusum(steady).collect()[0]
    assert r2["peak_stat"] == 0 and r2["norm_stat"] == 0.0


# second-review regression pins

def test_rank_agreement_drops_null_and_nan_scores(spark):
    from pdf_to_epub_spark.operators import rank_agreement

    df = spark.createDataFrame(
        [(1, None, 30.0), (2, 10.0, 20.0), (3, 20.0, 10.0),
         (4, float("nan"), 1.0)],
        "doc_id long, score_a double, score_b double",
    )
    r = rank_agreement(df).collect()[0]
    assert r["n"] == 2
    assert -1.0 <= r["rho"] <= 1.0 and r["rho"] == -1.0


def test_count_cusum_ignores_null_timestamps(spark):
    from pdf_to_epub_spark.operators import count_cusum

    rows = [(0,), (86400,), (2 * 86400,), (None,)]
    df = spark.createDataFrame(rows, "sec long").selectExpr(
        "timestamp_seconds(sec) AS ts"
    )
    r = count_cusum(df).collect()[0]
    assert r["n_days"] == 3 and r["total_events"] == 3


def test_extract_json_field_awkward_key_and_corrupt_collision(spark):
    from pdf_to_epub_spark.operators import extract_json_field

    df = spark.createDataFrame(
        [(1, '{"user id": 9}')], "event_id long, props string"
    )
    got = extract_json_field(df, field="user id").collect()[0]
    assert got["user id"] == 9 and got["is_valid"] is True

    # a legit _corrupt key in the payload must NOT flag the row
    df2 = spark.createDataFrame(
        [(1, '{"k": 3, "_corrupt": "note"}')], "event_id long, props string"
    )
    got2 = extract_json_field(df2).collect()[0]
    assert got2["k"] == 3 and got2["is_valid"] is True


def test_template_fingerprints_whitespace_class_lists(spark):
    from pdf_to_epub_spark.operators import template_fingerprints

    a = '<div class="nav main">x</div>'.encode()
    b = '<div class="nav\n\t  main">x</div>'.encode()
    pages = spark.createDataFrame(
        [("a", a), ("b", b)], "url string, html binary"
    )
    fps = {r["url"]: r["fingerprint"]
           for r in template_fingerprints(pages).collect()}
    assert fps["a"] == fps["b"] is not None


def test_interleave_strata_keeps_null_stratum(spark):
    from pdf_to_epub_spark.operators import interleave_strata

    df = spark.createDataFrame(
        [(1, None), (2, "en"), (3, "fr")], "doc_id long, stratum string"
    )
    got = interleave_strata(df).collect()
    assert len(got) == 3
    orders = {r["doc_id"]: r["train_order"] for r in got}
    assert len(set(orders.values())) == 3


def test_allocate_budget_guard_fires_without_full_collect(spark):
    import pytest as _pt
    from pdf_to_epub_spark.operators import allocate_budget

    big = spark.range(0, 1000).selectExpr("id::string AS stratum", "1::long AS n")
    with _pt.raises(ValueError, match="max_strata"):
        allocate_budget(big, budget=10, max_strata=50)


def test_domain_churn_statuses(spark):
    from pdf_to_epub_spark.operators import domain_churn

    old = spark.createDataFrame(
        [("https://a.example/1",), ("https://a.example/2",),
         ("https://gone.example/x",)], "url string")
    new = spark.createDataFrame(
        [("https://a.example/3",), ("https://fresh.example/y",)],
        "url string")
    got = {r["domain"]: r for r in domain_churn(old, new).collect()}
    assert got["a.example"]["status"] == "retained"
    assert got["a.example"]["n_old"] == 2 and got["a.example"]["n_new"] == 1
    assert got["gone.example"]["status"] == "lost"
    assert got["fresh.example"]["status"] == "new"
    assert got["fresh.example"]["n_old"] == 0


def test_threshold_for_rate_hits_target_with_ties(spark):
    from pdf_to_epub_spark.operators import threshold_for_rate

    df = spark.createDataFrame([(i,) for i in range(1, 101)], "score long")
    r = threshold_for_rate(df, keep_frac=0.25).collect()[0]
    assert r["n_total"] == 100
    assert abs(r["achieved_rate"] - 0.25) <= 0.01
    # degenerate: all-equal scores -> everything kept
    same = spark.createDataFrame([(5,)] * 10, "score long")
    r2 = threshold_for_rate(same, keep_frac=0.5).collect()[0]
    assert r2["n_kept"] == 10 and r2["achieved_rate"] == 1.0


def test_hapax_stats_shared_vs_unique(spark):
    from pdf_to_epub_spark.operators import hapax_stats

    df = spark.createDataFrame(
        [
            (1, "common words here plus zzunique"),
            (2, "common words here too"),
            (3, "   "),   # token-less doc stays with NULL ratio
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in hapax_stats(df).collect()}
    # doc1: {common,words,here,plus,zzunique}; plus+zzunique are hapax
    assert got[1]["n_distinct_tokens"] == 5 and got[1]["n_hapax"] == 2
    # doc2: {common,words,here,too}; only "too" is corpus-unique
    assert got[2]["n_hapax"] == 1 and got[2]["n_distinct_tokens"] == 4
    assert got[3]["n_distinct_tokens"] == 0
    assert got[3]["hapax_ratio"] is None


def test_bfs_distances_components_and_cap(spark):
    from pdf_to_epub_spark.operators import bfs_distances
    import pytest as _pt

    # a: 0->1->2->3 chain + shortcut 0->3; b: separate pair
    edges = spark.createDataFrame(
        [("a0", "a1"), ("a1", "a2"), ("a2", "a3"), ("a0", "a3"),
         ("b0", "b1")],
        "src_domain string, dst_domain string",
    )
    got = {r["domain"]: r["hops"] for r in
           bfs_distances(edges, ["a0"]).collect()}
    assert got == {"a0": 0, "a1": 1, "a2": 2, "a3": 1}
    # max_hops truncates the wave but keeps what it reached
    capped = {r["domain"]: r["hops"] for r in
              bfs_distances(edges, ["a0"], max_hops=1).collect()}
    assert capped == {"a0": 0, "a1": 1, "a3": 1}
    # seed absent from the graph still reports hop 0
    lone = {r["domain"]: r["hops"] for r in
            bfs_distances(edges, ["zz"]).collect()}
    assert lone == {"zz": 0}
    with _pt.raises(ValueError):
        bfs_distances(edges, [])


def test_zorder_layout_prunes_clustered_predicate(spark):
    from pdf_to_epub_spark.operators import zorder_layout

    # y cycles 0..15 while x ascends: natural files all straddle the
    # y-range, z-order files cluster it.
    rows = [(i, i, (i * 7) % 16) for i in range(400)]
    df = spark.createDataFrame(rows, "id long, x long, y long")
    got = {r["layout"]: r for r in
           zorder_layout(df, "x", "y", pred_lo=12, pred_hi=15,
                         file_rows=25).collect()}
    nat, zo = got["natural"], got["zorder"]
    assert nat["n_rows"] == zo["n_rows"] == 400
    assert nat["rows_matched"] == zo["rows_matched"] == 100
    # every natural file straddles; zorder prunes most files
    assert nat["files_scanned"] == nat["n_files"]
    assert zo["files_scanned"] < zo["n_files"]
    assert zo["rows_scanned"] < nat["rows_scanned"]
    assert zo["prune_ratio"] > nat["prune_ratio"]


def test_kmv_similarity_exact_small_and_identical(spark):
    from pdf_to_epub_spark.operators import kmv_similarity

    a = spark.createDataFrame([(f"u{i}",) for i in range(20)], "url string")
    got = kmv_similarity(a, a, k=64).collect()[0]
    # below-k sides: sketch IS the distinct set, jaccard exact 1.0
    assert got["n_sketch_old"] == 20 and got["est_distinct_old"] == 20.0
    assert got["est_jaccard"] == 1.0
    b = spark.createDataFrame([(f"v{i}",) for i in range(20)], "url string")
    disj = kmv_similarity(a, b, k=64).collect()[0]
    assert disj["est_jaccard"] == 0.0
    # above-k: estimate lands within ~35% of truth (k=64)
    big = spark.createDataFrame([(f"w{i}",) for i in range(5000)],
                                "url string")
    est = kmv_similarity(big, big, k=64).collect()[0]
    assert est["n_sketch_old"] == 64
    assert 3000 <= est["est_distinct_old"] <= 8000
    assert est["est_jaccard"] == 1.0


def test_calibration_bins_exact_and_null_hygiene(spark):
    from pdf_to_epub_spark.operators import calibration_bins

    rows = (
        [(0.1, False)] * 8 + [(0.1, True)] * 2   # bin 1: conf .1, pos .2
        + [(0.95, True)] * 9 + [(0.95, False)]   # bin 9: conf .95, pos .9
        + [(None, True), (0.5, None), (float("nan"), False)]
    )
    df = spark.createDataFrame(rows, "score double, label boolean")
    got = {r["bin"]: r for r in calibration_bins(df).collect()}
    assert set(got) == {1, 9}
    assert got[1]["n"] == 10 and got[1]["avg_conf"] == 0.1
    assert got[1]["frac_pos"] == 0.2 and got[1]["gap"] == 0.1
    assert got[9]["avg_conf"] == 0.95 and got[9]["frac_pos"] == 0.9
    assert got[9]["gap"] == 0.05
    # ece = (10*.1 + 10*.05)/20 = 0.075, same on both rows
    assert got[1]["ece"] == got[9]["ece"] == 0.075
    # score exactly 1.0 folds into the top bin
    top = calibration_bins(
        spark.createDataFrame([(1.0, True)], "score double, label boolean")
    ).collect()
    assert top[0]["bin"] == 9


def test_session_paths_order_and_truncation(spark):
    from datetime import datetime
    from pdf_to_epub_spark.operators import session_paths

    t0 = datetime(2024, 1, 1)
    rows = [
        # user 1: 3 events; same-ts tie broken by event_id
        (1, 1, t0, "signup"), (2, 1, t0, "view"), (3, 1, datetime(2024, 1, 2), "purchase"),
        # user 2: same path
        (4, 2, t0, "signup"), (5, 2, datetime(2024, 1, 3), "view"),
        (6, 2, datetime(2024, 1, 4), "purchase"),
        # user 3: 7 events, truncated at k=5
        *[(7 + j, 3, datetime(2024, 1, 1 + j), "view") for j in range(7)],
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string")
    got = {r["path"]: r["n_users"] for r in session_paths(df, k=5).collect()}
    assert got["signup>view>purchase"] == 2
    assert got["view>view>view>view>view"] == 1


def test_tracking_params_parse_edges(spark):
    from pdf_to_epub_spark.operators import tracking_params

    df = spark.createDataFrame(
        [
            ("https://a.example/p?sid=1&x=a%3Db#frag",),   # fragment stripped
            ("https://a.example/p?sid=2&flag",),            # valueless param
            ("https://a.example/p?sid=3&x=a=b",),           # '=' in value
            ("https://a.example/plain",),                    # no query at all
            ("https://a.example/p?sid=1",),                  # repeated value
        ],
        "url string",
    )
    got = {r["param"]: r for r in
           tracking_params(df, min_urls=3, card_threshold=0.6).collect()}
    assert set(got) == {"sid", "x", "flag"}
    assert got["sid"]["n_urls"] == 4 and got["sid"]["n_distinct_values"] == 3
    assert got["sid"]["is_tracking"]
    # flag has no '=': NULL value, zero distinct
    assert got["flag"]["n_distinct_values"] == 0
    # x keeps everything after the FIRST '='
    assert got["x"]["n_distinct_values"] == 2
    assert not got["x"]["is_tracking"]


def test_bootstrap_ci_brackets_mean_and_is_deterministic(spark):
    from pdf_to_epub_spark.operators import bootstrap_ci

    df = spark.createDataFrame(
        [(i, 100 + (i * 17) % 50) for i in range(500)], "doc_id long, v long")
    a = bootstrap_ci(df, "v", n_reps=32).collect()[0]
    b = bootstrap_ci(df, "v", n_reps=32).collect()[0]
    assert a == b                       # hash-seeded: fully reproducible
    assert a["n_rows"] == 500 and a["n_reps_effective"] == 32
    assert a["ci_lo"] <= a["mean"] <= a["ci_hi"]
    # interval is tight for 500 rows of a ~±25 spread
    assert a["ci_hi"] - a["ci_lo"] < 10


def test_term_burstiness_separates_clumped_from_even(spark):
    from pdf_to_epub_spark.operators import term_burstiness

    # "even" once in every doc; "clump" 5x in two docs only
    rows = [(i, "even " + ("clump " * 5 if i < 2 else "")) for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["term"]: r for r in term_burstiness(df).collect()}
    assert got["even"]["burstiness"] == 1.0
    assert got["even"]["vmr"] == 0.0          # constant 1 everywhere
    assert got["clump"]["burstiness"] == 5.0
    assert got["clump"]["vmr"] > 1.0           # clumped
    assert got["clump"]["doc_freq"] == 2 and got["clump"]["total_tf"] == 10


def test_embedding_quantize_exact_and_degenerate(spark):
    from pdf_to_epub_spark.operators import embedding_quantize

    df = spark.createDataFrame(
        [
            (1, [1.0, -0.5, 0.25]),     # clean power-of-two ratios
            (2, [0.0, 0.0]),             # zero vector
            (3, []),                      # empty
            (4, None),                    # null
        ],
        "vec_id long, embedding array<float>",
    )
    got = {r["vec_id"]: r for r in embedding_quantize(df).collect()}
    r1 = got[1]
    assert r1["n_dims"] == 3 and r1["scale_nano"] == 10 ** 9
    # codes 127, -64 (round(-63.5) away from zero), 32: max_q = 127
    assert r1["max_q"] == 127
    # err dims: 0, |-0.5 + 64/127|, |0.25 - 32/127| -> small but nonzero
    assert 0 < r1["rel_err"] < 0.01
    assert got[2]["scale_nano"] is None and got[2]["rel_err"] is None
    assert got[3]["n_dims"] == 0 and got[3]["mae_nano"] is None
    assert got[4]["scale_nano"] is None


def test_graph_modularity_good_vs_random_partition(spark):
    from pdf_to_epub_spark.operators import graph_modularity

    # two 5-cliques joined by one bridge
    edges = []
    for base in ("a", "b"):
        for x in range(5):
            for y in range(x + 1, 5):
                edges.append((f"{base}{x}", f"{base}{y}"))
    edges.append(("a0", "b0"))
    e = spark.createDataFrame(edges, "src_domain string, dst_domain string")
    good = spark.createDataFrame(
        [(f"{b}{x}", 0 if b == "a" else 1) for b in "ab" for x in range(5)],
        "domain string, community int",
    )
    bad = spark.createDataFrame(
        [(f"{b}{x}", x % 2) for b in "ab" for x in range(5)],
        "domain string, community int",
    )
    qg = graph_modularity(e, good).collect()[0]["modularity"]
    qb = graph_modularity(e, bad).collect()[0]["modularity"]
    assert qg > 0.4 and qg > qb
    # reversed edge direction must not change the undirected score
    e2 = e.select(F.col("dst_domain").alias("src_domain"),
                  F.col("src_domain").alias("dst_domain"))
    assert graph_modularity(e2, good).collect()[0]["modularity"] == qg


def test_proportion_test_significance_and_guards(spark):
    import pytest as _pt
    from pdf_to_epub_spark.operators import proportion_test

    big = spark.createDataFrame(
        [("a", i % 10 < 6) for i in range(1000)]
        + [("b", i % 10 < 4) for i in range(1000)],
        "group string, success boolean",
    )
    r = proportion_test(big).collect()[0]
    assert r["group_a"] == "a" and r["rate_a"] == 0.6 and r["rate_b"] == 0.4
    assert r["significant"] and r["z"] > 8
    same = spark.createDataFrame(
        [("a", True)] * 5 + [("b", True)] * 5, "group string, success boolean"
    )
    r2 = proportion_test(same).collect()[0]
    assert r2["z"] is None and not r2["significant"]
    with _pt.raises(ValueError):
        proportion_test(big.where(F.col("group") == "a"))


def test_snapshot_expiry_cutoff(spark):
    from pdf_to_epub_spark.operators import snapshot_expiry

    man = spark.createDataFrame(
        [(0, "old_only"), (1, "old_only"),
         (0, "still_live"), (2, "still_live"),
         (2, "new_only"), (1, "mid")],
        "snapshot_id long, path string",
    )
    got = {r["path"]: r for r in snapshot_expiry(man, keep_last=2).collect()}
    # kept snapshots: {1, 2}
    assert got["old_only"]["action"] == "keep"      # snap 1 is kept
    assert got["still_live"]["action"] == "keep"
    assert got["new_only"]["action"] == "keep"
    assert got["mid"]["action"] == "keep"
    got1 = {r["path"]: r for r in snapshot_expiry(man, keep_last=1).collect()}
    # only snapshot 2 kept
    assert got1["old_only"]["action"] == "delete"
    assert got1["mid"]["action"] == "delete"
    assert got1["still_live"]["action"] == "keep"
    assert got1["still_live"]["n_refs"] == 2


def test_extract_lists_nesting_and_empty(spark):
    from pdf_to_epub_spark.operators import extract_lists

    pages = spark.createDataFrame(
        [
            (1, b"<ul><li>a</li><li>b</li></ul>"),
            (2, b"<ol><li>1</li></ol><ul><li>u</li></ul>"),   # two lists
            (3, b"<ul></ul>"),                                   # empty list
            (4, b"plain"),
            (5, None),
        ],
        "doc_id long, html binary",
    )
    rows = extract_lists(pages).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert [r["item_text"] for r in sorted(by_doc[1], key=lambda r: r["item_id"])] == ["a", "b"]
    assert not by_doc[1][0]["ordered"]
    d2 = sorted(by_doc[2], key=lambda r: (r["list_id"], r["item_id"]))
    assert [(r["list_id"], r["ordered"], r["item_text"]) for r in d2] == [
        (0, True, "1"), (1, False, "u")]
    assert 3 not in by_doc and 4 not in by_doc and 5 not in by_doc


def test_change_rate_windows(spark):
    from pdf_to_epub_spark.operators import change_rate

    obs = spark.createDataFrame(
        [("u", 0, "a"), ("u", 1, "a"), ("u", 2, "b"), ("u", 3, "b"),
         ("v", 0, "x"), ("v", 1, "y"), ("v", 2, "x"),
         ("w", 5, "only")],
        "url string, snap_id long, content_md5 string",
    )
    got = {r["url"]: r for r in change_rate(obs).collect()}
    assert got["u"]["n_changes"] == 1 and abs(got["u"]["change_rate"] - 1 / 3) < 1e-6
    assert got["v"]["n_changes"] == 2 and got["v"]["change_rate"] == 1.0
    assert got["w"]["n_obs"] == 1 and got["w"]["change_rate"] is None


def test_skipgram_pairs_window_and_cut(spark):
    from pdf_to_epub_spark.operators import skipgram_pairs

    df = spark.createDataFrame(
        [("alpha beta gamma alpha",), ("alpha beta",)], "text string")
    got = {(r["term_a"], r["term_b"]): r["n_cooc"] for r in
           skipgram_pairs(df, window=2, top=10, min_count=1).collect()}
    # doc1 window-2 pairs: (a,b) (a,g) (b,g) (b,a) (g,a); doc2: (a,b)
    assert got[("alpha", "beta")] == 3
    assert got[("alpha", "gamma")] == 2
    assert got[("beta", "gamma")] == 1
    # window 1 = adjacent only
    adj = {(r["term_a"], r["term_b"]): r["n_cooc"] for r in
           skipgram_pairs(df, window=1, top=10, min_count=1).collect()}
    assert adj == {("alpha", "beta"): 2, ("beta", "gamma"): 1,
                   ("alpha", "gamma"): 1}


# ---------------------------------------------------------------- kappa


def _kappa_rows():
    """3 raters, 40 items; r2 skips every 6th item, r1 disagrees on every
    5th — variable n_i and skewed-but-correlated marginals."""
    rows = []
    for i in range(40):
        true = i % 3
        for r in range(3):
            if r == 2 and i % 6 == 0:
                continue
            lab = (true + 1) % 3 if (r == 1 and i % 5 == 0) else true
            rows.append((i, f"r{r}", f"L{lab}"))
    return rows


def test_cohen_kappa_pairs_exact(spark):
    from collections import Counter
    from itertools import combinations

    from pdf_to_epub_spark.operators import cohen_kappa_pairs

    rows = _kappa_rows()
    df = spark.createDataFrame(rows, "item_id int, rater string, label string")
    got = {
        (r.rater_a, r.rater_b): r
        for r in cohen_kappa_pairs(df).collect()
    }
    by_item: dict[int, dict[str, str]] = {}
    for i, r, l in rows:
        by_item.setdefault(i, {})[r] = l
    for ra, rb in combinations(["r0", "r1", "r2"], 2):
        co = [(d[ra], d[rb]) for d in by_item.values() if ra in d and rb in d]
        n, agree = len(co), sum(1 for a, b in co if a == b)
        ca = Counter(a for a, _ in co)
        cb = Counter(b for _, b in co)
        sab = sum(ca[l] * cb.get(l, 0) for l in ca)
        row = got[(ra, rb)]
        assert (row.n_items, row.n_agree) == (n, agree)
        assert row.po == round(agree / n, 6)
        assert row.pe == round(sab / (n * n), 6)
        assert row.kappa == round((n * agree - sab) / (n * n - sab), 6)


def test_cohen_kappa_constant_raters_null(spark):
    """Both raters constant on the same label → pe = 1, kappa undefined
    (NULL), never 0/0 or a fake 1.0."""
    from pdf_to_epub_spark.operators import cohen_kappa_pairs

    rows = [(i, r, "L0") for i in range(5) for r in ("a", "b")]
    df = spark.createDataFrame(rows, "item_id int, rater string, label string")
    r = cohen_kappa_pairs(df).collect()[0]
    assert r.po == 1.0 and r.pe == 1.0 and r.kappa is None


def test_fleiss_kappa_exact_and_exclusion(spark):
    from collections import Counter

    from pdf_to_epub_spark.operators import fleiss_kappa

    rows = _kappa_rows() + [(999, "r9", "L0")]  # n_i = 1 → excluded
    df = spark.createDataFrame(rows, "item_id int, rater string, label string")
    got = fleiss_kappa(df).collect()[0]

    by_item: dict[int, dict[str, str]] = {}
    for i, r, l in rows:
        by_item.setdefault(i, {})[r] = l
    items = [d for d in by_item.values() if len(d) >= 2]
    n_ratings = sum(len(d) for d in items)
    sum_p_nano = 0
    for d in items:
        cnt = Counter(d.values())
        ni = len(d)
        ssq = sum(v * v for v in cnt.values())
        sum_p_nano += (ssq - ni) * 10**9 // (ni * (ni - 1))
    p_bar = sum_p_nano / (len(items) * 1e9)
    cj = Counter(l for d in items for l in d.values())
    p_e = sum(v * v for v in cj.values()) / (n_ratings * n_ratings)
    assert got.n_items == len(items)
    assert got.n_ratings == n_ratings
    assert got.p_bar == round(p_bar, 6)
    assert got.p_e == round(p_e, 6)
    assert got.kappa == round((p_bar - p_e) / (1 - p_e), 6)


def test_fleiss_kappa_perfect_agreement(spark):
    from pdf_to_epub_spark.operators import fleiss_kappa

    rows = [(i, f"r{r}", f"L{i % 2}") for i in range(6) for r in range(3)]
    df = spark.createDataFrame(rows, "item_id int, rater string, label string")
    r = fleiss_kappa(df).collect()[0]
    assert r.p_bar == 1.0 and r.kappa == 1.0


def test_krippendorff_alpha_exact(spark):
    """Pair-enumeration brute force (ordered within-unit pairs weighted
    1/(n_u-1)) reproduces the operator bit-for-bit, including the
    n_i<2 exclusion."""
    from collections import Counter

    from pdf_to_epub_spark.operators import krippendorff_alpha

    rows = _kappa_rows() + [(999, "r9", "L0")]
    df = spark.createDataFrame(rows, "item_id int, rater string, label string")
    got = krippendorff_alpha(df).collect()[0]

    by_item: dict[int, dict[str, str]] = {}
    for i, r, l in rows:
        by_item.setdefault(i, {})[r] = l
    units = [d for d in by_item.values() if len(d) >= 2]
    n_total = sum(len(d) for d in units)
    do_nano = 0
    for d in units:
        labs = list(d.values())
        nu = len(labs)
        dis = sum(
            1
            for i in range(nu)
            for j in range(nu)
            if i != j and labs[i] != labs[j]
        )
        do_nano += dis * 10**9 // (nu - 1)
    d_o = do_nano / (n_total * 1e9)
    nc = Counter(l for d in units for l in d.values())
    d_e = (n_total * n_total - sum(v * v for v in nc.values())) / (
        n_total * (n_total - 1)
    )
    assert got.n_items == len(units) and got.n_ratings == n_total
    assert got.d_o == round(d_o, 6)
    assert got.d_e == round(d_e, 6)
    assert got.alpha == round(1 - d_o / d_e, 6)


def test_krippendorff_alpha_canonical_edges(spark):
    from pdf_to_epub_spark.operators import krippendorff_alpha

    # one unit, two raters disagreeing: D_o = D_e = 1 → alpha = 0
    df = spark.createDataFrame(
        [(1, "a", "X"), (1, "b", "Y")],
        "item_id int, rater string, label string",
    )
    r = krippendorff_alpha(df).collect()[0]
    assert (r.d_o, r.d_e, r.alpha) == (1.0, 1.0, 0.0)
    # perfect agreement across two units → alpha = 1
    df2 = spark.createDataFrame(
        [(1, "a", "X"), (1, "b", "X"), (2, "a", "Y"), (2, "b", "Y")],
        "item_id int, rater string, label string",
    )
    r2 = krippendorff_alpha(df2).collect()[0]
    assert (r2.d_o, r2.alpha) == (0.0, 1.0)
    # single-label corpus: D_e = 0 → alpha NULL (undefined, not 1)
    df3 = spark.createDataFrame(
        [(1, "a", "X"), (1, "b", "X")],
        "item_id int, rater string, label string",
    )
    r3 = krippendorff_alpha(df3).collect()[0]
    assert r3.d_e == 0.0 and r3.alpha is None


# ------------------------------------------------------------ stylometry


def test_burrows_delta_exact(spark):
    """Pure-Python replica (same nano/micro quantization) reproduces the
    operator bit-for-bit on a 3-group corpus."""
    import math
    import re
    from collections import Counter
    from itertools import combinations

    from pdf_to_epub_spark.operators import burrows_delta

    texts = {
        "g0": ["the cat and the dog sat on the mat",
               "a dog and a cat met the fox"],
        "g1": ["the the the cat cat runs fast and far",
               "of the people by the people"],
        "g2": ["quantum flux of strange quarks and the gluon sea",
               "she sells sea shells by the sea shore"],
    }
    rows = [(g, t) for g, ts in texts.items() for t in ts]
    df = spark.createDataFrame(rows, "group string, text string")
    got = {
        (r.group_a, r.group_b): (r.n_words, r.delta)
        for r in burrows_delta(df, top_words=8, max_groups=3).collect()
    }

    tok = lambda s: re.findall(r"[a-zà-öø-ÿ]+", s.lower())  # noqa: E731
    counts = {g: Counter() for g in texts}
    for g, ts in texts.items():
        for t in ts:
            counts[g].update(tok(t))
    totals = {g: sum(c.values()) for g, c in counts.items()}
    groups = sorted(texts, key=lambda g: (-totals[g], g))[:3]
    wc = Counter()
    for g in groups:
        wc.update(counts[g])
    words = sorted(wc, key=lambda w: (-wc[w], w))[:8]
    n_g = len(groups)
    f = {
        (g, w): counts[g][w] * 10**9 // totals[g]
        for g in groups
        for w in words
    }
    for a, b in combinations(sorted(groups), 2):
        s = 0
        weff = 0
        for w in words:
            fs = [f[(g, w)] for g in groups]
            sf, sf2 = sum(fs), sum(x * x for x in fs)
            den = math.sqrt(n_g * sf2 - sf * sf)
            if den > 0:
                weff += 1
                s += math.floor(
                    1e6
                    * abs((f[(a, w)] * n_g - sf) - (f[(b, w)] * n_g - sf))
                    / den
                )
        assert got[(a, b)] == (weff, round(s / (weff * 1e6), 6))


def test_burrows_delta_caps_and_zero_variance(spark):
    from pdf_to_epub_spark.operators import burrows_delta

    # identical relative frequencies everywhere → every word has zero
    # variance → n_words = 0, delta NULL (undefined, not 0)
    same = spark.createDataFrame(
        [("a", "x y"), ("b", "x y"), ("c", "x y")], "group string, text string"
    )
    rows = burrows_delta(same, top_words=5, max_groups=3).collect()
    assert len(rows) == 3
    assert all(r.n_words == 0 and r.delta is None for r in rows)

    # max_groups keeps the top-volume groups only (tie-break: name asc)
    df = spark.createDataFrame(
        [("big", "a b c d e f"), ("mid", "a b c"), ("tiny", "a")],
        "group string, text string",
    )
    pairs = burrows_delta(df, top_words=5, max_groups=2).collect()
    assert len(pairs) == 1
    assert (pairs[0].group_a, pairs[0].group_b) == ("big", "mid")


# ------------------------------------------------------------- isotonic


def test_isotonic_calibration_pav_equals_gcm(spark):
    """The operator's PAV merge equals the greatest-convex-minorant
    slopes of the cumulative diagram (independent derivation), per
    group, and the fit is monotone non-decreasing."""
    from fractions import Fraction

    from pdf_to_epub_spark.operators import isotonic_calibration

    rows = []
    for i in range(800):
        s = (i % 40) / 40.0
        lab = (i * 7919) % 100 < 10 + ((i % 40) * 2)
        rows.append((f"src{i % 2}", s, lab))
    df = spark.createDataFrame(rows, "source string, score double, label boolean")
    cal = isotonic_calibration(df, group_col="source", bins=10).collect()

    from collections import defaultdict

    bd = defaultdict(dict)
    for g, s, l in rows:
        b = min(max(int(s * 10), 0), 9)
        n, p = bd[g].get(b, (0, 0))
        bd[g][b] = (n + 1, p + (1 if l else 0))
    for g, cells in bd.items():
        order = sorted(cells)
        pts = [(0, 0)]
        cx = cy = 0
        for b in order:
            cx += cells[b][0]
            cy += cells[b][1]
            pts.append((cx, cy))
        hull = []
        for pt in pts:
            while len(hull) >= 2:
                (x1, y1), (x2, y2) = hull[-2], hull[-1]
                if (x2 - x1) * (pt[1] - y1) <= (pt[0] - x1) * (y2 - y1):
                    hull.pop()
                else:
                    break
            hull.append(pt)
        seg = 0
        cx = 0
        fit = {}
        for b in order:
            cx += cells[b][0]
            while seg + 1 < len(hull) and hull[seg + 1][0] < cx:
                seg += 1
            (x1, y1), (x2, y2) = hull[seg], hull[seg + 1]
            fit[b] = round(float(Fraction(y2 - y1, x2 - x1)), 6)
        mine = sorted((r for r in cal if r.source == g), key=lambda r: r.bin)
        assert [r.p_cal for r in mine] == [fit[r.bin] for r in mine]
        assert all(
            a.p_cal <= b.p_cal + 1e-12 for a, b in zip(mine, mine[1:])
        )
        # n/n_pos are the raw (unpooled) bin counts
        assert {(r.bin, r.n, r.n_pos) for r in mine} == {
            (b, cells[b][0], cells[b][1]) for b in order
        }


def test_isotonic_calibration_edges(spark):
    from pdf_to_epub_spark.operators import isotonic_calibration

    # strictly decreasing means pool to one global block
    df = spark.createDataFrame(
        [(0.1, True)] * 3 + [(0.9, False)] * 3, "score double, label boolean"
    )
    rows = isotonic_calibration(df, bins=4).collect()
    assert {r.p_cal for r in rows} == {0.5}
    # NULL scores/labels excluded; out-of-range scores clamp to edge bins
    df2 = spark.createDataFrame(
        [(None, True), (0.5, None), (-3.0, False), (7.0, True)],
        "score double, label boolean",
    )
    rows2 = isotonic_calibration(df2, bins=4).collect()
    assert {(r.bin, r.n) for r in rows2} == {(0, 1), (3, 1)}


def test_negative_sampling_table_exact(spark):
    """Replica check: unigram^0.75 via double-sqrt, micro floor, exact
    largest-remainder; slots sum to exactly table_size."""
    import math
    from collections import Counter

    from pdf_to_epub_spark.operators.ir import negative_sampling_table

    docs = [
        "the the the the cat sat on on the mat mat",
        "the dog and the cat and a bird",
    ]
    df = spark.createDataFrame([(t,) for t in docs], "text string")
    out = negative_sampling_table(df, table_size=100, k=5).collect()
    c = Counter(w for t in docs for w in t.split())
    top = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
    w = {
        k: math.floor(1e6 * math.sqrt(math.sqrt(float(n * n * n))))
        for k, n in top
    }
    tot = sum(w.values())
    base = {k: 100 * v // tot for k, v in w.items()}
    rem = {k: 100 * v % tot for k, v in w.items()}
    left = 100 - sum(base.values())
    for k in sorted(w, key=lambda k: (-rem[k], k))[:left]:
        base[k] += 1
    assert {r.word: (r.n, r.w_micro, r.slots) for r in out} == {
        k: (n, w[k], base[k]) for k, n in top
    }
    assert sum(r.slots for r in out) == 100


def test_isotonic_calibration_nan_and_cell_guard(spark):
    from pdf_to_epub_spark.operators import isotonic_calibration

    df = spark.createDataFrame(
        [(0.05, True), (float("nan"), True), (0.05, False)],
        "score double, label boolean",
    )
    rows = isotonic_calibration(df, bins=4).collect()
    # NaN row excluded: bin 0 holds exactly the two real rows
    assert [(r.bin, r.n, r.n_pos) for r in rows] == [(0, 2, 1)]

    import pytest as _pytest

    big = spark.range(0, 50).selectExpr(
        "cast(id as string) AS g", "0.5 AS score", "id % 2 = 0 AS label"
    )
    with _pytest.raises(ValueError, match="max_cells"):
        isotonic_calibration(big, group_col="g", bins=4, max_cells=10)


def test_burrows_delta_plan_shape(spark):
    """Scale pins: the corpus token stream is exploded ONCE (everything
    after the (group, word) count runs on slim aggregates), top-k
    selection compiles to TakeOrdered (never a single-partition global
    window), and the group/word panels join back by broadcast."""
    from pdf_to_epub_spark.operators import burrows_delta

    df = spark.createDataFrame(
        [("a", "x y z"), ("b", "x q r")], "group string, text string"
    )
    plan = (
        burrows_delta(df, top_words=5, max_groups=2)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # the tokenize+count subtree lives behind the counts checkpoint
    # boundary, so the downstream plan re-explodes the corpus ZERO times
    # (pre-fix it appeared 20× — once per DAG branch)
    assert plan.count("Generate explode") <= 1, plan[:3000]
    assert "TakeOrderedAndProject" in plan, plan[:3000]
    assert plan.count("BroadcastHashJoin") >= 2, plan[:3000]


def test_negative_sampling_plan_bounded_topk(spark):
    from pdf_to_epub_spark.operators.ir import negative_sampling_table

    df = spark.createDataFrame([("x y x",)], "text string")
    plan = (
        negative_sampling_table(df, table_size=10, k=2)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # the vocab (TakeOrdered top-k) lives behind the lazy checkpoint that
    # lets allocate_budget's collect and the final join share ONE corpus
    # word count — so the downstream plan never re-tokenizes
    assert "regexp_extract_all" not in plan, plan[:3000]


def test_eval_distinct_value_cumulatives_are_range_partitioned(spark):
    """r6: AUC / KS / rank cumulative sums over distinct-value tables run
    through bucketing.global_prefix_sums (repartitionByRange + keyed
    windows), not an unpartitioned Window — the corpus-sized-caller
    foot-gun flagged in the r5 verdict.  Values pinned on an all-distinct
    continuous input (the worst case for the old single-task window)."""
    import random

    from pyspark.sql import functions as F

    from pdf_to_epub_spark.operators.evaluate import (
        binary_classifier_eval,
        rank_agreement,
        score_drift_ks,
    )

    rng = random.Random(11)
    # all-distinct float margins: |distinct| == n
    rows = [(i, rng.random() < 0.5, rng.random() * 2 - 1) for i in range(500)]
    df = spark.createDataFrame(rows, "id long, truth boolean, m double")

    ev = binary_classifier_eval(df, margin_col="m")
    # the prefix-sum machinery's checkpoint scan carries its _gs_pid
    # partition-id column — the visible marker that the cumulative ran
    # through repartitionByRange (the range exchange itself sits below
    # the lazy checkpoint, outside the public plan)
    plan = ev._jdf.queryExecution().executedPlan().toString()
    assert "_gs_pid" in plan

    got = ev.collect()[0]
    import bisect

    pos = sorted(m for _, t, m in rows if t)
    neg = sorted(m for _, t, m in rows if not t)
    u = sum(bisect.bisect_left(neg, p) for p in pos)  # distinct -> no ties
    assert got["auc"] == round(u / (len(pos) * len(neg)), 6)

    a = spark.createDataFrame(
        [(i, rng.random()) for i in range(300)], "id long, v double"
    )
    b = spark.createDataFrame(
        [(i, rng.random() + 0.2) for i in range(200)], "id long, v double"
    )
    ks = score_drift_ks(a, b)
    plan = ks._jdf.queryExecution().executedPlan().toString()
    assert "_gs_pid" in plan
    got = ks.collect()[0]
    va = sorted(r["v"] for r in a.collect())
    vb = sorted(r["v"] for r in b.collect())
    pooled = sorted(set(va) | set(vb))
    d = max(
        abs(
            bisect.bisect_right(va, v) / len(va)
            - bisect.bisect_right(vb, v) / len(vb)
        )
        for v in pooled
    )
    assert got["d_stat"] == round(d, 6)
    assert got["n_a"] == 300 and got["n_b"] == 200

    ra = spark.createDataFrame(
        [(i, rng.random(), rng.random()) for i in range(250)],
        "doc_id long, score_a double, score_b double",
    )
    r = rank_agreement(ra)
    plan = r._jdf.queryExecution().executedPlan().toString()
    assert "_gs_pid" in plan
    row = r.collect()[0]
    assert row["n"] == 250 and -1.0 <= row["rho"] <= 1.0
