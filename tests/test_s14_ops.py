"""Unit tests for r4-s14 operators: entropy / recursive-(c,l) diversity,
Spearman rank correlation, Min-K% Prob membership audit."""

from __future__ import annotations

import math

from pyspark.sql import functions as F


def test_diversity_audit_entropy_and_recursive(spark):
    from pdf_to_epub_spark.operators.privacy import diversity_audit

    # class a: 98/1/1 — distinct-l=3 would PASS, both strong tests fail.
    # class b: 3/3/3 uniform — entropy == ln(3) exactly (boundary >=),
    # recursive: r1=3 < c*(r_3)=2*3.
    rows = (
        [("a", "x")] * 98 + [("a", "y")] + [("a", "z")]
        + [("b", "x")] * 3 + [("b", "y")] * 3 + [("b", "z")] * 3
    )
    df = spark.createDataFrame(rows, "g string, v string")
    out = {r.g: r for r in diversity_audit(df, ["g"], "v", l=3, c=2).collect()}
    ent_a = sum(
        round(-(c / 100) * math.log(c / 100) * 1e6) for c in (98, 1, 1)
    )
    assert out["a"].entropy_micro == ent_a
    assert not out["a"].entropy_l_diverse
    assert out["a"].top_count == 98 and out["a"].tail_sum == 1
    assert not out["a"].recursive_cl_diverse
    # uniform class sits EXACTLY on the ln(l) threshold — >= must pass
    assert out["b"].entropy_micro == round(math.log(3) * 1e6)
    assert out["b"].entropy_l_diverse
    assert out["b"].recursive_cl_diverse


def test_diversity_audit_fewer_values_than_l(spark):
    from pdf_to_epub_spark.operators.privacy import diversity_audit

    # d=2 < l=3: tail slice empty, recursive must fail regardless of c
    df = spark.createDataFrame(
        [("a", "x")] * 5 + [("a", "y")] * 5, "g string, v string"
    )
    r = diversity_audit(df, ["g"], "v", l=3, c=100).collect()[0]
    assert r.n_sensitive == 2
    assert r.tail_sum == 0
    assert not r.recursive_cl_diverse


def test_spearman_monotone_nonlinear(spark):
    from pdf_to_epub_spark.operators import (
        rank_correlations,
        signal_correlations,
    )

    # y = x^3 is monotone but nonlinear: rho == 1, Pearson r < 1;
    # z = -x gives rho == -1.
    df = spark.createDataFrame(
        [(float(i), float(i**3), float(-i)) for i in range(1, 30)],
        "a double, b double, c double",
    )
    rho = {
        (r.signal_a, r.signal_b): r.r
        for r in rank_correlations(df, ("a", "b", "c")).collect()
    }
    r_lin = {
        (r.signal_a, r.signal_b): r.r
        for r in signal_correlations(df, ("a", "b", "c")).collect()
    }
    assert rho[("a", "b")] == 1.0
    assert rho[("a", "c")] == -1.0
    assert r_lin[("a", "b")] < 1.0


def test_spearman_tie_averaged_ranks(spark):
    from pdf_to_epub_spark.operators import rank_correlations

    # a = [1,1,2] -> avg ranks [1.5, 1.5, 3]; b = [3,5,4] -> [1,3,2];
    # hand Pearson over those ranks.
    df = spark.createDataFrame(
        [(1.0, 3.0), (1.0, 5.0), (2.0, 4.0)], "a double, b double"
    )
    got = rank_correlations(df, ("a", "b")).collect()[0].r
    ra, rb = [1.5, 1.5, 3.0], [1.0, 3.0, 2.0]
    n = 3
    sx, sy = sum(ra), sum(rb)
    sxx = sum(x * x for x in ra)
    syy = sum(y * y for y in rb)
    sxy = sum(x * y for x, y in zip(ra, rb))
    want = round(
        (n * sxy - sx * sy)
        / (math.sqrt(n * sxx - sx * sx) * math.sqrt(n * syy - sy * sy)),
        6,
    )
    assert got == want


def test_spearman_constant_column_null(spark):
    from pdf_to_epub_spark.operators import rank_correlations

    df = spark.createDataFrame(
        [(float(i), 5.0) for i in range(10)], "a double, b double"
    )
    assert rank_correlations(df, ("a", "b")).collect()[0].r is None


def test_mink_prob_k100_equals_total(spark):
    from pdf_to_epub_spark.operators import (
        kn_bigram_scores,
        mink_prob_scores,
        train_kn_bigram,
    )

    docs = spark.createDataFrame(
        [(i, "the cat sat on the mat while the dog ran " * (i + 1))
         for i in range(4)] + [(9, "")],
        "doc_id long, text string",
    )
    model = train_kn_bigram(docs, vocab_size=8)
    tot = {
        r.doc_id: r
        for r in kn_bigram_scores(docs, model, vocab_size=8).collect()
    }
    mk = {
        r.doc_id: r
        for r in mink_prob_scores(
            docs, model, vocab_size=8, k_pct=100
        ).collect()
    }
    for i in tot:
        assert mk[i].mink_cost_micro == tot[i].cost_micro_total
        assert mk[i].mink_n == tot[i].n_bigrams


def test_mink_prob_selects_worst_fifth(spark):
    from pdf_to_epub_spark.operators import mink_prob_scores, train_kn_bigram

    docs = spark.createDataFrame(
        [(i, "the cat sat on the mat while the dog ran " * (i + 1))
         for i in range(4)] + [(9, "")],
        "doc_id long, text string",
    )
    model = train_kn_bigram(docs, vocab_size=8)
    out = {
        r.doc_id: r
        for r in mink_prob_scores(
            docs, model, vocab_size=8, k_pct=20
        ).collect()
    }
    for i, r in out.items():
        # exact ceil(n * 20 / 100)
        assert r.mink_n == -(-r.n_bigrams * 20 // 100)
    # empty doc: all-zero integers, NULL mean
    assert out[9].n_bigrams == 0 and out[9].mink_n == 0
    assert out[9].mink_cost_micro == 0 and out[9].mink_mean_nats is None
    # the min-k mean is >= the overall mean cost (worst slice by def.)
    from pdf_to_epub_spark.operators import kn_bigram_scores

    tot = {
        r.doc_id: r
        for r in kn_bigram_scores(docs, model, vocab_size=8).collect()
    }
    for i in (0, 1, 2, 3):
        overall = tot[i].cost_micro_total / tot[i].n_bigrams
        assert out[i].mink_cost_micro / out[i].mink_n >= overall


def test_global_prefix_sums_weighted(spark):
    from pdf_to_epub_spark.operators import global_prefix_sums

    df = spark.createDataFrame(
        [(10, 3), (20, 5), (30, 2), (40, 7)], "v int, w int"
    )
    got = {
        r.v: r._cum
        for r in global_prefix_sums(df, ["v"], "w", num_partitions=3)
        .collect()
    }
    assert got == {10: 0, 20: 3, 30: 8, 40: 10}


def test_hrw_minimal_movement(spark):
    from pdf_to_epub_spark.operators import hrw_shards

    ids = spark.createDataFrame([(i,) for i in range(2000)], "doc_id long")
    a8 = {r.doc_id: r.shard for r in hrw_shards(ids, 8).collect()}
    a9 = {r.doc_id: r.shard for r in hrw_shards(ids, 9).collect()}
    moved = [i for i in a8 if a8[i] != a9[i]]
    # ~1/9 of keys move, ALL of them to the new shard — the rendezvous
    # property h%n lacks (where ~8/9 would move)
    assert 2000 / 9 * 0.6 < len(moved) < 2000 / 9 * 1.6
    assert all(a9[i] == 8 for i in moved)
    # and the n=8 assignment is roughly uniform
    from collections import Counter

    sizes = Counter(a8.values())
    assert len(sizes) == 8 and min(sizes.values()) > 2000 / 8 * 0.6


def test_paired_bootstrap_exact_and_null_delta(spark):
    from pdf_to_epub_spark.operators.sampling import paired_bootstrap

    # constant delta 2.0: every replicate mean is exactly 2
    df = spark.createDataFrame(
        [(i, float(i % 7 + 10), float(i % 7 + 8)) for i in range(500)],
        "doc_id long, a double, b double",
    )
    r = paired_bootstrap(df, "a", "b").collect()[0]
    assert r.mean_delta == 2.0 and r.win_rate == 1.0
    assert r.ci_lo == 2.0 and r.ci_hi == 2.0
    # symmetric noise: CI straddles 0, win_rate strictly inside (0,1)
    df2 = spark.createDataFrame(
        [(i, float(i % 2), float((i + 1) % 2)) for i in range(500)],
        "doc_id long, a double, b double",
    )
    r2 = paired_bootstrap(df2, "a", "b").collect()[0]
    assert r2.ci_lo < 0 < r2.ci_hi
    assert 0.0 < r2.win_rate < 1.0


def test_kn_arpa_reproduces_scorer(spark):
    from pdf_to_epub_spark.operators import (
        kn_arpa_table,
        kn_bigram_scores,
        train_kn_bigram,
    )

    docs = spark.createDataFrame(
        [(i, "the cat sat on the mat while the dog ran " * (i + 1))
         for i in range(4)],
        "doc_id long, text string",
    )
    model = train_kn_bigram(docs, vocab_size=8)
    arpa = {r.ngram: r for r in kn_arpa_table(model).collect()}
    # seen bigram: ARPA logp is exactly -cost
    probe = spark.createDataFrame(
        [(101, "cat sat")], "doc_id long, text string"
    )
    got = kn_bigram_scores(probe, model, vocab_size=8).collect()[0]
    assert -arpa["cat sat"].logp_micro_nats == got.cost_micro_total
    # unseen bigram: backoff(w1) + logp_cont(w2) reproduces the scorer
    # up to the one extra rounding (two quantized logs vs one)
    assert "cat dog" not in arpa
    probe2 = spark.createDataFrame(
        [(100, "cat dog")], "doc_id long, text string"
    )
    got2 = kn_bigram_scores(probe2, model, vocab_size=8).collect()[0]
    via_backoff = -(
        arpa["cat"].backoff_micro_nats + arpa["dog"].logp_micro_nats
    )
    assert abs(via_backoff - got2.cost_micro_total) <= 2
    # orders present and <unk> exported
    assert "<unk>" in arpa and arpa["<unk>"].ngram_order == 1


def test_wordpiece_greedy_longest_match(spark):
    from pdf_to_epub_spark.operators.textstats import (
        wordpiece_encode_symbols,
    )

    # vocab: "un" "##able" "##a" "##b" "##l" "##e" "u" "##n" ...
    vocab = ["un", "##able", "##a", "##b", "##l", "##e", "u", "##n",
             "able", "x"]
    df = spark.createDataFrame(
        [("unable unable able",), ("xq",)], "text string"
    )
    out = {r.symbol: r for r in wordpiece_encode_symbols(df, vocab).collect()}
    # "unable" -> un + ##able (longest match, not u/##n/##a/##b/##l/##e)
    assert out["un"].n_words == 1 and out["un"].occurrences == 2
    assert out["##able"].occurrences == 2
    # "able" alone -> the start-form piece
    assert out["able"].occurrences == 1
    # "xq": x matches, q has no ##q piece -> whole word [UNK]
    assert out["[UNK]"].n_words == 1 and out["[UNK]"].occurrences == 1
    assert "##q" not in out and "q" not in out


def test_t_closeness_deviation_vs_global(spark):
    from pdf_to_epub_spark.operators.privacy import t_closeness_audit

    # global: x/y 50:50.  class a: all x -> TVD = 0.5 (not close at
    # t=0.2); class b: 50/50 -> TVD = 0 (close).
    rows = [("a", "x")] * 10 + [("b", "x")] * 5 + [("b", "y")] * 15
    # rebalance: make global exactly 50/50 -> a:10x, b:10x+20y? keep it
    # simple and compute the expected value instead.
    rows = [("a", "x")] * 10 + [("b", "x")] * 10 + [("b", "y")] * 20
    df = spark.createDataFrame(rows, "g string, v string")
    out = {r.g: r for r in t_closeness_audit(df, ["g"], "v", t=0.2).collect()}
    # global: x=20, y=20, N=40.  class a (n=10, all x):
    # TVD = 0.5*(|1-0.5| + |0-0.5|) = 0.5
    assert out["a"].tvd_micro == 500000 and not out["a"].t_close
    # class b (n=30): x 10/30 vs 0.5, y 20/30 vs 0.5 ->
    # 0.5*(|1/3-1/2| + |2/3-1/2|) = 1/6
    assert out["b"].tvd_micro == round(1e6 / 6)
    assert out["b"].t_close  # 166667 <= 200000


def test_t_closeness_null_sensitive_and_quasi(spark):
    from pdf_to_epub_spark.operators.privacy import t_closeness_audit

    # NULL is a real sensitive category and a real quasi cell: a class
    # matching the global x/NULL 50:50 split must be exactly t-close 0
    rows = [("a", "x"), ("a", None), ("a", "x"), ("a", None),
            (None, "x"), (None, None)]
    df = spark.createDataFrame(rows, "g string, v string")
    out = {r.g: r for r in t_closeness_audit(df, ["g"], "v", t=0.2).collect()}
    assert out["a"].tvd_micro == 0 and out["a"].t_close
    # NULL-quasi class (50/50 too) must also resolve, not orphan
    assert out[None].tvd_micro == 0 and out[None].t_close


def test_wordpiece_repeated_symbol_counts_word_once(spark):
    from pdf_to_epub_spark.operators import wordpiece_encode_symbols

    # 'letter' with a char-only vocab -> ##t appears twice in ONE word:
    # occurrences = 2, n_words = 1 (countDistinct)
    vocab = ["l", "##e", "##t", "##r"]
    df = spark.createDataFrame([("letter",)], "text string")
    out = {r.symbol: r for r in wordpiece_encode_symbols(df, vocab).collect()}
    assert out["##t"].occurrences == 2 and out["##t"].n_words == 1
    assert out["##e"].occurrences == 2 and out["##e"].n_words == 1


def test_variant_fields_open_schema(spark):
    from pdf_to_epub_spark.operators.analytics import variant_fields

    df = spark.createDataFrame(
        [
            (1, '{"k": 7, "meta": {"lang": "en"}, "tags": ["a", "b"]}'),
            (2, '{"k": bad'),                 # corrupt
            (3, '{"meta": {"lang": "fr"}}'),  # valid, fields missing
            (4, '{"k": "not-an-int"}'),       # type mismatch -> NULL
            (5, None),                        # absent, NOT corrupt
        ],
        "id int, props string",
    )
    out = {
        r.id: r
        for r in variant_fields(
            df,
            "props",
            {
                "k": ("$.k", "bigint"),
                "lang": ("$.meta.lang", "string"),
                "tag1": ("$.tags[1]", "string"),
            },
            keep=("id",),
        ).collect()
    }
    assert out[1].k == 7 and out[1].lang == "en" and out[1].tag1 == "b"
    assert out[2].corrupt and out[2].variant_schema is None
    # corrupt vs valid-but-missing stay distinguishable
    assert not out[3].corrupt and out[3].k is None and out[3].lang == "fr"
    assert "meta" in out[3].variant_schema
    # try_variant_get: type mismatch is NULL, not an error
    assert not out[4].corrupt and out[4].k is None
    # NULL input is absent, not corrupt (review finding)
    assert not out[5].corrupt and out[5].k is None
    assert out[5].variant_schema is None


def test_cramers_v_extremes(spark):
    from pdf_to_epub_spark.operators.evaluate import cramers_v

    # perfect association: b == a -> V = 1
    df = spark.createDataFrame(
        [(x, x) for x in ["p", "q", "r"] * 10], "a string, b string"
    )
    r = cramers_v(df, "a", "b").collect()[0]
    assert r.v_micro == 1_000_000
    # independence: uniform product grid -> chi2 = 0 -> V = 0
    df2 = spark.createDataFrame(
        [(x, y) for x in ["p", "q"] for y in ["u", "v"] for _ in range(5)],
        "a string, b string",
    )
    r2 = cramers_v(df2, "a", "b").collect()[0]
    assert r2.chi2_nano == 0 and r2.v_micro == 0
    # degenerate single-level factor -> NULL V (m = 0)
    df3 = spark.createDataFrame(
        [("p", y) for y in ["u", "v"] * 5], "a string, b string"
    )
    assert cramers_v(df3, "a", "b").collect()[0].v_micro is None


def test_pseudonymize_pii_stable_and_substring_safe(spark):
    from pdf_to_epub_spark.operators.textstats import pseudonymize_pii

    df = spark.createDataFrame(
        [
            (1, "mail a@b.com and xa@b.com and a@b.com again, ip 10.0.0.1"),
            (2, "a@b.com elsewhere"),
            (3, "no pii here"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in pseudonymize_pii(df).collect()}
    import re

    toks = re.findall(r"<EMAIL:[0-9a-f]{12}>", out[1].pseudo_text)
    # three occurrences, two identities (a@b.com twice -> same token);
    # xa@b.com (superstring) survived the longest-first fold intact
    assert len(toks) == 3 and len(set(toks)) == 2
    assert "a@b.com" not in out[1].pseudo_text
    assert "10.0.0.1" not in out[1].pseudo_text and "<IP:" in out[1].pseudo_text
    assert out[1].n_email_ids == 2 and out[1].n_ip_ids == 1
    # cross-doc stability: same address -> same token
    tok_a = re.findall(r"<EMAIL:[0-9a-f]{12}>", out[2].pseudo_text)[0]
    assert tok_a in out[1].pseudo_text
    assert out[3].pseudo_text == "no pii here" and out[3].n_email_ids == 0


def test_generalize_to_k_picks_smallest_width(spark):
    from pdf_to_epub_spark.operators.privacy import generalize_to_k

    # 10 docs at v in [0,100) and 10 at [100,200): width 100 -> two
    # classes of 10 (k=15 fails); width 200 -> one class of 20 (passes)
    rows = [("a", float(v)) for v in list(range(0, 100, 10))
            + list(range(100, 200, 10))]
    df = spark.createDataFrame(rows, "g string, v double")
    out = {r.width: r for r in generalize_to_k(
        df, "v", ["g"], k=15, base_width=100, max_doublings=2
    ).collect()}
    assert not out[100].k_anonymous and not out[100].chosen
    assert out[200].k_anonymous and out[200].chosen
    assert out[400].k_anonymous and not out[400].chosen  # not smallest
    # unsatisfiable k: chosen false everywhere
    out2 = generalize_to_k(
        df, "v", ["g"], k=100, base_width=100, max_doublings=1
    ).collect()
    assert all(not r.chosen for r in out2)


def test_generalize_to_k_negative_banding_matches_duckdb(spark):
    """Banding on SIGNED values must match what the DuckDB oracle's
    integer `//` actually does — TRUNCATE toward zero ((-50)//100 = 0,
    verified against the installed DuckDB inside this test, so a future
    DuckDB semantics change fails here, not as an opaque driver hash
    mismatch).  A round-4-advice 'fix' flipped this to floor division
    on the inverted belief that DuckDB floors; that made Spark band
    -50 into -1 while the oracle banded it 0."""
    import duckdb

    from pdf_to_epub_spark.operators.privacy import generalize_to_k

    # Empirical oracle-semantics pin: DuckDB integer // truncates.
    assert duckdb.sql("select (-50)//100, (-150)//100").fetchall() == [
        (0, -1)
    ]

    # 5 docs at v=-50 and 5 at v=50, width 100: truncation puts ALL TEN
    # in band 0 (one class of 10 -> k=6 satisfied); -150 opens band -1.
    rows = [("a", -50.0)] * 5 + [("a", 50.0)] * 5
    df = spark.createDataFrame(rows, "g string, v double")
    r6 = generalize_to_k(
        df, "v", ["g"], k=6, base_width=100, max_doublings=0
    ).collect()[0]
    assert r6.n_classes == 1 and r6.min_class_size == 10
    assert r6.k_anonymous and r6.chosen

    rows2 = rows + [("a", -150.0)] * 3
    df2 = spark.createDataFrame(rows2, "g string, v double")
    r = generalize_to_k(
        df2, "v", ["g"], k=4, base_width=100, max_doublings=0
    ).collect()[0]
    assert r.n_classes == 2 and r.min_class_size == 3
    assert not r.k_anonymous


def test_rank_correlations_plan_no_global_window(spark):
    """Spearman's ranks must come from range-partitioned prefix sums —
    the executed plan may contain the P-row offset lift's single
    partition but NEVER a corpus-level single-partition window (the
    global row_number trap the build_vocab rule bans)."""
    from pdf_to_epub_spark.operators import rank_correlations

    df = spark.createDataFrame(
        [(float(i), float(i % 7)) for i in range(100)],
        "a double, b double",
    )
    plan = (
        rank_correlations(df, ("a", "b"))
        ._jdf.queryExecution().executedPlan().toString()
    )
    # the per-partition running sum windows over the range-partition id
    assert "hashpartitioning(_gs_pid" in plan, plan[:3000]
    # no window partitioned by nothing over the VALUE rows: every
    # row_number/sum window must name _gs_pid in its partition spec
    import re as _re

    for m in _re.finditer(r"windowspecdefinition\(([^)]*)\)", plan):
        spec = m.group(1)
        assert "_gs_pid" in spec or "_gp_pid" in spec, spec


def test_readability_extract_plan_single_python_stage(spark):
    """mode='readability' must keep the OCR/HTML modes' plan shape: one
    Arrow-batched Python stage over the narrow binary projection — no
    extra Exchange introduced by the container scoring (it is all
    per-document Python, not a shuffle)."""
    from pdf_to_epub_spark.operators import extract_html_documents

    pages = spark.createDataFrame(
        [("u://1", b"<html><body><div><p>"
          b"A long enough paragraph, with commas, for scoring."
          b"</p></div></body></html>", "en")],
        "url string, html binary, lang string",
    ).withColumn("warc_ts", F.to_timestamp(F.lit("2024-01-01")))
    out = extract_html_documents(pages, salt_partitions=None,
                                 mode="readability")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 0, plan[:3000]
    assert "ArrowEvalPython" in plan or "MapInArrow" in plan, plan[:2000]
