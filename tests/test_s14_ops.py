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
