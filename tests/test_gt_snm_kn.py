"""Unit tests for r4-s13 operators: Good-Turing frequency-of-frequencies,
sorted-neighborhood blocking, interpolated Kneser-Ney bigram scoring."""

from __future__ import annotations

import math
import re
from collections import Counter

from pyspark.sql import functions as F


def test_good_turing_hand_values(spark):
    from pdf_to_epub_spark.operators import good_turing

    # words: a:4 b:3 c:2 d:2 e,f,g:1  -> T=14; fof 1:3, 2:2, 3:1, 4:1
    df = spark.createDataFrame(
        [("a a a b b c d e",), ("c d f g a b",)], "text string"
    )
    rows = {r.r: r for r in good_turing(df).collect()}
    assert {r: rows[r].n_r for r in rows} == {1: 3, 2: 2, 3: 1, 4: 1}
    # r* = (r+1) N_{r+1}/N_r, floor micro; p_GT = r*/14, floor nano
    assert rows[1].r_star_micro == 1_333_333  # 2*2/3
    assert rows[1].p_gt_nano == 95_238_095  # 4e9 // 42
    assert rows[2].r_star_micro == 1_500_000  # 3*1/2
    assert rows[3].r_star_micro == 4_000_000  # 4*1/1
    assert rows[4].r_star_micro is None and rows[4].p_gt_nano is None


def test_sorted_neighborhood_matches_global_order(spark):
    from pdf_to_epub_spark.operators import sorted_neighborhood_pairs

    rows = [(i, f"k{i % 7:02d}") for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, key string").repartition(6)
    out = sorted_neighborhood_pairs(df, key_col="key", window=3)
    got = sorted((r.id_a, r.id_b, r.gap) for r in out.collect())
    srt = sorted(rows, key=lambda t: (t[1], t[0]))
    want = sorted(
        (srt[i][0], srt[j][0], j - i)
        for i in range(len(srt))
        for j in range(i + 1, min(i + 3, len(srt)))
    )
    assert got == want
    # gaps bounded by window-1; keys carried through
    assert out.where(
        (F.col("gap") < 1) | (F.col("gap") > 2)
    ).count() == 0


def test_sorted_neighborhood_window_one_is_empty(spark):
    from pdf_to_epub_spark.operators import sorted_neighborhood_pairs

    df = spark.createDataFrame([(1, "a"), (2, "b")], "doc_id long, key string")
    out = sorted_neighborhood_pairs(df, key_col="key", window=1)
    assert out.count() == 0
    assert out.columns == ["id_a", "id_b", "key_a", "key_b", "gap"]


def test_sorted_neighborhood_plan_no_global_window(spark):
    """Scale pin: the corpus-side row_number window partitions by the
    range-partition id (parallel), never by the empty frame (single
    partition); only the P-row offsets table uses a global window."""
    from pdf_to_epub_spark.operators import sorted_neighborhood_pairs

    df = spark.createDataFrame(
        [(i, f"k{i}") for i in range(10)], "doc_id long, key string"
    )
    plan = (
        sorted_neighborhood_pairs(df, key_col="key", window=3)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "hashpartitioning(_gp_pid" in plan, plan[:3000]


def _py_kn(train_docs, score_docs, vs):
    tok = lambda t: re.findall(r"[a-zà-öø-ÿ]+", t.lower())
    wc = Counter(w for _, t in train_docs for w in tok(t))
    vocab = set(
        w for w, _ in sorted(wc.items(), key=lambda kv: (-kv[1], kv[0]))[:vs]
    )
    m = lambda w: w if w in vocab else "<unk>"
    pairs = Counter()
    for _, t in train_docs:
        ws = [m(w) for w in tok(t)]
        for a, b in zip(ws, ws[1:]):
            pairs[(a, b)] += 1
    c1, n1f, n1b = Counter(), Counter(), Counter()
    for (a, b), c in pairs.items():
        c1[a] += c
        n1f[a] += 1
        n1b[b] += 1
    n1all = len(pairs)
    uni = round(math.log(vs + 1) * 1e6)

    def cost(a, b):
        a, b = m(a), m(b)
        if a in c1:
            num = max(4 * pairs.get((a, b), 0) - 3, 0) * n1all + 3 * n1f[
                a
            ] * n1b.get(b, 0)
            if num > 0:
                return round(-math.log(num / (4 * c1[a] * n1all)) * 1e6)
            return uni
        if n1b.get(b, 0) > 0:
            return round(-math.log(n1b[b] / n1all) * 1e6)
        return uni

    out = {}
    for i, t in score_docs:
        ws = tok(t)
        ps = list(zip(ws, ws[1:]))
        out[i] = (len(ps), sum(cost(a, b) for a, b in ps))
    return out


def test_kn_bigram_scores_vs_python_replica(spark):
    from pdf_to_epub_spark.operators import kn_bigram_scores, train_kn_bigram

    train = [
        (0, "the cat sat on the mat"),
        (1, "the dog sat on the log"),
        (2, "a cat and a dog"),
        (3, "zz"),
    ]
    score = [
        (10, "the cat sat"),
        (11, "a newword cat"),  # OOV word -> <unk>
        (12, "x"),  # single token: zero pairs
        (13, ""),  # empty: zero pairs, still present
    ]
    vs = 4
    tdf = spark.createDataFrame(train, "doc_id long, text string")
    sdf = spark.createDataFrame(score, "doc_id long, text string")
    got = {
        r.doc_id: (r.n_bigrams, r.cost_micro_total)
        for r in kn_bigram_scores(
            sdf, train_kn_bigram(tdf, vocab_size=vs), vocab_size=vs
        ).collect()
    }
    assert got == _py_kn(train, score, vs)


def test_kn_probabilities_sum_to_one(spark):
    """For every observed context w1, sum_w2 P(w2|w1) over the FULL
    continuation set (observed pairs + the interpolated backoff for
    unseen w2) must be exactly 1 — the interpolated-KN invariant the
    exact-rational num/den factorization preserves."""
    from fractions import Fraction

    from pdf_to_epub_spark.operators.lm import train_kn_bigram

    docs = [(0, "a b a c a b d"), (1, "b c b a d a")]
    tdf = spark.createDataFrame(docs, "doc_id long, text string")
    vocab, pairs_c, ctx, cont, scalars = train_kn_bigram(tdf, vocab_size=10)
    pc = {(r.w1, r.w2): r.c12 for r in pairs_c.collect()}
    cx = {r.w1: (r.c1, r.n1f) for r in ctx.collect()}
    cb = {r.w2: r.n1b for r in cont.collect()}
    n1all = scalars.collect()[0].n1all
    vwords = sorted(cb)  # every word that can continue
    for w1, (c1, n1f) in cx.items():
        total = Fraction(0)
        for w2 in vwords:
            num = max(4 * pc.get((w1, w2), 0) - 3, 0) * n1all + 3 * n1f * cb[
                w2
            ]
            total += Fraction(num, 4 * c1 * n1all)
        assert total == 1, (w1, total)


def test_quantile_normalize_python_replica(spark):
    from collections import defaultdict

    from pdf_to_epub_spark.operators import quantile_normalize

    rows = [(i, "g%d" % (i % 3), float((i * 37) % 19)) for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id long, grp string, score double")
    got = {
        r.doc_id: r.norm_score
        for r in quantile_normalize(df, "score", "grp").collect()
    }
    pooled = sorted((s, i) for i, _, s in rows)
    n_tot = len(rows)
    groups = defaultdict(list)
    for i, g, s in rows:
        groups[g].append((s, i))
    want = {}
    for mem in groups.values():
        mem.sort()
        n = len(mem)
        for r, (_, i) in enumerate(mem, start=1):
            want[i] = pooled[((2 * r - 1) * n_tot) // (2 * n)][0]
    assert got == want
    # a normalized score is always an observed pooled score
    assert set(got.values()) <= {s for s, _ in pooled}


def test_quantile_normalize_same_distribution_is_identity_on_ranks(spark):
    """Two groups with identical score multisets normalize to identical
    norm_score multisets (the defining property of the technique)."""
    from pdf_to_epub_spark.operators import quantile_normalize

    rows = [(i, "a", float(i % 5)) for i in range(10)] + [
        (100 + i, "b", float(i % 5)) for i in range(10)
    ]
    df = spark.createDataFrame(rows, "doc_id long, grp string, score double")
    out = quantile_normalize(df, "score", "grp").collect()
    a = sorted(r.norm_score for r in out if r.grp == "a")
    b = sorted(r.norm_score for r in out if r.grp == "b")
    assert a == b


def test_chi2_independence_hand_values(spark):
    from collections import Counter

    from pdf_to_epub_spark.operators import chi2_independence

    data = (
        [("a", "x")] * 5
        + [("a", "y")] * 3
        + [("b", "x")] * 2
        + [("b", "y")] * 7
        + [("c", "x")] * 4  # (c, y) cell is absent but must contribute E
    )
    r = chi2_independence(
        spark.createDataFrame(data, "u string, v string"), "u", "v"
    ).collect()[0]
    obs = Counter(data)
    ra = Counter(u for u, _ in data)
    cb = Counter(v for _, v in data)
    n = len(data)
    chi = 0
    for u in ra:
        for v in cb:
            q = obs.get((u, v), 0) * n - ra[u] * cb[v]
            chi += round((q * q / (n * ra[u] * cb[v])) * 1e9)
    assert (r.n, r.a_levels, r.b_levels, r.dof, r.chi2_nano) == (
        n, 3, 2, 2, chi,
    )


def test_chi2_independent_columns_near_zero(spark):
    """A perfectly independent 2x2 table has chi2 exactly 0."""
    from pdf_to_epub_spark.operators import chi2_independence

    data = [("a", "x")] * 6 + [("a", "y")] * 2 + [("b", "x")] * 3 + [
        ("b", "y")
    ] * 1
    r = chi2_independence(
        spark.createDataFrame(data, "u string, v string"), "u", "v"
    ).collect()[0]
    assert r.chi2_nano == 0


def test_colbert_maxsim_python_replica(spark):
    import math
    import random

    from pdf_to_epub_spark.operators import colbert_maxsim

    random.seed(7)
    qs = [(0, t, [random.uniform(-1, 1) for _ in range(4)]) for t in range(3)]
    ds = [
        (d, [random.uniform(-1, 1) for _ in range(4)])
        for d in range(5)
        for _ in range(4)
    ]
    got = {
        (r.qid, r.did): (r.n_qtokens, r.maxsim_micro)
        for r in colbert_maxsim(
            spark.createDataFrame(
                qs, "qid long, vec_id long, embedding array<double>"
            ),
            spark.createDataFrame(ds, "did long, embedding array<double>"),
        ).collect()
    }

    def cos(a, b):
        dot = sum(x * y for x, y in zip(a, b))
        return dot / (
            math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(x * x for x in b))
        )

    want = {}
    for d in range(5):
        dv = [v for dd, v in ds if dd == d]
        want[(0, d)] = (
            3,
            sum(max(round(cos(qv, v) * 1e6) for v in dv) for _, _, qv in qs),
        )
    assert got == want


def test_colbert_maxsim_planted_best_match(spark):
    """A document containing an exact copy of every query token must
    score n_qtokens * 1e6 (each max hits the identical vector)."""
    from pdf_to_epub_spark.operators import colbert_maxsim

    qvecs = [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]]
    qs = [(0, t, v) for t, v in enumerate(qvecs)]
    ds = [(1, v) for v in qvecs] + [(2, [0.5, 0.5, 0.7])]
    out = {
        r.did: r.maxsim_micro
        for r in colbert_maxsim(
            spark.createDataFrame(
                qs, "qid long, vec_id long, embedding array<double>"
            ),
            spark.createDataFrame(ds, "did long, embedding array<double>"),
        ).collect()
    }
    assert out[1] == 2_000_000
    assert out[2] < 2_000_000


def test_credit_card_hits_luhn_edges(spark):
    from pdf_to_epub_spark.operators.textstats import credit_card_hits

    rows = [
        (0, "pay with 4532015112830366 today"),  # valid 16-digit
        (1, "fake 4532015112830367 nope"),  # bad check digit
        (2, "amex 378282246310005 and 371449635398431"),  # two valid 15s
        (3, "spaced 4532 0151 1283 0366 card"),
        (4, "dashed 4532-0151-1283-0366 card"),
        (5, "short 4111 111 and long 12345678901234567890123 run"),
        (6, None),  # null text -> zero candidates, not -1
        (7, "two cards 4532015112830366 4532015112830366"),  # merged run
        (8, "no digits at all"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: (r.n_card_candidates, r.n_cards_valid)
        for r in credit_card_hits(df).collect()
    }
    assert got == {
        0: (1, 1),
        1: (1, 0),
        2: (2, 2),
        3: (1, 1),
        4: (1, 1),
        5: (1, 0),
        6: (0, 0),
        7: (1, 0),
        8: (0, 0),
    }


def test_credit_card_luhn_property(spark):
    """Luhn's design guarantee, randomized: a digit string with its
    correct check digit appended always validates; the same string with
    ONE digit altered never does (single-digit errors are always
    detected).  40 pre-drawn examples (fixed seed), one Spark job."""
    import random as _random

    from pdf_to_epub_spark.operators.textstats import credit_card_hits

    rng = _random.Random(1337)

    def check_digit(body: str) -> str:
        # Luhn check digit for body+d: doubling applies to the digits at
        # odd reversed positions of the FULL string (body reversed =
        # positions 2,3,... of the full), i.e. every second of reversed
        # body starting at index 0
        s = 0
        for i, ch in enumerate(reversed(body)):
            d = int(ch)
            if i % 2 == 0:
                d *= 2
                if d > 9:
                    d -= 9
            s += d
        return str((10 - s % 10) % 10)

    rows = []
    for i in range(40):
        body = "".join(rng.choice("0123456789") for _ in range(rng.randint(12, 18)))
        card = body + check_digit(body)
        pos = rng.randrange(len(card))
        delta = rng.randint(1, 9)
        corrupted = (
            card[:pos] + str((int(card[pos]) + delta) % 10) + card[pos + 1:]
        )
        rows.append((i, f"ok {card} bad {corrupted} end"))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = credit_card_hits(df).collect()
    assert all(r.n_card_candidates == 2 for r in out)
    assert all(r.n_cards_valid == 1 for r in out), [
        (r.doc_id, r.n_cards_valid) for r in out if r.n_cards_valid != 1
    ]


def test_sorted_neighborhood_randomized_property(spark):
    """SNM == brute-force pairs of the globally sorted order, over a
    skew-heavy random key set (many ties, empty keys) and several window
    sizes — partition-boundary independence is the property under test."""
    import random as _random

    from pdf_to_epub_spark.operators import sorted_neighborhood_pairs

    rng = _random.Random(7)
    keys = ["", "a", "aa", "b", "zz", "k%02d" % 5]
    rows = [(i, rng.choice(keys)) for i in range(120)]
    df = spark.createDataFrame(rows, "doc_id long, key string").repartition(9)
    for w in (2, 4, 7):
        got = sorted(
            (r.id_a, r.id_b, r.gap)
            for r in sorted_neighborhood_pairs(
                df, key_col="key", window=w, num_partitions=5
            ).collect()
        )
        srt = sorted(rows, key=lambda t: (t[1], t[0]))
        want = sorted(
            (srt[i][0], srt[j][0], j - i)
            for i in range(len(srt))
            for j in range(i + 1, min(i + w, len(srt)))
        )
        assert got == want, f"window={w}"


def test_sorted_neighborhood_null_keys_sort_last(spark):
    """NULL keys rank LAST (asc_nulls_last on both the range partition
    and the window) — the DuckDB oracle's ORDER BY default; Spark's
    NULLS FIRST default silently flipped the pair set (review catch)."""
    from pdf_to_epub_spark.operators import sorted_neighborhood_pairs

    rows = [(1, "a"), (2, None), (3, "b")]
    df = spark.createDataFrame(rows, "doc_id long, key string")
    got = sorted(
        (r.id_a, r.id_b, r.gap)
        for r in sorted_neighborhood_pairs(
            df, key_col="key", window=2
        ).collect()
    )
    # global order nulls-last: (a,1), (b,3), (NULL,2)
    assert got == [(1, 3, 1), (3, 2, 1)]


def test_quantile_normalize_null_scores_rank_last(spark):
    from pdf_to_epub_spark.operators import quantile_normalize

    rows = [(1, "g", 5.0), (2, "g", None), (3, "g", 1.0), (4, "h", 2.0)]
    df = spark.createDataFrame(rows, "doc_id long, grp string, score double")
    out = {r.doc_id: r.norm_score for r in quantile_normalize(
        df, "score", "grp").collect()}
    # pooled nulls-last: [1.0, 2.0, 5.0, None]; N=4
    # g ranks: 1.0->r1/n3 idx ((2-1)*4)//6=0 -> 1.0 ; 5.0->r2 idx (3*4)//6=2 -> 5.0
    #          None->r3 idx (5*4)//6=3 -> None (the pooled tail)
    # h: 2.0 -> r1/n1 idx ((2-1)*4)//2=2 -> 5.0
    assert out == {3: 1.0, 1: 5.0, 2: None, 4: 5.0}


def test_chi2_null_levels_excluded(spark):
    """NULL category rows must not inflate margins/N (their grid cells
    can never match the equi-join back to obs — review catch): the
    statistic equals the NULL-filtered table's."""
    from pdf_to_epub_spark.operators import chi2_independence

    base = [("a", "x")] * 5 + [("a", "y")] * 3 + [("b", "x")] * 2 + [
        ("b", "y")
    ] * 7
    with_nulls = base + [(None, "x")] * 100 + [("a", None)] * 50
    r1 = chi2_independence(
        spark.createDataFrame(base, "u string, v string"), "u", "v"
    ).collect()[0]
    r2 = chi2_independence(
        spark.createDataFrame(with_nulls, "u string, v string"), "u", "v"
    ).collect()[0]
    assert (r1.n, r1.a_levels, r1.b_levels, r1.dof, r1.chi2_nano) == (
        r2.n, r2.a_levels, r2.b_levels, r2.dof, r2.chi2_nano,
    )
    assert r1.n == len(base)


def test_text_reuse_spans_planted_excerpt(spark):
    from pdf_to_epub_spark.operators import text_reuse_spans

    t1 = " ".join(f"w{i:02d}" for i in range(1, 61))
    t2 = " ".join(
        [f"f{j}" for j in range(10)] + [f"w{i:02d}" for i in range(21, 51)]
    )
    df = spark.createDataFrame([(1, t1), (2, t2)], "doc_id long, text string")
    pairs = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
    out = text_reuse_spans(df, pairs, k=5, min_run=3).collect()
    assert len(out) == 1
    r = out[0]
    # excerpt w21..w50: doc1 tokens 21-50, doc2 tokens 11-40, 26 shingles
    assert (r.diag, r.a_start, r.a_end, r.b_start, r.b_end, r.n_shingles) == (
        10, 21, 50, 11, 40, 26,
    )


def test_text_reuse_spans_insertion_splits_diagonal(spark):
    """An insertion inside the copied passage shifts the tail onto a new
    diagonal — the documented exact-diagonal semantics produce TWO rows
    whose intervals tile the copy around the insertion point."""
    from pdf_to_epub_spark.operators import text_reuse_spans

    orig = " ".join(f"w{i:02d}" for i in range(1, 41))
    # copy tokens 1..40 but insert two foreign tokens after position 20
    copied = " ".join(
        [f"w{i:02d}" for i in range(1, 21)]
        + ["xx1", "xx2"]
        + [f"w{i:02d}" for i in range(21, 41)]
    )
    df = spark.createDataFrame(
        [(1, orig), (2, copied)], "doc_id long, text string"
    )
    pairs = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
    rows = sorted(
        (r.diag, r.a_start, r.a_end, r.b_start, r.b_end)
        for r in text_reuse_spans(df, pairs, k=5, min_run=3).collect()
    )
    # head: diag 0 covering tokens 1..20 on both sides;
    # tail: diag -2 (copy shifted +2) covering 21..40 vs 23..42
    assert rows == [(-2, 21, 40, 23, 42), (0, 1, 20, 1, 20)]


def test_text_reuse_spans_repeated_shingles_excluded(spark):
    """A shingle repeated WITHIN a doc never participates (the passim
    uniqueness filter): a doc made of one phrase repeated produces no
    spans against a doc containing that phrase once."""
    from pdf_to_epub_spark.operators import text_reuse_spans

    phrase = "a b c d e"
    df = spark.createDataFrame(
        [(1, " ".join([phrase] * 4)), (2, phrase + " tail1 tail2")],
        "doc_id long, text string",
    )
    pairs = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
    assert text_reuse_spans(df, pairs, k=5, min_run=1).count() == 0


def test_merge_reuse_spans_reunites_insertion_split(spark):
    from pdf_to_epub_spark.operators import merge_reuse_spans, text_reuse_spans

    orig = " ".join(f"w{i:02d}" for i in range(1, 41))
    copied = " ".join(
        [f"w{i:02d}" for i in range(1, 21)]
        + ["xx1", "xx2"]
        + [f"w{i:02d}" for i in range(21, 41)]
    )
    df = spark.createDataFrame(
        [(1, orig), (2, copied)], "doc_id long, text string"
    )
    pairs = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
    spans = text_reuse_spans(df, pairs, k=5, min_run=3)
    out = merge_reuse_spans(spans, gap=8).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.a_start, r.a_end, r.b_start, r.b_end, r.n_runs) == (
        1, 40, 1, 42, 2,
    )


def test_merge_reuse_spans_far_apart_stay_separate(spark):
    """Two reuse passages separated by more than `gap` tokens on the A
    side stay distinct rows."""
    from pdf_to_epub_spark.operators import merge_reuse_spans

    spans = spark.createDataFrame(
        [
            (1, 2, 1, 10, 1, 10, 6),
            (1, 2, 30, 40, 15, 25, 7),  # a-gap of 19 > 8
        ],
        "id_a long, id_b long, a_start long, a_end long,"
        " b_start long, b_end long, n_shingles long",
    )
    out = sorted(
        (r.a_start, r.a_end, r.n_runs)
        for r in merge_reuse_spans(spans, gap=8).collect()
    )
    assert out == [(1, 10, 1), (30, 40, 1)]
