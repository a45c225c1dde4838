"""Unit tests for the corpus-profile / segmentation / paragraph-dedup /
HTML-structure operators added alongside the IR module."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pdf_to_epub_spark.operators import (
    corpus_rollup,
    dedup_paragraphs,
    extract_headings,
    extract_tables,
    sentence_stats,
)


# ---------------------------------------------------------------- rollup
def test_corpus_rollup_levels(spark):
    docs = spark.createDataFrame(
        [("en", "web", 10), ("en", "web", 20), ("en", "pdf", 30),
         ("fr", "web", 40)],
        ["lang", "source", "n_chars"],
    )
    rows = {(r.lang, r.source, r.gid): r for r in corpus_rollup(docs).collect()}
    assert rows[("en", "web", 0)].n_docs == 2
    assert rows[("en", "web", 0)].total_chars == 30
    assert rows[("en", None, 1)].n_docs == 3          # per-lang subtotal
    assert rows[("en", None, 1)].total_chars == 60
    assert rows[(None, None, 3)].n_docs == 4          # grand total
    assert rows[(None, None, 3)].avg_chars == 25.0
    # one pass: exactly 3 leaf + 2 lang + 1 total rows
    assert len(rows) == 6


def test_corpus_rollup_single_exchange(spark):
    docs = spark.createDataFrame(
        [("en", "web", 10)], ["lang", "source", "n_chars"]
    )
    plan = (
        corpus_rollup(docs)._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange") == 1, plan[:2000]


# ------------------------------------------------------------- sentences
def test_sentence_stats_basic(spark):
    df = spark.createDataFrame(
        [(1, "One two three. Four! Five six seven eight nine ten eleven?")],
        ["doc_id", "text"],
    )
    r = sentence_stats(df).collect()[0]
    assert r.n_sentences == 3
    # "One two three." (14) "Four!" (5) "Five…eleven?" (37)
    assert r.max_sentence_chars == 37
    assert r.avg_sentence_chars == pytest.approx(round(56 / 3, 6))
    assert r.short_sentence_ratio == pytest.approx(round(2 / 3, 6))


def test_sentence_stats_empty_and_punct_only(spark):
    df = spark.createDataFrame(
        [(1, ""), (2, "..."), (3, "   ")], ["doc_id", "text"]
    )
    rows = {r.doc_id: r for r in sentence_stats(df).collect()}
    for i in (1, 2, 3):
        assert rows[i].n_sentences == 0
        assert rows[i].avg_sentence_chars is None
        assert rows[i].max_sentence_chars is None


# ------------------------------------------------------------ paragraphs
def test_dedup_paragraphs_first_occurrence(spark):
    docs = spark.createDataFrame(
        [
            (1, "SHARED\n\nunique one"),
            (2, "SHARED\n\nunique two"),
            (3, "SHARED"),
        ],
        ["doc_id", "text"],
    )
    rows = {r.doc_id: r for r in dedup_paragraphs(docs).collect()}
    assert rows[1].text == "SHARED\n\nunique one"
    assert rows[1].n_paras == 2 and rows[1].n_kept == 2
    assert rows[2].text == "unique two"
    assert rows[2].n_kept == 1
    # all-duplicate doc survives with empty text, not a dropped row
    assert rows[3].text == "" and rows[3].n_kept == 0 and rows[3].n_paras == 1


def test_dedup_paragraphs_within_doc_and_null(spark):
    docs = spark.createDataFrame(
        [(1, "A\n\nA\n\nB"), (2, None)], ["doc_id", "text"]
    )
    rows = {r.doc_id: r for r in dedup_paragraphs(docs).collect()}
    # repeated paragraph inside ONE doc dedups to its first position
    assert rows[1].text == "A\n\nB"
    assert rows[1].n_paras == 3 and rows[1].n_kept == 2
    # null text → zero paragraphs → doc absent from totals by design?
    # No: null coalesces to '' which yields one empty unit, filtered;
    # the doc then has no rows in `paras` and drops out of totals.
    assert 2 not in rows


# --------------------------------------------------------------- outline
def _pages(spark, html: str):
    return spark.createDataFrame(
        [(1, html.encode("utf-8"))], ["doc_id", "html"]
    )


def test_extract_headings_order_case_and_nesting(spark):
    html = (
        "<html><body><H1>Top</H1><p>x</p>"
        "<h2 class='a'> Sub <em>One</em> </h2>"
        "<h3>Deep</h3 ></body></html>"
    )
    rows = extract_headings(_pages(spark, html)).orderBy("pos").collect()
    assert [(r.pos, r.level, r.heading) for r in rows] == [
        (0, 1, "Top"), (1, 2, "Sub One"), (2, 3, "Deep"),
    ]


def test_extract_jsonld_blocks(spark):
    """Typed fields parse; malformed JSON yields NULLs not errors; attr
    quoting/case/whitespace variants all match; a block-less page emits
    no rows; a null page survives."""
    from pdf_to_epub_spark.operators import extract_jsonld

    pages = spark.createDataFrame(
        [
            (
                "u1",
                (
                    '<script type="application/ld+json">'
                    '{"@type":"Article","name":"N1",'
                    '"datePublished":"2024-02-03"}</script>'
                    "<script TYPE='application/ld+json' async>"
                    " {broken </script>"
                ).encode(),
            ),
            ("u2", b"<script type='text/javascript'>var x=1</script>"),
            ("u3", None),
        ],
        "url: string, html: binary",
    )
    rows = {
        (r.url, r.block_id): (r.ld_type, r.ld_name, r.ld_date)
        for r in extract_jsonld(pages).collect()
    }
    assert rows == {
        ("u1", 0): ("Article", "N1", "2024-02-03"),
        ("u1", 1): (None, None, None),
    }


def test_extract_headings_none_and_null(spark):
    assert extract_headings(_pages(spark, "<p>no headings</p>")).count() == 0
    null_pages = spark.createDataFrame(
        [(1, None)], "doc_id: long, html: binary"
    )
    assert extract_headings(null_pages).count() == 0


def test_extract_tables_structure(spark):
    html = (
        "<table><tr><th>H1</th><th>H2</th></tr>"
        "<tr ><td>a</td><td><b>b</b> c</td></tr></table>"
        "<table><tr><td colspan=2>z</td></tr></table >"
    )
    rows = extract_tables(_pages(spark, html)).orderBy(
        "table_id", "row_id"
    ).collect()
    assert [(r.table_id, r.row_id, r.n_cells, r.cells) for r in rows] == [
        (0, 0, 2, "H1|H2"),
        (0, 1, 2, "a|b c"),
        (1, 0, 1, "z"),
    ]


def test_extract_tables_no_shuffle(spark):
    plan = (
        extract_tables(_pages(spark, "<table><tr><td>x</td></tr></table>"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan, plan[:2000]


# ---------------------------------------------------------- compression
def test_compression_ratio_signal(spark):
    import zlib

    from pdf_to_epub_spark.operators import compression_ratio

    rep = "spam spam spam " * 50
    uniq = "the quick brown fox jumps over the lazy dog 0123456789"
    docs = spark.createDataFrame(
        [(1, rep), (2, uniq), (3, ""), (4, None)], ["doc_id", "text"]
    )
    rows = {r.doc_id: r.compression_ratio
            for r in compression_ratio(docs).collect()}
    # deterministic replay of the UDF's own math
    for i, t in ((1, rep), (2, uniq)):
        raw = t.encode("utf-8")
        assert rows[i] == round(len(zlib.compress(raw, 6)) / len(raw), 6)
    # repetitive text compresses far better than unique prose
    assert rows[1] < rows[2] / 3
    # empty/null -> NULL, rows survive
    assert rows[3] is None and rows[4] is None


def test_dedup_paragraphs_no_value_join_back(spark):
    """Plan pin: the kept set comes straight from the keeper aggregate —
    no join keyed on the paragraph VALUE (the double-subtree-execution
    trap); the only join is the doc-keyed totals attach."""
    import re

    docs = spark.createDataFrame(
        [(1, "A\n\nB"), (2, "A\n\nC")], ["doc_id", "text"]
    )
    plan = (
        dedup_paragraphs(docs)._jdf.queryExecution().executedPlan().toString()
    )
    joins = re.findall(r"(?:SortMergeJoin|BroadcastHashJoin)[^\n]*", plan)
    assert len(joins) == 1, plan[:3000]
    assert "para" not in joins[0], joins[0]


# -------------------------------------------------------------- scripts
def test_script_ratios_dominant_and_ties(spark):
    from pdf_to_epub_spark.operators import script_ratios

    docs = spark.createDataFrame(
        [
            (1, "привет мир"),          # cyrillic only
            (2, "hello κόσμε"),         # latin 5, greek 5 -> tie -> latin
            (3, "你好"),                 # cjk only
            (4, "12345 !!"),            # no script letters
        ],
        ["doc_id", "text"],
    )
    rows = {r.doc_id: r for r in script_ratios(docs).collect()}
    assert rows[1].dominant_script == "cyrillic" and rows[1].n_cyrillic == 9
    assert rows[2].dominant_script == "latin"     # fixed precedence on tie
    assert rows[2].latin_ratio == 0.5
    assert rows[3].dominant_script == "cjk" and rows[3].n_cjk == 2
    assert rows[4].dominant_script is None and rows[4].latin_ratio is None


# ----------------------------------------------------------- hourly roll
def test_hourly_rollup_buckets(spark):
    import datetime as dt

    from pdf_to_epub_spark.operators import hourly_rollup

    base = dt.datetime(2024, 1, 1, 10, 0, 0)
    events = spark.createDataFrame(
        [
            (1, base + dt.timedelta(minutes=5), "click", 1.0),
            (2, base + dt.timedelta(minutes=59), "click", 2.0),
            (3, base + dt.timedelta(minutes=61), "click", 4.0),
            (4, base + dt.timedelta(minutes=5), "view", 8.0),
        ],
        ["event_id", "ts", "event_type", "value"],
    )
    rows = {(r.bucket_epoch, r.event_type): r
            for r in hourly_rollup(events).collect()}
    h0 = int(base.replace(tzinfo=dt.timezone.utc).timestamp())
    # session TZ may shift the naive literal; recover bucket from data
    buckets = sorted({b for b, _ in rows})
    assert len(buckets) == 2 and buckets[1] - buckets[0] == 3600
    first, second = buckets
    assert rows[(first, "click")].n_events == 2
    assert rows[(first, "click")].sum_value == 3.0
    assert rows[(second, "click")].avg_value == 4.0
    assert rows[(first, "view")].n_events == 1
    # quarter-hour buckets compose the same way
    q = {(r.bucket_epoch, r.event_type): r.n_events
         for r in hourly_rollup(events, bucket_seconds=900).collect()}
    assert sum(v for (_, t), v in q.items() if t == "click") == 3


# ------------------------------------------------- approx-quantile swap
def test_approx_percentile_close_to_exact(spark):
    """length_quantiles documents approx_percentile as the 100 TB swap
    for the exact percentile; this pins the swap's error on real data:
    with accuracy 10000 the approx p50/p90/p99 of the document length
    distribution must land within 1% of the exact values."""
    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    exact = docs.selectExpr(
        "percentile(n_chars, array(0.5, 0.9, 0.99)) AS q"
    ).collect()[0].q
    approx = docs.selectExpr(
        "approx_percentile(n_chars, array(0.5, 0.9, 0.99), 10000) AS q"
    ).collect()[0].q
    for e, a in zip(exact, approx):
        assert abs(a - e) <= max(1.0, 0.01 * e), (exact, approx)


# ------------------------------------------------ pathological HTML fuzz
def test_html_structure_ops_pathological_pages(spark):
    """Headings/tables extraction must degrade, not crash, on hostile
    markup: unclosed elements, nested tables, megabyte attributes,
    mismatched case, truncated bytes mid-tag, and binary junk."""
    pages = spark.createDataFrame(
        [
            (1, b"<h1>unclosed heading <p>rest of page"),
            (2, b"<table><tr><td><table><tr><td>inner</td></tr></table>"
                b"</td></tr></table>"),
            (3, ("<h2 " + "x" * 100_000 + ">big attr</h2>").encode()),
            (4, b"<H3>MiXeD</h3><h4>trunc"),
            (5, b"\xff\xfe\x00junk<table><tr><th>ok</th></tr></table>"),
            (6, b"<h1></h1><table></table>"),  # empty element bodies
        ],
        ["doc_id", "html"],
    )
    h = {(r.doc_id, r.pos): (r.level, r.heading)
         for r in extract_headings(pages).collect()}
    # unclosed h1 never matches (no closing tag) — dropped, not crashed
    assert not any(d == 1 for d, _ in h)
    assert h[(3, 0)] == (2, "big attr")
    assert h[(4, 0)] == (3, "MiXeD")
    assert h[(6, 0)] == (1, "")
    t = {(r.doc_id, r.table_id, r.row_id): r.cells
         for r in extract_tables(pages).collect()}
    # nested table: non-greedy match ends at the INNER close (documented)
    assert t[(2, 0, 0)] == "inner"
    # binary junk before the table does not poison the scan
    assert t[(5, 0, 0)] == "ok"
    # empty table yields no rows
    assert not any(d == 6 for d, _, _ in t)


# ------------------------------------------------- template (chrome) strip
def test_strip_template_lines_threshold(spark):
    from pdf_to_epub_spark.operators import strip_template_lines

    # domain a: 4 docs — banner on all 4 (template at 1/2), cookie on 2/4
    # (exactly the >= boundary), promo on 1/4 (kept)
    rows = []
    for i in range(4):
        t = "BANNER\n"
        if i % 2 == 0:
            t += "COOKIE\n"
        if i == 0:
            t += "PROMO\n"
        t += f"body {i}\n\nshared closing"
        rows.append((i, "a", t))
    # domain b: only 2 docs (< min_docs=3) — nothing stripped even though
    # BANNER appears on both
    rows += [(10, "b", "BANNER\nunique ten"), (11, "b", "BANNER\nunique eleven")]
    df = spark.createDataFrame(rows, ["doc_id", "source", "text"])
    out = {r.doc_id: r for r in strip_template_lines(df).collect()}

    # BANNER (4/4) and COOKIE (2/4) stripped; PROMO (1/4) kept; the
    # 'shared closing' line (4/4) is also template
    assert out[0].text == "PROMO\nbody 0\n"
    assert out[1].text == "body 1\n"
    assert out[0].n_removed == 3  # banner, cookie, shared closing
    assert out[1].n_removed == 2  # banner, shared closing
    assert out[2].n_removed == 3
    # the blank line survives as the trailing empty element
    assert out[1].text.endswith("body 1\n")
    assert out[1].n_lines == 4
    # small domain: untouched
    assert out[10].text == "BANNER\nunique ten"
    assert out[10].n_removed == 0


def test_strip_template_lines_null_and_empty(spark):
    from pdf_to_epub_spark.operators import strip_template_lines

    df = spark.createDataFrame(
        [(1, "a", None), (2, "a", ""), (3, "a", "x")],
        "doc_id long, source string, text string",
    )
    out = {r.doc_id: r for r in strip_template_lines(df).collect()}
    assert out[1].text == "" and out[1].n_lines == 1 and out[1].n_removed == 0
    assert out[2].text == ""
    assert out[3].text == "x"


def test_strip_template_lines_no_value_keyed_wide_exchange(spark):
    """The line-value shuffle only ever carries the SLIM distinct
    projection; the rebuild side must not hash-exchange on the line."""
    from pdf_to_epub_spark.operators import strip_template_lines

    df = spark.createDataFrame(
        [(1, "a", "x\ny"), (2, "a", "x\nz"), (3, "a", "x\nw")],
        ["doc_id", "source", "text"],
    )
    plan = strip_template_lines(df)._jdf.queryExecution().executedPlan().toString()
    # template table reaches the line stream via broadcast, not shuffle
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


# ---------------------------------------------------------------- BPE prep
def test_bpe_pair_counts_hand_weighted(spark):
    from pdf_to_epub_spark.operators import bpe_pair_counts

    df = spark.createDataFrame(
        [(1, "low low low lower lower"), (2, "newest newest newest newest widest")],
        ["doc_id", "text"],
    )
    got = {r.pair: r.weight for r in bpe_pair_counts(df, min_weight=1).collect()}
    # 'we' from lower(x2) + newest(x4) = 6; 'lo' from low(3)+lower(2) = 5
    assert got["we"] == 6
    assert got["lo"] == 5
    assert got["st"] == 5  # newest x4 + widest
    assert got["wi"] == 1


def test_bpe_learn_merges_sennrich_order(spark):
    from pdf_to_epub_spark.operators import bpe_learn_merges

    df = spark.createDataFrame(
        [(1, "low low low lower lower"), (2, "newest newest newest newest widest")],
        ["doc_id", "text"],
    )
    got = bpe_learn_merges(df, n_merges=2, min_weight=1).collect()
    assert [(r.rank, r.left, r.right, r.weight) for r in got] == [
        (0, "w", "e", 6),
        # after w+e: ('l','o') and ('s','t') tie at 5 — lexicographic asc
        (1, "l", "o", 5),
    ]


def test_bpe_learn_merges_overlap_and_stop(spark):
    from pdf_to_epub_spark.operators import bpe_learn_merges

    # 'aaaa' x2: pair ('a','a') counted overlapping (3 per word -> 6);
    # greedy leftmost merge gives aa+aa, then ('aa','aa')
    df = spark.createDataFrame([(1, "aaaa aaaa")], ["doc_id", "text"])
    got = bpe_learn_merges(df, n_merges=4, min_weight=2).collect()
    assert (got[0].left, got[0].right, got[0].weight) == ("a", "a", 6)
    assert (got[1].left, got[1].right, got[1].weight) == ("aa", "aa", 2)
    # after aaaa is one symbol there are no pairs left: early stop
    assert len(got) == 2


def test_bpe_encode_symbols_cascade_and_counts(spark):
    from pdf_to_epub_spark.operators import bpe_encode_symbols

    # merges cascade in rank order: l+o -> lo, lo+w -> low
    df = spark.createDataFrame(
        [(1, "low low lower"), (2, None), (3, "slow")], ["doc_id", "text"]
    )
    got = {
        r.symbol: (r.n_words, r.occurrences)
        for r in bpe_encode_symbols(
            df, [("l", "o"), ("lo", "w")]
        ).collect()
    }
    # 'low' appears as a full symbol in words low(x2), lower, slow
    assert got["low"] == (3, 4)
    assert got["s"] == (1, 1)
    assert got["e"] == (1, 1)
    assert got["r"] == (1, 1)
    assert "lo" not in got  # fully absorbed by the second merge
    assert set(got) == {"low", "s", "e", "r"}


def test_bpe_encode_symbols_leftmost_nonoverlapping(spark):
    from pdf_to_epub_spark.operators import bpe_encode_symbols

    # 'aaa' under (a,a): leftmost pair merges, remainder stays single
    df = spark.createDataFrame([(1, "aaa aaaa")], ["doc_id", "text"])
    got = {
        r.symbol: (r.n_words, r.occurrences)
        for r in bpe_encode_symbols(df, [("a", "a")]).collect()
    }
    assert got["aa"] == (2, 3)  # aaa -> [aa, a]; aaaa -> [aa, aa]
    assert got["a"] == (1, 1)


def test_bpe_fertility_majority_language_wins(spark):
    from pdf_to_epub_spark.operators import bpe_fertility, bpe_learn_merges

    # English-heavy corpus: learned merges compress 'the'-family words,
    # so the minority language fragments into more symbols per word
    rows = [(i, "the then there these those them", "en") for i in range(8)]
    rows += [(100, "zulu xhosa qwerty vexing", "zz")]
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang"])
    m = bpe_learn_merges(df, n_merges=4, min_weight=2).orderBy("rank").collect()
    got = {r.lang: r for r in
           bpe_fertility(df, [(r["left"], r["right"]) for r in m]).collect()}
    assert got["en"].n_tokens == 48
    assert got["en"].fertility < got["zz"].fertility
    # fertility is exactly n_subwords / n_tokens
    assert got["zz"].fertility == round(got["zz"].n_subwords / got["zz"].n_tokens, 6)


def test_mirror_domains_flags_cross_domain_content(spark):
    from pdf_to_epub_spark.operators import mirror_domains

    pages = spark.createDataFrame(
        [
            ("https://a.com/1", "shared content"),
            ("https://www.b.org/x", "shared content"),
            ("https://a.com/2", "unique one"),
            ("https://sub.a.com/3", "same domain twice"),
            ("https://a.com/4", "same domain twice"),
            ("https://c.net/n", None),
            ("https://d.net/n", None),
        ],
        "url: string, text: string",
    )
    rows = {r.domains_csv: r for r in mirror_domains(pages).collect()}
    # cross-domain dup flagged; subdomain collapses to the registrable
    # domain so the a.com pair is NOT a mirror; null texts mirror too
    assert set(rows) == {"a.com,b.org", "c.net,d.net"}
    assert rows["a.com,b.org"].n_pages == 2
    assert rows["a.com,b.org"].n_domains == 2


def test_url_templates_skeletons_and_share(spark):
    from pdf_to_epub_spark.operators import url_templates

    pages = spark.createDataFrame(
        [
            ("https://a.com/cal/2024/01/5",),
            ("https://a.com/cal/2024/02/6",),
            ("https://a.com/s/deadbeef01234567/x?q=1",),
            ("https://a.com/s/cafebabe99887766/x",),
            ("https://b.org/p/12",),
            ("https://b.org/p/13",),
            ("https://a.com/once/1",),  # below min_urls, dropped
            ("https://a.com",),         # empty path -> '/'... dropped (<2)
        ],
        "url: string",
    )
    rows = {(r.domain, r.template): r for r in url_templates(pages).collect()}
    assert set(rows) == {
        ("a.com", "/cal/{N}/{N}/{N}"),
        ("a.com", "/s/{H}/x"),
        ("b.org", "/p/{N}"),
    }
    assert rows[("a.com", "/cal/{N}/{N}/{N}")].n_urls == 2
    # share is over ALL of the domain's urls incl. the dropped singletons
    assert rows[("a.com", "/cal/{N}/{N}/{N}")].share == round(2 / 6, 6)
    assert rows[("b.org", "/p/{N}")].share == 1.0
