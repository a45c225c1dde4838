"""operators/dialogue.py — adjacent-turn SFT pair shaping."""

from __future__ import annotations

from pdf_to_epub_spark.operators.dialogue import TURN_SEP, dialogue_pairs


def _msgs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, msg_id long, body string"
    )


def test_multi_turn_context(spark):
    pairs = {
        r.pair_id: r
        for r in dialogue_pairs(
            _msgs(
                spark,
                [(1, 1, "t1"), (1, 2, "t2"), (1, 3, "t3"), (1, 4, "t4")],
            ),
            context_turns=2,
        ).collect()
    }
    assert set(pairs) == {1, 2, 3}
    assert pairs[1].prompt == "t1" and pairs[1].response == "t2"
    assert pairs[2].prompt == f"t1{TURN_SEP}t2" and pairs[2].response == "t3"
    # window slides: only the last 2 turns remain
    assert pairs[3].prompt == f"t2{TURN_SEP}t3" and pairs[3].response == "t4"


def test_null_body_turns_do_not_count_as_context(spark):
    # t1='hello', t2=NULL, t3='hi': the NULL turn is omitted from the
    # assembled prompt, so it must not count toward n_prev either —
    # t3's pair claims exactly the context it actually carries
    pairs = dialogue_pairs(
        _msgs(spark, [(1, 1, "hello"), (1, 2, None), (1, 3, "hi")]),
        context_turns=2,
    ).collect()
    by_resp = {r.response: r for r in pairs}
    assert by_resp["hi"].prompt == "hello"
    # a turn whose ONLY predecessors are NULL gets no pair at all
    pairs2 = dialogue_pairs(
        _msgs(spark, [(2, 1, None), (2, 2, "solo")]), context_turns=2
    ).collect()
    assert pairs2 == []


def test_single_message_thread_yields_nothing(spark):
    assert dialogue_pairs(_msgs(spark, [(1, 1, "only")])).count() == 0


def test_min_chars_filter_and_renumbering(spark):
    pairs = dialogue_pairs(
        _msgs(spark, [(1, 1, "long enough"), (1, 2, "x"), (1, 3, "reply")]),
        context_turns=1,
        min_chars=3,
    ).collect()
    # turn 2's response "x" is too short → dropped; turn 3 (prompt "x")
    # also dropped; nothing survives but the numbering stays dense
    got = sorted((r.pair_id, r.response) for r in pairs)
    assert got == []


def test_threads_do_not_leak_context(spark):
    pairs = dialogue_pairs(
        _msgs(spark, [(1, 1, "a1"), (1, 2, "a2"), (2, 1, "b1"), (2, 2, "b2")]),
        context_turns=2,
    ).collect()
    by_doc = {(r.doc_id, r.pair_id): r for r in pairs}
    assert by_doc[(2, 1)].prompt == "b1"  # no a-thread contamination
    assert len(pairs) == 2


def test_anchor_query_pairs_negatives(spark):
    from pdf_to_epub_spark.operators.ir import anchor_query_pairs

    docs = spark.createDataFrame(
        [(f"u://{i}", f"text {i}") for i in range(6)], "url string, text string"
    )
    anchors = spark.createDataFrame(
        [("find zero", "u://0"), ("find one", "u://1")],
        "anchor string, target string",
    )
    rows = {r.query: r for r in anchor_query_pairs(anchors, docs, buckets=2).collect()}
    assert rows["find zero"].pos_text == "text 0"
    for r in rows.values():
        # negative exists (2 buckets over 6 docs) and is never the positive
        assert r.neg_url is not None and r.neg_url != r.pos_url
        assert r.neg_text == "text " + r.neg_url.split("/")[-1]


def test_anchor_query_pairs_single_doc_bucket_null_negative(spark):
    from pdf_to_epub_spark.operators.ir import anchor_query_pairs

    docs = spark.createDataFrame(
        [("u://only", "only text")], "url string, text string"
    )
    anchors = spark.createDataFrame(
        [("q", "u://only")], "anchor string, target string"
    )
    rows = anchor_query_pairs(anchors, docs, buckets=1).collect()
    assert len(rows) == 1 and rows[0].neg_url is None
