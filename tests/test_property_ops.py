"""Property-based invariants for the round-3 training-data operators.

Pure-Python properties run under hypothesis directly (WARC round-trip,
stream==in-memory equivalence); Spark-backed properties use a handful of
hypothesis-DRAWN example corpora evaluated in one Spark job each
(per-example Spark jobs would be prohibitively slow, so examples are
pre-drawn with a fixed seed — deterministic, like the fuzz-parity suite).
"""

from __future__ import annotations

import io
import random
import unicodedata

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pdf_to_epub_spark.sources.warc import (
    build_warc_bytes,
    iter_warc_records,
    stream_warc_records,
)

_SETTINGS = dict(
    max_examples=60,
    derandomize=True,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)

# urls: header-safe — no whitespace at all (WARC header values are
# whitespace-trimmed per spec, so a url with leading/trailing \f etc.
# cannot round-trip; real urls percent-encode whitespace).  hypothesis
# FOUND that edge ('http://h/\x0c') before this constraint existed.
_url = st.text(
    alphabet=st.characters(
        codec="utf-8",
        exclude_characters="\r\n",
        exclude_categories=("Cs", "Zs", "Zl", "Zp", "Cc"),
    ),
    min_size=1,
    max_size=40,
).map(lambda s: "http://h/" + s)
_payload = st.binary(max_size=400)
_record = st.tuples(_url, st.just("2024-05-01T00:00:00Z"), _payload)


@given(
    recs=st.lists(_record, min_size=0, max_size=8),
    gz=st.booleans(),
    http=st.booleans(),
)
@settings(**_SETTINGS)
def test_warc_roundtrip_property(recs, gz, http):
    data = build_warc_bytes(recs, gzip_members=gz, with_http_headers=http)
    got = [(u, d, b) for u, d, _, b in iter_warc_records(data)]
    assert got == recs


@given(
    recs=st.lists(_record, min_size=0, max_size=8),
    gz=st.booleans(),
    chunk=st.integers(min_value=5, max_value=333),
)
@settings(**_SETTINGS)
def test_warc_stream_equals_inmemory_property(recs, gz, chunk):
    data = build_warc_bytes(recs, gzip_members=gz)
    assert list(stream_warc_records(io.BytesIO(data), chunk)) == list(
        iter_warc_records(data)
    )


@given(st.text(max_size=200))
@settings(**_SETTINGS)
def test_nfc_idempotent_property(s):
    once = unicodedata.normalize("NFC", s)
    assert unicodedata.normalize("NFC", once) == once


def _draw_pack_corpora(n_corpora: int = 5):
    rng = random.Random(71)
    words = ["alpha", "beta", "gamma", "delta", "x", "longerword"]
    corpora = []
    for c in range(n_corpora):
        docs = []
        for i in range(rng.randint(1, 25)):
            n = rng.choice([0, 1, 3, 7, 15, 40])
            docs.append((c * 1000 + i, " ".join(rng.choices(words, k=n))))
        corpora.append(docs)
    return corpora


def test_pack_sequences_invariants(spark):
    """Every doc appears exactly once; no sequence exceeds the cap unless
    it is a lone overflow doc; assignment is repartition-stable — over
    randomly drawn corpora including empty docs and overflow docs."""
    from pyspark.sql import functions as F

    from pdf_to_epub_spark.operators import pack_sequences, packed_sequence_stats

    for docs in _draw_pack_corpora():
        df = spark.createDataFrame(docs, "doc_id long, text string")
        asg = pack_sequences(df, max_tokens=10, n_shards=3)
        rows = asg.collect()
        assert sorted(r["doc_id"] for r in rows) == sorted(d for d, _ in docs)
        stats = packed_sequence_stats(asg, 10).collect()
        for s in stats:
            assert s["fill_tokens"] <= 10 or (
                s["is_overflow"] == 1 and s["n_docs"] == 1
            )
        again = sorted(
            map(tuple, pack_sequences(df.repartition(5), 10, n_shards=3).collect())
        )
        assert again == sorted(map(tuple, rows))


def test_dedup_lines_total_and_conservative(spark):
    """Rebuilt corpora never gain lines, every doc survives, and a corpus
    with no repeated non-blank lines is returned verbatim."""
    from pdf_to_epub_spark.operators import dedup_lines_global

    rng = random.Random(72)
    docs = []
    for i in range(12):
        lines = [f"unique-{i}-{j}" for j in range(rng.randint(1, 5))]
        if rng.random() < 0.5:
            lines.insert(rng.randint(0, len(lines)), "")
        docs.append((i, "\n".join(lines)))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r["doc_id"]: r for r in dedup_lines_global(df).collect()}
    for i, text in docs:
        assert got[i]["text"] == text          # nothing repeated -> verbatim
        assert got[i]["n_kept"] == got[i]["n_lines"]


# ---------------------------------------------------------------------------
# PDF writer ⇄ parser round-trip
# ---------------------------------------------------------------------------

# PDF literal/hex strings round-trip any text EXCEPT: the parser
# normalizes \r inside literals per the spec's EOL handling scope, so
# exclude bare control chars; surrogates can't encode.
_pdf_text = st.text(
    alphabet=st.characters(codec="utf-8", exclude_categories=("Cs", "Cc")),
    min_size=0,
    max_size=60,
)
_pdf_block = st.tuples(
    st.floats(min_value=0, max_value=600, allow_nan=False).map(lambda v: round(v, 2)),
    st.floats(min_value=0, max_value=790, allow_nan=False).map(lambda v: round(v, 2)),
    st.sampled_from([9.0, 11.0, 14.0, 18.0]),
    _pdf_text,
)


@given(pages=st.lists(st.lists(_pdf_block, max_size=6), min_size=1, max_size=4))
@settings(**_SETTINGS)
def test_pdf_roundtrip_property(pages):
    """make_pdf_bytes ∘ extract_pdf_blocks is the identity on
    (page, x, y, size, text) for arbitrary unicode block text — both
    string encodings (escaped latin-1 literal, BOM'd UTF-16BE hex) and
    arbitrary float coords."""
    from pdf_to_epub_spark.sources.pdf import extract_pdf_blocks, make_pdf_bytes

    got = extract_pdf_blocks(make_pdf_bytes(pages))
    expected = [
        (pi, x, y, s, t)
        for pi, blocks in enumerate(pages)
        for (x, y, s, t) in blocks
    ]
    assert got == expected


@given(
    pages=st.lists(st.lists(_pdf_block, max_size=4), min_size=1, max_size=2),
    cut=st.integers(min_value=0, max_value=10_000),
)
@settings(**_SETTINGS)
def test_pdf_truncation_never_crashes(pages, cut):
    """Any prefix of a valid PDF parses partially or raises
    UnsupportedPdf — never another exception."""
    from pdf_to_epub_spark.sources.pdf import (
        UnsupportedPdf,
        extract_pdf_blocks,
        make_pdf_bytes,
    )

    raw = make_pdf_bytes(pages)
    try:
        extract_pdf_blocks(raw[: min(cut, len(raw))])
    except UnsupportedPdf:
        pass


# ----------------------------------------------------------------- IR ops
def _py_tokens(text: str) -> list[str]:
    """Pure-Python replica of the shared token class — the differential
    oracle for the IR operators."""
    import re as _re

    return _re.findall("[a-zà-öø-ÿ]+", text.lower())


def test_ir_differential_on_drawn_corpora(spark):
    """term_postings / bm25 tf / boolean / phrase results must agree with
    a pure-Python tokenizer on hypothesis-drawn unicode corpora (drawn
    once with a fixed seed; one Spark job per operator, not per example)."""
    from collections import Counter

    from pdf_to_epub_spark.operators import (
        boolean_search,
        phrase_search,
        term_postings,
    )

    rnd = random.Random(77)
    corpus: list[tuple[int, str]] = []
    # mix: accented words, digits, punctuation runs, empty, newlines
    pieces = ["café", "merge", "x1y", "...", "Ångström", "naïve", "",
              "spark\nwindow", "ÀÉÎ", "the the", "øre"]
    for i in range(40):
        corpus.append(
            (i, " ".join(rnd.choice(pieces) for _ in range(rnd.randint(0, 8))))
        )
    docs = spark.createDataFrame(corpus, ["doc_id", "text"])

    got = {(r.term, r.doc_id): r.tf for r in term_postings(docs).collect()}
    exp = {}
    for i, t in corpus:
        for w, c in Counter(_py_tokens(t)).items():
            exp[(w, i)] = c
    assert got == exp

    # boolean: docs containing 'merge' AND 'café' but NOT 'naïve'
    got_b = {r.doc_id for r in
             boolean_search(docs, ["merge", "café"], ["naïve"]).collect()}
    exp_b = {
        i for i, t in corpus
        if {"merge", "café"} <= set(_py_tokens(t))
        and "naïve" not in _py_tokens(t)
    }
    assert got_b == exp_b

    # phrase: adjacent 'the the' (the repeated-token worst case)
    got_p = {r.doc_id for r in phrase_search(docs, ["the", "the"]).collect()}
    exp_p = set()
    for i, t in corpus:
        toks = _py_tokens(t)
        if any(toks[j] == toks[j + 1] == "the" for j in range(len(toks) - 1)):
            exp_p.add(i)
    assert got_p == exp_p
