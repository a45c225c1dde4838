"""operators/privacy.py — k-anonymity, l-diversity, suppression."""

from __future__ import annotations

from pdf_to_epub_spark.operators.privacy import (
    k_anonymity_audit,
    suppress_small_classes,
)

ROWS = (
    # class A: 3 rows, 2 distinct sensitive values
    [(i, "en", "web", 0, i % 2) for i in range(3)]
    # class B: 5 rows, 1 distinct sensitive value
    + [(10 + i, "en", "web", 1, 7) for i in range(5)]
    # class C: 6 rows, 6 distinct values
    + [(20 + i, "de", "web", 0, i) for i in range(6)]
)


def _df(spark):
    return spark.createDataFrame(
        ROWS, "doc_id long, lang string, source string, band long, sens long"
    )


def test_audit_flags(spark):
    out = {
        (r.lang, r.band): r
        for r in k_anonymity_audit(
            _df(spark), ["lang", "source", "band"], "sens", k=5, l=2
        ).collect()
    }
    a, b, c = out[("en", 0)], out[("en", 1)], out[("de", 0)]
    assert (a.class_size, a.k_anonymous, a.l_diverse) == (3, False, True)
    # size-5 class passes k but fails l (single sensitive value)
    assert (b.class_size, b.k_anonymous, b.n_sensitive, b.l_diverse) == (
        5,
        True,
        1,
        False,
    )
    assert c.k_anonymous and c.l_diverse


def test_suppression_nulls_only_small_classes(spark):
    out = suppress_small_classes(
        _df(spark), ["lang", "source", "band"], k=5
    ).collect()
    small = [r for r in out if r.suppressed]
    kept = [r for r in out if not r.suppressed]
    assert {r.doc_id for r in small} == {0, 1, 2}
    assert all(
        r.lang is None and r.source is None and r.band is None for r in small
    )
    # non-quasi columns survive suppression untouched
    assert all(r.sens is not None for r in small)
    assert all(r.lang is not None and r.band is not None for r in kept)
    assert len(kept) == 11
