"""operators/segment.py — TextTiling gaps, depths, boundaries, tiles."""

from __future__ import annotations

from pdf_to_epub_spark.operators.segment import text_segments, texttiling_gaps

# 6 pseudo-sentences of 10 tokens (w=10): ps 0–2 are topic A, ps 3–5
# topic B with a DISJOINT vocabulary.  Full-window gaps (k=2) are
# 2, 3, 4; the vocabulary shift sits exactly at gap 3.
TOPIC_A = "apple banana cherry date elder fig grape honey iris jasmine"
TOPIC_B = "quark lepton boson gluon photon hadron meson baryon muon tau"
TWO_TOPICS = " ".join([TOPIC_A] * 3 + [TOPIC_B] * 3)
UNIFORM = " ".join([TOPIC_A] * 6)


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_boundary_at_topic_shift(spark):
    gaps = {
        r.gap: r
        for r in texttiling_gaps(
            _df(spark, [(1, TWO_TOPICS)]), w=10, k=2
        ).collect()
    }
    assert set(gaps) == {2, 3, 4}
    # gap 3: windows {1,2} vs {3,4} are fully disjoint → Dice 0
    assert gaps[3].sim_micro == 0
    # gaps 2/4: one window straddles the shift — Dice 2·10/(20+20)
    assert gaps[2].sim_micro == 500_000
    assert gaps[4].sim_micro == 500_000
    # local valley at the shift only
    assert gaps[3].depth_micro == 1_000_000
    assert gaps[2].depth_micro == 0 and gaps[4].depth_micro == 0
    assert gaps[3].is_boundary
    assert not gaps[2].is_boundary and not gaps[4].is_boundary


def test_uniform_doc_has_no_boundary(spark):
    rows = texttiling_gaps(_df(spark, [(1, UNIFORM)]), w=10, k=2).collect()
    assert {r.gap for r in rows} == {2, 3, 4}
    # full windows of identical pseudo-sentences → perfect Dice
    assert all(r.sim_micro == 1_000_000 for r in rows)
    assert all(r.depth_micro == 0 for r in rows)
    assert all(not r.is_boundary for r in rows)


def test_segments_cut_at_boundary(spark):
    segs = sorted(
        (
            (r.seg_id, r.start_ps, r.end_ps, r.n_ps)
            for r in text_segments(
                _df(spark, [(1, TWO_TOPICS)]), w=10, k=2
            ).collect()
        )
    )
    assert segs == [(1, 0, 2, 3), (2, 3, 5, 3)]


def test_single_tile_for_short_and_uniform_docs(spark):
    out = text_segments(
        _df(
            spark,
            [
                (1, UNIFORM),
                (2, "just seven little words in one ps"),
                (3, ""),
                (4, None),
            ],
        ),
        w=10,
        k=2,
    ).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert [(s.start_ps, s.end_ps) for s in by_doc[1]] == [(0, 5)]
    # shorter than 2k pseudo-sentences → no scorable gap, one tile
    assert [(s.start_ps, s.end_ps) for s in by_doc[2]] == [(0, 0)]
    # tokenless docs have no pseudo-sentences → no tiles
    assert 3 not in by_doc and 4 not in by_doc


def test_case_folding(spark):
    # same vocabulary in different case still coheres (lower() fold)
    text = " ".join(
        [TOPIC_A, TOPIC_A.upper(), TOPIC_A, TOPIC_A.title(), TOPIC_A, TOPIC_A]
    )
    rows = texttiling_gaps(_df(spark, [(1, text)]), w=10, k=2).collect()
    assert len(rows) == 3
    assert all(r.sim_micro == 1_000_000 for r in rows)


def test_no_python_udf_in_plan(spark):
    df = texttiling_gaps(_df(spark, [(1, TWO_TOPICS)]), w=10, k=2)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
