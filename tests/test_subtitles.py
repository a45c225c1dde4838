"""sources/subtitles.py — SRT/VTT render, parse, transcript assembly."""

from __future__ import annotations

from pyspark.sql import functions as F

from pdf_to_epub_spark.sources.subtitles import (
    cues_to_transcript,
    parse_subtitle_cues,
    render_srt,
)

TEXT_20 = " ".join(f"w{i:02d}" for i in range(20))  # 20 tokens → 3 cues


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_srt_render_shape(spark):
    out = render_srt(_docs(spark, [(1, TEXT_20)]), vtt=False).collect()[0]
    blocks = out.subs.split("\n\n")
    assert len(blocks) == 3
    # SRT: index line, comma separator, 4-token first line
    assert blocks[0].splitlines() == [
        "1",
        "00:00:00,000 --> 00:00:02,400",
        "w00 w01 w02 w03",
        "w04 w05 w06 w07",
    ]
    # last cue has 4 tokens → single text line
    assert blocks[2].splitlines()[0] == "3"
    assert blocks[2].splitlines()[1] == "00:00:05,000 --> 00:00:07,400"
    assert len(blocks[2].splitlines()) == 3


def test_vtt_render_shape(spark):
    out = render_srt(_docs(spark, [(1, TEXT_20)]), vtt=True).collect()[0]
    assert out.subs.startswith("WEBVTT\n\n")
    first = out.subs.split("\n\n")[1]
    # VTT: no index line, dot separator
    assert first.splitlines()[0] == "00:00:00.000 --> 00:00:02.400"


def test_parse_both_formats_identically(spark):
    d = _docs(spark, [(1, TEXT_20)])
    srt = parse_subtitle_cues(render_srt(d, vtt=False)).collect()
    vtt = parse_subtitle_cues(render_srt(d, vtt=True)).collect()
    assert sorted(map(tuple, srt)) == sorted(map(tuple, vtt))
    rows = {r.cue_id: r for r in srt}
    assert rows[1].start_ms == 0 and rows[1].end_ms == 2400
    assert rows[3].text == "w16 w17 w18 w19"


def test_long_gap_every_tenth_cue(spark):
    text = " ".join(f"t{i}" for i in range(8 * 12))  # 12 cues
    cues = parse_subtitle_cues(
        render_srt(_docs(spark, [(1, text)]))
    ).collect()
    by_id = {r.cue_id: r for r in cues}
    # cue 11 (0-based 10) gets the +5000 ms silence
    assert by_id[10].start_ms == 9 * 2500
    assert by_id[11].start_ms == 10 * 2500 + 5000


def test_malformed_blocks_dropped_not_fatal(spark):
    subs = (
        "1\n00:00:00,000 --> 00:00:02,400\nhello there\n\n"
        "not a cue at all\n\n"
        "2\nalso broken\n\n"
        "00:00:05,000 --> 00:00:07,400\nbare vtt style cue"
    )
    rows = parse_subtitle_cues(
        spark.createDataFrame([(1, subs)], "doc_id long, subs string")
    ).collect()
    assert [(r.cue_id, r.text) for r in sorted(rows, key=lambda r: r.cue_id)] == [
        (1, "hello there"),
        (2, "bare vtt style cue"),
    ]


def test_empty_doc_renders_empty_file_and_no_cues(spark):
    d = _docs(spark, [(1, ""), (2, None)])
    rendered = render_srt(d, vtt=True).collect()
    assert all(r.subs == "WEBVTT\n\n" for r in rendered)
    assert parse_subtitle_cues(render_srt(d)).count() == 0


def test_transcript_paragraphs_at_silences(spark):
    text = " ".join(f"t{i}" for i in range(8 * 12))  # 12 cues, break at 10
    cues = parse_subtitle_cues(render_srt(_docs(spark, [(1, text)])))
    out = cues_to_transcript(cues, gap_ms=1000).collect()[0]
    assert out.n_cues == 12 and out.n_paras == 2
    paras = out.transcript.split("\n\n")
    assert len(paras) == 2
    assert paras[0].startswith("t0 t1 ") and paras[1].startswith("t80 ")
    # cue-internal newlines flattened to spaces
    assert "\n" not in paras[0]


def test_hours_past_100_render_and_parse_exactly(spark):
    # lpad would truncate '100' → '10' (a silent ~90 h jump backwards);
    # the renderer must emit the full hour field and the parser must
    # accept 3+-digit hours (\d{2,})
    from pdf_to_epub_spark.sources.subtitles import _fmt_ts

    ms = 100 * 3_600_000 + 23 * 60_000 + 45_678  # 100:23:45,678
    d = spark.range(1).select(_fmt_ts(F.lit(ms), ",").alias("ts"))
    assert d.collect()[0].ts == "100:23:45,678"
    srt = f"1\n100:23:45,678 --> 100:23:47,000\nhello there\n"
    cues = parse_subtitle_cues(
        spark.createDataFrame([(1, srt)], "doc_id long, subs string")
    ).collect()
    assert len(cues) == 1
    assert cues[0].start_ms == ms and cues[0].end_ms == ms + 1322


def test_no_python_udf_in_plan(spark):
    df = parse_subtitle_cues(render_srt(_docs(spark, [(1, TEXT_20)])))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
