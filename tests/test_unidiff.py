"""sources/unidiff.py — diff writer + relational stats parser."""

from __future__ import annotations

from pdf_to_epub_spark.sources.unidiff import (
    documents_as_unidiffs,
    make_unidiff,
    unidiff_file_stats,
)

TOKS_130 = " ".join(f"tk{i}" for i in range(130))  # 3 files (60/60/10)

HANDMADE = """--- a/one.txt
+++ b/one.txt
@@ -1,2 +1,2 @@
 context stays
-old line
+new line
--- a/two.txt
+++ b/two.txt
@@ -1,1 +1,2 @@
 keep
+added only"""


def test_writer_shape():
    raw = make_unidiff(7, TOKS_130)
    assert raw.count("+++ b/src/mod_7_") == 3
    # file 0: 6 lines → j 0..5 → dels at j=1,5; adds at j=2
    first = raw.split("--- a/src/mod_7_1.py")[0]
    assert first.count("\n-") == 2 and first.count("\n+tk") == 1
    assert "@@ -1,5 +1,4 @@" in first  # 6 lines: old=6-1 add, new=6-2 dels


def test_relational_parser_on_handmade_diff(spark):
    df = spark.createDataFrame([(1, HANDMADE)], "doc_id long, diff string")
    rows = {r.file_id: r for r in unidiff_file_stats(df).collect()}
    assert rows[1].path == "one.txt" and rows[2].path == "two.txt"
    assert (rows[1].n_adds, rows[1].n_dels, rows[1].n_context) == (1, 1, 1)
    assert (rows[2].n_adds, rows[2].n_dels, rows[2].n_context) == (1, 0, 1)
    assert rows[1].n_hunks == 1


def test_empty_and_null_diffs_yield_nothing(spark):
    df = spark.createDataFrame(
        [(1, ""), (2, "no markers at all")], "doc_id long, diff string"
    )
    assert unidiff_file_stats(df).count() == 0


def test_end_to_end_matches_spec(spark):
    docs = spark.createDataFrame([(7, TOKS_130)], "doc_id long, text string")
    rows = sorted(
        unidiff_file_stats(documents_as_unidiffs(docs)).collect(),
        key=lambda r: r.file_id,
    )
    assert [r.path for r in rows] == [f"src/mod_7_{f}.py" for f in range(3)]
    # files 0/1: 6 lines → adds(j=2)=1, dels(j=1,5)=2, context=3
    assert (rows[0].n_adds, rows[0].n_dels, rows[0].n_context) == (1, 2, 3)
    # file 2: 1 line (j=0 context only)
    assert (rows[2].n_adds, rows[2].n_dels, rows[2].n_context) == (0, 0, 1)


def test_parser_plan_has_no_python(spark):
    df = spark.createDataFrame([(1, HANDMADE)], "doc_id long, diff string")
    plan = (
        unidiff_file_stats(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
