"""operators/markdown.py — front matter + fence signals."""

from __future__ import annotations

from pdf_to_epub_spark.operators.markdown import markdown_meta

MD = (
    "---\ntitle: My Post\nlang: en\ntags: [a, b]\n---\n"
    "Some prose here.\n"
    "```python\nprint('hi')\n```\n"
    "More prose.\n"
    "```\nbare fence, no info string\n```\n"
)
NO_FM = "Just text with a stray --- divider\n---\nnot front matter"


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_front_matter_and_fences(spark):
    r = markdown_meta(_df(spark, [(1, MD)])).collect()[0]
    assert r.has_front_matter
    assert r.fm_title == "My Post" and r.fm_lang == "en"
    assert r.n_fences == 2
    assert r.first_fence_lang == "python"
    fence1 = "```python\nprint('hi')\n```"
    fence2 = "```\nbare fence, no info string\n```"
    assert r.code_chars == len(fence1) + len(fence2)
    assert r.prose_chars == len(MD) - len(fence1) - len(fence2) - MD.index(
        "Some"
    )


def test_divider_mid_document_is_not_front_matter(spark):
    r = markdown_meta(_df(spark, [(1, NO_FM)])).collect()[0]
    assert not r.has_front_matter
    assert r.fm_title == "" and r.fm_lang == ""
    assert r.n_fences == 0 and r.code_chars == 0
    assert r.prose_chars == len(NO_FM)


def test_bare_first_fence_yields_empty_lang(spark):
    # the FIRST fence is bare: a later ```python fence must not leak
    # into first_fence_lang, and a stray unclosed ``` must not match
    md = "```\nbare\n```\n\n```python\nmore\n```\n"
    r = markdown_meta(_df(spark, [(1, md)])).collect()[0]
    assert r.n_fences == 2 and r.first_fence_lang == ""
    stray = "prose with a stray ```word marker but no closing fence"
    r2 = markdown_meta(_df(spark, [(2, stray)])).collect()[0]
    assert r2.n_fences == 0 and r2.first_fence_lang == ""


def test_null_text(spark):
    r = markdown_meta(_df(spark, [(1, None)])).collect()[0]
    assert not r.has_front_matter and r.prose_chars == 0


def test_no_python_udf_in_plan(spark):
    df = markdown_meta(_df(spark, [(1, MD)]))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
