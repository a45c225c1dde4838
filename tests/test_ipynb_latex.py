"""sources/ipynb.py + sources/latex.py — writers and Catalyst parsers."""

from __future__ import annotations

import json

from pdf_to_epub_spark.sources.ipynb import (
    documents_as_ipynb,
    ipynb_cell_stats,
    make_ipynb,
)
from pdf_to_epub_spark.sources.latex import (
    documents_as_latex,
    latex_section_stats,
    make_latex,
)

TOKS_30 = " ".join(f"tk{i}" for i in range(30))  # 3 cells (12/12/6)
TOKS_100 = " ".join(f"tk{i}" for i in range(100))  # 3 sections (40/40/20)


# ---------------------------------------------------------------- ipynb

def test_ipynb_writer_is_valid_nbformat4():
    nb = json.loads(make_ipynb(7, TOKS_30))
    assert nb["nbformat"] == 4 and len(nb["cells"]) == 3
    types = [c["cell_type"] for c in nb["cells"]]
    assert types == ["markdown", "markdown", "code"]
    code = nb["cells"][2]
    assert code["execution_count"] == 3
    assert code["outputs"][0]["output_type"] == "stream"
    # nbformat line convention: all but the last line newline-terminated
    src = nb["cells"][0]["source"]
    assert all(s.endswith("\n") for s in src[:-1])
    assert not src[-1].endswith("\n")


def test_ipynb_parser_on_handmade_notebook(spark):
    nb = json.dumps(
        {
            "cells": [
                {
                    "cell_type": "markdown",
                    "metadata": {},
                    "source": ["# \"quoted\" title\n", "body"],
                },
                {
                    "cell_type": "code",
                    "execution_count": 9,
                    "metadata": {},
                    "outputs": [],
                    "source": ["x = 1"],
                },
            ],
            "nbformat": 4,
        }
    )
    df = spark.createDataFrame([(1, nb)], "doc_id long, nb string")
    rows = {r.cell_id: r for r in ipynb_cell_stats(df).collect()}
    assert rows[1].cell_type == "markdown"
    assert rows[1].execution_count is None
    # from_json unescapes: '# "quoted" title\n' (17) + 'body' (4)
    assert rows[1].n_lines == 2 and rows[1].n_chars == 21
    assert rows[2].cell_type == "code" and rows[2].execution_count == 9
    assert rows[2].n_lines == 1 and rows[2].n_chars == 5


def test_ipynb_malformed_and_empty_yield_nothing(spark):
    df = spark.createDataFrame(
        [(1, "{not json"), (2, '{"cells":[],"nbformat":4}'), (3, None)],
        "doc_id long, nb string",
    )
    assert ipynb_cell_stats(df).count() == 0


def test_ipynb_end_to_end_matches_spec(spark):
    docs = spark.createDataFrame([(7, TOKS_30)], "doc_id long, text string")
    rows = sorted(
        ipynb_cell_stats(documents_as_ipynb(docs)).collect(),
        key=lambda r: r.cell_id,
    )
    assert [r.cell_type for r in rows] == ["markdown", "markdown", "code"]
    # cell 1: tk0..tk11 → 3 lines; 10×3 + 2×4 chars + 11 separators = 49
    assert rows[0].n_lines == 3 and rows[0].n_chars == 49
    # cell 3: tk24..tk29 → 2 lines; 6×4 chars + 5 separators = 29
    assert rows[2].n_lines == 2 and rows[2].n_chars == 29
    assert rows[2].execution_count == 3


def test_ipynb_parse_plan_has_no_python(spark):
    df = spark.createDataFrame([(1, make_ipynb(1, TOKS_30))],
                               "doc_id long, nb string")
    plan = (
        ipynb_cell_stats(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


# ---------------------------------------------------------------- latex

def test_latex_writer_shape():
    raw = make_latex(7, TOKS_100)
    assert raw.startswith("\\documentclass{article}\n\\begin{document}")
    assert raw.endswith("\\end{document}")
    assert raw.count("\\section{") == 3
    assert "\\section{tk0 tk1 tk2}" in raw
    # section 0 body: 37 toks → 5 lines; j=3 equation, j=4 comment
    assert raw.count("\\begin{equation}") == raw.count("\\end{equation}") == 2
    assert "\\cite{ref0}" in raw and "\\cite{ref2}" in raw


def test_latex_parser_on_handmade_article(spark):
    tex = "\n".join(
        [
            "\\documentclass{article}",
            "\\begin{document}",
            "preamble prose is ignored",
            "\\section{intro words}",
            "plain line \\cite{a} and \\cite{b}",
            "% a comment \\cite{not counted}",
            "\\begin{equation}",
            "x + y = 0",
            "\\end{equation}",
            "closing prose",
            "\\section{second}",
            "only line here",
            "\\end{document}",
        ]
    )
    df = spark.createDataFrame([(1, tex)], "doc_id long, tex string")
    rows = {r.sec_id: r for r in latex_section_stats(df).collect()}
    assert len(rows) == 2
    assert rows[1].title == "intro words"
    assert (rows[1].n_eq, rows[1].n_comment, rows[1].n_cite) == (1, 1, 2)
    # equation interior excluded from prose; 2 prose lines remain
    assert rows[1].n_prose_lines == 2
    assert rows[2].title == "second"
    assert (rows[2].n_eq, rows[2].n_cite, rows[2].n_prose_lines) == (0, 0, 1)


def test_latex_end_to_end_matches_spec(spark):
    docs = spark.createDataFrame(
        [(7, TOKS_100), (8, "a b")], "doc_id long, text string"
    )
    rows = {
        (r.doc_id, r.sec_id): r
        for r in latex_section_stats(documents_as_latex(docs)).collect()
    }
    s1 = rows[(7, 1)]
    # 37-token body → 5 lines: j=0,2 cite-prose, j=1 prose, j=3 eq, j=4 comment
    assert s1.title == "tk0 tk1 tk2"
    assert (s1.n_eq, s1.n_comment, s1.n_cite, s1.n_prose_lines) == (1, 1, 2, 3)
    s3 = rows[(7, 3)]
    # 17-token body → 3 lines, no eq/comment, cites at j=0,2
    assert (s3.n_eq, s3.n_comment, s3.n_cite, s3.n_prose_lines) == (0, 0, 2, 3)
    # 2-token doc: one title-only section, all counts zero
    s8 = rows[(8, 1)]
    assert s8.title == "a b"
    assert (s8.n_eq, s8.n_comment, s8.n_cite, s8.n_prose_lines) == (0, 0, 0, 0)


def test_latex_parse_plan_has_no_python(spark):
    df = spark.createDataFrame([(1, make_latex(1, TOKS_100))],
                               "doc_id long, tex string")
    plan = (
        latex_section_stats(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
