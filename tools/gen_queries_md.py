"""Regenerate QUERIES.md from the `queries()` docstrings.

Run after adding queries: ``python tools/gen_queries_md.py``.  One row per
driver query; the description is the docstring flattened to one line and
truncated.  Oracle coverage is computed live from ``oracle_sql()``.
"""
from __future__ import annotations

import pathlib
import re
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import __spark_entry__ as entry  # noqa: E402


def one_line(doc: str | None, limit: int = 220) -> str:
    text = re.sub(r"\s+", " ", (doc or "").strip())
    if len(text) > limit:
        text = text[: limit - 1].rstrip() + "…"
    return text.replace("|", "\\|")


def main() -> None:
    qs = entry.queries()
    oracles = entry.oracle_sql()
    n, no = len(qs), len(oracles)
    lines = [
        "# Driver query catalog",
        "",
        f"All {n} `queries()` entries, each with a DuckDB oracle "
        f"({no}/{n} oracled — the driver hash-compares rows, schema, and "
        "values at sf=0.01).  Generated from the query docstrings by "
        "`tools/gen_queries_md.py`; see COVERAGE.md for the operator-level "
        "map and file:line references.",
        "",
        "| query | what it checks |",
        "|---|---|",
    ]
    for name in sorted(qs):
        mark = "" if name in oracles else " (rows-only)"
        lines.append(f"| `{name}`{mark} | {one_line(qs[name].__doc__)} |")
    out = pathlib.Path(__file__).resolve().parent.parent / "QUERIES.md"
    out.write_text("\n".join(lines) + "\n", encoding="utf-8")
    print(f"wrote {out} ({n} queries, {no} oracled)")


if __name__ == "__main__":
    main()
