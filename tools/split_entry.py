"""Mechanical splitter for __spark_entry__.py -> entry/ package.

Verbatim line slicing at top-level statement boundaries; AST-driven
import generation (zero forward refs among builders was verified, so
cross-chunk imports are strictly backward => acyclic).
"""
import ast
import builtins
import pathlib

ROOT = pathlib.Path("/root/repo")
SRC = (ROOT / "__spark_entry__.py").read_text()
LINES = SRC.splitlines(keepends=True)
TREE = ast.parse(SRC)
STMTS = TREE.body
BUILTINS = set(dir(builtins))

PYSPARK_IMPORTS = {
    "DataFrame": "from pyspark.sql import DataFrame, SparkSession",
    "SparkSession": "from pyspark.sql import DataFrame, SparkSession",
    "F": "from pyspark.sql import functions as F",
    "Window": "from pyspark.sql.window import Window",
    "Callable": "from collections.abc import Callable",
    "pathlib": "import pathlib",
    "sys": "import sys",
}


def defined_names(stmt):
    out = set()
    if isinstance(stmt, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)):
        out.add(stmt.name)
    elif isinstance(stmt, ast.Assign):
        for t in stmt.targets:
            if isinstance(t, ast.Name):
                out.add(t.id)
    elif isinstance(stmt, ast.AnnAssign):
        if isinstance(stmt.target, ast.Name):
            out.add(stmt.target.id)
    elif isinstance(stmt, (ast.Import, ast.ImportFrom)):
        for a in stmt.names:
            out.add((a.asname or a.name).split(".")[0])
    return out


def used_names(node):
    return {
        n.id
        for n in ast.walk(node)
        if isinstance(n, ast.Name) and isinstance(n.ctx, ast.Load)
    }


def slice_lines(a, b):  # 1-based inclusive
    return "".join(LINES[a - 1 : b])


IDX = {s.name: i for i, s in enumerate(STMTS) if isinstance(s, ast.FunctionDef)}
i_entry, i_queries, i_oracle = IDX["entry"], IDX["queries"], IDX["oracle_sql"]
header = STMTS[:i_entry]
builders = STMTS[i_entry + 1 : i_queries]
ohelpers = STMTS[i_queries + 1 : i_oracle]

# ---- 1. chunk the builders -------------------------------------------------
TARGET = 1150
chunks = []
cur, cur_lines = [], 0
for s in builders:
    n = s.end_lineno - s.lineno + 1
    if cur and cur_lines + n > TARGET:
        chunks.append(cur)
        cur, cur_lines = [], 0
    cur.append(s)
    cur_lines += n
if cur:
    chunks.append(cur)
print(f"{len(chunks)} builder chunks:", [len(c) for c in chunks])

hdr_defs = set().union(*[defined_names(s) for s in header])
chunk_defs = [set().union(*[defined_names(s) for s in c]) for c in chunks]
oh_defs = set().union(*[defined_names(s) for s in ohelpers])

# Builder chunks may call oracle-helper functions defined LATER in the
# original file (legal single-module forward refs).  oracle_helpers also
# imports from chunks, so importing oh from a chunk would cycle —
# relocate those helpers into _shared instead (they must be leaves:
# nothing outside _shared/builtins/each other).
chunk_used_all = set().union(*[used_names(s) for c in chunks for s in c])
relocate = set()
frontier = {n for n in chunk_used_all if n in oh_defs}
oh_by_name = {}
for s in ohelpers:
    for n in defined_names(s):
        oh_by_name[n] = s
while frontier:
    n = frontier.pop()
    if n in relocate:
        continue
    relocate.add(n)
    for dep in used_names(oh_by_name[n]):
        if dep in oh_defs and dep not in relocate:
            frontier.add(dep)
for n in relocate:
    deps = used_names(oh_by_name[n])
    bad = {
        d
        for d in deps
        if d not in hdr_defs
        and d not in BUILTINS
        and d not in oh_defs
        and d in set().union(*chunk_defs)
    }
    assert not bad, f"relocated helper {n} depends on chunk names {bad}"
print("relocating to _shared:", sorted(relocate))

# where is each name defined? ("shared", chunk index, or "ohelpers")
origin = {n: "shared" for n in hdr_defs}
for n in relocate:
    origin[n] = "shared"
for ci, defs in enumerate(chunk_defs):
    for n in defs:
        origin.setdefault(n, ci)
for n in oh_defs:
    origin.setdefault(n, "oh")

CHUNK_MOD = [f"queries_{i+1:02d}" for i in range(len(chunks))]


def gen_imports(used, own_defs, upto_chunk=None, allow_oh=False):
    """Import lines for `used` names not defined locally.

    upto_chunk: only chunks strictly before this index are importable.
    """
    std, from_shared, from_chunks, from_oh = set(), set(), {}, set()
    for n in sorted(used - own_defs - BUILTINS):
        o = origin.get(n)
        if o is None:
            continue  # local variable / param shadowing nothing global
        if o == "shared":
            if n in PYSPARK_IMPORTS:
                std.add(PYSPARK_IMPORTS[n])
            else:
                from_shared.add(n)
        elif o == "oh":
            if allow_oh:
                from_oh.add(n)
        elif isinstance(o, int):
            if upto_chunk is None or o < upto_chunk:
                from_chunks.setdefault(o, set()).add(n)
            elif o == upto_chunk:
                pass  # own chunk
            else:
                raise AssertionError(f"forward ref {n} -> chunk {o}")
    out = sorted(std)
    if from_shared:
        names = ", ".join(sorted(from_shared))
        out.append(f"from entry._shared import {names}")
    for ci in sorted(from_chunks):
        names = ", ".join(sorted(from_chunks[ci]))
        out.append(f"from entry.{CHUNK_MOD[ci]} import {names}")
    if from_oh:
        names = ", ".join(sorted(from_oh))
        out.append(f"from entry.oracle_helpers import {names}")
    return out


ENTRY_DIR = ROOT / "entry"
ENTRY_DIR.mkdir(exist_ok=True)

# ---- 2. _shared.py ---------------------------------------------------------
shared_body = slice_lines(header[1].lineno, header[-1].end_lineno)
# __file__ in entry/_shared.py is one directory deeper than the old root
# module; repo-root-relative paths need one more .parent.
shared_body = shared_body.replace(
    "pathlib.Path(__file__).resolve().parent",
    "pathlib.Path(__file__).resolve().parent.parent",
)
relocated_src = "".join(
    "\n\n" + slice_lines(oh_by_name[n].lineno, oh_by_name[n].end_lineno)
    for n in sorted(relocate)
)
(ENTRY_DIR / "_shared.py").write_text(
    '"""Shared driver-contract helpers (mechanical __spark_entry__ split).\n'
    "\nHeader of the original single-file module: spark-side package\n"
    "shipping, testdata table loader, and the shared constants — plus\n"
    "leaf oracle helpers that both query builders and oracle fragments\n"
    "call (kept here to keep the chunk import graph acyclic).\n"
    '"""\n' + shared_body + relocated_src
)

# ---- 3. builder chunk modules ----------------------------------------------
for ci, c in enumerate(chunks):
    used = set().union(*[used_names(s) for s in c])
    imports = gen_imports(used, chunk_defs[ci], upto_chunk=ci)
    body = slice_lines(c[0].lineno, c[-1].end_lineno)
    mod = (
        f'"""Driver query builders (part {ci+1}/{len(chunks)} of the '
        'mechanical __spark_entry__ split; verbatim)."""\n'
        "from __future__ import annotations\n\n" + "\n".join(imports) + "\n\n\n" + body
    )
    (ENTRY_DIR / f"{CHUNK_MOD[ci]}.py").write_text(mod)

# ---- 4. oracle_helpers.py --------------------------------------------------
kept = [s for s in ohelpers if not (defined_names(s) & relocate)]
used = set().union(*[used_names(s) for s in kept])
oh_own = set().union(*[defined_names(s) for s in kept]) if kept else set()
imports = gen_imports(used, oh_own, upto_chunk=len(chunks))
body = "".join(
    slice_lines(s.lineno, s.end_lineno) + "\n\n" for s in kept
)
# entry/ is one directory deeper than the old root module (golden paths)
body = body.replace(
    "pathlib.Path(__file__).resolve().parent",
    "pathlib.Path(__file__).resolve().parent.parent",
)
(ENTRY_DIR / "oracle_helpers.py").write_text(
    '"""Oracle SQL builder helpers (mechanical __spark_entry__ split; '
    'verbatim)."""\n'
    "from __future__ import annotations\n\n" + "\n".join(imports) + "\n\n\n" + body
)

# ---- 5. oracle dict parts --------------------------------------------------
osql = STMTS[i_oracle]
assign, ret = osql.body[0], osql.body[-1]
assert isinstance(ret, ast.Return)
d = ret.value
assign_src = slice_lines(assign.lineno, assign.end_lineno)


def entry_start(k, v):
    if k is not None:
        return k.lineno
    # dict-unpack: the ** token precedes the value node, possibly on an
    # earlier line — walk up to include it.
    ln = v.lineno
    while "**" not in LINES[ln - 1]:
        ln -= 1
        assert v.lineno - ln < 5, "runaway ** scan"
    return ln


starts = [entry_start(k, v) for k, v in zip(d.keys, d.values)]
bounds = starts + [d.end_lineno]  # d.end_lineno = the closing "}" line
entries = []  # (block_start, block_end, value_node)
for i, v in enumerate(d.values):
    entries.append((bounds[i], bounds[i + 1] - 1, v))
O_TARGET = 2100
oparts, cur, cur_lines = [], [], 0
for e in entries:
    n = e[1] - e[0] + 1
    if cur and cur_lines + n > O_TARGET:
        oparts.append(cur)
        cur, cur_lines = [], 0
    cur.append(e)
    cur_lines += n
if cur:
    oparts.append(cur)
print(f"{len(oparts)} oracle parts:", [len(p) for p in oparts])

OP_MOD = [f"oracles_{i+1:02d}" for i in range(len(oparts))]
for pi, part in enumerate(oparts):
    used = set()
    for _, _, v in part:
        used |= used_names(v)
    needs_lang_votes = "lang_votes" in used
    used.discard("lang_votes")
    if needs_lang_votes:
        used |= used_names(assign)
    imports = gen_imports(used, set(), upto_chunk=len(chunks), allow_oh=True)
    body = "".join(slice_lines(a, b) for a, b, _ in part)
    fn = (
        "def oracles() -> dict[str, str]:\n"
        + (assign_src if needs_lang_votes else "")
        + "    return {\n"
        + body
        + "    }\n"
    )
    (ENTRY_DIR / f"{OP_MOD[pi]}.py").write_text(
        f'"""Oracle SQL fragments (part {pi+1}/{len(oparts)} of the '
        'mechanical __spark_entry__ split; entries verbatim)."""\n'
        "from __future__ import annotations\n\n"
        + "\n".join(imports)
        + "\n\n\n"
        + fn
    )

# ---- 6. __init__.py --------------------------------------------------------
(ENTRY_DIR / "__init__.py").write_text(
    '"""Driver-contract package: the mechanical split of the former\n'
    "17.8k-line __spark_entry__.py (r4 verdict #5).  Modules:\n\n"
    "- _shared: package shipping, table loader, shared constants\n"
    f"- queries_01..{len(chunks):02d}: the per-query DataFrame builders "
    "(verbatim, in\n  original order; imports generated from AST name "
    "analysis)\n"
    "- oracle_helpers: parameterized oracle-SQL builder functions\n"
    f"- oracles_01..{len(oparts):02d}: the DuckDB oracle strings, "
    "dict-literal slices\n  in original order\n\n"
    "The public driver surface (entry / queries / oracle_sql) stays in\n"
    "the root __spark_entry__.py facade.\n"
    '"""\n'
)

# ---- 7. facade -------------------------------------------------------------
docstring = slice_lines(1, header[0].end_lineno)
# names the facade needs: everything referenced by entry() and queries()
entry_stmt, q_stmt = STMTS[i_entry], STMTS[i_queries]
fac_used = used_names(entry_stmt) | used_names(q_stmt)
fac_used |= {"_phash_media_payloads"}  # imported by tests/test_multimodal.py
fac_imports = gen_imports(fac_used, set(), upto_chunk=len(chunks), allow_oh=True)
entry_src = slice_lines(entry_stmt.lineno, entry_stmt.end_lineno)
q_src = slice_lines(q_stmt.lineno, q_stmt.end_lineno)
merge = " | ".join(f"_{m}.oracles()" for m in OP_MOD)
op_imports = "\n".join(f"from entry import {m} as _{m}" for m in OP_MOD)
facade = (
    docstring
    + "\nfrom __future__ import annotations\n\n"
    + "\n".join(fac_imports)
    + "\n"
    + op_imports
    + "\n\n\n"
    + entry_src
    + "\n\n"
    + q_src
    + "\n\n"
    + "def oracle_sql() -> dict[str, str]:\n"
    + '    """DuckDB oracle SQL per query, merged from the entry.oracles_*\n'
    + "    fragments (original order preserved across parts; keys are\n"
    + '    disjoint by construction)."""\n'
    + f"    return {merge}\n"
)
(ROOT / "__spark_entry__.py").write_text(facade)
print("facade lines:", facade.count("\n"))
print("done")
