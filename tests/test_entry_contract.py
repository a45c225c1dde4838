"""Driver-contract harness: mimics the round driver's correctness gate.

For every query in ``__spark_entry__.queries()``:
* run the Spark query at SF_DIR,
* if an oracle exists, run it in DuckDB over the same parquet (tables
  pre-registered as views),
* compare row count, sorted column names, and an order-insensitive
  value hash (cells stringified, floats pre-rounded by the queries
  themselves).
"""

from __future__ import annotations

import hashlib
import math
import os
import pathlib
import sys

import duckdb
import pytest

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import __spark_entry__ as entrymod  # noqa: E402

SF_DIR = os.environ.get("CONTRACT_SF_DIR", "/root/testdata/sf0.001")
TABLES = (
    "region", "nation", "customer", "supplier", "part", "orders", "lineitem",
    "events", "documents", "embeddings",
)

ORACLES = entrymod.oracle_sql()
QUERIES = entrymod.queries()


def _cell(v) -> str:
    if v is None:
        return "\\N"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.6f}".rstrip("0").rstrip(".")
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def _value_hash(cols: list[str], rows: list[tuple]) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("\x1f".join(_cell(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode("utf-8"))
        h.update(b"\n")
    return h.hexdigest()


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    yield con
    con.close()


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert set(df.columns) == {"url", "n_blocks", "n_chapters", "toc", "n_chars"}


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_runs(spark, name):
    df = QUERIES[name](spark, SF_DIR)
    assert df.count() >= 0


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_match(spark, duck, name):
    assert name in QUERIES, f"oracle {name} has no query"
    sdf = QUERIES[name](spark, SF_DIR)
    srows = [tuple(r) for r in sdf.collect()]
    scols = list(sdf.columns)

    res = duck.execute(ORACLES[name])
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()

    assert sorted(scols) == sorted(dcols), f"{name}: column mismatch"
    assert len(srows) == len(drows), f"{name}: row count {len(srows)} vs {len(drows)}"
    sh = _value_hash(scols, srows)
    dh = _value_hash(dcols, drows)
    if sh != dh:
        # show the first differing sorted row for debugging
        order_s = sorted(range(len(scols)), key=lambda i: scols[i])
        order_d = sorted(range(len(dcols)), key=lambda i: dcols[i])
        ls = sorted("\x1f".join(_cell(r[i]) for i in order_s) for r in srows)
        ld = sorted("\x1f".join(_cell(r[i]) for i in order_d) for r in drows)
        diff = next(
            (i for i, (a, b) in enumerate(zip(ls, ld)) if a != b), len(ls) - 1
        )
        raise AssertionError(
            f"{name}: value hash mismatch at sorted row {diff}:\n"
            f"  spark:  {ls[diff][:300]}\n  duckdb: {ld[diff][:300]}"
        )
