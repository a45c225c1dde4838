"""Targeted oracle sweep: like tools/self_sweep.py but only for the named
queries (substring match), over sf0.001 and sf0.01.

Usage: python tools/sweep_some.py name [name ...]
"""
from __future__ import annotations

import pathlib
import sys

ROOT = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))
sys.path.insert(0, str(ROOT / "tests"))
sys.path.insert(0, str(ROOT / "tools"))

import duckdb  # noqa: E402
from test_entry_contract import TABLES, _value_hash  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402


def main() -> None:
    pats = sys.argv[1:]
    import bench_extra

    spark = bench_extra.get_session(8)
    queries, oracles = entrymod.queries(), entrymod.oracle_sql()
    names = [n for n in sorted(queries) if any(p in n for p in pats)]
    print("sweeping:", names)
    n_fail = 0
    for sf_dir in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        con = duckdb.connect()
        for t in TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
            )
        for name in names:
            sdf = queries[name](spark, sf_dir)
            srows = [tuple(r) for r in sdf.collect()]
            scols = list(sdf.columns)
            if name not in oracles:
                print(f"{sf_dir.rsplit('/',1)[-1]} {name}: rows-only "
                      f"({len(srows)})", flush=True)
                continue
            res = con.execute(oracles[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
            ok = (
                len(srows) == len(drows)
                and sorted(scols) == sorted(dcols)
                and _value_hash(scols, srows) == _value_hash(dcols, drows)
            )
            n_fail += 0 if ok else 1
            print(
                f"{sf_dir.rsplit('/',1)[-1]} {name}: "
                f"{'OK' if ok else 'FAIL'} ({len(srows)} rows)",
                flush=True,
            )
        con.close()
    spark.stop()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
