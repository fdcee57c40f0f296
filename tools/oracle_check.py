#!/usr/bin/env python3
"""Dev-only harness mimicking the driver's DuckDB-oracle compare.

NOT part of the engine (the engine is pure Scala/Spark). Usage:
    python3 tools/oracle_check.py <verify_out_dir> <sf_dir>
Compares each <out>/<name> parquet against DuckDB running
<out>/oracle_sql.json's SQL over <sf_dir>'s tables: column names
(sorted), dtypes, row count, and exact values after sorting.
"""
import glob
import json
import sys

import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def main(outdir: str, sfdir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    failed = 0
    for name, sql in sorted(oracle.items()):
        try:
            exp = con.execute(sql).df()
            files = sorted(glob.glob(f"{outdir}/{name}/*.parquet"))
            got = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
            e, g = norm(exp), norm(got)
            status = []
            if list(e.columns) != list(g.columns):
                status.append(f"cols exp={list(e.columns)} got={list(g.columns)}")
            elif len(e) != len(g):
                status.append(f"rows exp={len(e)} got={len(g)}")
            else:
                for c in e.columns:
                    ev, gv = e[c], g[c]
                    if ev.dtype.kind == "f" or gv.dtype.kind == "f":
                        bad = (ev.astype(float).fillna(-1e308)
                               != gv.astype(float).fillna(-1e308))
                    else:
                        bad = ev.astype(str) != gv.astype(str)
                    if bad.any():
                        i = bad.idxmax()
                        status.append(
                            f"col {c}: {int(bad.sum())} diffs, first row {i}: "
                            f"exp={ev[i]!r} got={gv[i]!r}")
            if status:
                failed += 1
                print(f"FAIL {name}: " + "; ".join(status))
            else:
                print(f"ok   {name} ({len(e)} rows x {len(e.columns)} cols)")
        except Exception as ex:  # noqa: BLE001
            failed += 1
            print(f"ERROR {name}: {ex}")
    print(f"{len(oracle) - failed}/{len(oracle)} passed")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
