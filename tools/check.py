#!/usr/bin/env python3
"""Local pre-commit parity gate: mimic the driver's DuckDB-oracle compare.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

Reads each <outDir>/<name> parquet (Spark result), runs the matching oracle
SQL from <outDir>/oracle_sql.json in DuckDB against the sfDir tables, and
compares: schema (column names), row count, and value hash (columns sorted
by name, rows sorted by all columns).
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def norm_cell(v):
    if isinstance(v, float):
        return round(v, 9)
    return v


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        try:
            got = con.sql(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
            want = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: exception {e}")
            n_fail += 1
            continue
        g, w = canon(got), canon(want)
        if list(g.columns) != list(w.columns):
            print(f"FAIL {name}: columns {list(g.columns)} != {list(w.columns)}")
            n_fail += 1
            continue
        if len(g) != len(w):
            print(f"FAIL {name}: rows {len(g)} != {len(w)}")
            n_fail += 1
            continue
        mismatch = None
        for col in g.columns:
            gv = [norm_cell(x) for x in g[col].tolist()]
            wv = [norm_cell(x) for x in w[col].tolist()]
            if str(gv) != str(wv):
                for i, (a, b) in enumerate(zip(gv, wv)):
                    if str(a) != str(b):
                        mismatch = (col, i, a, b)
                        break
                break
        if mismatch:
            col, i, a, b = mismatch
            print(f"FAIL {name}: col={col} row={i} spark={a!r} duckdb={b!r}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(g)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass / {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
