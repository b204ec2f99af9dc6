#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate.

Usage: python3 tools/check_oracles.py <sfDir> <verifyOutDir>

Runs each oracle_sql.json entry in DuckDB over the sfDir parquet tables,
loads the Spark result parquet from verifyOutDir/<name>, canonicalizes
both (columns sorted by name), and compares values exactly.
"""
import json, sys, glob, os
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    return df.reset_index(drop=True)


def cell(v):
    if v is None or v != v:  # NaN/None
        return "NULL"
    if isinstance(v, float):
        return repr(v)
    return str(v)


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_ok = n_bad = 0
    for name, sql in sorted(oracles.items()):
        if only is not None and name not in only:
            continue
        spark_files = glob.glob(os.path.join(out_dir, name, "*.parquet"))
        if not spark_files:
            print(f"FAIL {name}: no spark output")
            n_bad += 1
            continue
        try:
            got = canon(pd.concat([pd.read_parquet(f) for f in sorted(spark_files)]))
            want = canon(con.sql(sql).df())
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_bad += 1
            continue
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} vs {list(want.columns)}")
            n_bad += 1
            continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} vs {len(want)}")
            n_bad += 1
            continue
        gs = got.map(cell)
        ws = want.map(cell)
        neq = (gs != ws)
        if neq.any().any():
            n_bad += 1
            rows = neq.any(axis=1)
            idx = list(rows[rows].index[:3])
            print(f"FAIL {name}: {int(neq.sum().sum())} cell diffs, first rows {idx}")
            for i in idx:
                for c in got.columns:
                    if gs.at[i, c] != ws.at[i, c]:
                        print(f"   row {i} col {c}: spark={gs.at[i, c]!r} duck={ws.at[i, c]!r}")
        else:
            print(f"OK   {name} ({len(got)} rows)")
            n_ok += 1
    print(f"== {n_ok} ok, {n_bad} fail ==")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
