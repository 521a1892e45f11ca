#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle compare.

Usage: python3 tools/compare.py <sfDir> <verifyOutDir> [query ...]

For each query: read Spark's parquet output, run the oracle SQL from
oracle_sql.json in DuckDB (tables registered as views over sfDir), sort
columns by name, sort rows, compare values. Prints PASS/FAIL per query
plus a sample diff on mismatch.
"""
import sys, json, math
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize cell values to hashable, comparable canonical forms
    def norm(v):
        if isinstance(v, float):
            if math.isnan(v):
                return "NaN"
            return repr(v)  # full precision
        if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
            return "[" + ",".join(str(norm(x)) for x in v) + "]"
        if v is None or v is pd.NaT:
            return "NULL"
        return str(v)
    out = df.apply(lambda c: c.map(norm))
    out = out.sort_values(by=list(out.columns), kind="mergesort").reset_index(drop=True)
    return out

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    con = duckdb.connect()
    rcon = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        try:
            got = rcon.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
        except Exception as e:
            print(f"FAIL {name}: cannot read spark output: {e}"); n_fail += 1; continue
        try:
            exp = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}"); n_fail += 1; continue
        g, x = canon(got), canon(exp)
        if list(g.columns) != list(x.columns):
            print(f"FAIL {name}: columns spark={list(g.columns)} oracle={list(x.columns)}")
            n_fail += 1; continue
        if len(g) != len(x):
            print(f"FAIL {name}: rows spark={len(g)} oracle={len(x)}")
            n_fail += 1; continue
        if g.equals(x):
            print(f"PASS {name} ({len(g)} rows)"); n_pass += 1
        else:
            neq = (g != x).any(axis=1)
            print(f"FAIL {name}: {int(neq.sum())}/{len(g)} rows differ; first diffs:")
            idx = list(g.index[neq])[:3]
            for i in idx:
                print(f"  spark : {g.loc[i].to_dict()}")
                print(f"  oracle: {x.loc[i].to_dict()}")
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
