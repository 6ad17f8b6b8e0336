#!/usr/bin/env python3
"""Local pre-validation of the driver's DuckDB-oracle compare.

Usage: check_oracle.py <sfDir> <verifyOutDir> [name,name,...]

The optional third arg restricts the compare to those query names — pass
the same filter a filtered `graft.Verify` run got, so a fast iteration
loop doesn't report missing-file FAILs for every query it didn't rerun.

Mimics the driver: for each query result parquet under verifyOutDir and its
oracle SQL (oracle_sql.json), run the SQL in DuckDB with views over the
sfDir parquet tables, sort columns by name, canonicalize row order, and
compare cell values. Not shipped engine code — builder-side tooling only.
"""
import json
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    df.columns = range(len(df.columns))  # driver compares positionally after sort
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def main(sf_dir, out_dir, only=None):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    if only is not None:
        unknown = only - set(oracles)
        if unknown:
            print(f"FAIL filter names not in oracle_sql.json: "
                  f"{', '.join(sorted(unknown))}")
            return 1
        oracles = {n: s for n, s in oracles.items() if n in only}
    n_ok = n_bad = 0
    for name, sql in sorted(oracles.items()):
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").df()
            want = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: exec error: {e}")
            n_bad += 1
            continue
        g, w = canon(got), canon(want)
        if list(g.columns) != list(w.columns) or len(g) != len(w):
            print(f"FAIL {name}: shape got={g.shape} want={w.shape} "
                  f"cols got={sorted(got.columns)} want={sorted(want.columns)}")
            n_bad += 1
            continue
        try:
            import pandas.testing as pt
            pt.assert_frame_equal(g, w, check_dtype=False, check_exact=True)
            print(f"ok   {name} ({len(g)} rows)")
            n_ok += 1
        except AssertionError as e:
            msg = str(e).replace("\n", " | ")[:300]
            print(f"FAIL {name}: {msg}")
            n_bad += 1
    print(f"\n{n_ok} ok, {n_bad} fail")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2],
                  set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None))
