#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 scripts/selfcheck.py <verify_out_dir> <sf_dir> [query ...]

Reads each <out>/<name> parquet dump written by graft.Verify, runs the
matching SQL from <out>/oracle_sql.json in DuckDB against views over
<sf_dir>/*.parquet, sorts columns by name and rows by value, and
compares. Exit 1 on any mismatch.
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


STRICT = "--strict" in sys.argv  # row-ORDER-sensitive compare


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(
                lambda v: tuple(v) if isinstance(v, (list,)) else v)
        # mirror the driver's ns-precision hash normalization: a
        # timestamp outside int64-nanosecond range (e.g. a 9999-12-31
        # sentinel) must OVERFLOW here too, not pass locally and go
        # red at the driver gate (the r10 q_scd2 lesson)
        if str(df[c].dtype).startswith("datetime64[us"):
            df[c] = df[c].astype("datetime64[ns]")
    if not STRICT:
        df = df.sort_values(by=list(df.columns), kind="mergesort",
                            na_position="first")
    return df.reset_index(drop=True)


def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    only = set(a for a in sys.argv[3:] if not a.startswith("--"))
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    failures, passed, skipped = [], 0, 0
    for name, sql in sorted(oracles.items()):
        if only and name not in only:
            continue
        try:
            got = duckdb.connect().execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')"
            ).df()
        except Exception as e:
            failures.append((name, f"spark output unreadable: {e}"))
            continue
        try:
            want = con.execute(sql).df()
        except Exception as e:
            failures.append((name, f"oracle SQL failed: {e}"))
            continue
        g, w = canon(got), canon(want)
        if list(g.columns) != list(w.columns):
            failures.append((name, f"columns differ: spark={list(g.columns)} "
                                   f"oracle={list(w.columns)}"))
            continue
        gd = {c: str(t) for c, t in zip(g.columns, g.dtypes)}
        wd = {c: str(t) for c, t in zip(w.columns, w.dtypes)}
        if gd != wd:
            mism = {c: (gd[c], wd[c]) for c in gd if gd[c] != wd[c]}
            failures.append((name, f"dtypes differ (spark, oracle): {mism}"))
            continue
        if len(g) != len(w):
            failures.append((name, f"row count: spark={len(g)} oracle={len(w)}"))
            continue
        try:
            pd.testing.assert_frame_equal(g, w, check_dtype=False,
                                          check_exact=True)
            passed += 1
        except AssertionError as e:
            failures.append((name, str(e).split("\n")[0:6]))
    for name in sorted(set(oracles) - only if only else set()):
        pass
    print(f"PASS={passed} FAIL={len(failures)}")
    for name, why in failures:
        print(f"  FAIL {name}: {why}")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
