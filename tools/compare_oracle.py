#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: for every query dumped by
graft.Verify, run its DuckDB oracle over the same parquet tables and compare
schema + values exactly (columns sorted by name, rows as produced —
every query ends in a total ORDER BY).

Usage: compare_oracle.py <sfDir> <verifyOutDir> [nameSubstr,nameSubstr,...]
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    if len(sys.argv) > 3:
        pats = sys.argv[3].split(",")
        oracles = {k: v for k, v in oracles.items() if any(p in k for p in pats)}
    n_ok = n_bad = 0
    for name, sql in sorted(oracles.items()):
        try:
            got = con.sql(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
            want = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: {str(e)[:200]}")
            n_bad += 1
            continue
        got = got[sorted(got.columns)]
        want = want[sorted(want.columns)]
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(want.columns)}")
            n_bad += 1
            continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} != {len(want)}")
            n_bad += 1
            continue
        mismatched = []
        for c in got.columns:
            a, b = got[c], want[c]
            if str(a.dtype) != str(b.dtype):
                mismatched.append(f"{c}: dtype {a.dtype} != {b.dtype}")
                continue
            eq = (a == b) | (a.isna() & b.isna())
            if not eq.all():
                i = int((~eq).idxmax())
                mismatched.append(
                    f"{c}: {int((~eq).sum())} diffs, first@{i}: {a[i]!r} != {b[i]!r}")
        if mismatched:
            print(f"FAIL {name}: " + "; ".join(mismatched[:4]))
            n_bad += 1
        else:
            print(f"ok   {name} ({len(got)} rows)")
            n_ok += 1
    print(f"\n{n_ok} ok, {n_bad} failed, "
          f"{len(oracles)} with oracle")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
