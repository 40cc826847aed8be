#!/usr/bin/env python3
"""Local stand-in for the driver's t2 correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (written by `graft.Verify`),
replays <verifyOutDir>/oracle_sql.json in DuckDB over the sfDir tables,
sorts columns by name (like the driver), and compares row-by-row.
"""
import json
import math
import sys

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v


def main(sf_dir, out_dir):
    con = duckdb.connect()
    con.sql("SET TimeZone='UTC'")
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = con.sql(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").fetchall()
            gcols = [d[0] for d in con.sql(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet' LIMIT 0").description]
        except Exception as e:
            print(f"FAIL {name}: spark output unreadable: {e}")
            n_bad += 1
            continue
        try:
            rel = con.sql(sql)
            want = rel.fetchall()
            wcols = [d[0] for d in rel.description]
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}")
            n_bad += 1
            continue
        # driver sorts columns by name before hashing
        gidx = [i for _, i in sorted((c, i) for i, c in enumerate(gcols))]
        widx = [i for _, i in sorted((c, i) for i, c in enumerate(wcols))]
        if sorted(gcols) != sorted(wcols):
            print(f"FAIL {name}: columns {sorted(gcols)} vs {sorted(wcols)}")
            n_bad += 1
            continue
        g = [tuple(norm(r[i]) for i in gidx) for r in got]
        w = [tuple(norm(r[i]) for i in widx) for r in want]
        if len(g) != len(w):
            print(f"FAIL {name}: {len(g)} rows vs oracle {len(w)}")
            n_bad += 1
            continue
        bad = [(i, a, b) for i, (a, b) in enumerate(zip(g, w)) if a != b]
        if bad:
            i, a, b = bad[0]
            print(f"FAIL {name}: {len(bad)}/{len(g)} rows differ; "
                  f"first at {i}:\n  spark:  {a}\n  oracle: {b}")
            n_bad += 1
        else:
            print(f"OK   {name}: {len(g)} rows")
            n_ok += 1
    print(f"== {n_ok} ok, {n_bad} fail ==")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
