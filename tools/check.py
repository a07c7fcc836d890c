#!/usr/bin/env python3
"""Local pre-check mimicking the driver's correctness gate.

Usage: tools/check.py [sf_dir] [out_dir] [--only name1,name2]

Assumes `graft.Verify` already ran:  sbt "runMain graft.Verify <sf_dir> <out_dir>"
Then for each entry in <out_dir>/oracle_sql.json, runs the oracle in DuckDB
over the same parquet tables and compares against the Spark parquet dump:
column set (sorted by name), then row-sorted exact values.
"""
import duckdb, json, math, sys, os, glob
from datetime import datetime

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return float(v).hex()
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, datetime):
        return v.isoformat()
    if isinstance(v, list):
        return "[" + ",".join(canon(x) for x in v) + "]"
    return repr(v)


def rows_of(rel):
    cols = rel.columns
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(canon(r[i]) for i in order) for r in rel.fetchall()]
    return sorted(cols), sorted(out)


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf = args[0] if len(args) > 0 else "/root/testdata/sf0.01"
    out = args[1] if len(args) > 1 else "/tmp/graft_verify"
    only = None
    argv = sys.argv[1:]
    for i, a in enumerate(argv):
        if a.startswith("--only"):
            val = a.split("=", 1)[1] if "=" in a else (
                argv[i + 1] if i + 1 < len(argv) else "")
            only = set(val.split(",")) if val else None

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")

    oracle = json.load(open(f"{out}/oracle_sql.json"))
    declared = set(oracle)
    dumped = {os.path.basename(p) for p in glob.glob(f"{out}/*") if os.path.isdir(p)}
    n_pass = n_fail = 0
    for name in sorted(declared | dumped):
        if only and name not in only:
            continue
        if name not in oracle:
            print(f"  (rows-only) {name}: dumped, no oracle")
            continue
        if name not in dumped:
            print(f"FAIL {name}: no spark dump (query crashed?)")
            n_fail += 1
            continue
        try:
            ecols, erows = rows_of(con.sql(oracle[name]))
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        try:
            gcols, grows = rows_of(
                con.sql(f"SELECT * FROM read_parquet('{out}/{name}/*.parquet')"))
        except Exception as e:
            print(f"FAIL {name}: spark dump read error: {e}")
            n_fail += 1
            continue
        if ecols != gcols:
            print(f"FAIL {name}: columns differ\n  oracle: {ecols}\n  spark:  {gcols}")
            n_fail += 1
            continue
        if erows == grows:
            print(f"PASS {name} ({len(grows)} rows)")
            n_pass += 1
        else:
            print(f"FAIL {name}: rows differ (oracle {len(erows)}, spark {len(grows)})")
            diff = [(a, b) for a, b in zip(erows, grows) if a != b]
            for a, b in diff[:3]:
                print(f"  oracle: {a}\n  spark:  {b}")
            if len(erows) != len(grows):
                eset, gset = set(erows), set(grows)
                for r in list(eset - gset)[:2]:
                    print(f"  only-oracle: {r}")
                for r in list(gset - eset)[:2]:
                    print(f"  only-spark:  {r}")
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
