#!/usr/bin/env python3
"""Synthesize an sf1-scale testdata dir as key-shifted replication of sf0.1.

Usage: tools/make_sf1.py [src_sf_dir] [dst_dir] [replicas]
Defaults: /root/testdata/sf0.1 -> /tmp/graft_sf1, 10 replicas.

Every table is replicated `replicas` times with its key columns shifted by
i * 10_000_000 per replica, so FK chains (customer->orders->lineitem,
orders->lineitem part/supp) stay consistent inside each replica and never
collide across replicas. The two broadcast dims (region, nation) are
copied as-is — their keys are referenced unshifted (c_nationkey etc.), and
replicating them would change join semantics, not just scale.

Intentional consequences of the shape:
  - documents: same text under 10 distinct doc_ids => every doc sits in a
    10-copy duplicate group. This is the dup-DENSE corpus (template-spam
    shape) the near-dup family's quotient pre-pass and the LS/SS connected
    components are designed for — the whole point of the sf1 sweep.
  - events: user_id shifts with the replica, so per-user groupings scale
    in group COUNT, not group size (matching how a real corpus grows).

Timestamps (orders.o_orderdate, lineitem.l_shipdate, events.ts) pass
through DuckDB as TIMESTAMP (µs) — the same parquet type the harness
generates, so graft.sources.Tables.scan takes the same code path.

Driver-side tooling only (duckdb is not available to library code).
"""
import duckdb, os, sys

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
DST = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_sf1"
REPLICAS = int(sys.argv[3]) if len(sys.argv) > 3 else 10
OFF = 10_000_000  # > any base key at sf0.1 (max ~600k), so replicas never collide

KEYS = {
    "region": [],
    "nation": [],
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}


def main():
    os.makedirs(DST, exist_ok=True)
    con = duckdb.connect()
    for t, keys in KEYS.items():
        src = f"read_parquet('{SRC}/{t}.parquet')"
        if not keys:
            q = f"SELECT * FROM {src}"
        else:
            cols = [c[0] for c in
                    con.sql(f"DESCRIBE SELECT * FROM {src}").fetchall()]
            parts = []
            for i in range(REPLICAS):
                sel = ", ".join(
                    f"{c} + {i * OFF} AS {c}" if c in keys else c
                    for c in cols)
                parts.append(f"SELECT {sel} FROM {src}")
            q = " UNION ALL ".join(parts)
        con.sql(f"COPY ({q}) TO '{DST}/{t}.parquet' (FORMAT PARQUET)")
        n = con.sql(
            f"SELECT count(*) FROM read_parquet('{DST}/{t}.parquet')"
        ).fetchone()[0]
        print(f"{t}: {n} rows -> {DST}/{t}.parquet")


if __name__ == "__main__":
    main()
