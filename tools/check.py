#!/usr/bin/env python3
"""Local pre-check mimicking the driver's correctness gate.

Usage: tools/check.py [sf_dir] [out_dir] [--only name1,name2] [--sf1]
                      [--types-only]

Comparison is TYPE-AWARE (r15): the driver's hash is type-sensitive, so an
oracle emitting int128 (HUGEINT) or any column type differing from the
Spark parquet dump FAILS here even when the values match. --types-only
skips the data compare and just DESCRIBEs every oracle for int128 columns
(fast pre-commit scan; needs only oracle_sql.json, not the dumps).

Assumes `graft.Verify` already ran:  sbt "runMain graft.Verify <sf_dir> <out_dir>"
Then for each entry in <out_dir>/oracle_sql.json, runs the oracle in DuckDB
over the same parquet tables and compares against the Spark parquet dump:
column set (sorted by name), then row-sorted exact values.

--sf1 (or --bounded-cc): evaluate the two connected-components oracles
(dedup_clusters, pipeline_clean_corpus_cc) with BOUNDED-ITERATION min-label
propagation over the same pair tables instead of their recursive-CTE
transitive closure. The committed CTE enumerates paths — ~40 min of DuckDB
CPU EACH on the dup-dense sf1 corpus — while propagation is
O(diameter) joins over the edge list (seconds). Same fixpoint, so the
comparison is unchanged; use for sf1-scale sweeps:
    tools/make_sf1.py                                  # -> /tmp/graft_sf1
    sbt "runMain graft.Verify /tmp/graft_sf1 /tmp/graft_verify_sf1"
    tools/check.py /tmp/graft_sf1 /tmp/graft_verify_sf1 --sf1
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
    types = [str(t) for t in rel.types]
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(canon(r[i]) for i in order) for r in rel.fetchall()]
    return sorted(cols), sorted(out), [types[i] for i in order]


def iterative_cc(con, pairs_sql, max_rounds=256):
    """Min-label propagation over the undirected pair graph into temp table
    cc_lbl(v, l) — the bounded-iteration twin of the committed oracles'
    recursive-CTE closure (same fixpoint: l = min doc_id of v's component;
    vertex set = pair endpoints, exactly the CTE's). Each round is ONE
    vectorized join+aggregate in DuckDB, and rounds = graph diameter, vs
    the CTE's path enumeration (combinatorial on dup-dense corpora)."""
    con.sql(f"""CREATE OR REPLACE TEMP TABLE cc_e AS
        WITH p AS ({pairs_sql})
        SELECT da AS u, db AS v FROM p UNION SELECT db, da FROM p""")
    con.sql("CREATE OR REPLACE TEMP TABLE cc_lbl AS "
            "SELECT DISTINCT u AS v, u AS l FROM cc_e")
    for _ in range(max_rounds):
        con.sql("""CREATE OR REPLACE TEMP TABLE cc_nl AS
            SELECT v, MIN(l) AS l FROM (
              SELECT v, l FROM cc_lbl
              UNION ALL
              SELECT e.v AS v, b.l FROM cc_e e JOIN cc_lbl b ON e.u = b.v
            ) GROUP BY v""")
        changed = con.sql(
            "SELECT count(*) FROM cc_nl n JOIN cc_lbl o USING (v) "
            "WHERE n.l <> o.l").fetchone()[0]
        con.sql("CREATE OR REPLACE TEMP TABLE cc_lbl AS "
                "SELECT v, l FROM cc_nl")
        if changed == 0:
            return
    raise RuntimeError(f"CC did not converge in {max_rounds} rounds")


# The committed oracle text for both CC queries is `WITH ... jp AS (...),
# e AS (...), reach(...) ...` — everything through jp (the verified pair
# table) is reused VERBATIM by slicing the SQL at the `e AS (` seam, so
# the bounded path can never drift from the committed pair semantics.
CC_SEAM = ",\ne AS (SELECT"

# name -> final select over the propagated labels (cc_lbl) appended to the
# oracle's own CTE prefix. DuckDB only evaluates CTEs a query references,
# so the pipeline form's reuse of the prefix for g2 does not re-pay jp.
CC_FINAL = {
    "dedup_clusters": """
        SELECT l AS component, COUNT(*) AS size,
          array_to_string(list_sort(list(v)), ',') AS members
        FROM cc_lbl GROUP BY l ORDER BY component""",
    "pipeline_clean_corpus_cc": None,     # prefix-dependent, built below
    "pipeline_clean_keep_longest": None,  # prefix-dependent, built below
    "sample_split_safe": """
        SELECT d.doc_id, d.lang,
          COALESCE(l.l, d.doc_id) AS component,
          CASE WHEN substr(md5(CAST(COALESCE(l.l, d.doc_id)
                 AS VARCHAR)), 1, 1) IN ('c', 'd') THEN 'val'
               WHEN substr(md5(CAST(COALESCE(l.l, d.doc_id)
                 AS VARCHAR)), 1, 1) IN ('e', 'f') THEN 'test'
               ELSE 'train' END AS split
        FROM documents d LEFT JOIN cc_lbl l ON d.doc_id = l.v
        ORDER BY doc_id""",
}


def bounded_cc(con, name, sql):
    if CC_SEAM not in sql:
        raise RuntimeError(f"{name}: oracle SQL has no `e AS` seam")
    prefix = sql[:sql.index(CC_SEAM)]  # WITH ... jp AS (...)
    iterative_cc(con, prefix + "\nSELECT da, db FROM jp")
    if name in ("dedup_clusters", "sample_split_safe"):
        return con.sql(CC_FINAL[name])
    if name == "pipeline_clean_corpus_cc":
        return con.sql(prefix + """
            SELECT doc_id, lang, n_tokens FROM g2
            WHERE doc_id NOT IN (SELECT v FROM cc_lbl WHERE l <> v)
            ORDER BY doc_id""")
    if name == "pipeline_clean_keep_longest":
        return con.sql(prefix + """
            SELECT doc_id, lang, n_tokens FROM (
              SELECT g2.doc_id, g2.lang, g2.n_tokens,
                ROW_NUMBER() OVER (
                  PARTITION BY COALESCE(l.l, g2.doc_id)
                  ORDER BY g2.n_tokens DESC, g2.doc_id) AS rn
              FROM g2 LEFT JOIN cc_lbl l ON g2.doc_id = l.v)
            WHERE rn = 1
            ORDER BY doc_id""")
    raise RuntimeError(f"no bounded form for {name}")


def types_only(con, oracle):
    """Fast int128 scan, no Verify run needed: DESCRIBE every oracle (plans
    without executing) and fail on any HUGEINT/UHUGEINT output column —
    the class of driver-red bug r14 shipped (DuckDB window SUM over BIGINT
    widens to int128; the driver's hash is type-sensitive)."""
    n_fail = 0
    for name in sorted(oracle):
        try:
            desc = con.sql(f"DESCRIBE ({oracle[name]})").fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        huge = [(c, t) for c, t, *_ in desc if "HUGEINT" in str(t)]
        if huge:
            print(f"FAIL {name}: int128 oracle column(s) {huge} — "
                  "CAST to BIGINT")
            n_fail += 1
    print(f"\ntypes-only: {len(oracle) - n_fail} clean, {n_fail} int128")
    sys.exit(1 if n_fail else 0)


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf = args[0] if len(args) > 0 else "/root/testdata/sf0.01"
    out = args[1] if len(args) > 1 else "/tmp/graft_verify"
    only = None
    argv = sys.argv[1:]
    bounded = any(a in ("--sf1", "--bounded-cc") for a in argv)
    for i, a in enumerate(argv):
        if a.startswith("--only"):
            val = a.split("=", 1)[1] if "=" in a else (
                argv[i + 1] if i + 1 < len(argv) else "")
            only = set(val.split(",")) if val else None

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")

    oracle = json.load(open(f"{out}/oracle_sql.json"))
    if "--types-only" in argv:
        types_only(con, oracle)
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
            if bounded and name in CC_FINAL:
                ecols, erows, etypes = rows_of(bounded_cc(con, name, oracle[name]))
            else:
                ecols, erows, etypes = rows_of(con.sql(oracle[name]))
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        try:
            gcols, grows, gtypes = rows_of(
                con.sql(f"SELECT * FROM read_parquet('{out}/{name}/*.parquet')"))
        except Exception as e:
            print(f"FAIL {name}: spark dump read error: {e}")
            n_fail += 1
            continue
        if ecols != gcols:
            print(f"FAIL {name}: columns differ\n  oracle: {ecols}\n  spark:  {gcols}")
            n_fail += 1
            continue
        # TYPE gate: the driver's hash is type-sensitive where canon() is
        # not — an int128 oracle column (DuckDB window SUM over BIGINT →
        # HUGEINT) is value-identical locally yet driver-RED. Reject int128
        # outright, and fail any oracle-vs-spark type divergence so
        # local-green implies driver-green.
        huge = [(c, t) for c, t in zip(ecols, etypes) if "HUGEINT" in t]
        if huge:
            print(f"FAIL {name}: oracle emits int128 column(s) {huge} — "
                  "CAST to BIGINT in the oracle SQL (driver hash is "
                  "type-sensitive)")
            n_fail += 1
            continue
        tdiff = [(c, te, tg) for c, te, tg in zip(ecols, etypes, gtypes)
                 if te != tg]
        if tdiff:
            print(f"FAIL {name}: column types differ (oracle vs spark dump):")
            for c, te, tg in tdiff:
                print(f"  {c}: oracle {te} vs spark {tg}")
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
