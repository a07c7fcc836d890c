package graft

import graft.sources.Tables

/** Infrastructure seams: temp-path hygiene ([[TmpPaths]]) and the
  * parallelized scan helper ([[Tables.scanPar]]). */
class InfraSpec extends SparkSpec {

  test("TmpPaths: keys derive from the full path, distinct per corpus " +
      "and per process") {
    assert(TmpPaths.sanitize("/root/testdata/sf0.1")
      .startsWith("_root_testdata_sf0.1-"))
    // distinct corpora → distinct keys (the hashCode scheme this replaced
    // could collide two corpora onto one artifact)
    assert(TmpPaths.shared("x", "/a/b") != TmpPaths.shared("x", "/a/c"))
    assert(TmpPaths.perProcess("x", "/a/b") != TmpPaths.perProcess("x", "/a/c"))
    // the substitution alone is NOT injective ('_' is in the allowed
    // class) — the digest suffix must separate paths that sanitize alike
    assert(TmpPaths.sanitize("/a/b") != TmpPaths.sanitize("/a_b"))
    assert(TmpPaths.sanitize("/a/b") != TmpPaths.sanitize("/a b"))
    // …while staying deterministic per path
    assert(TmpPaths.sanitize("/a/b") == TmpPaths.sanitize("/a/b"))
    // per-process paths carry this JVM's pid
    assert(TmpPaths.perProcess("x", "/a/b")
      .endsWith(s"p${ProcessHandle.current().pid()}"))
  }

  test("scanPar: identical rows to scan, widened to session parallelism") {
    val plain = Tables.scan(spark, sfDir, "documents")
      .orderBy("doc_id").collect()
    val par = Tables.scanPar(spark, sfDir, "documents")
    assert(par.rdd.getNumPartitions ==
      spark.sparkContext.defaultParallelism)
    assert(par.orderBy("doc_id").collect() === plain)
  }
}
