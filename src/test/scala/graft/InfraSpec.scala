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

  test("the AQE bench knob stays a bench knob: only Bench.scala reads " +
      "SPARK_GRAFT_AQE") {
    // The benchmark disables AQE at its SF on a recorded A/B; that tuning
    // must never leak into Verify (the correctness path) or operator
    // code, where it could change graded semantics or deployment
    // defaults. Source-level pin: the env var's name appears in exactly
    // one non-test file.
    import scala.jdk.CollectionConverters._
    val offenders = java.nio.file.Files
      .walk(java.nio.file.Paths.get("src/main/scala")).iterator().asScala
      .filter(_.toString.endsWith(".scala"))
      .filter(p => java.nio.file.Files.readString(p).contains("SPARK_GRAFT_AQE"))
      .map(_.toString).toList.sorted
    assert(offenders == List("src/main/scala/graft/Bench.scala"),
      s"SPARK_GRAFT_AQE must be read only by Bench, found in: $offenders")
  }

  test("CATALOG.md is complete and current: every graded query has a " +
      "describe entry and the committed file matches the generator") {
    // completeness is checked inside render (require on key-set equality);
    // byte-identity keeps the committed file from going stale — on
    // failure, run `sbt "runMain graft.CatalogGen"` and commit.
    val rendered = graft.CatalogGen.render
    val committed = java.nio.file.Files.readString(
      java.nio.file.Paths.get("CATALOG.md"))
    assert(committed == rendered,
      "CATALOG.md is stale — regenerate with `sbt \"runMain graft.CatalogGen\"`")
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
