package graft

import graft.plans.AsOfJoinStrategy
import org.apache.spark.sql.SparkSession

/** Config-time `spark.sql.extensions=graft.plans.GraftExtensions` — the
  * session-construction injection path. The runtime `register()` path is
  * exercised all over the suite (AsOfJoin.asof self-registers;
  * SqlFunctions.register), but injection at BUILD time only runs inside
  * `SparkSession`'s constructor, which the shared-session specs never
  * re-enter. Force it: clear the default/active session, build a fresh
  * session over the SAME SparkContext with the extensions conf, assert
  * the strategy and SQL functions arrived with zero runtime calls, then
  * restore the shared session (other suites' lazy `getOrCreate` must
  * keep resolving to it). */
class ExtensionsSpec extends SparkSpec {

  test("a fresh session with spark.sql.extensions gets the strategy and " +
      "SQL kernels with no runtime registration") {
    val shared = spark // force-init the shared session first
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    // spark.sql.extensions is a STATIC conf: session construction reads
    // it from the (shared) SparkContext's conf, not from builder options
    // — builder .config alone logs "some configuration may not take
    // effect" and injects nothing. Set it on the context conf for the
    // duration of the build; existing sessions cloned their conf at
    // their own construction and are unaffected.
    // SparkContext.conf is private[spark] to scalac but a public method
    // in bytecode — reflect to reach the LIVE conf (getConf is a copy)
    val liveConf = classOf[org.apache.spark.SparkContext].getMethod("conf")
      .invoke(shared.sparkContext).asInstanceOf[org.apache.spark.SparkConf]
    liveConf.set("spark.sql.extensions", "graft.plans.GraftExtensions")
    try {
      val s2 = SparkSession.builder().getOrCreate()
      assert(s2 ne shared, "builder must have constructed a NEW session")
      // nothing called register()/asof() on s2, so presence can only
      // come from the config-time injection
      assert(s2.experimental.extraStrategies.isEmpty)
      assert(s2.sessionState.planner.strategies.contains(AsOfJoinStrategy),
        "config-injected planner strategy missing")
      // injected SQL functions resolve by bare name in spark.sql
      val sh = s2.sql(
        "SELECT word_shingles('a b c d e f', 4) AS sh").collect().head
      assert(sh.getSeq[String](0).size == 3)
      val hd = s2.sql(
        "SELECT float_dot(array(1.0f, 2.0f), array(3.0f, 4.0f)) AS d")
        .collect().head
      assert(hd.getDouble(0) == 11.0)
    } finally {
      liveConf.remove("spark.sql.extensions")
      SparkSession.setDefaultSession(shared)
      SparkSession.setActiveSession(shared)
    }
  }
}
