ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "cdcdebeziumspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// Forked-run stdout must reach the console UNDECORATED: the default
// LoggedOutput strategy prefixes every line with "[info] ", which broke
// the driver's JSON parse of Bench's result line in rounds 4-7
// ("parsed": null — the bare `{"metric":...}` line never appeared in the
// captured stream). StdoutOutput pipes the child's stdout/stderr straight
// through to sbt's own stdout/stderr with no logger framing.
outputStrategy := Some(StdoutOutput)
run / outputStrategy := Some(StdoutOutput)
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
) ++
  // scratch-volume knob (local profiling): point the forked JVM's tmpdir
  // (streaming checkpoints, fixture staging, shuffle scratch) at e.g.
  // tmpfs — SPARK_GRAFT_TMPDIR=/dev/shm/graft-tmp
  sys.env.get("SPARK_GRAFT_TMPDIR")
    .map(d => s"-Djava.io.tmpdir=$d").toSeq ++
  // local A/B profiling knob only (the driver never sets it): pass ad-hoc
  // spark confs into the forked Verify/Bench JVM, e.g.
  // SPARK_GRAFT_CONF="spark.sql.adaptive.enabled=false"
  sys.env.get("SPARK_GRAFT_CONF").toSeq.flatMap(_.split(';'))
    .filter(_.contains("=")).map("-Dspark." + _.stripPrefix("spark."))
