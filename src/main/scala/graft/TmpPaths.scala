package graft

/** Temp-path hygiene for the fixture/index artifacts the queries stage
  * under `java.io.tmpdir`.
  *
  * Two rules (round-6 ADVICE): key shared locations by the SANITIZED FULL
  * source path — `hashCode` can collide and silently reuse the wrong
  * corpus's artifact — and give rebuild-per-invocation artifacts a
  * per-process suffix so two drivers on the same machine (bench and
  * verify) can never watch each other's wipe-and-rebuild windows.
  */
object TmpPaths {

  /** Collision-free corpus key: the full path with every character
    * outside [A-Za-z0-9._-] mapped to '_'. Distinct real paths can only
    * collide if they differ solely in separator characters — which on one
    * filesystem means they were the same location anyway. */
  def sanitize(p: String): String = p.replaceAll("[^A-Za-z0-9._-]", "_")

  /** A tmpdir location shared ACROSS processes (publish must be atomic —
    * the caller stages + renames; see CdcOps.ordersChangelogArchive). */
  def shared(name: String, src: String): String =
    new java.io.File(sys.props("java.io.tmpdir"),
      s"$name-${sanitize(src)}").toString

  /** A tmpdir location private to THIS driver process, for artifacts that
    * are wiped and rebuilt per invocation (keyed by pid so concurrent
    * drivers cannot interleave with the wipe; stable within the process
    * so reps reuse — and re-wipe — one location instead of leaking one
    * directory per rep). */
  def perProcess(name: String, src: String): String =
    new java.io.File(sys.props("java.io.tmpdir"),
      s"$name-${sanitize(src)}-p${ProcessHandle.current().pid()}").toString
}
