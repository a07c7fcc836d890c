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

  /** Collision-free corpus key: a readable sanitized form (every
    * character outside [A-Za-z0-9._-] mapped to '_') plus a SHA-256
    * suffix of the EXACT path. The substitution alone is not injective —
    * '_' is inside the allowed class, so `/a/b` and `/a_b` sanitize
    * identically (round-7 ADVICE) — but the digest is collision-free, so
    * two distinct corpus paths can never alias one shared artifact. */
  def sanitize(p: String): String = {
    val digest = java.security.MessageDigest.getInstance("SHA-256")
      .digest(p.getBytes("UTF-8"))
      .take(6).map(b => f"${b & 0xff}%02x").mkString
    p.replaceAll("[^A-Za-z0-9._-]", "_") + "-" + digest
  }

  /** A tmpdir location shared ACROSS processes (publish must be atomic —
    * the caller stages + renames; see CdcOps.ordersChangelogArchive). */
  def shared(name: String, src: String): String =
    new java.io.File(sys.props("java.io.tmpdir"),
      s"$name-${sanitize(src)}").toString

  /** An EPHEMERAL per-process scratch root for artifacts with no
    * durability contract at all — the replay-feed streaming checkpoints:
    * a MemoryStream source cannot recover from a checkpoint (NOTES.md
    * gotcha 7), so those bytes exist only to satisfy the state-store
    * commit protocol within one run. Prefers tmpfs (/dev/shm) when
    * present so each micro-batch's state commits pay memory latency
    * rather than disk fsync; falls back to java.io.tmpdir. A
    * deployment's checkpoints carry a recovery contract and go to
    * durable storage — never through this helper. */
  def ephemeral(name: String, src: String): String = {
    val shm = new java.io.File("/dev/shm")
    val base =
      if (shm.isDirectory && shm.canWrite) shm
      else new java.io.File(sys.props("java.io.tmpdir"))
    new java.io.File(base,
      s"$name-${sanitize(src)}-p${ProcessHandle.current().pid()}").toString
  }

  /** A tmpdir location private to THIS driver process, for artifacts that
    * are wiped and rebuilt per invocation (keyed by pid so concurrent
    * drivers cannot interleave with the wipe; stable within the process
    * so reps reuse — and re-wipe — one location instead of leaking one
    * directory per rep). */
  def perProcess(name: String, src: String): String =
    new java.io.File(sys.props("java.io.tmpdir"),
      s"$name-${sanitize(src)}-p${ProcessHandle.current().pid()}").toString
}
