package graft.sources

/** GC for applicationId-scoped scratch outputs. Every sink in this
  * package (and the streaming sinks) writes under
  * `java.io.tmpdir/graft_<tag>/<applicationId>/…` so concurrent
  * applications never collide — but a finished application's directory
  * can never be read again. Each writer calls [[sweep]] before writing:
  * sibling application directories under the same tag that have been
  * quiet for longer than [[SweepTtlMs]] are deleted, so the scratch area
  * converges to one live generation per tag. The TTL is the liveness
  * guard: a CONCURRENTLY RUNNING application (bench alongside tests, two
  * bench passes) keeps touching its directory well inside the TTL, so
  * its in-flight sink/compaction/index output is never deleted
  * mid-write; only genuinely abandoned generations age out. */
object StaleOutputs {

  /** Sibling app dirs younger than this are presumed live and kept. */
  val SweepTtlMs: Long = 60L * 60 * 1000

  def sweep(tag: String, keepApplicationId: String): Unit = {
    val now = System.currentTimeMillis()
    val parent = new java.io.File(s"${sys.props("java.io.tmpdir")}/$tag")
    val stale = Option(parent.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName != keepApplicationId &&
        now - latestMtime(f) > SweepTtlMs)
    stale.foreach(deleteRecursively)
  }

  /** Newest mtime anywhere under `f` — a writer mid-flight keeps bumping
    * some file's mtime even when the top directory's is stale. */
  private def latestMtime(f: java.io.File): Long = {
    val children =
      if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty) else Array.empty[java.io.File]
    (f.lastModified() +: children.map(latestMtime)).max
  }

  /** Age-based sweep for SHARED (non-applicationId-scoped) scratch
    * parents — e.g. the cross-process ANN artifact store, whose entries
    * are keyed by content fingerprint rather than by application: any
    * subdirectory quiet for longer than [[SweepTtlMs]] is dead weight
    * (its testdata generation is gone or its format version was bumped)
    * and is removed; everything recent is presumed live, including
    * entries other concurrent processes are reading. */
  def sweepAged(parentPath: String): Unit = {
    val now = System.currentTimeMillis()
    val parent = new java.io.File(parentPath)
    Option(parent.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && now - latestMtime(f) > SweepTtlMs)
      .foreach(deleteRecursively)
  }

  /** Clear one output directory before a writer re-populates it from
    * scratch — the idempotency guard for APPEND-mode sinks that are
    * re-invoked within the SAME application (bench runs every query on
    * 3+ interleaved passes; without the reset each pass would append a
    * full duplicate generation to the still-live app-scoped dir). */
  def reset(path: String): Unit = deleteRecursively(new java.io.File(path))

  private def deleteRecursively(f: java.io.File): Unit = {
    if (f.isDirectory)
      Option(f.listFiles()).getOrElse(Array.empty).foreach(deleteRecursively)
    f.delete()
  }
}
