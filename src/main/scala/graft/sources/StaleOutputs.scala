package graft.sources

/** GC for applicationId-scoped scratch outputs. Every sink in this
  * package (and the streaming sinks) writes under
  * `java.io.tmpdir/graft_<tag>/<applicationId>/…` so concurrent
  * applications never collide — but a finished application's directory
  * can never be read again. Each writer calls [[sweep]] before writing:
  * sibling application directories under the same tag are deleted, so
  * the scratch area holds at most one live generation per tag. */
object StaleOutputs {

  def sweep(tag: String, keepApplicationId: String): Unit = {
    val parent = new java.io.File(s"${sys.props("java.io.tmpdir")}/$tag")
    val stale = Option(parent.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName != keepApplicationId)
    stale.foreach(deleteRecursively)
  }

  private def deleteRecursively(f: java.io.File): Unit = {
    if (f.isDirectory)
      Option(f.listFiles()).getOrElse(Array.empty).foreach(deleteRecursively)
    f.delete()
  }
}
