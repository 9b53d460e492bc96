package graft.sources

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** CROSS-PROCESS lifecycle contract of the shared artifact store
  * (VERDICT r13 items 1 + 6). ArtifactStoreSpec proves the policy
  * inside one JVM; the r12 failure was CROSS-process (the driver's
  * gate JVM reading through cached manifests while `sbt test` swept
  * and rebuilt), so this spec forks a REAL second JVM
  * ([[CrossProcessChild]] — own SparkContext, own caches, same store)
  * and proves:
  *
  *  1. **Write-once across processes** (the r14 promotion of the
  *     standing dedup indexes): a second process asking for d19's
  *     fingerprint index REUSES the published artifact — zero builds
  *     in the child — instead of re-paying the land per process as the
  *     r13 applicationId-scoped scratch did.
  *  2. **Rebuild-under-the-same-path by another process is absorbed**:
  *     the child deletes and re-lands the artifact (fresh part-file
  *     UUIDs — the exact r12 s35/s37 death state, but cross-process);
  *     the parent, which had already listed the old manifest, must
  *     serve the next probe correctly (the `_SOURCE` generation marker
  *     re-keys the relation cache; an IN-FLIGHT read's retry is pinned
  *     in ArtifactStoreSpec). */
class CrossProcessStoreSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val dir = "/root/testdata/sf0.001"
  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  /** Fork a real child JVM on the test classpath (Test/fork is on, so
    * `java.class.path` IS the full test classpath) with the same
    * JDK-17 module opens Spark needs. Returns (exit, stdout, stderr). */
  private def fork(args: String*): (Int, String, String) = {
    val opens = Seq(
      "java.lang", "java.lang.invoke", "java.lang.reflect", "java.io",
      "java.net", "java.nio", "java.util", "java.util.concurrent",
      "java.util.concurrent.atomic", "sun.nio.ch", "sun.nio.cs",
      "sun.security.action", "sun.util.calendar")
      .flatMap(p => Seq("--add-opens", s"java.base/$p=ALL-UNNAMED"))
    val cmd = Seq(s"${sys.props("java.home")}/bin/java") ++ opens ++ Seq(
      "-Xmx4g", "-Dspark.ui.enabled=false",
      "-Dspark.sql.session.timeZone=UTC",
      "-cp", sys.props("java.class.path"),
      "graft.sources.CrossProcessChild") ++ args
    val pb = new ProcessBuilder(cmd: _*)
    val p = pb.start()
    val out = new String(p.getInputStream.readAllBytes())
    val err = new String(p.getErrorStream.readAllBytes())
    val done = p.waitFor(300, java.util.concurrent.TimeUnit.SECONDS)
    assert(done, s"child JVM did not finish in 300 s\nstderr:\n" +
      err.takeRight(2000))
    (p.exitValue(), out, err)
  }

  private def field(out: String, key: String): String =
    out.linesIterator.find(_.startsWith(s"$key:"))
      .map(_.drop(key.length + 1))
      .getOrElse(fail(s"child printed no $key line:\n$out"))

  test("a second PROCESS reuses the published standing index without " +
       "re-landing (VERDICT r13 item 1: the write-once nightly-index " +
       "contract, proven against a real forked JVM)") {
    val parentPath = graft.ops.Dedup.fpIndexPath(spark, dir)
    val (exit, out, err) = fork("land", dir)
    assert(exit === 0, s"child failed:\n${err.takeRight(3000)}")
    assert(field(out, "PATH") === parentPath,
      "child resolved a different artifact path — the store key is " +
        "not a pure function of (tag, version, source generation)")
    assert(field(out, "LANDS") === "0",
      "child re-landed an already-published index — the per-process " +
        "re-land cost the r14 promotion exists to remove")
  }

  test("a delete-and-rebuild by ANOTHER process under the same path is " +
       "served correctly through this process's previously-listed " +
       "manifest (the r12 driver-gate-vs-sbt death, cross-process)") {
    val path = graft.ops.Dedup.fpIndexPath(spark, dir)
    val probeFps = graft.Tables.documents(spark, dir).limit(3)
      .selectExpr("md5(trim(regexp_replace(lower(text), '\\\\s+', ' '))) fp")
      .collect().map(_.getString(0)).toSeq
    // parent lists the manifest and serves a probe through it
    val before = graft.ops.Dedup.fpProbe(spark, dir, probeFps)
      .collect().map(_.toString).sorted.toSeq
    val genBefore = new java.io.File(path, "_SOURCE").lastModified()
    // child: external janitor deletes + republishes with fresh UUIDs
    val (exit, out, err) = fork("reland", dir)
    assert(exit === 0, s"child failed:\n${err.takeRight(3000)}")
    assert(field(out, "PATH") === path)
    assert(field(out, "LANDS").toInt >= 1, "child did not rebuild")
    val genAfter = new java.io.File(path, "_SOURCE").lastModified()
    assert(genAfter != genBefore,
      "rebuild did not advance the _SOURCE generation marker")
    // the parent's next probe must relist (generation re-key), not
    // replay the dead manifest
    val after = graft.ops.Dedup.fpProbe(spark, dir, probeFps)
      .collect().map(_.toString).sorted.toSeq
    assert(after === before)
  }
}
