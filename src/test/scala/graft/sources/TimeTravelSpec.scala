package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Time travel: the v2 read sees the merge, the v1 read does not, and the
  * merge commit reuses untouched v1 files by manifest reference (real
  * copy-on-write, not a second full snapshot). */
class TimeTravelSpec extends AnyFunSuite with BeforeAndAfterAll {

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

  test("v1 read is pre-merge, v2 read is post-merge, untouched files shared") {
    val base = TimeTravel.buildDemo(spark, dir)
    val raw = spark.read.parquet(s"$dir/documents.parquet")
    val v1 = TimeTravel.readAsOf(spark, base, 1)
    val v2 = TimeTravel.readAsOf(spark, base, 2)

    // v1 ≡ the pre-merge corpus, byte-for-byte on text
    assert(v1.count() === raw.count())
    assert(v1.filter(col("text").endsWith(" v2")).count() === 0,
      "the v1 read must not see the merge")

    // v2: every surviving id <= 100 is updated, multiples of 17 are gone,
    // ids > 100 are untouched
    val deleted = raw.filter(col("doc_id") <= 100 && col("doc_id") % 17 === 0).count()
    assert(deleted > 0, "testdata must exercise the delete branch")
    assert(v2.count() === raw.count() - deleted)
    assert(v2.filter(col("doc_id") <= 100 && col("doc_id") % 17 === 0).count() === 0)
    assert(v2.filter(col("doc_id") <= 100 && !col("text").endsWith(" v2")).count() === 0,
      "every surviving merged row must carry the update")
    assert(v2.filter(col("doc_id") > 100 && col("text").endsWith(" v2")).count() === 0,
      "rows outside the merge predicate must be untouched")

    // copy-on-write: v2's manifest reuses v1 files and adds rewritten ones
    def manifest(v: Int) = spark.read.parquet(s"$base/manifests/v$v")
      .collect().map(_.getString(0)).toSet
    val (m1, m2) = (manifest(1), manifest(2))
    assert((m1 & m2).nonEmpty,
      "merge must carry untouched files by reference, not rewrite the table")
    assert((m2 -- m1).nonEmpty, "merge must add the rewritten file(s)")
    assert((m1 -- m2).nonEmpty, "the touched file(s) must leave the v2 manifest")
  }

  test("snapshot diff reads only the manifest delta, never the carried files") {
    val diff = TimeTravel.snapshotDiffQuery(spark, dir)
    val base = TimeTravel.baseDir(spark, dir)
    def manifest(v: Int) = spark.read.parquet(s"$base/manifests/v$v")
      .collect().map(_.getString(0)).toSet
    val (m1, m2) = (manifest(1), manifest(2))
    val carried = m1 & m2
    val delta = (m1 | m2) -- carried
    assert(carried.nonEmpty, "demo must carry files for the pruning claim to bite")

    // the plan's input set is exactly the manifest delta — carried files
    // contribute nothing to a copy-on-write diff and must not be opened
    val inputs = diff.inputFiles.map(p => new java.net.URI(p).getPath).toSet
    assert(inputs.subsetOf(delta), s"diff read outside the delta: ${inputs -- delta}")
    assert((inputs & carried).isEmpty, "diff opened a carried (unchanged) file")

    // row-level outcome: ids <= 100 update, multiples of 17 delete,
    // nothing else surfaces (unchanged riders are fingerprint-filtered)
    val rows = diff.collect()
    rows.foreach { r =>
      val id = r.getLong(0)
      assert(id <= 100, s"doc $id leaked into the diff")
      val expected = if (id % 17 == 0) "D" else "U"
      assert(r.getString(1) === expected)
      assert(r.getString(1) != "U" || r.getString(2) != r.getString(3))
    }
    val ids = rows.map(_.getLong(0)).toSet
    val expected = spark.read.parquet(s"$dir/documents.parquet")
      .filter(col("doc_id") <= 100).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(ids === expected, "diff must cover exactly the merge's touched ids")
  }

  test("expire v1 deletes exactly the unreachable files and keeps v2 whole") {
    val base = TimeTravel.buildDemo(spark, dir)
    def manifest(v: Int) = spark.read.parquet(s"$base/manifests/v$v")
      .collect().map(_.getString(0)).toSet
    val (m1, m2) = (manifest(1), manifest(2))
    val preRows = TimeTravel.readAsOf(spark, base, 2).count()

    val (deleted, surviving) = TimeTravel.expire(spark, base, 1)
    // accounting: exactly the v1-only files die, exactly v2's files survive
    assert(deleted === (m1 -- m2).size)
    assert(surviving === m2.size)
    // disk agrees: shared files still present, v1-only files gone
    (m1 -- m2).foreach(p => assert(!new java.io.File(p).exists(), s"leaked: $p"))
    m2.foreach(p => assert(new java.io.File(p).exists(), s"GC'd live file: $p"))
    // the v1 manifest is gone, the v2 read is untouched by the vacuum
    assert(!new java.io.File(s"$base/manifests/v1").exists())
    assert(TimeTravel.readAsOf(spark, base, 2).count() === preRows)
    // a second expire has no surviving-version target left to protect v2
    assertThrows[IllegalArgumentException](TimeTravel.expire(spark, base, 2))
  }
}
