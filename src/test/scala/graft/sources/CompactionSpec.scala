package graft.sources

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Small-file compaction: the rewrite must hit the exact target file
  * count and lose nothing. */
class CompactionSpec extends AnyFunSuite with BeforeAndAfterAll {

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

  test("compaction: exact target file count, lossless row set") {
    val out = Compaction.compact(spark, dir, files = 4)
    assert(out.count() === spark.read.parquet(s"$dir/documents.parquet").count())
    val parts = new java.io.File(Compaction.outDir(spark, dir))
      .listFiles().count(f => f.getName.endsWith(".parquet"))
    assert(parts === 4, s"expected 4 compacted files, found $parts")
  }
}
