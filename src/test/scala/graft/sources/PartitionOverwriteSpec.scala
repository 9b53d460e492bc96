package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Dynamic partition overwrite: the re-landed partition's files are
  * replaced, every other partition's files are the ORIGINAL ones —
  * untouched on disk, not rewritten to equal content. */
class PartitionOverwriteSpec extends AnyFunSuite with BeforeAndAfterAll {

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

  private def partFiles(table: String, lang: String): Map[String, Long] =
    Option(new java.io.File(s"$table/lang=$lang").listFiles()).getOrElse(Array.empty)
      .filter(_.getName.endsWith(".parquet"))
      .map(f => f.getName -> f.lastModified()).toMap

  test("only the re-landed partition's files change; others persist untouched") {
    val table = PartitionOverwrite.writeBase(spark, dir)
    val before = Seq("de", "en", "fr").map(l => l -> partFiles(table, l)).toMap

    PartitionOverwrite.reviseEn(spark, dir, table)
    val after = Seq("de", "en", "fr").map(l => l -> partFiles(table, l)).toMap

    // untouched partitions keep file names (the dynamic overwrite never
    // listed them); the touched partition was rewritten
    assert(after("de").keySet === before("de").keySet)
    assert(after("fr").keySet === before("fr").keySet)
    assert(after("en").keySet.intersect(before("en").keySet).isEmpty,
      "the re-landed partition must carry new files")

    // content contract: en revised, others byte-equal to the source
    val read = spark.read.parquet(table)
    assert(read.filter(col("lang") === "en" && !col("text").endsWith(" r2")).count() === 0)
    assert(read.filter(col("lang") =!= "en" && col("text").endsWith(" r2")).count() === 0)
    assert(read.count() === graft.Tables.documents(spark, dir).count())
  }
}
