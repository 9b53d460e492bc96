package graft.sources

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** JSONL corpus sink/source: byte-faithful round trip and lang-partition
  * pruning. */
class JsonlSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val dir = "/root/testdata/sf0.001"
  private var spark: SparkSession = _
  private val out = s"${sys.props("java.io.tmpdir")}/graft_jsonl_spec"

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

  test("round trip reproduces every document, text included") {
    val src = graft.Tables.documents(spark, dir)
    JsonlCorpus.write(src, out)
    val back = JsonlCorpus.read(spark, out)
    val a = src.orderBy("doc_id").collect().map(_.toString)
    val b = back.orderBy("doc_id").collect().map(_.toString)
    assert(a.length > 0)
    assert(b.toSeq === a.toSeq)
  }

  test("lang filter prunes to partition directories") {
    val pruned = JsonlCorpus.read(spark, out).filter("lang = 'en'")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("lang"), plan.take(1500))
    assert(pruned.count() > 0)
  }
}
