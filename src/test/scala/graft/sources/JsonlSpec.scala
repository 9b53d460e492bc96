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

  test("f16 three-mode contract: PERMISSIVE routes the exact rule set, " +
    "DROPMALFORMED drops exactly it, FAILFAST aborts") {
    import org.apache.spark.sql.functions._
    val feed = CorruptJsonl.writeFeed(spark, dir)
    val docs = graft.Tables.documents(spark, dir)
    val nTotal = docs.count()
    val nCorrupt = docs.filter(col("doc_id") % 7 === 3).count()
    assert(nCorrupt > 0, "the corruption rule must hit the spec corpus")
    // PERMISSIVE: nothing lost, the corrupt channel holds the rule's rows
    // and preserves the raw line for replay. Materialized first: Spark
    // DISALLOWS corrupt-column-only queries against a raw JSON scan
    // (QUERY_ONLY_CORRUPT_RECORD_COLUMN) — the channel must be landed
    // before it can be audited on its own, a real production constraint.
    val p = CorruptJsonl.permissiveRead(spark, feed).localCheckpoint()
    assert(p.count() === nTotal)
    val corrupt = p.filter(col("_corrupt_record").isNotNull)
    assert(corrupt.count() === nCorrupt)
    assert(corrupt.filter(length(col("_corrupt_record")) > 0).count() === nCorrupt)
    // the ok channel parses back the untouched documents exactly
    val okIds = p.filter(col("_corrupt_record").isNull)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val expected = docs.filter(col("doc_id") % 7 =!= 3)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(okIds === expected)
    // DROPMALFORMED: silently drops exactly the corrupt rows
    val dropped = spark.read.schema(JsonlCorpus.documentsSchema)
      .option("mode", "DROPMALFORMED").json(feed)
    assert(dropped.count() === nTotal - nCorrupt)
    // FAILFAST: the first malformed line aborts the job
    val ff = intercept[org.apache.spark.SparkException] {
      spark.read.schema(JsonlCorpus.documentsSchema)
        .option("mode", "FAILFAST").json(feed).count()
    }
    assert(ff.getMessage != null)
  }
}
