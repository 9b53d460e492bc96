package graft.sources

import graft.sources.gen.SyntheticCorpus
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FilterExec
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** DataSource V2 generator connector: partition planning, column pruning,
  * filter pushdown, and row-content determinism. */
class Dsv2Spec extends AnyFunSuite with BeforeAndAfterAll {

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

  private def read(rows: Int, slices: Int) =
    spark.read.format("graft-corpus")
      .option("rows", rows.toString).option("slices", slices.toString).load()

  private def scanOf(df: org.apache.spark.sql.DataFrame): BatchScanExec =
    df.queryExecution.executedPlan.collect { case b: BatchScanExec => b }.head

  test("full scan generates every row with deterministic content") {
    val rows = read(100, 4).orderBy("doc_id").collect()
    assert(rows.length === 100)
    assert(rows.map(_.getLong(0)).toSeq === (0L until 100L))
    rows.take(20).foreach { r =>
      val i = r.getLong(0)
      assert(r.getString(1) === SyntheticCorpus.langs((i % 5).toInt))
      assert(r.getString(2) === SyntheticCorpus.textOf(i))
      assert(r.getInt(3) === SyntheticCorpus.textOf(i).length)
    }
  }

  test("partition planning splits the range into the requested slices") {
    val df = read(1000, 8)
    assert(df.rdd.getNumPartitions === 8)
    assert(df.count() === 1000)
  }

  test("column pruning reaches the reader: select(doc_id) reads one column") {
    val pruned = read(100, 4).select("doc_id")
    assert(scanOf(pruned).scan.readSchema().fieldNames.toSeq === Seq("doc_id"))
    assert(pruned.count() === 100)
  }

  test("doc_id range predicates push into the source, no residual Filter") {
    val df = read(500, 8).filter(col("doc_id") >= 450 && col("doc_id") < 480)
    // fully accepted by the source: nothing left for a post-scan Filter
    val filters = df.queryExecution.executedPlan.collect { case f: FilterExec => f }
    assert(filters.isEmpty, "range predicates should be fully pushed")
    assert(scanOf(df).scan.description().contains("[450, 480)"))
    assert(df.count() === 30)
    assert(df.agg(min("doc_id"), max("doc_id")).collect()(0).toSeq === Seq(450L, 479L))
    // non-range predicates stay residual and still evaluate correctly
    val mixed = read(100, 4).filter(col("doc_id") >= 10 && col("lang") === "en")
    assert(mixed.collect().forall(_.getAs[String]("lang") == "en"))
  }

  test("empty pushed range produces zero partitions and zero rows") {
    val df = read(100, 4).filter(col("doc_id") >= 200)
    assert(df.count() === 0)
  }
}
