package graft.plans

import graft.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.window.WindowExec
import org.apache.spark.sql.execution.SortExec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The custom grouped-top-k operator: row-for-row equality with the
  * window form, two-phase plan shape, exchange elision on co-partitioned
  * input, bounded output per group. */
class TopKPerGroupSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val dir = "/root/testdata/sf0.001"
  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // plan-shape assertions below count exchanges pre-AQE-collapse
      .config("spark.sql.adaptive.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def topk(k: Int) = TopKPerGroup(
    Tables.orders(spark, dir).select("o_orderpriority", "o_orderkey", "o_totalprice"),
    Seq("o_orderpriority"), Seq(("o_totalprice", true), ("o_orderkey", false)), k)

  test("equals the row_number window form row-for-row") {
    val custom = topk(5)
      .orderBy("o_orderpriority", "o_orderkey")
      .collect().map(_.toSeq)
    val w = Window.partitionBy("o_orderpriority")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    val window = Tables.orders(spark, dir)
      .select("o_orderpriority", "o_orderkey", "o_totalprice")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 5).drop("rn")
      .orderBy("o_orderpriority", "o_orderkey")
      .collect().map(_.toSeq)
    assert(custom.toSeq === window.toSeq)
  }

  test("plan: partial heap -> exchange -> final heap; no sort, no window") {
    val plan = topk(5).queryExecution.executedPlan
    val phases = plan.collect { case t: TopKPerGroupExec => t }
    assert(phases.map(_.finalPhase).sorted === Seq(false, true))
    assert(plan.collect { case s: ShuffleExchangeExec => s }.size === 1)
    assert(plan.collect { case s: SortExec => s }.isEmpty)
    assert(plan.collect { case w: WindowExec => w }.isEmpty)
    // the exchange sits between the phases: the final phase's subtree
    // contains the shuffle, the partial phase's does not
    val fin = phases.find(_.finalPhase).get
    val part = phases.find(!_.finalPhase).get
    assert(fin.collect { case s: ShuffleExchangeExec => s }.size === 1)
    assert(part.collect { case s: ShuffleExchangeExec => s }.isEmpty)
  }

  test("co-partitioned input elides the operator's exchange") {
    val pre = Tables.orders(spark, dir)
      .select("o_orderpriority", "o_orderkey", "o_totalprice")
      .repartition(col("o_orderpriority"))
    val df = TopKPerGroup(pre, Seq("o_orderpriority"),
      Seq(("o_totalprice", true), ("o_orderkey", false)), 5)
    // exactly the repartition's own exchange — EnsureRequirements adds none
    assert(df.queryExecution.executedPlan
      .collect { case s: ShuffleExchangeExec => s }.size === 1)
    assert(df.count() === 25) // 5 priorities x 5
  }

  test("every group emits at most k rows, and exactly k when group >= k") {
    val counts = topk(3).groupBy("o_orderpriority").count().collect()
    assert(counts.nonEmpty)
    counts.foreach(r => assert(r.getLong(1) === 3)) // all groups have >= 3 orders
    // k larger than the group: whole group passes through
    val all = Tables.orders(spark, dir).count()
    assert(topk(Int.MaxValue / 2).count() === all)
  }
}
