package graft.functions

import graft.ops.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The codegen'd simhash64 expression must be drop-in identical to the
  * explode + 64-vote-sums relational formulation it replaces in
  * [[Dedup.simhash64]] (which the DuckDB oracle mirrors 1:1). */
class SimHash64Spec extends AnyFunSuite with BeforeAndAfterAll {

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
    SimHash64.register(spark)
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("matches the vote-aggregation formulation on every real document") {
    val fast = Dedup.simhash64(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val slow = Dedup.simhash64Votes(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(fast.size === slow.size)
    assert(fast === slow)
    // codes are genuine 32-bit halves
    fast.values.foreach { case (hi, lo) =>
      assert(hi >= 0L && hi < (1L << 32)); assert(lo >= 0L && lo < (1L << 32))
    }
  }

  test("edge cases: empty array, null elements skipped, null input, identical texts") {
    // empty array → all vote sums 0 → code 0/0
    val empty = spark.sql("SELECT simhash64(cast(array() as array<string>)) AS sh")
      .collect()(0).getSeq[Long](0)
    assert(empty === Seq(0L, 0L))
    // null elements are skipped, not poisoning the code
    val skipped = spark.sql(
      "SELECT simhash64(array('alpha', cast(null as string))) AS a, simhash64(array('alpha')) AS b")
      .collect()(0)
    assert(skipped.getSeq[Long](0) === skipped.getSeq[Long](1))
    // null input → null result
    assert(spark.sql("SELECT simhash64(cast(null as array<string>)) AS r")
      .collect()(0).isNullAt(0))
    // same token multiset → same code (determinism)
    val same = spark.sql(
      "SELECT simhash64(array('x','y','z')) AS a, simhash64(array('x','y','z')) AS b")
      .collect()(0)
    assert(same.getSeq[Long](0) === same.getSeq[Long](1))
  }

  test("shipped simhash64 plan has no shuffle before the codes projection") {
    val p = Dedup.simhash64(spark, dir).queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"),
      s"the narrow per-doc code computation grew a shuffle:\n${p.take(2000)}")
  }
}
