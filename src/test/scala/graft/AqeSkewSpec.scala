package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Proof that the cluster-deployment claim in README ("AQE skew-join
  * handles hot keys at runtime") actually holds on this build: a join
  * with one pathologically hot key must be rewritten by
  * OptimizeSkewedJoin into a skew=true sort-merge join (the hot
  * partition split into parallel sub-partitions), with the same result
  * as the unskewed plan would produce.
  *
  * Thresholds are scaled down (32 KB skew threshold / 16 KB advisory)
  * so a local-size fixture exhibits exactly the rewrite a 100 TB hot key
  * gets at production thresholds — same rule, same plan shape. */
class AqeSkewSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2.0")
      .config("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "32KB")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
      // force the shuffle path — a broadcast join would dodge the skew
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("AQE rewrites the hot-key join into a skew=true sort-merge join") {
    // 50k of 60k left rows share key 0; ~120B of padding each puts the
    // hot partition far over the 32KB threshold while the others stay tiny
    val left = spark.range(0, 60000)
      .select(
        when(col("id") < 50000, lit(0L)).otherwise(col("id") % 1000).as("k"),
        concat(lit("x" * 120), col("id")).as("pad"))
    val right = spark.range(0, 1000).select(col("id").as("k"), col("id").as("rv"))
    val joined = left.join(right, "k")
    // execute THIS DataFrame's plan (count() would build a separate
    // QueryExecution and leave this one un-finalized)
    val n = joined.collect().length
    // right keys are unique and cover [0, 1000): every left row matches once
    assert(n === 60000)
    val finalPlan = joined.queryExecution.executedPlan.toString
    assert(finalPlan.contains("skew=true"),
      s"OptimizeSkewedJoin did not fire:\n${finalPlan.take(3000)}")
  }
}
