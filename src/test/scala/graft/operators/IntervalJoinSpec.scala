package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The interval-overlap join's dedup contract (VERDICT r8 item 7): each
  * overlapping pair must be emitted exactly once WITHOUT a dedup
  * exchange — the first-common-bucket predicate replaces the r8
  * full-row `distinct()`. */
class IntervalJoinSpec extends AnyFunSuite with BeforeAndAfterAll {

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

  private def frames = {
    val s = spark
    import s.implicits._
    // left interval spans 4 buckets at width 10; rights overlap it in
    // 1-3 common buckets; r4 is disjoint (gap), r5 touches at a single
    // boundary point (inclusive ends ⇒ overlaps)
    val left = Seq((1L, 0L, 39L), (2L, 100L, 101L))
      .toDF("l_id", "l_start", "l_end")
    val right = Seq(
      (10L, 5L, 35L),   // 3 common buckets with l1
      (11L, 0L, 9L),    // 1 common bucket with l1
      (12L, 38L, 55L),  // straddles l1's end
      (13L, 60L, 70L),  // disjoint
      (14L, 39L, 39L),  // single-point touch at l1's end
      (15L, 101L, 140L) // touches l2
    ).toDF("r_id", "r_start", "r_end")
    (left, right)
  }

  test("each overlapping pair is emitted exactly once even when it meets " +
       "in several buckets; point-touch counts, disjoint does not") {
    val (left, right) = frames
    val out = IntervalJoin.overlapJoin(left, right, bucketUs = 10L)
      .select("l_id", "r_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.length === out.distinct.length, "duplicate pair emitted")
    assert(out.toSet === Set((1L, 10L), (1L, 11L), (1L, 12L), (1L, 14L), (2L, 15L)))
  }

  test("the dedup is a predicate, not an exchange: overlapJoin plans zero " +
       "aggregates and zero Deduplicate nodes") {
    val (left, right) = frames
    val p = IntervalJoin.overlapJoin(left, right, bucketUs = 10L)
      .queryExecution.optimizedPlan.toString
    assert(!p.contains("Deduplicate"), p.take(1500))
    assert(!p.contains("Aggregate"), p.take(1500))
  }

  test("j07 is the exact complement of j05 on the session table") {
    val dir = "/root/testdata/sf0.001"
    val hit = IntervalJoin.sessionErrorOverlap(spark, dir)
      .select(col("user_id"), col("session_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val clean = IntervalJoin.sessionErrorClean(spark, dir)
      .select(col("user_id"), col("session_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(hit.intersect(clean).isEmpty)
    val ev = graft.Tables.eventsUs(spark, dir)
    val sessions = ev.select("user_id", "ts_us", "event_id")
      .withColumn("prev", lag("ts_us", 1).over(
        org.apache.spark.sql.expressions.Window.partitionBy("user_id")
          .orderBy(col("ts_us").asc, col("event_id").asc)))
      .withColumn("brk", when(col("prev").isNull ||
        col("ts_us") - col("prev") > IntervalJoin.SessionGapUs, 1L).otherwise(0L))
      .withColumn("sid", sum("brk").over(
        org.apache.spark.sql.expressions.Window.partitionBy("user_id")
          .orderBy(col("ts_us").asc, col("event_id").asc)
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
      .select("user_id", "sid").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(hit.union(clean) === sessions)
  }
}
