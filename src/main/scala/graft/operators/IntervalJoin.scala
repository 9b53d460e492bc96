package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Interval-overlap join (j05) — the interval×interval generalization of
  * j02's point-in-range shape: pair every left interval with every right
  * interval it OVERLAPS (`l.start <= r.end AND r.start <= l.end`), the
  * operator behind incident attribution ("which sessions were exposed to
  * which outage windows"), ad-flight overlap, and shift/booking conflict
  * detection. Spark has no native interval join (Flink and kdb+ do); a
  * naive theta join is a cross product.
  *
  * Implementation is composition (preference (a) of the custom-operator
  * ladder): decompose BOTH sides into the fixed-width time buckets they
  * cover (`sequence(start div W, end div W)` — a narrow per-row explode),
  * equi-join on the bucket, then apply the exact overlap predicate and
  * de-duplicate pairs that met in several buckets. Shuffle is
  * O(Σ buckets-covered), never O(pairs); the bucket id is the time
  * partition key, so at 100 TB the join is the standard time-sliced
  * shape — skew only where wall-clock hotspots exist, which AQE splits.
  *
  * Bucket width trades explode factor against bucket fan-in: W = the
  * session gap (30 min) bounds the left explode at
  * duration/W + 1 ≤ n_events + 1 and the right (10-minute error
  * windows) at 2.
  */
object IntervalJoin {

  /** 30-minute sessionization gap, µs (w06/q48's session definition). */
  val SessionGapUs: Long = 30L * 60 * 1000 * 1000

  /** Half-width of the incident window around each error event, µs. */
  val ErrorHalfUs: Long = 5L * 60 * 1000 * 1000

  /** Bucket width for the overlap decomposition, µs. */
  val BucketUs: Long = 30L * 60 * 1000 * 1000

  /** Library form: overlap-join two interval frames (`start`/`end` long
    * columns, inclusive) and return left rows paired with each
    * overlapping right row — deduplicated, exact.
    *
    * Dedup is a PER-ROW PREDICATE, not an exchange: a pair that overlaps
    * meets in every bucket both sides cover, and its FIRST common bucket
    * is `max(l_start, r_start) div W` (trunc-div by positive W is
    * monotone, so that bucket lies in both contiguous bucket ranges).
    * Keeping only the join row whose bucket equals it emits each pair
    * exactly once — the pre-r9 full-row `distinct()` shuffled the whole
    * payload a second time just to drop the duplicates (VERDICT r8
    * item 7); this form's only exchange is the bucket join itself. */
  def overlapJoin(left: DataFrame, right: DataFrame,
                  bucketUs: Long = BucketUs): DataFrame = {
    val lb = left.withColumn("__bucket",
      explode(expr(s"sequence(l_start div $bucketUs, l_end div $bucketUs)")))
    val rb = right.withColumn("__bucket",
      explode(expr(s"sequence(r_start div $bucketUs, r_end div $bucketUs)")))
    lb.join(rb, Seq("__bucket"))
      .filter(col("l_start") <= col("r_end") && col("r_start") <= col("l_end"))
      .filter(col("__bucket") ===
        greatest(expr(s"l_start div $bucketUs"), expr(s"r_start div $bucketUs")))
      .drop("__bucket")
  }

  /** The per-user 30-min-gap session table (w06's definition,
    * deterministically ordered by (ts, event_id)) with interval bounds —
    * shared by the overlap (j05) and anti-overlap (j07) surfaces. */
  private def sessionIntervals(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.eventsUs(spark, dir)
      .select("event_id", "ts_us", "user_id", "event_type")
    val wOrd = Window.partitionBy("user_id")
      .orderBy(col("ts_us").asc, col("event_id").asc)
    ev
      .withColumn("prev", lag("ts_us", 1).over(wOrd))
      .withColumn("brk",
        when(col("prev").isNull || col("ts_us") - col("prev") > SessionGapUs, 1L)
          .otherwise(0L))
      .withColumn("sid", sum("brk").over(
        wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "sid")
      .agg(min("ts_us").as("l_start"), max("ts_us").as("l_end"),
        count(lit(1)).as("n_events"))
  }

  /** The ±5-minute incident windows around every error event — j05/j07's
    * shared right side. */
  private def incidentIntervals(spark: SparkSession, dir: String): DataFrame =
    Tables.eventsUs(spark, dir)
      .filter(col("event_type") === "error")
      .select(col("event_id").as("err_id"),
        (col("ts_us") - ErrorHalfUs).as("r_start"),
        (col("ts_us") + ErrorHalfUs).as("r_end"))

  /** Driver surface: per-user 30-min-gap sessions (the w06 definition,
    * deterministically ordered by (ts, event_id)) overlap-joined against
    * ±5-minute incident windows around every error event; emits each
    * session that overlaps ≥1 incident window with its distinct-incident
    * count. All arithmetic is exact integer µs. */
  def sessionErrorOverlap(spark: SparkSession, dir: String): DataFrame =
    overlapJoin(sessionIntervals(spark, dir), incidentIntervals(spark, dir))
      .groupBy("user_id", "sid", "l_start", "l_end", "n_events")
      .agg(countDistinct("err_id").as("overlapping_errors"))
      .select(col("user_id"), col("sid").as("session_id"),
        col("l_start").as("s_start_us"), col("l_end").as("s_end_us"),
        col("n_events"), col("overlapping_errors"))
      .orderBy("user_id", "session_id")

  /** INTERVAL ANTI-JOIN (j07) — the complement of j05: every session
    * that overlaps NO incident window, the "clean traffic" cut an
    * attribution or incident-impact pipeline subtracts before computing
    * healthy baselines. Same bucket decomposition as [[overlapJoin]],
    * inverted at the LAST step: the overlapping left keys (a
    * session-grain set, deduped by the first-common-bucket predicate
    * before the key projection) come back through one aggregate, and
    * the session table anti-joins them on its composite key — the only
    * exchanges are the bucket join and the key-grain dedup, never an
    * all-pairs or per-row scan. */
  def sessionErrorClean(spark: SparkSession, dir: String): DataFrame = {
    val hit = overlapJoin(sessionIntervals(spark, dir),
        incidentIntervals(spark, dir))
      .select("user_id", "sid").distinct()
    sessionIntervals(spark, dir)
      .join(hit, Seq("user_id", "sid"), "left_anti")
      .select(col("user_id"), col("sid").as("session_id"),
        col("l_start").as("s_start_us"), col("l_end").as("s_end_us"),
        col("n_events"))
      .orderBy("user_id", "session_id")
  }
}
