package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Readers for the driver-generated testdata tables (TESTDATA.md).
  *
  * All reads are plain parquet scans with no `inferSchema` cost (parquet is
  * self-describing); column pruning and predicate pushdown are left to
  * Catalyst — callers `.select`/`.filter` and the scan narrows automatically.
  * At 100 TB these would be partitioned tables; the access path (scan →
  * prune → push down) is identical.
  */
object Tables {
  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(spark: SparkSession, dir: String): DataFrame   = apply(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame     = apply(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame   = apply(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame   = apply(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame       = apply(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame     = apply(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame     = apply(spark, dir, "region")
  def events(spark: SparkSession, dir: String): DataFrame     = apply(spark, dir, "events")

  /** events.ts → µs-since-epoch BIGINT, robust to the physical type the
    * driver generates (timestamp[us] → TIMESTAMP_NTZ today; int64
    * nanoseconds in earlier rounds). Sessions run with
    * spark.sql.session.timeZone=UTC, so the NTZ wall-clock → epoch cast
    * matches DuckDB's `epoch_us(ts)` on the same parquet exactly.
    *
    * Any OTHER type throws loudly here — one probe site instead of a
    * silent 1000× unit corruption spread across every events consumer
    * (the round-5 failure mode). Caveat: the LongType branch engages only
    * for files whose `ts` is PLAIN int64; a parquet TIMESTAMP(NANOS)
    * logical type fails earlier, at scan time ("Illegal Parquet type"),
    * unless `spark.sql.legacy.parquet.nanosAsLong=true` is set on the
    * session — re-enable that config if the driver ever regenerates the
    * legacy nanos form. */
  def tsUs(df: DataFrame): Column = df.schema("ts").dataType match {
    case LongType => expr("ts div 1000") // int64 ns since epoch (legacy)
    case TimestampNTZType | TimestampType => unix_micros(col("ts").cast(TimestampType))
    case other => throw new IllegalStateException(
      s"events.ts drifted to unsupported type $other — extend Tables.tsUs " +
        "(expected timestamp[us] or int64-nanos)")
  }

  /** events.ts as a session-TZ TimestampType event-time column (the form
    * watermarks and window() aggregates take), same drift-robustness as
    * [[tsUs]]. */
  def eventTime(df: DataFrame): Column = df.schema("ts").dataType match {
    case LongType => timestamp_micros(expr("ts div 1000"))
    case TimestampNTZType | TimestampType => col("ts").cast(TimestampType)
    case other => throw new IllegalStateException(
      s"events.ts drifted to unsupported type $other — extend Tables.eventTime")
  }

  /** The events table with `ts` replaced by a normalized `ts_us` BIGINT
    * column — the reader every µs-arithmetic consumer goes through, so
    * the unit contract lives in exactly one place. */
  def eventsUs(spark: SparkSession, dir: String): DataFrame = {
    val ev = events(spark, dir)
    ev.withColumn("ts_us", tsUs(ev)).drop("ts")
  }
  def documents(spark: SparkSession, dir: String): DataFrame  = apply(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "embeddings")

  /** Fan an UNSPLITTABLE-SMALL scan out to the session's parallelism
    * (optimization guide §2.5, "input skew: one huge unsplittable file …
    * repartition immediately after the read"): the testdata corpus is ONE
    * parquet file per table, so every narrow per-row stage downstream of a
    * bare scan ran on a single task (r15 JobStats: tasks ≈ stages with
    * multi-second single-task times for the shingle/tokenize/decode/
    * levenshtein families). The guard is SCALE-ADAPTIVE, not a constant:
    * it repartitions only when the planned scan has fewer splits than the
    * session's default parallelism, so a production-sized input (many
    * files/splits) passes through untouched and never pays the exchange.
    * Apply below HEAVY narrow work only — a one-pass aggregate is cheaper
    * serial than shuffled. */
  def fanOut(df: DataFrame): DataFrame = {
    val p = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < p) df.repartition(p) else df
  }
}
