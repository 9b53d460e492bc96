package graft.plans

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed global-order primitives — prefix sums, row numbers, and
  * ntile — WITHOUT the single-partition `Window.orderBy(...)` trap.
  *
  * An unpartitioned window moves EVERY row to one task (Spark's own
  * WindowExec warns about exactly this); these helpers express
  * "cumulative X in global key order" with the classic two-phase parallel
  * scan, entirely inside the declarative plan:
  *
  *  1. '''deterministic range bucketing''': a monotone NUMERIC proxy of
  *     the leading order key is split into `buckets` uniform [min, max]
  *     intervals. min/max are merge-order-independent aggregates, so the
  *     bucket of a row is a PURE FUNCTION OF THE DATA — every branch of
  *     the plan that recomputes it agrees, unconditionally. (This is the
  *     crucial difference from `repartitionByRange` + `spark_partition_id`,
  *     whose boundaries come from seeded reservoir SAMPLING: two physical
  *     instantiations of that subtree — e.g. the partials branch and the
  *     add-back branch, when exchange reuse declines to fire in a nested
  *     plan — can disagree on where the splits fall and silently corrupt
  *     every offset. Seen in practice when chaining three ntiles.)
  *  2. '''per-bucket partials''': one hash-agg collapses each bucket to a
  *     single (bucket, subtotal) row — at most `buckets` rows, a
  *     CLUSTER-sized frame, not a data-sized one.
  *  3. '''offset scan over the partials''': the exclusive prefix sum of
  *     the subtotals (and, for ntile, the grand total) runs as an
  *     unpartitioned window over that ≤`buckets`-row frame — bounded by
  *     construction, the one place a global window is provably safe
  *     (PlanSpec's WindowExec guard allow-lists it).
  *  4. '''broadcast add-back''': each bucket's offset joins back by
  *     bucket id (broadcast hash join), and the intra-bucket running sum
  *     is a PARTITIONED window — one hash exchange of the data on bucket
  *     id, the same movement a global sort's range exchange performs.
  *
  * Correctness contract:
  *  - `orderCols` must be a TOTAL order (unique after tie-breaks — the
  *    same contract a deterministic `row_number` window carries).
  *  - `proxy` must be numeric and monotone non-decreasing in the FULL
  *    `orderCols` order (in practice: the leading order column, negated
  *    for descending). Rows with equal proxies land in the same bucket,
  *    so ties on the leading key never split across buckets; the
  *    intra-bucket window then orders by the full composite key.
  *  - every column feeding the scan must be deterministic BY VALUE
  *    (exact types: integers, decimals, dates — not merge-order-dependent
  *    double sums), because independent branches recompute rather than
  *    share physical results.
  *
  * Uniform cuts are not equal-depth cuts: a skewed proxy distribution
  * skews bucket sizes (bounded mitigation: `buckets` defaults to 4×
  * cluster width so hot regions still split across tasks). Skew changes
  * BALANCE, never placement — results are bit-identical regardless.
  *
  * At 100 TB: one stats pass (map-side-combined min/max), one hash
  * exchange of the data, one cluster-width side plan, one broadcast
  * join — against the single-task sort-the-world plan the unpartitioned
  * window would have produced.
  */
object GlobalOrder {

  private val Bkt = "__go_bkt"

  /** Buckets default: 4× shuffle parallelism — enough to smooth moderate
    * proxy skew while the partials frame stays cluster-sized. */
  private def bucketCount(df: DataFrame): Int =
    4 * df.sparkSession.sessionState.conf.numShufflePartitions

  /** Core two-phase scan: `df` + running-sum columns, plus (optionally)
    * a `__go_tot0` grand-total column per sum, all delivered through one
    * broadcast join on bucket id. */
  private def scanned(
      df: DataFrame,
      orderCols: Seq[Column],
      proxy: Column,
      sums: Seq[(Column, String)],
      inclusive: Boolean,
      withTotals: Boolean): DataFrame = {
    require(sums.nonEmpty, "prefix scan needs at least one value column")
    val b = bucketCount(df)
    val stats = df.agg(
      min(proxy).cast("double").as("__go_lo"),
      max(proxy).cast("double").as("__go_hi"))
    // IEEE subtraction/division/multiplication by positive constants and
    // floor are all monotone, so bucket order follows proxy order exactly
    val bucketed = df.crossJoin(broadcast(stats))
      .withColumn(Bkt,
        when(col("__go_hi") <= col("__go_lo"), lit(0))
          .otherwise(least(lit(b - 1), greatest(lit(0),
            floor((proxy.cast("double") - col("__go_lo")) /
              (col("__go_hi") - col("__go_lo")) * b).cast("int"))))
          .cast("int"))
      .drop("__go_lo", "__go_hi")
    val subCols = sums.zipWithIndex.map { case ((v, _), i) =>
      sum(v).as(s"__go_sub$i")
    }
    // cluster-width frame: ≤ `b` rows
    val partials = bucketed.groupBy(col(Bkt)).agg(subCols.head, subCols.tail: _*)
    val offWin = Window.orderBy(col(Bkt))
      .rowsBetween(Window.unboundedPreceding, -1)
    val totWin = Window.orderBy(col(Bkt))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val withOffs = sums.indices.foldLeft(partials) { (acc, i) =>
      val base = acc.withColumn(s"__go_off$i",
        coalesce(sum(col(s"__go_sub$i")).over(offWin), lit(0L)))
      if (withTotals) base.withColumn(s"__go_tot$i",
        sum(col(s"__go_sub$i")).over(totWin))
      else base
    }
    val side = Seq(col(Bkt)) ++
      sums.indices.map(i => col(s"__go_off$i")) ++
      (if (withTotals) sums.indices.map(i => col(s"__go_tot$i")) else Nil)
    val offsets = withOffs.select(side: _*)
    val localEnd = if (inclusive) Window.currentRow else -1L
    val localWin = Window.partitionBy(Bkt).orderBy(orderCols: _*)
      .rowsBetween(Window.unboundedPreceding, localEnd)
    val joined = bucketed.join(broadcast(offsets), Bkt)
    sums.zipWithIndex.foldLeft(joined) { case (acc, ((v, out), i)) =>
      acc.withColumn(out,
        col(s"__go_off$i") + coalesce(sum(v).over(localWin), lit(0L)))
    }.drop(Bkt +: sums.indices.map(i => s"__go_off$i"): _*)
  }

  /** `df` plus one running-sum column per `(valueCol, outName)` pair, in
    * global `orderCols` order; `proxy` is the monotone numeric stand-in
    * for the leading order key (see class doc). `inclusive` selects
    * running-total vs exclusive-prefix semantics (exclusive = sum of all
    * STRICTLY earlier rows; first row gets 0). Output column type
    * follows `sum(valueCol)`. */
  def withPrefixSums(
      df: DataFrame,
      orderCols: Seq[Column],
      proxy: Column,
      sums: Seq[(Column, String)],
      inclusive: Boolean): DataFrame =
    scanned(df, orderCols, proxy, sums, inclusive, withTotals = false)

  /** `df` plus a 1-based global `row_number` over `orderCols` (which must
    * be a total order), as the prefix-count special case. */
  def withRowNumber(
      df: DataFrame, orderCols: Seq[Column], proxy: Column, out: String): DataFrame =
    withPrefixSums(df, orderCols, proxy, Seq((lit(1L), out)), inclusive = true)

  /** `df` plus the SQL-standard `ntile(n)` bucket over the global
    * `orderCols` order: with N rows, the first N mod n buckets take
    * ⌈N/n⌉ rows, the rest ⌊N/n⌋ — computed arithmetically from the
    * distributed row number and the total count (the grand total rides
    * the same broadcast offsets frame, so no second pass over the data),
    * bit-identical to `ntile(n) OVER (ORDER BY ...)` in both Spark and
    * DuckDB. Output is `int` like the built-in. */
  def withNtile(
      df: DataFrame, n: Int, orderCols: Seq[Column], proxy: Column,
      out: String): DataFrame = {
    require(n > 0, "ntile needs n > 0")
    val rn = "__go_rn"
    val ranked = scanned(df, orderCols, proxy, Seq((lit(1L), rn)),
      inclusive = true, withTotals = true)
    ranked
      .withColumn("__go_size", expr(s"__go_tot0 div $n"))
      .withColumn("__go_rem", expr(s"__go_tot0 % $n"))
      // rows covered by the ⌈N/n⌉-sized leading buckets
      .withColumn("__go_head", expr("__go_rem * (__go_size + 1)"))
      .withColumn(out, expr(
        s"""cast(case when $rn <= __go_head
           |  then ($rn - 1) div (__go_size + 1) + 1
           |  else __go_rem + ($rn - __go_head - 1) div __go_size + 1
           |end as int)""".stripMargin))
      .drop(rn, "__go_tot0", "__go_size", "__go_rem", "__go_head")
  }
}
