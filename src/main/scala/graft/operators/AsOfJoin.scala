package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, the single most recent right row with
  * `rightTs <= leftTs` and equal keys — the operator Spark lacks natively
  * (builder rules list it as the canonical custom-operator case; DuckDB's
  * native ASOF JOIN is the oracle).
  *
  * Implementation is composition (preference (a) of the custom-operator
  * ladder): tag both sides, union, ONE shuffle on the key, in-partition
  * sort by (ts, tag), and `last(_, ignoreNulls)` carry-forward over the
  * running window, then keep only left rows. Right rows at exactly leftTs
  * sort before the left row (tag 0 < 1), giving inclusive `<=` semantics
  * like ASOF's `>=`.
  *
  * Scale: one exchange total — same cost as a plain equi-join shuffle, no
  * per-row range probing; the window runs inside each key partition. Key
  * skew is AQE's problem like any other shuffle.
  */
object AsOfJoin {

  /** Generic form: left/right must share `key`; carries `rightCols` from
    * the matched right row onto each left row (null when no prior right
    * row exists). Both frames need a long/comparable `ts` column.
    *
    * `rightTie` (a right-side column, e.g. its event id) makes the carried
    * row deterministic when several right rows share a ts: the window sorts
    * by it, so the LARGEST tie value wins. Without it, `last()` over tied
    * right rows is order-dependent. Left rows get a null tie key; ties
    * among left rows are harmless (each reads the carry independently). */
  def asOf(left: DataFrame, right: DataFrame, key: String,
           rightCols: Seq[String], rightTie: Option[String] = None): DataFrame = {
    val leftTagged = left.withColumn("__tag", lit(1))
    val rightTagged = right.withColumn("__tag", lit(0))
    // align schemas: left gets null right-cols, right gets null left-cols
    val leftCols = left.columns.filterNot(c => c == key || c == "ts")
    val l2 = rightCols.foldLeft(leftTagged)((df, c) => df.withColumn(c, lit(null)))
    val r2 = leftCols.foldLeft(rightTagged)((df, c) => df.withColumn(c, lit(null)))
    val tieType = rightTie.map(c => right.schema(c).dataType)
    val l3 = rightTie.zip(tieType).foldLeft(l2) { case (df, (_, t)) =>
      df.withColumn("__tie", lit(null).cast(t)) }
    val r3 = rightTie.foldLeft(r2)((df, c) => df.withColumn("__tie", col(c)))
    val cols = key +: "ts" +: "__tag" +: (leftCols ++ rightCols ++ rightTie.map(_ => "__tie").toSeq)
    val all = l3.select(cols.map(col): _*).unionByName(r3.select(cols.map(col): _*))
    val order = Seq(col("ts").asc, col("__tag").asc) ++
      rightTie.map(_ => col("__tie").asc_nulls_first)
    val w = Window.partitionBy(key).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = rightCols.foldLeft(all) { (df, c) =>
      df.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
    carried.filter(col("__tag") === 1).drop("__tag", "__tie")
  }

  /** Range (interval) join, bucketed: count clicks within one hour AFTER
    * each purchase, per user — the attribution-window shape. A naive theta
    * join (`c.ts BETWEEN p.ts AND p.ts+1h`) is a cross product per user;
    * bucketing both sides to epoch hours turns it into an equi-join on
    * (user, hour) with the purchase side exploded to its 2 candidate
    * buckets, then an exact range filter. At 100 TB the shuffle is
    * O(rows×2), never O(pairs). */
  def purchaseClickWindow(spark: SparkSession, dir: String): DataFrame = {
    val hourUs = 3600L * 1000 * 1000
    // µs precision throughout — the oracle reads the parquet timestamps
    // at µs (epoch_us), so comparisons must land on identical units;
    // Tables.eventsUs is the single normalization point.
    val ev = Tables.eventsUs(spark, dir)
      .select("event_id", "ts_us", "user_id", "event_type")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"),
        col("ts_us").as("p_us"))
      // a 1-hour window spans at most 2 hour-buckets
      .withColumn("bucket", explode(array(
        expr(s"p_us div $hourUs"), expr(s"p_us div $hourUs + 1"))))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts_us").as("c_us"))
      .withColumn("bucket", expr(s"c_us div $hourUs"))
    purchases.join(clicks, Seq("user_id", "bucket"))
      .filter(col("c_us") > col("p_us") && col("c_us") <= col("p_us") + lit(hourUs))
      .groupBy("purchase_id", "user_id")
      .agg(count(lit(1)).as("clicks_within_1h"))
      .orderBy("purchase_id")
  }

  /** Driver-contract query: each `purchase` event matched as-of to the
    * user's most recent `click` at or before it. */
  def purchaseAsOfClick(spark: SparkSession, dir: String): DataFrame = {
    // Normalize to µs BEFORE matching so the ASOF comparison runs on the
    // same units as DuckDB's epoch_us view of the parquet timestamps.
    // click_id is the window tie-break (rightTie): among clicks tied on µs
    // ts the largest click_id is carried, deterministically.
    val ev = Tables.eventsUs(spark, dir)
      .select(col("event_id"), col("ts_us").as("ts"),
        col("user_id"), col("event_type"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id").as("purchase_id"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"),
        col("event_id").as("click_id"), col("ts").as("click_ts"))
    asOf(purchases, clicks, "user_id", Seq("click_id", "click_ts"),
        rightTie = Some("click_id"))
      .select(
        col("purchase_id"), col("user_id"), col("click_id"),
        (col("ts") - col("click_ts")).as("gap_us"))
      .orderBy("purchase_id")
  }
}
