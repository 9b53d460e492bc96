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
    require(left.columns.contains("ts") && right.columns.contains("ts"),
      "asOf: both inputs must carry a comparable 'ts' column")
    val leftTagged = left.withColumn("__tag", lit(1))
    val rightTagged = right.withColumn("__tag", lit(0))
    val leftCols = left.columns.filterNot(c => c == key || c == "ts")
    // The right payload rides the window as ONE struct: `last(struct)`
    // keeps the matched row's columns ATOMIC — a right column that is
    // genuinely NULL on the matched row stays NULL, where per-column
    // last(_, ignoreNulls) would silently backfill it from an older row,
    // stitching a row that belongs to no input (ADVICE r8).
    val rStruct = org.apache.spark.sql.types.StructType(
      rightCols.map(c => right.schema(c)))
    val l2 = leftTagged.withColumn("__r", lit(null).cast(rStruct))
    val r2 = leftCols.foldLeft(rightTagged)((df, c) => df.withColumn(c, lit(null)))
      .withColumn("__r", struct(rightCols.map(col): _*))
    val tieType = rightTie.map(c => right.schema(c).dataType)
    val l3 = tieType.foldLeft(l2)((df, t) =>
      df.withColumn("__tie", lit(null).cast(t)))
    val r3 = rightTie.foldLeft(r2)((df, c) => df.withColumn("__tie", col(c)))
    val cols = key +: "ts" +: "__tag" +: "__r" +:
      (leftCols ++ rightTie.map(_ => "__tie").toSeq)
    val all = l3.select(cols.map(col): _*).unionByName(r3.select(cols.map(col): _*))
    val order = Seq(col("ts").asc, col("__tag").asc) ++
      rightTie.map(_ => col("__tie").asc_nulls_first)
    val w = Window.partitionBy(key).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = all.withColumn("__c", last(col("__r"), ignoreNulls = true).over(w))
    rightCols.foldLeft(carried)((df, c) => df.withColumn(c, col(s"__c.$c")))
      .filter(col("__tag") === 1).drop("__tag", "__tie", "__r", "__c")
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

  /** Nearest-event join: for each left row, the right row with equal key
    * minimizing |rightTs − leftTs| in EITHER direction — the
    * sensor/log-alignment semantics as-of can't express (as-of only looks
    * backward). Ties: equal distance across directions → the PAST row wins
    * (an observed event beats a future one); equal ts among right rows →
    * the largest `rightTie` wins in both directions (mirrored by the
    * oracle's per-(key, ts) max pre-aggregation).
    *
    * Implementation composes two carry windows over ONE union + ONE
    * exchange on the key: a backward pass (as-of: last right row at or
    * before, ordered ts/tag asc so equal-ts rights are inclusive) and a
    * forward pass (first right row at or after, ordered tag DESC so
    * equal-ts rights land inside the currentRow..following frame), then a
    * per-row pick of the nearer side. The second window re-sorts in place
    * but reuses the first's hash partitioning — plan cost is one shuffle
    * total, same as a plain equi-join, never a per-row range probe. */
  def nearest(left: DataFrame, right: DataFrame, key: String,
              rightCols: Seq[String], rightTs: String,
              rightTie: String): DataFrame = {
    require(rightCols.contains(rightTs),
      "nearest: rightCols must include the right timestamp column")
    require(left.columns.contains("ts") && right.columns.contains("ts"),
      "nearest: both inputs must carry a comparable 'ts' column")
    val leftTagged = left.withColumn("__tag", lit(1))
    val rightTagged = right.withColumn("__tag", lit(0))
    val leftCols = left.columns.filterNot(c => c == key || c == "ts")
    // One struct per right row through BOTH carry windows — last/first of
    // a struct keeps the matched row atomic, so a NULL field on the
    // nearest row is carried as NULL rather than backfilled from a
    // farther row (ADVICE r8); it also halves the window scratch columns.
    val rStruct = org.apache.spark.sql.types.StructType(
      rightCols.map(c => right.schema(c)))
    val l2 = leftTagged.withColumn("__r", lit(null).cast(rStruct))
    val r2 = leftCols.foldLeft(rightTagged)((df, c) => df.withColumn(c, lit(null)))
      .withColumn("__r", struct(rightCols.map(col): _*))
    val tieType = right.schema(rightTie).dataType
    val l3 = l2.withColumn("__tie", lit(null).cast(tieType))
    val r3 = r2.withColumn("__tie", col(rightTie))
    val cols = key +: "ts" +: "__tag" +: "__tie" +: "__r" +: leftCols
    val all = l3.select(cols.map(col): _*).unionByName(r3.select(cols.map(col): _*))
    val wB = Window.partitionBy(key)
      .orderBy(col("ts").asc, col("__tag").asc, col("__tie").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wF = Window.partitionBy(key)
      .orderBy(col("ts").asc, col("__tag").desc, col("__tie").desc_nulls_last)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val withBF = all
      .withColumn("__b", last(col("__r"), ignoreNulls = true).over(wB))
      .withColumn("__f", first(col("__r"), ignoreNulls = true).over(wF))
    val bTs = col(s"__b.$rightTs"); val fTs = col(s"__f.$rightTs")
    val useB = fTs.isNull ||
      (bTs.isNotNull && (col("ts") - bTs) <= (fTs - col("ts")))
    val picked = withBF.withColumn("__p",
      when(useB, col("__b")).otherwise(col("__f")))
    rightCols.foldLeft(picked)((df, c) => df.withColumn(c, col(s"__p.$c")))
      .filter(col("__tag") === 1)
      .drop("__tag", "__tie", "__r", "__b", "__f", "__p")
  }

  /** K-NEAREST-IN-TIME JOIN (j06) — j04 generalized from 1 to k: for
    * each purchase, the user's k temporally closest clicks in EITHER
    * direction, ranked by distance. The sensor-alignment / attribution
    * shape ("the two touchpoints around each conversion") that neither
    * as-of (backward only) nor nearest (k=1) expresses.
    *
    * Implementation is the RANK-POSITION BUCKET composition: (1) index
    * each user's clicks by time (one row_number exchange), (2) find each
    * purchase's backward insertion position with the j01 union +
    * carry-window pass (the last click index at or before it — equal-ts
    * clicks sort before the purchase, j04's past-inclusive stance),
    * (3) explode each purchase to its 2k candidate positions
    * [pos−k+1 … pos+k] and equi-join back on (user, index) — the k
    * nearest in each direction are by construction inside that window —
    * then (4) rank the ≤2k candidates by (|gap|, past-beats-future) and
    * keep k.
    *
    * Equal-ts clicks collapse to their LARGEST click_id before indexing
    * (j04's documented tie stance, and load-bearing here: a within-ts
    * group bigger than k on the forward side would otherwise straddle
    * the candidate window in id-ascending index order while the rank
    * wants id-descending — collapsing makes "k nearest" mean k nearest
    * DISTINCT CLICK TIMES, each represented by its max id, and the
    * position order then agrees with the rank order in both
    * directions). The oracle mirrors with the same per-(user, ts) max
    * pre-aggregation.
    *
    * Scale shape: three key-partitioned exchanges (index, carry union,
    * candidate join), every one O(rows) or O(rows·2k) — never a per-row
    * range scan, never a per-user cross join; k bounds the fan-out as a
    * plan constant. */
  def purchaseKNearestClicks(spark: SparkSession, dir: String,
                             k: Int = 2): DataFrame = {
    val ev = Tables.eventsUs(spark, dir)
      .select(col("event_id"), col("ts_us"), col("user_id"), col("event_type"))
    kNearestClicksOf(
      ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts_us").as("p_us"),
          col("event_id").as("purchase_id")),
      ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts_us").as("c_us"),
          col("event_id")),
      k)
  }

  /** Library core of j06 over (user_id, p_us, purchase_id) and
    * (user_id, c_us, event_id) frames — split out so the spec can
    * property-test the composition against brute force on tie-heavy
    * synthetic data (the j04 discipline). */
  private[operators] def kNearestClicksOf(purchases: DataFrame,
                                          rawClicks: DataFrame,
                                          k: Int): DataFrame = {
    val idxW = Window.partitionBy("user_id").orderBy(col("c_us").asc)
    val clicks = rawClicks
      .groupBy("user_id", "c_us")
      .agg(max(col("event_id")).as("click_id"))
      .withColumn("idx", row_number().over(idxW))
    val unioned = clicks
      .select(col("user_id"), col("c_us").as("ts"), lit(0).as("tag"),
        col("idx"), lit(null).cast("long").as("purchase_id"),
        lit(null).cast("long").as("p_us"))
      .unionByName(purchases
        .select(col("user_id"), col("p_us").as("ts"), lit(1).as("tag"),
          lit(null).cast("int").as("idx"), col("purchase_id"), col("p_us")))
    val carryW = Window.partitionBy("user_id")
      .orderBy(col("ts").asc, col("tag").asc, col("idx").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val positioned = unioned
      .withColumn("pos", last(col("idx"), ignoreNulls = true).over(carryW))
      .filter(col("tag") === 1)
      .select(col("user_id"), col("purchase_id"), col("p_us"),
        coalesce(col("pos"), lit(0)).as("pos"))
    val cand = positioned
      .withColumn("cidx",
        explode(expr(s"sequence(pos - ${k - 1}, pos + $k)")))
      .filter(col("cidx") >= 1)
      .join(clicks.withColumnRenamed("idx", "cidx"), Seq("user_id", "cidx"))
    val rankW = Window.partitionBy("purchase_id")
      .orderBy(abs(col("c_us") - col("p_us")).asc,
        (col("c_us") <= col("p_us")).desc, col("click_id").desc)
    cand
      .withColumn("rank", row_number().over(rankW).cast("int"))
      .filter(col("rank") <= k)
      .select(col("purchase_id"), col("user_id"), col("rank"),
        col("click_id"), (col("c_us") - col("p_us")).as("gap_us"))
      .orderBy("purchase_id", "rank")
  }

  /** Driver-contract query (j04): each `purchase` matched to the user's
    * nearest `click` in time, past or future; `gap_us` is SIGNED
    * (click ts − purchase ts, ≤ 0 when the past side won), null when the
    * user never clicked. */
  def purchaseNearestClick(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.eventsUs(spark, dir)
      .select(col("event_id"), col("ts_us").as("ts"),
        col("user_id"), col("event_type"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id").as("purchase_id"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"),
        col("event_id").as("click_id"), col("ts").as("click_ts"))
    nearest(purchases, clicks, "user_id",
        Seq("click_id", "click_ts"), rightTs = "click_ts",
        rightTie = "click_id")
      .select(col("purchase_id"), col("user_id"), col("click_id"),
        (col("click_ts") - col("ts")).as("gap_us"))
      .orderBy("purchase_id")
  }

  /** TEMPORAL INTERPOLATION JOIN (j08) — for each left row, the right
    * series' value LINEARLY INTERPOLATED at the left timestamp: the
    * gap-filling / sensor-alignment semantics none of j01/j04 express
    * (as-of snaps backward, nearest snaps to one row; interpolation
    * SYNTHESIZES the value between the two straddling rows — what a
    * telemetry pipeline does before joining irregular series).
    *
    * Semantics per left row at time t over the (key-matched, per-ts
    * collapsed) right series:
    *  - both neighbours exist, t_prev < t_next:
    *      v = v_prev + (v_next − v_prev) · ((t − t_prev) / (t_next − t_prev))
    *  - exact hit (a right row AT t): that row's value (both carries see
    *    it, t_prev = t_next short-circuits the division);
    *  - only one side exists: clamp to it (no extrapolation);
    *  - no right rows for the key: null.
    * Float determinism: operand-for-operand the same IEEE tree as the
    * oracle (bigint−bigint, /, ×, +, each a single double op), rounded
    * only at the final projection (house rule).
    *
    * Implementation is j04's machinery verbatim: the right (ts, value)
    * rides the union as ONE struct through a backward carry (`last` over
    * ts asc, tag asc — equal-ts rights sort before the left row) and a
    * forward carry (`first` over currentRow..following, tag desc — equal-
    * ts rights land inside the frame), then per-row arithmetic. ONE key
    * exchange total; the forward window re-sorts in place on the backward
    * window's partitioning. Right rows must be per-(key, ts) unique —
    * collapse ties (house stance: max-id row wins) BEFORE calling, as
    * [[purchaseInterpClickValue]] does. */
  def interpolate(left: DataFrame, right: DataFrame, key: String,
                  rightVal: String): DataFrame = {
    require(left.columns.contains("ts") && right.columns.contains("ts"),
      "interpolate: both inputs must carry a comparable 'ts' column")
    val leftTagged = left.withColumn("__tag", lit(1))
    val rightTagged = right.withColumn("__tag", lit(0))
    val leftCols = left.columns.filterNot(c => c == key || c == "ts")
    val rStruct = org.apache.spark.sql.types.StructType(Seq(
      right.schema("ts"), right.schema(rightVal)))
    val l2 = leftTagged.withColumn("__r", lit(null).cast(rStruct))
    val r2 = leftCols.foldLeft(rightTagged)((df, c) => df.withColumn(c, lit(null)))
      .withColumn("__r", struct(col("ts"), col(rightVal)))
    val cols = key +: "ts" +: "__tag" +: "__r" +: leftCols
    val all = l2.select(cols.map(col): _*).unionByName(r2.select(cols.map(col): _*))
    val wB = Window.partitionBy(key)
      .orderBy(col("ts").asc, col("__tag").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wF = Window.partitionBy(key)
      .orderBy(col("ts").asc, col("__tag").desc)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val withBF = all
      .withColumn("__b", last(col("__r"), ignoreNulls = true).over(wB))
      .withColumn("__f", first(col("__r"), ignoreNulls = true).over(wF))
    val tPrev = col("__b.ts"); val vPrev = col(s"__b.$rightVal")
    val tNext = col("__f.ts"); val vNext = col(s"__f.$rightVal")
    withBF
      .withColumn("t_prev", tPrev).withColumn("v_prev", vPrev)
      .withColumn("t_next", tNext).withColumn("v_next", vNext)
      .withColumn("interp",
        when(tPrev.isNull && tNext.isNull, lit(null).cast("double"))
          .when(tPrev.isNull, vNext)
          .when(tNext.isNull, vPrev)
          .when(tNext === tPrev, vPrev)
          .otherwise(vPrev + (vNext - vPrev) *
            ((col("ts") - tPrev) / (tNext - tPrev))))
      .filter(col("__tag") === 1)
      .drop("__tag", "__r", "__b", "__f")
  }

  /** Driver-contract query (j08): each purchase annotated with the user's
    * click `value` series interpolated at the purchase instant. Equal-ts
    * clicks collapse to the max event_id's value first (j04/j06's
    * documented tie stance; event ids are unique so `max_by` is total). */
  def purchaseInterpClickValue(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.eventsUs(spark, dir)
      .select(col("event_id"), col("ts_us"), col("user_id"),
        col("event_type"), col("value"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts_us").as("ts"),
        col("event_id").as("purchase_id"))
    val clicks = ev.filter(col("event_type") === "click")
      .groupBy(col("user_id"), col("ts_us").as("ts"))
      .agg(max_by(col("value"), col("event_id")).as("v"))
    interpolate(purchases, clicks, "user_id", "v")
      .select(col("purchase_id"), col("user_id"),
        col("t_prev").as("t_prev_us"), col("t_next").as("t_next_us"),
        round(col("interp"), 6).as("interp_value"))
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
