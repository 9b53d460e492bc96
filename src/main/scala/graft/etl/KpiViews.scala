package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The three KPI views (reference: etl_script/04_views.sql).
  *
  * Structure preserved from the reference: pre-aggregate BOTH facts to the
  * (date_id, campaign_id) grain FIRST, then FULL OUTER merge + COALESCE
  * zeros (04_views.sql:17-46). The pre-agg is load-bearing for correctness
  * (without it the merge double-counts — SURVEY §7.5-2) and for scale (the
  * shuffled rows are date×campaign grains, not raw facts; both sides then
  * share hash partitioning on the same key, so the full-outer join
  * colocates without an extra exchange).
  *
  * KPI formulas (04_views.sql:114-142): aov revenue/orders, ctr
  * clicks/impressions, roas revenue/spend, profit_roas (revenue-cost)/spend,
  * roi (revenue-spend)/spend, profit_roi (revenue-cost-spend)/spend — NULL
  * on zero denominator, 4dp (ctr 6dp, spend 2dp).
  *
  * Deviation (documented, SURVEY §0.2-5): mv_channel_daily's reference ctr
  * is Postgres INT/INT division (always 0); we compute the true ratio, as
  * the reference's own kpi views do.
  */
object KpiViews {

  private def nullifZero(c: Column): Column = when(c === 0, lit(null)).otherwise(c)

  // Exact-sum discipline for `spend` (the one money column with true
  // fractional cents — revenue/cost are whole THB, so their double sums are
  // exact at any accumulation order): cast each ROW to decimal(18,6) before
  // summing; decimal addition is exact/order-independent, so the sum — and
  // the DuckDB oracle's — match bitwise regardless of partitioning. See
  // queries/Relational.scala q05 for the original derivation.
  private val dec = "decimal(18,6)"
  private def spendExact: Column = sum(col("spend").cast(dec)).cast("double")

  /** fs_agg ⟗ sp_agg at (date_id, campaign_id) grain with COALESCE zeros
    * (04_views.sql:17-46) — shared by all three views. */
  def merged(star: Warehouse.Star): DataFrame = {
    val fsAgg = star.factSales
      .groupBy("date_id", "campaign_id")
      .agg(
        sum("revenue").as("revenue"),
        sum("cost").as("cost"),
        countDistinct("sale_id").as("orders"))
    val spAgg = star.factSpend
      .groupBy("date_id", "campaign_id")
      .agg(
        sum("spend").as("spend"),
        sum("clicks").as("clicks"),
        sum("impressions").as("impressions"))
    fsAgg.join(spAgg, Seq("date_id", "campaign_id"), "full_outer")
      .select(
        col("date_id"), col("campaign_id"),
        coalesce(col("revenue"), lit(0.0)).as("revenue"),
        coalesce(col("cost"), lit(0.0)).as("cost"),
        coalesce(col("orders"), lit(0L)).as("orders"),
        coalesce(col("spend"), lit(0.0)).as("spend"),
        coalesce(col("clicks"), lit(0L)).as("clicks"),
        coalesce(col("impressions"), lit(0L)).as("impressions"))
  }

  /** mv_channel_daily (04_views.sql:16-64): date × channel daily rollup. */
  def channelDaily(star: Warehouse.Star): DataFrame =
    merged(star)
      .join(broadcast(star.dimCampaigns.select("campaign_id", "channel")),
        Seq("campaign_id"), "left")
      .join(broadcast(star.dimDate.select("date_id", "date")), Seq("date_id"))
      .groupBy("date", "channel")
      .agg(
        sum("revenue").as("revenue"),
        sum("cost").as("cost"),
        round(sum(col("spend").cast(dec)), 2).cast("double").as("spend"),
        sum("clicks").as("clicks"),
        sum("impressions").as("impressions"),
        round(sum("clicks").cast("double") / nullifZero(sum("impressions")), 6).as("ctr"),
        sum("orders").as("orders"))
      .orderBy("date", "channel")

  /** Partition-incremental refresh of [[channelDaily]] — the 100 TB
    * nightly path. The reference rebuilds every view from scratch each
    * night (README.md:261-264, cron full rerun); at warehouse scale the
    * nightly delta touches one day of a multi-year fact table, so the
    * incremental form recomputes ONLY the rollup rows whose date is in the
    * delta and stitches them onto the untouched history:
    *
    *   out = existing WHERE date < cutoff  ∪  rollup(facts WHERE date ≥ cutoff)
    *
    * Correct because the rollup is date-partitioned: every output row
    * depends only on its own date's facts (all aggregates, including the
    * ctr ratio, are computed within one (date, channel) group). The
    * history side is a pure partition-pruning filter — no join, no
    * recompute, and when `existing` is a date-partitioned parquet table
    * the scan skips history files entirely. Equality with the full
    * recompute is hash-proven through the driver gate
    * (ref_mv_channel_daily_incr shares ref_mv_channel_daily's oracle). */
  def channelDailyIncremental(existing: DataFrame, star: Warehouse.Star,
                              cutoffDateId: Long): DataFrame = {
    val deltaStar = star.copy(
      factSales = star.factSales.filter(col("date_id") >= cutoffDateId),
      factSpend = star.factSpend.filter(col("date_id") >= cutoffDateId))
    existing.filter(col("date") < to_date(timestamp_seconds(lit(cutoffDateId))))
      .unionByName(channelDaily(deltaStar))
      .orderBy("date", "channel")
  }

  private def kpiCols: Seq[Column] = Seq(
    sum(col("revenue")).as("revenue"),
    sum(col("cost")).as("cost"),
    round(sum(col("spend").cast(dec)), 2).cast("double").as("spend"),
    sum(col("revenue") - col("cost")).as("gross_profit"),
    sum(col("clicks")).as("clicks"),
    sum(col("impressions")).as("impressions"),
    sum(col("orders")).as("orders"),
    round(sum(col("revenue")) / nullifZero(sum(col("orders"))), 4).as("aov"),
    round(sum(col("clicks")).cast("double") / nullifZero(sum(col("impressions"))), 6).as("ctr"),
    round(sum(col("revenue")) / nullifZero(spendExact), 4).as("roas"),
    round((sum(col("revenue")) - sum(col("cost"))) / nullifZero(spendExact), 4).as("profit_roas"),
    round((sum(col("revenue")) - spendExact) / nullifZero(spendExact), 4).as("roi"),
    round((sum(col("revenue")) - sum(col("cost")) - spendExact) / nullifZero(spendExact), 4).as("profit_roi"))

  /** mv_kpi_channel (04_views.sql:70-147). */
  def kpiChannel(star: Warehouse.Star): DataFrame =
    merged(star)
      .join(broadcast(star.dimCampaigns.select("campaign_id", "channel")),
        Seq("campaign_id"), "left")
      .groupBy("channel")
      .agg(kpiCols.head, kpiCols.tail: _*)
      .orderBy("channel")

  /** mv_kpi_campaign (04_views.sql:153-232). */
  def kpiCampaign(star: Warehouse.Star): DataFrame =
    merged(star)
      .join(broadcast(star.dimCampaigns), Seq("campaign_id"), "left")
      .groupBy("campaign_id", "campaign_name", "channel")
      .agg(kpiCols.head, kpiCols.tail: _*)
      .orderBy("campaign_id")
}
