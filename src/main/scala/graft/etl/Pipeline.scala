package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}

/** End-to-end pipeline orchestration (reference: run_etl.sh — but one
  * driver program, no process/network hops; SURVEY §3.1).
  *
  * The reference's 5-step shell pipeline (createdb → DDL → pandas load →
  * transform → views) collapses to: read 2 CSVs → build 6 lazy DataFrames →
  * register temp views. Stage boundaries exist only at shuffles; Catalyst
  * plans each downstream action end-to-end (views inline into the
  * LogicalPlan exactly like Postgres view rewriting, §3.2).
  */
object Pipeline {

  val DefaultRawDir = "/root/reference/data/raw"

  /** Build the star schema and register all warehouse + view temp views.
    * Views are registered as builder results — like the reference's
    * non-materialized views they re-derive per query; callers wanting
    * reuse across many queries can .cache() the Star frames. */
  def run(spark: SparkSession, rawDir: String = DefaultRawDir): Warehouse.Star = {
    val star = Warehouse.fromRawDir(spark, rawDir)
    star.registerTempViews()
    KpiViews.channelDaily(star).createOrReplaceTempView("mv_channel_daily")
    KpiViews.kpiChannel(star).createOrReplaceTempView("mv_kpi_channel")
    KpiViews.kpiCampaign(star).createOrReplaceTempView("mv_kpi_campaign")
    star
  }

  /** All named query surfaces over a built star — the analyst-facing
    * catalog (reference: analytics_queries.sql + 04_views.sql). */
  def queryCatalog(star: Warehouse.Star,
                   rawDir: String = DefaultRawDir): Map[String, () => DataFrame] = Map(
    // Promotions enrichment (reference 02_load_csv.py:17-38 loads
    // campaigns_details + promotion_reference then never joins them —
    // SURVEY §0.2-2/3): the campaign dim enriched with its declared
    // channel, run dates, and promo discount. promo_code normalizes to
    // '' so no-promo campaigns hit the reference file's own ('', 0) row
    // instead of a hardcoded default. Both join sides are file-sized —
    // broadcast, no shuffle.
    "promo_enrichment" -> (() => {
      import org.apache.spark.sql.functions.{broadcast, coalesce, col, lit}
      val spark = star.dimCampaigns.sparkSession
      Warehouse.Enrichment.enrichCampaigns(
          star.dimCampaigns, Ingest.campaignsDetails(spark, rawDir))
        .withColumn("promo_code", coalesce(col("promo_code"), lit("")))
        .join(broadcast(
          Warehouse.Enrichment.dimPromotions(Ingest.promo(spark, rawDir))),
          Seq("promo_code"), "left")
        .select(col("campaign_id"), col("campaign_name"), col("channel"),
          col("declared_channel"), col("promo_code"),
          col("start_date"), col("end_date"), col("discount_pct"))
        .orderBy("campaign_id")
    }),
    "mv_channel_daily" -> (() => KpiViews.channelDaily(star)),
    // nightly-refresh form: history (last 31 days held out) + delta rollup;
    // must equal mv_channel_daily row-for-row (same oracle)
    "mv_channel_daily_incr" -> (() => {
      val cutoff = java.time.LocalDate.of(2025, 10, 1).toEpochDay * 86400L
      val history = star.copy(
        factSales = star.factSales.filter(org.apache.spark.sql.functions.col("date_id") < cutoff),
        factSpend = star.factSpend.filter(org.apache.spark.sql.functions.col("date_id") < cutoff))
      KpiViews.channelDailyIncremental(KpiViews.channelDaily(history), star, cutoff)
    }),
    "mv_kpi_channel"   -> (() => KpiViews.kpiChannel(star)),
    "mv_kpi_campaign"  -> (() => KpiViews.kpiCampaign(star)),
    "q0_pnl"           -> (() => AnalyticsQueries.q0Pnl(star)),
    "q1_best_sellers"  -> (() => AnalyticsQueries.q1BestSellers(star)),
    "q1_top_profit"    -> (() => AnalyticsQueries.q1TopProfit(star)),
    "q1_top_margin"    -> (() => AnalyticsQueries.q1TopMargin(star)),
    "q2_channel_kpis"  -> (() => AnalyticsQueries.q2ChannelKpis(star)),
    "q3_repeat_drivers"-> (() => AnalyticsQueries.q3RepeatDrivers(star)),
    "q4_category"      -> (() => AnalyticsQueries.q4CategoryLoyalty(star)),
    "q5_hero_products" -> (() => AnalyticsQueries.q5HeroProducts(star)),
    "q6_spend_waste"   -> (() => AnalyticsQueries.q6SpendWaste(star)),
    "q6_spend_waste_active" -> (() => AnalyticsQueries.q6SpendWasteActive(star)),
    "q7_retention"     -> (() => AnalyticsQueries.q7Retention(star)),
    "q8_demographics"  -> (() => AnalyticsQueries.q8Demographics(star)),
    "q9_frequency"     -> (() => AnalyticsQueries.q9Frequency(star)),
  )
}
