package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The 10 canonical analytics queries Q0–Q9 (reference:
  * analytics_queries.sql, SURVEY §2.11), as DataFrame builders over the
  * star schema. Quirks reproduced verbatim where the reference's semantics
  * are well-defined (Q6 fan-out §0.2-7, Q7 row-level retention §0.2-8);
  * ORDER BYs gain natural-key tie-breaks for determinism.
  */
object AnalyticsQueries {

  private def nullifZero(c: Column): Column = when(c === 0, lit(null)).otherwise(c)

  // Exact-sum discipline for spend-bearing aggregates (see KpiViews): spend
  // is the one money column with fractional cents, so any double sum over it
  // is accumulation-order-dependent; decimal(18,6) row casts make the sums
  // exact and engine-independent. revenue/cost are whole THB — exact as
  // doubles at any order.
  private val dec = "decimal(18,6)"

  /** Q0 P&L summary over mv_channel_daily (analytics_queries.sql:12-18). */
  def q0Pnl(star: Warehouse.Star): DataFrame =
    KpiViews.channelDaily(star).agg(
      sum("revenue").as("revenue"),
      sum("cost").as("cogs"),
      sum(col("spend").cast(dec)).cast("double").as("ad_spending"),
      sum(col("revenue") - col("cost")).as("gross_profit"),
      round(sum((col("revenue") - col("cost") - col("spend")).cast(dec)), 2)
        .cast("double").as("net_profit"))

  /** Q1.1 top-5 best sellers (:26-35). */
  def q1BestSellers(star: Warehouse.Star): DataFrame =
    star.factSales
      .join(broadcast(star.dimProducts), Seq("product_id"))
      .groupBy("product_id", "item_name", "category")
      .agg(sum("quantity").as("total_units_sold"))
      .orderBy(col("total_units_sold").desc, col("product_id").asc)
      .limit(5)

  /** Q1.2 top-5 profit products (:38-46). */
  def q1TopProfit(star: Warehouse.Star): DataFrame =
    star.factSales
      .join(broadcast(star.dimProducts), Seq("product_id"))
      .groupBy("product_id", "item_name", "category")
      .agg(sum(col("revenue") - col("cost")).as("total_profit"))
      .select("item_name", "category", "total_profit")
      .orderBy(col("total_profit").desc, col("item_name").asc)
      .limit(5)

  /** Q1.3 top-5 margin products with HAVING (:49-62). */
  def q1TopMargin(star: Warehouse.Star): DataFrame =
    star.factSales
      .join(broadcast(star.dimProducts), Seq("product_id"))
      .groupBy("product_id", "item_name", "category")
      .agg(
        sum("revenue").as("total_revenue"),
        sum("cost").as("total_cost"),
        round((sum("revenue") - sum("cost")) / sum("revenue") * 100, 2).as("profit_margin_pct"))
      .filter(col("total_revenue") > 0)
      .orderBy(col("profit_margin_pct").desc, col("product_id").asc)
      .limit(5)

  /** Q2 channel KPIs over mv_channel_daily (:68-89). */
  def q2ChannelKpis(star: Warehouse.Star): DataFrame = {
    val spendSum = sum(col("spend").cast(dec)).cast("double")
    KpiViews.channelDaily(star)
      .groupBy("channel")
      .agg(
        sum("revenue").as("revenue"),
        sum("cost").as("cost"),
        sum(col("revenue") - col("cost")).as("gross_profit"),
        spendSum.as("spend"),
        round(sum((col("revenue") - col("cost") - col("spend")).cast(dec)), 2)
          .cast("double").as("net_profit"),
        round(sum("revenue") / sum("orders"), 2).as("aov"),
        round(sum("clicks").cast("double") / sum("impressions"), 4).as("ctr"),
        round(sum("revenue") / spendSum, 2).as("roas"),
        round((sum("revenue") - sum("cost")) / spendSum, 2).as("profit_roas"),
        round((sum("revenue") - spendSum) / spendSum, 2).as("roi"),
        round((sum("revenue") - sum("cost") - spendSum) / spendSum, 2).as("profit_roi"))
      .orderBy(col("net_profit").desc, col("channel").asc)
  }

  /** Q3 repeat-purchase drivers (:95-120) — groupBy-min + rejoin idiom
    * (J8), FILTER aggregation, row-level repeat counting kept verbatim. */
  def q3RepeatDrivers(star: Warehouse.Star): DataFrame = {
    val fs = star.factSales
    val firstProduct = fs.groupBy("customer_id", "product_id")
      .agg(min("date_id").as("first_date"))
    val flagged = fs.join(firstProduct, Seq("customer_id", "product_id"))
      .withColumn("is_repeat", when(col("date_id") > col("first_date"), 1).otherwise(0))
    flagged.join(broadcast(star.dimProducts.select("product_id", "item_name")), Seq("product_id"))
      .groupBy("item_name")
      .agg(
        count(when(col("is_repeat") === 1, lit(1))).as("repeat_buyers"),
        count(lit(1)).as("total_buyers"))
      .withColumn("repeat_rate",
        round(col("repeat_buyers").cast("double") / nullifZero(col("total_buyers")), 3))
      .orderBy(col("repeat_rate").desc, col("item_name").asc)
      .limit(10)
  }

  /** Q4 category winners & losers (:126-156). */
  def q4CategoryLoyalty(star: Warehouse.Star): DataFrame = {
    val enriched = star.factSales
      .join(broadcast(star.dimProducts.select("product_id", "category")), Seq("product_id"))
    val loyalty = star.factSales.groupBy("customer_id")
      .agg(count(lit(1)).as("purchase_count"))
    val categoryLoyalty = enriched.join(loyalty, Seq("customer_id"))
      .groupBy("category")
      .agg(
        count(when(col("purchase_count") > 1, lit(1))).as("repeat_customers"),
        count(lit(1)).as("total_customers"))
    enriched.groupBy("category")
      .agg(
        sum("revenue").as("revenue"),
        sum(col("revenue") - col("cost")).as("profit"),
        round(avg((col("revenue") - col("cost")) / nullifZero(col("revenue"))), 3).as("avg_margin"))
      .join(categoryLoyalty, Seq("category"))
      .withColumn("loyalty_rate",
        round(col("repeat_customers").cast("double") / nullifZero(col("total_customers")), 3))
      .select("category", "revenue", "profit", "avg_margin",
        "repeat_customers", "total_customers", "loyalty_rate")
      .orderBy(col("revenue").desc, col("category").asc)
  }

  /** Q5 hero vs free-rider quadrant (:162-190) — per-product profile
    * cross-joined with global averages. */
  def q5HeroProducts(star: Warehouse.Star): DataFrame = {
    val productProfit = star.factSales
      .join(broadcast(star.dimProducts.select("product_id", "item_name")), Seq("product_id"))
      .groupBy("product_id", "item_name")
      .agg(
        sum("quantity").as("units_sold"),
        sum("revenue").as("revenue"),
        sum(col("revenue") - col("cost")).as("profit"),
        round(avg((col("revenue") - col("cost")) / nullifZero(col("revenue"))), 3).as("margin"))
    val stats = productProfit.agg(
      avg("units_sold").as("avg_units"), avg("margin").as("avg_margin"))
    productProfit.crossJoin(broadcast(stats))
      .withColumn("product_type",
        when(col("units_sold") > col("avg_units") && col("margin") > col("avg_margin"), "HERO PRODUCT 🔥")
          .when(col("units_sold") < col("avg_units") && col("margin") > col("avg_margin"), "High Potential")
          .when(col("units_sold") > col("avg_units") && col("margin") < col("avg_margin"), "Volume Driver")
          .otherwise("Free Rider"))
      .select("product_id", "item_name", "units_sold", "revenue", "profit", "margin", "product_type")
      .orderBy(col("revenue").desc, col("product_id").asc)
  }

  /** Q6 spend-waste detection (:196-211) — composite-key LEFT JOIN whose
    * many-to-many fan-out inflates both SUMs; reproduced verbatim
    * (SURVEY §0.2-7). Thresholds are parameters because the reference's
    * literals (5000/100/3000) predate the fan-out and select 0 rows on its
    * own data; [[q6SpendWasteActive]] supplies fan-out-scaled thresholds
    * that surface the worst-ROAS campaigns (the query's stated intent). */
  def q6SpendWaste(star: Warehouse.Star,
                   minSpend: Double = 5000, maxClicks: Long = 100,
                   maxRevenue: Double = 3000): DataFrame =
    star.factSpend.alias("sp")
      .join(star.factSales.alias("fs"),
        col("sp.date_id") === col("fs.date_id") &&
          col("sp.campaign_id") === col("fs.campaign_id"), "left")
      .join(broadcast(star.dimCampaigns).alias("c"),
        col("c.campaign_id") === col("sp.campaign_id"))
      .groupBy("c.campaign_name", "c.channel")
      .agg(
        sum(col("sp.spend").cast(dec)).cast("double").as("spend"),
        sum("sp.clicks").as("clicks"),
        sum("fs.revenue").as("revenue"))
      .filter(col("spend") > minSpend && col("clicks") < maxClicks &&
        col("revenue") < maxRevenue)
      .orderBy(col("spend").desc, col("campaign_name").asc)

  /** Q6 with thresholds scaled to the fan-out magnitudes actually present
    * in the reference data (~30× inflation): selects the campaigns with
    * high spend, weak clicks, and weak attributed revenue. */
  def q6SpendWasteActive(star: Warehouse.Star): DataFrame =
    q6SpendWaste(star, minSpend = 3000000, maxClicks = 500000,
      maxRevenue = 620000)

  /** Q7 retention rate (:217-230) — counts purchase ROWS, not customers,
    * exactly as the reference does (SURVEY §0.2-8). */
  def q7Retention(star: Warehouse.Star): DataFrame = {
    val fs = star.factSales
    val firstPurchase = fs.groupBy("customer_id")
      .agg(min("date_id").as("first_purchase_date"))
    fs.join(firstPurchase, Seq("customer_id"))
      .agg(
        count(when(col("date_id") > col("first_purchase_date"), lit(1))).as("returning_customers"),
        count(lit(1)).as("total_customers"))
      .withColumn("retention_rate",
        round(col("returning_customers").cast("double") / nullifZero(col("total_customers")), 3))
  }

  /** Q8 demographic segmentation (:236-272) — age × gender bands, share of
    * totals via 1-row cross join. */
  def q8Demographics(star: Warehouse.Star): DataFrame = {
    val segments = star.dimCustomers.select(
      col("customer_id"),
      when(col("age") < 20, "Under 20")
        .when(col("age").between(20, 29), "20–29")
        .when(col("age").between(30, 39), "30–39")
        .when(col("age").between(40, 49), "40–49")
        .otherwise("50+").as("age_group"),
      col("gender"))
    val segmentSales = star.factSales
      .join(broadcast(segments), Seq("customer_id"))
      .groupBy("age_group", "gender")
      .agg(
        countDistinct("customer_id").as("customers"),
        sum("revenue").as("total_revenue"),
        sum("quantity").as("total_units"))
    val totals = segmentSales.agg(
      sum("customers").as("all_customers"),
      sum("total_revenue").as("all_revenue"),
      sum("total_units").as("all_units"))
    segmentSales.crossJoin(broadcast(totals))
      .withColumn("pct_customers",
        round(col("customers").cast("double") / col("all_customers") * 100, 2))
      .withColumn("pct_revenue",
        round(col("total_revenue") / col("all_revenue") * 100, 2))
      .select("age_group", "gender", "customers", "total_revenue", "total_units",
        "pct_customers", "pct_revenue")
      .orderBy(col("pct_revenue").desc, col("age_group").asc, col("gender").asc)
  }

  /** Q9 frequency segmentation (:278-319). */
  def q9Frequency(star: Warehouse.Star): DataFrame = {
    val freq = star.factSales.groupBy("customer_id")
      .agg(count(lit(1)).as("purchase_count"))
      .select(
        col("customer_id"),
        when(col("purchase_count") >= 10, "Whales (10+ orders)")
          .when(col("purchase_count") >= 5, "Heavy Buyers (5–9)")
          .when(col("purchase_count") >= 2, "Repeat Buyers (2–4)")
          .otherwise("One-Time Buyers").as("segment"))
    val segmentSales = star.factSales.join(freq, Seq("customer_id"))
      .groupBy("segment")
      .agg(
        count(lit(1)).as("customers"),
        sum("revenue").as("total_revenue"),
        sum("quantity").as("total_units"))
    val totals = segmentSales.agg(
      sum("customers").as("all_customers"),
      sum("total_revenue").as("all_revenue"),
      sum("total_units").as("all_units"))
    segmentSales.crossJoin(broadcast(totals))
      .withColumn("pct_customers",
        round(col("customers").cast("double") / col("all_customers") * 100, 2))
      .withColumn("pct_revenue",
        round(col("total_revenue") / col("all_revenue") * 100, 2))
      .withColumn("pct_units",
        round(col("total_units").cast("double") / col("all_units") * 100, 2))
      .select("segment", "customers", "total_revenue", "total_units",
        "pct_customers", "pct_revenue", "pct_units")
      .orderBy(col("pct_revenue").desc, col("segment").asc)
  }
}
