package graft.etl

/** DuckDB oracle SQL for the `ref_*` reference-parity surfaces.
  *
  * Unlike the testdata oracles (which read the driver's parquet tables),
  * these are SELF-CONTAINED: each statement `read_csv`s the reference's raw
  * CSVs (the same two files `graft.etl.Ingest` reads) and rebuilds the star
  * schema as CTEs — a line-by-line port of etl_script/03_transform.sql +
  * 04_views.sql + analytics_queries.sql into DuckDB SQL, so the driver can
  * hash-compare the Spark pipeline output against an independent engine.
  *
  * The three documented deviations from the reference (SURVEY §0.2) are
  * mirrored here exactly as the Spark side implements them:
  *   - channel = trim(regexp_extract(name, '^[^0-9]+'))   (§0.2-4: the
  *     reference's REGEXP_SUBSTR keeps a trailing space; we trim)
  *   - mv_channel_daily.ctr is the true clicks/impressions ratio (§0.2-5:
  *     the reference's INT/INT division is always 0)
  *   - surrogate ids are deterministic row_number() over the natural key
  *     (§0.2-6); orders = COUNT(*) since sale_id is unique by construction
  *
  * Cross-engine typing rules (memory: oracle-parity-discipline):
  *   - integer SUM/COUNT casts to BIGINT (DuckDB sum(BIGINT) → HUGEINT)
  *   - row_number() casts to INT (matches Spark's IntegerType)
  *   - ASC sort keys carry NULLS FIRST, DESC keys NULLS LAST (Spark's
  *     defaults; DuckDB defaults to NULLS LAST for both)
  */
object RefOracles {

  private val RawDir = Pipeline.DefaultRawDir

  /** Raw CSVs with Ingest's explicit schema (all_varchar + explicit casts —
    * mirrors "no inferSchema"; dates parse M/d/yyyy like 03_transform.sql).
    */
  private val rawCte =
    s"""tx AS (
       |  SELECT strptime("Transaction Date", '%m/%d/%Y')::DATE AS tx_date,
       |         "Customer ID" AS customer_id,
       |         "Age"::INT AS age,
       |         "Gender" AS gender,
       |         "Item Purchased" AS item_name,
       |         "Category" AS category,
       |         "Quantity"::INT AS quantity,
       |         "Purchase Amount (THB)"::DOUBLE AS revenue,
       |         "Cost Price (THB)"::DOUBLE AS cost,
       |         "Location" AS location,
       |         "Subscription Status" AS subscription_status,
       |         "Campaign Name" AS campaign_name
       |  FROM read_csv('$RawDir/ecom_mens_streetwear_10000.csv',
       |                header=true, all_varchar=true)),
       |sp_raw AS (
       |  SELECT strptime("Date", '%m/%d/%Y')::DATE AS sp_date,
       |         "Campaign Name" AS campaign_name,
       |         "Spending"::DOUBLE AS spend,
       |         "Impressions"::BIGINT AS impressions,
       |         "Clicks"::BIGINT AS clicks
       |  FROM read_csv('$RawDir/channel_spend_daily_campaign.csv',
       |                header=true, all_varchar=true))""".stripMargin

  /** Star schema (03_transform.sql): dims from DISTINCT natural keys with
    * deterministic ids, facts via natural-key LEFT JOINs. fact_sales'
    * date_id is computed directly (epoch of the parsed date) — provably
    * identical to the dim_date left join since dim_date is built from the
    * same column and the mapping is injective. */
  private val starCte =
    s"""dim_dates AS (
       |  SELECT DISTINCT tx_date AS date,
       |         epoch(tx_date::TIMESTAMP)::BIGINT AS date_id
       |  FROM tx),
       |dim_products AS (
       |  SELECT CAST(row_number() OVER (ORDER BY item_name, category) AS INT)
       |           AS product_id,
       |         item_name, category
       |  FROM (SELECT DISTINCT item_name, category FROM tx)),
       |dim_campaigns AS (
       |  SELECT CAST(row_number() OVER (ORDER BY campaign_name) AS INT)
       |           AS campaign_id,
       |         campaign_name,
       |         trim(regexp_extract(campaign_name, '^[^0-9]+')) AS channel
       |  FROM (SELECT DISTINCT campaign_name FROM tx)),
       |dim_customers AS (
       |  SELECT DISTINCT customer_id, age, gender, location,
       |         subscription_status
       |  FROM tx),
       |fact_sales AS (
       |  SELECT epoch(t.tx_date::TIMESTAMP)::BIGINT AS date_id,
       |         t.customer_id, p.product_id, c.campaign_id,
       |         t.quantity, t.revenue, t.cost
       |  FROM tx t
       |  LEFT JOIN dim_products p ON t.item_name = p.item_name
       |  LEFT JOIN dim_campaigns c ON t.campaign_name = c.campaign_name),
       |fact_spend AS (
       |  SELECT d.date_id, c.campaign_id, s.spend, s.impressions, s.clicks
       |  FROM sp_raw s
       |  LEFT JOIN dim_dates d ON s.sp_date = d.date
       |  LEFT JOIN dim_campaigns c ON s.campaign_name = c.campaign_name)""".stripMargin

  /** Pre-agg both facts to (date_id, campaign_id) grain, FULL OUTER merge,
    * COALESCE zeros (04_views.sql:17-46). */
  private val mergedCte =
    """fs_agg AS (
      |  SELECT date_id, campaign_id,
      |         sum(revenue) AS revenue, sum(cost) AS cost,
      |         count(*)::BIGINT AS orders
      |  FROM fact_sales GROUP BY date_id, campaign_id),
      |sp_agg AS (
      |  SELECT date_id, campaign_id,
      |         sum(spend) AS spend,
      |         sum(clicks)::BIGINT AS clicks,
      |         sum(impressions)::BIGINT AS impressions
      |  FROM fact_spend GROUP BY date_id, campaign_id),
      |merged AS (
      |  SELECT coalesce(f.date_id, s.date_id) AS date_id,
      |         coalesce(f.campaign_id, s.campaign_id) AS campaign_id,
      |         coalesce(f.revenue, 0) AS revenue,
      |         coalesce(f.cost, 0) AS cost,
      |         coalesce(f.orders, 0) AS orders,
      |         coalesce(s.spend, 0) AS spend,
      |         coalesce(s.clicks, 0) AS clicks,
      |         coalesce(s.impressions, 0) AS impressions
      |  FROM fs_agg f FULL OUTER JOIN sp_agg s
      |    ON f.date_id = s.date_id AND f.campaign_id = s.campaign_id)""".stripMargin

  /** mv_channel_daily (04_views.sql:16-64) as a CTE (no ORDER BY — callers
    * aggregate over it; the view query itself appends the sort). */
  private val channelDailyCte =
    """channel_daily AS (
      |  SELECT d.date, c.channel,
      |         sum(m.revenue) AS revenue,
      |         sum(m.cost) AS cost,
      |         CAST(round(sum(CAST(m.spend AS DECIMAL(18,6))), 2) AS DOUBLE)
      |           AS spend,
      |         sum(m.clicks)::BIGINT AS clicks,
      |         sum(m.impressions)::BIGINT AS impressions,
      |         round(sum(m.clicks)::DOUBLE / nullif(sum(m.impressions), 0), 6)
      |           AS ctr,
      |         sum(m.orders)::BIGINT AS orders
      |  FROM merged m
      |  LEFT JOIN dim_campaigns c ON m.campaign_id = c.campaign_id
      |  JOIN dim_dates d ON m.date_id = d.date_id
      |  GROUP BY d.date, c.channel)""".stripMargin

  /** KPI formula block shared by mv_kpi_channel / mv_kpi_campaign
    * (04_views.sql:102-142). */
  private val kpiCols =
    """sum(m.revenue) AS revenue,
      |  sum(m.cost) AS cost,
      |  CAST(round(sum(CAST(m.spend AS DECIMAL(18,6))), 2) AS DOUBLE) AS spend,
      |  sum(m.revenue - m.cost) AS gross_profit,
      |  sum(m.clicks)::BIGINT AS clicks,
      |  sum(m.impressions)::BIGINT AS impressions,
      |  sum(m.orders)::BIGINT AS orders,
      |  round(sum(m.revenue) / nullif(sum(m.orders), 0), 4) AS aov,
      |  round(sum(m.clicks)::DOUBLE / nullif(sum(m.impressions), 0), 6) AS ctr,
      |  round(sum(m.revenue)
      |        / nullif(sum(CAST(m.spend AS DECIMAL(18,6)))::DOUBLE, 0), 4)
      |    AS roas,
      |  round((sum(m.revenue) - sum(m.cost))
      |        / nullif(sum(CAST(m.spend AS DECIMAL(18,6)))::DOUBLE, 0), 4)
      |    AS profit_roas,
      |  round((sum(m.revenue) - sum(CAST(m.spend AS DECIMAL(18,6)))::DOUBLE)
      |        / nullif(sum(CAST(m.spend AS DECIMAL(18,6)))::DOUBLE, 0), 4)
      |    AS roi,
      |  round((sum(m.revenue) - sum(m.cost)
      |         - sum(CAST(m.spend AS DECIMAL(18,6)))::DOUBLE)
      |        / nullif(sum(CAST(m.spend AS DECIMAL(18,6)))::DOUBLE, 0), 4)
      |    AS profit_roi""".stripMargin

  private val star = s"$rawCte,\n$starCte"
  private val warehouse = s"$star,\n$mergedCte"
  private val withViews = s"$warehouse,\n$channelDailyCte"

  val sql: Map[String, String] = Map(

    // S2 sink round trip (WarehouseSink.roundTrip): the Spark side writes
    // the star through the partitioned parquet sink and reads it back;
    // this oracle rebuilds the same deterministic projection straight from
    // the raw CSVs — a hash match proves the sink preserves every value
    // through the dt-partition encode/decode.
    "ref_warehouse_roundtrip" ->
      s"""WITH $star
         |SELECT f.date_id, f.customer_id, f.product_id, f.campaign_id,
         |       f.quantity, f.revenue, f.cost, p.item_name, p.category
         |FROM fact_sales f
         |LEFT JOIN dim_products p USING (product_id)
         |ORDER BY date_id ASC NULLS FIRST, customer_id ASC NULLS FIRST,
         |         product_id ASC NULLS FIRST, campaign_id ASC NULLS FIRST,
         |         quantity ASC NULLS FIRST, revenue ASC NULLS FIRST,
         |         cost ASC NULLS FIRST""".stripMargin,

    "ref_mv_channel_daily" ->
      s"""WITH $withViews
         |SELECT * FROM channel_daily
         |ORDER BY date ASC NULLS FIRST, channel ASC NULLS FIRST""".stripMargin,

    // incremental refresh must equal the full rebuild row-for-row, so it
    // shares mv_channel_daily's oracle verbatim
    "ref_mv_channel_daily_incr" ->
      s"""WITH $withViews
         |SELECT * FROM channel_daily
         |ORDER BY date ASC NULLS FIRST, channel ASC NULLS FIRST""".stripMargin,

    // Promotions enrichment: the campaign dim joined to the two
    // loaded-but-unused reference CSVs (campaigns_details promo/run-dates,
    // promotion_reference discounts). promo_code normalizes to '' so the
    // no-promo campaigns match the reference file's own ('', 0) row.
    "ref_promo_enrichment" ->
      s"""WITH $star,
         |det AS (
         |  SELECT campaign_name, channel AS declared_channel, promo_code,
         |         start_date::DATE AS start_date, end_date::DATE AS end_date
         |  FROM read_csv('$RawDir/campaigns_details.csv',
         |                header=true, all_varchar=true)),
         |promo AS (
         |  SELECT coalesce(promo_code, '') AS promo_code,
         |         discount_pct::INT AS discount_pct
         |  FROM read_csv('$RawDir/promotion_reference.csv',
         |                header=true, all_varchar=true))
         |SELECT c.campaign_id, c.campaign_name, c.channel,
         |       d.declared_channel,
         |       coalesce(d.promo_code, '') AS promo_code,
         |       d.start_date, d.end_date, p.discount_pct
         |FROM dim_campaigns c
         |LEFT JOIN det d USING (campaign_name)
         |LEFT JOIN promo p ON coalesce(d.promo_code, '') = p.promo_code
         |ORDER BY c.campaign_id ASC NULLS FIRST""".stripMargin,

    "ref_mv_kpi_channel" ->
      s"""WITH $warehouse
         |SELECT c.channel,
         |  $kpiCols
         |FROM merged m
         |LEFT JOIN dim_campaigns c ON m.campaign_id = c.campaign_id
         |GROUP BY c.channel
         |ORDER BY c.channel ASC NULLS FIRST""".stripMargin,

    "ref_mv_kpi_campaign" ->
      s"""WITH $warehouse
         |SELECT c.campaign_id, c.campaign_name, c.channel,
         |  $kpiCols
         |FROM merged m
         |LEFT JOIN dim_campaigns c ON m.campaign_id = c.campaign_id
         |GROUP BY c.campaign_id, c.campaign_name, c.channel
         |ORDER BY c.campaign_id ASC NULLS FIRST""".stripMargin,

    // Q0 (analytics_queries.sql:12-18)
    "ref_q0_pnl" ->
      s"""WITH $withViews
         |SELECT sum(revenue) AS revenue,
         |       sum(cost) AS cogs,
         |       sum(CAST(spend AS DECIMAL(18,6)))::DOUBLE AS ad_spending,
         |       sum(revenue - cost) AS gross_profit,
         |       CAST(round(sum(CAST(revenue - cost - spend AS DECIMAL(18,6))),
         |                  2) AS DOUBLE) AS net_profit
         |FROM channel_daily""".stripMargin,

    // Q1.1 (:26-35)
    "ref_q1_best_sellers" ->
      s"""WITH $star
         |SELECT p.product_id, p.item_name, p.category,
         |       sum(fs.quantity)::BIGINT AS total_units_sold
         |FROM fact_sales fs
         |JOIN dim_products p ON fs.product_id = p.product_id
         |GROUP BY p.product_id, p.item_name, p.category
         |ORDER BY total_units_sold DESC, p.product_id ASC
         |LIMIT 5""".stripMargin,

    // Q1.2 (:38-46)
    "ref_q1_top_profit" ->
      s"""WITH $star
         |SELECT p.item_name, p.category,
         |       sum(fs.revenue - fs.cost) AS total_profit
         |FROM fact_sales fs
         |JOIN dim_products p ON fs.product_id = p.product_id
         |GROUP BY p.product_id, p.item_name, p.category
         |ORDER BY total_profit DESC, p.item_name ASC
         |LIMIT 5""".stripMargin,

    // Q1.3 (:49-62)
    "ref_q1_top_margin" ->
      s"""WITH $star
         |SELECT p.product_id, p.item_name, p.category,
         |       sum(fs.revenue) AS total_revenue,
         |       sum(fs.cost) AS total_cost,
         |       round((sum(fs.revenue) - sum(fs.cost)) / sum(fs.revenue) * 100,
         |             2) AS profit_margin_pct
         |FROM fact_sales fs
         |JOIN dim_products p ON fs.product_id = p.product_id
         |GROUP BY p.product_id, p.item_name, p.category
         |HAVING sum(fs.revenue) > 0
         |ORDER BY profit_margin_pct DESC, p.product_id ASC
         |LIMIT 5""".stripMargin,

    // Q2 (:68-89)
    "ref_q2_channel_kpis" ->
      s"""WITH $withViews
         |SELECT channel,
         |  sum(revenue) AS revenue,
         |  sum(cost) AS cost,
         |  sum(revenue - cost) AS gross_profit,
         |  sum(CAST(spend AS DECIMAL(18,6)))::DOUBLE AS spend,
         |  CAST(round(sum(CAST(revenue - cost - spend AS DECIMAL(18,6))), 2)
         |       AS DOUBLE) AS net_profit,
         |  round(sum(revenue) / sum(orders), 2) AS aov,
         |  round(sum(clicks)::DOUBLE / sum(impressions), 4) AS ctr,
         |  round(sum(revenue) / sum(CAST(spend AS DECIMAL(18,6)))::DOUBLE, 2)
         |    AS roas,
         |  round((sum(revenue) - sum(cost))
         |        / sum(CAST(spend AS DECIMAL(18,6)))::DOUBLE, 2) AS profit_roas,
         |  round((sum(revenue) - sum(CAST(spend AS DECIMAL(18,6)))::DOUBLE)
         |        / sum(CAST(spend AS DECIMAL(18,6)))::DOUBLE, 2) AS roi,
         |  round((sum(revenue) - sum(cost)
         |         - sum(CAST(spend AS DECIMAL(18,6)))::DOUBLE)
         |        / sum(CAST(spend AS DECIMAL(18,6)))::DOUBLE, 2) AS profit_roi
         |FROM channel_daily
         |GROUP BY channel
         |ORDER BY net_profit DESC NULLS LAST, channel ASC NULLS FIRST""".stripMargin,

    // Q3 (:95-120)
    "ref_q3_repeat_drivers" ->
      s"""WITH $star,
         |first_product AS (
         |  SELECT customer_id, product_id, min(date_id) AS first_date
         |  FROM fact_sales GROUP BY customer_id, product_id),
         |flagged AS (
         |  SELECT fs.product_id,
         |         CASE WHEN fs.date_id > fp.first_date THEN 1 ELSE 0 END
         |           AS is_repeat
         |  FROM fact_sales fs
         |  JOIN first_product fp USING (customer_id, product_id))
         |SELECT p.item_name,
         |  (count(*) FILTER (WHERE is_repeat = 1))::BIGINT AS repeat_buyers,
         |  count(*)::BIGINT AS total_buyers,
         |  round((count(*) FILTER (WHERE is_repeat = 1))::DOUBLE
         |        / nullif(count(*), 0), 3) AS repeat_rate
         |FROM flagged f
         |JOIN dim_products p ON f.product_id = p.product_id
         |GROUP BY p.item_name
         |ORDER BY repeat_rate DESC NULLS LAST, item_name ASC
         |LIMIT 10""".stripMargin,

    // Q4 (:126-156)
    "ref_q4_category" ->
      s"""WITH $star,
         |enriched AS (
         |  SELECT fs.*, p.category
         |  FROM fact_sales fs
         |  JOIN dim_products p ON fs.product_id = p.product_id),
         |loyalty AS (
         |  SELECT customer_id, count(*)::BIGINT AS purchase_count
         |  FROM fact_sales GROUP BY customer_id),
         |cat_loyalty AS (
         |  SELECT e.category,
         |    (count(*) FILTER (WHERE l.purchase_count > 1))::BIGINT
         |      AS repeat_customers,
         |    count(*)::BIGINT AS total_customers
         |  FROM enriched e JOIN loyalty l USING (customer_id)
         |  GROUP BY e.category)
         |SELECT e.category,
         |  sum(e.revenue) AS revenue,
         |  sum(e.revenue - e.cost) AS profit,
         |  round(avg((e.revenue - e.cost) / nullif(e.revenue, 0)), 3)
         |    AS avg_margin,
         |  cl.repeat_customers, cl.total_customers,
         |  round(cl.repeat_customers::DOUBLE / nullif(cl.total_customers, 0), 3)
         |    AS loyalty_rate
         |FROM enriched e JOIN cat_loyalty cl USING (category)
         |GROUP BY e.category, cl.repeat_customers, cl.total_customers
         |ORDER BY revenue DESC, category ASC""".stripMargin,

    // Q5 (:162-190)
    "ref_q5_hero_products" ->
      s"""WITH $star,
         |pp AS (
         |  SELECT p.product_id, p.item_name,
         |         sum(fs.quantity)::BIGINT AS units_sold,
         |         sum(fs.revenue) AS revenue,
         |         sum(fs.revenue - fs.cost) AS profit,
         |         round(avg((fs.revenue - fs.cost) / nullif(fs.revenue, 0)), 3)
         |           AS margin
         |  FROM fact_sales fs
         |  JOIN dim_products p ON fs.product_id = p.product_id
         |  GROUP BY p.product_id, p.item_name),
         |stats AS (
         |  SELECT avg(units_sold) AS avg_units, avg(margin) AS avg_margin
         |  FROM pp)
         |SELECT pp.product_id, pp.item_name, pp.units_sold, pp.revenue,
         |       pp.profit, pp.margin,
         |  CASE
         |    WHEN pp.units_sold > s.avg_units AND pp.margin > s.avg_margin
         |      THEN 'HERO PRODUCT 🔥'
         |    WHEN pp.units_sold < s.avg_units AND pp.margin > s.avg_margin
         |      THEN 'High Potential'
         |    WHEN pp.units_sold > s.avg_units AND pp.margin < s.avg_margin
         |      THEN 'Volume Driver'
         |    ELSE 'Free Rider'
         |  END AS product_type
         |FROM pp CROSS JOIN stats s
         |ORDER BY pp.revenue DESC, pp.product_id ASC""".stripMargin,

    // Q6 (:196-211) with ACTIVE thresholds — the reference's literals
    // (5000/100/3000) select 0 rows on its own data because the fan-out
    // LEFT JOIN inflates SUM(spend)/SUM(clicks) ~30x (SURVEY §0.2-7); these
    // thresholds keep the exact shape but select the worst-ROAS campaigns.
    "ref_q6_spend_waste_active" ->
      s"""WITH $star
         |SELECT c.campaign_name, c.channel,
         |       sum(CAST(sp.spend AS DECIMAL(18,6)))::DOUBLE AS spend,
         |       sum(sp.clicks)::BIGINT AS clicks,
         |       sum(fs.revenue) AS revenue
         |FROM fact_spend sp
         |LEFT JOIN fact_sales fs
         |  ON sp.date_id = fs.date_id AND sp.campaign_id = fs.campaign_id
         |JOIN dim_campaigns c ON c.campaign_id = sp.campaign_id
         |GROUP BY c.campaign_name, c.channel
         |HAVING sum(CAST(sp.spend AS DECIMAL(18,6)))::DOUBLE > 3000000
         |   AND sum(sp.clicks) < 500000
         |   AND sum(fs.revenue) < 620000
         |ORDER BY spend DESC, campaign_name ASC""".stripMargin,

    // Q7 (:217-230)
    "ref_q7_retention" ->
      s"""WITH $star,
         |fp AS (
         |  SELECT customer_id, min(date_id) AS first_purchase_date
         |  FROM fact_sales GROUP BY customer_id)
         |SELECT
         |  (count(*) FILTER (WHERE fs.date_id > fp.first_purchase_date))::BIGINT
         |    AS returning_customers,
         |  count(*)::BIGINT AS total_customers,
         |  round((count(*) FILTER (WHERE fs.date_id > fp.first_purchase_date))::DOUBLE
         |        / nullif(count(*), 0), 3) AS retention_rate
         |FROM fact_sales fs JOIN fp USING (customer_id)""".stripMargin,

    // Q8 (:236-272)
    "ref_q8_demographics" ->
      s"""WITH $star,
         |segments AS (
         |  SELECT customer_id,
         |    CASE WHEN age < 20 THEN 'Under 20'
         |         WHEN age BETWEEN 20 AND 29 THEN '20–29'
         |         WHEN age BETWEEN 30 AND 39 THEN '30–39'
         |         WHEN age BETWEEN 40 AND 49 THEN '40–49'
         |         ELSE '50+' END AS age_group,
         |    gender
         |  FROM dim_customers),
         |seg_sales AS (
         |  SELECT s.age_group, s.gender,
         |         count(DISTINCT fs.customer_id)::BIGINT AS customers,
         |         sum(fs.revenue) AS total_revenue,
         |         sum(fs.quantity)::BIGINT AS total_units
         |  FROM fact_sales fs JOIN segments s USING (customer_id)
         |  GROUP BY s.age_group, s.gender),
         |totals AS (
         |  SELECT sum(customers)::BIGINT AS all_customers,
         |         sum(total_revenue) AS all_revenue
         |  FROM seg_sales)
         |SELECT s.age_group, s.gender, s.customers, s.total_revenue,
         |       s.total_units,
         |  round(s.customers::DOUBLE / t.all_customers * 100, 2)
         |    AS pct_customers,
         |  round(s.total_revenue / t.all_revenue * 100, 2) AS pct_revenue
         |FROM seg_sales s CROSS JOIN totals t
         |ORDER BY pct_revenue DESC NULLS LAST, age_group ASC, gender ASC""".stripMargin,

    // Q9 (:278-319)
    "ref_q9_frequency" ->
      s"""WITH $star,
         |freq AS (
         |  SELECT customer_id, count(*)::BIGINT AS purchase_count
         |  FROM fact_sales GROUP BY customer_id),
         |seg AS (
         |  SELECT customer_id,
         |    CASE WHEN purchase_count >= 10 THEN 'Whales (10+ orders)'
         |         WHEN purchase_count >= 5 THEN 'Heavy Buyers (5–9)'
         |         WHEN purchase_count >= 2 THEN 'Repeat Buyers (2–4)'
         |         ELSE 'One-Time Buyers' END AS segment
         |  FROM freq),
         |seg_sales AS (
         |  SELECT s.segment,
         |         count(*)::BIGINT AS customers,
         |         sum(fs.revenue) AS total_revenue,
         |         sum(fs.quantity)::BIGINT AS total_units
         |  FROM fact_sales fs JOIN seg s USING (customer_id)
         |  GROUP BY s.segment),
         |totals AS (
         |  SELECT sum(customers)::BIGINT AS all_customers,
         |         sum(total_revenue) AS all_revenue,
         |         sum(total_units)::BIGINT AS all_units
         |  FROM seg_sales)
         |SELECT s.segment, s.customers, s.total_revenue, s.total_units,
         |  round(s.customers::DOUBLE / t.all_customers * 100, 2)
         |    AS pct_customers,
         |  round(s.total_revenue / t.all_revenue * 100, 2) AS pct_revenue,
         |  round(s.total_units::DOUBLE / t.all_units * 100, 2) AS pct_units
         |FROM seg_sales s CROSS JOIN totals t
         |ORDER BY pct_revenue DESC NULLS LAST, segment ASC""".stripMargin,
  )
}
