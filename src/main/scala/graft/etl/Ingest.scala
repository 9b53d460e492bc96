package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** Raw-CSV ingestion for the marketing warehouse.
  *
  * CSV headers are the canonical schema (SURVEY §0.2-1: the reference's
  * declared staging DDL is dead code — pandas `to_sql(if_exists="replace")`
  * regenerates staging from the CSV itself, 02_load_csv.py:36). Schemas are
  * explicit StructTypes — no `inferSchema` (deterministic types, single
  * pass; at scale an inference pass would double the read).
  *
  * Dates stay `StringType` here and are parsed `MM/dd/yyyy` in the
  * transform layer, mirroring 03_transform.sql's to_date placement.
  */
object Ingest {

  /** ecom_mens_streetwear_10000.csv — 15 cols (FIXTURES.md A1). */
  val transactionsSchema: StructType = StructType(Seq(
    StructField("Transaction Date", StringType),
    StructField("Customer ID", StringType),
    StructField("Age", IntegerType),
    StructField("Gender", StringType),
    StructField("Item Purchased", StringType),
    StructField("Category", StringType),
    StructField("Quantity", IntegerType),
    StructField("Purchase Amount (THB)", DoubleType),
    StructField("Cost Price (THB)", DoubleType),
    StructField("Location", StringType),
    StructField("Subscription Status", StringType),
    StructField("Shipping Type", StringType),
    StructField("Payment Method", StringType),
    StructField("Previous Purchases", IntegerType),
    StructField("Campaign Name", StringType)))

  /** channel_spend_daily_campaign.csv — 6 cols (FIXTURES.md A2). */
  val spendSchema: StructType = StructType(Seq(
    StructField("Date", StringType),
    StructField("Campaign Name", StringType),
    StructField("Spending", DoubleType),
    StructField("Impressions", IntegerType),
    StructField("Clicks", IntegerType),
    StructField("Observed CTR", DoubleType)))

  /** promotion_reference.csv — loaded-but-unused in the reference
    * (SURVEY §0.2-3); offered for optional enrichment. */
  val promoSchema: StructType = StructType(Seq(
    StructField("promo_code", StringType),
    StructField("discount_pct", IntegerType)))

  /** campaigns_details.csv — configured but never loaded by the canonical
    * pipeline (SURVEY §0.2-2); optional enrichment source. ISO dates,
    * unlike the other CSVs. (Both enrichment CSVs start with a UTF-8 BOM;
    * explicit schemas make that moot — the header line is skipped.) */
  val campaignsDetailsSchema: StructType = StructType(Seq(
    StructField("campaign_id", IntegerType),
    StructField("campaign_name", StringType),
    StructField("channel", StringType),
    StructField("promo_code", StringType),
    StructField("start_date", DateType),
    StructField("end_date", DateType)))

  private def csv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.option("header", "true").schema(schema).csv(path)

  def transactions(spark: SparkSession, rawDir: String): DataFrame =
    csv(spark, s"$rawDir/ecom_mens_streetwear_10000.csv", transactionsSchema)

  def spend(spark: SparkSession, rawDir: String): DataFrame =
    csv(spark, s"$rawDir/channel_spend_daily_campaign.csv", spendSchema)

  def promo(spark: SparkSession, rawDir: String): DataFrame =
    csv(spark, s"$rawDir/promotion_reference.csv", promoSchema)

  def campaignsDetails(spark: SparkSession, rawDir: String): DataFrame =
    csv(spark, s"$rawDir/campaigns_details.csv", campaignsDetailsSchema)
}
