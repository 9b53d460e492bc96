package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed tables: the shuffle-elimination lever for repeated big-big
  * joins (builder rules: "co-locate joins via bucketing").
  *
  * Writing both fact tables bucketed by the join key pre-shuffles them
  * ONCE at write time; every subsequent join on that key reads co-located
  * buckets and skips both exchanges (and with sorted buckets, the sort).
  * At 100 TB this converts the nightly fact-fact join from the dominant
  * shuffle into a local zip of bucket files. Requires `saveAsTable`
  * (bucket metadata lives in the catalog, not the parquet footer).
  */
object Bucketing {

  /** Persist `df` bucketed (and sorted) by `key` into `buckets` buckets. */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** Join two bucketed tables on their bucket key — planner reads bucket
    * layout from the catalog and emits a join with NO Exchange on either
    * side (asserted by BucketingSpec). */
  def bucketedJoin(spark: SparkSession, left: String, right: String,
                   key: String): DataFrame =
    spark.table(left).join(spark.table(right), key)
}
