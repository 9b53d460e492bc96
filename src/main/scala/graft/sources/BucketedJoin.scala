package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SHUFFLE-FREE CO-LOCATED JOIN (f19) — the seventh rung of the
  * scan-avoidance ladder, and the one that matters most at 100 TB: a
  * FACT⋈FACT equi-join (lineitem ⋈ orders on the order key) where
  * NEITHER side can broadcast. On a plain layout this is a
  * SortMergeJoin with BOTH sides fully shuffled — at 100 TB the shuffle
  * of two fact tables dominates the query and the cluster's network.
  * Landing both tables BUCKETED by the join key (`bucketBy` +
  * `sortBy`, Spark's storage partitioning; one file per bucket so the
  * sort order survives the scan) makes each scan itself report the
  * join's required hash partitioning and sort order, so the join plans
  * with ZERO Exchange and ZERO Sort: matching buckets stream straight
  * into the merge — data never moves. PlanSpec pins the absence of
  * both operators under the joined scans, against a same-session
  * control on the raw layout that must show the shuffles.
  *
  * The demo runs in an ISOLATED child session with broadcast disabled
  * (f17's discipline): at test SFs every table is broadcastable, which
  * would hide exactly the plan this rung exists to remove; at 100 TB
  * the DEFAULT thresholds produce the shuffle-join posture by
  * themselves. The bucket count is 8 at test scale — production sizes
  * it to cluster parallelism (e.g. 4096) once at ingest, and every
  * subsequent key-equi-join against either table rides the layout for
  * free.
  *
  * The aggregate sums revenue in DECIMAL(18,6) per row before the 2dp
  * round (the cross-engine sum discipline); the oracle is the plain
  * join on the raw tables — the layout must never change values. */
object BucketedJoin {

  /** Buckets per table at test scale (≥2 files per gated SF so the
    * co-location is real, small enough that every bucket is non-empty
    * at sf0.001). */
  val NumBuckets = 8

  // keyed by applicationId, NOT session (the landIndex discipline): the
  // catalog (SharedState) and the warehouse path are shared by every
  // session of the context, so a session-keyed memo would let two
  // parallel suites DROP+rewrite the same table out from under each
  // other; one land serves all sessions
  private val built =
    scala.collection.concurrent.TrieMap.empty[(String, String, String), (String, String)]

  private def srcFingerprint(dir: String): String = {
    val f = new java.io.File(s"$dir/lineitem.parquet")
    s"${f.length()}_${f.lastModified()}"
  }

  /** One child session per parent, memoized (the f17 discipline): its
    * conf is fixed (no broadcast — the fact⋈fact posture), and catalog
    * state stays contained while the warehouse files are shared. */
  private val sessions =
    scala.collection.concurrent.TrieMap.empty[SparkSession, SparkSession]

  private def joinSession(spark: SparkSession): SparkSession = {
    sessions.keys.filter(_.sparkContext.isStopped).foreach(sessions.remove)
    sessions.getOrElseUpdate(spark, {
      val s2 = spark.newSession()
      s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      // the scan reports its per-bucket sortBy order only under this
      // (off by default since 3.0 because it lists files at planning —
      // exactly the manifest cost this session's one-file-per-bucket
      // layout keeps trivial); without it every bucketed join re-sorts
      s2.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering",
        "true")
      s2
    })
  }

  /** Land (or reuse) the two bucketed tables for this (application,
    * dir, source generation); returns their catalog names — the
    * catalog entry is in the context-shared SharedState, so one land
    * serves every session. Managed-table
    * location is cleared first so a leftover directory from a previous
    * process (the in-memory catalog dies with its JVM, the files do
    * not) can never block or shadow the re-land. */
  def ensureTables(spark: SparkSession, dir: String): (String, String) =
    built.synchronized {
      built.getOrElseUpdate(
        (spark.sparkContext.applicationId, dir, srcFingerprint(dir)), {
      val sfTag = new java.io.File(dir).getName.replace(".", "_")
      val lName = s"graft_bkt_lineitem_$sfTag"
      val oName = s"graft_bkt_orders_$sfTag"
      val wh = spark.conf.get("spark.sql.warehouse.dir")
        .stripPrefix("file:")
      def land(name: String, df: DataFrame, key: String): Unit = {
        spark.sql(s"DROP TABLE IF EXISTS $name")
        StaleOutputs.reset(s"$wh/$name")
        // repartition on the key first: Spark's repartition hash IS the
        // bucketing hash, so each task holds exactly one bucket's rows
        // and every bucket lands as ONE file — the precondition for the
        // scan to report the sortBy order (multi-file buckets lose it)
        df.repartition(NumBuckets, col(key))
          .write.bucketBy(NumBuckets, key).sortBy(key)
          .mode("overwrite").saveAsTable(name)
      }
      land(lName, graft.Tables.lineitem(spark, dir)
        .select("l_orderkey", "l_extendedprice", "l_discount"), "l_orderkey")
      land(oName, graft.Tables.orders(spark, dir)
        .select("o_orderkey", "o_orderpriority"), "o_orderkey")
      (lName, oName)
    })
    }

  /** The fact⋈fact aggregate over whatever frames the session hands
    * it — the bucketed pair and the raw-layout control run the SAME
    * query shape, so the plan difference is purely the storage. */
  private def revenueByPriority(l: DataFrame, o: DataFrame): DataFrame =
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("line_count"),
        round(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .cast("decimal(18,6)")), 2).cast("double").as("revenue"))
      .orderBy("o_orderpriority")

  /** Driver surface (f19): the co-located join through the bucketed
    * layout, in the no-broadcast child session. */
  def bucketedJoin(spark: SparkSession, dir: String): DataFrame = {
    val s = joinSession(spark)
    val (lName, oName) = ensureTables(s, dir)
    revenueByPriority(
      s.table(lName), s.table(oName))
  }

  /** The raw-layout CONTROL in the same child session: identical query,
    * unbucketed scans — the plan the bucketing removes (PlanSpec pins
    * its shuffles as the counterfactual). */
  def rawJoin(spark: SparkSession, dir: String): DataFrame = {
    val s = joinSession(spark)
    revenueByPriority(
      graft.Tables.lineitem(s, dir)
        .select("l_orderkey", "l_extendedprice", "l_discount"),
      graft.Tables.orders(s, dir)
        .select("o_orderkey", "o_orderpriority"))
  }
}
