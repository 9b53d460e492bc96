package graft.sources.gen

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale-step harness (VERDICT r8 item 6): materialize an N× replica of
  * an sf dir so the iterative graph/streaming families can be MEASURED
  * one decade above the largest driver-generated SF, not just
  * plan-audited. `main(src, dest, copies)` writes `copies` key-shifted
  * copies of the five tables those families read (orders, lineitem,
  * customer, events, documents) — each copy's keys move up by
  * k·10,000,000, so the result is `copies` disjoint shards of the same
  * distribution: row counts scale exactly N×, graph node/edge counts
  * scale N×, and per-user/per-doc group sizes stay constant (the shape a
  * 10× bigger day of the same workload has; co-purchase support
  * thresholds keep the same per-shard semantics).
  *
  * The shift constant keeps every shifted key below 2^31 at 10 copies of
  * sf0.1 — g03's degree-orientation packs (degree·2^31 + partkey) into
  * one BIGINT, so partkeys must stay under 2^31 for the packing to stay
  * a total order.
  *
  * Deliberate consequence of disjoint shards: single-source surfaces
  * (g05 BFS from the global min node) still traverse ONE shard, so their
  * cost measures the component, not the corpus — noted in the README
  * scaling table. */
object ScaledReplica {
  val Off = 10000000L

  def main(args: Array[String]): Unit = {
    val Array(src, dest, copiesStr) = args.take(3)
    val copies = copiesStr.toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def replicate(table: String, keyCols: Seq[String]): Unit = {
      val df = spark.read.parquet(s"$src/$table.parquet")
      val shifted = (0 until copies).map { k =>
        keyCols.foldLeft(df)((d, c) => d.withColumn(c, col(c) + lit(k * Off)))
      }.reduce(_ unionByName _)
      // the testdata layout is ONE FILE per table (the streaming readers
      // select it by pathGlobFilter on the file name, which a directory
      // of part files would not match) — write single-part and rename
      val tmp = new java.io.File(s"$dest/.tmp_$table")
      shifted.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = tmp.listFiles().find(_.getName.endsWith(".parquet"))
        .getOrElse(sys.error(s"no part file for $table"))
      val target = new java.io.File(s"$dest/$table.parquet")
      if (target.exists()) {
        if (target.isDirectory) graft.sources.StaleOutputs.reset(target.toString)
        target.delete()
      }
      require(part.renameTo(target), s"rename failed for $table")
      graft.sources.StaleOutputs.reset(tmp.toString)
      tmp.delete()
      println(s"[scaled] $table x$copies -> $dest")
    }
    replicate("orders", Seq("o_orderkey", "o_custkey"))
    replicate("lineitem", Seq("l_orderkey", "l_partkey", "l_suppkey"))
    replicate("customer", Seq("c_custkey"))
    replicate("events", Seq("event_id", "user_id"))
    replicate("documents", Seq("doc_id"))
    // vec_id shifts like every other key; label is a distribution column
    // (cell seed), so each shard keeps the same cell structure — the
    // embedding-family surfaces (d29, s-chains) see N× rows per cell
    replicate("embeddings", Seq("vec_id"))
    spark.stop()
  }
}
