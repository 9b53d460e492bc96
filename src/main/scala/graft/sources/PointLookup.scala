package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** BUCKETED POINT-LOOKUP LAYOUT (f18) — the r12 graph-ANN serve-path
  * discipline generalized into a reusable lakehouse primitive: land a
  * table hive-partitioned by `pb = id div BucketWidth` (sorted by id
  * within each bucket) so that an id-list lookup prunes to the ids'
  * buckets at PLANNING time and pushes the id list into the parquet
  * reader. A point fetch of k ids then reads O(k) buckets of
  * [[BucketWidth]] rows — independent of table size — where a plain
  * layout would stream the table through a filter. This is the sixth
  * rung of the scan-avoidance ladder (f06 z-order and f13 skipping cut
  * RANGE scans; DPP/f15 and the runtime bloom/f17 cut JOIN probes; this
  * cuts ID-LIST probes — the serving-side access pattern of feature
  * stores, dedup index probes, and ANN vector fetches).
  *
  * The layout is written ONCE per source generation into the shared
  * cross-process [[ArtifactStore]] and re-read with its file index
  * cached (the DiskANN manifest-in-RAM split); at production
  * scale BucketWidth is sized so a bucket is one parquet row group
  * (~100k rows) — the per-lookup read stays O(k) buckets either way.
  * PlanSpec pins the partition filter, the pushed In, and the
  * files-read ≤ k metric; the oracle is the plain predicate on the raw
  * table (values never depend on the layout). */
object PointLookup {

  /** Rows per layout bucket — small at test SFs so pruning is
    * observable; a production deployment sizes it to a row group. */
  val BucketWidth = 64L

  /** The GENERIC half of the discipline (VERDICT r12 item 4): land ANY
    * standing-index frame hive-partitioned by its probe-bucket
    * column(s). The documents layout (f18), d19's fingerprint index,
    * and w08/w19's band-min index all land through this — one serving
    * layout, three probe surfaces.
    *
    * Since r14 the landing lives in the SHARED fingerprint-policy
    * artifact store (VERDICT r13 item 1): the path is a pure function
    * of (tag, format version, source generation) — NOT applicationId —
    * so a fresh process (the driver's cold gate/bench, a second sbt
    * run, a real query node) REUSES the index another process landed
    * instead of re-paying the land. Publication is atomic with a
    * `_SOURCE` provenance sidecar, the sweep is policy-based (never
    * age), and the relation cache keys on the sidecar generation — the
    * full [[ArtifactStore]] contract, identical to the ANN index tier. */
  def landIndex(spark: SparkSession, tag: String, dir: String,
                srcFile: String, partCols: Seq[String])
               (build: => DataFrame): String = {
    require(ArtifactStore.IndexStore.defaultFiles.contains(srcFile),
      s"index store fingerprints ${ArtifactStore.IndexStore.defaultFiles}, " +
        s"not $srcFile")
    ArtifactStore.landDf(ArtifactStore.IndexStore, dir, tag, partCols)(build)
  }

  /** One relation per (session, landed path, artifact generation),
    * listed once — the manifest-in-RAM half, shared by every probe
    * surface. Generation keying means a rebuild under the same path
    * (even by ANOTHER process) is never served through a dead cached
    * file index. */
  def indexRelation(spark: SparkSession, dir: String, srcFile: String,
                    path: String): DataFrame =
    ArtifactStore.relation(spark, path)

  /** Land (or reuse) the bucketed layout of documents(doc_id, lang,
    * n_chars) for this (session, dir, source generation); returns the
    * layout path. */
  def layoutDir(spark: SparkSession, dir: String): String =
    landIndex(spark, "documents", dir, "documents.parquet", Seq("pb")) {
      graft.Tables.documents(spark, dir)
        .select(col("doc_id"), col("lang"), col("n_chars"))
        .withColumn("pb", expr(s"cast(doc_id div $BucketWidth as int)"))
        .repartition(col("pb"))
        .sortWithinPartitions("doc_id")
    }

  /** The pruned point fetch: partition filter on the id buckets +
    * parquet In pushdown on the ids, planned against the memoized file
    * index (listed once per session — the manifest-in-RAM half). */
  def fetch(spark: SparkSession, dir: String, ids: Seq[Long]): DataFrame = {
    val rel = indexRelation(spark, dir, "documents.parquet",
      layoutDir(spark, dir))
    if (ids.isEmpty) rel.filter(lit(false)).drop("pb")
    else {
      val sorted = ids.distinct.sorted
      rel.filter(
          col("pb").isin(sorted.map(i => (i / BucketWidth).toInt).distinct: _*) &&
          col("doc_id").isin(sorted: _*))
        .drop("pb")
    }
  }

  /** The f18 demo request size — FIXED in code (the d30 bounded-in-code
    * discipline, ADVICE r12): a serving lookup brings a request-sized
    * id list, never a corpus-proportional one. The old unbounded
    * `doc_id % 97` set grew with N and, 97-spaced over 64-wide buckets,
    * touched ~2/3 of all bucket directories — a near-full scan wearing
    * a point-lookup costume. 200 ids read ≤200 buckets of [[BucketWidth]]
    * rows at ANY table size; mirrored in the f18 oracle's LIMIT. */
  val LookupBudget = 200

  /** Driver surface (f18): a deterministic sparse id set (the FIRST
    * [[LookupBudget]] ids with doc_id % 97 = 3 — the driver-known id
    * list a serving lookup would bring) fetched through the bucketed
    * layout. The oracle runs the plain predicate + LIMIT on the raw
    * table — the layout must never change values, only the scan shape. */
  def pointLookup(spark: SparkSession, dir: String): DataFrame = {
    val ids = graft.Tables.documents(spark, dir)
      .filter(col("doc_id") % 97 === 3)
      .select("doc_id").orderBy("doc_id").limit(LookupBudget)
      .collect().map(_.getLong(0)).toSeq
    fetch(spark, dir, ids)
      .select("doc_id", "lang", "n_chars")
      .orderBy("doc_id")
  }
}
