package graft.sources

import org.apache.spark.sql.SparkSession

/** Forked-JVM half of [[CrossProcessStoreSpec]]: a SEPARATE process
  * (own SparkContext, own in-memory caches — exactly the driver's
  * gate/bench posture next to `sbt test`, the r12 death pairing) that
  * lands or re-lands a standing index in the shared artifact store and
  * reports what it did on stdout.
  *
  * Modes:
  *  - `land <sfDir>`: ensure d19's fingerprint index is landed; prints
  *    the published path and how many builds THIS process performed
  *    (0 = pure cross-process reuse).
  *  - `reland <sfDir>`: delete the published artifact, then land it
  *    again under the SAME path with fresh part-file UUIDs — the
  *    external-janitor rebuild the parent must absorb through its
  *    cached manifest. */
object CrossProcessChild {
  def main(args: Array[String]): Unit = {
    val mode = args(0)
    val sfDir = args(1)
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName(s"graft-crossprocess-$mode")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try {
      val path = graft.ops.Dedup.fpIndexPath(spark, sfDir)
      if (mode == "reland") {
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory)
            Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
          f.delete()
        }
        rm(new java.io.File(path))
        val again = graft.ops.Dedup.fpIndexPath(spark, sfDir)
        require(again == path, s"reland moved the artifact: $again")
      }
      // println goes through Spark's console; use System.out directly
      System.out.println(s"PATH:$path")
      System.out.println(s"LANDS:${ArtifactStore.landsPerformed.get()}")
      System.out.flush()
    } finally spark.stop()
  }
}
