package graft
import org.apache.spark.sql.SparkSession

/** Diagnostic harness: time an explicit sequence of SparkEntry queries in
  * one session, printing each as it finishes — used to localize bench-run
  * interference (cache pressure, session-state accumulation) that per-query
  * isolated runs don't show. Not part of the driver contract. */
object BenchProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val names = args.tail.toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // production posture (GraftExtensions): HOF dot/L2 folds run codegen'd
    // (GRAFT_NO_REWRITE opts out for A/B diagnosis)
    if (!sys.env.contains("GRAFT_NO_REWRITE"))
      graft.functions.RewriteDotProduct.install(spark)
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"PROBE $name%-28s $sec%8.2f s  ($n rows)")
    }
    spark.stop()
  }
}
