package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Diagnostic: stage-by-stage cold timings of the ANN index build chain
  * (the path the driver's per-round bench measures from a fresh JVM).
  * Not part of the driver contract. Usage: ColdProfile <sfDir>. */
object ColdProfile {
  def main(args: Array[String]): Unit = {
    val dir = args.head
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // production posture (GraftExtensions): HOF dot/L2 folds run codegen'd
    graft.functions.RewriteDotProduct.install(spark)
    def t(name: String)(df: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      val n = df.count()
      println(f"STAGE $name%-22s ${(System.nanoTime() - t0) / 1e9}%8.2f s  ($n rows)")
    }
    args.tail.headOption.getOrElse("pq") match {
      case "pq" =>
        t("embeddings-scan")(graft.Tables.embeddings(spark, dir))
        t("pq-books")(Similarity.pqCodebooks(spark, dir))
        t("pq-codes")(Similarity.pqCandidateCodes(spark, dir))
      case "ivfpq" =>
        t("assign")(Similarity.trainedAssignment(spark, dir))
        t("ivfpq-books")(Similarity.residCodebooks(spark, dir))
        t("ivfpq-codes")(Similarity.residCandidateCodes(spark, dir))
      case "g06" =>
        val df = GraphRank.componentSizes(spark, dir)
        val p = df.queryExecution.executedPlan.toString
        println("Exchange nodes: " + "Exchange".r.findAllIn(p).length)
        println("ShuffledHashJoin: " + "ShuffledHashJoin".r.findAllIn(p).length)
        println("SortMergeJoin: " + "SortMergeJoin".r.findAllIn(p).length)
        t("g06")(df)
    }
    spark.stop()
  }
}
