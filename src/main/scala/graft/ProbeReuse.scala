package graft
import org.apache.spark.sql.SparkSession
object ProbeReuse {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (q <- args.drop(1)) {
      val df = SparkEntry.queries(q)(spark, args(0))
      df.collect()
      val p = df.queryExecution.executedPlan.toString
      println(s"== $q reusedExchange=${"ReusedExchange".r.findAllIn(p).size} " +
        s"shuffleStages=${"ShuffleQueryStage".r.findAllIn(p).size} " +
        s"scans=${"Scan parquet".r.findAllIn(p).size}")
    }
    spark.stop()
  }
}
