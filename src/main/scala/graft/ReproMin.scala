package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
object ReproMin {
  def loop(withSelf: DataFrame, rounds: Int): DataFrame = {
    var labels = withSelf.select(col("src")).distinct()
      .select(col("src").as("node"), col("src").as("l"))
    for (r <- 1 to rounds) {
      labels = withSelf
        .join(labels.hint("shuffle_hash"), withSelf("src") === labels("node"))
        .select(withSelf("dst").as("node"), col("l"))
        .groupBy("node").agg(min("l").as("l"))
      if (r % 3 == 0 && r < rounds) labels = labels.localCheckpoint(eager = false)
    }
    labels.groupBy("l").agg(count(lit(1)).as("size"))
      .groupBy("size").agg(count(lit(1)).as("components"), sum("size").as("nodes"))
      .orderBy("size")
  }
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions","32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    val or = graft.Tables.orders(spark, dir)
    val li = graft.Tables.lineitem(spark, dir)
    val e0 = or.join(li, col("o_orderkey") === col("l_orderkey"))
      .select(concat(lit("c"), col("o_custkey")).as("src"),
              concat(lit("s"), col("l_suppkey")).as("dst"))
      .distinct().localCheckpoint()
    val und = e0.union(e0.select(col("dst").as("src"), col("src").as("dst")))
    def selfLoops(u: DataFrame) = u.select("src","dst").union(
      u.select(col("src")).distinct().select(col("src"), col("src").as("dst")))
    val wsStr = selfLoops(und).repartition(col("src")).localCheckpoint()
    // encoded: order-preserving string->long on the label INIT only
    def enc(c: org.apache.spark.sql.Column) =
      (when(substring(c,1,1) === "s", lit(1L)).otherwise(lit(0L)) * lit(1L << 62)) +
      (expr(s"cast(substring(${""}node_digits as long)")) // placeholder
    // simpler: since histogram only needs bijection + SAME MIN CHOICE -> order-preserving
    val wsLong = wsStr // join keys stay string; only labels encoded below
    def loopEnc(withSelf: DataFrame, rounds: Int): DataFrame = {
      val encode = {
        val digits = expr("substring(node, 2)")
        val len = length(digits)
        (when(substring(col("node"),1,1) === "s", lit(1L)).otherwise(lit(0L)) * lit(1L << 61)) +
          (expr("cast(substring(node, 2) as long)") * expr("cast(pow(10, 15 - length(substring(node, 2))) as long)") * 16L + len)
      }
      var labels = withSelf.select(col("src")).distinct()
        .select(col("src").as("node"))
        .select(col("node"), encode.as("l"))
      for (r <- 1 to rounds) {
        labels = withSelf
          .join(labels.hint("shuffle_hash"), withSelf("src") === labels("node"))
          .select(withSelf("dst").as("node"), col("l"))
          .groupBy("node").agg(min("l").as("l"))
        if (r % 3 == 0 && r < rounds) labels = labels.localCheckpoint(eager = false)
      }
      labels.groupBy("l").agg(count(lit(1)).as("size"))
        .groupBy("size").agg(count(lit(1)).as("components"), sum("size").as("nodes"))
        .orderBy("size")
    }
    for (i <- 1 to 4) {
      val t0=System.nanoTime(); loop(wsStr, 6).count(); val a=(System.nanoTime()-t0)/1e9
      val t1=System.nanoTime(); loopEnc(wsStr, 6).count(); val b=(System.nanoTime()-t1)/1e9
      println(f"rep $i string=$a%6.2fs encoded=$b%6.2fs")
    }
    // value identity
    val x = loop(wsStr, 6).collect().map(_.toString).mkString("|")
    val y = loopEnc(wsStr, 6).collect().map(_.toString).mkString("|")
    println("identical histograms: " + (x == y))
    spark.stop()
  }
}
