package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** GlobalOrder's two-phase distributed scan must equal the unpartitioned
  * window forms BIT-FOR-BIT — the whole point is replacing the
  * single-task plan without moving a single value. Edge shapes that
  * break naive bucketing are pinned here: empty input, one row, fewer
  * rows than ntile buckets, all-equal proxies (degenerate min=max
  * bucket), skewed proxies, and descending composite orders. */
class GlobalOrderSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  /** (id, v) rows with a deliberately skewed v distribution: uniform
    * cuts land most rows in few buckets, which must not change values. */
  private def frame(n: Int) = {
    val s = spark
    import s.implicits._
    (1 to n).map(i => (i.toLong, (i.toLong * i) % 97))
      .toDF("id", "v").repartition(4)
  }

  test("prefix sums equal the window form, inclusive and exclusive") {
    val df = frame(1000)
    val w = Window.orderBy("id")
    val ref = df
      .withColumn("inc", sum("v").over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("exc", coalesce(
        sum("v").over(w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .orderBy("id").collect()
    val inc = GlobalOrder.withPrefixSums(df, Seq(col("id")), col("id"),
        Seq((col("v"), "inc")), inclusive = true)
    val both = GlobalOrder.withPrefixSums(inc, Seq(col("id")), col("id"),
        Seq((col("v"), "exc")), inclusive = false)
      .select("id", "v", "inc", "exc").orderBy("id").collect()
    assert(both.map(_.toString).toSeq === ref.map(_.toString).toSeq)
  }

  test("row numbers and ntile equal the window builtins on a skewed " +
       "descending composite order") {
    val df = frame(777)
    val ord = Seq(col("v").desc, col("id").asc)
    val ref = df
      .withColumn("rn", row_number().over(Window.orderBy(ord: _*)))
      .withColumn("t", ntile(7).over(Window.orderBy(ord: _*)))
      .orderBy("id").collect()
    val mine = GlobalOrder.withNtile(
        GlobalOrder.withRowNumber(df, ord, negate(col("v")), "rn"),
        7, ord, negate(col("v")), "t")
      .orderBy("id").collect()
    assert(mine.map(_.toString).toSeq === ref.map(_.toString).toSeq)
  }

  test("ntile with fewer rows than buckets numbers rows 1..N") {
    val df = frame(3)
    val got = GlobalOrder.withNtile(df, 10, Seq(col("id")), col("id"), "t")
      .orderBy("id").select("t").collect().map(_.getInt(0)).toSeq
    assert(got === Seq(1, 2, 3))
  }

  test("single row and empty input") {
    val one = GlobalOrder.withNtile(frame(1), 4, Seq(col("id")), col("id"), "t")
      .select("t").collect().map(_.getInt(0)).toSeq
    assert(one === Seq(1))
    val empty = GlobalOrder.withPrefixSums(frame(0), Seq(col("id")), col("id"),
      Seq((col("v"), "c")), inclusive = true)
    assert(empty.count() === 0)
  }

  test("all-equal proxies degrade to one bucket but stay correct") {
    val s = spark
    import s.implicits._
    val df = (1 to 200).map(i => (i.toLong, 5L)).toDF("id", "v").repartition(4)
    // proxy constant -> min==max -> every row in bucket 0; values must
    // still match the window form exactly
    val ref = df.withColumn("c",
        sum("v").over(Window.orderBy("id").rowsBetween(Window.unboundedPreceding, 0)))
      .orderBy("id").collect()
    val got = GlobalOrder.withPrefixSums(df, Seq(col("id")), col("v"),
        Seq((col("v"), "c")), inclusive = true)
      .orderBy("id").collect()
    assert(got.map(_.toString).toSeq === ref.map(_.toString).toSeq)
  }

  test("ntile buckets follow the SQL-standard size split exactly") {
    // 10 rows, 4 buckets -> sizes 3,3,2,2
    val got = GlobalOrder.withNtile(frame(10), 4, Seq(col("id")), col("id"), "t")
      .groupBy("t").count().orderBy("t").collect()
      .map(r => (r.getInt(0), r.getLong(1))).toSeq
    assert(got === Seq((1, 3L), (2, 3L), (3, 2L), (4, 2L)))
  }
}
