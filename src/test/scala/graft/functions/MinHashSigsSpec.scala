package graft.functions

import graft.ops.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The codegen'd minhash_sigs expression must be drop-in identical to the
  * HOF formulation it replaces in [[Dedup.minhashLsh]] — element s ==
  * array_min(transform(shingles, x -> md5(concat('s|', x)))). */
class MinHashSigsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    MinHashSigs.register(spark)
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private val slow = array((0 until 8).map { s =>
    expr(s"array_min(transform(shingles, x -> md5(concat('$s|', x))))")
  }: _*)

  test("matches the HOF formulation on every real document") {
    val ds = Dedup.docShinglesPlan(spark, "/root/testdata/sf0.001")
    val mismatches = ds
      .select(expr("minhash_sigs(shingles, 8)").as("fast"), slow.as("slow"))
      .filter(not(col("fast") <=> col("slow")))
      .count()
    assert(mismatches === 0)
  }

  test("edge cases: empty set, null shingles skipped, null input") {
    val edge = spark.sql(
      """SELECT shingles FROM VALUES
        |  (array('alpha beta gamma', 'beta gamma delta')),
        |  (array('solo')),
        |  (array()),
        |  (array('kept', cast(null as string)))
        |AS t(shingles)""".stripMargin)
    val bad = edge
      .select(expr("minhash_sigs(shingles, 8)").as("fast"), slow.as("slow"))
      .filter(not(col("fast") <=> col("slow")))
      .count()
    assert(bad === 0)
    // whole-result null propagation for null input (expression convention)
    val nullIn = spark.sql("SELECT minhash_sigs(cast(null as array<string>), 8) AS r")
      .collect()(0)
    assert(nullIn.isNullAt(0))
  }
}
