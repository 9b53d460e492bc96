package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Semantics of the blocked fuzzy join: pairs only within a block,
  * edit-distance threshold, and the maxBlock quadratic guard. */
class FuzzyJoinSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("pairs form only within a block and only under the distance cap") {
    val s = spark; import s.implicits._
    val docs = Seq(
      (1L, "en", "kitten"),  // lev(kitten, sitten) = 1 → pair (1,2)
      (2L, "en", "sitten"),
      (3L, "en", "zzzzzzzzzz"), // same block, distance 9-10 from others → cut
      (4L, "de", "kitten")   // identical text but different block → no pair
    ).toDF("doc_id", "blk", "pre")
    val out = FuzzyJoin.blockedPairs(docs, Seq("blk"), maxDist = 3, maxBlock = 100)
      .select("doc_a", "doc_b", "dist")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(out.toSeq === Seq((1L, 2L, 1)))
  }

  test("maxBlock guard drops degenerate blocks entirely") {
    val s = spark; import s.implicits._
    val hot = (1L to 50L).map(i => (i, "hot", "same text"))
    val cold = Seq((100L, "cold", "abc"), (101L, "cold", "abd"))
    val docs = (hot ++ cold).toDF("doc_id", "blk", "pre")
    val out = FuzzyJoin.blockedPairs(docs, Seq("blk"), maxDist = 3, maxBlock = 10)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    // the 50-row hot block would yield 1225 pairs; the guard removes it
    assert(out.toSeq === Seq((100L, 101L)))
  }

  test("each unordered pair appears exactly once (doc_a < doc_b)") {
    val s = spark; import s.implicits._
    val docs = Seq((1L, "b", "aaa"), (2L, "b", "aab"), (3L, "b", "aba"))
      .toDF("doc_id", "blk", "pre")
    val out = FuzzyJoin.blockedPairs(docs, Seq("blk"), maxDist = 3, maxBlock = 10)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.length === 3)
    assert(out.forall { case (a, b) => a < b })
  }
}
