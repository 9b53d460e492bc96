package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The DataFrame-first operator cores (`*Of`) must work over ANY corpus
  * frame with (doc_id, text) columns — this spec drives them with a
  * synthetic inline corpus that never touches the testdata tables,
  * proving the library API is not wired to the driver fixtures. */
class CorpusApiSpec extends AnyFunSuite with BeforeAndAfterAll {

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

  private def corpus() = {
    val s = spark; import s.implicits._
    Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the river bank"),
      (2L, "the quick brown fox jumps over the lazy dog near the river bend"), // near-dup of 1
      (3L, "completely different content about distributed query engines and shuffles"),
      (4L, "the quick brown fox jumps over the lazy dog near the river bank"), // exact dup of 1
      (5L, "a tiny doc")
    ).toDF("doc_id", "text")
  }

  test("exact dedup core keeps one doc per distinct text, all columns intact") {
    val kept = Dedup.dropExactDuplicatesOf(corpus()).collect().map(_.getLong(0)).toSet
    assert(kept === Set(1L, 2L, 3L, 5L)) // 4 is the exact copy of 1
  }

  test("exact dedup summary core counts the duplicate group") {
    val r = Dedup.exactDedupOf(corpus()).collect()(0)
    assert(r.getAs[Long]("docs") === 5L)
    assert(r.getAs[Long]("distinct_texts") === 4L)
    assert(r.getAs[Long]("dup_groups") === 1L)
  }

  test("LSH core finds the planted near-dup pair on an arbitrary frame") {
    val ds = Dedup.docShinglesOf(corpus()).persist()
    try {
      val pairs = Dedup.minhashLshOf(ds).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      // 1≈2 (one word differs), 1=4 (identical), hence 2≈4 as well
      assert(pairs.contains((1L, 2L)) || pairs.contains((1L, 4L)),
        s"expected the planted near-dups, got $pairs")
      // the exact oracle path agrees on the loser set
      val exact = Dedup.ngramJaccardOf(ds).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(pairs.map(_._2) === exact.map(_._2))
      // and the generic apply drops exactly those losers
      val kept = Dedup.dropNearDuplicatesOf(corpus(), Dedup.minhashLshOf(ds))
        .collect().map(_.getLong(0)).toSet
      assert(kept === (Set(1L, 2L, 3L, 4L, 5L) -- pairs.map(_._2)))
    } finally ds.unpersist()
  }

  test("generic kNN core ranks synthetic embeddings correctly") {
    val s = spark; import s.implicits._
    val emb = Seq(
      (100L, Array(1.0f, 0.0f)),
      (101L, Array(0.9f, 0.1f)),   // closest to the query
      (102L, Array(0.0f, 1.0f)),   // orthogonal
      (103L, Array(-1.0f, 0.0f))   // opposite
    ).toDF("vec_id", "embedding")
    val q = Seq((1L, Array(1.0f, 0.0f))).toDF("vec_id", "embedding")
    val top = Similarity.knnOf(q, emb, 3).collect()
    assert(top.map(_.getAs[Long]("cand_id")).toSeq === Seq(100L, 101L, 102L))
    assert(top.head.getAs[Double]("cosine") === 1.0)
  }

  test("multimodal features chain into the generic kNN unchanged") {
    val dir = "/root/testdata/sf0.001"
    val s = spark; import s.implicits._
    // extracted media features are a dense vector column — feed them to
    // the similarity operator as-is (the contract the stub exists to pin)
    val feats = Multimodal.featureBatch(spark, dir).toDF()
      .select(col("doc_id").as("vec_id"),
        expr("transform(features, x -> cast(x as float))").as("embedding"))
    val q = feats.filter(col("vec_id") < 3)
    val c = feats.filter(col("vec_id") >= 3)
    val top = Similarity.knnOf(q, c, 2).collect()
    assert(top.length === 3 * 2)
    top.foreach { r =>
      val cos = r.getAs[Double]("cosine")
      assert(cos >= -1.0001 && cos <= 1.0001)
    }
  }

  test("simhash64 core: exact copies share codes, near-dups are hamming-close") {
    val codes = Dedup.simhash64Of(corpus()).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(codes(1L) === codes(4L)) // identical text → identical code
    val h12 = java.lang.Long.bitCount(codes(1L)._1 ^ codes(2L)._1) +
      java.lang.Long.bitCount(codes(1L)._2 ^ codes(2L)._2)
    val h13 = java.lang.Long.bitCount(codes(1L)._1 ^ codes(3L)._1) +
      java.lang.Long.bitCount(codes(1L)._2 ^ codes(3L)._2)
    assert(h12 < h13, s"near-dup distance $h12 should undercut unrelated $h13")
    val pairs = Dedup.simhash64NearDupOf(corpus()).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.contains((1L, 4L))) // hamming 0 pair always surfaces
  }
}
