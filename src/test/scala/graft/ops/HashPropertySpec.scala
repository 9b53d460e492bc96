package graft.ops

import graft.functions.{MinHashSigs, SimHash64}
import org.apache.spark.sql.SparkSession
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Property-based invariants of the hashing operators — the algebraic
  * guarantees the dedup semantics rest on, checked over generated
  * corpora (one Spark job per property). */
class HashPropertySpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    SimHash64.register(spark)
    MinHashSigs.register(spark)
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private val word = Gen.oneOf("alpha", "beta", "gamma", "delta", "epsilon",
    "zeta", "eta", "theta", "iota", "kappa", "token", "stream", "shuffle")

  private def docs(n: Int, minLen: Int = 1, maxLen: Int = 30): List[List[String]] =
    Gen.listOfN(n, Gen.choose(minLen, maxLen).flatMap(Gen.listOfN(_, word)))
      .apply(Gen.Parameters.default, Seed(7L)).get

  test("simhash64 is token-ORDER-invariant (vote sums commute)") {
    val s = spark; import s.implicits._
    val rows = docs(60).zipWithIndex.map { case (ws, i) =>
      (i.toLong, ws, scala.util.Random.javaRandomToRandom(
        new java.util.Random(i)).shuffle(ws))
    }
    val df = rows.toDF("id", "a", "b")
    val mismatches = df.selectExpr(
      "simhash64(array_distinct(a)) AS ha", "simhash64(array_distinct(b)) AS hb")
      .filter("ha[0] != hb[0] OR ha[1] != hb[1]").count()
    assert(mismatches === 0)
  }

  test("rolling fingerprint is token-ORDER-sensitive where simhash is not") {
    val s = spark; import s.implicits._
    // pairs with the same multiset but different order and >= 2 distinct
    // tokens adjacent-swapped: the polynomial fold must differ
    val rows = docs(60, minLen = 2).zipWithIndex.collect {
      case (ws, i) if ws.distinct.length >= 2 =>
        val j = ws.indices.sliding(2).find { w => ws(w.head) != ws(w.last) }.get
        val swapped = ws.updated(j.head, ws(j.last)).updated(j.last, ws(j.head))
        (i.toLong, ws.mkString(" "), swapped.mkString(" "))
    }
    assert(rows.nonEmpty)
    val df = rows.toDF("doc_id", "ta", "tb")
    val fa = TextAnalysis.rollingFingerprintOf(
      df.selectExpr("doc_id", "ta AS text")).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val fb = TextAnalysis.rollingFingerprintOf(
      df.selectExpr("doc_id", "tb AS text")).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { case (id, _, _) =>
      assert(fa(id) !== fb(id), s"swap undetected for doc $id")
    }
  }

  test("minhash signatures respect SET semantics (duplication never changes them)") {
    val s = spark; import s.implicits._
    val rows = docs(60).zipWithIndex.map { case (ws, i) =>
      (i.toLong, ws.distinct, (ws ++ ws ++ ws.take(3)).distinct)
    }
    // distinct of a multiset == distinct of its inflation; signatures of
    // equal SETS must agree element-for-element
    val df = rows.toDF("id", "a", "b")
    val mismatches = df.selectExpr(
      "minhash_sigs(a, 8) AS sa", "minhash_sigs(b, 8) AS sb")
      .filter("sa != sb").count()
    assert(mismatches === 0)
  }

  test("jaccard of a doc with itself is 1; disjoint docs never pair") {
    val s = spark; import s.implicits._
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon zeta"),       // identical -> jaccard 1
      (3L, "one two three four five six seven eight")    // fully disjoint
    ).toDF("doc_id", "text")
    val ds = Dedup.docShinglesOf(corpus)
    val pairs = Dedup.ngramJaccardOf(ds).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getAs[Double]("jaccard"))).toMap
    assert(pairs((1L, 2L)) === 1.0)
    assert(!pairs.keySet.exists { case (a, b) => b == 3L || a == 3L })
  }
}
