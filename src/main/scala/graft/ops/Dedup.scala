package graft.ops

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication operators for LLM training-data pipelines over the
  * `documents` table: exact (hash-groupBy), normalized fingerprint,
  * n-gram Jaccard, and MinHash+LSH (the 100 TB scale path).
  *
  * Scale design:
  *  - Exact/fingerprint dedup is a single hash-shuffle on a 32-char md5 —
  *    uniform keys, no skew, map-side partial aggregation.
  *  - All-pairs Jaccard joins docs on shared shingles: correct but
  *    quadratic in the worst case; it is the verification oracle.
  *    MinHash+LSH is the production path — candidate pairs only form when
  *    a band signature collides, so the shuffle volume is O(docs × bands),
  *    not O(shared-shingle pairs).
  *  - MinHash signatures use min(md5(seed || shingle)) — engine-portable
  *    (lexicographic min over hex strings), no platform hash dependence.
  */
object Dedup {

  /** Word 3-gram shingles; empty array for docs under 3 tokens (they can
    * never near-match). 0-based subscripts (Spark) == 1-based (DuckDB)+1. */
  private val shingleExpr =
    """case when size(toks) < 3 then array()
      |else transform(sequence(0, size(toks)-3),
      |               i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2])) end
      |""".stripMargin.replaceAll("\n", " ")

  /** (doc_id, shingle) distinct pairs. */
  def shingles(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .withColumn("toks", split(col("text"), " "))
      .select(col("doc_id"), explode(expr(shingleExpr)).as("shingle"))
      .distinct()

  /** Exact dedup summary: hash-groupBy on raw text. */
  def exactDedup(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .groupBy(md5(col("text")).as("fp"))
      .agg(count(lit(1)).as("copies"), min("doc_id").as("keeper"))
      .agg(
        count(lit(1)).as("distinct_texts"),
        sum("copies").as("docs"),
        count(when(col("copies") > 1, lit(1))).as("dup_groups"))

  /** Normalized-fingerprint dedup: lowercase, collapse whitespace, trim —
    * the rolling-hash "document fingerprinting" analog, via md5. */
  def fingerprintDedup(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .withColumn("fp", md5(trim(regexp_replace(lower(col("text")), "\\s+", " "))))
      .groupBy("fp")
      .agg(count(lit(1)).as("copies"), min("doc_id").as("keeper"))
      .agg(
        count(lit(1)).as("distinct_docs"),
        sum("copies").as("docs"),
        count(when(col("copies") > 1, lit(1))).as("dup_groups"))

  /** Jaccard over intersection counts `inter(d1, d2, c)` + per-doc shingle
    * set sizes, thresholded and deterministically ordered. */
  private def jaccardOf(inter: DataFrame, sh: DataFrame, minJaccard: Double): DataFrame = {
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    inter
      .join(sizes.select(col("doc_id").as("d1"), col("n").as("na")), Seq("d1"))
      .join(sizes.select(col("doc_id").as("d2"), col("n").as("nb")), Seq("d2"))
      .withColumn("jaccard", round(col("c").cast("double") / (col("na") + col("nb") - col("c")), 4))
      .filter(col("jaccard") >= minJaccard)
      .select("d1", "d2", "jaccard")
      .orderBy("d1", "d2")
  }

  /** All-pairs n-gram Jaccard near-dup detection (threshold 0.5).
    * The shingle self-join is exact but worst-case quadratic — at scale,
    * cap hot shingles or use [[minhashLsh]]; this is the oracle path. */
  def ngramJaccard(spark: SparkSession, dir: String): DataFrame = {
    val sh = shingles(spark, dir)
    val a = sh.select(col("doc_id").as("d1"), col("shingle"))
    val b = sh.select(col("doc_id").as("d2"), col("shingle"))
    val inter = a.join(b, Seq("shingle"))
      .filter(col("d1") < col("d2"))
      .groupBy("d1", "d2").agg(count(lit(1)).as("c"))
    jaccardOf(inter, sh, 0.5)
  }

  /** MinHash (8 perms) + LSH (4 bands × 2 rows) candidate generation,
    * then exact-Jaccard verification of candidates only (threshold 0.5).
    *
    * With true Jaccard s, band-collision prob = 1-(1-s^2)^4: s=0.9 → 0.999,
    * s=0.3 → 0.31 — the planted ≥0.9 near-dups are found with near-certainty
    * while the candidate set stays tiny. */
  def minhashLsh(spark: SparkSession, dir: String): DataFrame = {
    val sh = shingles(spark, dir)
    val sigAggs: Seq[Column] = (0 until 8).map { s =>
      min(md5(concat_ws("|", lit(s), col("shingle")))).as(s"h$s")
    }
    val sig = sh.groupBy("doc_id").agg(sigAggs.head, sigAggs.tail: _*)
    val bands = sig.selectExpr("doc_id",
      """stack(4, 0, concat(h0, h1), 1, concat(h2, h3),
        |         2, concat(h4, h5), 3, concat(h6, h7)) as (band, bkey)
        |""".stripMargin.replaceAll("\n", " "))
    val cand = bands.alias("x").join(bands.alias("y"),
        col("x.band") === col("y.band") && col("x.bkey") === col("y.bkey") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("d1"), col("y.doc_id").as("d2"))
      .distinct()
    // Verify ONLY candidate pairs (broadcast — LSH keeps this set tiny):
    // intersection = per-pair shingle equi-join, never the all-pairs join.
    val s1 = sh.select(col("doc_id").as("d1"), col("shingle").as("sh1"))
    val s2 = sh.select(col("doc_id").as("d2b"), col("shingle").as("sh2"))
    val inter = broadcast(cand)
      .join(s1, Seq("d1"))
      .join(s2, col("d2") === col("d2b") && col("sh1") === col("sh2"))
      .groupBy("d1", "d2").agg(count(lit(1)).as("c"))
    jaccardOf(inter, sh, 0.5)
  }
}
