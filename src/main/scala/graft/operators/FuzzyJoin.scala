package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Blocked fuzzy (similarity) join — entity resolution by edit distance.
  *
  * The classic record-linkage shape: exact all-pairs `levenshtein` is
  * O(n²) and dead at 100 TB, so candidates are generated per *block*
  * (cheap deterministic key — here `(lang, first token)`), pairs are
  * formed only within a block, and an exact edit-distance filter keeps
  * real matches. Same discipline as the containment op's maxDf cap
  * (Dedup.containmentNearDup): a `maxBlock` guard drops degenerate
  * blocks so one hot key can never re-create the quadratic blow-up —
  * the cost bound is O(Σ block²) with every block ≤ maxBlock.
  *
  * Distance runs on a fixed-length prefix, not the whole document:
  * `levenshtein` is O(len²) per pair, so capping the operand keeps the
  * per-pair cost constant while still separating near-identical
  * openings from unrelated text.
  *
  * Plan shape: one shuffle to count blocks (tiny result, broadcast
  * back), one shuffle for the self-equi-join on the block key. The
  * quadratic work happens inside each join group, bounded by maxBlock.
  */
object FuzzyJoin {

  /** Candidate pairs within blocks of `blockCols`, scored by
    * levenshtein on `pre`, kept when ≤ maxDist. `docs` needs columns
    * `doc_id`, `pre`, and the block columns. */
  def blockedPairs(docs: DataFrame, blockCols: Seq[String],
                   maxDist: Int, maxBlock: Long): DataFrame = {
    val keys = blockCols.map(col)
    // block census: tiny (≤ distinct blocks) → auto-broadcasts back
    val okBlocks = docs.groupBy(keys: _*).count()
      .filter(col("count") <= maxBlock).drop("count")
    val inBlock = docs.join(okBlocks, blockCols)
    val a = inBlock.select(
      col("doc_id").as("doc_a") +: col("pre").as("pre_a") +: keys: _*)
    val b = inBlock.select(
      col("doc_id").as("doc_b") +: col("pre").as("pre_b") +: keys: _*)
    a.join(b, blockCols)
      .filter(col("doc_a") < col("doc_b"))
      // thresholded levenshtein (Spark 3.5+): O(len·maxDist) per pair
      // instead of O(len²), returning -1 past the bound — surviving
      // pairs carry the identical exact distance, non-survivors were
      // filtered either way (guide §1.2 step 2: per-task work on the
      // quadratic inner loop)
      .withColumn("dist", levenshtein(col("pre_a"), col("pre_b"), maxDist))
      .filter(col("dist").between(0, maxDist))
  }

  /** Driver-contract query: near-matching document pairs — same
    * language, same opening token, 40-char prefixes within edit
    * distance 10. */
  def docNearMatches(spark: SparkSession, dir: String): DataFrame = {
    // fanOut (guide §2.5): the in-block pair loop (the quadratic
    // levenshtein work) ran on the single-file scan's one split — the
    // streamed join side's partitioning is the pair loop's parallelism
    val d = Tables.fanOut(Tables.documents(spark, dir)).select(
      col("doc_id"), col("lang"),
      substring(col("text"), 1, 40).as("pre"),
      split_part(col("text"), lit(" "), lit(1)).as("t1"))
    blockedPairs(d, Seq("lang", "t1"), maxDist = 10, maxBlock = 1000)
      .select("doc_a", "doc_b", "lang", "dist")
      .orderBy("doc_a", "doc_b")
  }
}
