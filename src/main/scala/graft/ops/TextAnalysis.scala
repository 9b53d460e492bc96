package graft.ops

import graft.Tables
import graft.plans.GlobalOrder
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis operators for LLM training-data pipelines, over the
  * `documents` table (BASELINE.json north-star: language-ID, quality
  * scoring, token counting, fingerprinting).
  *
  * All scoring is per-row (narrow) — no shuffle until the final summary
  * aggregate, so every operator here scales linearly with input splits:
  * at 100 TB the scan parallelism is the only knob.
  *
  * Higher-order functions (`transform`/`filter`/`aggregate`) stay inside
  * whole-stage codegen — no UDFs anywhere (SURVEY §4.2 / builder rules).
  */
object TextAnalysis {

  /** Stopword list used by both quality scoring and language ID; mirrored
    * verbatim in the DuckDB oracles. */
  val EnStopwords: Seq[String] = Seq("the", "a", "of", "and", "is")

  private def withToks(df: DataFrame): DataFrame =
    df.withColumn("toks", split(col("text"), " "))

  /** BPE-ish tokenizer regex: letter runs, digit runs, single punctuation —
    * the character-class approximation of a byte-pair pre-tokenizer.
    * Class-based, so Java regex (Spark) and RE2 (DuckDB) agree. */
  val BpeishPattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"

  /** Token counting: whitespace tokens, distinct tokens, BPE-ish regex
    * tokens, chars/token. DataFrame-first core over any (doc_id, text)
    * frame; the (spark, dir) forms here and below are driver-contract
    * adapters over the testdata table. */
  def tokenStatsOf(docs: DataFrame): DataFrame =
    withToks(docs)
      .select(
        col("doc_id"),
        size(col("toks")).as("n_tokens"),
        size(array_distinct(col("toks"))).as("n_distinct_tokens"),
        regexp_count(col("text"), lit(BpeishPattern)).cast("int").as("n_bpeish_tokens"),
        length(col("text")).as("n_chars_m"),
        round(length(col("text")).cast("double") / size(col("toks")), 4).as("chars_per_token"))
      .orderBy("doc_id")

  def tokenStats(spark: SparkSession, dir: String): DataFrame =
    tokenStatsOf(Tables.documents(spark, dir))

  /** Quality scoring: stopword ratio, repetition ratio, length band. */
  def qualityScoreOf(docs: DataFrame): DataFrame = {
    val stopList = EnStopwords.map(w => s"'$w'").mkString(", ")
    withToks(docs)
      .withColumn("n_tokens", size(col("toks")))
      .withColumn("stop_hits", expr(s"size(filter(toks, w -> w in ($stopList)))"))
      .withColumn("stop_ratio",
        round(col("stop_hits").cast("double") / col("n_tokens"), 4))
      .withColumn("repetition_ratio",
        round(lit(1.0) - size(array_distinct(col("toks"))).cast("double") / col("n_tokens"), 4))
      .withColumn("quality_band",
        when(col("n_tokens") < 10, "too_short")
          .when(col("repetition_ratio") > 0.8, "repetitive")
          .when(col("stop_ratio") > 0.4, "boilerplate")
          .otherwise("ok"))
      .select("doc_id", "n_tokens", "stop_ratio", "repetition_ratio", "quality_band")
      .orderBy("doc_id")
  }

  def qualityScore(spark: SparkSession, dir: String): DataFrame =
    qualityScoreOf(Tables.documents(spark, dir))

  /** Language-ID heuristic (stopword-hit n-gram signal) cross-tabulated
    * against the labeled `lang` column. */
  def langId(spark: SparkSession, dir: String): DataFrame = {
    val stopList = EnStopwords.map(w => s"'$w'").mkString(", ")
    withToks(Tables.documents(spark, dir))
      .withColumn("en_hits", expr(s"size(filter(toks, w -> w in ($stopList)))"))
      .withColumn("predicted", when(col("en_hits") >= 2, "en").otherwise("und"))
      .groupBy("lang", "predicted")
      .agg(count(lit(1)).as("docs"), round(avg("en_hits"), 4).as("avg_hits"))
      .orderBy("lang", "predicted")
  }

  /** Vocabulary extraction: corpus-wide token frequencies, top-50.
    * Explode → hash-agg → top-k; at 100 TB the map-side partial aggregate
    * collapses each partition's token counts before the shuffle, so the
    * exchange carries vocab-sized data, not token-stream-sized. */
  def vocabulary(spark: SparkSession, dir: String): DataFrame =
    withToks(Tables.documents(spark, dir))
      .select(explode(col("toks")).as("token"))
      .groupBy("token")
      .agg(count(lit(1)).as("occurrences"))
      .orderBy(col("occurrences").desc, col("token").asc)
      .limit(50)

  /** Inverse document frequency per token: df = docs containing the token,
    * idf = ln(N/df). The distinct (doc, token) explode dedupes per doc
    * before counting. */
  def idf(spark: SparkSession, dir: String): DataFrame = {
    val docs = withToks(Tables.documents(spark, dir))
    val n = docs.select(count(lit(1)).as("n_docs"))
    docs.select(col("doc_id"), explode(array_distinct(col("toks"))).as("token"))
      .groupBy("token")
      .agg(count(lit(1)).as("doc_freq"))
      .crossJoin(broadcast(n))
      .withColumn("idf", round(log(col("n_docs").cast("double") / col("doc_freq")), 6))
      .select("token", "doc_freq", "idf")
      .orderBy("token")
  }

  /** Per-document top TF-IDF term: tf (in-doc count) × ln(N/df), ranked
    * with full tie-breaks. Composition of [[vocabulary]]-style tf and
    * [[idf]] — the classic relevance score as one declarative plan. */
  def topTfidf(spark: SparkSession, dir: String): DataFrame = {
    val docs = withToks(Tables.documents(spark, dir))
    val n = docs.select(count(lit(1)).as("n_docs"))
    // tf feeds two branches (the df aggregate and the scoring join) —
    // materialized once via eager localCheckpoint so the explode+agg runs
    // once (GC-scoped blocks; a bare persist here would leak one
    // CacheManager entry per invocation). df is computed BY AGGREGATION
    // from tf and broadcast-joined back: a `count over (partition by
    // token)` window would put every tf row of a hot token ("the") into
    // one task — O(corpus docs) for stopwords at 100 TB. The df table is
    // vocab-sized (≪ tf); if vocabulary outgrew broadcast range, the same
    // plan works as a shuffle join on token.
    val tf = docs.select(col("doc_id"), explode(col("toks")).as("token"))
      .groupBy("doc_id", "token")
      .agg(count(lit(1)).as("tf"))
      .localCheckpoint()
    val df = tf.groupBy("token").agg(count(lit(1)).as("doc_freq"))
    val scored = tf
      .join(broadcast(df), Seq("token"))
      .crossJoin(broadcast(n))
      .withColumn("tfidf",
        round(col("tf") * log(col("n_docs").cast("double") / col("doc_freq")), 6))
    val w = Window.partitionBy("doc_id")
      .orderBy(col("tfidf").desc, col("token").asc)
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") === 1)
      .select("doc_id", "token", "tfidf")
      .orderBy("doc_id")
  }

  /** Quality-filter APPLICATION: the corpus a training run would ship —
    * only 'ok'-band documents, summarized per language. Detection
    * ([[qualityScore]]) feeds it, mirroring the d03→d07 dedup pattern. */
  def qualityFiltered(spark: SparkSession, dir: String): DataFrame =
    qualityScore(spark, dir)
      .filter(col("quality_band") === "ok")
      .join(Tables.documents(spark, dir).select("doc_id", "lang"), Seq("doc_id"))
      .groupBy("lang")
      .agg(
        count(lit(1)).as("kept_docs"),
        round(avg("n_tokens"), 4).as("avg_tokens"))
      .orderBy("lang")

  /** Deterministic hash-split sampling: md5 of the doc id buckets every
    * row reproducibly (engine- and run-independent — rand() is neither).
    * ~1/16 sample = first hex nibble '0'. The split column is how a
    * train/val/test partition stays stable across reprocessing at 100 TB. */
  def hashSample(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .withColumn("bucket", substring(md5(col("doc_id").cast("string")), 1, 1))
      .filter(col("bucket") === "0")
      .select("doc_id", "lang", "n_chars")
      .orderBy("doc_id")

  /** STRATIFIED TRAIN/VAL/TEST SPLIT REPORT (t36) — [[hashSample]]'s
    * hash-bucket discipline extended to the full three-way split a
    * training pipeline ships: first md5 nibble 0-b → train (12/16),
    * c-d → val (2/16), e-f → test (2/16). Deterministic per document
    * (engine-, run-, and arrival-order-independent), so reprocessing at
    * 100 TB never migrates a document across splits — the property that
    * keeps eval sets uncontaminated as the corpus regrows. The report
    * audits stratification: per (source, split) counts and each split's
    * share within its source (hash uniformity makes shares track the
    * 12/2/2 design without per-stratum bookkeeping). */
  def trainValTestSplit(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
      .withColumn("h", substring(md5(col("doc_id").cast("string")), 1, 1))
      .withColumn("split",
        when(col("h").between("0", "b"), "train")
          .when(col("h").isin("c", "d"), "val")
          .otherwise("test"))
    val counts = d.groupBy("source", "split").agg(count(lit(1)).as("docs"))
    val totals = d.groupBy("source").agg(count(lit(1)).as("src_total"))
    counts.join(totals, Seq("source"))
      .select(col("source"), col("split"), col("docs"),
        round(col("docs") / col("src_total"), 4).as("share"))
      .orderBy("source", "split")
  }

  /** N-GRAM NOVELTY RATE (t38) — per document, the fraction of its
    * distinct 3-gram shingles appearing for the FIRST time in the corpus
    * (first = owned by the minimum doc_id, the deterministic arrival
    * order). The freshness metric between t27's token-grain vocab growth
    * and the pairwise dedup family: a feed whose novelty rate decays is
    * re-crawling itself — the signal that gates further ingestion before
    * any pairwise work runs. Scale shape: one shingle-grain min-aggregate
    * (map-side combining, shuffles (shingle, min) pairs, never text) and
    * one doc-grain rollup; no pairs anywhere. */
  def ngramNovelty(spark: SparkSession, dir: String): DataFrame = {
    // the exploded shingle frame feeds TWO consumers (first-owner
    // aggregate + the ownership join): eager localCheckpoint or the
    // corpus-wide explode over the cached shingle table runs twice —
    // measurable once the shingle cache went 32-partition (r15 final
    // bench: t38 was the one shingle consumer still paying a double
    // explode; t42/t48 multi-consumer discipline)
    val sh = Dedup.docShingles(spark, dir)
      .filter(col("n") > 0)
      .select(col("doc_id"), explode(col("shingles")).as("shingle"))
      .localCheckpoint()
    val firstOwner = sh.groupBy("shingle").agg(min("doc_id").as("first_doc"))
    sh.join(firstOwner, Seq("shingle"))
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_shingles"),
        sum(when(col("first_doc") === col("doc_id"), 1L).otherwise(0L))
          .as("novel"))
      .withColumn("novelty_rate", round(col("novel") / col("n_shingles"), 6))
      .select("doc_id", "n_shingles", "novel", "novelty_rate")
      .orderBy("doc_id")
  }

  /** True ROLLING (polynomial) document fingerprint over the token stream:
    * fp = fold over tokens of `acc = (acc * 31 + h(tok)) mod (2^31 - 1)`,
    * with `h(tok)` = the first 8 md5 hex chars decoded to a 32-bit value.
    * Unlike [[graft.ops.Dedup.fingerprintDedup]]'s set-style md5 (which
    * normalizes whitespace and is order-insensitive via the full-string
    * hash), this is ORDER-SENSITIVE — swapping two tokens changes the
    * fingerprint — the Rabin-Karp-style rolling form the survey's
    * "document fingerprinting" row names.
    *
    * Portability: every intermediate stays under 2^37 (acc < 2^31, ×31,
    * + 2^32), exact in BIGINT on both engines; the fold is explicit
    * left-to-right (Spark `aggregate`, DuckDB `list_reduce` with a
    * prepended zero so both start from acc = 0). Narrow per-row
    * arithmetic — zero shuffle at any corpus size. */
  def rollingFingerprintOf(docs: DataFrame): DataFrame = {
    val decode = (0 until 8).map { i =>
      val mult = 1L << (4 * (7 - i))
      s"(instr('0123456789abcdef', substr(m, ${i + 1}, 1)) - 1) * cast($mult as bigint)"
    }.mkString(" + ")
    docs
      .withColumn("hl", expr(
        s"transform(transform(split(text, ' '), t -> md5(t)), m -> $decode)"))
      .withColumn("rfp", expr(
        "aggregate(hl, cast(0 as bigint), (acc, h) -> (acc * 31 + h) % 2147483647)"))
      .select("doc_id", "rfp")
      .orderBy("doc_id")
  }

  def rollingFingerprint(spark: SparkSession, dir: String): DataFrame =
    rollingFingerprintOf(Tables.documents(spark, dir))

  /** Benchmark DECONTAMINATION detection: training documents that share
    * any word 3-gram with a held-out evaluation set — the contamination
    * check every LLM training run performs before shipping a corpus (a
    * train doc containing an eval n-gram inflates benchmark scores).
    * The eval set here is the deterministic md5-bucket 'f' slice of the
    * corpus (the same hash-split discipline as [[hashSample]], so the
    * split is reproducible across engines and reprocessing runs).
    *
    * Scale shape: the eval shingle set is eval-sized (a benchmark suite
    * is KB–MB even when the corpus is 100 TB) and BROADCASTS; the train
    * side is one narrow shingle pass + a broadcast hash join — the corpus
    * is never shuffled. Output is per-doc overlap counts (the evidence a
    * removal decision needs), not just a flag. `ds` is a
    * [[graft.ops.Dedup.docShinglesOf]] table (shingles are per-doc
    * distinct by construction, so `count(1)` counts distinct shared
    * shingles). */
  def decontaminateOf(ds: DataFrame): DataFrame = {
    val bucketed = ds
      .withColumn("bucket", substring(md5(col("doc_id").cast("string")), 1, 1))
    val evalShingles = bucketed.filter(col("bucket") === "f")
      .select(explode(col("shingles")).as("shingle"))
      .distinct()
    bucketed.filter(col("bucket") =!= "f")
      .select(col("doc_id"), explode(col("shingles")).as("shingle"))
      .join(broadcast(evalShingles), Seq("shingle"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("shared_shingles"))
      .orderBy("doc_id")
  }

  def decontaminate(spark: SparkSession, dir: String): DataFrame =
    decontaminateOf(Dedup.docShingles(spark, dir))

  /** GRADED CONTAMINATION REPORT (t37) — the soft form of t11's
    * drop-on-any-overlap rule: per training document, the FRACTION of its
    * distinct shingles shared with the eval slice, banded
    * (clean / touched <0.1 / partial <0.5 / contaminated). Real curation
    * pipelines grade before they drop — a 2% incidental overlap and a
    * 70% paraphrase are different decisions — and the banded report is
    * what a data audit reviews. Same scale shape as t11: the eval
    * shingle set broadcasts, the corpus side is one explode + hash join
    * + per-doc count; zero-overlap documents survive via the left join
    * (t11 only reports hits). */
  def contaminationReport(spark: SparkSession, dir: String): DataFrame = {
    val ds = Dedup.docShingles(spark, dir)
      .withColumn("bucket", substring(md5(col("doc_id").cast("string")), 1, 1))
    val evalSh = ds.filter(col("bucket") === "f")
      .select(explode(col("shingles")).as("shingle")).distinct()
    val train = ds.filter(col("bucket") =!= "f" && col("n") > 0)
    val shared = train
      .select(col("doc_id"), explode(col("shingles")).as("shingle"))
      .join(broadcast(evalSh), Seq("shingle"))
      .groupBy("doc_id").agg(count(lit(1)).as("shared"))
    train.select(col("doc_id"), col("n").cast("long").as("n_shingles"))
      .join(shared, Seq("doc_id"), "left")
      .na.fill(0L, Seq("shared"))
      .withColumn("overlap_frac", round(col("shared") / col("n_shingles"), 6))
      .withColumn("band",
        when(col("shared") === 0, "clean")
          .when(col("overlap_frac") < 0.1, "touched")
          .when(col("overlap_frac") < 0.5, "partial")
          .otherwise("contaminated"))
      .select("doc_id", "n_shingles", "shared", "overlap_frac", "band")
      .orderBy("doc_id")
  }

  /** Spark's bloom-probe expression registered under a session-local
    * name ([[graft.functions.CosineSimilarity]]'s registry discipline) —
    * `might_contain` is the engine's own runtime-row-level-filter
    * primitive but isn't exposed in the public function registry. */
  private def registerMightContain(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      org.apache.spark.sql.catalyst.FunctionIdentifier("graft_might_contain"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain].getName,
        "graft_might_contain"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
          children(0), children(1)))

  /** BLOOM-PREFILTERED decontamination (t28) — t11's detection with the
    * probe volume cut BEFORE the join, the posture the exact form grows
    * into at 100 TB. t11 hash-joins EVERY train shingle against the
    * broadcast eval set; here the eval set first builds a Bloom filter
    * (distributed build, driver merge — the eval side is KB–MB even when
    * the corpus is 100 TB), the filter ships as a ~60 KB literal inside a
    * codegen'd `might_contain(filter, xxhash64(shingle))` scan predicate
    * (the exact expression pair Spark's own runtime row-level filtering
    * injects), and only survivors — true matches plus the fpp tail —
    * reach the exact confirm join. The confirm join is what keeps the
    * answer hash-identical to t11: false positives die there, so fpp
    * trades shuffle volume, never correctness. At 3-gram grain a clean
    * corpus overlaps the eval suite rarely, so the bloom drops ~(1-fpp)
    * of the probe stream — the shuffle-side win that makes routine
    * decontamination sweeps affordable. */
  /** The (survivor, eval-shingle) halves of the bloom-prefiltered probe —
    * split out so the spec can measure the prefilter's selectivity on the
    * same frames the shipped op consumes. */
  private[ops] def bloomPrefilter(spark: SparkSession, ds: DataFrame,
                                  fpp: Double): (DataFrame, DataFrame) = {
    registerMightContain(spark)
    val bucketed = ds
      .withColumn("bucket", substring(md5(col("doc_id").cast("string")), 1, 1))
    val evalShingles = bucketed.filter(col("bucket") === "f")
      .select(explode(col("shingles")).as("shingle"))
      .distinct()
    // capacity is a fixed eval-suite cap, not a count() of the data —
    // sizing the filter must not cost an extra pass over the eval set
    val bf = evalShingles.select(xxhash64(col("shingle")).as("h"))
      .stat.bloomFilter("h", 1L << 16, fpp)
    val bytes = {
      val os = new java.io.ByteArrayOutputStream()
      bf.writeTo(os); os.toByteArray
    }
    val survivors = bucketed.filter(col("bucket") =!= "f")
      .select(col("doc_id"), explode(col("shingles")).as("shingle"))
      .filter(call_function("graft_might_contain",
        lit(bytes), xxhash64(col("shingle"))))
    (survivors, evalShingles)
  }

  def bloomDecontaminateOf(spark: SparkSession, ds: DataFrame,
                           fpp: Double = 0.03): DataFrame = {
    val (survivors, evalShingles) = bloomPrefilter(spark, ds, fpp)
    survivors.join(broadcast(evalShingles), Seq("shingle"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("shared_shingles"))
      .orderBy("doc_id")
  }

  def bloomDecontaminate(spark: SparkSession, dir: String): DataFrame =
    bloomDecontaminateOf(spark, Dedup.docShingles(spark, dir))

  /** Decontamination APPLICATION: the train split with contaminated
    * documents anti-joined away — detect→apply, same pattern as the dedup
    * modalities (d07/d09/d12). The contaminated set is detection-output
    * sized; the corpus streams through the doc_id anti-join. */
  def decontaminateApply(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .withColumn("bucket", substring(md5(col("doc_id").cast("string")), 1, 1))
      .filter(col("bucket") =!= "f")
      .join(decontaminate(spark, dir).select("doc_id"), Seq("doc_id"), "left_anti")
      .select("doc_id", "lang", "n_chars")
      .orderBy("doc_id")

  /** PIPELINE FUNNEL (t53) — the per-language attrition ledger every
    * training-data pipeline publishes: documents AND tokens surviving
    * each cumulative curation stage — raw → exact dedup (d01's keeper
    * rule) → near-dup dedup (d04's LSH losers) → quality gate (t02's
    * 'ok' band) → decontamination (t11's eval-overlap drop plus the
    * eval slice itself leaving the train split, t12's rule). d27 answers
    * "why did THIS doc die"; the funnel answers the planning question —
    * "how many tokens does each language actually contribute after
    * curation" — which is the input t17/t52's mixture math consumes.
    * Every gate is the already-verified primitive, composed, so the
    * ledger is the pipeline's own decision log, not a drift-prone
    * reimplementation.
    *
    * Scale shape: ONE corpus pass builds the narrow per-doc spine
    * (doc_id, lang, token count, split bucket); the four gate sides are
    * detection-sized (near-dup losers, quality rejects, contaminated
    * ids) or two-narrow-column (the exact-keeper fp-grain min), all
    * joined on the uniform doc_id key; the result is one
    * #languages-sized aggregate. Token sums are BIGINT end to end —
    * exact at any corpus size (the t50/t52 overflow lesson: counts, not
    * products).
    *
    * Gate semantics are FLAGS, not a sequential re-run (ADVICE r11):
    * near-dup losers are detected over the FULL corpus — matching d27's
    * provenance and the oracle — so a doc whose only near-dup partner
    * already died at the exact stage still counts as a near-dup loss
    * here, where a pipeline re-running LSH on the exact-dedup output
    * would keep it. The cumulative stage counts can therefore slightly
    * overstate near-dup attrition relative to a strictly sequential
    * run. */
  def pipelineFunnelOf(docs: DataFrame, nearLosers: DataFrame,
                       okDocs: DataFrame, contaminated: DataFrame): DataFrame = {
    val keepers = docs
      .groupBy(md5(col("text")).as("fp"))
      .agg(min("doc_id").as("doc_id"))
      .select("doc_id").withColumn("keeper", lit(1))
    val nd = nearLosers.select(col("d2").as("doc_id")).distinct()
      .withColumn("nd", lit(1))
    val ok = okDocs.select("doc_id").withColumn("okf", lit(1))
    val ct = contaminated.select("doc_id").distinct().withColumn("ct", lit(1))
    val spine = docs
      .select(col("doc_id"), col("lang"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"),
        substring(md5(col("doc_id").cast("string")), 1, 1).as("bucket"))
      .join(keepers, Seq("doc_id"), "left_outer")
      .join(nd, Seq("doc_id"), "left_outer")
      .join(ok, Seq("doc_id"), "left_outer")
      .join(ct, Seq("doc_id"), "left_outer")
      .withColumn("g1", col("keeper").isNotNull)
      .withColumn("g2", col("keeper").isNotNull && col("nd").isNull)
      .withColumn("g3",
        col("keeper").isNotNull && col("nd").isNull && col("okf").isNotNull)
      .withColumn("g4",
        col("keeper").isNotNull && col("nd").isNull && col("okf").isNotNull &&
          col("bucket") =!= "f" && col("ct").isNull)
    def stage(g: String, tag: String): Seq[Column] = Seq(
      sum(when(col(g), 1L).otherwise(0L)).as(s"docs_$tag"),
      sum(when(col(g), col("n_tokens")).otherwise(0L)).as(s"tokens_$tag"))
    val aggs: Seq[Column] =
      Seq(count(lit(1)).as("docs_raw"), sum("n_tokens").as("tokens_raw")) ++
        stage("g1", "exact") ++ stage("g2", "neardup") ++
        stage("g3", "quality") ++ stage("g4", "final")
    spine.groupBy("lang").agg(aggs.head, aggs.tail: _*).orderBy("lang")
  }

  def pipelineFunnel(spark: SparkSession, dir: String): DataFrame =
    pipelineFunnelOf(
      Tables.documents(spark, dir),
      Dedup.minhashLsh(spark, dir),
      qualityScore(spark, dir).filter(col("quality_band") === "ok"),
      decontaminate(spark, dir))

  /** The dedup+quality-gated corpus — t53's g3 stage (docs_quality) as
    * row-level survival: exact-dup keepers (d10's md5-min rule) minus
    * LSH near-dup losers (d04's detector, the d27 flags semantics) minus
    * quality rejects (t02's band rule). Shared by [[curationGated]] and
    * the reconciliation spec, which pins it per-language against t53's
    * docs_quality/tokens_quality row by row. */
  private[graft] def curationQualityGated(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val keepers = docs
      .groupBy(md5(col("text")).as("fp"))
      .agg(min("doc_id").as("doc_id"))
      .select("doc_id")
    val ndLosers = Dedup.minhashLsh(spark, dir)
      .select(col("d2").as("doc_id")).distinct()
    val ok = qualityScore(spark, dir)
      .filter(col("quality_band") === "ok").select("doc_id")
    docs
      .join(keepers, Seq("doc_id"), "left_semi")
      .join(ndLosers, Seq("doc_id"), "left_anti")
      .join(ok, Seq("doc_id"), "left_semi")
  }

  /** The curation pipeline's EVAL SUITE size: a real benchmark suite is
    * KB–MB whatever the corpus size (t11's own scale note), so the
    * contamination reference is a FIXED-size md5-selected slice of the
    * held-out bucket — bounded IN CODE (the d30 discipline, oracle-
    * mirrored). An eval slice PROPORTIONAL to the corpus (the full 'f'
    * bucket) saturates the synthetic corpus's fixed shingle vocabulary
    * as N grows: at the sf1 replica every train doc crosses even the
    * 50% graded threshold, emptying the pipeline — the proportional
    * slice is the artifact, not the rule. */
  val CurationEvalBudget = 256

  /** Docs ≥50%-shingle-contaminated against the BOUNDED eval suite
    * (t37's `contaminated` band measured vs the fixed benchmark slice):
    * the suite is the [[CurationEvalBudget]] md5-lowest shingled docs of
    * the held-out bucket; its shingle set broadcasts (suite-sized at any
    * corpus scale) and each train doc pays one shared-count join. */
  private[graft] def curationContaminated(spark: SparkSession, dir: String): DataFrame = {
    val ds = Dedup.docShingles(spark, dir)
      .withColumn("bucket", substring(md5(col("doc_id").cast("string")), 1, 1))
    val evalDocs = ds.filter(col("bucket") === "f" && col("n") > 0)
      .select(col("doc_id"), md5(col("doc_id").cast("string")).as("h"))
      .orderBy(col("h").asc, col("doc_id").asc)
      .limit(CurationEvalBudget)
      .select("doc_id")
    val evalSh = ds.join(evalDocs, Seq("doc_id"), "left_semi")
      .select(explode(col("shingles")).as("shingle")).distinct()
    val train = ds.filter(col("bucket") =!= "f" && col("n") > 0)
    train.select(col("doc_id"), explode(col("shingles")).as("shingle"))
      .join(broadcast(evalSh), Seq("shingle"))
      .groupBy("doc_id").agg(count(lit(1)).as("shared"))
      .join(train.select(col("doc_id"), col("n")), Seq("doc_id"))
      .filter(round(col("shared").cast("double") / col("n"), 6) >= 0.5)
      .select("doc_id")
  }

  /** The GATED corpus the full curation pipeline trains on:
    * [[curationQualityGated]] minus the held-out eval bucket (t12's
    * split rule — the WHOLE bucket leaves training) minus docs in t37's
    * `contaminated` band measured against the BOUNDED eval suite
    * ([[curationContaminated]] — the graded ≥0.5 drop rule vs a
    * fixed-size benchmark, not t11's any-overlap vs a corpus-
    * proportional slice, both of which saturate on this corpus's
    * bounded shingle vocabulary; t53's strict-rule final counts remain
    * pinned in the reconciliation spec as the relation between the
    * rules). */
  private[graft] def curationGated(spark: SparkSession, dir: String): DataFrame =
    curationQualityGated(spark, dir)
      .filter(substring(md5(col("doc_id").cast("string")), 1, 1) =!= "f")
      .join(curationContaminated(spark, dir), Seq("doc_id"), "left_anti")

  /** THE COMPOSED CURATION PIPELINE (t55) — the capstone contract: every
    * stage a training-data run ships, CHAINED as one operator from the
    * already-verified primitives (VERDICT r11 "What's missing" #1):
    *
    *   gate (d10 exact → d04/d07 near-dup apply → t02 quality → t12
    *   eval holdout + t37 GRADED decontamination)  [[curationGated]]
    *   → mixture (t17's α=0.5 temperature quota per language, applied
    *     destructively over the GATED corpus — md5-rank selection)
    *   → tokenize/pack (t13 chunking → t23 sequence packing, budget 128)
    *   → shard (f08's seeded md5 permutation over the PACKED sequences,
    *     exact ±1 balance)
    *
    * Output: the shard MANIFEST a trainer consumes — per shard, the
    * sequence/chunk/token mass and the md5 fingerprint of the
    * rank-ordered sequence ids (same seed ⇒ identical shards,
    * byte-checkable). One DuckDB oracle replays the whole chain
    * CTE-for-CTE; the spec reconciles the dedup+quality stages per
    * language against t53's reported docs_quality/tokens_quality row by
    * row, and pins t53's strict-t11 docs_final as the subset the
    * any-overlap rule would keep (the graded/strict relation).
    *
    * Scale shape: each stage is its primitive's own verified plan — the
    * gates are detection-sized or two-narrow-column joins on the doc_id
    * spine; the mixture is t17's salted two-phase top-k (no whole-
    * language sort); packing's only global ordering is the doc-grain
    * prefix sum ([[graft.plans.GlobalOrder]]'s two-phase scan); sharding
    * is one uniform hash exchange on the 256-bucket key. Nothing here
    * introduces a join or shuffle the primitives did not already carry. */
  def curationPipeline(spark: SparkSession, dir: String,
                       seed: String = "42", nShards: Int = 8): DataFrame = {
    val sampled = {
      // the gate chain (LSH detection + quality + decontamination) feeds
      // THREE consumers (the mixture's targets, its rank window, and the
      // semi-join back) — eager localCheckpoint so it runs once, and the
      // sampled survivors feed the pack's several passes the same way
      // (the t42/t48 multi-consumer discipline)
      val gated = curationGated(spark, dir).localCheckpoint()
      gated.join(temperatureMixOf(gated).select("doc_id"),
        Seq("doc_id"), "left_semi")
        .localCheckpoint()
    }
    val seqs = sequencePackOf(chunkTokensOf(sampled))
    graft.sources.ShardExport.assignShards(
        seqs.select(col("seq_id").as("doc_id"), col("n_chunks"),
          col("n_tokens")),
        seed, nShards)
      .groupBy(col("shard"))
      .agg(
        count(lit(1)).as("n_seqs"),
        sum(col("n_chunks")).cast("long").as("n_chunks"),
        sum(col("n_tokens")).cast("long").as("n_tokens"),
        md5(concat_ws(",",
          expr("transform(array_sort(collect_list(struct(rank, doc_id))), s -> cast(s.doc_id as string))")))
          .as("ids_fp"))
      .orderBy("shard")
  }

  /** PII REDACTION: strip emails and phone numbers from every document
    * and report what was removed — the privacy-scrub pass a training
    * corpus takes before any other processing. The synthetic corpus
    * contains no real PII, so the op first PLANTS deterministic fake
    * contact strings derived from doc_id (the same clearly-marked-stub
    * discipline as the multimodal decode path) and then runs the real
    * redaction: regex scan + global replace + audit counts.
    *
    * Scale shape: a pure narrow per-row map — regexp_count/replace are
    * codegen'd, no shuffle at any corpus size; the only exchange is the
    * driver-contract ORDER BY. */
  def piiRedactOf(docs: DataFrame): DataFrame = {
    val emailRe = """[a-z0-9._]+@[a-z0-9.-]+\.[a-z]{2,}"""
    val phoneRe = """\+?[0-9]{1,2}-[0-9]{3}-[0-9]{4}"""
    val planted = docs.select(
      col("doc_id"),
      concat(col("text"),
        lit(" contact user"), col("doc_id").cast("string"),
        lit("@example.com or +1-555-"),
        lpad((col("doc_id") * 7 % 10000).cast("string"), 4, "0")).as("raw"))
    // emails first, then phones: the planted phone follows the email, and
    // a fixed order makes the audit deterministic even if patterns touch
    val cleaned = planted.withColumn("clean",
      regexp_replace(regexp_replace(col("raw"), emailRe, "[EMAIL]"),
        phoneRe, "[PHONE]"))
    cleaned.select(
      col("doc_id"),
      regexp_count(col("raw"), lit(emailRe)).as("emails"),
      regexp_count(col("raw"), lit(phoneRe)).as("phones"),
      md5(col("clean")).as("clean_fp"),
      (length(col("raw")) - length(col("clean"))).cast("int").as("chars_removed"))
      .orderBy("doc_id")
  }

  def piiRedact(spark: SparkSession, dir: String): DataFrame =
    piiRedactOf(Tables.documents(spark, dir))

  /** Token-window CHUNKING: split each document into `window`-token
    * chunks every `stride` tokens (stride < window ⇒ overlapping chunks —
    * the context-window preprocessing step an LLM tokenize/pack pipeline
    * runs on every document). Pure per-row array arithmetic
    * (sequence → slice → posexplode): zero shuffle at any corpus size,
    * and output rows ≈ corpus tokens / stride, linear in input. */
  def chunkTokensOf(docs: DataFrame, window: Int = 32, stride: Int = 24): DataFrame =
    docs
      .withColumn("toks", split(col("text"), " "))
      .withColumn("n", size(col("toks")))
      .select(col("doc_id"), col("n"),
        posexplode(expr(
          s"transform(sequence(0, n - 1, $stride), s -> concat_ws(' ', slice(toks, s + 1, $window)))"))
          .as(Seq("chunk_id", "chunk_text")))
      .select(
        col("doc_id"),
        col("chunk_id"),
        least(lit(window), col("n") - col("chunk_id") * stride).as("n_chunk_tokens"),
        col("chunk_text"))
      .orderBy("doc_id", "chunk_id")

  def chunkTokens(spark: SparkSession, dir: String): DataFrame =
    chunkTokensOf(Tables.documents(spark, dir))

  /** SEQUENCE PACKING (t23) — the last step before a tokenized corpus
    * becomes trainable batches: pack [[chunkTokensOf]]'s chunks into
    * fixed-capacity training sequences, deterministically, in (doc_id,
    * chunk_id) order. Assignment is arithmetic, not stateful: each chunk's
    * global token OFFSET (exclusive running sum of chunk sizes in packing
    * order) divides by `base = budget − window + 1` to give its sequence
    * id. Because offsets are contiguous and every chunk is ≤ window
    * tokens, a sequence's total is ≤ (base − 1) + window = budget — the
    * hard capacity guarantee a trainer needs — while staying a pure
    * window+divide (no first-fit scan state).
    *
    * Scale shape: the only GLOBAL ordering is over per-document token
    * subtotals — #docs rows, aggregated before the scan, the same
    * doc-grain spine q33 builds — never over chunks; each chunk's offset
    * is its document's broadcast base plus an intra-document running sum
    * (window partitioned by doc_id, bounded by one document's chunks).
    * The doc-subtotal prefix sum is [[graft.plans.GlobalOrder]]'s
    * two-phase scan — range-partition, per-partition partials,
    * cluster-width offset window, broadcast add-back — NOT an
    * unpartitioned window (which would drag all ~10⁹ doc rows through
    * one task at 100 TB); the corpus itself never globally sorts. */
  /** Each chunk's global token OFFSET in packing order — the budget-
    * INDEPENDENT half of sequence packing (seq assignment is one integer
    * division on top), shared by [[sequencePackOf]] and the budget sweep
    * (t57). */
  private def chunkOffsetsOf(chunks: DataFrame): DataFrame = {
    val docTotals = chunks.groupBy("doc_id")
      .agg(sum(col("n_chunk_tokens")).as("doc_tokens"))
    val docBase = GlobalOrder.withPrefixSums(docTotals, Seq(col("doc_id")),
      col("doc_id"), Seq((col("doc_tokens"), "doc_base")), inclusive = false)
    val intraDoc = Window.partitionBy("doc_id").orderBy("chunk_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    chunks.join(docBase.select("doc_id", "doc_base"), Seq("doc_id"))
      .withColumn("off",
        col("doc_base") + coalesce(sum(col("n_chunk_tokens")).over(intraDoc), lit(0L)))
  }

  def sequencePackOf(chunks: DataFrame, budget: Int = 128, window: Int = 32): DataFrame = {
    require(budget >= window, s"budget $budget must fit a $window-token chunk")
    val base = budget - window + 1
    chunkOffsetsOf(chunks)
      .withColumn("seq_id", expr(s"off div $base"))
      .groupBy("seq_id")
      .agg(
        count(lit(1)).as("n_chunks"),
        sum(col("n_chunk_tokens")).as("n_tokens"),
        min(col("doc_id")).as("first_doc"),
        max(col("doc_id")).as("last_doc"))
      .orderBy("seq_id")
  }

  /** PACKING-BUDGET SWEEP (t57) — the tuning table read BEFORE t23's
    * budget is committed (the d23/d37/s28/s30 tuning-table discipline
    * applied to sequence packing): per candidate budget, how many
    * training sequences the corpus packs into, the capacity paid
    * (n_seqs × budget), the padding fraction a trainer wastes on it,
    * and the max sequence fill (must respect the budget — the t23
    * capacity guarantee, re-asserted per point). Longer budgets waste
    * more padding on this chunk grain; shorter ones multiply sequence
    * count — the table is the trade-off, and seq-length is a knob real
    * training runs tune by exactly this number.
    *
    * ONE chunk pass and ONE offset computation serve every point: the
    * global offset is budget-independent (eagerly checkpointed for its
    * |budgets| consumers), and each budget pays only the integer
    * division plus a #sequences-sized aggregate. padding_frac is a
    * single IEEE divide of exact BIGINTs, 6dp-rounded. */
  def packingSweepOf(chunks0: DataFrame,
                     budgets: Seq[Int] = Seq(64, 128, 256),
                     window: Int = 32): DataFrame = {
    val offsets = chunkOffsetsOf(chunks0).localCheckpoint()
    budgets.map { b =>
      require(b >= window, s"budget $b must fit a $window-token chunk")
      val base = b - window + 1
      offsets
        .withColumn("seq_id", expr(s"off div $base"))
        .groupBy("seq_id")
        .agg(count(lit(1)).as("c"), sum(col("n_chunk_tokens")).as("t"))
        .agg(
          count(lit(1)).as("n_seqs"),
          sum("c").as("n_chunks"),
          sum("t").as("n_tokens"),
          max("t").as("max_seq_tokens"))
        .select(lit(b).as("budget"),
          col("n_seqs"), col("n_chunks"), col("n_tokens"),
          (col("n_seqs") * lit(b.toLong)).as("capacity"),
          round(lit(1.0) - col("n_tokens").cast("double") /
            (col("n_seqs") * lit(b.toLong)).cast("double"), 6)
            .as("padding_frac"),
          col("max_seq_tokens"))
    }.reduce(_ unionByName _).orderBy("budget")
  }

  def packingSweep(spark: SparkSession, dir: String): DataFrame =
    packingSweepOf(chunkTokens(spark, dir))

  def sequencePack(spark: SparkSession, dir: String): DataFrame =
    sequencePackOf(chunkTokens(spark, dir))

  /** The greedy merge-application fold for one BPE merge (a, b), as a SQL
    * expression over the `repr` column ("l|o|w" symbol strings): fold left
    * over the symbols, and when the accumulator's LAST symbol is `a` and
    * the incoming symbol is `b`, replace that last symbol with the merged
    * one — left-to-right non-overlapping, so "a|a|a" under (a,a) becomes
    * "aa|a", the Sennrich et al. greedy semantics. String accumulator
    * (symbols never contain '|') keeps the identical fold expressible in
    * DuckDB's list_reduce, whose accumulator must share the element type.
    * Interpolation is safe: the vocabulary is pre-filtered to ^[a-z0-9]+$
    * so symbols cannot contain quotes or regex metacharacters. */
  private def applyMergeSql(a: String, b: String): String =
    s"""aggregate(slice(split(repr, '\\\\|'), 2, length(repr)),
       |  element_at(split(repr, '\\\\|'), 1),
       |  (acc, s) -> CASE WHEN regexp_extract(acc, '[^|]*$$', 0) = '$a' AND s = '$b'
       |    THEN concat(substring(acc, 1, length(acc) - length(regexp_extract(acc, '[^|]*$$', 0))), '$a$b')
       |    ELSE concat(acc, '|', s) END)""".stripMargin.replaceAll("\n", " ")

  /** BPE MERGE INDUCTION (t24) — subword vocabulary training, the step
    * past whitespace tokens (t05/t18): from the corpus's top-`maxVocab`
    * alphanumeric words (frequency-weighted), run `merges` rounds of
    * byte-pair encoding — count adjacent symbol pairs, merge the most
    * frequent pair corpus-wide, repeat (Sennrich, Haddow & Birch 2016,
    * "Neural Machine Translation of Rare Words with Subword Units"). Ties
    * break on (count desc, lhs, rhs) so the merge table is deterministic
    * cross-engine. Rounds stop early if no adjacent pairs remain.
    *
    * Scale shape: the trainer-loop discipline of the k-means path (s08) —
    * each round is ONE distributed aggregation over the vocabulary
    * (pair explode → hash agg → top-1 via TakeOrdered) and one narrow
    * per-row fold to apply the winner; only the single winning pair is
    * ever collected. The corpus is scanned once (word counts); everything
    * after runs on the aggregated vocabulary, which is capped and tiny
    * relative to any corpus (at 100 TB: a 10M-type vocab per round, the
    * same cost class as one k-means iteration).
    *
    * REFERENCE FORM ONLY (r13): one driver action PER MERGE is exact
    * Sennrich greedy, but a production 32k-merge vocabulary would be
    * 32k sequential jobs. The gate's t24 surface and t25's encode are
    * SERVED by [[bpeBatchMergesOf]] (t56) at batch=1, which OpsSpec
    * pins row-for-row equal to this trainer — this form survives as the
    * equality spec's reference implementation, never a gate hot path
    * (VERDICT r12 item 6). */
  def bpeMergesOf(docs: DataFrame, merges: Int = 8, maxVocab: Int = 256): DataFrame = {
    val spark = docs.sparkSession
    var vocab = docs
      .select(explode(split(lower(col("text")), " ")).as("word"))
      .filter(col("word").rlike("^[a-z0-9]+$"))
      .groupBy("word").agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("word").asc)
      .limit(maxVocab)
      // eager localCheckpoint: each round's pair scan reads the current
      // vocab; blocks are GC-scoped (the superseded round's frame becomes
      // unreachable when `vocab` is reassigned), so the loop holds at
      // most one live generation with no manual unpersist bookkeeping
      .withColumn("repr", concat_ws("|", split(col("word"), "")))
      .localCheckpoint()
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, String, String, Long, String)]
    var step = 1
    var exhausted = false
    while (!exhausted && step <= merges) {
      val top = vocab
        .withColumn("sp", split(col("repr"), "\\|"))
        .filter(size(col("sp")) >= 2)
        .select(col("freq"), explode(expr(
          "transform(sequence(1, size(sp) - 1), i -> struct(element_at(sp, i) as a, element_at(sp, i + 1) as b))"))
          .as("pr"))
        .groupBy(col("pr.a").as("a"), col("pr.b").as("b"))
        .agg(sum(col("freq")).as("cnt"))
        .orderBy(col("cnt").desc, col("a").asc, col("b").asc)
        .limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val (a, b, cnt) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        out += ((step.toLong, a, b, cnt, a + b))
        vocab = vocab.withColumn("repr", expr(applyMergeSql(a, b))).localCheckpoint()
        step += 1
      }
    }
    import spark.implicits._
    out.toSeq.toDF("step", "lhs", "rhs", "pair_count", "merged").orderBy("step")
  }

  /** The general form of [[applyMergeSql]]: ONE left fold applying a
    * whole batch of symbol-DISJOINT merges (at most one branch can match
    * any position, so simultaneous application ≡ sequential in any
    * order — the precondition [[bpeBatchMergesOf]]'s selection enforces). */
  private def applyBatchMergeSql(ms: Seq[(String, String)]): String = {
    val branches = ms.map { case (a, b) =>
      s"WHEN regexp_extract(acc, '[^|]*$$', 0) = '$a' AND s = '$b' " +
        s"THEN concat(substring(acc, 1, length(acc) - length(regexp_extract(acc, '[^|]*$$', 0))), '$a$b')"
    }.mkString(" ")
    s"""aggregate(slice(split(repr, '\\\\|'), 2, length(repr)),
       |  element_at(split(repr, '\\\\|'), 1),
       |  (acc, s) -> CASE $branches
       |    ELSE concat(acc, '|', s) END)""".stripMargin.replaceAll("\n", " ")
  }

  /** Ranked-prefix budget for the per-round pair collect (bounded IN
    * CODE, d30's discipline — the oracle scans the same prefix): the
    * driver only ever sees this many (pair, count) rows per round, not
    * the vocabulary-sized pair table. */
  val BpePairScanBudget = 4096

  /** BATCHED BPE MERGE INDUCTION (t56) — t24's trainer with its scale
    * boundary removed (VERDICT r11 item 6): t24 runs ONE driver action
    * per merge, which at a production 32k-merge vocabulary is 32k
    * sequential Spark jobs. Here each ROUND is one distributed pair
    * count + one bounded collect of the ranked prefix, a DRIVER-side
    * greedy selection of up to `batch` mutually symbol-disjoint pairs
    * (scan the (count desc, lhs, rhs) order; take a pair iff neither
    * symbol was touched by an earlier pick this round — disjointness is
    * what makes applying the whole batch in ONE narrow fold exactly
    * equal to applying them sequentially), and one checkpointed apply
    * pass. A 32k-merge vocabulary costs 32k/batch rounds (125 jobs at
    * batch=256), the GPT-2-style batched induction real tokenizers use.
    *
    * batch=1 degenerates to EXACTLY t24's greedy trainer (spec-pinned
    * against t24's table row for row). Each pick's `pair_count` is its
    * frequency in the PRE-round table — the selection statistic; counts
    * of later picks in a round are not re-measured after earlier picks
    * apply (that is the batching trade: Sennrich-greedy recounts every
    * merge, batched recounts every round). Deterministic end to end —
    * the oracle unrolls the same rounds, the same bounded prefix, and
    * the same disjoint-pick chain in SQL. */
  def bpeBatchMergesOf(docs: DataFrame, rounds: Int = 2, batch: Int = 4,
                       maxVocab: Int = 256): DataFrame = {
    val spark = docs.sparkSession
    var vocab = docs
      .select(explode(split(lower(col("text")), " ")).as("word"))
      .filter(col("word").rlike("^[a-z0-9]+$"))
      .groupBy("word").agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("word").asc)
      .limit(maxVocab)
      .withColumn("repr", concat_ws("|", split(col("word"), "")))
      .localCheckpoint()
    val out = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Int, String, String, Long, String)]
    var r = 1
    var exhausted = false
    while (!exhausted && r <= rounds) {
      val ranked = vocab
        .withColumn("sp", split(col("repr"), "\\|"))
        .filter(size(col("sp")) >= 2)
        .select(col("freq"), explode(expr(
          "transform(sequence(1, size(sp) - 1), i -> struct(element_at(sp, i) as a, element_at(sp, i + 1) as b))"))
          .as("pr"))
        .groupBy(col("pr.a").as("a"), col("pr.b").as("b"))
        .agg(sum(col("freq")).as("cnt"))
        .orderBy(col("cnt").desc, col("a").asc, col("b").asc)
        .limit(BpePairScanBudget)
        .collect()
      val used = scala.collection.mutable.Set.empty[String]
      val picks = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
      ranked.iterator.takeWhile(_ => picks.size < batch).foreach { row =>
        val (a, b) = (row.getString(0), row.getString(1))
        if (!used(a) && !used(b) && picks.size < batch) {
          picks += ((a, b, row.getLong(2)))
          used += a; used += b
        }
      }
      if (picks.isEmpty) exhausted = true
      else {
        picks.zipWithIndex.foreach { case ((a, b, c), i) =>
          out += ((r.toLong, i + 1, a, b, c, a + b))
        }
        vocab = vocab.withColumn("repr",
          expr(applyBatchMergeSql(picks.map(p => (p._1, p._2)).toSeq)))
          .localCheckpoint()
        r += 1
      }
    }
    import spark.implicits._
    out.toSeq.toDF("round", "pick", "lhs", "rhs", "pair_count", "merged")
      .orderBy("round", "pick")
  }

  def bpeBatchMerges(spark: SparkSession, dir: String): DataFrame =
    bpeBatchMergesOf(Tables.documents(spark, dir))

  /** The corpus merge table memoized per (session, dir) — t24's surface
    * and t25's encode both consume it; the 8-round trainer runs once
    * (the compute-once/query-many discipline of the ANN index artifacts).
    * The rows are the trained model (≤ merges entries), so holding them
    * driver-side IS the broadcast-the-model posture. */
  private val bpeMemo = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String), Seq[(Long, String, String, Long, String)]]

  private def corpusMerges(spark: SparkSession,
                           dir: String): Seq[(Long, String, String, Long, String)] = {
    bpeMemo.keys.filter(_._1.sparkContext.isStopped).foreach(bpeMemo.remove)
    // SERVED BY THE BATCHED TRAINER at batch=1 (VERDICT r12 item 6):
    // OpsSpec pins bpeBatchMergesOf(batch=1) row-for-row equal to the
    // Sennrich-greedy bpeMergesOf, so t24's gate surface and t25's
    // encode run the one production trainer; the greedy form stays as
    // the reference implementation that equality spec checks against.
    // At batch=1 each round emits exactly one pick, so round ≡ step.
    bpeMemo.getOrElseUpdate((spark, dir),
      bpeBatchMergesOf(Tables.documents(spark, dir), rounds = 8, batch = 1)
        .collect().toSeq
        .map(r => (r.getLong(0), r.getString(2), r.getString(3), r.getLong(4),
          r.getString(5))))
  }

  def bpeMerges(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    corpusMerges(spark, dir)
      .toDF("step", "lhs", "rhs", "pair_count", "merged").orderBy("step")
  }

  /** BPE ENCODE (t25) — apply [[bpeMergesOf]]'s induced merge table to the
    * corpus: tokenize each document into subword units and report per-doc
    * token economics (whitespace words in vs subword tokens out, and the
    * expansion factor a trainer budgets context length by). Completes the
    * tokenizer lifecycle: t24 trains the vocabulary, t25 runs it.
    *
    * Scale shape: a DICTIONARY ENCODE. The merge table is collected —
    * ≤`merges` rows of trained model parameters, the same collect-only-
    * the-model discipline as the k-means loop (s08) — and the chained
    * greedy folds run once per distinct word TYPE (vocabulary-sized,
    * millions of rows at 100 TB), never per token occurrence. The token
    * stream then hash-joins word→subword_count at the (doc, word) grain
    * and aggregates to docs: one exchange on the type table, one on the
    * doc aggregate. Encoding cost is O(types × merges), independent of
    * corpus token count. */
  /** Distinct word types → (word, n_sub) under the merge table: the
    * greedy encode fold runs over the TYPE table (vocab-sized), never the
    * token stream. */
  private def encodedTypesOf(words: DataFrame,
                             merges: Seq[(String, String)]): DataFrame = {
    val types0 = words.select("word").distinct()
      .withColumn("repr", concat_ws("|", split(col("word"), "")))
    merges
      .foldLeft(types0) { (df, m) =>
        df.withColumn("repr", expr(applyMergeSql(m._1, m._2)))
      }
      .select(col("word"), size(split(col("repr"), "\\|")).as("n_sub"))
  }

  private def bpeEncodeWith(docs: DataFrame,
                            merges: Seq[(String, String)]): DataFrame = {
    val words = docs
      .select(col("doc_id"), explode(split(lower(col("text")), " ")).as("word"))
      .filter(col("word").rlike("^[a-z0-9]+$"))
    val encoded = encodedTypesOf(words, merges)
    words.join(encoded, Seq("word"))
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("word_count"),
        sum(col("n_sub").cast("long")).as("subword_count"))
      .withColumn("expansion",
        round(col("subword_count").cast("double") / col("word_count"), 6))
      .orderBy("doc_id")
  }

  def bpeEncodeOf(docs: DataFrame, merges: Int = 8, maxVocab: Int = 256): DataFrame =
    bpeEncodeWith(docs,
      bpeMergesOf(docs, merges, maxVocab).collect().toSeq
        .map(r => (r.getString(1), r.getString(2))))

  def bpeEncode(spark: SparkSession, dir: String): DataFrame =
    bpeEncodeWith(Tables.documents(spark, dir),
      corpusMerges(spark, dir).map(m => (m._2, m._3)))

  /** TOKENIZER FERTILITY (t34) — subwords-per-word and chars-per-subword
    * by LANGUAGE under the t24 merge table: the tokenizer-cost audit run
    * before committing a vocabulary ("how many tokens does each language
    * pay per word?" — fertility drives training cost and context-window
    * budget per language, and a vocab trained on one language inflates
    * the others). Reuses the memoized corpus merges (t24/t25) and the
    * type-grain encode fold; the token stream only joins the vocab-sized
    * (word, n_sub) table and aggregates to lang grain — one narrow pass.
    * Ratios are single double divides of exact BIGINT sums. */
  def tokenizerFertilityOf(docs: DataFrame,
                           merges: Seq[(String, String)]): DataFrame = {
    val words = docs
      .select(col("lang"), explode(split(lower(col("text")), " ")).as("word"))
      .filter(col("word").rlike("^[a-z0-9]+$"))
    val enc = encodedTypesOf(words, merges)
      .withColumn("n_chars_w", length(col("word")).cast("long"))
    words.join(enc, Seq("word"))
      .groupBy("lang")
      .agg(
        count(lit(1)).as("words"),
        sum(col("n_sub").cast("long")).as("subwords"),
        sum(col("n_chars_w")).as("chars"))
      .select(col("lang"), col("words"), col("subwords"), col("chars"),
        round(col("subwords").cast("double") / col("words"), 6).as("fertility"),
        round(col("chars").cast("double") / col("subwords"), 6)
          .as("chars_per_subword"))
      .orderBy("lang")
  }

  def tokenizerFertility(spark: SparkSession, dir: String): DataFrame =
    tokenizerFertilityOf(Tables.documents(spark, dir),
      corpusMerges(spark, dir).map(m => (m._2, m._3)))

  /** MODEL-BASED quality classifier (t26) — the classifier-filter step of
    * the modern corpus pipelines (FineWeb-Edu, DCLM: a small trained
    * scorer replaces hand rules): a fixed-weight logistic model over
    * per-doc features — length, lexical diversity (type/token ratio),
    * mean token length — scored with a sigmoid, thresholded at 0.5.
    * Weights here are fixed literals standing in for trained parameters
    * (the Spark-side mechanics — broadcastable model, one narrow pass,
    * no UDF — are what carries to a real model).
    *
    * Engine-portability: emitted features stay INTEGER; the double
    * ratios live only inside the exponent, where exp() makes the value
    * non-terminating before the 6dp round (a directly-rounded ratio like
    * 1/128 terminates exactly ON a half boundary and coin-flips — the
    * g01 lesson). One scan, zero shuffles until the output sort. */
  def qualityClassifierOf(docs: DataFrame): DataFrame =
    docs
      .withColumn("toks", split(col("text"), " "))
      .withColumn("n_tokens", size(col("toks")).cast("long"))
      .withColumn("n_types", size(array_distinct(col("toks"))).cast("long"))
      .withColumn("n_chars", length(expr("replace(text, ' ', '')")).cast("long"))
      .withColumn("z",
        lit(-4.0) +
          lit(0.45) * (col("n_chars").cast("double") / col("n_tokens")) +
          lit(4.0) * (col("n_types").cast("double") / col("n_tokens")) +
          lit(0.002) * col("n_tokens"))
      .select(
        col("doc_id"), col("n_tokens"), col("n_types"), col("n_chars"),
        round(lit(1.0) / (lit(1.0) + exp(-col("z"))), 6).as("score"))
      .withColumn("keep", (col("score") >= 0.5).cast("int"))
      .orderBy("doc_id")

  def qualityClassifier(spark: SparkSession, dir: String): DataFrame =
    qualityClassifierOf(Tables.documents(spark, dir))

  /** VOCABULARY GROWTH curve (t27) — Heaps-law saturation measurement:
    * how many NEW word types each document contributes in doc_id order,
    * with running type and token totals. The curve's flattening is the
    * signal that more of the same crawl stops buying vocabulary — a
    * corpus-acquisition decision input.
    *
    * Scale shape: first occurrences come from a token-type-grain
    * aggregate (min doc_id per type — uniform hash keys); everything
    * after runs on the doc-grain spine, where the only global ordering
    * lives (same discipline as t23's subtotals — and the running totals
    * use [[graft.plans.GlobalOrder]]'s two-phase distributed scan, not
    * an unpartitioned window that would serialize the ~#docs spine
    * through one task). */
  def vocabGrowthOf(docs: DataFrame): DataFrame = {
    val toks = docs.select(col("doc_id"),
      explode(split(col("text"), " ")).as("tok"))
    val firstSeen = toks.groupBy("tok").agg(min("doc_id").as("first_doc"))
      .groupBy(col("first_doc").as("doc_id"))
      .agg(count(lit(1)).as("new_types"))
    val spine = toks.groupBy("doc_id").agg(count(lit(1)).as("n_tokens"))
    val joined = spine.join(firstSeen, Seq("doc_id"), "left")
      .withColumn("new_types", coalesce(col("new_types"), lit(0L)))
    GlobalOrder.withPrefixSums(joined, Seq(col("doc_id")), col("doc_id"),
      Seq((col("new_types"), "cum_types"), (col("n_tokens"), "cum_tokens")),
      inclusive = true)
      .select("doc_id", "n_tokens", "new_types", "cum_types", "cum_tokens")
      .orderBy("doc_id")
  }

  def vocabGrowth(spark: SparkSession, dir: String): DataFrame =
    vocabGrowthOf(Tables.documents(spark, dir))

  /** QUANTILE-threshold quality filter: keep documents whose repetition
    * ratio is at or below their LANGUAGE's median — a relative,
    * distribution-aware cut (languages differ in baseline repetition, so
    * one global threshold over- or under-filters; per-group quantiles are
    * how production corpus filters set thresholds).
    *
    * Determinism: per-row ratios are 4dp-rounded (deterministic); the
    * median is exact interpolation over those values, compared UNROUNDED
    * and not emitted — re-rounding an interpolated midpoint ((a+b)/2 can
    * land exactly on a half at the 5th decimal) is the one place engine
    * rounding modes could disagree, so the threshold stays internal.
    *
    * Scale: the grouped EXACT median buffers a language's values in the
    * aggregation — the oracle-able contract; at 100 TB swap in
    * percentile_approx (one streaming pass, bounded sketch memory), same
    * plan shape otherwise. The medians table is #languages-sized and
    * broadcasts back. */
  def quantileFiltered(spark: SparkSession, dir: String): DataFrame = {
    val scored = qualityScore(spark, dir)
      .join(Tables.documents(spark, dir).select("doc_id", "lang"), Seq("doc_id"))
    val meds = scored.groupBy("lang")
      .agg(median(col("repetition_ratio")).as("med"))
    scored.join(broadcast(meds), Seq("lang"))
      .filter(col("repetition_ratio") <= col("med"))
      .select("doc_id", "lang", "repetition_ratio")
      .orderBy("doc_id")
  }

  /** STRATIFIED sampling: a deterministic fixed-size sample PER GROUP
    * (per language here) — the balanced-mixture draw a multilingual
    * training run uses so low-resource languages aren't drowned out.
    * Order within a group is by md5(doc_id) (reproducible, unbiased;
    * rand() is neither), doc_id as the total tie-break.
    *
    * Scale shape — two-phase exact top-k (same trick as q23's two-phase
    * distinct): a single `row_number` window per language would sort an
    * entire language's corpus in ONE task (a hot language is most of the
    * corpus). Instead phase 1 ranks within (lang, doc_id%16) salt
    * slices — 16-way parallel, each task holds 1/16th of a language —
    * and keeps `perGroup` per slice; phase 2 ranks the surviving
    * 16×perGroup rows per language. The global top-`perGroup` by hash
    * order is necessarily phase-1-local top-`perGroup` in its own slice,
    * so the result is EXACT, not approximate. */
  def stratifiedSampleOf(docs: DataFrame, perGroup: Int = 5): DataFrame = {
    val salted = Window.partitionBy("lang", "salt").orderBy(col("h"), col("doc_id"))
    val fin = Window.partitionBy("lang").orderBy(col("h"), col("doc_id"))
    docs
      .withColumn("h", md5(col("doc_id").cast("string")))
      .withColumn("salt", pmod(col("doc_id"), lit(16)))
      .withColumn("prk", row_number().over(salted))
      .filter(col("prk") <= perGroup)
      .withColumn("rk", row_number().over(fin))
      .filter(col("rk") <= perGroup)
      .select(col("doc_id"), col("lang"), col("rk"))
      .orderBy("lang", "rk")
  }

  def stratifiedSample(spark: SparkSession, dir: String): DataFrame =
    stratifiedSampleOf(Tables.documents(spark, dir))

  /** N-GRAM repetition signals (the Gopher-style repetition filters —
    * Rae et al. 2021, "Scaling Language Models", Appendix A — beyond
    * [[qualityScoreOf]]'s token-level ratio): per document, the fraction
    * of word 3-gram occurrences that are repeats of an earlier 3-gram in
    * the same doc, and the fraction of tokens taken by the single most
    * frequent token. Looping/template-generated text scores high on both
    * while still passing distinct-token checks.
    *
    * Scale shape: the trigram fraction is pure per-row HOF arithmetic
    * (zero shuffle). The top-token count is a two-level hash aggregate —
    * explode to (doc, token), count, then max per doc — both levels with
    * map-side partial aggregation, so the exchanges carry per-doc distinct
    * token counts, not the token stream. The final join is doc_id-keyed,
    * uniform. */
  def ngramRepetitionOf(docs: DataFrame): DataFrame = {
    val base = withToks(docs)
      .withColumn("n_tokens", size(col("toks")))
      .withColumn("tris", expr(
        """case when size(toks) < 3 then array()
          |else transform(sequence(0, size(toks)-3),
          |     i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2])) end"""
          .stripMargin.replaceAll("\n", " ")))
      .withColumn("n_trigrams", size(col("tris")))
      .withColumn("dup_trigram_frac",
        when(col("n_trigrams") > 0,
          round(lit(1.0) - size(array_distinct(col("tris"))).cast("double") / col("n_trigrams"), 4))
          .otherwise(lit(0.0)))
      .select("doc_id", "n_tokens", "n_trigrams", "dup_trigram_frac")
    val top = withToks(docs)
      .select(col("doc_id"), explode(col("toks")).as("tok"))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("c"))
      .groupBy("doc_id").agg(max("c").as("top_count"))
    base.join(top, Seq("doc_id"))
      .withColumn("top_token_frac",
        round(col("top_count").cast("double") / col("n_tokens"), 4))
      .select("doc_id", "n_tokens", "n_trigrams", "dup_trigram_frac", "top_token_frac")
      .orderBy("doc_id")
  }

  def ngramRepetition(spark: SparkSession, dir: String): DataFrame =
    ngramRepetitionOf(Tables.documents(spark, dir))

  /** TEMPERATURE-balanced language mix: sample each language down to
    * `floor(sqrt(n_lang))` documents — the α=0.5 temperature reweighting
    * multilingual training runs use to keep dominant languages from
    * drowning out low-resource ones (dominant languages are cut hardest:
    * 10,000 docs → 100, while 100 docs → 10). The per-language target is
    * derived from the data itself, no cross-language normalization — so
    * the arithmetic (integer sqrt via correctly-rounded IEEE sqrt + floor)
    * is bit-portable across engines.
    *
    * Selection within a language is by md5(doc_id) hash order
    * (reproducible, unbiased), using [[stratifiedSampleOf]]'s salted
    * two-phase exact top-k — phase 1 ranks inside (lang, doc_id%16)
    * slices so no task ever sorts a whole language, phase 2 ranks the
    * ≤16×target survivors. The per-language target rides along via a
    * broadcast join of the #languages-sized targets table; both window
    * phases stay bounded. */
  def temperatureMixOf(docs: DataFrame): DataFrame = {
    val targets = docs.groupBy("lang")
      .agg(count(lit(1)).as("lang_docs"))
      .withColumn("target", floor(sqrt(col("lang_docs"))).cast("int"))
    val salted = Window.partitionBy("lang", "salt").orderBy(col("h"), col("doc_id"))
    val fin = Window.partitionBy("lang").orderBy(col("h"), col("doc_id"))
    docs
      .join(broadcast(targets), Seq("lang"))
      .withColumn("h", md5(col("doc_id").cast("string")))
      .withColumn("salt", pmod(col("doc_id"), lit(16)))
      .withColumn("prk", row_number().over(salted))
      .filter(col("prk") <= col("target"))
      .withColumn("rk", row_number().over(fin))
      .filter(col("rk") <= col("target"))
      .select("lang", "doc_id", "lang_docs", "target")
      .orderBy("lang", "doc_id")
  }

  def temperatureMix(spark: SparkSession, dir: String): DataFrame =
    temperatureMixOf(Tables.documents(spark, dir))

  /** OUT-OF-VOCABULARY rate per document: the fraction of token
    * occurrences not covered by the corpus top-50 vocabulary ([[
    * vocabulary]]'s exact tie-broken top-k) — the coverage metric that
    * sizes a tokenizer's vocab and flags domain-mismatched documents
    * before training.
    *
    * Scale shape: the vocabulary is corpus-wide but top-k-sized, so it
    * BROADCASTS back to the token stream (no shuffle on the stream side
    * beyond the per-doc aggregate, which map-side combines); the
    * vocabulary aggregate itself carries vocab-sized data after partial
    * aggregation, exactly like t05. */
  def oovRateOf(docs: DataFrame): DataFrame = {
    val vocab = withToks(docs)
      .select(explode(col("toks")).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("occ"))
      .orderBy(col("occ").desc, col("tok").asc)
      .limit(50)
      .select(col("tok"))
      .withColumn("in_vocab", lit(1))
    withToks(docs)
      .select(col("doc_id"), explode(col("toks")).as("tok"))
      .join(broadcast(vocab), Seq("tok"), "left")
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_tokens"),
        sum(coalesce(col("in_vocab"), lit(0))).as("in_vocab_tokens"))
      .withColumn("oov_rate",
        round(lit(1.0) - col("in_vocab_tokens").cast("double") / col("n_tokens"), 4))
      .select("doc_id", "n_tokens", "in_vocab_tokens", "oov_rate")
      .orderBy("doc_id")
  }

  def oovRate(spark: SparkSession, dir: String): DataFrame =
    oovRateOf(Tables.documents(spark, dir))

  /** Unigram LOG-PROBABILITY score — the perplexity-proxy quality filter
    * (real pipelines score against a KenLM n-gram model; the unigram
    * corpus model is its self-contained degenerate case): per document,
    * the mean token log-probability under the corpus unigram
    * distribution. Gibberish and vocabulary-mismatched docs score low;
    * repetitive common-token docs score high — complementary to
    * [[ngramRepetitionOf]].
    *
    * Determinism: each token's ln(p) is rounded to 6dp then cast
    * DECIMAL(18,6) (t06's proven-portable ln discipline), so the per-doc
    * sum is exact and order-independent; the mean divides the exact sum
    * by an integer count at the final projection.
    *
    * Scale shape: the unigram table is vocab-sized after map-side
    * partial aggregation and BROADCASTS back to the token stream; the
    * per-doc aggregate map-side combines. Nothing shuffles at token
    * grain. */
  def unigramLogprobOf(docs: DataFrame): DataFrame = {
    val tok = withToks(docs).select(col("doc_id"), explode(col("toks")).as("tok"))
    val freq = tok.groupBy("tok").agg(count(lit(1)).as("occ"))
    val total = freq.agg(sum("occ").as("total"))
    val lp = freq.crossJoin(broadcast(total))
      .withColumn("lp",
        round(log(col("occ").cast("double") / col("total")), 6).cast("decimal(18,6)"))
      .select("tok", "lp")
    tok.join(broadcast(lp), Seq("tok"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"), sum("lp").as("sum_lp"))
      .withColumn("avg_logprob",
        round(col("sum_lp").cast("double") / col("n_tokens"), 4))
      .select("doc_id", "n_tokens", "avg_logprob")
      .orderBy("doc_id")
  }

  def unigramLogprob(spark: SparkSession, dir: String): DataFrame =
    unigramLogprobOf(Tables.documents(spark, dir))

  /** BIGRAM conditional log-probability (t21) — the 2-gram refinement of
    * [[unigramLogprobOf]], one step closer to the KenLM filter real
    * pipelines run: per document, the mean ln p(cur|prev) under the
    * corpus bigram model with add-one smoothing over the vocabulary
    * (p = (c(prev,cur)+1) / (c(prev)+V)). Word-salad scores far lower
    * than fluent text even when its unigrams are common — the signal the
    * unigram model cannot see.
    *
    * Determinism: counts and V are exact integers; each conditional
    * probability is ONE double division, its ln rounded to 6dp and cast
    * DECIMAL(18,6) (t06/t19's proven discipline), so per-doc sums are
    * exact and order-independent.
    *
    * Scale shape: bigram extraction is a narrow per-row array transform
    * (docs under 2 tokens yield none); the bigram-model table aggregates
    * with map-side combine and joins back co-partitioned on (prev, cur)
    * — unlike t19's vocab-sized broadcast, the bigram table scales with
    * distinct bigrams, so the scoring join is a plain co-partitioned
    * shuffle join, exactly what you want at corpus scale. The 1-row
    * vocabulary count broadcasts. */
  def bigramLogprobOf(docs: DataFrame): DataFrame = {
    val toks = withToks(docs)
    val big = toks
      .select(col("doc_id"), explode(expr(
        """case when size(toks) < 2 then array()
          |else transform(sequence(1, size(toks) - 1),
          |               i -> struct(toks[i-1] as prev, toks[i] as cur)) end
          |""".stripMargin.replaceAll("\n", " "))).as("b"))
      .select(col("doc_id"), col("b.prev").as("prev"), col("b.cur").as("cur"))
    val bfreq = big.groupBy("prev", "cur").agg(count(lit(1)).as("cb"))
    val ufreq = big.groupBy("prev").agg(count(lit(1)).as("cu"))
    val vocab = toks.select(explode(col("toks")).as("tok"))
      .agg(countDistinct("tok").as("vocab"))
    val lp = bfreq.join(ufreq, Seq("prev"))
      .crossJoin(broadcast(vocab))
      .withColumn("lp",
        round(log((col("cb") + 1).cast("double") / (col("cu") + col("vocab"))), 6)
          .cast("decimal(18,6)"))
      .select("prev", "cur", "lp")
    big.join(lp, Seq("prev", "cur"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"), sum("lp").as("sum_lp"))
      .withColumn("avg_logprob",
        round(col("sum_lp").cast("double") / col("n_bigrams"), 4))
      .select("doc_id", "n_bigrams", "avg_logprob")
      .orderBy("doc_id")
  }

  def bigramLogprob(spark: SparkSession, dir: String): DataFrame =
    bigramLogprobOf(Tables.documents(spark, dir))

  /** Corpus MIXTURE report — the "dataset card" table a training run
    * publishes: documents, token mass, and corpus share per (language,
    * quality band). The grain every data-mixing decision (and t17's
    * temperature targets) reads from.
    *
    * Scale shape: per-row scoring is narrow; the cross-tab is one
    * map-side-combined aggregate over ~languages×4 groups; the 1-row
    * total broadcasts. */
  def mixtureReport(spark: SparkSession, dir: String): DataFrame = {
    val scored = qualityScore(spark, dir)
      .join(Tables.documents(spark, dir).select("doc_id", "lang"), Seq("doc_id"))
    val total = Tables.documents(spark, dir).agg(count(lit(1)).as("total_docs"))
    scored.groupBy("lang", "quality_band")
      .agg(count(lit(1)).as("docs"), sum("n_tokens").as("tokens"))
      .crossJoin(broadcast(total))
      .withColumn("doc_share", round(col("docs").cast("double") / col("total_docs"), 4))
      .select("lang", "quality_band", "docs", "tokens", "doc_share")
      .orderBy("lang", "quality_band")
  }

  /** COUNT-MIN SKETCH heavy hitters (t29) — the sublinear-memory
    * frequency structure (Cormode & Muthukrishnan 2005) a 100 TB token
    * stream needs when the vocabulary itself is too hot to shuffle: the
    * sketch is a depth×width grid of counters (here 4×512 = 2 K cells,
    * CONSTANT in corpus size), each token increments one bucket per hash
    * row, and a word's estimate is the MIN over its row buckets — always
    * ≥ the true count, overshooting only by collision mass. The scale
    * win is the aggregate's key space: the sketch build shuffles ≤ 2 K
    * cell keys regardless of vocabulary (map-side combine collapses each
    * partition to the grid), where an exact count shuffles every word.
    *
    * Hash rows are md5-derived ([[rollingFingerprintOf]]'s decode
    * discipline: first 8 hex chars → BIGINT, mod width, salted by the
    * row index) — a published-construction hash both engines compute
    * bit-identically, so sketch contents and estimates hash-match DuckDB
    * exactly. The report joins the exact counts beside the estimates for
    * the top-k — the d20 calibration posture: the sketch is the shipped
    * path, the exact column is what certifies its error. */
  /** The per-hash-row bucket columns b0..b(depth−1) of a `word` column —
    * shared by the batch sketch ([[cmsTopWordsOf]]) and the streaming
    * grid maintenance ([[graft.streaming.EventStream]] w09). */
  private def cmsWithBuckets(df: DataFrame, depth: Int, width: Int): DataFrame = {
    def bucketSql(i: Int): String = {
      val m = s"m$i"
      val dec = (0 until 8).map { j =>
        val mult = 1L << (4 * (7 - j))
        s"(instr('0123456789abcdef', substr($m, ${j + 1}, 1)) - 1) * cast($mult as bigint)"
      }.mkString(" + ")
      s"($dec) % $width"
    }
    (0 until depth).foldLeft(df) { (d, i) =>
      d.withColumn(s"m$i", expr(s"substr(md5(concat('$i#', word)), 1, 8)"))
        .withColumn(s"b$i", expr(bucketSql(i)))
    }
  }

  /** One (hrow, bucket) increment per token per hash row — the sketch
    * update stream, usable from a batch OR a streaming plan (it is
    * narrow: tokenize, hash, explode; no aggregation). */
  private[graft] def cmsCellPairs(docs: DataFrame, depth: Int = 4,
                                  width: Int = 512): DataFrame = {
    val toks = docs
      .select(explode(split(lower(col("text")), " ")).as("word"))
      .filter(col("word").rlike("^[a-z0-9]+$"))
    val bCols = (0 until depth).map(i => col(s"b$i"))
    cmsWithBuckets(toks, depth, width)
      .select(posexplode(array(bCols: _*)).as(Seq("hrow", "bucket")))
  }

  def cmsTopWordsOf(docs: DataFrame, depth: Int = 4, width: Int = 512,
                    topK: Int = 20): DataFrame = {
    def withBuckets(df: DataFrame): DataFrame = cmsWithBuckets(df, depth, width)
    val bCols = (0 until depth).map(i => col(s"b$i"))
    val toks = docs
      .select(explode(split(lower(col("text")), " ")).as("word"))
      .filter(col("word").rlike("^[a-z0-9]+$"))
    // exact word counts are the ONE token-grain pass (eager checkpoint:
    // both the sketch build and the estimate branch read it)
    val exact = toks.groupBy("word").agg(count(lit(1)).as("exact_count"))
      .localCheckpoint()
    // CMS cells derived at the VOCAB grain (guide §2.3 — aggregate before
    // you shuffle): cell_count = Σ exact_count over the words hashing into
    // the cell, an exact integer identity with the former token-grain
    // posexplode+count (each of a word's occurrences lands in the word's
    // depth cells). The 4×md5-per-TOKEN hashing and the 4×token-grain
    // exchange collapse to vocab-grain work; the streaming grid (w09)
    // keeps the token-grain cmsCellPairs because its micro-batches must
    // increment cells without a per-batch vocabulary.
    val cells = withBuckets(exact)
      .select(col("exact_count"),
        posexplode(array(bCols: _*)).as(Seq("hrow", "bucket")))
      .groupBy("hrow", "bucket")
      .agg(sum("exact_count").as("cell_count"))
    // top-k via orderBy+limit (TakeOrderedAndProject: per-partition heaps,
    // never a single-partition sort of the vocab-grain estimate table);
    // rank is then a window over topK rows only
    val rw = Window.orderBy(col("cms_estimate").desc, col("word").asc)
    withBuckets(exact)
      .select(col("word"), col("exact_count"),
        posexplode(array(bCols: _*)).as(Seq("hrow", "bucket")))
      .join(broadcast(cells), Seq("hrow", "bucket"))
      .groupBy("word", "exact_count")
      .agg(min("cell_count").as("cms_estimate"))
      .orderBy(col("cms_estimate").desc, col("word").asc)
      .limit(topK)
      .withColumn("rank", row_number().over(rw).cast("int"))
      .select("rank", "word", "exact_count", "cms_estimate")
      .orderBy("rank")
  }

  def cmsTopWords(spark: SparkSession, dir: String): DataFrame =
    // fanOut (guide §2.5): tokenize+hash ran on the single-file scan's
    // one split — parallelize the narrow heavy stage
    cmsTopWordsOf(Tables.fanOut(Tables.documents(spark, dir)))

  /** HISTOGRAM-SKETCH quantiles (t30) — t29's companion for the other
    * streaming question, "where do the percentiles sit": a fixed-width
    * histogram (64 bins — CONSTANT memory, map-side combine collapses
    * every partition to the grid) estimates any quantile by cumulative
    * walk + linear interpolation inside the landing bin, where the exact
    * answer needs a value-grain shuffle. One-sided-bounded error: the
    * true rank-r value lives in the same bin the estimate interpolates,
    * so |est − exact| ≤ bin width by construction (spec-pinned).
    *
    * Determinism: ranks are INTEGER ceil-division (pct·n+99)÷100 — no
    * double·double products before the compare — and the interpolation
    * is one divide + one multiply on exact integers, bit-identical
    * across IEEE engines, rounded to 6dp. Exact quantiles (the
    * calibration column, d20/t29 posture) use explicit rank semantics —
    * smallest value with cumulative count ≥ r — not either engine's
    * interpolating built-in. */
  def histogramQuantilesOf(docs: DataFrame, width: Int = 16,
                           bins: Int = 64): DataFrame = {
    val pcts = Seq(10, 25, 50, 75, 90, 99)
    val hist = docs
      .select(least(expr(s"n_chars div $width"), lit(bins - 1)).as("bin"))
      .groupBy("bin").agg(count(lit(1)).as("c"))
    // 64-row and 6-row frames: the unpartitioned windows/joins below run
    // on grid-sized data regardless of corpus size
    val cw = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    val cum = hist
      .withColumn("cum", sum("c").over(cw))
      .withColumn("cumprev", col("cum") - col("c"))
    val targets = docs.selectExpr("explode(array(" +
        pcts.mkString(",") + ")) as pct").distinct()
      .crossJoin(broadcast(docs.agg(count(lit(1)).as("n"))))
      .withColumn("r", expr("(pct * n + 99) div 100"))
    val bw = Window.partitionBy("pct").orderBy("bin")
    val est = targets.join(broadcast(cum), col("cum") >= col("r"))
      .withColumn("rk", row_number().over(bw))
      .filter(col("rk") === 1)
      .withColumn("est_q", round(
        col("bin") * width +
          lit(width) * (col("r") - col("cumprev")).cast("double") / col("c"), 6))
      .select("pct", "r", "est_q")
    val vals = docs.groupBy(col("n_chars").as("v")).agg(count(lit(1)).as("vc"))
    val vw = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    val vcum = vals.withColumn("vcum", sum("vc").over(vw))
    val ew = Window.partitionBy("pct").orderBy("v")
    val exact = est.select("pct", "r")
      .join(broadcast(vcum), col("vcum") >= col("r"))
      .withColumn("rk", row_number().over(ew))
      .filter(col("rk") === 1)
      .select(col("pct"), col("v").as("exact_q"))
    est.join(exact, Seq("pct"))
      .select(col("pct").cast("int").as("pct"), col("est_q"), col("exact_q"))
      .orderBy("pct")
  }

  def histogramQuantiles(spark: SparkSession, dir: String): DataFrame =
    histogramQuantilesOf(Tables.documents(spark, dir))

  /** HYPERLOGLOG distinct-count sketch (t31; Flajolet, Fusy, Gandouet &
    * Meunier 2007) — the sketch that answers "how many distinct tokens
    * per source" WITHOUT a distinct-key shuffle, completing the sketch
    * family (membership t28, frequency t29, quantiles t30): the exact
    * answer must shuffle every distinct token; the sketch's aggregation
    * state is m=64 REGISTERS per group — map-side combine collapses every
    * partition to ≤ groups×64 rows, so the exchange is constant in corpus
    * size. Register update is max(ρ) where ρ = 1 + leading zeros of the
    * hash remainder; estimate = α·m²/Σ2^(−reg), with the standard
    * linear-counting fallback below 2.5m when empty registers remain.
    *
    * Determinism cross-engine: the hash is the t29 md5-hex idiom (bit-
    * identical), ρ comes from string position over a zero-padded BINARY
    * rendering (integer ops only — no log2 whose libm could stray near
    * 2^k boundaries), and every 2^(−reg) term is an exact dyadic double
    * (1/(1L<<reg)) whose sum of ≤64 terms ≥2⁻²⁷ is exact in ANY order —
    * the one float sum here is order-free by construction. α·m² forces
    * DOUBLE on the oracle side (DuckDB's bare 0.709·4096 is DECIMAL).
    * The exact NDV sits beside the estimate as calibration (d20/t29
    * posture); m=64 ⇒ ±1.04/√64 ≈ 13% expected relative error. */
  /** The corpus' lower-cased word tokens — shared head of the t31/t35
    * HLL pipeline. */
  private def hllTokens(docs: DataFrame): DataFrame =
    docs
      .select(col("source"), explode(split(lower(col("text")), " ")).as("word"))
      .filter(col("word").rlike("^[a-z0-9]+$"))

  /** HLL registers over `toks`, max-aggregated per (`keys`..., bucket) —
    * the whole sketch state is `keys`-groups × m rows. */
  private def hllRegistersOf(toks: DataFrame, m: Int, keys: Seq[String]): DataFrame = {
    require((m & (m - 1)) == 0 && m >= 16, s"register count must be a power of two >= 16, got $m")
    val remBits = 32 - (31 - Integer.numberOfLeadingZeros(m)) // 26 for m=64
    val dec = (0 until 8).map { j =>
      val mult = 1L << (4 * (7 - j))
      s"(instr('0123456789abcdef', substr(m8, ${j + 1}, 1)) - 1) * cast($mult as bigint)"
    }.mkString(" + ")
    toks
      .withColumn("m8", expr("substr(md5(concat('h#', word)), 1, 8)"))
      .withColumn("h", expr(dec))
      .withColumn("bucket", expr(s"h % $m"))
      .withColumn("w", expr(s"h div $m"))
      .withColumn("rho", expr(
        s"CASE WHEN w = 0 THEN ${remBits + 1} " +
          s"ELSE instr(lpad(bin(w), $remBits, '0'), '1') END"))
      .groupBy((keys :+ "bucket").map(col): _*)
      .agg(max("rho").as("reg"))
  }

  /** The standard HLL estimator over a register table, per `keys` group
    * (empty keys = one corpus-wide estimate): linear counting under the
    * small-range correction, the 0.709·m² raw form otherwise. */
  private def hllEstimateOf(regs: DataFrame, m: Int, keys: Seq[String]): DataFrame = {
    val grouped = if (keys.isEmpty) regs.groupBy() else regs.groupBy(keys.map(col): _*)
    grouped
      .agg(count(lit(1)).as("present"),
        sum(expr("1.0 / cast(shiftleft(cast(1 as bigint), reg) as double)"))
          .as("sumterm"))
      .withColumn("zeros", lit(m) - col("present"))
      .withColumn("ssum", col("sumterm") + col("zeros").cast("double"))
      .withColumn("raw", lit(0.709) * lit(m * m) / col("ssum"))
      .withColumn("hll_ndv", round(
        when(col("raw") <= lit(2.5 * m) && col("zeros") > 0,
          lit(m.toDouble) * log(lit(m.toDouble) / col("zeros")))
          .otherwise(col("raw")), 2))
  }

  def hllDistinctOf(docs: DataFrame, m: Int = 64): DataFrame = {
    val toks = hllTokens(docs)
    val est = hllEstimateOf(hllRegistersOf(toks, m, Seq("source")), m, Seq("source"))
    val exact = toks.groupBy("source").agg(countDistinct("word").as("exact_ndv"))
    est.join(exact, Seq("source"))
      .select(col("source"), lit(m).as("m"),
        col("present").cast("int").as("nonzero_registers"),
        col("hll_ndv"), col("exact_ndv"),
        round((col("hll_ndv") - col("exact_ndv")) / col("exact_ndv"), 4)
          .as("rel_err"))
      .orderBy("source")
  }

  /** HLL MERGEABILITY (t35) — the property that makes sketches THE
    * distributed cardinality primitive: per-source register tables merge
    * by per-bucket MAX, and the merged sketch is BIT-IDENTICAL to the
    * sketch computed over the whole corpus directly (max is associative
    * and commutative — this is a theorem, and the query PROVES it on the
    * data by counting register mismatches between the two derivations).
    * At 100 TB this is why NDV never needs a global re-scan: each
    * partition/source/day ships its m-row register table and the
    * coordinator folds MAX — O(m) state per shard, one tiny shuffle,
    * re-aggregatable to any grouping after the fact. */
  def hllMergeReport(spark: SparkSession, dir: String, m: Int = 64): DataFrame = {
    val toks = hllTokens(Tables.documents(spark, dir))
    val perSource = hllRegistersOf(toks, m, Seq("source"))
    val merged = perSource.groupBy("bucket").agg(max("reg").as("reg"))
    val direct = hllRegistersOf(toks, m, Seq.empty)
    val mismatches = merged.select(col("bucket"), col("reg").as("reg_m"))
      .join(direct.select(col("bucket"), col("reg").as("reg_d")),
        Seq("bucket"), "full_outer")
      .filter(col("reg_m").isNull || col("reg_d").isNull ||
        col("reg_m") =!= col("reg_d"))
      .agg(count(lit(1)).as("register_mismatches"))
    val estMerged = hllEstimateOf(merged, m, Seq.empty)
      .select(col("hll_ndv").as("merged_ndv"))
    val estDirect = hllEstimateOf(direct, m, Seq.empty)
      .select(col("hll_ndv").as("direct_ndv"))
    val exact = toks.agg(countDistinct("word").as("exact_ndv"))
    estMerged.crossJoin(estDirect).crossJoin(mismatches).crossJoin(exact)
      .select(lit(m).as("m"), col("merged_ndv"), col("direct_ndv"),
        col("register_mismatches"), col("exact_ndv"),
        round((col("merged_ndv") - col("exact_ndv")) / col("exact_ndv"), 4)
          .as("rel_err"))
  }

  def hllDistinct(spark: SparkSession, dir: String): DataFrame =
    hllDistinctOf(Tables.documents(spark, dir))

  /** SOURCE QUOTA CAP (t33) — deterministic per-source document budget:
    * every source keeps at most `quota` docs, best-first (quality band
    * 'ok' before flagged, longer before shorter, doc_id as the total
    * tie-break). This is the domain-cap curation step every large-corpus
    * recipe applies (no single crawl domain may dominate the mixture —
    * the per-domain caps of the public corpus pipelines), expressed as
    * one rank-per-group window over t02's quality signals.
    *
    * One exchange on source; the window's per-group state is a counter
    * (row_number), not a buffer. At 100 TB the source-grain skew rule
    * applies: a mega-source's partition holds that source's docs only,
    * and the rank cut discards its tail without shuffling anything
    * else. All ordering keys are integers/strings — nothing to round. */
  def sourceQuotaOf(docs: DataFrame, quota: Int = 50): DataFrame = {
    val stopList = EnStopwords.map(w => s"'$w'").mkString(", ")
    val byQuality = Window.partitionBy("source").orderBy(
      (col("quality_band") === "ok").cast("int").desc,
      col("n_tokens").desc, col("doc_id").asc)
    withToks(docs)
      .withColumn("n_tokens", size(col("toks")))
      .withColumn("stop_ratio",
        round(expr(s"size(filter(toks, w -> w in ($stopList)))").cast("double")
          / col("n_tokens"), 4))
      .withColumn("repetition_ratio",
        round(lit(1.0) - size(array_distinct(col("toks"))).cast("double")
          / col("n_tokens"), 4))
      .withColumn("quality_band",
        when(col("n_tokens") < 10, "too_short")
          .when(col("repetition_ratio") > 0.8, "repetitive")
          .when(col("stop_ratio") > 0.4, "boilerplate")
          .otherwise("ok"))
      .withColumn("rank", row_number().over(byQuality).cast("int"))
      .filter(col("rank") <= quota)
      .select("source", "rank", "doc_id", "n_tokens", "quality_band")
      .orderBy("source", "rank")
  }

  def sourceQuota(spark: SparkSession, dir: String): DataFrame =
    sourceQuotaOf(Tables.documents(spark, dir))

  /** DISTRIBUTION DRIFT (t32) — Jensen–Shannon divergence between the
    * corpus's language mix and tonight's ingest batch's: the bias monitor
    * every recurring crawl ingest runs before merging ("is the new batch
    * shifting the mixture?"). The batch is the same 1/16 md5(doc_id)
    * bucket-'f' slice as [[graft.ops.Dedup.incrementalDedupOf]], so the
    * drift report describes exactly the delta that d19/d22 dedup.
    *
    * Each side collapses to a lang-grain count first (two rows per lang
    * shuffle, not documents); shares are single exact divides; the JS
    * contribution ½·p·ln(p/m) + ½·q·ln(q/m) is one fixed double chain
    * rounded at the projection (ln + round-6, the [[idf]] discipline).
    * A lang missing on one side contributes its full ½·ln 2 mass via the
    * p=0/q=0 branches — the full-outer join + explicit zero-branch CASE
    * keeps 0·ln 0 out of the arithmetic (NaN otherwise). JSD is the
    * bounded, symmetric drift measure (≤ ln 2), so per-lang terms are
    * comparable across runs; the total is the terms' sum. */
  def distributionDriftOf(docs: DataFrame): DataFrame = {
    val sliced = docs.withColumn("is_delta",
      (substring(md5(col("doc_id").cast("string")), 1, 1) === "f").cast("int"))
    val grid = sliced.groupBy("lang")
      .agg(sum(lit(1) - col("is_delta")).as("base_n"),
        sum(col("is_delta")).as("delta_n"))
    val totals = sliced.agg(
      sum(lit(1) - col("is_delta")).as("base_total"),
      sum(col("is_delta")).as("delta_total"))
    val p = col("base_n") / col("base_total")
    val q = col("delta_n") / col("delta_total")
    val m = (p + q) / lit(2.0)
    val termP = when(col("base_n") === 0, lit(0.0))
      .otherwise(p * log(p / m) / lit(2.0))
    val termQ = when(col("delta_n") === 0, lit(0.0))
      .otherwise(q * log(q / m) / lit(2.0))
    grid.crossJoin(broadcast(totals))
      .select(col("lang"), col("base_n"), col("delta_n"),
        round(p, 6).as("base_share"),
        round(q, 6).as("delta_share"),
        round(termP + termQ, 6).as("js_term"))
      .orderBy("lang")
  }

  def distributionDrift(spark: SparkSession, dir: String): DataFrame =
    distributionDriftOf(Tables.documents(spark, dir))

  /** Per-language corpus profile (summary aggregate). */
  def langStats(spark: SparkSession, dir: String): DataFrame =
    withToks(Tables.documents(spark, dir))
      .groupBy("lang")
      .agg(
        count(lit(1)).as("docs"),
        round(avg("n_chars"), 4).as("avg_chars"),
        round(avg(size(col("toks"))), 4).as("avg_tokens"),
        countDistinct("source").as("sources"))
      .orderBy("lang")

  /** ZIPF FIT (t39) — the corpus-health check behind every token-
    * frequency plot: least-squares slope and intercept of ln(freq) on
    * ln(rank) over the `topN` most frequent words. Natural text tracks
    * slope ≈ −1 (Zipf's law); a much flatter slope flags synthetic or
    * template-flooded data, a much steeper one a collapsed vocabulary —
    * both are ingest red flags worth one cheap aggregate per corpus
    * snapshot.
    *
    * Scale shape: the frequency table aggregates with map-side combine;
    * the top-`topN` cut is orderBy+limit (TakeOrderedAndProject — each
    * task keeps its local top-N, no global sort); ranking and the
    * regression run over the BOUNDED `topN`-row survivor frame, so the
    * unpartitioned window is guard-allowed.
    *
    * Determinism: each ln rounds to 6dp via DECIMAL(18,6) and converts
    * to an exact BIGINT of MICRO-UNITS (t19's rounding discipline, then
    * integer domain); every regression sum and cross-product is integer
    * arithmetic — BIGINT per row (|x6·y6| ≤ 4e14, no overflow), widened
    * to 38-digit exact integers (DECIMAL(38,0) here, HUGEINT in the
    * oracle) for the n·Σ products — so slope and intercept are each ONE
    * double division of exact integers, rounded at the projection.
    * The micro-unit scaling cancels in the slope ratio; the intercept's
    * numerator carries one extra 1e6 factor, divided out in double by
    * both engines identically. */
  def zipfFitOf(docs: DataFrame, topN: Int = 1000): DataFrame = {
    val freq = withToks(docs).select(explode(col("toks")).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("occ"))
    val top = freq.orderBy(col("occ").desc, col("tok").asc).limit(topN)
    val w = Window.orderBy(col("occ").desc, col("tok").asc)
    def lnMicros(c: org.apache.spark.sql.Column) =
      (round(log(c.cast("double")), 6).cast("decimal(18,6)") * lit(1000000))
        .cast("long")
    val xy = top.withColumn("rnk", row_number().over(w))
      .withColumn("x6", lnMicros(col("rnk")))
      .withColumn("y6", lnMicros(col("occ")))
    val big = "decimal(38,0)"
    xy.agg(
        count(lit(1)).as("n_words"),
        sum(col("x6")).as("sx"), sum(col("y6")).as("sy"),
        sum(expr("x6 * y6")).as("sxy"), sum(expr("x6 * x6")).as("sxx"))
      .select(
        col("n_words"),
        round(
          (col("n_words").cast(big) * col("sxy").cast(big) -
            col("sx").cast(big) * col("sy").cast(big)).cast("double") /
          (col("n_words").cast(big) * col("sxx").cast(big) -
            col("sx").cast(big) * col("sx").cast(big)).cast("double"), 6)
          .as("zipf_slope"),
        round(
          (col("sxx").cast(big) * col("sy").cast(big) -
            col("sx").cast(big) * col("sxy").cast(big)).cast("double") /
          (col("n_words").cast(big) * col("sxx").cast(big) -
            col("sx").cast(big) * col("sx").cast(big)).cast("double") / 1000000.0, 6)
          .as("zipf_intercept"))
  }

  def zipfFit(spark: SparkSession, dir: String): DataFrame =
    zipfFitOf(Tables.documents(spark, dir))

  /** PERPLEXITY BUCKETS (t40) — the CCNet-style LM-quality partition
    * (Wenzek et al. 2020, "CCNet: Extracting High Quality Monolingual
    * Datasets from Web Crawl Data"): documents scored by the corpus
    * unigram model ([[unigramLogprobOf]]) and cut into quartiles of
    * average log-probability; real pipelines keep/downsample/drop by
    * bucket rather than by a hard threshold. The report is each bucket's
    * document count, token mass, and mean score — the table a data-mix
    * owner reads before choosing cut points.
    *
    * Scale shape: scoring is t19's broadcast-model pass; the quartile
    * assignment is DOC-GRAIN and therefore runs as
    * [[graft.plans.GlobalOrder.withNtile]]'s distributed two-phase rank
    * — never an unpartitioned ntile window (the q49/q54 discipline); the
    * closing aggregate is 4 groups. Mean scores sum the 4dp-rounded
    * per-doc doubles as exact decimals and divide once at the
    * projection, so bucket means are engine-identical. */
  /** Bucket assignment + rollup over an already-scored (doc_id,
    * n_tokens, avg_logprob) frame. The ntile scan reads its input four
    * times (stats, bucketing, offsets, add-back), so callers must hand
    * in a CHEAP frame — materialized or trivially recomputable — never a
    * raw scoring pipeline (the driver adapter memoizes the t19 chain;
    * 4× re-scoring measured 8 s cold where the memoized form is ~2 s). */
  def perplexityBucketsOfScored(scored: DataFrame): DataFrame =
    GlobalOrder.withNtile(scored, 4,
        Seq(col("avg_logprob").desc, col("doc_id").asc),
        negate(col("avg_logprob")), "bucket")
      .groupBy("bucket")
      .agg(
        count(lit(1)).as("docs"),
        sum(col("n_tokens")).as("tokens"),
        round(sum(col("avg_logprob").cast("decimal(18,6)")).cast("double") /
          count(lit(1)), 4).as("mean_logprob"))
      .orderBy("bucket")

  def perplexityBuckets(spark: SparkSession, dir: String): DataFrame =
    perplexityBucketsOfScored(graft.SessionMemo(spark, dir, "t40-scored") {
      unigramLogprobOf(Tables.documents(spark, dir))
    })

  /** CROSS-SPLIT LEAKAGE REPORT (t41) — the train/test-contamination
    * audit (Lee et al. 2022, "Deduplicating Training Data Makes Language
    * Models Better", found test↔train near-dup leakage in every public
    * corpus they checked): the production near-dup detector's pairs
    * (d04's MinHash-LSH, jaccard ≥ 0.5) classified by the t36 split
    * assignment of each endpoint. A (test, train) row is direct
    * evaluation contamination — the benchmark answer sits in the
    * training set near-verbatim; within-split rows are ordinary
    * duplication context. `leaked_docs` counts the distinct documents
    * touching each split-pair class.
    *
    * Scale shape: everything rides the LSH pair list (corpus-linear,
    * never all-pairs); the split label is a per-row md5 nibble; the
    * rollup is a ≤6-row aggregate. Canonicalizing (split_a, split_b) by
    * least/greatest makes the pair class order-free, so both engines
    * group identically. */
  def splitLeakage(spark: SparkSession, dir: String): DataFrame = {
    def splitOf(c: org.apache.spark.sql.Column) = {
      val h = substring(md5(c.cast("string")), 1, 1)
      when(h.between("0", "b"), "train")
        .when(h.isin("c", "d"), "val")
        .otherwise("test")
    }
    Dedup.minhashLsh(spark, dir)
      .select(col("d1"), col("d2"),
        least(splitOf(col("d1")), splitOf(col("d2"))).as("split_a"),
        greatest(splitOf(col("d1")), splitOf(col("d2"))).as("split_b"))
      .select(col("split_a"), col("split_b"),
        explode(array(col("d1"), col("d2"))).as("doc"))
      .groupBy("split_a", "split_b")
      .agg(
        expr("count(1) div 2").as("pairs"),
        countDistinct("doc").as("leaked_docs"))
      .orderBy("split_a", "split_b")
  }

  /** BM25 RETRIEVAL (t42) — the full Okapi ranking function (Robertson &
    * Zaragoza 2009): s21's lexical half upgraded from a bare IDF sum to
    * tf saturation (k1) and document-length normalization (b), the
    * scoring that actually ships in lexical retrieval stacks (Lucene,
    * Tantivy) and in RAG hybrid search. Query docs (doc_id < 10)
    * retrieve from the candidate corpus (doc_id ≥ 10) by their distinct
    * tokens; top-k per query.
    *
    * Determinism across engines: the idf term
    * ln((N - df + 0.5)/(df + 0.5) + 1) (the Lucene variant — strictly
    * positive, so stopword-heavy matches can't flip sign) is rounded to
    * 6dp; the tf factor is a pure +,*,/ chain over doubles written with
    * the identical association in the oracle (IEEE-deterministic); the
    * per-term product rounds to 6dp and sums as DECIMAL (exact,
    * order-free — t19's discipline). avgdl is ONE double division of
    * two exact integers.
    *
    * Scale shape: tf is computed once (eager localCheckpoint — two
    * consumers) with map-side combine; df aggregates FROM tf
    * (vocab-sized) and broadcasts; corpus stats are one scalar row. The
    * pair join is bounded by shared-token postings of a 10-doc query
    * set, never corpus×corpus; the per-query window is partitioned. At
    * 100 TB the postings join is the standard impact-ordered shape —
    * nothing here is corpus-quadratic. */
  def bm25(spark: SparkSession, dir: String, k: Int = 3): DataFrame = {
    // k1 = 1.2, b = 0.75 (the standard Okapi defaults). Every derived
    // constant (k1+1 = 2.2, 1-b = 0.25) is written as a LITERAL, not
    // computed: `lit(1.2 + 1.0)` rounds the double SUM (which need not
    // equal the parsed literal 2.2 at the last ulp), while both engines
    // parse the string "2.2" to the identical double.
    // fanOut (guide §2.5): the tokenize+tf stage ran on the single-file
    // scan's one split
    val docs = withToks(Tables.fanOut(Tables.documents(spark, dir)))
      .select(col("doc_id"), col("toks"), size(col("toks")).cast("bigint").as("dl"))
    val tf = docs.select(col("doc_id"), col("dl"), explode(col("toks")).as("token"))
      .groupBy("doc_id", "dl", "token")
      .agg(count(lit(1)).as("tf"))
      .localCheckpoint()
    val dfq = tf.groupBy("token").agg(count(lit(1)).as("doc_freq"))
    val stats = docs.agg(count(lit(1)).as("n_docs"), sum("dl").as("sum_dl"))
    val qtok = tf.filter(col("doc_id") < 10)
      .select(col("doc_id").as("query_id"), col("token"))
    val cand = tf.filter(col("doc_id") >= 10)
      .select(col("doc_id").as("cand_id"), col("dl"), col("token"), col("tf"))
    val avgdl = col("sum_dl").cast("double") / col("n_docs")
    val idf = round(log(
      (col("n_docs") - col("doc_freq") + lit(0.5)) / (col("doc_freq") + lit(0.5))
        + lit(1.0)), 6)
    val tff = (col("tf") * lit(2.2)) /
      (col("tf") + lit(1.2) * (lit(0.25) + lit(0.75) * (col("dl") / avgdl)))
    val w = Window.partitionBy("query_id")
      .orderBy(col("score").desc, col("cand_id").asc)
    // the query side is a fixed 10-doc token list: BROADCAST it (guide
    // §3.1) so the corpus-sized postings frame `cand` is never exchanged
    // — the former plan sort-merge-joined on token, shuffling every
    // posting row to pair it with a broadcast-sized probe set
    broadcast(qtok).join(cand, Seq("token"))
      .join(broadcast(dfq), Seq("token"))
      .crossJoin(broadcast(stats))
      .withColumn("term_w", round(idf * tff, 6).cast("decimal(18,6)"))
      .groupBy("query_id", "cand_id")
      .agg(sum("term_w").as("score"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("cand_id"),
        round(col("score").cast("double"), 6).as("bm25"),
        col("rnk").cast("int").as("rnk"))
      .orderBy("query_id", "rnk")
  }

  /** CONTENT-DEFINED CHUNK DEDUP (t44) — the storage-dedup measure under
    * CDC chunking (the FastCDC/LBFS family, Xia et al. 2016): cut each
    * document where the TOKEN HASH meets the boundary mask
    * (h % 16 == 0 — the gear-style single-hash boundary test, no min/max
    * caps), fingerprint each variable-length chunk, and report the
    * per-language chunk dedup ratio. Content-defined cuts re-align after
    * insertions where fixed windows (t10) shift — the property that makes
    * CDC the chunker in dedup storage and long-doc near-dup pipelines.
    * Token hashes reuse t10's md5-prefix decode verbatim.
    *
    * Determinism: chunk ids are integer running sums of the cut mask in
    * (doc, position) order; fingerprints are md5 of the exact chunk
    * text; the two ratios are ONE int/int double division each, rounded
    * 4dp at the final projection.
    *
    * Scale shape: ONE md5 decode per token (posexplode, then a per-row
    * boundary test), chunk ids from a PER-DOC-PARTITIONED running-sum
    * window (never a global window), and the chunk reassembly groupBy
    * shares the window's doc_id partitioning — one exchange end-to-end
    * before the per-language rollup, O(tokens) total work. (A first cut
    * computed the prefix sums as nested array HOFs over a derived `cid`
    * column; Catalyst inlines the defining expression into every lambda
    * reference site, re-evaluating the whole O(n²) prefix array — md5
    * decodes included — per (chunk, position) probe. Interpreted
    * eval measured 13+ CPU-minutes at sf0.01; the window form is
    * sub-second. Derived-array columns must never be re-referenced
    * inside per-element lambdas.) */
  def cdcChunkStats(spark: SparkSession, dir: String): DataFrame = {
    val decode = (0 until 8).map { i =>
      val mult = 1L << (4 * (7 - i))
      s"(instr('0123456789abcdef', substr(m, ${i + 1}, 1)) - 1) * cast($mult as bigint)"
    }.mkString(" + ")
    val wPrev = Window.partitionBy("doc_id").orderBy("pos")
      .rowsBetween(Window.unboundedPreceding, -1)
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"),
        posexplode(split(col("text"), " ")).as(Seq("pos", "tok")))
      .withColumn("m", md5(col("tok")))
      .withColumn("cut",
        when(expr(decode) % 16 === 0, 1).otherwise(0))
      // cuts strictly BEFORE this position = this token's chunk id
      .withColumn("cid", coalesce(sum("cut").over(wPrev), lit(0L)))
      .groupBy("doc_id", "lang", "cid")
      .agg(expr(
        "array_join(transform(array_sort(collect_list(struct(pos, tok))), s -> s.tok), ' ')")
        .as("chunk"))
      .groupBy("lang")
      .agg(
        count(lit(1)).as("chunks"),
        countDistinct(md5(col("chunk"))).as("distinct_chunks"),
        sum(size(split(col("chunk"), " "))).as("sum_toks"))
      .select(col("lang"), col("chunks"), col("distinct_chunks"),
        round((col("chunks") - col("distinct_chunks")).cast("double")
          / col("chunks"), 4).as("dup_share"),
        round(col("sum_toks").cast("double") / col("chunks"), 4)
          .as("avg_chunk_toks"))
      .orderBy("lang")
  }

  /** GOPHER-STYLE REPETITION GATE (t43) — the repetition half of the
    * Gopher quality rules (Rae et al. 2021 §A1.1): per document the
    * duplicate-unigram fraction ((n − distinct)/n) and the top-bigram
    * fraction (the most frequent 2-gram's share of all 2-grams), rolled
    * up into the per-language moderation report a filtering run reads:
    * docs, flagged docs (dup-unigram > 0.5 OR top-bigram > 0.06 — both
    * thresholds sit between the corpus median and tail, so each rule
    * fires on real rows), and the rounded means/max. Complements t06's
    * adjacent-repeat ratio: a doc can have zero adjacent repeats and
    * still be one phrase looped (top-bigram catches it).
    *
    * Determinism: each per-doc fraction is ONE int/int double division
    * rounded to 6dp and cast DECIMAL(18,6); language means are exact
    * decimal sums divided by the doc count, rounded to 4dp (t19
    * discipline). Threshold compares hit 6dp-exact decimals, identical
    * in both engines.
    *
    * Scale shape: the unigram stats are fully NARROW — `size` +
    * `array_distinct` per row, no explode, no shuffle. Only the
    * top-bigram mode aggregates, keyed on (doc_id, bigram) with
    * map-side combine — high-cardinality skew-free keys, corpus-linear.
    * The doc-grain join is co-partitioned on doc_id and the final
    * rollup is |langs| groups. Nothing here is corpus-quadratic or
    * single-partition. */
  def repetitionReport(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"), split(col("text"), " ").as("toks"))
    val uni = docs.select(
      col("doc_id"), col("lang"),
      size(col("toks")).as("n"),
      size(array_distinct(col("toks"))).as("nd"))
    val big = docs
      .select(col("doc_id"), explode(expr(
        """case when size(toks) < 2 then array()
          |else transform(sequence(1, size(toks) - 1),
          |               i -> concat(toks[i-1], ' ', toks[i])) end
          |""".stripMargin.replaceAll("\n", " "))).as("bg"))
    val bmax = big.groupBy("doc_id", "bg").agg(count(lit(1)).as("c"))
      .groupBy("doc_id").agg(max("c").as("mc"))
    val perDoc = uni.join(bmax, Seq("doc_id"), "left")
      .withColumn("duf",
        round((col("n") - col("nd")).cast("double") / col("n"), 6)
          .cast("decimal(18,6)"))
      .withColumn("tbf",
        when(col("n") < 2, lit(0d))
          .otherwise(round(coalesce(col("mc"), lit(0L)).cast("double")
            / (col("n") - 1), 6))
          .cast("decimal(18,6)"))
    perDoc.groupBy("lang")
      .agg(
        count(lit(1)).as("docs"),
        sum(when(col("duf") > 0.5 || col("tbf") > 0.06, 1L).otherwise(0L))
          .as("flagged_docs"),
        round(sum("duf").cast("double") / count(lit(1)), 4).as("avg_dup_unigram"),
        round(sum("tbf").cast("double") / count(lit(1)), 4).as("avg_top_bigram"),
        max("tbf").cast("double").as("max_top_bigram"))
      .orderBy("lang")
  }

  /** CORPUS DATA CARD (t45) — the per-(source, lang) slice summary every
    * dataset release ships (datasheet/data-card reporting): document and
    * token volumes, average length, exact-duplicate rate, and corpus
    * share. One grouped aggregate over the corpus plus a broadcast of
    * the 1-row total — no second corpus pass.
    *
    * `distinct_texts` is an EXACT per-slice distinct (one shuffle of
    * (slice, text-hash) groups); at 100 TB the drop-in replacement is
    * the t31 HLL sketch — the card's schema is the contract, exact vs
    * approximate distinct is a per-deployment accuracy choice.
    * Divisions are single IEEE divides of exact integer aggregates,
    * mirrored operand-for-operand by the oracle. */
  def dataCardOf(docs: DataFrame): DataFrame = {
    val total = docs.agg(count(lit(1)).as("corpus_docs"))
    docs
      .withColumn("n_toks", size(split(col("text"), " ")))
      .groupBy("source", "lang")
      .agg(
        count(lit(1)).as("docs"),
        sum(col("n_toks").cast("long")).as("total_tokens"),
        round(sum(length(col("text")).cast("long")) /
          count(lit(1)).cast("double"), 4).as("avg_chars"),
        countDistinct(col("text")).as("distinct_texts"))
      .crossJoin(broadcast(total))
      .withColumn("dup_rate",
        round(lit(1.0) - col("distinct_texts") / col("docs").cast("double"), 6))
      .withColumn("share_pct",
        round(col("docs") * lit(100.0) / col("corpus_docs").cast("double"), 4))
      .drop("corpus_docs")
      .orderBy("source", "lang")
  }

  def dataCard(spark: SparkSession, dir: String): DataFrame =
    dataCardOf(Tables.documents(spark, dir))

  /** GLOBAL TRAINING ORDER + SHARD MANIFEST (t46) — the layout step a
    * training pipeline runs LAST: give every document a deterministic
    * pseudo-random position, materialize the corpus as `nShards` shard
    * files in that order, and emit a manifest a trainer (or a resumed
    * re-run) can trust. "Shuffle the corpus" done naively is a global
    * sort by rand() — non-reproducible AND a sort-the-world plan. This is
    * the scalable, reproducible form:
    *
    *  - order key = md5("order|" ++ doc_id): engine-portable, uniform,
    *    and a pure function of the row — reprocessing at 100 TB
    *    reproduces the exact permutation (t09/t36's hash discipline,
    *    extended from membership to ORDER).
    *  - shard = first two key nibbles mod nShards: HASH sharding, so
    *    shard assignment needs no global coordination — one hash
    *    exchange, no range-boundary sampling, no driver state.
    *  - within-shard position = row_number over a PARTITIONED window
    *    (shard-local sort of ~1/nShards of the data each) — the global
    *    permutation is (shard, position) lexicographic, and no task ever
    *    sees more than one shard.
    *
    * The manifest pins the permutation, not just the partition: per
    * shard, the count/char mass, the first/last doc (min_by/max_by on
    * the order key), and `perm_fp` = Σ position·(doc_id mod 1000003) —
    * an order-sensitive exact-integer fingerprint (any transposition of
    * two docs with distinct residues changes it), so the oracle verifies
    * the ENTIRE within-shard ordering, not merely shard membership.
    * Exact at corpora to ~10M docs/shard (Σ pos·res < 2^63); beyond
    * that, widen the residue modulus down or fingerprint per sub-range. */
  def trainingOrderOf(docs: DataFrame, nShards: Int): DataFrame = {
    val keyed = docs
      .withColumn("okey", md5(concat(lit("order|"), col("doc_id").cast("string"))))
      .withColumn("shard",
        ((expr("instr('0123456789abcdef', substring(okey, 1, 1)) - 1") * 16 +
          expr("instr('0123456789abcdef', substring(okey, 2, 1)) - 1"))
          % nShards).cast("int"))
    val posW = Window.partitionBy("shard").orderBy(col("okey").asc, col("doc_id").asc)
    keyed
      .withColumn("position", row_number().over(posW).cast("long"))
      .groupBy("shard")
      .agg(
        count(lit(1)).as("n_docs"),
        sum("n_chars").as("sum_chars"),
        min_by(col("doc_id"), col("okey")).as("first_doc"),
        max_by(col("doc_id"), col("okey")).as("last_doc"),
        sum(col("position") * (col("doc_id") % 1000003)).as("perm_fp"))
      .orderBy("shard")
  }

  def trainingOrder(spark: SparkSession, dir: String): DataFrame =
    trainingOrderOf(Tables.documents(spark, dir), 8)

  /** CORPUS-LEVEL BOILERPLATE STRIP (t47) — the C4/RefinedWeb cleanup
    * grain no doc-level dedup catches: a chunk of text (nav bars, cookie
    * banners, license headers) that repeats across MANY documents is
    * boilerplate even though each host document is unique. The published
    * recipe (C4's "three-sentence" rule) is: count every chunk across
    * the whole corpus, mark chunks appearing in ≥ `minDocs` distinct
    * documents, and strip them from every document — a GLOBAL count, not
    * a per-doc one, which is exactly what makes it a distributed-engine
    * problem.
    *
    * Grain here = `span`-token windows (the synthetic corpus has no
    * newlines/sentence marks; real deployments swap the chunker for
    * line/sentence splits — the plan shape is identical). Plan:
    *   1. explode docs → (doc, cpos, chunk): narrow, O(corpus tokens);
    *   2. boilerplate set: groupBy(chunk).countDistinct(doc) ≥ minDocs —
    *      ONE chunk-keyed exchange with partial aggregation;
    *   3. flag-join chunks against the set on the SAME chunk key (the
    *      bp side is the post-filter survivors only), then ONE doc-grain
    *      aggregate computes totals and the strip together: collect_list
    *      skips the nulled boilerplate entries, array_sort restores
    *      chunk order without a window.
    * At 100 TB step 2's exact count can be swapped for a frequent-items
    * sketch broadcast (t29's CMS) — the contract (which chunks die) is
    * the only thing that changes engine-side.
    *
    * The per-doc `kept_fp` (md5 of the re-assembled text) pins the FULL
    * surviving content and its order, so the oracle verifies the strip
    * byte-for-byte, not just the counts. `removed_pct` is one int/int
    * IEEE divide rounded 6dp — denominators ≤ ~34 chunks cannot produce
    * a decimal half-boundary at 6dp (that needs a 2^7·5^k denominator),
    * so both engines round identically. */
  def boilerplateStripOf(docs: DataFrame, span: Int, minDocs: Int): DataFrame = {
    val docChunks = docs
      .withColumn("toks", split(col("text"), " "))
      .withColumn("n_chunks",
        ceil(size(col("toks")) / lit(span.toDouble)).cast("int"))
    // a ZERO-CHUNK doc (null text, or a chunker returning nothing) emits
    // one SENTINEL row (cpos = -1, chunk = null) instead of exploding to
    // nothing: the doc grain survives into the final aggregate without a
    // third corpus scan for an anchor frame (ADVICE r9 — the oracle's
    // doc-grain LEFT JOIN retains such docs, so the engine must too)
    val chunks = docChunks
      .withColumn("cpos",
        explode(when(col("n_chunks") > 0, sequence(lit(0), col("n_chunks") - 1))
          .otherwise(array(lit(-1)))))
      .select(
        col("doc_id"), col("n_chunks"), col("cpos"),
        when(col("cpos") >= 0,
          concat_ws(" ", slice(col("toks"), col("cpos") * span + 1, lit(span))))
          .as("chunk"))
    val bp = chunks
      .filter(col("cpos") >= 0)
      .groupBy("chunk")
      .agg(countDistinct(col("doc_id")).as("d"))
      .filter(col("d") >= minDocs)
      .select("chunk")
    // ONE doc-grain aggregate does totals AND the strip: chunks carry a
    // boilerplate flag from a left join (same chunk-keyed partitioning as
    // the bp aggregate; a sentinel's null chunk matches nothing),
    // collect_list skips the nulled boilerplate and sentinel entries, so
    // no separate per-doc totals scan or re-join is needed — two corpus
    // passes total (the global count, then the strip), which is this
    // operator's floor.
    chunks
      .join(bp.withColumn("is_bp", lit(1)), Seq("chunk"), "left")
      .groupBy("doc_id")
      .agg(
        max(col("n_chunks")).as("n_chunks"),
        sum(when(col("cpos") >= 0 && col("is_bp").isNull, 1L).otherwise(0L))
          .as("kept_chunks"),
        array_join(
          transform(
            array_sort(collect_list(
              when(col("cpos") >= 0 && col("is_bp").isNull,
                struct(col("cpos"), col("chunk"))))),
            x => x.getField("chunk")),
          " ").as("kept_text"))
      .select(
        col("doc_id"),
        col("n_chunks"),
        col("kept_chunks"),
        (col("n_chunks").cast("long") - col("kept_chunks")).as("removed_chunks"),
        md5(col("kept_text")).as("kept_fp"),
        length(col("kept_text")).as("kept_chars"),
        // explicit n_chunks=0 → NULL on BOTH engines (IEEE 0/0 is NaN in
        // Spark but NULL in DuckDB — never let the engines divide by 0)
        when(col("n_chunks") > 0,
          round((col("n_chunks").cast("long") - col("kept_chunks"))
            / col("n_chunks").cast("double"), 6)).as("removed_pct"))
      .orderBy("doc_id")
  }

  def boilerplateStrip(spark: SparkSession, dir: String): DataFrame =
    boilerplateStripOf(Tables.documents(spark, dir), span = 3, minDocs = 3)

  /** DSIR IMPORTANCE WEIGHTS (t48) — Data Selection via Importance
    * Resampling (Xie et al. 2023), the published recipe for skewing a
    * raw crawl toward a target distribution WITHOUT a learned
    * classifier: featurize every document into hashed n-gram buckets,
    * fit two bag-of-buckets models (target vs raw), and weight each
    * document by its log likelihood ratio Σ_b n_b·ln(p_tgt(b)/p_raw(b)).
    * Target here = the English slice (the "match this distribution"
    * role); features = hashed BIGRAMS mod 256 (the paper's hashed
    * n-gram featurization — collisions are part of the method, they
    * regularize exactly like a hashing vectorizer).
    *
    * Everything is exact integer counting until the very end: bucket
    * counts are plain aggregates; both totals ride one broadcast row;
    * each bucket's log-ratio is ONE ln of a ratio of exact integers
    * (products < 2^53, so the double argument is identical cross-engine)
    * rounded to 6dp; per-doc weights sum n_b·lr as exact DECIMAL (t19
    * discipline — no float accumulation anywhere). Plan: one narrow
    * bigram explode, one (doc, bucket) aggregate, bucket-grain (≤256
    * rows) model frames that BROADCAST back onto the doc-grain counts —
    * the corpus never shuffles on anything wider than (doc_id, bucket).
    * At 100 TB this is the same three-aggregate shape, with the model
    * frames still 256 rows. */
  def dsirWeightsOf(docs: DataFrame, nBuckets: Int = 256): DataFrame = {
    val decode = (0 until 8).map { i =>
      val mult = 1L << (4 * (7 - i))
      s"(instr('0123456789abcdef', substr(m, ${i + 1}, 1)) - 1) * cast($mult as bigint)"
    }.mkString(" + ")
    // eager localCheckpoint (t42's tf discipline): four consumers read
    // this frame (raw counts, target counts, totals, the scoring join) —
    // unmaterialized, each would re-run the corpus-wide bigram explode
    val perDocB = docs
      .withColumn("toks", split(col("text"), " "))
      .withColumn("g", explode(when(size(col("toks")) >= 2,
        expr("transform(sequence(0, size(toks) - 2), i -> concat(toks[i], ' ', toks[i+1]))"))
        .otherwise(array().cast("array<string>"))))
      .withColumn("m", md5(col("g")))
      .withColumn("b", (expr(decode) % nBuckets).cast("int"))
      .groupBy("doc_id", "lang", "b")
      .agg(count(lit(1)).as("n"))
      .localCheckpoint()
    val rawC = perDocB.groupBy("b").agg(sum("n").as("cr"))
    val tgtC = perDocB.filter(col("lang") === "en")
      .groupBy("b").agg(sum("n").as("ct"))
    val totals = perDocB.agg(
      sum("n").as("rtot"),
      sum(when(col("lang") === "en", col("n")).otherwise(0L)).as("ttot"))
    val lr = rawC.join(tgtC, Seq("b"), "left")
      .na.fill(0L, Seq("ct"))
      .crossJoin(broadcast(totals))
      .withColumn("lr", round(log(
        ((col("ct") + 1) * (col("rtot") + nBuckets)) /
          ((col("cr") + 1) * (col("ttot") + nBuckets))), 6))
      .select("b", "lr")
    perDocB.join(broadcast(lr), Seq("b"))
      .groupBy("doc_id", "lang")
      .agg(round(sum(col("n") * col("lr").cast("decimal(18,6)")), 4)
        .cast("double").as("weight"))
      .orderBy("doc_id")
  }

  def dsirWeights(spark: SparkSession, dir: String): DataFrame =
    // fanOut (guide §2.5): the bigram explode + md5 hashing ran on the
    // single-file scan's one split
    dsirWeightsOf(Tables.fanOut(Tables.documents(spark, dir)))

  /** Gopher/MassiveText stopword list (Rae et al. 2021, A1.1) — mirrored
    * verbatim in the t49 oracle. Distinct from [[EnStopwords]] (the
    * heuristic lang-ID list): this one is the published filter's. */
  val GopherStopwords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** GOPHER QUALITY RULES (t49) — the published MassiveText rule-based
    * filter (Rae et al. 2021 "Scaling Language Models", Appendix A1.1),
    * the de-facto first-pass web filter (reused by Falcon/RefinedWeb and
    * Dolma): per document,
    *   r_words    — word count in [50, 100,000];
    *   r_mean_len — mean word length in [3, 10] chars;
    *   r_symbol   — symbol-to-word ratio ('#' or '...' hits) ≤ 0.1;
    *   r_alpha    — ≥ 80% of words contain ≥ 1 alphabetic character;
    *   r_stop     — ≥ 2 DISTINCT Gopher stopwords present;
    * keep = every rule passes. Unlike t02's heuristic score bands, this
    * is a NAMED recipe with per-rule provenance — each flag survives to
    * the output so downstream audits can attribute every drop.
    *
    * Engine-exactness: every threshold is evaluated in INTEGER
    * cross-multiplied form (3·n ≤ chars, 10·sym ≤ n, 5·alpha ≥ 4·n) —
    * no float ratio ever compares against a boundary, so Spark and
    * DuckDB agree on every flag bit-for-bit. Plan: fully narrow per-row
    * scoring (the §t-family shape) — zero shuffles before the output
    * sort; at 100 TB scan parallelism is the only knob. */
  /** The rule flags WITHOUT the output projection/sort — the
    * frame-in/frame-out core shared by t49 and the w16 streaming gate
    * (a streaming plan cannot sort; flags are pure per-row expressions,
    * so the identical plan runs over a batch or streaming frame). */
  def gopherFlagsOf(docs: DataFrame, minStopwords: Int): DataFrame = {
    val stopList = GopherStopwords.map(w => s"'$w'").mkString(", ")
    withToks(docs)
      .withColumn("n_words", size(col("toks")).cast("long"))
      .withColumn("word_chars",
        expr("aggregate(toks, 0L, (acc, w) -> acc + length(w))"))
      .withColumn("sym_hits",
        (regexp_count(col("text"), lit("#")) +
          regexp_count(col("text"), lit("\\.\\.\\."))).cast("long"))
      .withColumn("alpha_words",
        expr("size(filter(toks, w -> w rlike '[A-Za-z]'))").cast("long"))
      .withColumn("stop_distinct",
        expr(s"size(array_intersect(array_distinct(toks), array($stopList)))").cast("long"))
      .withColumn("r_words",
        when(col("n_words").between(50L, 100000L), 1).otherwise(0))
      .withColumn("r_mean_len",
        when(lit(3L) * col("n_words") <= col("word_chars") &&
          col("word_chars") <= lit(10L) * col("n_words"), 1).otherwise(0))
      .withColumn("r_symbol",
        when(lit(10L) * col("sym_hits") <= col("n_words"), 1).otherwise(0))
      .withColumn("r_alpha",
        when(lit(5L) * col("alpha_words") >= lit(4L) * col("n_words"), 1).otherwise(0))
      .withColumn("r_stop",
        when(col("stop_distinct") >= minStopwords.toLong, 1).otherwise(0))
      .withColumn("keep",
        col("r_words") * col("r_mean_len") * col("r_symbol") *
          col("r_alpha") * col("r_stop"))
  }

  def gopherRulesOf(docs: DataFrame, minStopwords: Int = 2): DataFrame =
    gopherFlagsOf(docs, minStopwords)
      .select("doc_id", "n_words", "word_chars", "r_words", "r_mean_len",
        "r_symbol", "r_alpha", "r_stop", "keep")
      .orderBy("doc_id")

  /** Driver entry: minStopwords CORPUS-CALIBRATED to 1 (the q6_active
    * stance, SURVEY §0.2-7): the synthetic vocabulary carries only "the"
    * from the Gopher list, so the published ≥2 selects keep=0 for every
    * document — a degenerate gate row. At ≥1 the flag splits 382/118 at
    * sf0.01 and keep exercises both paths; the published default stays
    * on [[gopherRulesOf]], and the spec pins the ≥2 semantics on a
    * planted corpus that carries real stopword variety. */
  def gopherRules(spark: SparkSession, dir: String): DataFrame =
    gopherRulesOf(Tables.documents(spark, dir), minStopwords = 1)

  /** DISTILLED QUALITY FILTER (t50) — train a hashed-unigram Naive-Bayes
    * classifier AGAINST the t49 rule labels and report its held-out
    * confusion matrix: the classifier-distillation step every modern
    * corpus pipeline runs (CCNet's fastText stage, DCLM's quality
    * classifier, Llama's wiki-ref model) — an expensive/rule teacher is
    * compressed into a model cheap enough for the full crawl, and the
    * confusion matrix against held-out teacher labels is its acceptance
    * test. Teacher = [[gopherFlagsOf]] keep (minStopwords=1, the t49
    * driver stance); holdout = the md5-nibble-'f' arrival line (the
    * d19/s16 split convention); model = per-bucket log likelihood ratios
    * with Laplace +1 plus the class-prior log ratio (t48's EXACT
    * algebra: integer counts end to end, one ln per bucket rounded to
    * 6 dp, per-doc sums and the >0 decision in DECIMAL — both engines
    * agree bit-for-bit).
    *
    * Scale shape: the corpus shuffles only at (doc_id, bucket) grain
    * (t48's bound); the model is a 64-row broadcast whatever the corpus
    * size; labels and bucket counts each materialize ONCE for their
    * multiple consumers (the multi-consumer discipline). */
  /** The md5-nibble bucket decode over a hash column named `m` —
    * shared by the t48/t50 hashed-feature surfaces and the w17 per-row
    * scorer (which applies it inside a lambda over per-token hashes). */
  def bucketDecodeSql(hashVar: String): String =
    (0 until 8).map { i =>
      val mult = 1L << (4 * (7 - i))
      s"(instr('0123456789abcdef', substr($hashVar, ${i + 1}, 1)) - 1) * cast($mult as bigint)"
    }.mkString(" + ")

  /** Shared t50/w17 training inputs: teacher labels + holdout flag, and
    * the once-materialized (doc, bucket) count frame. */
  private def distilledInputs(docs: DataFrame, nBuckets: Int): (DataFrame, DataFrame) = {
    // labels feed three consumers (train counts, priors, eval join)
    val lab = gopherFlagsOf(docs, minStopwords = 1)
      .select(col("doc_id"), col("keep").as("label"))
      .withColumn("is_eval",
        substring(md5(col("doc_id").cast("string")), 1, 1) === "f")
      .localCheckpoint()
    // the corpus-wide token explode feeds train AND eval — once
    val perDocB = docs
      .withColumn("t", explode(split(col("text"), " ")))
      .withColumn("m", md5(col("t")))
      .withColumn("b", (expr(bucketDecodeSql("m")) % nBuckets).cast("int"))
      .groupBy("doc_id", "b").agg(count(lit(1)).as("n"))
      .localCheckpoint()
    (lab, perDocB)
  }

  /** The trained model: per-bucket lr frame + the prior frame. */
  private def distilledModelFrames(lab: DataFrame, perDocB: DataFrame,
                                   nBuckets: Int): (DataFrame, DataFrame) = {
    val train = perDocB.join(lab.filter(!col("is_eval")), Seq("doc_id"))
    val cnt = train.groupBy("b").agg(
      sum(when(col("label") === 1, col("n")).otherwise(0L)).as("c1"),
      sum(when(col("label") === 0, col("n")).otherwise(0L)).as("c0"))
    // full bucket spine: a bucket absent from train still scores (+1/+1)
    val spine = lab.sparkSession.range(nBuckets)
      .select(col("id").cast("int").as("b"))
    val counts = spine.join(cnt, Seq("b"), "left").na.fill(0L, Seq("c1", "c0"))
    val totals = counts.agg(sum("c1").as("t1"), sum("c0").as("t0"))
    // the four factors multiply as DOUBLE, not long: per-class token
    // totals pass ~3e9 long products silently wrap in non-ANSI Spark
    // (while DuckDB raises on BIGINT overflow — a cross-engine split).
    // Doubles are exact below 2^53, so every gated-SF value is
    // bit-identical, and beyond that the product's 2^-52 relative error
    // is invisible at 6 dp after the log (ADVICE r10).
    val model = counts.crossJoin(broadcast(totals))
      .withColumn("lr", round(log(
        ((col("c1") + 1).cast("double") * (col("t0") + nBuckets).cast("double")) /
          ((col("c0") + 1).cast("double") * (col("t1") + nBuckets).cast("double"))), 6))
      .select("b", "lr")
    val pr = lab.filter(!col("is_eval")).agg(
        sum(when(col("label") === 1, 1L).otherwise(0L)).as("n1"),
        sum(when(col("label") === 0, 1L).otherwise(0L)).as("n0"))
      .select(round(log(col("n1").cast("double") / col("n0")), 6).as("pr"))
    (model, pr)
  }

  /** The trained model COLLECTED for embedding in a per-row serving
    * expression (w17): the 6-dp lr per bucket and the prior, as EXACT
    * decimal strings (a 6-dp-rounded double's shortest representation
    * re-scaled to 6 dp is the exact decimal — the MMR argument). A
    * 64-row + 1-row collect: the broadcast-LUT discipline (PQ/ADC). */
  def distilledModel(spark: SparkSession, dir: String,
                     nBuckets: Int = 64): (Seq[String], String) = {
    val (lab, perDocB) = distilledInputs(Tables.documents(spark, dir), nBuckets)
    val (model, pr) = distilledModelFrames(lab, perDocB, nBuckets)
    def dec6(d: Double): String =
      java.math.BigDecimal.valueOf(d).setScale(6).toPlainString
    val lrByBucket = model.collect()
      .map(r => r.getAs[Int]("b") -> r.getAs[Double]("lr")).toMap
    val lrs = (0 until nBuckets).map(b => dec6(lrByBucket(b)))
    (lrs, dec6(pr.first().getDouble(0)))
  }

  private def distilledFilterCore(docs: DataFrame, nBuckets: Int): DataFrame = {
    val (lab, perDocB) = distilledInputs(docs, nBuckets)
    val (model, pr) = distilledModelFrames(lab, perDocB, nBuckets)
    perDocB.join(lab.filter(col("is_eval")), Seq("doc_id"))
      .join(broadcast(model), Seq("b"))
      .groupBy("doc_id", "label")
      .agg(sum(col("n") * col("lr").cast("decimal(18,6)")).as("s"))
      .crossJoin(broadcast(pr))
      .withColumn("predicted",
        (col("s") + col("pr").cast("decimal(18,6)") > 0).cast("int"))
      .select("doc_id", "label", "predicted")
  }

  /** Doc-grain holdout predictions (spec surface; the driver entry
    * aggregates them into the confusion matrix). */
  def distilledScoresOf(docs: DataFrame, nBuckets: Int = 64): DataFrame =
    distilledFilterCore(docs, nBuckets)

  def distilledFilterOf(docs: DataFrame, nBuckets: Int = 64): DataFrame =
    distilledFilterCore(docs, nBuckets)
      .groupBy("label", "predicted")
      .agg(count(lit(1)).as("n_docs"))
      .orderBy("label", "predicted")

  def distilledFilter(spark: SparkSession, dir: String): DataFrame =
    // fanOut (guide §2.5): featurization ran on the single-file scan's
    // one split
    distilledFilterOf(Tables.fanOut(Tables.documents(spark, dir)))

  /** FILTER OPERATING CURVE (t54) — the step between t50 (train the
    * distilled classifier) and w17 (serve it at a fixed cut): sweep the
    * decision threshold over the holdout and report the confusion
    * counts + precision/recall/F1 per θ. t50's confusion matrix is ONE
    * operating point (θ = 0, the Bayes cut); a production filter picks
    * θ from this curve to hit a precision target (drop aggressively for
    * pretraining) or a recall target (keep aggressively for scarce
    * languages) — the same detect-vs-apply separation as d23's LSH
    * threshold sweep, applied to the model family.
    *
    * Exactness: per-doc margins are the t50 DECIMAL log-odds sums
    * (order-independent, bit-identical across engines); θ is an exact
    * integer grid, so every comparison and count is exact; P/R/F1 are
    * single IEEE divides of exact BIGINTs, rounded at the final
    * projection (the t38 discipline).
    *
    * Scale shape: ONE scoring pass over the holdout (t50's plan: corpus
    * token explode + (doc,bucket) aggregate + 64-row broadcast model);
    * the sweep itself is a broadcast cross join of the doc-grain margin
    * frame against a 9-row θ grid folded straight into a 9-row
    * aggregate — the grid multiplies a DETECTION-sized frame, never the
    * token stream. */
  def distilledPrCurveOf(docs: DataFrame, nBuckets: Int = 64): DataFrame = {
    val (lab, perDocB) = distilledInputs(docs, nBuckets)
    val (model, pr) = distilledModelFrames(lab, perDocB, nBuckets)
    val scored = perDocB.join(lab.filter(col("is_eval")), Seq("doc_id"))
      .join(broadcast(model), Seq("b"))
      .groupBy("doc_id", "label")
      .agg(sum(col("n") * col("lr").cast("decimal(18,6)")).as("s"))
      .crossJoin(broadcast(pr))
      .withColumn("margin", col("s") + col("pr").cast("decimal(18,6)"))
      .select("label", "margin")
    val thetas = docs.sparkSession.range(-4, 5)
      .select((col("id") * 2).cast("int").as("theta"))
    val keep = col("margin") > col("theta")
    scored.crossJoin(broadcast(thetas))
      .groupBy("theta")
      .agg(
        sum(when(keep && col("label") === 1, 1L).otherwise(0L)).as("tp"),
        sum(when(keep && col("label") === 0, 1L).otherwise(0L)).as("fp"),
        sum(when(!keep && col("label") === 1, 1L).otherwise(0L)).as("fn"),
        sum(when(!keep && col("label") === 0, 1L).otherwise(0L)).as("tn"))
      .select(col("theta"), col("tp"), col("fp"), col("fn"), col("tn"),
        when(col("tp") + col("fp") === 0, lit(0.0))
          .otherwise(round(col("tp").cast("double") / (col("tp") + col("fp")), 6))
          .as("precision"),
        when(col("tp") + col("fn") === 0, lit(0.0))
          .otherwise(round(col("tp").cast("double") / (col("tp") + col("fn")), 6))
          .as("recall"),
        when(col("tp") * 2 + col("fp") + col("fn") === 0, lit(0.0))
          .otherwise(round((col("tp") * 2).cast("double")
            / (col("tp") * 2 + col("fp") + col("fn")), 6))
          .as("f1"))
      .orderBy("theta")
  }

  def distilledPrCurve(spark: SparkSession, dir: String): DataFrame =
    distilledPrCurveOf(Tables.documents(spark, dir))

  /** PERPLEXITY BANDS (t51) — CCNet's head/middle/tail corpus banding
    * (Wenzek et al. 2020): score every document by its mean per-token
    * negative log-likelihood under a language model trained on the
    * high-quality class, then split the corpus at the tertile scores —
    * "head" (most fluent) is what the pipeline keeps or upsamples.
    * CCNet trains KenLM on Wikipedia; here the LM is the hashed-unigram
    * Laplace model over the t49-keep teacher class (the t50
    * distillation convention — a 64-bucket model, broadcast-sized
    * whatever the corpus).
    *
    * The BAND THRESHOLDS come from a bounded md5 sample of scores (the
    * d30 discipline): percentile banding is a global rank, so
    * production computes the two tertile cut SCORES on a sample it can
    * afford, broadcasts them, and bands the corpus by comparison — the
    * only global window here runs over the bounded sample (identity at
    * every gated SF). Boundary ties band by VALUE, identically in both
    * engines.
    *
    * Exactness: one ln per bucket rounded to 6 dp, per-doc sums in
    * DECIMAL(18,6) (the t48 algebra); the per-doc mean is ONE IEEE
    * divide of the exact decimal sum by the token count (the m12
    * px_mean argument), rounded at the final projection. */
  def perplexityBandsOf(docs: DataFrame, nBuckets: Int = 64,
                        budget: Long = 5000L): DataFrame = {
    val (lab, perDocB) = distilledInputs(docs, nBuckets)
    // the LM trains on the WHOLE keep class (no holdout — t51 scores
    // the corpus, it doesn't evaluate a classifier)
    val keepCounts = perDocB
      .join(lab.filter(col("label") === 1), Seq("doc_id"))
      .groupBy("b").agg(sum("n").as("c"))
    val spine = docs.sparkSession.range(nBuckets)
      .select(col("id").cast("int").as("b"))
    val counts = spine.join(keepCounts, Seq("b"), "left").na.fill(0L, Seq("c"))
    val total = counts.agg(sum("c").as("t"))
    val lnp = counts.crossJoin(broadcast(total))
      .withColumn("lnp", round(log(
        (col("c") + 1).cast("double") / (col("t") + nBuckets)), 6))
      .select("b", "lnp")
    // the per-doc mean rounds to 6 dp in EXACT INTEGER arithmetic: the
    // decimal NLL sum is an integer of micronats (×1e6), the half-up
    // rounded mean is (2·N6 + n) div (2·n), and the score double is one
    // exact small-integer / 1e6 — an IEEE divide of the SAME two values
    // on both engines. A double divide rounded with round(,6) instead
    // lands on a half boundary ~1 in 500 docs, where Spark (shortest-
    // repr HALF_UP) and DuckDB (binary) disagree — measured here.
    val scores = perDocB
      .join(broadcast(lnp), Seq("b"))
      .groupBy("doc_id")
      .agg(
        sum("n").cast("long").as("n_tokens"),
        sum(col("n") * (-col("lnp")).cast("decimal(18,6)")).as("nll"))
      .withColumn("n6", (col("nll") * 1000000).cast("long"))
      .withColumn("score",
        expr("cast((2 * n6 + n_tokens) div (2 * n_tokens) as double)")
          / 1000000.0)
      .select("doc_id", "n_tokens", "score")
      .localCheckpoint() // feeds the sample AND the final banding
    val sampled = graft.ops.Dedup.calibrationSampleOf(scores, budget)
    val w = Window.orderBy(col("score").asc, col("doc_id").asc)
    val cuts = sampled
      .withColumn("rn", row_number().over(w))
      .withColumn("cnt", count(lit(1)).over(
        Window.partitionBy(lit(1))))
      .agg(
        max(when(col("rn") === expr("(cnt + 2) div 3"), col("score"))).as("t1"),
        max(when(col("rn") === expr("(cnt * 2 + 2) div 3"), col("score"))).as("t2"))
    scores.crossJoin(broadcast(cuts))
      .withColumn("band",
        when(col("score") <= col("t1"), "head")
          .when(col("score") <= col("t2"), "middle")
          .otherwise("tail"))
      .select("doc_id", "n_tokens", "score", "band")
      .orderBy("doc_id")
  }

  def perplexityBands(spark: SparkSession, dir: String): DataFrame =
    // fanOut (guide §2.5): per-token scoring ran on the single-file
    // scan's one split
    perplexityBandsOf(Tables.fanOut(Tables.documents(spark, dir)))

  /** t52's repeat ceiling: past ~4 epochs additional repeats of the same
    * data contribute little (Muennighoff et al. 2023, "Scaling
    * Data-Constrained Language Models" — value decays to ~0 around 4
    * repeats); the planner never allocates beyond it. */
  val MaxEpochs = 4L

  /** t52's budget multiplier: plan for a training run of 2× the corpus
    * token count — the data-constrained regime where the allocator has
    * real decisions to make (at B ≤ corpus the answer is trivially
    * epochs=1 everywhere). */
  val BudgetMultiplier = 2L

  /** EPOCH ALLOCATION under a token budget (t52) — the data-constrained
    * planning table (Muennighoff et al. 2023): given a training budget
    * of [[BudgetMultiplier]]× the corpus tokens, split it across
    * languages by α=0.5 temperature over TOKEN counts (t17's
    * floor-sqrt arithmetic at token grain — dominant sources are cut
    * hardest, low-resource ones boosted), then cap every source at
    * [[MaxEpochs]] repeats. Per language: the target, the epochs that
    * target implies, what can actually be planned under the cap, and
    * the unmet remainder — the table a training-run scheduler consumes.
    *
    * All integer arithmetic, bit-portable: weights are floor(sqrt(n))
    * (correctly-rounded IEEE sqrt of an integer, the t17 discipline);
    * the pro-rata target uses the OVERFLOW-SAFE decomposition
    * w·(B div W) + (w·(B mod W)) div W ≡ (B·w) div W — the naive
    * product wraps past ~2^63 at real corpus scales (the t50 lr
    * lesson, ADVICE r10), the decomposed form never exceeds w·W.
    *
    * Scale shape: one narrow corpus pass to per-doc token counts, one
    * lang-grain aggregate (map-side combined), then all planning on a
    * #languages-sized frame with a broadcast 1-row totals join. */
  def epochAllocationOf(docs: DataFrame): DataFrame = {
    val perLang = docs
      .select(col("lang"), size(split(col("text"), " ")).cast("long").as("nt"))
      .groupBy("lang")
      .agg(sum("nt").as("lang_tokens"))
      .withColumn("weight", floor(sqrt(col("lang_tokens"))).cast("long"))
    val totals = perLang.agg(
      (sum("lang_tokens") * lit(BudgetMultiplier)).as("budget"),
      sum("weight").as("tw"))
    perLang.crossJoin(broadcast(totals))
      .withColumn("target_tokens", expr(
        "weight * (budget div tw) + (weight * (budget % tw)) div tw"))
      .withColumn("epochs", least(lit(MaxEpochs),
        expr("(target_tokens + lang_tokens - 1) div lang_tokens")))
      .withColumn("planned_tokens",
        least(col("target_tokens"), col("lang_tokens") * lit(MaxEpochs)))
      .withColumn("unmet_tokens", col("target_tokens") - col("planned_tokens"))
      .select("lang", "lang_tokens", "weight", "target_tokens", "epochs",
        "planned_tokens", "unmet_tokens")
      .orderBy("lang")
  }

  def epochAllocation(spark: SparkSession, dir: String): DataFrame =
    epochAllocationOf(Tables.documents(spark, dir))

  /** Window width for [[substringDupOf]] — 16 whitespace tokens, the
    * granularity Lee et al. use (50 BPE tokens ≈ a few dozen words)
    * scaled to the demo corpus's short documents. */
  val SubstrWindow = 16

  /** EXACT-SUBSTRING DUPLICATION (t58) — the training-data signal of
    * Lee et al. 2022 ("Deduplicating Training Data Makes Language
    * Models Better"): document-level dedup (d01/d04) misses documents
    * that are mostly distinct but SHARE long verbatim spans
    * (boilerplate, quotations, templated text), which drive verbatim
    * memorization. Their suffix-array ExactSubstr is re-expressed at
    * WINDOW granularity: every doc's [[SubstrWindow]]-token sliding
    * windows hash (md5 of the space-joined slice — a per-row array
    * higher-order fold, NO corpus explode until the hash aggregate),
    * a window hash held by ≥2 documents is a cross-document verbatim
    * span, and each document reports how much of it is such shared
    * material. `dup_permille = (1000·dup_windows) div n_windows` stays
    * in exact integer math (no cross-engine rounding surface); the
    * verdict bands are the paper's action — drop (≥50% duplicated),
    * trim (≥20%: cut the spans, keep the rest), keep.
    *
    * Scale shape: per-doc DISTINCT window hashes (array_distinct caps a
    * doc's contribution at its distinct-span count), ONE hash-partition
    * aggregate over uniform 16-char md5-prefix keys with map-side
    * combine, one semi-join back — the d01 exact-dedup cost class, paid
    * at window grain. The windows frame is eagerly checkpointed for its
    * two consumers (the hash pass runs ONCE). At 100 TB the hash
    * becomes xxhash64 (8-byte binary keys — the 16-hex-char prefix here
    * keeps the oracle replayable while halving shuffle width vs full
    * md5); full suffix-array exactness (arbitrary-length spans)
    * is the single-node specialist's job — the window form is what
    * distributes. Docs shorter than the window carry no signal and are
    * excluded by contract (mirrored in the oracle). */
  def substringDupOf(docs: DataFrame, w: Int = SubstrWindow): DataFrame = {
    val wins = docs
      .select(col("doc_id"), split(lower(col("text")), " ").as("toks"))
      .filter(size(col("toks")) >= w)
      .withColumn("whs", expr(
        s"array_distinct(transform(sequence(1, size(toks) - ${w - 1}), " +
          s"i -> substring(md5(array_join(slice(toks, i, $w), ' ')), 1, 16)))"))
      .select(col("doc_id"), col("whs"))
      .localCheckpoint()
    val ex = wins.select(col("doc_id"), explode(col("whs")).as("wh"))
    // whs is distinct PER DOC, so count(*) per hash = #docs holding it
    val shared = ex.groupBy("wh").agg(count(lit(1)).as("docs"))
      .filter(col("docs") >= 2).select("wh")
    val dup = ex.join(shared, Seq("wh"), "left_semi")
      .groupBy("doc_id").agg(count(lit(1)).as("dup_w"))
    wins.select(col("doc_id"), size(col("whs")).cast("long").as("n_windows"))
      .join(dup, Seq("doc_id"), "left_outer")
      .withColumn("dup_windows", coalesce(col("dup_w"), lit(0L)))
      .withColumn("dup_permille",
        expr("cast((1000 * dup_windows) div n_windows as bigint)"))
      .withColumn("verdict",
        when(col("dup_permille") >= 500, lit("drop"))
          .when(col("dup_permille") >= 200, lit("trim"))
          .otherwise(lit("keep")))
      .select("doc_id", "n_windows", "dup_windows", "dup_permille", "verdict")
      .orderBy("doc_id")
  }

  def substringDup(spark: SparkSession, dir: String): DataFrame =
    // fanOut (guide §2.5): the suffix-window scan ran on the single-file
    // scan's one split
    substringDupOf(Tables.fanOut(Tables.documents(spark, dir)))
}
