package graft.sources.gen

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 TableProvider: a deterministic synthetic-corpus
  * GENERATOR source (`spark.read.format("graft-corpus")`) — the
  * load-generator every 100 TB pipeline needs for soak tests, written as
  * a first-class connector instead of a driver-side `spark.range`+UDF.
  *
  * The point is the connector machinery, demonstrated end-to-end:
  *
  *  - '''Partition planning''': `planInputPartitions` splits the id range
  *    into `slices` independent [[RangeSlice]]s — on a 1000-executor
  *    cluster each slice generates in parallel with zero coordination
  *    (the same contract a real source's file/split planning gives).
  *  - '''Column pruning''' (`SupportsPushDownRequiredColumns`): the
  *    reader materializes ONLY requested columns — `select(doc_id)`
  *    never pays text generation (md5 per token). `.explain` shows the
  *    pruned `ReadSchema`, like a parquet scan.
  *  - '''Filter pushdown''' (`SupportsPushDownFilters`): doc_id range
  *    predicates tighten the generated range AT THE SOURCE — the
  *    generator's analog of partition pruning; rows outside the bounds
  *    are never produced. Accepted filters disappear from the post-scan
  *    Filter (spec-asserted); everything else is reported back as
  *    residual for Spark to evaluate.
  *
  * Row content is engine-portable arithmetic (mirrored 1:1 by the DuckDB
  * oracle from `range()`): doc_id = i; lang = langs[i % 5];
  * text = (i % 7 + 3) tokens, token j = first 5 md5 hex chars of
  * "i_j"; n_chars = length(text).
  *
  * Options: `rows` (default 1000), `slices` (default 8).
  */
class SyntheticCorpusSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-corpus"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SyntheticCorpus.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new SyntheticCorpusTable(
      properties.getOrDefault("rows", "1000").toLong,
      properties.getOrDefault("slices", "8").toInt)
}

object SyntheticCorpus {
  val schema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("lang", StringType, nullable = false),
    StructField("text", StringType, nullable = false),
    StructField("n_chars", IntegerType, nullable = false)))

  val langs: Array[String] = Array("en", "de", "fr", "es", "und")

  def textOf(i: Long): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    (0 until (i % 7 + 3).toInt).map { j =>
      md.digest(s"${i}_$j".getBytes("UTF-8"))
        .take(3).map(b => f"$b%02x").mkString.substring(0, 5)
    }.mkString(" ")
  }

  /** Driver-contract query (f02): a bounded scan through the connector —
    * the doc_id range predicate lands in the source (pushdown tightens
    * the generated range to [100, 300)), full row content downstream.
    * sfDir is ignored: the source generates, it doesn't read. */
  def scanQuery(spark: org.apache.spark.sql.SparkSession): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.col
    spark.read.format("graft-corpus")
      .option("rows", 500).option("slices", 8).load()
      .filter(col("doc_id") >= 100 && col("doc_id") < 300)
      .select("doc_id", "lang", "text", "n_chars")
      .orderBy("doc_id")
  }
}

class SyntheticCorpusTable(rows: Long, slices: Int) extends Table with SupportsRead {
  override def name(): String = s"graft_corpus($rows)"
  override def schema(): StructType = SyntheticCorpus.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new SyntheticScanBuilder(rows, slices)
}

class SyntheticScanBuilder(rows: Long, slices: Int) extends ScanBuilder
    with SupportsPushDownRequiredColumns with SupportsPushDownFilters {

  private var required: StructType = SyntheticCorpus.schema
  private var lo = 0L
  private var hi = rows
  private var accepted = Array.empty[Filter]

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  private def asLong(v: Any): Option[Long] = v match {
    case n: java.lang.Number => Some(n.longValue())
    case _ => None
  }

  /** doc_id range predicates tighten [lo, hi) at the source; anything
    * else is residual. Returns the filters Spark must still evaluate. */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val residual = filters.filter {
      case GreaterThan("doc_id", v) if asLong(v).isDefined =>
        lo = math.max(lo, asLong(v).get + 1); false
      case GreaterThanOrEqual("doc_id", v) if asLong(v).isDefined =>
        lo = math.max(lo, asLong(v).get); false
      case LessThan("doc_id", v) if asLong(v).isDefined =>
        hi = math.min(hi, asLong(v).get); false
      case LessThanOrEqual("doc_id", v) if asLong(v).isDefined =>
        hi = math.min(hi, asLong(v).get + 1); false
      case EqualTo("doc_id", v) if asLong(v).isDefined =>
        lo = math.max(lo, asLong(v).get); hi = math.min(hi, asLong(v).get + 1); false
      case _ => true
    }
    accepted = filters.diff(residual)
    residual
  }

  override def pushedFilters(): Array[Filter] = accepted

  override def build(): Scan =
    new SyntheticScan(lo, math.max(lo, hi), slices, required)
}

class SyntheticScan(lo: Long, hi: Long, slices: Int, required: StructType)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-corpus [$lo, $hi) slices=$slices cols=${required.fieldNames.mkString(",")}"

  override def planInputPartitions(): Array[InputPartition] = {
    val n = math.max(1, slices)
    val total = hi - lo
    (0 until n).flatMap { s =>
      val start = lo + total * s / n
      val end = lo + total * (s + 1) / n
      if (end > start) Some(RangeSlice(start, end)) else None
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new SyntheticReaderFactory(required)
}

case class RangeSlice(start: Long, end: Long) extends InputPartition

class SyntheticReaderFactory(required: StructType) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new SyntheticReader(partition.asInstanceOf[RangeSlice], required)
}

class SyntheticReader(slice: RangeSlice, required: StructType)
    extends PartitionReader[InternalRow] {
  private var i = slice.start - 1

  override def next(): Boolean = { i += 1; i < slice.end }

  override def get(): InternalRow = {
    // text generated at most once per row, and ONLY if text/n_chars were
    // requested — a pruned scan never pays the md5-per-token cost
    lazy val text = SyntheticCorpus.textOf(i)
    InternalRow.fromSeq(required.fields.toSeq.map(_.name match {
      case "doc_id" => i
      case "lang" => UTF8String.fromString(SyntheticCorpus.langs((i % 5).toInt))
      case "text" => UTF8String.fromString(text)
      case "n_chars" => text.length
    }))
  }

  override def close(): Unit = ()
}
