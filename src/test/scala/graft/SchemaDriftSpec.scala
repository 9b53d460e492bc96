package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Footer-probe drift guard for EVERY driver table (VERDICT r6 item 8):
  * round 5 lost 15 surfaces to a silent physical-type drift in ONE
  * column (events.ts: int64-nanos → timestamp[us]); TsDriftSpec covers
  * that column's normalizer, and this spec pins the rest of the schema
  * contract, so the NEXT regeneration drift fails loudly here — one
  * spec naming the table and column — instead of as a scatter of
  * mysterious downstream hash mismatches.
  *
  * Contract per column: the exact Spark type the engine's queries
  * consume today, with a documented alternatives set where a normalizer
  * genuinely handles more than one physical form (events.ts; the
  * timestamp columns accept TZ and NTZ — session TZ is pinned UTC so
  * either decodes to the same wall-clock). EXTRA columns are allowed
  * (additive drift is benign); a missing column or a changed type is
  * not. */
class SchemaDriftSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val dir = "/root/testdata/sf0.001"
  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private val Ts: Set[DataType] = Set(TimestampNTZType, TimestampType)

  /** table -> (column -> allowed physical types). */
  private val contract: Map[String, Map[String, Set[DataType]]] = Map(
    "region" -> Map(
      "r_regionkey" -> Set(IntegerType), "r_name" -> Set(StringType)),
    "nation" -> Map(
      "n_nationkey" -> Set(IntegerType), "n_name" -> Set(StringType),
      "n_regionkey" -> Set(IntegerType)),
    "customer" -> Map(
      "c_custkey" -> Set(LongType), "c_name" -> Set(StringType),
      "c_nationkey" -> Set(IntegerType), "c_acctbal" -> Set(DoubleType),
      "c_mktsegment" -> Set(StringType)),
    "supplier" -> Map(
      "s_suppkey" -> Set(LongType), "s_name" -> Set(StringType),
      "s_nationkey" -> Set(IntegerType), "s_acctbal" -> Set(DoubleType)),
    "part" -> Map(
      "p_partkey" -> Set(LongType), "p_name" -> Set(StringType),
      "p_brand" -> Set(StringType), "p_type" -> Set(StringType),
      "p_size" -> Set(IntegerType), "p_retailprice" -> Set(DoubleType)),
    "orders" -> Map(
      "o_orderkey" -> Set(LongType), "o_custkey" -> Set(LongType),
      "o_orderstatus" -> Set(StringType), "o_totalprice" -> Set(DoubleType),
      "o_orderdate" -> Ts, "o_orderpriority" -> Set(StringType)),
    "lineitem" -> Map(
      "l_orderkey" -> Set(LongType), "l_partkey" -> Set(LongType),
      "l_suppkey" -> Set(LongType), "l_linenumber" -> Set(IntegerType),
      "l_quantity" -> Set(DoubleType), "l_extendedprice" -> Set(DoubleType),
      "l_discount" -> Set(DoubleType), "l_tax" -> Set(DoubleType),
      "l_returnflag" -> Set(StringType), "l_linestatus" -> Set(StringType),
      "l_shipdate" -> Ts),
    "events" -> Map(
      "event_id" -> Set(LongType),
      // both live forms of the r5 drift; Tables.tsUs/eventTime normalize
      "ts" -> (Ts + LongType),
      "user_id" -> Set(LongType), "event_type" -> Set(StringType),
      "value" -> Set(DoubleType), "props" -> Set(StringType)),
    "documents" -> Map(
      "doc_id" -> Set(LongType), "text" -> Set(StringType),
      "lang" -> Set(StringType), "source" -> Set(StringType),
      "n_chars" -> Set(LongType)),
    "embeddings" -> Map(
      "vec_id" -> Set(LongType),
      "embedding" -> Set(ArrayType(FloatType), ArrayType(FloatType, false)),
      "label" -> Set(IntegerType)))

  test("every driver table matches the engine's column-type contract") {
    val drifts = contract.toSeq.sortBy(_._1).flatMap { case (table, cols) =>
      val schema = Tables(spark, dir, table).schema
      val byName = schema.fields.map(f => f.name -> f.dataType).toMap
      cols.toSeq.sortBy(_._1).flatMap { case (name, allowed) =>
        byName.get(name) match {
          case None =>
            Some(s"$table.$name: MISSING (driver regeneration dropped it?)")
          case Some(t) if !allowed(t) =>
            Some(s"$table.$name: drifted to $t (engine consumes ${allowed.mkString("/")})")
          case _ => None
        }
      }
    }
    assert(drifts.isEmpty,
      s"\ndriver testdata drifted — fix the Tables normalizers/consumers " +
        s"BEFORE chasing downstream hash mismatches:\n${drifts.mkString("\n")}")
  }

  test("the contract covers every table the engine reads") {
    val tables = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    assert(contract.keySet === tables.toSet)
  }
}
