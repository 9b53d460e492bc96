package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Edge semantics of the composed as-of join: inclusive <= matching,
  * most-recent-wins, null when no prior right row, key isolation. */
class AsOfJoinSpec extends AnyFunSuite with BeforeAndAfterAll {

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

  test("as-of picks the most recent right row at-or-before each left row") {
    val s = spark; import s.implicits._
    val left = Seq(
      (1L, 100L, "p1"), // after r at 50 and 90 → matches 90
      (1L, 90L, "p2"),  // exactly at r ts 90 → inclusive match
      (1L, 40L, "p3"),  // before any r → null
      (2L, 100L, "p4")  // key 2 has no right rows at all → null
    ).toDF("k", "ts", "left_id")
    val right = Seq(
      (1L, 50L, "r50"),
      (1L, 90L, "r90")
    ).toDF("k", "ts", "right_id")
    val out = AsOfJoin.asOf(left, right, "k", Seq("right_id"))
      .select("left_id", "right_id")
      .collect().map(r => r.getString(0) -> Option(r.getString(1))).toMap
    assert(out("p1") === Some("r90"))
    assert(out("p2") === Some("r90")) // inclusive: right at equal ts wins
    assert(out("p3") === None)
    assert(out("p4") === None)        // keys never bleed across partitions
    assert(out.size === 4)            // exactly one output row per left row
  }
}
