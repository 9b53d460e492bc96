package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
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

  test("nearest picks the closer side, past wins distance ties, and " +
       "equal-ts rights resolve to the largest tie id in both directions") {
    val s = spark; import s.implicits._
    val left = Seq(
      (1L, 100L, "p1"), // rights at 90 and 120: past gap 10 < future 20 → r90
      (1L, 115L, "p2"), // past gap 25 vs future gap 5 → r120
      (1L, 105L, "p3"), // gap 15 BOTH ways → past wins → r90
      (1L, 40L, "p4"),  // before every right → forward-only → r90
      (1L, 200L, "p5"), // after every right → backward-only → r120
      (2L, 100L, "p6"), // key 2: only an equal-ts tie pair → largest id
      (3L, 100L, "p7")  // key 3 has no rights → null
    ).toDF("k", "ts", "left_id")
    val right = Seq(
      (1L, 90L, 1L, "r90"),
      (1L, 120L, 2L, "r120"),
      (2L, 100L, 3L, "rA"),
      (2L, 100L, 4L, "rB")  // same ts, larger id → must win both directions
    ).toDF("k", "ts", "rid", "right_id")
      .withColumn("rts", org.apache.spark.sql.functions.col("ts"))
    val out = AsOfJoin.nearest(left, right, "k",
        Seq("right_id", "rts"), rightTs = "rts", rightTie = "rid")
      .select("left_id", "right_id")
      .collect().map(r => r.getString(0) -> Option(r.getString(1))).toMap
    assert(out("p1") === Some("r90"))
    assert(out("p2") === Some("r120"))
    assert(out("p3") === Some("r90"))  // tie → past
    assert(out("p4") === Some("r90"))  // forward-only edge
    assert(out("p5") === Some("r120")) // backward-only edge
    assert(out("p6") === Some("rB"))   // equal-ts tie → largest rid
    assert(out("p7") === None)
    assert(out.size === 7)
  }

  test("property: nearest ≡ brute force on tie-heavy random data — " +
       "nearer side, past-on-tie, largest-id-on-equal-ts, per-key isolation") {
    val s = spark; import s.implicits._
    // Tiny key/ts domains force dense collisions: many equal-ts right
    // rows, many exact-distance ties, keys with rights on only one side.
    val pairGen = for {
      k <- Gen.choose(1L, 4L); ts <- Gen.choose(0L, 15L)
    } yield (k, ts)
    val dataGen = for {
      ls <- Gen.listOfN(80, pairGen)
      rs <- Gen.listOfN(40, pairGen)
    } yield (ls, rs)
    (1 to 3).foreach { round =>
      val (ls, rs) = dataGen(Gen.Parameters.default, Seed(round * 7919L)).get
      val leftRows = ls.zipWithIndex.map { case ((k, ts), i) => (k, ts, s"p$i") }
      val rightRows = rs.zipWithIndex.map { case ((k, ts), i) =>
        (k, ts, i.toLong, s"r$i") }
      // brute-force reference implementing the documented tie rules
      val expected = leftRows.map { case (k, ts, lid) =>
        val cand = rightRows.filter(_._1 == k)
        val bwd = cand.filter(_._2 <= ts)
          .sortBy(r => (r._2, r._3)).lastOption // max (ts, rid)
        val fwd = cand.filter(_._2 >= ts) match {
          case Nil => None
          case xs =>
            val minTs = xs.map(_._2).min // min ts, then max rid
            Some(xs.filter(_._2 == minTs).maxBy(_._3))
        }
        val pick = (bwd, fwd) match {
          case (b, None) => b
          case (None, f) => f
          case (Some(b), Some(f)) =>
            if (ts - b._2 <= f._2 - ts) Some(b) else Some(f)
        }
        lid -> pick.map(_._4)
      }.toMap
      val out = AsOfJoin.nearest(
          leftRows.toDF("k", "ts", "left_id"),
          rightRows.toDF("k", "ts", "rid", "right_id")
            .withColumn("rts", org.apache.spark.sql.functions.col("ts")),
          "k", Seq("right_id", "rts"), rightTs = "rts", rightTie = "rid")
        .select("left_id", "right_id")
        .collect().map(r => r.getString(0) -> Option(r.getString(1))).toMap
      assert(out === expected, s"round $round diverged from brute force")
    }
  }

  test("interpolate: linear between neighbours, exact hit, clamp, null") {
    val s = spark; import s.implicits._
    val left = Seq(
      (1L, 100L, "p1"), // between (50, 10.0) and (150, 30.0) → 20.0
      (1L, 50L, "p2"),  // exact hit on the right row at 50 → 10.0
      (1L, 25L, "p3"),  // before the first right row → clamp to 10.0
      (1L, 175L, "p4"), // after the last right row → clamp to 30.0
      (1L, 75L, "p5"),  // quarter point: 10 + 20·(25/100) = 15.0
      (2L, 100L, "p6")  // key 2 has no right rows → null
    ).toDF("k", "ts", "left_id")
    val right = Seq(
      (1L, 50L, 10.0),
      (1L, 150L, 30.0)
    ).toDF("k", "ts", "v")
    val out = AsOfJoin.interpolate(left, right, "k", "v")
      .select("left_id", "interp")
      .collect().map(r => r.getString(0) ->
        (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(out("p1") === Some(20.0))
    assert(out("p2") === Some(10.0))
    assert(out("p3") === Some(10.0))
    assert(out("p4") === Some(30.0))
    assert(out("p5") === Some(15.0))
    assert(out("p6") === None)
    assert(out.size === 6)
  }

  test("property: interpolate ≡ brute force on tie-free random series — " +
       "straddle math, clamps, and key isolation") {
    val s = spark; import s.implicits._
    val pairGen = for {
      u <- Gen.choose(1L, 4L); ts <- Gen.choose(0L, 40L)
    } yield (u, ts)
    val dataGen = for {
      ls <- Gen.listOfN(50, pairGen)
      rs <- Gen.listOfN(30, pairGen)
    } yield (ls, rs)
    (1 to 3).foreach { round =>
      val (ls, rs) = dataGen(Gen.Parameters.default, Seed(round * 7919L)).get
      val left = ls.zipWithIndex.map { case ((u, ts), i) => (u, ts, 100L + i) }
      // collapse right ties up front (the operator contract: per-(key, ts)
      // unique), deterministic synthetic values
      val right = rs.distinct.map { case (u, ts) => (u, ts, (u * 31 + ts).toDouble / 7.0) }
      val rByKey = right.groupBy(_._1)
      val expected = left.map { case (u, t, id) =>
        val series = rByKey.getOrElse(u, Nil)
        val prev = series.filter(_._2 <= t).sortBy(_._2).lastOption
        val next = series.filter(_._2 >= t).sortBy(_._2).headOption
        val v = (prev, next) match {
          case (None, None) => None
          case (Some((_, _, pv)), None) => Some(pv)
          case (None, Some((_, _, nv))) => Some(nv)
          case (Some((_, pt, pv)), Some((_, nt, nv))) =>
            if (nt == pt) Some(pv)
            else Some(pv + (nv - pv) * ((t - pt).toDouble / (nt - pt).toDouble))
        }
        id -> v
      }.toMap
      val out = AsOfJoin.interpolate(
          left.toDF("k", "ts", "left_id"), right.toDF("k", "ts", "v"),
          "k", "v")
        .select("left_id", "interp")
        .collect().map(r => r.getLong(0) ->
          (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
      assert(out === expected, s"round $round diverged from brute force")
    }
  }

  test("property: k-nearest ≡ brute force on tie-heavy random data — " +
       "equal-ts collapse to max id, |gap| order, past-on-tie, k cutoff") {
    val s = spark; import s.implicits._
    val k = 2
    val pairGen = for {
      u <- Gen.choose(1L, 4L); ts <- Gen.choose(0L, 15L)
    } yield (u, ts)
    val dataGen = for {
      ps <- Gen.listOfN(40, pairGen)
      cs <- Gen.listOfN(60, pairGen)
    } yield (ps, cs)
    (1 to 3).foreach { round =>
      val (ps, cs) = dataGen(Gen.Parameters.default, Seed(round * 104729L)).get
      val purchases = ps.zipWithIndex.map { case ((u, ts), i) =>
        (u, ts, 1000L + i) }
      val clicks = cs.zipWithIndex.map { case ((u, ts), i) =>
        (u, ts, 2000L + i) }
      // brute force over the documented semantics: equal-ts clicks
      // collapse to their max id first, then rank by (|gap|, past-first)
      // — total because collapsed times are distinct per direction
      val collapsed = clicks.groupBy(c => (c._1, c._2))
        .map { case ((u, ts), xs) => (u, ts, xs.map(_._3).max) }.toSeq
      val expected = purchases.flatMap { case (u, pts, pid) =>
        collapsed.filter(_._1 == u)
          .sortBy { case (_, cts, _) =>
            (math.abs(cts - pts), if (cts <= pts) 0 else 1) }
          .take(k).zipWithIndex
          .map { case ((_, cts, cid), r) => (pid, r + 1, cid, cts - pts) }
      }.toSet
      val out = AsOfJoin.kNearestClicksOf(
          purchases.toDF("user_id", "p_us", "purchase_id"),
          clicks.toDF("user_id", "c_us", "event_id"), k)
        .select("purchase_id", "rank", "click_id", "gap_us")
        .collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
        .toSet
      assert(out === expected, s"round $round diverged from brute force")
    }
  }
}
