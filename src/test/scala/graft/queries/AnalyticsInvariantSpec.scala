package graft.queries

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Algebraic invariants of the round-5 analytics operators — properties
  * the DuckDB hash gate cannot see break INDEPENDENTLY of a matching
  * oracle (both sides could drift together under a refactor of the shared
  * definition), checked against the real sf0.001 tables. */
class AnalyticsInvariantSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val dir = "/root/testdata/sf0.001"
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

  test("q47 EWMA: every forecast lies within the [min, max] of any 8 " +
       "trailing observations — convex weights cannot extrapolate") {
    import org.apache.spark.sql.functions._
    val daily = graft.Tables.eventsUs(spark, dir)
      .groupBy(col("event_type"), expr("ts_us div 86400000000").as("day"))
      .agg(count(lit(1)).as("events"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("event_type").orderBy("day").rowsBetween(-8, -1)
    val bounds = daily
      .withColumn("lo", min("events").over(w))
      .withColumn("hi", max("events").over(w))
      .select("event_type", "day", "lo", "hi")
    val joined = Relational.q47EwmaForecast(spark, dir)
      .join(bounds, Seq("event_type", "day"))
      .collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      val f = r.getAs[Double]("forecast")
      assert(f >= r.getAs[Long]("lo") - 1e-6 && f <= r.getAs[Long]("hi") + 1e-6,
        s"forecast $f escaped [${r.getAs[Long]("lo")}, ${r.getAs[Long]("hi")}] " +
          s"at ${r.getAs[String]("event_type")}/${r.getAs[Long]("day")}")
      assert(math.abs(r.getAs[Long]("events") - f - r.getAs[Double]("residual")) < 1e-5,
        "residual is not events - forecast")
    }
  }

  test("q50 transition matrix: rows are stochastic (P(next|from) sums to 1 " +
       "per from_type) and shares sum to 1 overall") {
    val rows = Relational.q50EventTransitions(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[String]("from_type")).foreach { case (ft, rs) =>
      val p = rs.map(_.getAs[Double]("p_next")).sum
      assert(math.abs(p - 1.0) < 1e-4, s"row $ft sums to $p")
    }
    val s = rows.map(_.getAs[Double]("share")).sum
    assert(math.abs(s - 1.0) < 1e-4, s"shares sum to $s")
  }

  test("q51 A/B: arms partition the user population and z matches the " +
       "hand-computed pooled statistic") {
    import org.apache.spark.sql.functions._
    val r = Relational.q51AbTest(spark, dir).collect()(0)
    val users = graft.Tables.events(spark, dir)
      .select(countDistinct("user_id")).first().getLong(0)
    val (na, nb) = (r.getAs[Long]("n_a"), r.getAs[Long]("n_b"))
    assert(na + nb === users, "arms must partition the users")
    assert(na > 0 && nb > 0)
    val (ca, cb) = (r.getAs[Long]("conv_a"), r.getAs[Long]("conv_b"))
    val (ra, rb) = (ca.toDouble / na, cb.toDouble / nb)
    val pool = (ca + cb).toDouble / (na + nb)
    val z = (rb - ra) / math.sqrt(pool * (1 - pool) * (1.0 / na + 1.0 / nb))
    assert(math.abs(r.getAs[Double]("z_score") - z) < 1e-5,
      s"z ${r.getAs[Double]("z_score")} vs recomputed $z")
  }

  test("t32 drift: JS terms are non-negative (log-sum inequality) and each " +
       "side's shares sum to 1") {
    val rows = graft.ops.TextAnalysis.distributionDrift(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Double]("js_term") >= -1e-9,
        s"negative JS term for ${r.getAs[String]("lang")}")
    }
    val p = rows.map(_.getAs[Double]("base_share")).sum
    val q = rows.map(_.getAs[Double]("delta_share")).sum
    assert(math.abs(p - 1.0) < 1e-4 && math.abs(q - 1.0) < 1e-4,
      s"share columns sum to ($p, $q)")
  }

  test("q48 depth curve: session count equals the w06 session table's total " +
       "and converting <= sessions per depth") {
    val depth = Relational.q48SessionDepth(spark, dir).collect()
    val sessions = graft.streaming.EventStream.sessionStats(spark, dir).count()
    assert(depth.map(_.getAs[Long]("sessions")).sum === sessions,
      "depth rollup must partition the session table")
    depth.foreach { r =>
      assert(r.getAs[Long]("converting") <= r.getAs[Long]("sessions"))
      val rate = r.getAs[Double]("conversion_rate")
      assert(rate >= 0.0 && rate <= 1.0)
    }
  }

  test("q43 basket cap: a power-user basket is capped to its top-support " +
       "items with exact drop accounting, pairs bounded by the cap") {
    val s2 = spark; import s2.implicits._
    import org.apache.spark.sql.functions._
    // one hot basket of 100 items (ids 0..99) + 50 normal baskets that
    // make higher item ids more frequent (support of pk = pk % 50 spread)
    val hot = (0L until 100L).map(pk => (1000L, pk))
    val normal = for { o <- 0L until 50L; pk <- Seq(o, o + 50L) } yield (o, pk)
    val items = (hot ++ normal).toDF("ok", "pk")
    val deg = items.groupBy("pk").agg(count(lit(1)).as("sup"))
    val cap = 40
    val capped = Relational.cappedBaskets(items, deg, cap)
    val hotKept = capped.filter(col("ok") === 1000L).collect().map(_.getLong(1)).toSet
    // drop accounting: exactly cap of 100 survive, 60 dropped
    assert(hotKept.size === cap)
    // the keepers are the HIGHEST-support items (sup 2 beats sup 1;
    // pk tie-break ascending): all 100 hot-basket items have sup 2
    // (one hot + one normal occurrence), so the cap keeps pk 0..39
    assert(hotKept === (0L until cap.toLong).toSet)
    // normal baskets are untouched (width 2 << cap)
    assert(capped.filter(col("ok") < 1000L).count() === normal.size.toLong)
    // and the pair join is bounded by cap*(cap-1)/2 for the hot basket,
    // never 100*99/2
    val hotPairs = Relational.basketPairs(capped.filter(col("ok") === 1000L), 1)
      .count()
    assert(hotPairs === cap.toLong * (cap - 1) / 2)
  }
}
