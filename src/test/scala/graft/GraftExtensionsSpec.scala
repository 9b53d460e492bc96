package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** spark.sql.extensions=graft.GraftExtensions wires the custom function
  * and optimizer rule into a fresh session with no user code. */
class GraftExtensionsSpec extends AnyFunSuite {

  test("extensions install cosine_sim and the dot-product rewrite") {
    // a lingering session from another suite would win getOrCreate and
    // silently drop the extensions config
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      spark.sparkContext.setLogLevel("WARN")
      // cosine_sim resolves from plain SQL
      val e = Tables.embeddings(spark, "/root/testdata/sf0.001")
      e.createOrReplaceTempView("emb")
      val self = spark.sql(
        "SELECT round(cosine_sim(embedding, embedding), 6) AS c FROM emb LIMIT 5")
        .collect().map(_.getDouble(0))
      assert(self.forall(c => math.abs(c - 1.0) < 1e-9)) // self-cosine = 1
      // the optimizer rule is active without an explicit install()
      val hof = e.selectExpr("transform(embedding, x -> cast(x as double)) as v")
        .selectExpr("aggregate(zip_with(v, v, (x, y) -> x * y), 0D, (acc, x) -> acc + x) as dot")
      val rewritten = hof.queryExecution.optimizedPlan
        .collect { case p => p.expressions }.flatten.exists(_.exists {
          case _: graft.functions.DotProduct => true
          case _ => false
        })
      assert(rewritten, "injected optimizer rule should fire")
      // the squared-L2 idiom rewrites to the codegen'd L2Squared and the
      // values are bitwise-identical to the plain Scala left-to-right fold
      val l2 = e.orderBy("vec_id").limit(8)
        .selectExpr("vec_id", "transform(embedding, x -> cast(x as double)) as v")
      val pairs = l2.as("a").crossJoin(l2.as("b"))
        .selectExpr("a.vec_id as ia", "b.vec_id as ib", "a.v as va", "b.v as vb",
          "aggregate(zip_with(a.v, b.v, (x, c) -> (x - c) * (x - c)), 0D, (acc, x) -> acc + x) as d")
      val l2Rewritten = pairs.queryExecution.optimizedPlan
        .collect { case p => p.expressions }.flatten.exists(_.exists {
          case _: graft.functions.L2Squared => true
          case _ => false
        })
      assert(l2Rewritten, "L2 idiom should rewrite to L2Squared")
      pairs.collect().foreach { r =>
        val va = r.getSeq[Double](2); val vb = r.getSeq[Double](3)
        var acc = 0.0; var i = 0
        while (i < va.length) { val d0 = va(i) - vb(i); acc += d0 * d0; i += 1 }
        assert(r.getDouble(4) === acc,
          s"L2Squared(${r.getLong(0)}, ${r.getLong(1)}) differs from the Scala fold")
      }
      // simhash64 resolves from plain SQL and returns the two 32-bit halves
      val sh = spark.sql("SELECT simhash64(array('alpha','beta')) AS sh")
        .collect()(0).getSeq[Long](0)
      assert(sh.length === 2)
      assert(sh.forall(h => h >= 0L && h < (1L << 32)))
      // the planner strategy is injected: a hand-built TopKPerGroupPlan
      // plans (and runs) WITHOUT TopKPerGroup.install()
      assert(!spark.experimental.extraStrategies
        .contains(graft.plans.TopKPerGroupStrategy))
      val docs = Tables.documents(spark, "/root/testdata/sf0.001")
        .select("doc_id", "lang", "n_chars")
      val analyzed = docs.queryExecution.analyzed
      def attr(n: String) = analyzed.output.find(_.name == n).get
      import org.apache.spark.sql.catalyst.expressions.{Ascending, SortOrder}
      val plan = graft.plans.TopKPerGroupPlan(
        Seq(attr("lang")),
        Seq(SortOrder(attr("doc_id"), Ascending, Ascending.defaultNullOrdering, Seq.empty)),
        2, analyzed)
      val viaExt = org.apache.spark.sql.GraftPlanBridge.ofRows(spark, plan)
      assert(viaExt.count() > 0)
      // sparkPlan, not executedPlan: AQE wraps the latter in an adaptive
      // root that hides the subtree until execution
      assert(viaExt.queryExecution.sparkPlan
        .collect { case t: graft.plans.TopKPerGroupExec => t }.size === 2)
    } finally spark.stop()
  }
}
