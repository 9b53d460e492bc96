package graft

import graft.functions.{CosineSimilarity, MinHashSigs, RewriteDotProduct, SimHash64}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session-extension packaging of the engine's custom Catalyst surface —
  * the production integration route:
  *
  * {{{
  *   spark.sql.extensions=graft.GraftExtensions
  * }}}
  *
  * installs `cosine_sim`, `minhash_sigs`, and `simhash64` (codegen'd
  * expressions, usable from SQL), the [[RewriteDotProduct]]
  * auto-acceleration rule, and the [[graft.plans.TopKPerGroupStrategy]]
  * planner strategy (grouped top-k as a first-class physical operator)
  * on every session, no code changes in user queries. The per-session
  * `register`/`install` helpers remain for already-running sessions.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
      (children: Seq[Expression]) => CosineSimilarity(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("minhash_sigs"),
      new ExpressionInfo(classOf[MinHashSigs].getName, "minhash_sigs"),
      MinHashSigs.builder))
    ext.injectFunction((
      FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      (children: Seq[Expression]) => SimHash64(children.head)))
    ext.injectOptimizerRule(_ => RewriteDotProduct)
    ext.injectPlannerStrategy(_ => graft.plans.TopKPerGroupStrategy)
  }
}
