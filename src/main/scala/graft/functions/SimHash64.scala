package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native 64-bit SimHash of a token array: returns `array<bigint>` of
  * `[code_hi, code_lo]` — the two 32-bit halves graft.ops.Dedup.simhash64
  * bands and compares (Charikar 2002).
  *
  * Element-for-element equal to the relational formulation (explode
  * distinct tokens → decode md5 hex chars 1-8 / 9-16 as two 32-bit values
  * → ±1 vote per bit → groupBy(doc) 64 sums → sign sets the bit): hex
  * chars 1-8 of an md5 ARE digest bytes 0-3 big-endian, so the arithmetic
  * here reads the same 32-bit halves straight from the raw digest; vote
  * totals and the `sum > 0` bit rule are identical integer math.
  * OpsSpec asserts equality against the vote-aggregation plan.
  *
  * Why a custom Expression (same ladder as [[MinHashSigs]]): the
  * relational form EXPLODES the corpus to token grain and shuffles it
  * into a 64-column aggregation — at 100 TB that exchange is the
  * dominant cost of the dedup pass, bought only to sum votes the row
  * already had locally. Here the whole code is computed per document in
  * one JIT'd loop: zero shuffle, no token-grain intermediate, and the
  * downstream band join starts from a corpus-sized (doc_id, hi, lo)
  * table.
  *
  * Null semantics: null array → null; null elements are skipped (the
  * explode form never produces them — array_distinct of split() output);
  * an empty array yields code 0/0 (all vote sums are 0, and split()
  * never returns an empty array, so the explode form's doc-dropping on
  * empty input is unobservable — asserted equal in the spec).
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"simhash64 expects array<string>, got ${child.dataType.simpleString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    SimHash64.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.SimHash64.compute($a);")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash64 {

  private val digests = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  def compute(tokens: ArrayData): ArrayData = {
    val md = digests.get()
    val votes = new Array[Int](64) // [0,32) = hi-half bits, [32,64) = lo-half
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        md.reset()
        val d = md.digest(tokens.getUTF8String(i).getBytes)
        // hex chars 1-8 = bytes 0-3 big-endian; chars 9-16 = bytes 4-7
        val vhi = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
          ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
        val vlo = ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
          ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)
        var b = 0
        while (b < 32) {
          votes(b) += (if (((vhi >> b) & 1L) == 1L) 1 else -1)
          votes(32 + b) += (if (((vlo >> b) & 1L) == 1L) 1 else -1)
          b += 1
        }
      }
      i += 1
    }
    var hi = 0L; var lo = 0L; var b = 0
    while (b < 32) {
      if (votes(b) > 0) hi |= (1L << b)
      if (votes(32 + b) > 0) lo |= (1L << b)
      b += 1
    }
    new GenericArrayData(Array[Any](hi, lo))
  }

  /** Register `simhash64(arr)` in the session's function registry
    * (idempotent) so it is usable from expr()/SQL. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      (children: Seq[Expression]) => {
        if (children.length != 1)
          throw new IllegalArgumentException(
            s"simhash64 expects exactly 1 argument (array<string>), got ${children.length}")
        SimHash64(children.head)
      })
}
