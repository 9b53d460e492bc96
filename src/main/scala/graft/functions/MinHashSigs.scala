package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native MinHash signature: for an `array<string>` shingle set, computes
  * all `numPerms` permutation minima in ONE pass —
  * element `s` equals `array_min(transform(shingles, x -> md5(concat('s|', x))))`
  * exactly (same md5-hex strings, same lexicographic min), so swapping the
  * HOF formulation for this expression cannot change any result.
  *
  * Why a custom Expression (same rationale as [[CosineSimilarity]]):
  * the HOF form evaluates interpreted — per-element lambda dispatch,
  * one full re-scan of the shingle array PER permutation, and a hex
  * `UTF8String` allocation per (shingle, perm). Here each shingle is
  * visited once, its UTF-8 bytes are fetched once, and the per-perm
  * minima are kept as raw 16-byte digests compared unsigned-lexicographic
  * (identical ordering to the hex strings, since hex encoding is
  * order-preserving) — only the `numPerms` winners are hex-encoded at the
  * end. At 100 TB the signature pass over the corpus is the dominant
  * dedup cost; this keeps it a tight JIT'd loop instead of interpreter
  * dispatch.
  *
  * Null semantics match the HOF column-by-column: null input → null;
  * empty shingle set → every element null (`array_min` over an empty or
  * all-null array is null); null shingles are skipped (`array_min`
  * ignores nulls).
  */
case class MinHashSigs(child: Expression, numPerms: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = true)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if numPerms > 0 => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"minhash_sigs expects (array<string>, positive literal perms), got " +
        s"(${child.dataType.simpleString}, $numPerms)")
  }

  override protected def nullSafeEval(input: Any): Any =
    MinHashSigs.compute(input.asInstanceOf[ArrayData], numPerms)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.MinHashSigs.compute($a, $numPerms);")

  override protected def withNewChildInternal(newChild: Expression): MinHashSigs =
    copy(child = newChild)
}

object MinHashSigs {

  private val digests = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  private val hexChars = "0123456789abcdef".toCharArray

  /** `"s|"` prefix byte tables, memoized per numPerms: compute() runs once
    * per ROW, so rebuilding numPerms small arrays there is allocation in
    * the exact hot loop this expression exists to avoid. */
  private val prefixTables =
    scala.collection.concurrent.TrieMap.empty[Int, Array[Array[Byte]]]

  private def prefixesFor(numPerms: Int): Array[Array[Byte]] =
    prefixTables.getOrElseUpdate(numPerms,
      Array.tabulate(numPerms)(s => (s + "|").getBytes(StandardCharsets.UTF_8)))

  /** One pass over the shingles; minima kept as raw digests (unsigned-byte
    * order == hex-string order), hex-encoded only at the end. */
  def compute(shingles: ArrayData, numPerms: Int): ArrayData = {
    val md = digests.get()
    val prefixes = prefixesFor(numPerms)
    val minima = new Array[Array[Byte]](numPerms)
    val n = shingles.numElements()
    var i = 0
    while (i < n) {
      if (!shingles.isNullAt(i)) {
        val bytes = shingles.getUTF8String(i).getBytes
        var s = 0
        while (s < numPerms) {
          md.reset()
          md.update(prefixes(s))
          md.update(bytes)
          val d = md.digest()
          if (minima(s) == null || unsignedLess(d, minima(s))) minima(s) = d
          s += 1
        }
      }
      i += 1
    }
    val out = new Array[Any](numPerms)
    var s = 0
    while (s < numPerms) {
      out(s) = if (minima(s) == null) null else UTF8String.fromString(hex(minima(s)))
      s += 1
    }
    new GenericArrayData(out)
  }

  private def unsignedLess(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < a.length) {
      val x = a(i) & 0xff; val y = b(i) & 0xff
      if (x != y) return x < y
      i += 1
    }
    false
  }

  private def hex(d: Array[Byte]): String = {
    val cs = new Array[Char](d.length * 2)
    var i = 0
    while (i < d.length) {
      cs(i * 2) = hexChars((d(i) >> 4) & 0xf)
      cs(i * 2 + 1) = hexChars(d(i) & 0xf)
      i += 1
    }
    new String(cs)
  }

  /** Register `minhash_sigs(arr, perms)` (perms a foldable int literal) in
    * the session's function registry (idempotent). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("minhash_sigs"),
      new ExpressionInfo(classOf[MinHashSigs].getName, "minhash_sigs"),
      builder)

  val builder: Seq[Expression] => Expression = { children =>
    if (children.length != 2)
      throw new IllegalArgumentException(
        s"minhash_sigs expects exactly 2 arguments (array<string>, perms), " +
          s"got ${children.length}")
    val perms = children(1) match {
      case Literal(v: Int, IntegerType) => v
      case e if e.foldable => e.eval() match {
        case v: Int => v
        case other => throw new IllegalArgumentException(
          s"minhash_sigs perms must be an int literal, got $other")
      }
      case _ => throw new IllegalArgumentException(
        "minhash_sigs perms must be a foldable int literal")
    }
    MinHashSigs(children(0), perms)
  }
}
