package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: word k-shingles of a token array —
  * element i is `tokens[i] ⧺ " " ⧺ … ⧺ tokens[i+k-1]`, exactly the
  * strings the interpreted
  * `transform(sequence(1, size(toks)-k+1), i -> concat(...))` idiom
  * (and the oracle's `list_slice` comprehension) produces, but built
  * in one codegen'd pass. Shingling fronts every minhash/LSH/
  * decontamination query, so the HOF's per-element lambda dispatch and
  * sequence-array allocation were paid corpus-wide.
  *
  * Fewer than k tokens yields an empty array (the `sequence` form
  * yields an empty sequence only under a guard; callers filter
  * `size >= k` anyway — kept for value parity at the boundary).
  */
case class Shingles(child: Expression, k: Int) extends UnaryExpression {

  require(k >= 1, s"shingle width must be >= 1, got $k")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_shingles expects array<string> tokens, got $t")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def prettyName: String = "graft_shingles"

  override protected def nullSafeEval(a: Any): Any =
    Shingles.compute(a.asInstanceOf[ArrayData], k)

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.Shingles.compute($a, $k);")

  override protected def withNewChildInternal(newChild: Expression): Shingles =
    copy(child = newChild)
}

object Shingles {

  private val sep = UTF8String.fromString(" ")

  /** Static worker shared by eval and the generated code. */
  def compute(tokens: ArrayData, k: Int): GenericArrayData = {
    val n = tokens.numElements()
    if (n < k) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](n - k + 1)
    var i = 0
    while (i <= n - k) {
      var s = tokens.getUTF8String(i)
      var j = 1
      while (j < k) {
        s = UTF8String.concat(s, sep, tokens.getUTF8String(i + j))
        j += 1
      }
      out(i) = s
      i += 1
    }
    new GenericArrayData(out)
  }
}
