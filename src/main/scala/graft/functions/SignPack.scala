package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Native Catalyst expression: pack the SIGNS of a float/double array
  * slice into the low bits of a long — bit i of the result is set iff
  * element (offset + i) is strictly positive. The binary-quantization
  * primitive every 32×-compression vector-serving tier starts from: a
  * 64-dim float vector collapses to two of these words, and candidate
  * scoring becomes bit_count(xor(...)), a codegen'd two-instruction
  * kernel instead of a 64-float loop.
  *
  * `len` is capped at 63 so the packed word stays non-negative — the
  * DuckDB oracle twin builds the same word with `1 << (i-1)` inside a
  * list comprehension, and a sign-bit shift overflows there. Callers
  * pack wider vectors as multiple words (q192 uses two 32-bit halves),
  * which also mirrors how real BQ codes lay out in word-aligned memory.
  *
  * Null array → null (UnaryExpression default); elements past the end
  * of a short array read as 0-sign (bit clear); null elements likewise.
  */
case class SignPack(child: Expression, offset: Int, len: Int)
    extends UnaryExpression {

  require(offset >= 0 && len >= 1 && len <= 63,
    s"graft_signpack: offset must be >= 0 and len in 1..63, got ($offset, $len)")

  private def isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_signpack expects array<float>/array<double>, got $t")
  }

  override def dataType: DataType = LongType

  override def prettyName: String = "graft_signpack"

  override protected def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    var w = 0L
    var i = 0
    while (i < len) {
      val j = offset + i
      if (j < n && !x.isNullAt(j)) {
        val v = if (isFloat) x.getFloat(j).toDouble else x.getDouble(j)
        if (v > 0.0) w |= (1L << i)
      }
      i += 1
    }
    w
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val w = ctx.freshName("w")
      val rd = if (isFloat) s"(double) $a.getFloat($j)" else s"$a.getDouble($j)"
      s"""
         |int $n = $a.numElements();
         |long $w = 0L;
         |for (int $i = 0; $i < $len; $i++) {
         |  int $j = $offset + $i;
         |  if ($j < $n && !$a.isNullAt($j) && $rd > 0.0) {
         |    $w |= (1L << $i);
         |  }
         |}
         |${ev.value} = $w;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SignPack =
    copy(child = newChild)
}
