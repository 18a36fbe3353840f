package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: the engine's seedless MinHash signature
  * — component i = MIN over shingles of md5-hex rotated left by 2i
  * chars — computed in ONE pass: one md5 per shingle, rotations
  * compared in place against the running minima (byte index modulo 32),
  * zero intermediate arrays.
  *
  * Value-identical to the HOF formulation
  * (`array_min(transform(transform(sh, md5), rotateHex(_, i)))`) and to
  * the DuckDB oracle's `MIN(substring(md5(s), 2i+1) || …)`: md5 hex is
  * lowercase ASCII, so UTF8String/byte comparison, Spark string MIN and
  * DuckDB VARCHAR MIN all agree. The HOF form is interpreted
  * (CodegenFallback) and re-scans the signature array once per
  * component with a materialized md5 array in between — this was the
  * costliest part of every minhash-family query (q33/q34/q76/q79).
  *
  * Empty input yields NULL (as `array_min` of an empty array did).
  */
case class MinhashHex(child: Expression, components: Int = 4)
    extends UnaryExpression {

  require(components >= 1 && 2 * (components - 1) < 32,
    s"components must be in [1,16], got $components")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_minhash expects array<string> shingles, got $t")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullable: Boolean = true

  override def prettyName: String = "graft_minhash"

  override protected def nullSafeEval(a: Any): Any =
    MinhashHex.compute(a.asInstanceOf[ArrayData], components)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      s"""
         |${ev.value} = graft.functions.MinhashHex.compute($a, $components);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinhashHex =
    copy(child = newChild)
}

object MinhashHex {

  private val hexDigits = "0123456789abcdef".getBytes("US-ASCII")

  private val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Static worker shared by eval and the generated code (the codegen
    * win here is staying inside the whole-stage loop — the heavy
    * lifting is md5, not expression dispatch). Returns null for an
    * empty shingle array. */
  def compute(shingles: ArrayData, components: Int): GenericArrayData = {
    val n = shingles.numElements()
    if (n == 0) return null
    val digest = md5.get()
    val mins = Array.ofDim[Byte](components, 32)
    val hex = new Array[Byte](32)
    var i = 0
    while (i < n) {
      val d = digest.digest(shingles.getUTF8String(i).getBytes)
      var b = 0
      while (b < 16) {
        hex(2 * b) = hexDigits((d(b) & 0xff) >>> 4)
        hex(2 * b + 1) = hexDigits(d(b) & 0x0f)
        b += 1
      }
      var c = 0
      while (c < components) {
        val off = 2 * c // rotation offset: candidate[j] = hex[(j+off) % 32]
        val min = mins(c)
        if (i == 0) {
          var j = 0
          while (j < 32) { min(j) = hex((j + off) & 31); j += 1 }
        } else {
          var j = 0
          var cmp = 0
          while (j < 32 && cmp == 0) {
            cmp = (hex((j + off) & 31) & 0xff) - (min(j) & 0xff)
            j += 1
          }
          if (cmp < 0) {
            j = 0
            while (j < 32) { min(j) = hex((j + off) & 31); j += 1 }
          }
        }
        c += 1
      }
      i += 1
    }
    new GenericArrayData(
      mins.map(m => UTF8String.fromBytes(m)).asInstanceOf[Array[Any]])
  }
}
