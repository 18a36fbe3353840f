package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for DSIR-style hashed n-gram features:
  * one pass over a token array returning, for every adjacent bigram
  * "a b", the FIRST HEX CHARACTER of md5("a b") — i.e. the bigram's
  * 16-way feature bucket, in document order. Bit-compatible with the
  * declarative formulation
  * `transform(sequence(1, size(tk)-1), i -> substring(md5(...), 1, 1))`
  * (and the DuckDB oracle's `substr(md5(...), 1, 1)`), but computed
  * with ONE reused MessageDigest and no per-element expression-tree
  * evaluation: the interpreted higher-order transform allocated a
  * fresh digest + concat + hex-format per element and was the q140
  * scorer's dominant cost (measured ~2.3 s of a 2.7 s query at sf0.1;
  * this pass runs twice — model fit and scoring).
  *
  * Only the high nibble of digest byte 0 is needed, so the hex
  * formatting collapses to a single table lookup per bigram. */
case class BigramBuckets(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_bigram_buckets expects array<string> tokens, got $t")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def prettyName: String = "graft_bigram_buckets"

  override protected def nullSafeEval(a: Any): Any =
    BigramBuckets.compute(a.asInstanceOf[ArrayData])

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.BigramBuckets.compute($a);")

  override protected def withNewChildInternal(newChild: Expression): BigramBuckets =
    copy(child = newChild)
}

object BigramBuckets {

  private val hex: Array[UTF8String] =
    "0123456789abcdef".map(c => UTF8String.fromString(c.toString)).toArray

  /** Static worker shared by eval and the generated code. */
  def compute(tokens: ArrayData): GenericArrayData = {
    val n = tokens.numElements()
    if (n < 2) return new GenericArrayData(Array.empty[Any])
    val md = java.security.MessageDigest.getInstance("MD5")
    val space = ' '.toByte
    val out = new Array[Any](n - 1)
    // null elements follow concat_ws semantics (drop the null and, with
    // it, the separator) so the bit-compatibility claim with the
    // declarative md5(concat_ws(' ', a, b)) holds even on
    // containsNull=true arrays the SQL-registered function may see —
    // internal callers only ever feed split() output (never null).
    var prev: Array[Byte] = if (tokens.isNullAt(0)) null else tokens.getUTF8String(0).getBytes
    var i = 1
    while (i < n) {
      val cur: Array[Byte] = if (tokens.isNullAt(i)) null else tokens.getUTF8String(i).getBytes
      md.reset()
      if (prev != null) md.update(prev)
      if (prev != null && cur != null) md.update(space)
      if (cur != null) md.update(cur)
      out(i - 1) = hex((md.digest()(0) >>> 4) & 0xf)
      prev = cur
      i += 1
    }
    new GenericArrayData(out)
  }
}
