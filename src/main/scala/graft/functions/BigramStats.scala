package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the Gopher-style repetition signals:
  * one pass over a token array returning `[n_tokens, n_distinct_tokens,
  * top_bigram_count]` via open hashing — the callers derive
  * duplicate-word fraction `(n-nd)/n` and top-bigram fraction
  * `top/(n-1)` as exact integer divisions.
  *
  * Replaces the previous array-math formulation (`sort_array` of a
  * `transform`-built bigram array + an interpreted `aggregate` run-max
  * fold): identical integer outputs — a bigram's count in a hash table
  * equals its run length in the sorted array — but hash-counted in one
  * codegen'd pass with no per-element struct allocation and no sort.
  * The quality gate runs over every document of a corpus, and this was
  * the single most expensive scalar in the curation pipeline (the
  * fractions only LOOK cheap behind `.count()`, which prunes them).
  *
  * Input arrays with fewer than 2 tokens yield `top_bigram_count = 0`
  * (callers filter those out to match the oracle's empty-unnest drop).
  */
case class BigramStats(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_bigram_stats expects array<string> tokens, got $t")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "graft_bigram_stats"

  override protected def nullSafeEval(a: Any): Any =
    BigramStats.compute(a.asInstanceOf[ArrayData])

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.BigramStats.compute($a);")

  override protected def withNewChildInternal(newChild: Expression): BigramStats =
    copy(child = newChild)
}

object BigramStats {

  /** Static worker shared by eval and the generated code. */
  def compute(tokens: ArrayData): UnsafeArrayData = {
    val n = tokens.numElements()
    val distinct = new java.util.HashSet[UTF8String]()
    val bigrams = new java.util.HashMap[UTF8String, Integer]()
    val sep = UTF8String.fromString(" ")
    var top = 0L
    var prev: UTF8String = null
    var i = 0
    while (i < n) {
      val t = tokens.getUTF8String(i)
      distinct.add(t)
      if (prev != null) {
        val bg = UTF8String.concat(prev, sep, t)
        val c = bigrams.merge(bg, 1, (x: Integer, y: Integer) => x + y)
        if (c > top) top = c.toLong
      }
      prev = t
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(
      Array[Long](n.toLong, distinct.size.toLong, top))
  }
}
