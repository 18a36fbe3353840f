package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: per-profile stopword occurrence counts
  * over a token array, in ONE pass — `counts[p]` = how many tokens are
  * in profile p's stopword list (occurrences, not distinct, matching
  * the `filter(tk, t -> t IN (...))` idiom and the DuckDB
  * `list_filter` oracle).
  *
  * This replaces N interpreted higher-order `filter` calls (HOFs are
  * CodegenFallback — the language-ID scorer was the slowest map-only
  * query in the suite) with a single codegen'd loop over a shared
  * UTF8String→profile-indices hash table, and no intermediate filtered
  * arrays. A word may belong to several profiles (e.g. "de" is in both
  * the es and zh lists), so the table maps to an index ARRAY.
  *
  * §4 preference-order case (b), same as [[DotProduct]]: a scalar hot
  * path the built-ins only express interpreted. At 100 TB language-ID
  * runs over every document, so the constant factor is the cost.
  */
case class StopwordCounts(child: Expression, profiles: Seq[Seq[String]])
    extends UnaryExpression {

  require(profiles.nonEmpty, "StopwordCounts needs at least one profile")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_stopword_counts expects array<string> tokens, got $t")
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def prettyName: String = "graft_stopword_counts"

  /** word → indices of the profiles containing it; UTF8String keys so
    * probing needs no decode of the scanned tokens. */
  @transient private lazy val lookup: java.util.HashMap[UTF8String, Array[Int]] = {
    val m = new java.util.HashMap[UTF8String, Array[Int]]()
    profiles.zipWithIndex.foreach { case (words, p) =>
      words.foreach { w =>
        val k = UTF8String.fromString(w)
        val prev = m.get(k)
        m.put(k, if (prev == null) Array(p) else prev :+ p)
      }
    }
    m
  }

  override protected def nullSafeEval(a: Any): Any = {
    val tk = a.asInstanceOf[ArrayData]
    val counts = new Array[Int](profiles.size)
    var i = 0
    val n = tk.numElements()
    while (i < n) {
      val ps = lookup.get(tk.getUTF8String(i))
      if (ps != null) {
        var k = 0
        while (k < ps.length) { counts(ps(k)) += 1; k += 1 }
      }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(counts)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val lookupRef = ctx.addReferenceObj("stopwordLookup", lookup,
        "java.util.HashMap")
      val c = ctx.freshName("counts")
      val i = ctx.freshName("i")
      val k = ctx.freshName("k")
      val n = ctx.freshName("n")
      val ps = ctx.freshName("ps")
      s"""
         |int[] $c = new int[${profiles.size}];
         |int $n = $a.numElements();
         |for (int $i = 0; $i < $n; $i++) {
         |  int[] $ps = (int[]) $lookupRef.get($a.getUTF8String($i));
         |  if ($ps != null) {
         |    for (int $k = 0; $k < $ps.length; $k++) $c[$ps[$k]]++;
         |  }
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |  .fromPrimitiveArray($c);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): StopwordCounts =
    copy(child = newChild)
}
