package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression: dot product of two array columns (each
  * side independently float or double), accumulated left-to-right in
  * double precision — bit-identical to the higher-order-function form
  * (`GraftFunctions.dotd`) and to the DuckDB oracle's list_sum
  * comprehension, but compiled into the whole-stage codegen loop
  * instead of interpreted per element (HOFs are CodegenFallback). This
  * is the §4 preference-order (b) case: a scalar the built-ins can only
  * express ~10× slower on the similarity-search hot path that a 100 TB
  * embedding sweep lives in. The mixed float/double form is what an IVF
  * scoring pass needs: raw embeddings are float, computed centroids are
  * double (q87).
  *
  * Null/shape handling: null array → null (BinaryExpression default);
  * length mismatch → min length; null elements are read as 0 (the
  * embeddings schema carries none).
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  private def elemOk(t: DataType) = t match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  private def isFloat(t: DataType) = t match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemOk(left.dataType) && elemOk(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_dot expects array<float>/array<double> inputs, got ${left.dataType} / ${right.dataType}")

  override def dataType: DataType = DoubleType

  override def prettyName: String = "graft_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val (lf, rf) = (isFloat(left.dataType), isFloat(right.dataType))
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      val xi = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yi = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      s += xi * yi
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      def rd(v: String, float: Boolean) =
        if (float) s"(double) $v.getFloat($i)" else s"$v.getDouble($i)"
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += ${rd(a, isFloat(left.dataType))} * ${rd(b, isFloat(right.dataType))};
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}
