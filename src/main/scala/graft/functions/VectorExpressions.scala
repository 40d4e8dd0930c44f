package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst dot product over two `array<float>` columns.
  *
  * This is the hot inner loop of the similarity operators (brute-force
  * ANN scans every (query, corpus) pair; embedding dedup scores every
  * candidate pair). A Scala UDF pays Seq[Float] boxing + encoder
  * round-trips per row and breaks whole-stage codegen; this expression
  * generates a primitive Java loop directly over the columnar
  * `ArrayData` (`getFloat(i)` reads the unsafe buffer), so the whole
  * scan→dot→top-k pipeline stays inside one codegen stage.
  *
  * Semantics (identical to [[Vectors.dotExpr]] and the DuckDB oracle):
  * sequential left-fold of `(double) a(i) * (double) b(i)` over the
  * common prefix length — bit-reproducible, order-fixed. Null arrays
  * propagate null; elements are assumed non-null (embedding vectors).
  */
case class FloatDotProduct(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<float> arguments, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "float_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getFloat(i).toDouble * y.getFloat(i).toDouble; i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object FloatDotProduct {
  /** Column-API entry point: `float_dot(a, b)` as a codegen'd expression. */
  def apply(a: Column, b: Column): Column =
    ColumnBridge.column(FloatDotProduct(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
