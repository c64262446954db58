package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Whole-stage-codegen vector kernels for the ANN / embedding-dedup paths.
  *
  * The previous formulation used higher-order functions —
  * `aggregate(zip_with(a, b, (x, y) -> x * y), 0D, (acc, x) -> acc + x)` —
  * which materialize a zipped intermediate array and evaluate two lambda
  * closures PER ELEMENT per row. On the pair-scoring paths that expression
  * runs millions of times per query (every candidate pair, every
  * vector x centroid product), and the fold plus its allocations dominated
  * the stage profile. These expressions compute the identical left-to-right
  * index-order fold in a tight primitive loop, so every produced double is
  * BIT-IDENTICAL to the HOF formulation (and to the DuckDB oracle's
  * list_transform/list_sum twin): same multiply, same add, same order.
  *
  * Null semantics mirror the HOF chain: a null element (or a length
  * mismatch, which zip_with pads with nulls) poisons the fold to null.
  */
private[graft] trait VectorFoldExpression extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (array<double>, array<double>), got ($l, $r)")
    }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  /** Static helper class name whose `compute(ArrayData, ArrayData)` returns
    * a boxed Double or null. */
  protected def helper: String

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val tmp = ctx.freshName("fold")
      s"""
         |java.lang.Double $tmp = $helper.compute($a, $b);
         |if ($tmp == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $tmp.doubleValue(); }
       """.stripMargin
    })
}

/** `dot_product(a, b)` = sum_i a[i] * b[i], folded in index order. */
case class DotProduct(left: Expression, right: Expression)
    extends VectorFoldExpression {

  override protected def helper: String = "graft.plans.DotProduct"

  override def nullSafeEval(a: Any, b: Any): Any =
    DotProduct.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)

  override def prettyName: String = "dot_product"
}

object DotProduct {

  /** Called from generated code; null on null element / length mismatch. */
  def compute(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }

  def apply(a: Column, b: Column): Column =
    ColumnBridge.column(DotProduct(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}

/** `l2_sq(a, b)` = sum_i (a[i] - b[i])^2, folded in index order. */
case class L2Sq(left: Expression, right: Expression)
    extends VectorFoldExpression {

  override protected def helper: String = "graft.plans.L2Sq"

  override def nullSafeEval(a: Any, b: Any): Any =
    L2Sq.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)

  override def prettyName: String = "l2_sq"
}

object L2Sq {

  /** Called from generated code; null on null element / length mismatch. */
  def compute(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val d = a.getDouble(i) - b.getDouble(i)
      acc += d * d
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }

  def apply(a: Column, b: Column): Column =
    ColumnBridge.column(L2Sq(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
