package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, ArrayData, GenericArrayData, MapData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `term_positions(array<string>)` → `map<string, array<int>>`: for every
  * distinct token, its 1-based positions in the array, ascending.
  *
  * The positional sibling of [[TermFreqs]] (tf = positions.length), used by
  * the positional index build: like tf, a (doc, term) pair's positions all
  * live inside one row's token array, so collecting them in-row keeps the
  * postings relation narrow — no token-level explode+groupBy shuffle.
  * Keys are emitted in first-occurrence order (deterministic per text).
  */
case class TermPositions(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(s"term_positions expects array<string>, got $t")
    }

  override def dataType: DataType =
    MapType(StringType, ArrayType(IntegerType, containsNull = false),
      valueContainsNull = false)

  override def nullSafeEval(input: Any): Any =
    TermPositions.positionsOf(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.TermPositions.positionsOf($c);")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)

  override def prettyName: String = "term_positions"
}

object TermPositions {

  /** Called from generated code. */
  def positionsOf(arr: ArrayData): MapData = {
    val n = arr.numElements()
    val m = new java.util.LinkedHashMap[UTF8String, java.util.ArrayList[Integer]](n * 2)
    var i = 0
    while (i < n) {
      val t = arr.getUTF8String(i)
      if (t != null) {
        var lst = m.get(t)
        if (lst == null) { lst = new java.util.ArrayList[Integer](4); m.put(t, lst) }
        lst.add(i + 1) // 1-based, ascending by construction
      }
      i += 1
    }
    val keys = new Array[Any](m.size)
    val vals = new Array[Any](m.size)
    var j = 0
    val it = m.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      keys(j) = e.getKey
      val lst = e.getValue
      val ps = new Array[Any](lst.size)
      var k = 0
      while (k < lst.size) { ps(k) = lst.get(k).intValue(); k += 1 }
      vals(j) = new GenericArrayData(ps)
      j += 1
    }
    new ArrayBasedMapData(new GenericArrayData(keys), new GenericArrayData(vals))
  }

  def apply(tokens: Column): Column =
    ColumnBridge.column(TermPositions(ColumnBridge.expression(tokens)))
}
