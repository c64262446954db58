package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, ArrayData, GenericArrayData, MapData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `term_freqs(array<string>)` → `map<string,int>` of token counts.
  *
  * Term frequency is a PER-DOCUMENT aggregation: every occurrence of a
  * (doc, term) pair lives inside one row's token array, so counting it
  * with `explode + groupBy(term, docId)` forces a full shuffle of every
  * token in the corpus (~10^14 rows at north-rule scale) only to combine
  * values that were never apart. This expression counts inside the row —
  * the postings relation becomes a narrow transform and the index build's
  * only wide exchange is the final (shard, term) placement shuffle.
  *
  * Keys are emitted in first-occurrence order (deterministic for a given
  * text); downstream sorts impose their own order anyway.
  */
case class TermFreqs(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(s"term_freqs expects array<string>, got $t")
    }

  override def dataType: DataType =
    MapType(StringType, IntegerType, valueContainsNull = false)

  override def nullSafeEval(input: Any): Any =
    TermFreqs.count(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.TermFreqs.count($c);")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)

  override def prettyName: String = "term_freqs"
}

object TermFreqs {

  /** Called from generated code. */
  def count(arr: ArrayData): MapData = {
    val n = arr.numElements()
    val m = new java.util.LinkedHashMap[UTF8String, java.lang.Integer](n * 2)
    var i = 0
    while (i < n) {
      val t = arr.getUTF8String(i)
      if (t != null) {
        val prev = m.get(t)
        m.put(t, if (prev == null) 1 else prev + 1)
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
      vals(j) = e.getValue
      j += 1
    }
    new ArrayBasedMapData(new GenericArrayData(keys), new GenericArrayData(vals))
  }

  def apply(tokens: Column): Column =
    ColumnBridge.column(TermFreqs(ColumnBridge.expression(tokens)))
}
