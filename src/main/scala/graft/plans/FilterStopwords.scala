package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `filter_stopwords(array<string>)` — drops stopwords from a token array
  * with an O(1) hash-set membership test per token.
  *
  * The composable alternative, `filter(toks, t -> !t.isin(stop: _*))`,
  * expands to a 181-literal In-chain evaluated per token: on a 10^12-turn
  * corpus that is ~10^14 × 181 UTF8String comparisons in the build's
  * hottest stage (measured 28.6s of a 35s tokenize phase at 1M turns).
  * This expression generates code that calls a per-JVM interned
  * java.util.HashSet lookup instead — whole-stage codegen is preserved.
  */
case class FilterStopwords(child: Expression, stopwords: Seq[String])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == ArrayType(StringType, containsNull = false) ||
      child.dataType == ArrayType(StringType, containsNull = true))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"filter_stopwords expects array<string>, got ${child.dataType}")

  override def dataType: DataType = child.dataType

  @transient private lazy val set = FilterStopwords.intern(stopwords)

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    FilterStopwords.filterArray(arr, set)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // ship the stopword list once per codegen'd plan via a literal
    // reference; the HashSet is interned per JVM
    val setRef = ctx.addReferenceObj("stopSet", set, classOf[java.util.HashSet[UTF8String]].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.FilterStopwords.filterArray($c, $setRef);")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)

  override def prettyName: String = "filter_stopwords"
}

object FilterStopwords {

  private val interned =
    new java.util.concurrent.ConcurrentHashMap[Seq[String], java.util.HashSet[UTF8String]]()

  private[plans] def intern(words: Seq[String]): java.util.HashSet[UTF8String] =
    interned.computeIfAbsent(words, { ws =>
      val s = new java.util.HashSet[UTF8String](ws.size * 2)
      ws.foreach(w => s.add(UTF8String.fromString(w)))
      s
    })

  /** Called from generated code — must stay public + JVM-friendly. */
  def filterArray(arr: ArrayData, set: java.util.HashSet[UTF8String]): ArrayData = {
    val n = arr.numElements()
    val out = new Array[Any](n)
    var kept = 0
    var i = 0
    while (i < n) {
      val v = arr.getUTF8String(i)
      if (v != null && !set.contains(v)) { out(kept) = v; kept += 1 }
      i += 1
    }
    if (kept == n) arr
    else new GenericArrayData(java.util.Arrays.copyOf(out.asInstanceOf[Array[AnyRef]], kept))
  }

  def apply(tokens: Column, stopwords: Set[String]): Column =
    ColumnBridge.column(FilterStopwords(
      ColumnBridge.expression(tokens), stopwords.toSeq.sorted))
}
