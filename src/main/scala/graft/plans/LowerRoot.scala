package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `lower_root(string)` — lowercase pinned to Locale.ROOT.
  *
  * Spark's built-in `lower()` routes non-ASCII strings through
  * `String.toLowerCase()` with the JVM DEFAULT locale (UTF8String
  * toLowerCaseSlow in spark-unsafe 4.1.2). On a tr-TR-default JVM that
  * maps capital I to dotless ı, while the Scala-side query analyzer uses
  * `toLowerCase(Locale.ROOT)` — the index and query paths would silently
  * tokenize differently and queries would stop matching indexed turns.
  * This expression keeps the locale-free ASCII fast path and pins the
  * slow path to Locale.ROOT, preserving whole-stage codegen.
  */
case class LowerRoot(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"lower_root expects string, got ${child.dataType}")

  override def dataType: DataType = StringType

  override def nullSafeEval(input: Any): Any =
    LowerRoot.lower(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.LowerRoot.lower($c);")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)

  override def prettyName: String = "lower_root"
}

object LowerRoot {

  /** Called from generated code — must stay public + JVM-friendly. */
  def lower(s: UTF8String): UTF8String = {
    val n = s.numBytes()
    var i = 0
    var ascii = true
    while (ascii && i < n) {
      if ((s.getByte(i) & 0x80) != 0) ascii = false
      i += 1
    }
    if (ascii) s.toLowerCase // pure ASCII: branch-free, locale-independent
    else UTF8String.fromString(s.toString.toLowerCase(java.util.Locale.ROOT))
  }

  def apply(text: Column): Column =
    ColumnBridge.column(LowerRoot(ColumnBridge.expression(text)))
}
