package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `analyze_text(string)` → `array<string>`: the WHOLE analyzer (Locale.ROOT
  * lowercase → maximal `[\p{L}\p{N}]+` runs → stopword filter) fused into
  * one single-pass expression.
  *
  * The composed pipeline (`lower_root` → `regexp_extract_all` → `filter_
  * stopwords`) is semantically identical but pays the java.util.regex
  * engine, a String round-trip per stage, and an intermediate token array —
  * in the build's hottest narrow stage. This expression scans once:
  *   - ASCII fast path: pure-byte scan over the UTF8String's bytes
  *     (lowercase = +32 on A-Z, token chars = [a-z0-9]), zero String
  *     allocation, tokens are UTF8String slices over one per-row buffer;
  *   - any non-ASCII byte falls back to the exact String path
  *     (toLowerCase(Locale.ROOT), then a codepoint scan equivalent to the
  *     regex: Character.isLetter ∪ {Nd, Nl, No}).
  *
  * Parity with [[graft.functions.Analyzer.tokenize]] is property-tested
  * (AnalyzerSpec) — rank-identity of the whole engine rests on the two
  * analyzers never diverging, so the fused path must match token for token.
  */
case class AnalyzeText(child: Expression, stopwords: Seq[String])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"analyze_text expects string, got ${child.dataType}")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  @transient private lazy val set = AnalyzeText.intern(stopwords)

  override def nullSafeEval(input: Any): Any =
    AnalyzeText.analyze(input.asInstanceOf[UTF8String], set)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("stopSet", set,
      classOf[java.util.HashSet[UTF8String]].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.AnalyzeText.analyze($c, $setRef);")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)

  override def prettyName: String = "analyze_text"
}

object AnalyzeText {

  // one interning table for the whole package (FilterStopwords owns it)
  private[plans] def intern(words: Seq[String]): java.util.HashSet[UTF8String] =
    FilterStopwords.intern(words)

  private val Empty = new GenericArrayData(Array.empty[Any])

  /** Called from generated code. */
  def analyze(text: UTF8String, stop: java.util.HashSet[UTF8String]): ArrayData = {
    val n = text.numBytes()
    if (n == 0) return Empty
    // probe bytes in place (no materialization) — a non-ASCII row must not
    // pay a discarded full-row copy on its way to the String path
    var i = 0
    var ascii = true
    while (i < n && ascii) { if (text.getByte(i) < 0) ascii = false; i += 1 }
    if (ascii) asciiScan(text.getBytes, stop) else genericScan(text.toString, stop)
  }

  /** Pure-byte scan: the input is all-ASCII, where Locale.ROOT lowercase is
    * exactly A-Z+32 and `[\p{L}\p{N}]` is exactly [A-Za-z0-9]. `raw` may be
    * UTF8String's internal buffer — it is cloned before the in-place
    * lowercase iff an uppercase letter exists.
    */
  private def asciiScan(raw: Array[Byte], stop: java.util.HashSet[UTF8String]): ArrayData = {
    val n = raw.length
    var hasUpper = false
    var i = 0
    while (i < n && !hasUpper) {
      val b = raw(i)
      if (b >= 'A' && b <= 'Z') hasUpper = true
      i += 1
    }
    val b = if (hasUpper) raw.clone() else raw
    if (hasUpper) {
      var j = 0
      while (j < n) {
        if (b(j) >= 'A' && b(j) <= 'Z') b(j) = (b(j) + 32).toByte
        j += 1
      }
    }
    @inline def isTok(c: Byte): Boolean =
      (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')
    val out = new scala.collection.mutable.ArrayBuffer[Any](8)
    var s = 0
    while (s < n) {
      if (isTok(b(s))) {
        var e = s + 1
        while (e < n && isTok(b(e))) e += 1
        val tok = UTF8String.fromBytes(b, s, e - s)
        if (!stop.contains(tok)) out += tok
        s = e
      } else s += 1
    }
    if (out.isEmpty) Empty else new GenericArrayData(out.toArray)
  }

  /** Exact general path: same steps as Analyzer.tokenize — full Locale.ROOT
    * lowercase first (can change length, e.g. İ → i̇), then maximal runs of
    * codepoints in L* ∪ {Nd, Nl, No} (== java regex `[\p{L}\p{N}]+`).
    */
  private def genericScan(textRaw: String, stop: java.util.HashSet[UTF8String]): ArrayData = {
    val text = textRaw.toLowerCase(java.util.Locale.ROOT)
    val n = text.length
    @inline def isTok(cp: Int): Boolean = {
      if (Character.isLetter(cp)) true
      else {
        val t = Character.getType(cp)
        t == Character.DECIMAL_DIGIT_NUMBER || t == Character.LETTER_NUMBER ||
          t == Character.OTHER_NUMBER
      }
    }
    val out = new scala.collection.mutable.ArrayBuffer[Any](8)
    var i = 0
    while (i < n) {
      val cp = text.codePointAt(i)
      val w = Character.charCount(cp)
      if (isTok(cp)) {
        val start = i
        var e = i + w
        var cont = true
        while (e < n && cont) {
          val c2 = text.codePointAt(e)
          if (isTok(c2)) e += Character.charCount(c2) else cont = false
        }
        val tok = UTF8String.fromString(text.substring(start, e))
        if (!stop.contains(tok)) out += tok
        i = e
      } else i += w
    }
    if (out.isEmpty) Empty else new GenericArrayData(out.toArray)
  }

  def apply(text: Column, stopwords: Set[String]): Column =
    ColumnBridge.column(AnalyzeText(
      ColumnBridge.expression(text), stopwords.toSeq.sorted))
}
