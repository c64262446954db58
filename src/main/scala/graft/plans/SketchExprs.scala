package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Codegen kernels for the dedup-sketch pipelines (guide §1.2 step 2 —
  * per-task work). Each replaces a chain of generic expressions with one
  * tight loop that produces BIT-IDENTICAL output (same md5 bytes, same
  * first-occurrence order, same strings), verified by the unchanged DuckDB
  * oracles.
  */
object SketchExprs {
  /** Thread-local MD5 so the per-row path never pays getInstance. */
  private val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  private val HexChars = "0123456789abcdef".toCharArray

  private[plans] def digestOf(prefix: Array[Byte], payload: Array[Byte]): Array[Byte] = {
    val d = md5.get()
    d.reset()
    d.update(prefix)
    d.update(payload)
    d.digest()
  }

  /** Lowercase hex of the first `n` bytes — substring(md5hex, 1, 2n). */
  private[plans] def hexPrefix(digest: Array[Byte], n: Int): UTF8String = {
    val out = new Array[Byte](2 * n)
    var i = 0
    while (i < n) {
      val b = digest(i) & 0xff
      out(2 * i) = HexChars(b >>> 4).toByte
      out(2 * i + 1) = HexChars(b & 0xf).toByte
      i += 1
    }
    UTF8String.fromBytes(out)
  }
}

/** `shingles3(array<string>)` → distinct space-joined 3-gram strings in
  * first-occurrence order — exactly
  * `array_distinct(transform(sequence(1, size(t) - 2), i ->
  *    array_join(slice(t, i, 3), ' ')))`
  * without the per-shingle slice allocation and the three lambda closures.
  * Fewer than 3 tokens yields an empty array (callers filter anyway).
  */
case class Shingles3(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(s"shingles3 expects array<string>, got $t")
    }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    Shingles3.shingle(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = graft.plans.Shingles3.shingle($c);")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)

  override def prettyName: String = "shingles3"
}

object Shingles3 {

  private val Space = UTF8String.fromString(" ")

  /** Called from generated code. */
  def shingle(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    if (n < 3) return new GenericArrayData(Array.empty[Any])
    // array_join skips null elements; analyzer tokens are never null, but
    // mirror the semantics exactly anyway
    val seen = new java.util.LinkedHashSet[UTF8String](n * 2)
    var i = 0
    while (i + 2 < n) {
      val parts = new java.util.ArrayList[UTF8String](5)
      var j = 0
      var first = true
      while (j < 3) {
        if (!arr.isNullAt(i + j)) {
          if (!first) parts.add(Space)
          parts.add(arr.getUTF8String(i + j))
          first = false
        }
        j += 1
      }
      seen.add(UTF8String.concat(parts.toArray(new Array[UTF8String](parts.size())): _*))
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = it.next(); k += 1 }
    new GenericArrayData(out)
  }

  def apply(tokens: Column): Column =
    ColumnBridge.column(Shingles3(ColumnBridge.expression(tokens)))
}

/** `minhash_prefixes(sh)` → array of [[MinhashPrefixes.N]] strings, element
  * i = `substring(md5('i|' || sh), 1, 16)` — the per-hash-function key the
  * MinHash signature minimizes. One digest reuse + 8-byte hex per function
  * instead of N separate concat→md5→full-hex→substring chains.
  */
case class MinhashPrefixes(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"minhash_prefixes expects string, got ${child.dataType}")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    MinhashPrefixes.hashes(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = graft.plans.MinhashPrefixes.hashes($c);")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)

  override def prettyName: String = "minhash_prefixes"
}

object MinhashPrefixes {

  /** Matches TrainingData.MinhashHashes (asserted there at wiring time). */
  val N = 16

  private val prefixes: Array[Array[Byte]] =
    (0 until N).map(i => s"$i|".getBytes("UTF-8")).toArray

  /** Called from generated code. */
  def hashes(sh: UTF8String): ArrayData = {
    val payload = sh.getBytes
    val out = new Array[Any](N)
    var i = 0
    while (i < N) {
      out(i) = SketchExprs.hexPrefix(SketchExprs.digestOf(prefixes(i), payload), 8)
      i += 1
    }
    new GenericArrayData(out)
  }

  def apply(sh: Column): Column =
    ColumnBridge.column(MinhashPrefixes(ColumnBridge.expression(sh)))
}

/** `simhash_sig(array<string>)` → the full 64-bit SimHash signature as 4
  * x 16-bit chunk ints `[c0, c1, c2, c3]`, computed entirely IN-ROW: a
  * document's signature is a function of nothing but its own token counts
  * and the pure per-term md5 sign vector, so the former
  * tf-join-vocabulary → 64-column vote aggregate (a shuffle, plus an
  * aggregate wide enough to fall out of whole-stage codegen) collapses to
  * a narrow map over the corpus — zero exchanges before the candidate
  * join. Vote arithmetic is exact integer math, so the chunks are
  * bit-identical to the relational formulation and the DuckDB oracle.
  */
case class SimhashSig(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(s"simhash_sig expects array<string>, got $t")
    }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    SimhashSig.sig(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = graft.plans.SimhashSig.sig($c);")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)

  override def prettyName: String = "simhash_sig"
}

object SimhashSig {

  private val p0 = "0|".getBytes("UTF-8")
  private val p1 = "1|".getBytes("UTF-8")

  /** Called from generated code. */
  def sig(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    // per-doc term counts (same fold as TermFreqs.count)
    val m = new java.util.LinkedHashMap[UTF8String, java.lang.Integer](n * 2)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val t = arr.getUTF8String(i)
        val prev = m.get(t)
        m.put(t, if (prev == null) 1 else prev + 1)
      }
      i += 1
    }
    val votes = new Array[Long](64)
    val it = m.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val payload = e.getKey.getBytes
      val w = e.getValue.longValue()
      val d0 = SketchExprs.digestOf(p0, payload)
      val d1 = SketchExprs.digestOf(p1, payload)
      var k = 0
      while (k < 32) {
        val n0 = if (k % 2 == 0) (d0(k / 2) & 0xff) >>> 4 else d0(k / 2) & 0xf
        val n1 = if (k % 2 == 0) (d1(k / 2) & 0xff) >>> 4 else d1(k / 2) & 0xf
        votes(k) += (if ((n0 & 1) == 1) w else -w)
        votes(32 + k) += (if ((n1 & 1) == 1) w else -w)
        k += 1
      }
    }
    val out = new Array[Any](4)
    var c = 0
    while (c < 4) {
      var v = 0
      var j = 0
      while (j < 16) {
        if (votes(16 * c + j) > 0) v |= 1 << j
        j += 1
      }
      out(c) = v
      c += 1
    }
    new GenericArrayData(out)
  }

  def apply(tokens: Column): Column =
    ColumnBridge.column(SimhashSig(ColumnBridge.expression(tokens)))
}
