package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

import graft.index.Codec

/** Catalyst expression `decode_block(payload, n)` →
  * `array<struct<docId:long, tf:int, dl:int>>`.
  *
  * Makes the delta+varint posting blocks inspectable from SQL/DataFrame
  * plans (debugging, auditing, and the `postings_from_blocks` oracle
  * round-trip in SparkEntry). The hot query path (WAND) decodes inside
  * mapPartitions and never routes through this expression, so
  * CodegenFallback is acceptable here — the decode loop itself is plain
  * JVM code either way.
  */
case class DecodeBlock(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == IntegerType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"decode_block expects (binary, int), got (${left.dataType}, ${right.dataType})")

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("docId", LongType, nullable = false),
    StructField("tf", IntegerType, nullable = false),
    StructField("dl", IntegerType, nullable = false))), containsNull = false)

  override def nullSafeEval(payload: Any, n: Any): Any = {
    val decoded = Codec.decode(payload.asInstanceOf[Array[Byte]], n.asInstanceOf[Int])
    new GenericArrayData(decoded.map(p => InternalRow(p.docId, p.tf, p.dl)): Array[Any])
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)

  override def prettyName: String = "decode_block"
}

object DecodeBlock {
  def apply(payload: Column, n: Column): Column =
    ColumnBridge.column(DecodeBlock(
      ColumnBridge.expression(payload), ColumnBridge.expression(n)))

  /** Register as a SQL function on a session. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "decode_block", exprs => DecodeBlock(exprs(0), exprs(1)), "scala_udf")
}
