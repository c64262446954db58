package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Sources for the canonical transcripts table
  * (conv_id string, turn_idx int, role string, text string, tool string,
  * ts timestamp) — the `input_hint` shape.
  *
  * In production this is an Iceberg table scan; this sandbox has no Iceberg
  * runtime on the classpath (see SURVEY.md §7.2), so `TranscriptCatalog`
  * reproduces the snapshot semantics the engine needs (immutable snapshot
  * ids, atomic manifest commit) over plain Parquet, and `fromDocuments`
  * derives a deterministic transcripts table from the driver-provided
  * `documents.parquet` so the DuckDB oracle can re-derive the exact same
  * rows in SQL.
  */
object TranscriptSource {

  val schema: StructType = StructType(Seq(
    StructField("conv_id", StringType, nullable = false),
    StructField("turn_idx", IntegerType, nullable = false),
    StructField("role", StringType, nullable = false),
    StructField("text", StringType, nullable = true),
    StructField("tool", StringType, nullable = true),
    StructField("ts", TimestampType, nullable = false)
  ))

  /** Conversations per derivation: doc i becomes turn (i / CONVS) of
    * conversation (i % CONVS). Every arithmetic step below is mirrored
    * verbatim in `oracleSqlView` so Spark and DuckDB agree bit-for-bit.
    */
  val Convs = 100

  /** Digits in the zero-padded conv number ('conv-0042'). Shared by the
    * forward lpad and BOTH inverse derivations below, so widening the id
    * space can never desynchronize them.
    */
  val ConvDigits = 4

  /** Inverse derivation: recover the source documents.doc_id from a
    * transcript row (doc_id = turn_idx * Convs + conv number). ONE
    * definition for the engine (Column) and the oracle (SQL) — e.g. the
    * delete lifecycle maps dedup losers through it.
    */
  def srcDocIdCol: org.apache.spark.sql.Column =
    col("turn_idx").cast("long") * Convs +
      substring(col("conv_id"), 6, ConvDigits).cast("long")

  def srcDocIdSql: String =
    s"(turn_idx * $Convs + CAST(substr(conv_id, 6, $ConvDigits) AS BIGINT))"

  private val epoch = "2026-01-01 00:00:00"

  /** Deterministic transcripts derived from `<sfDir>/documents.parquet`
    * (doc_id, text, lang, source, n_chars).
    */
  def fromDocuments(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val m = col("doc_id") % Convs
    val role = (col("doc_id") % 4).cast("int")
    docs.select(
      concat(lit("conv-"), lpad(m.cast("string"), ConvDigits, "0")).as("conv_id"),
      floor(col("doc_id") / Convs).cast("int").as("turn_idx"),
      when(role === 0, "user").when(role === 1, "assistant")
        .when(role === 2, "system").otherwise("tool").as("role"),
      col("text"),
      when(role === 3, "search").otherwise("").as("tool"),
      expr(s"timestampadd(SECOND, doc_id, TIMESTAMP '$epoch')").as("ts")
    )
  }

  /** DuckDB SQL producing the identical rows (used as a CTE by every
    * oracle query). Kept textually close to `fromDocuments`.
    */
  def oracleSqlView(sfDir: String): String =
    s"""SELECT
       |  'conv-' || lpad(CAST(doc_id % $Convs AS VARCHAR), $ConvDigits, '0') AS conv_id,
       |  CAST(floor(doc_id / $Convs) AS INT) AS turn_idx,
       |  CASE CAST(doc_id % 4 AS INT) WHEN 0 THEN 'user' WHEN 1 THEN 'assistant'
       |       WHEN 2 THEN 'system' ELSE 'tool' END AS role,
       |  text,
       |  CASE CAST(doc_id % 4 AS INT) WHEN 3 THEN 'search' ELSE '' END AS tool,
       |  TIMESTAMP '$epoch' + to_seconds(doc_id) AS ts
       |FROM '$sfDir/documents.parquet'""".stripMargin
}
