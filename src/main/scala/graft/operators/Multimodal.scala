package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns: image/audio/video as opaque `binary` payloads with
  * typed metadata, processed by per-partition batch transforms.
  *
  * The container has no media codecs, so the DECODE step is a clearly
  * marked deterministic STUB — but the Spark-side plumbing is real and
  * tested: the schema (binary payload + struct metadata + float-array
  * features), the partition-parallel batch shape (decoder initialized
  * once per partition, the same heavy-init pattern the reference used for
  * its SciBERT encoder, /root/reference/data_processing/semantic_index/
  * embed_generator.py:22-46), and the downstream feature columns.
  * Swapping `StubDecoder` for a real JNI/FFmpeg decoder changes no plan.
  */
object Multimodal {

  final case class MediaRow(doc_id: Long, mime: String, media: Array[Byte])

  final case class MediaMeta(width: Int, height: Int, frames: Int, durationMs: Long)

  final case class MediaFeatures(
      doc_id: Long,
      mime: String,
      n_bytes: Int,
      width: Int,
      height: Int,
      frames: Int,
      features: Array[Float]
  )

  /** STUB decoder: deterministic pseudo-metadata/features from the payload
    * bytes. A real implementation would decode the container here; the
    * interface (init once per partition, decode per batch row) is the
    * production shape. The pseudo-values derive from a 60-bit prefix of
    * md5(payload) so the driver's DuckDB oracle can recompute them exactly
    * (md5 + integer shifts + one float division are engine-portable).
    */
  final class StubDecoder {
    private val md = java.security.MessageDigest.getInstance("MD5")

    def decode(media: Array[Byte]): (MediaMeta, Array[Float]) = {
      md.reset()
      val hex = md.digest(media).take(8).map(b => f"$b%02x").mkString
      val h = java.lang.Long.parseLong(hex.substring(0, 15), 16) // 60 bits, >= 0
      val meta = MediaMeta(
        width = (64 + h % 1024).toInt,
        height = (64 + (h >>> 16) % 1024).toInt,
        frames = (1 + (h >>> 32) % 240).toInt,
        durationMs = (h >>> 24) % 600000L)
      val feats = Array.tabulate(8)(d =>
        (((h >>> (d * 7)) % 1000003L).toDouble / 1000003.0 * 2.0 - 1.0).toFloat)
      (meta, feats)
    }
  }

  /** Synthesize a deterministic media table from the documents table
    * (payload = utf-8 bytes of the text; mime round-robins image/audio/video).
    */
  def mediaTable(spark: SparkSession, sfDir: String): Dataset[MediaRow] = {
    import spark.implicits._
    spark.read.parquet(s"$sfDir/documents.parquet")
      .filter(col("text").isNotNull) // a null payload has nothing to decode
      .select(col("doc_id"),
        element_at(array(lit("image/png"), lit("audio/wav"), lit("video/mp4")),
          (col("doc_id") % 3).cast("int") + 1).as("mime"),
        encode(col("text"), "UTF-8").as("media"))
      .as[MediaRow]
  }

  /** Partition-parallel decode + feature extraction: decoder constructed
    * once per partition, rows streamed through it (never materialized).
    */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      val decoder = new StubDecoder // heavy init: once per partition
      it.map { row =>
        val (meta, feats) = decoder.decode(row.media)
        MediaFeatures(row.doc_id, row.mime, row.media.length,
          meta.width, meta.height, meta.frames, feats)
      }
    }
  }

  final case class FrameSample(doc_id: Long, mime: String, frame_idx: Int, frame_sig: String)

  /** Frame sampling for video payloads: decode the container metadata once
    * per row (per-partition decoder) and emit ~maxFrames evenly-strided
    * frame indices with a deterministic per-frame signature — the shape a
    * real pipeline uses to feed a vision encoder. A real decoder would
    * extract the frame bytes where the stub derives a signature.
    */
  def sampleFrames(media: Dataset[MediaRow], maxFrames: Int = 4): Dataset[FrameSample] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      val decoder = new StubDecoder
      val md = java.security.MessageDigest.getInstance("MD5")
      it.filter(_.mime == "video/mp4").flatMap { row =>
        val (meta, _) = decoder.decode(row.media)
        val step = math.max(1, meta.frames / maxFrames)
        (0 until meta.frames by step).map { fi =>
          md.reset()
          val sig = md.digest(s"${row.doc_id}:$fi".getBytes("UTF-8"))
            .map(b => f"$b%02x").mkString.substring(0, 16)
          FrameSample(row.doc_id, row.mime, fi, sig)
        }
      }
    }
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // full DuckDB oracle: the stub's md5-derived values are recomputable in
    // SQL; features are emitted as per-element rounded doubles (the raw
    // float array would break the harness's pandas sort)
    "mm_features" -> ((s, dir) => {
      val f = extractFeatures(mediaTable(s, dir)).toDF()
      val featCols = (0 until 8).map(d =>
        round(element_at(col("features"), d + 1).cast("double"), 6).as(s"f$d"))
      // resize: scale to fit a 224-pixel max dimension (integer floor on
      // both engines — Spark / on ints is a double division, so floor+cast)
      val resized = Seq(
        floor(col("width") * 224 / greatest(col("width"), col("height")))
          .cast("int").as("resized_w"),
        floor(col("height") * 224 / greatest(col("width"), col("height")))
          .cast("int").as("resized_h"))
      f.select(Seq(col("doc_id"), col("mime"), col("n_bytes"), col("width"),
        col("height"), col("frames")) ++ resized ++ featCols: _*)
    }),

    "mm_frame_sample" -> ((s, dir) => sampleFrames(mediaTable(s, dir)).toDF())
  )

  def oracles: Map[String, String] = {
    val featCols = (0 until 8).map(d =>
      s"round(CAST(CAST(((h >> ${d * 7}) % 1000003) / 1000003.0 * 2 - 1 AS REAL) AS DOUBLE), 6) AS f$d")
      .mkString(",\n  ")
    val mCte =
      """m AS (SELECT doc_id,
        |    CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image/png'
        |         WHEN 1 THEN 'audio/wav' ELSE 'video/mp4' END AS mime,
        |    strlen(text) AS n_bytes,
        |    CAST(('0x' || substr(md5(text), 1, 15)) AS BIGINT) AS h
        |  FROM documents WHERE text IS NOT NULL)""".stripMargin
    Map(
      "mm_features" ->
        s"""WITH $mCte,
           |dims AS (SELECT doc_id, mime, n_bytes, h,
           |    CAST(64 + h % 1024 AS INT) AS width,
           |    CAST(64 + (h >> 16) % 1024 AS INT) AS height FROM m)
           |SELECT doc_id, mime, CAST(n_bytes AS INT) AS n_bytes,
           |  width, height,
           |  CAST(1 + (h >> 32) % 240 AS INT) AS frames,
           |  CAST((width * 224) // greatest(width, height) AS INT) AS resized_w,
           |  CAST((height * 224) // greatest(width, height) AS INT) AS resized_h,
           |  $featCols
           |FROM dims""".stripMargin,
      "mm_frame_sample" ->
        s"""WITH $mCte,
           |v AS (SELECT doc_id, CAST(1 + (h >> 32) % 240 AS BIGINT) AS frames
           |      FROM m WHERE mime = 'video/mp4'),
           |fr AS (SELECT doc_id, unnest(range(0, frames, greatest(1, frames // 4))) AS fi
           |       FROM v)
           |SELECT doc_id, 'video/mp4' AS mime, CAST(fi AS INT) AS frame_idx,
           |  substr(md5(CAST(doc_id AS VARCHAR) || ':' || CAST(fi AS VARCHAR)), 1, 16) AS frame_sig
           |FROM fr""".stripMargin
    )
  }
}
