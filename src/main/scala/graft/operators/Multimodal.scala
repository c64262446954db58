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
    * production shape.
    */
  final class StubDecoder {
    def decode(media: Array[Byte]): (MediaMeta, Array[Float]) = {
      var h = 1125899906842597L // deterministic FNV-ish rolling hash
      var i = 0
      while (i < media.length) { h = 31 * h + (media(i) & 0xff); i += 1 }
      val meta = MediaMeta(
        width = 64 + math.floorMod(h, 1024).toInt,
        height = 64 + math.floorMod(h >>> 16, 1024).toInt,
        frames = 1 + math.floorMod(h >>> 32, 240).toInt,
        durationMs = math.floorMod(h >>> 24, 600000L))
      val feats = Array.tabulate(8)(d =>
        (math.floorMod(h >>> (d * 7), 1000003L).toFloat / 1000003.0f) * 2f - 1f)
      (meta, feats)
    }
  }

  /** Synthesize a deterministic media table from the documents table
    * (payload = utf-8 bytes of the text; mime round-robins image/audio/video).
    */
  def mediaTable(spark: SparkSession, sfDir: String): Dataset[MediaRow] = {
    import spark.implicits._
    spark.read.parquet(s"$sfDir/documents.parquet")
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

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // rows-only check: features are hash-stub-derived (no SQL twin), but
    // determinism + schema are asserted in MultimodalSpec
    "mm_features" -> ((s, dir) =>
      extractFeatures(mediaTable(s, dir)).toDF()
        .select(col("doc_id"), col("mime"), col("n_bytes"), col("width"),
          col("height"), col("frames"), col("features")))
  )
}
