package graft.sources

import org.apache.spark.sql.{Dataset, SparkSession}

import graft.model.Turn

/** Snapshot-isolated access to the transcripts table — the thin seam
  * SURVEY.md §7.2 promises between the engine and its source of truth.
  *
  * In production the source is an Iceberg table: immutable snapshot ids,
  * per-snapshot file manifests, commit = atomic manifest swap. This
  * sandbox ships no Iceberg runtime (`/opt/spark/jars` has none and
  * coursier is offline), so the engine is written against the two
  * properties it actually needs, and an Iceberg-backed implementation
  * (`table.snapshot(id)` / `VERSION AS OF`) drops in without touching
  * engine code:
  *
  *   1. `currentSnapshotId` is stable for unchanged data and differs for
  *      changed data — IndexStore folds it into its own snapshot ids, so
  *      build/append idempotence and cache invalidation ride it;
  *   2. `read` under one id always yields the same rows (snapshot
  *      isolation), which the deterministic docId assignment requires.
  */
trait TranscriptCatalog {

  /** Immutable id of the source table's current committed snapshot. */
  def currentSnapshotId: String

  /** The transcripts table as of [[currentSnapshotId]]. */
  def read(spark: SparkSession): Dataset[Turn]
}

/** Parquet-fixture implementation: the snapshot id is the file's
  * (path, length, mtime) fingerprint — any rewrite of the fixture commits
  * a new id, and the driver's fixtures are immutable between rewrites,
  * which is exactly the Iceberg contract at this grain.
  */
final class ParquetTranscriptCatalog(sfDir: String) extends TranscriptCatalog {

  override def currentSnapshotId: String = {
    val f = new java.io.File(s"$sfDir/documents.parquet")
    s"$sfDir|len${f.length()}|mt${f.lastModified()}"
  }

  override def read(spark: SparkSession): Dataset[Turn] = {
    import spark.implicits._
    TranscriptSource.fromDocuments(spark, sfDir).as[Turn]
  }
}
