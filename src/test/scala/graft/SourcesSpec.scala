package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.index.IndexStore
import graft.sources.TranscriptSource
import TestKit.spark

/** Source/sink coverage (SURVEY §2.1): S1 JSON-lines scan with explicit
  * schema, S3/S5 manifest text round-trip, S4 parquet sink via the store.
  */
class SourcesSpec extends AnyFunSuite {

  test("S1: JSON-lines scan with the transcripts schema") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-json").toString
    val rows = Seq(
      """{"conv_id":"c1","turn_idx":0,"role":"user","text":"hello Wörld","tool":"","ts":"2026-01-01T00:00:00.000Z"}""",
      """{"conv_id":"c1","turn_idx":1,"role":"assistant","text":"data table","tool":"","ts":"2026-01-01T00:00:01.000Z"}""")
    Files.writeString(java.nio.file.Paths.get(dir, "part-0.json"), rows.mkString("\n"))
    val df = spark.read.schema(TranscriptSource.schema).json(dir)
    assert(df.count() == 2)
    val got = df.orderBy($"turn_idx").collect()
    assert(got(0).getAs[String]("text") == "hello Wörld")
    assert(got(1).getAs[Int]("turn_idx") == 1)
  }

  test("S3/S5: manifest JSON round-trips through the atomic writer") {
    val dir = Files.createTempDirectory("graft-manifest").toString
    val m = IndexStore.Manifest("snap \"quoted\"\nnewline", "lower+stop(181)",
      1.2, 0.75, 8, 100L, 128, 777L, 24.25,
      Seq(IndexStore.ShardLineage(0, 10L, 2L, 123L, -5L)),
      Map("buildSec" -> 1.5, "skewRatio" -> 1.0),
      blockDirs = Seq("blocks", "delta-v1/blocks"),
      docDirs = Seq("docs", "delta-v1/docs"),
      termstatsDir = "termstats-v1", complete = true,
      // ']' in an id must not truncate the array parse; quotes/newlines
      // must round-trip through the escaper
      history = Seq("snap \"quoted\"\nnewline", "batch[3]", "snap-2"))
    IndexStore.writeManifest(dir, m)
    val got = IndexStore.readManifest(dir)
    assert(got.contains(m))
  }

  test("transcripts derivation matches the pinned schema") {
    val df = TranscriptSource.fromDocuments(spark, "/root/testdata/sf0.001")
    assert(df.schema.fieldNames.toSeq ==
      Seq("conv_id", "turn_idx", "role", "text", "tool", "ts"))
    assert(df.count() > 0)
  }

  test("manifest v7 fields (nextDocId, tombstone/grace dirs) round-trip") {
    val dir = Files.createTempDirectory("graft-manifest-v7").toString
    val m = IndexStore.Manifest("s", "a", 1.2, 0.75, 8, 100L, 128, 700L, 20.0,
      Nil, Map("dirGen" -> 3.0), blockDirs = Seq("blocks"),
      docDirs = Seq("docs"), termstatsDir = "termstats-g3", complete = true,
      history = Seq("s"), positional = true, nextDocId = 777L,
      tombstoneDirs = Seq("tombstones-g3"),
      graceDirs = Seq("termstats-g2", "tombstones-g2"))
    IndexStore.writeManifest(dir, m)
    assert(IndexStore.readManifest(dir).contains(m))
  }

  test("TranscriptCatalog: stable snapshot id for unchanged data; read == transcripts") {
    val cat = new graft.sources.ParquetTranscriptCatalog("/root/testdata/sf0.001")
    assert(cat.currentSnapshotId == cat.currentSnapshotId)
    assert(cat.currentSnapshotId !=
      new graft.sources.ParquetTranscriptCatalog("/root/testdata/sf0.01").currentSnapshotId)
    val viaCatalog = cat.read(spark).count()
    assert(viaCatalog ==
      TranscriptSource.fromDocuments(spark, "/root/testdata/sf0.001").count())
    assert(viaCatalog > 0)
  }
}
