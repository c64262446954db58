package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Multimodal
import TestKit.spark

/** Multimodal plumbing: schema, per-partition decoder lifecycle,
  * determinism of the stubbed decode across partition layouts.
  */
class MultimodalSpec extends AnyFunSuite {

  private val dir = "/root/testdata/sf0.001"

  test("media table schema: binary payload + typed columns") {
    val m = Multimodal.mediaTable(spark, dir)
    val schema = m.schema
    assert(schema("media").dataType == org.apache.spark.sql.types.BinaryType)
    assert(m.count() > 0)
  }

  test("feature extraction: deterministic across partition counts") {
    val m = Multimodal.mediaTable(spark, dir)
    val a = Multimodal.extractFeatures(m.repartition(1))
      .collect().map(f => f.doc_id -> (f.width, f.height, f.frames, f.features.toSeq)).toMap
    val b = Multimodal.extractFeatures(m.repartition(7))
      .collect().map(f => f.doc_id -> (f.width, f.height, f.frames, f.features.toSeq)).toMap
    assert(a == b)
    assert(a.values.forall(_._4.length == 8))
    assert(a.values.forall { case (w, h, fr, _) => w >= 64 && h >= 64 && fr >= 1 })
  }

  test("features are a function of payload bytes (equal payload => equal features)") {
    import spark.implicits._
    // the sf fixtures have 500 DISTINCT texts, so a grouped-by-text check
    // would be vacuous — construct duplicate payloads explicitly
    val rows = Seq(
      Multimodal.MediaRow(0L, "image/png", "same payload".getBytes("UTF-8")),
      Multimodal.MediaRow(1L, "audio/wav", "same payload".getBytes("UTF-8")),
      Multimodal.MediaRow(2L, "video/mp4", "different!".getBytes("UTF-8")))
    val got = Multimodal.extractFeatures(spark.createDataset(rows)).collect()
      .map(f => f.doc_id -> (f.width, f.height, f.frames, f.features.toSeq)).toMap
    assert(got(0L) == got(1L), "equal payloads must decode identically")
    assert(got(0L) != got(2L), "different payloads must not collide")
  }
}
