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

  test("features are a function of payload bytes (equal text => equal features)") {
    val feats = Multimodal.extractFeatures(Multimodal.mediaTable(spark, dir)).collect()
    val texts = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val byText = feats.groupBy(f => texts(f.doc_id))
    byText.values.filter(_.length > 1).foreach { group =>
      assert(group.map(_.features.toSeq).distinct.size == 1)
    }
  }
}
