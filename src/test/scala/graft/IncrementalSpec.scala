package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.index.{IndexBuilder, IndexStore}
import graft.model.Turn
import graft.query.QueryEngine
import TestKit.{spark, OracleBM25, TranscriptGen}

/** Incremental snapshot append (SURVEY §7.6): base build + delta append
  * must answer queries rank-identically to a scalar oracle over the full
  * corpus, with existing docIds unmoved and stats merged exactly.
  */
class IncrementalSpec extends AnyFunSuite {

  private val cfg = IndexBuilder.Config(docIdPartitions = 4, numShards = 8)

  // delta conversations sort after the base ones so the oracle's global
  // (conv_id, turn_idx) order equals base-ids ++ offset-delta-ids
  private def shiftConvs(ts: Seq[Turn], prefix: String): Seq[Turn] =
    ts.map(t => t.copy(conv_id = prefix + t.conv_id))

  test("append: rank-identical to oracle over base ++ delta; base ids stable") {
    val baseTurns = shiftConvs(TranscriptGen.turns(seed = 21, nConvs = 40), "a-")
    val deltaTurns = shiftConvs(TranscriptGen.turns(seed = 22, nConvs = 25), "b-")
    val dir = Files.createTempDirectory("graft-incr").toString

    val baseDs = spark.createDataset(baseTurns)(org.apache.spark.sql.Encoders.product[Turn])
    val deltaDs = spark.createDataset(deltaTurns)(org.apache.spark.sql.Encoders.product[Turn])

    IndexStore.build(spark, baseDs, dir, snapshotId = "snap-base", cfg)
    val baseIdx = IndexStore.load(spark, dir)
    val baseIds = baseIdx.docs.collect().map(d => (d.conv_id, d.turn_idx) -> d.docId).toMap

    val appended = IndexStore.appendSnapshot(spark, deltaDs, dir, "snap-delta", cfg)
    assert(appended.manifest.complete)
    val idx = IndexStore.load(spark, dir)

    // base ids unmoved; delta ids continue after them
    val allIds = idx.docs.collect().map(d => (d.conv_id, d.turn_idx) -> d.docId).toMap
    baseIds.foreach { case (k, id) => assert(allIds(k) == id, s"base id moved for $k") }
    assert(allIds.size > baseIds.size)
    assert(allIds.values.max == allIds.size - 1) // dense

    // oracle over the combined corpus (global sort == base ++ delta by
    // construction of the conv prefixes)
    val oracle = OracleBM25.corpus(baseTurns ++ deltaTurns, cfg.analyzer)
    assert(idx.manifest.docCount == oracle.n)
    assert(idx.manifest.avgdl == oracle.avgdl)

    Seq("term0000 term0001", "term0000", "term0250 term0299", "世界 café",
      "term0002 term0002 term0002").foreach { q =>
      val want = OracleBM25.topK(oracle, q, 15, cfg.analyzer)
      val got = QueryEngine.wandTopK(spark, idx.blocks, idx.termStats,
        idx.corpus, q, 15, cfg)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(got == want, s"append WAND mismatch for [$q]")
    }
  }
}
