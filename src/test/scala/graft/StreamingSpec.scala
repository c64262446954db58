package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.EventStream
import TestKit.spark

/** Structured Streaming surface driven synchronously over the static
  * events table (parquet file-stream source + memory sink).
  */
class StreamingSpec extends AnyFunSuite {

  private val dir = "/root/testdata/sf0.001"

  test("watermarked windowed aggregation matches the batch plan") {
    val batch = spark.read.parquet(s"$dir/events.parquet")
    val schema = batch.schema
    val stream = EventStream.readEvents(spark, dir, "events.parquet", schema)
    val got = EventStream.runOnce(spark,
      EventStream.windowedCounts(stream), "win_counts", OutputMode.Append())
      .select(col("window.start").as("ws"), col("event_type"), col("n"),
        round(col("total"), 4).as("total"))
      .collect().map(_.toSeq).toSet
    val want = batch
      .withColumn("ts", col("ts").cast("timestamp")) // same NTZ->LTZ cast as the stream plan
      .groupBy(window(col("ts"), "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total"))
      .select(col("window.start").as("ws"), col("event_type"), col("n"),
        round(col("total"), 4).as("total"))
      .collect().map(_.toSeq).toSet
    // append mode emits only windows past the watermark; every emitted
    // window must agree with the batch computation AND cover most of them
    // (a bare nonEmpty would pass even if ~all windows were dropped)
    assert(got.subsetOf(want), "streamed window disagrees with batch")
    assert(got.size >= want.size / 2,
      s"stream emitted only ${got.size} of ${want.size} closed windows")
  }

  test("continuous indexing: micro-batches append snapshots; index stays oracle-exact") {
    import java.nio.file.Files
    import graft.index.{IndexBuilder, IndexStore}
    import graft.model.Turn
    import graft.query.QueryEngine
    import TestKit.{OracleBM25, TranscriptGen}
    val cfg = IndexBuilder.Config(docIdPartitions = 2, numShards = 4)
    def shift(ts: Seq[Turn], p: String) = ts.map(t => t.copy(conv_id = p + t.conv_id))
    val base = shift(TranscriptGen.turns(seed = 61, nConvs = 12), "a-")
    val delta = shift(TranscriptGen.turns(seed = 62, nConvs = 8), "b-")
    val srcDir = Files.createTempDirectory("graft-stream-src").toString
    val idxDir = Files.createTempDirectory("graft-stream-idx").toString
    val enc = org.apache.spark.sql.Encoders.product[Turn]

    spark.createDataset(base)(enc).coalesce(1).write.mode("append").parquet(srcDir)
    val stream = spark.readStream.schema(enc.schema)
      .option("pathGlobFilter", "*.parquet").parquet(srcDir)
    val q = graft.streaming.EventStream.indexTurns(spark, stream, idxDir,
      Files.createTempDirectory("graft-stream-ckpt").toString, cfg)
    try {
      q.processAllAvailable()
      val idx1 = IndexStore.load(spark, idxDir)
      assert(idx1.manifest.docCount == OracleBM25.corpus(base, cfg.analyzer).n)
      // a later micro-batch arrives and is appended incrementally
      spark.createDataset(delta)(enc).coalesce(1).write.mode("append").parquet(srcDir)
      q.processAllAvailable()
    } finally q.stop()

    val idx = IndexStore.load(spark, idxDir)
    val oracle = OracleBM25.corpus(base ++ delta, cfg.analyzer)
    assert(idx.manifest.docCount == oracle.n)
    assert(idx.manifest.blockDirs.size >= 2, "delta batch should be an append, not a rebuild")
    Seq("term0000 term0001", "term0002").foreach { text =>
      val want = OracleBM25.topK(oracle, text, 10, cfg.analyzer)
      val got = QueryEngine.wandTopK(spark, idx.blocks, idx.termStats,
        idx.corpus, text, 10, cfg)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(got == want, s"stream-indexed mismatch for [$text]")
    }
  }

  test("continuous indexing: checkpointed restart resumes without duplicating turns") {
    import java.nio.file.Files
    import graft.index.{IndexBuilder, IndexStore}
    import graft.model.Turn
    import TestKit.{OracleBM25, TranscriptGen}
    val cfg = IndexBuilder.Config(docIdPartitions = 2, numShards = 4)
    def shift(ts: Seq[Turn], p: String) = ts.map(t => t.copy(conv_id = p + t.conv_id))
    val base = shift(TranscriptGen.turns(seed = 71, nConvs = 10), "a-")
    val delta = shift(TranscriptGen.turns(seed = 72, nConvs = 6), "b-")
    val srcDir = Files.createTempDirectory("graft-ckpt-src").toString
    val idxDir = Files.createTempDirectory("graft-ckpt-idx").toString
    val ckptDir = Files.createTempDirectory("graft-ckpt-meta").toString
    val enc = org.apache.spark.sql.Encoders.product[Turn]
    def startQuery() = {
      val stream = spark.readStream.schema(enc.schema)
        .option("pathGlobFilter", "*.parquet").parquet(srcDir)
      graft.streaming.EventStream.indexTurns(spark, stream, idxDir, ckptDir, cfg)
    }

    spark.createDataset(base)(enc).coalesce(1).write.mode("append").parquet(srcDir)
    val q1 = startQuery()
    try q1.processAllAvailable() finally q1.stop()
    assert(IndexStore.load(spark, idxDir).manifest.docCount ==
      OracleBM25.corpus(base, cfg.analyzer).n)

    // new data arrives while the stream is DOWN; the restarted query must
    // resume from the checkpoint — indexing only the delta, exactly once
    spark.createDataset(delta)(enc).coalesce(1).write.mode("append").parquet(srcDir)
    val q2 = startQuery()
    try q2.processAllAvailable() finally q2.stop()
    val m = IndexStore.load(spark, idxDir).manifest
    assert(m.docCount == OracleBM25.corpus(base ++ delta, cfg.analyzer).n,
      "restart must index the delta exactly once (no loss, no duplication)")
  }

  test("deletes compose with streaming ingest: drop mid-stream, survivors + later batches exact") {
    // the operational pattern: a dedup/redaction job applies a drop set
    // BETWEEN micro-batches (single-writer contract), the stream keeps
    // appending afterwards, and the in-stream compaction eventually purges
    import java.nio.file.Files
    import graft.index.{IndexBuilder, IndexStore}
    import graft.model.Turn
    import graft.query.QueryEngine
    import TestKit.{OracleBM25, TranscriptGen}
    import spark.implicits._
    val cfg = IndexBuilder.Config(docIdPartitions = 2, numShards = 4)
    def shift(ts: Seq[Turn], p: String) = ts.map(t => t.copy(conv_id = p + t.conv_id))
    val base = shift(TranscriptGen.turns(seed = 73, nConvs = 10), "a-")
    val delta = shift(TranscriptGen.turns(seed = 74, nConvs = 6), "b-")
    val srcDir = Files.createTempDirectory("graft-sdel-src").toString
    val idxDir = Files.createTempDirectory("graft-sdel-idx").toString
    val ckptDir = Files.createTempDirectory("graft-sdel-ckpt").toString
    val enc = org.apache.spark.sql.Encoders.product[Turn]
    def startQuery() = {
      val stream = spark.readStream.schema(enc.schema)
        .option("pathGlobFilter", "*.parquet").parquet(srcDir)
      // compactAfterDeltas = 1: force an in-stream compaction on the next
      // batch so it must purge the tombstones under the grace window
      graft.streaming.EventStream.indexTurns(spark, stream, idxDir, ckptDir, cfg,
        compactAfterDeltas = 1)
    }

    spark.createDataset(base)(enc).coalesce(1).write.mode("append").parquet(srcDir)
    val q1 = startQuery()
    try q1.processAllAvailable() finally q1.stop()

    // stream is down: apply a drop set (every 3rd doc)
    val fullBase = OracleBM25.corpus(base, cfg.analyzer)
    val drop = fullBase.docs.map(_._1).filter(_ % 3 == 0).toSet
    IndexStore.deleteDocs(spark, drop.toSeq.toDF("docId"), idxDir, "sdel-drop", cfg)

    // stream restarts from the checkpoint, appends the next batch, and its
    // compaction policy kicks in
    spark.createDataset(delta)(enc).coalesce(1).write.mode("append").parquet(srcDir)
    val q2 = startQuery()
    try q2.processAllAvailable() finally q2.stop()

    val idx = IndexStore.load(spark, idxDir)
    // the in-stream compaction purged the tombstones physically
    assert(idx.manifest.tombstoneDirs.isEmpty && idx.tombstoneSet.isEmpty,
      "in-stream compaction should have purged the tombstones")
    val combined = OracleBM25.corpus(base ++ delta, cfg.analyzer)
    val survivors = {
      val docs = combined.docs.filterNot { case (id, _) => drop.contains(id) }
      val postings = combined.postings
        .map { case (t, m) => t -> m.filterNot { case (id, _) => drop.contains(id) } }
        .filter(_._2.nonEmpty)
      val n = docs.size.toLong
      val avgdl = if (n == 0) 0.0 else docs.map(d => combined.dl(d._1)).sum.toDouble / n
      OracleBM25.Corpus(docs, combined.dl, postings, n, avgdl)
    }
    assert(idx.manifest.docCount == survivors.n)
    assert(idx.manifest.avgdl == survivors.avgdl)
    Seq("term0000 term0001", "term0002").foreach { text =>
      val want = OracleBM25.topK(survivors, text, 10, cfg.analyzer)
      val got = QueryEngine.wandTopK(spark, idx.blocks, idx.termStats,
        idx.corpus, text, 10, cfg, idx.tombstoneSet)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(got == want, s"stream+delete mismatch for [$text]")
    }
  }

  test("stateful sessionization via mapGroupsWithState") {
    val batch = spark.read.parquet(s"$dir/events.parquet")
    val stream = EventStream.readEvents(spark, dir, "events.parquet", batch.schema)
    val got = EventStream.runOnce(spark,
      EventStream.sessionize(spark, stream), "sessions", OutputMode.Update())
      .groupBy(col("user_id")).agg(max(col("n_events")).as("n_events"),
        round(max(col("total")), 4).as("total"))
      .collect().map(_.toSeq).toSet
    val want = batch.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 4).as("total"))
      .collect().map(_.toSeq).toSet
    assert(got == want)
  }
}
