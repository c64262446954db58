package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery}
import org.apache.spark.sql.types.StructType

import graft.index.{IndexBuilder, IndexStore}
import graft.model.Turn

/** Structured Streaming surface.
  *
  * The reference has no streaming at all (SURVEY.md §2.11) and the north
  * rule's incrementality is batch-snapshot based — this module exists to
  * cover the streaming-ingest shape a transcript pipeline needs at scale:
  * watermarked windowed aggregation over an event stream, and custom
  * sessionization state via mapGroupsWithState. Tested with the parquet
  * file-stream source + memory sink (StreamingSpec).
  */
object EventStream {

  /** Watermarked tumbling-window aggregation (5-minute windows, 10-minute
    * watermark) over (ts, event_type, value).
    */
  def windowedCounts(events: DataFrame): DataFrame =
    events
      // parquet timestamp[us] loads as TIMESTAMP_NTZ; event-time semantics
      // (watermarks) require TIMESTAMP_LTZ
      .withColumn("ts", col("ts").cast("timestamp"))
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total"))

  final case class Session(user_id: Long, n_events: Long, total: Double)

  /** Per-user running session state via mapGroupsWithState (the
    * KeyValueGroupedDataset custom-state shape).
    */
  def sessionize(spark: SparkSession, events: DataFrame): DataFrame = {
    import spark.implicits._
    events
      .selectExpr("user_id", "value")
      .as[(Long, Double)]
      .groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout()) {
        (user: Long, rows: Iterator[(Long, Double)], state: GroupState[Session]) =>
          val prev = state.getOption.getOrElse(Session(user, 0L, 0.0))
          var n = prev.n_events
          var total = prev.total
          rows.foreach { case (_, v) => n += 1; total += v }
          val next = Session(user, n, total)
          state.update(next)
          next
      }
      .toDF()
  }

  /** File-stream source over a parquet events directory with an explicit
    * schema (streaming sources cannot infer). `dir` must be a directory;
    * `glob` selects the files inside it.
    */
  def readEvents(spark: SparkSession, dir: String, glob: String, schema: StructType): DataFrame =
    spark.readStream.schema(schema)
      .option("pathGlobFilter", glob)
      .parquet(dir)

  /** Continuous indexing: every micro-batch of new turns lands in the BM25
    * index as an incremental snapshot — the first batch is a full build,
    * later batches go through the crash-safe appendSnapshot (staged dirs +
    * atomic manifest commit), so a long-lived ingest stream keeps the index
    * queryable and fresh without rebuilds. foreachBatch is the Structured
    * Streaming pattern for transactional sinks; the manifest commit IS the
    * transaction, so a batch that dies mid-append is simply retried.
    */
  /** @param compactAfterDeltas when > 0, compact the index back to a
    *        single block dir once more than this many dirs accumulate
    *        (the Lucene-merge policy knob; 0 = never). Default 4 is
    *        measured, not guessed (DebugCompactPolicy, 400k base + 50k
    *        deltas, local[16]): WAND p50 degrades ~8-10% per accumulated
    *        delta dir (0.23s at 1 dir -> 0.50s at 9 — per-dir listing/scan
    *        overhead, not corpus growth), compaction restores the
    *        single-dir baseline, and its one-off cost (~6.6s at 800k
    *        turns) amortizes over the queries served between compactions.
    *        4 dirs caps the degradation near +30%.
    *        Readers are safe across the compaction: the superseded
    *        block/doc dirs enter the manifest's one-commit grace window
    *        (deleted only after the NEXT commit — here, after the next
    *        appended batch), so a serving session holding the
    *        pre-compaction `IndexStore.load` handle keeps answering
    *        queries and re-loads at its own pace; it only needs to
    *        re-load at least once per commit, which an ingest cadence of
    *        minutes makes trivial (IncrementalSpec holds a handle across
    *        a live compaction to pin this). A reader that might lag a
    *        full commit behind calls `Index.requireServable()` before a
    *        query burst — it fails fast with a clear "stale handle —
    *        reload" diagnosis instead of a mid-scan FileNotFoundException.
    * @param checkpointDir Structured Streaming checkpoint location —
    *        REQUIRED, because the sink's idempotence is keyed by batchId:
    *        under a checkpoint, Spark's replay contract guarantees a
    *        replayed batchId carries the same data, so the manifest's
    *        snapshot-id history makes every retry/restart exactly-once.
    *        Without a checkpoint a restarted source re-batches from
    *        scratch, and a batchId no longer identifies batch CONTENT —
    *        data that arrived while the stream was down would be silently
    *        skipped as "already committed". Making the parameter mandatory
    *        closes that failure mode instead of documenting it.
    */
  def indexTurns(spark: SparkSession, turns: DataFrame, indexDir: String,
      checkpointDir: String,
      cfg: IndexBuilder.Config = IndexBuilder.Config(),
      compactAfterDeltas: Int = 4): StreamingQuery = {
    val writer = turns.writeStream
      .outputMode(OutputMode.Append())
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        val ds = batch.as[Turn](org.apache.spark.sql.Encoders.product[Turn])
        if (!ds.isEmpty) {
          if (IndexStore.readManifest(indexDir).exists(_.complete))
            IndexStore.appendSnapshot(spark, ds, indexDir, s"stream-batch-$batchId", cfg)
          else
            IndexStore.build(spark, ds, indexDir, s"stream-batch-$batchId", cfg)
          if (compactAfterDeltas > 0 &&
              IndexStore.readManifest(indexDir).exists(_.blockDirs.size > compactAfterDeltas))
            IndexStore.compact(spark, indexDir, cfg)
        }
        ()
      }
    writer.option("checkpointLocation", checkpointDir).start()
  }

  /** Drive a streaming query synchronously to completion on a static dir
    * (memory sink), returning the materialized result.
    */
  def runOnce(spark: SparkSession, plan: DataFrame, name: String,
      mode: OutputMode = OutputMode.Append()): DataFrame = {
    val q = plan.writeStream
      .outputMode(mode)
      .format("memory")
      .queryName(name)
      .start()
    q.processAllAvailable()
    q.stop()
    spark.table(name)
  }
}
