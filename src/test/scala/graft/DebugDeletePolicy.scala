package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.index.{IndexBuilder, IndexStore}
import graft.query.QueryEngine

/** Delete-policy experiment: what does applying a drop set to a live index
  * cost (deleteDocs wall time), how much do accumulated tombstones tax
  * WAND latency, and does compaction restore the baseline? Companion to
  * DebugCompactPolicy — together they justify "delete freely, compact on
  * the existing delta policy".
  *
  * Usage: Test/runMain graft.DebugDeletePolicy [cpus] [turns] [dropPct] [reps]
  */
object DebugDeletePolicy {

  def main(args: Array[String]): Unit = {
    val cpus = args.lift(0).map(_.toInt).getOrElse(16)
    val turns = args.lift(1).map(_.toLong).getOrElse(400000L)
    val dropPct = args.lift(2).map(_.toInt).getOrElse(10)
    val reps = args.lift(3).map(_.toInt).getOrElse(8)

    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-delete-policy")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val cfg = IndexBuilder.Config(numShards = cpus * 4, docIdPartitions = cpus)
    val dir = s"${sys.props("java.io.tmpdir")}/graft-delete-policy"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    val queries = Seq("term00000 term00001", "term00000 term00123 term01042",
      "term02000 term03000", "term04800 term04999", "term00001")

    def queryStats(): (Double, Double) = {
      val idx = IndexStore.load(spark, dir)
      val lats = (0 until reps).flatMap { _ =>
        queries.map(q => time {
          QueryEngine.wandTopK(spark, idx.blocks, idx.termStats, idx.corpus,
            q, 10, cfg, idx.tombstoneSet).collect(): Unit
        })
      }.sorted
      (lats(lats.size / 2), lats(math.min(lats.size - 1, (lats.size * 95) / 100)))
    }

    IndexStore.build(spark, Bench.syntheticTurns(spark, turns), dir, "dp-base", cfg)
    queryStats() // JIT/codegen warmup so the baseline isn't the cold run
    val (p50o, p95o) = queryStats()
    println("=== delete policy ===")
    println(f"baseline tombstones=0 p50=${p50o}%.3f p95=${p95o}%.3f")

    // drop every (100/dropPct)-th docId — spread across every shard, the
    // worst layout for scan-side filtering
    val mod = 100 / dropPct
    val drop = spark.range(turns).select((col("id") * mod).as("docId"))
      .filter(col("docId") < turns)
    val delSec = time {
      IndexStore.deleteDocs(spark, drop.toDF(), dir, "dp-del", cfg): Unit
    }
    val m = IndexStore.readManifest(dir).get
    val nTombs = m.metrics.getOrElse("tombstones", 0.0).toLong
    val (p50d, p95d) = queryStats()
    println(f"post-delete tombstones=$nTombs ($dropPct%%) deleteSec=${delSec}%.2f p50=${p50d}%.3f p95=${p95d}%.3f")

    val compactSec = time { IndexStore.compact(spark, dir, cfg): Unit }
    val (p50c, p95c) = queryStats()
    println(f"post-compact tombstones=0 compactSec=${compactSec}%.2f p50=${p50c}%.3f p95=${p95c}%.3f")
    spark.stop()
  }
}
