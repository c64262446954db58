package graft

import org.apache.spark.sql.SparkSession

import graft.index.{IndexBuilder, IndexStore}
import graft.query.QueryEngine

/** Compaction-policy experiment: how does WAND query latency degrade as
  * delta dirs accumulate, and what does a compact cost? Drives the default
  * `compactAfterDeltas` in streaming ingest from data, not guesswork.
  *
  * Usage: Test/runMain graft.DebugCompactPolicy [cpus] [baseTurns] [deltaTurns] [deltas] [reps]
  */
object DebugCompactPolicy {

  def main(args: Array[String]): Unit = {
    val cpus = args.lift(0).map(_.toInt).getOrElse(16)
    val baseTurns = args.lift(1).map(_.toLong).getOrElse(400000L)
    val deltaTurns = args.lift(2).map(_.toLong).getOrElse(50000L)
    val deltas = args.lift(3).map(_.toInt).getOrElse(8)
    val reps = args.lift(4).map(_.toInt).getOrElse(8)

    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-compact-policy")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val cfg = IndexBuilder.Config(numShards = cpus * 4, docIdPartitions = cpus)
    val dir = s"${sys.props("java.io.tmpdir")}/graft-compact-policy"
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
          QueryEngine.wandTopK(spark, idx.blocks, idx.termStats, idx.corpus, q, 10, cfg)
            .collect(): Unit
        })
      }.sorted
      (lats(lats.size / 2), lats(math.min(lats.size - 1, (lats.size * 95) / 100)))
    }

    // base build, then append deltas one at a time, measuring after each
    IndexStore.build(spark, Bench.syntheticTurns(spark, baseTurns), dir, "cp-base", cfg)
    val rows = Seq.newBuilder[String]
    val (p50o, p95o) = queryStats()
    rows += f"deltas=0 dirs=1 p50=${p50o}%.3f p95=${p95o}%.3f"
    (1 to deltas).foreach { i =>
      // distinct conv ids per delta: shift the synthetic id space
      val d = Bench.syntheticTurns(spark, deltaTurns)
        .withColumnRenamed("conv_id", "cid0")
        .selectExpr(s"concat('d$i-', cid0) AS conv_id", "turn_idx", "role", "text", "tool", "ts")
        .as[graft.model.Turn](org.apache.spark.sql.Encoders.product[graft.model.Turn])
      IndexStore.appendSnapshot(spark, d, dir, s"cp-delta-$i", cfg)
      val m = IndexStore.readManifest(dir).get
      val (p50, p95) = queryStats()
      rows += f"deltas=$i dirs=${m.blockDirs.size} p50=${p50}%.3f p95=${p95}%.3f"
    }
    val compactSec = time { IndexStore.compact(spark, dir, cfg): Unit }
    val (p50c, p95c) = queryStats()
    rows += f"post-compact dirs=1 p50=${p50c}%.3f p95=${p95c}%.3f compactSec=${compactSec}%.2f"
    println("=== compact policy ===")
    rows.result().foreach(println)
    spark.stop()
  }
}
