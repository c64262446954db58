package graft

import org.apache.spark.sql.SparkSession
import graft.index.{IndexBuilder, IndexStore}

/** Scratch: interleaved 8/32-thread builds of the same input to separate
  * scaling signal from this VM's noisy performance. Prints every run.
  */
object DebugScale {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.getOrElse("2000000").toLong
    val rounds = args.lift(1).getOrElse("2").toInt
    def build(cpus: Int): Double = {
      val spark = SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus.toString)
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      spark.sparkContext.setLogLevel("WARN")
      try {
        val dir = s"/tmp/graft-scale-$cpus"
        org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
        val cfg = IndexBuilder.Config(numShards = 128, docIdPartitions = cpus)
        val t0 = System.nanoTime()
        IndexStore.build(spark, Bench.syntheticTurns(spark, n), dir, s"scale-$n", cfg)
        (System.nanoTime() - t0) / 1e9
      } finally spark.stop()
    }
    val results = scala.collection.mutable.Map.empty[Int, List[Double]].withDefaultValue(Nil)
    (1 to rounds).foreach { r =>
      Seq(32, 8).foreach { c =>
        val sec = build(c)
        results(c) ::= sec
        println(f"SCALE round=$r cpus=$c sec=$sec%.1f tps=${n / sec}%.0f")
      }
    }
    val best32 = results(32).min
    val best8 = results(8).min
    println(f"SCALE best8=$best8%.1f best32=$best32%.1f efficiency=${(n / best32) / (4.0 * (n / best8))}%.3f")
  }
}
