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
        .config("spark.local.dir", "/dev/shm/spark-local")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      spark.sparkContext.setLogLevel("WARN")
      try {
        val dir = s"/dev/shm/graft-scale-$cpus"
        org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
        val cfg = IndexBuilder.Config(numShards = 128, docIdPartitions = cpus)
        val t0 = System.nanoTime()
        IndexStore.build(spark, Bench.syntheticTurns(spark, n), dir, s"scale-$n", cfg)
        (System.nanoTime() - t0) / 1e9
      } finally spark.stop()
    }
    val results = scala.collection.mutable.Map.empty[Int, List[Double]].withDefaultValue(Nil)
    (1 to rounds).foreach { r =>
      Seq(args.lift(2).map(_.toInt).getOrElse(32), args.lift(3).map(_.toInt).getOrElse(8)).foreach { c =>
        val sec = build(c)
        results(c) ::= sec
        println(f"SCALE round=$r cpus=$c sec=$sec%.1f tps=${n / sec}%.0f")
      }
    }
    val hi = args.lift(2).map(_.toInt).getOrElse(32)
    val lo = args.lift(3).map(_.toInt).getOrElse(8)
    val bestHi = results(hi).min
    val bestLo = results(lo).min
    println(f"SCALE best$lo=$bestLo%.1f best$hi=$bestHi%.1f efficiency=${(n / bestHi) / (4.0 * (n / bestLo))}%.3f")
  }
}
