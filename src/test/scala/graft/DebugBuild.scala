package graft

import org.apache.spark.sql.SparkSession
import graft.index.{IndexBuilder, IndexStore}

/** Scratch: phase timing of a 1M-turn build at a given parallelism. */
object DebugBuild {
  def main(args: Array[String]): Unit = {
    val cpus = args.headOption.getOrElse("32").toInt
    val n = args.lift(1).getOrElse("1000000").toLong
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.driver.memory", sys.env.getOrElse("SPARK_DRIVER_MEM", "32g"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val cfg = IndexBuilder.Config(numShards = cpus * 4, docIdPartitions = cpus)
    (1 to 2).foreach { rep =>
      val dir = s"/tmp/graft-dbg-build-$cpus-$rep"
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
      val turns = Bench.syntheticTurns(spark, n)
      val r = IndexStore.build(spark, turns, dir, snapshotId = s"dbg-$n-$rep", cfg)
      r.manifest.metrics.toSeq.sortBy(_._1).foreach { case (k, v) =>
        println(f"METRIC rep$rep $k%-22s $v%.2f")
      }
    }
    spark.stop()
  }
}
