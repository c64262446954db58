package graft

import org.apache.spark.sql.SparkSession

import graft.index.{IndexBuilder, IndexStore}

/** Scratch: A/B the parquet compression codec for the build's two big
  * writes (docs + blocks), alternating best-of in ONE JVM to dodge the
  * VM noise and JIT-order bias. `sbt "Test/runMain graft.DebugCodecAB
  * [turns] [rounds]"`.
  */
object DebugCodecAB {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.getOrElse("2000000").toLong
    val rounds = args.lift(1).getOrElse("3").toInt
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val cfg = IndexBuilder.Config(numShards = 64, docIdPartitions = 16)
    val codecs = Seq("zstd", "snappy", "lz4")
    val results = scala.collection.mutable.Map.empty[String, List[Double]]
      .withDefaultValue(Nil)
    // warmup
    spark.conf.set("spark.sql.parquet.compression.codec", "snappy")
    IndexStore.build(spark, Bench.syntheticTurns(spark, 200000L),
      "/tmp/graft-ab-warm", "warm", cfg)
    (1 to rounds).foreach { r =>
      codecs.foreach { c =>
        spark.conf.set("spark.sql.parquet.compression.codec", c)
        val dir = s"/tmp/graft-ab-$c-$r"
        org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
        val t0 = System.nanoTime()
        val res = IndexStore.build(spark, Bench.syntheticTurns(spark, n), dir, s"ab-$c-$r", cfg)
        val sec = (System.nanoTime() - t0) / 1e9
        results(c) = sec :: results(c)
        println(f"[ab] round $r codec $c%-7s build ${sec}%6.2f s  " +
          f"(blocks ${res.manifest.metrics("bytesCompressed") / 1e6}%.0f MB)")
      }
    }
    codecs.foreach { c =>
      println(f"[ab] BEST $c%-7s ${results(c).min}%6.2f s  (runs: ${results(c).reverse.map(v => f"$v%.1f").mkString(", ")})")
    }
    spark.stop()
  }
}
