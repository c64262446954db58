package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch: pure CPU-bound Spark job (sha2 over range, no I/O, no shuffle)
  * at 8 vs 32 threads — measures the VM's achievable scaling ceiling.
  */
object DebugCpu {
  def run(cpus: Int, n: Long): Double = {
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      val t0 = System.nanoTime()
      spark.range(0, n, 1, cpus)
        .select(sum(length(sha2(concat(lit("x"), col("id").cast("string")), 256))))
        .collect()
      (System.nanoTime() - t0) / 1e9
    } finally spark.stop()
  }
  def main(args: Array[String]): Unit = {
    val n = args.headOption.getOrElse("30000000").toLong
    run(32, n / 10) // warmup
    (1 to 2).foreach { r =>
      val t32 = run(32, n)
      val t8 = run(8, n)
      println(f"CPU round=$r t8=$t8%.1f t32=$t32%.1f efficiency=${t8 / (4.0 * t32)}%.3f")
    }
  }
}
