package graft

import org.apache.spark.sql.SparkSession

/** Optimization-round instrumentation (guide §1): per-query noop-sink
  * timing with repeats + explain("formatted") capture, OUTSIDE the frozen
  * Bench harness. Never part of the driver contract.
  *
  * Usage: sbt "runMain graft.BenchExtra [reps] [query...]"
  *   env SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS as in Bench
  *   env SPARK_GRAFT_PLANS_DIR: if set, writes <query>.txt explain files
  */
object BenchExtra {

  private def time[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = f
    (a, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val reps = math.max(1, if (args.nonEmpty) args(0).toInt else 3)
    val only = args.drop(1).toSet
    val plansDir = sys.env.get("SPARK_GRAFT_PLANS_DIR")

    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench-extra")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.scheduler.mode", "FAIR")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // same warm-first-touch ordering as Bench
    def warm(f: => Unit): Double = try time(f)._2 catch { case _: Throwable => -1.0 }
    val w1 = warm { SparkEntry.index(spark, sfDir); () }
    val w2 = warm { SparkEntry.rel(spark, sfDir); () }
    val w3 = warm { graft.operators.TrainingData.warmPipeline(spark, sfDir) }
    val w4 = warm { SparkEntry.lifecycleIndex(spark, sfDir); () }
    println(f"warm_index=$w1%.2f warm_rel=$w2%.2f warm_pipeline=$w3%.2f warm_lifecycle=$w4%.2f")

    val qs = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.isEmpty || only.contains(n) }
    val results = qs.map { case (name, fn) =>
      spark.sparkContext.setJobDescription(s"bx:$name")
      plansDir.foreach { d =>
        try {
          val plan = fn(spark, sfDir).queryExecution.explainString(
            org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
          java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$d/$name.txt"), plan)
        } catch { case e: Throwable => println(s"explain $name failed: $e") }
      }
      val times = (0 until reps).map { _ =>
        try time(fn(spark, sfDir).write.format("noop").mode("overwrite").save())._2
        catch { case e: Throwable => println(s"$name failed: $e"); -1.0 }
      }
      name -> times
    }
    spark.sparkContext.setJobDescription(null)
    // failed reps are -1.0 sentinels: exclude them from min so a failure
    // can never masquerade as the fastest run or deflate the total
    def minOk(ts: Seq[Double]): Double = {
      val ok = ts.filter(_ >= 0)
      if (ok.isEmpty) -1.0 else ok.min
    }
    println("=== per-query (min / all) ===")
    results.sortBy(r => -minOk(r._2)).foreach { case (n, ts) =>
      println(f"${n}%-28s min=${minOk(ts)}%7.3f  all=${ts.map(t => f"$t%.3f").mkString(",")}")
    }
    println(f"TOTAL_MIN=${results.map(r => math.max(0.0, minOk(r._2))).sum}%.2f")
    spark.stop()
  }
}
