package graft

import org.apache.spark.sql.SparkSession

/** Scratch: action/job count + noop latency for the composed-path entries
  * (phrase count job + idf collect + scoring job today). Job counts are
  * deterministic — the structural evidence for removing an eager action
  * that wall-clock alone can't give on this noisy VM.
  */
object DebugComposed {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val reps = args.headOption.map(_.toInt).getOrElse(5)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-debug-composed")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.scheduler.mode", "FAIR")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    SparkEntry.index(spark, sfDir)

    def jobsNow(): Int = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length

    val names =
      if (args.length > 1) args.drop(1).toSeq
      else Seq("phrase_filter_rank", "bm25_mixed_q1", "bm25_mixed_q2",
        "bm25_mixed_q3", "bm25_field_q1", "bm25_field_q2", "search_batch",
        "bm25_q1")
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      val times = (0 until reps).map { _ =>
        val j0 = jobsNow()
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        ((System.nanoTime() - t0) / 1e9, jobsNow() - j0)
      }
      val best = times.minBy(_._1)
      println(f"$name%-20s min=${best._1}%.3f jobs=${times.map(_._2).min} " +
        f"all=${times.map(t => f"${t._1}%.3f").mkString(",")}")
    }
    spark.stop()
  }
}
