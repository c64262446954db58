package graft

import org.apache.spark.sql.SparkSession

/** Scratch: where does bm25_deleted_* spend its ~0.5-0.9 s vs bm25_q*'s
  * ~0.3 s on the same query text? Times both noop ×reps, prints the Spark
  * job count per query (statusTracker delta) and the EXECUTED adaptive
  * plan (broadcast reuse only resolves at runtime — the static formatted
  * plan shows three tombstone BroadcastExchanges that may or may not be
  * one at execution).
  */
object DebugDeleted {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val reps = args.headOption.map(_.toInt).getOrElse(5)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-debug-deleted")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.scheduler.mode", "FAIR")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    SparkEntry.index(spark, sfDir)
    SparkEntry.lifecycleIndex(spark, sfDir)

    def jobsNow(): Int = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length

    def run(name: String, f: => org.apache.spark.sql.DataFrame): Unit = {
      val times = (0 until reps).map { _ =>
        val j0 = jobsNow()
        val t0 = System.nanoTime()
        f.write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        (dt, jobsNow() - j0)
      }
      val best = times.minBy(_._1)
      println(f"$name%-22s min=${best._1}%.3f jobs=${best._2} " +
        f"all=${times.map(t => f"${t._1}%.3f").mkString(",")}")
    }

    run("bm25_q1", SparkEntry.queries("bm25_q1")(spark, sfDir))
    run("bm25_deleted_q1", SparkEntry.queries("bm25_deleted_q1")(spark, sfDir))
    run("bm25_q6", SparkEntry.queries("bm25_q6")(spark, sfDir))
    run("bm25_deleted_q6", SparkEntry.queries("bm25_deleted_q6")(spark, sfDir))

    // executed plan of the deleted path: did the three tombstone
    // broadcasts collapse into ReusedExchange at runtime?
    val df = SparkEntry.queries("bm25_deleted_q1")(spark, sfDir)
    df.write.format("noop").mode("overwrite").save()
    val ex = df.queryExecution.executedPlan.toString
    println("=== executed plan (deleted_q1) ===")
    println(ex.linesIterator.filter(l =>
      l.contains("Exchange") || l.contains("Reused") || l.contains("Scan parquet") ||
        l.contains("Join")).mkString("\n"))
    spark.stop()
  }
}
