package graft

import graft.operators.TrainingData
import graft.TestKit.spark

/** Adjudicates the round-4 `dedup_ngram_jaccard` (2.8 → 15.0 s) and
  * `dedup_simhash` (3.9 → 7.5 s) slowdowns on UNCHANGED code: interleaved
  * best-of-N of the two operators in one JVM, caches cleared between reps
  * so every run pays the full pipeline. If best-of lands back at the
  * round-3 numbers the delta was the VM's documented 2-3x co-tenancy
  * noise; a reproducible floor means a real regression to profile.
  *
  * Run: `Test/runMain graft.DebugSketchAB /root/testdata/sf0.1 5`
  */
object DebugSketchAB {
  private def time(f: => Unit): Double = {
    val t0 = System.nanoTime()
    f
    (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(5)
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    docs.count() // file-listing warm
    // one untimed warmup each (JIT/codegen)
    TrainingData.ngramJaccardPairs(docs).write.format("noop").mode("overwrite").save()
    spark.catalog.clearCache()
    TrainingData.simhashPairs(docs).write.format("noop").mode("overwrite").save()
    val (jac, sim) = (Array.ofDim[Double](reps), Array.ofDim[Double](reps))
    (0 until reps).foreach { i =>
      spark.catalog.clearCache() // pay the full pipeline every rep
      jac(i) = time(TrainingData.ngramJaccardPairs(docs)
        .write.format("noop").mode("overwrite").save())
      spark.catalog.clearCache()
      sim(i) = time(TrainingData.simhashPairs(docs)
        .write.format("noop").mode("overwrite").save())
      println(f"[ab] rep$i jaccard=${jac(i)}%.2f s simhash=${sim(i)}%.2f s")
    }
    println(f"[ab] BEST jaccard=${jac.min}%.2f s (median ${jac.sorted.apply(reps / 2)}%.2f) " +
      f"simhash=${sim.min}%.2f s (median ${sim.sorted.apply(reps / 2)}%.2f) over $reps interleaved reps")
  }
}
