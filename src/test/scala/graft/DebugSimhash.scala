package graft

import graft.operators.TrainingData
import graft.TestKit.spark

/** Scratch: sub-stage timing of dedup_simhash at sf0.1 (optimization round
  * instrumentation). `sbt "Test/runMain graft.DebugSimhash"`.
  */
object DebugSimhash {
  private def time[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val a = f
    println(f"[simhash] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    a
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    docs.count()
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    time("signatures (noop)")(noop(TrainingData.simhashSignatures(docs)))
    time("signatures again (noop)")(noop(TrainingData.simhashSignatures(docs)))
    time("full pairs (noop)")(noop(TrainingData.simhashPairs(docs)))
    time("full pairs again (noop)")(noop(TrainingData.simhashPairs(docs)))
  }
}
