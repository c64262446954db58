package graft

import org.apache.spark.sql.functions._

import graft.operators.TrainingData
import graft.TestKit.spark

/** Scratch: stage-level timing of the sketch operators at sf0.1 to find
  * where the wall-clock goes before optimizing. `sbt "Test/runMain
  * graft.DebugSketch"`.
  */
object DebugSketch {
  private def time[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val a = f
    println(f"[sketch] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    a
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    docs.count()

    time("simhash signatures only")(TrainingData.simhashSignatures(docs).count())
    time("simhash full pairs")(TrainingData.simhashPairs(docs).count())
    val sh = time("shingles (df-capped)")(TrainingData.shingleSets(docs).persist())
    time("shingles count")(sh.count())
    val sig = time("minhash signatures only") {
      val minCols = (0 until 16).map(i =>
        min(substring(md5(concat(lit(s"$i|"), col("sh"))), 1, 16)).as(s"mh$i"))
      sh.groupBy(col("doc_id")).agg(minCols.head, minCols.tail: _*)
    }
    time("minhash sig count")(sig.count())
    time("minhash full pairs")(TrainingData.minhashLshPairs(docs).count())
    time("ngram jaccard full")(TrainingData.ngramJaccardPairs(docs).count())
  }
}
