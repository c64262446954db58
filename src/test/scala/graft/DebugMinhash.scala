package graft

import org.apache.spark.sql.functions._

import graft.operators.TrainingData
import graft.TestKit.spark

/** Scratch: sub-stage timing of the MinHash-LSH pipeline + cluster
  * resolution at sf0.1. `sbt "Test/runMain graft.DebugMinhash"`.
  */
object DebugMinhash {
  private def time[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val a = f
    println(f"[mh] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    a
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    docs.count()

    val sh = time("shingleSets persist+count") {
      val s = TrainingData.shingleSets(docs).persist(); s.count(); s
    }
    val sig = time("minhash sig (count)") {
      val minCols = (0 until 16).map(i => min(element_at(col("mhs"), i + 1)).as(s"mh$i"))
      val s = sh.withColumn("mhs", graft.plans.MinhashPrefixes(col("sh")))
        .groupBy(col("doc_id")).agg(minCols.head, minCols.tail: _*).persist()
      s.count(); s
    }
    val banded = time("banded (count)") {
      val b = sig.select(col("doc_id"), posexplode(array(
        (0 until 8).map(x => md5(concat(col(s"mh${2 * x}"), col(s"mh${2 * x + 1}")))): _*))
        .as(Seq("band", "bucket")))
      b.count(); b
    }
    val cand = time("boundedPairs (count)") {
      val c = TrainingData.boundedPairs(banded, Seq("band", "bucket"), "doc_id").persist()
      println("[mh] cand count = " + c.count()); c
    }
    time("exactJaccard over cand (count)") {
      println("[mh] pairs = " + TrainingData.exactJaccardPairs(sh, Some(cand)).count())
    }
    val pairs = TrainingData.minhashLshPairs(docs)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("full minhashLshPairs AGAIN (count)") { println("[mh] pairs2 = " + pairs.count()) }
    time("clusterPairs (count)") {
      println("[mh] clusters = " + TrainingData.clusterPairs(pairs).count())
    }
  }
}
