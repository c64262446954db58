package graft

import graft.TestKit.spark

/** Scratch: dump formatted physical plans for the heavy operators so plan
  * regressions (cartesian joins, lost pushdown, lost partial aggs) are
  * visible. `sbt "Test/runMain graft.DebugPlans [name...]"`.
  */
object DebugPlans {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.001"
    val names = if (args.nonEmpty) args.toSeq
      else Seq("dedup_minhash_lsh", "dedup_simhash", "ann_lsh_bucket", "bm25_batch")
    names.foreach { n =>
      println(s"\n================= $n =================")
      SparkEntry.queries(n)(spark, dir).explain("formatted")
    }
  }
}
