package graft

import org.apache.spark.sql.functions._

import graft.operators.TrainingData
import graft.TestKit.spark

/** Scratch: sub-stage timing of dedup_embedding_cosine at sf0.1, plus an
  * A/B of the probe-explode candidate scheme vs a bucket-ring join.
  * `sbt "Test/runMain graft.DebugEmbPairs"`.
  */
object DebugEmbPairs {
  private def time[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val a = f
    println(f"[emb] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    a
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    emb.count()
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    time("current full pairs cold (noop)")(noop(TrainingData.embeddingCosinePairs(emb)))
    time("current full pairs warm (noop)")(noop(TrainingData.embeddingCosinePairs(emb)))
    val cur = TrainingData.embeddingCosinePairs(emb)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

    // ring-join variant (candidate = pair of vectors whose buckets differ
    // by <= 2 bits — the same set the 5-probe ball-intersection produces)
    def ringPairs() = {
      val e = emb.select(col("vec_id"),
        expr("transform(embedding, x -> cast(x AS DOUBLE))").as("v"))
      val e2 = e
        .withColumn("nv", sqrt(graft.plans.DotProduct(col("v"), col("v"))))
        .withColumn("bucket", TrainingData.debugBucketCol(64)).persist()
      val nb = 1 << TrainingData.AnnPlanes
      val ring = for {
        b1 <- 0 until nb; b2 <- 0 until nb
        if java.lang.Integer.bitCount(b1 ^ b2) <= 2 * TrainingData.AnnProbeHamming
      } yield (b1, b2)
      import spark.implicits._
      val ringDf = broadcast(ring.toDF("ba", "bb"))
      val a = e2.select(col("vec_id").as("id_a"), col("v").as("va"),
        col("nv").as("na"), col("bucket").as("ba"))
      val b = e2.select(col("vec_id").as("id_b"), col("v").as("vb"),
        col("nv").as("nb"), col("bucket").as("bb"))
      a.join(ringDf, Seq("ba"))
        .join(b, Seq("bb"))
        .filter(col("id_a") < col("id_b"))
        .withColumn("cos", round(graft.plans.DotProduct(col("va"), col("vb")) /
          (col("na") * col("nb")), 4))
        .filter(col("cos") >= TrainingData.EmbCosineThreshold)
        .select(col("id_a"), col("id_b"), col("cos"))
    }
    time("ring pairs cold (noop)")(noop(ringPairs()))
    time("ring pairs warm (noop)")(noop(ringPairs()))
    val rp = ringPairs().collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    println(s"[emb] current=${cur.size} ring=${rp.size} equal=${cur == rp}")
  }
}
