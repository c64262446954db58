package graft

import org.apache.spark.sql.SparkSession

import graft.operators.TrainingData

/** Measures the PQ index's stored bytes/vector vs the raw float vectors
  * (the compression claim in BASELINE.md): encodes the given sf dir's
  * embeddings with [[TrainingData.pqCodes]], writes both representations
  * as parquet, and reports on-disk bytes per vector.
  *
  * Run: `Test/runMain graft.DebugPq /root/testdata/sf0.1`
  */
object DebugPq {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[16]")
      .appName("graft-debug-pq")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      val n = emb.count()
      val out = s"${sys.props("java.io.tmpdir")}/graft-pq-codes"
      val rawOut = s"${sys.props("java.io.tmpdir")}/graft-pq-raw"
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(out))
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(rawOut))
      TrainingData.pqCodes(emb).write.parquet(out)
      // float32 baseline: the raw vectors re-written under the same codec
      // so the comparison is parquet-vs-parquet, not codec-vs-codec
      emb.selectExpr("vec_id", "transform(embedding, x -> cast(x AS FLOAT)) AS v")
        .write.parquet(rawOut)
      def bytes(d: String): Long =
        org.apache.commons.io.FileUtils.sizeOfDirectory(new java.io.File(d))
      val enc = bytes(out)
      val raw = bytes(rawOut)
      println(f"vectors=$n encodedBytes=$enc (${enc.toDouble / n}%.1f B/vec) " +
        f"rawBytes=$raw (${raw.toDouble / n}%.1f B/vec) ratio=${raw.toDouble / enc}%.1fx " +
        s"[logical: ${TrainingData.PqSubspaces} codes x 4 bits + 4-bit list id vs 64 x float32]")
    } finally spark.stop()
  }
}
