package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.index.{DocIds, IndexBuilder}
import graft.functions.Analyzer

/** Scratch: sub-phase timing of relations() at a given parallelism. */
object DebugPhases {
  def t[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val a = f
    println(f"PHASE $label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
    a
  }
  def main(args: Array[String]): Unit = {
    val cpus = args.headOption.getOrElse("32").toInt
    val n = args.lift(1).getOrElse("1000000").toLong
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.driver.memory", sys.env.getOrElse("SPARK_DRIVER_MEM", "32g"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val cfg = IndexBuilder.Config(numShards = cpus, docIdPartitions = cpus)
    val turns = Bench.syntheticTurns(spark, n)
    t("gen only (count)") { turns.count() }
    val turnsCached = turns.persist()
    t("gen cached (count)") { turnsCached.count() }
    val docs = t("docIds.assign + count") {
      val d = DocIds.assign(spark, IndexBuilder.indexableTurns(turnsCached), cpus)
        .persist()
      d.count(); d
    }
    val toks = docs
      .select($"docId", Analyzer.tokensCol($"text", cfg.analyzer).as("toks"))
      .select($"docId", size($"toks").as("dl"), explode($"toks").as("term"))
    t("tokenize only (count)") { toks.count() }
    val postings = toks.groupBy($"term", $"docId", $"dl")
      .agg(count(lit(1)).cast("int").as("tf")).persist()
    t("postings groupBy + count") { postings.count() }
    t("termstats") {
      postings.groupBy($"term").agg(count(lit(1))).count()
    }
    spark.stop()
  }
}
