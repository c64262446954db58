package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.Analyzer

/** Scratch: isolate tokenize cost — regex only vs hash-set stopwords vs
  * isin-chain stopwords. Two timed reps each to see variance.
  */
object DebugTok {
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
    val turns = Bench.syntheticTurns(spark, n).persist()
    turns.count()
    val stop = Analyzer.englishStopwords.toSeq.sorted
    def run(label: String)(col: org.apache.spark.sql.Column): Unit =
      (1 to 2).foreach { rep =>
        val t0 = System.nanoTime()
        val c = turns.select(explode(col).as("t")).count()
        println(f"TOK $label%-12s rep$rep ${(System.nanoTime() - t0) / 1e9}%.2f s ($c tokens)")
      }
    // alternate pipelines twice to cancel JIT-order bias
    (1 to 2).foreach { round =>
      println(s"--- round $round ---")
      run("regex-only")(Analyzer.tokensCol($"text", Analyzer.noStopwords))
      run("hashset")(Analyzer.tokensCol($"text", Analyzer.default))
      run("fused")(graft.plans.AnalyzeText($"text", Analyzer.englishStopwords))
      run("fused-nostop")(graft.plans.AnalyzeText($"text", Set.empty))
    }
    run("isin")(filter(
      regexp_extract_all(lower($"text"), lit(Analyzer.TokenPattern), lit(0)),
      t => !t.isin(stop: _*)))
    spark.stop()
  }
}
