package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.TestKit.spark
import graft.functions.Analyzer

/** SQL surface of the custom expressions: every registered function must
  * agree with its Scala/Column twin through spark.sql.
  */
class FunctionsSpec extends AnyFunSuite {

  graft.plans.GraftFunctions.registerAll(spark)

  test("term_freqs / term_positions agree with the scala analyzer via SQL") {
    val row = spark.sql(
      """SELECT term_freqs(array('a','b','a')) AS tf,
        |       term_positions(array('a','b','a')) AS tp""".stripMargin).head()
    assert(row.getMap[String, Int](0).toMap == Map("a" -> 2, "b" -> 1))
    val tp = row.getMap[String, scala.collection.Seq[Int]](1)
      .map { case (k, v) => k -> v.toList }.toMap
    assert(tp == Map("a" -> List(1, 3), "b" -> List(2)))
  }

  test("lower_root + filter_stopwords_en compose into the analyzer via SQL") {
    val got = spark.sql(
      """SELECT filter_stopwords_en(
        |  regexp_extract_all(lower_root('The QUICK data stream'), '[\\p{L}\\p{N}]+', 0)) AS t""".stripMargin)
      .head().getSeq[String](0)
    assert(got == Analyzer.tokenize("The QUICK data stream"))
  }

  test("decode_block round-trips an encoded block via SQL") {
    import graft.index.Codec
    val ps = Seq(Codec.P(3L, 2, 10), Codec.P(9L, 1, 4))
    val payload = Codec.encode(ps)
    val df = spark.createDataFrame(Seq(Tuple2(payload, ps.size))).toDF("payload", "n")
    df.createOrReplaceTempView("blk")
    val got = spark.sql("SELECT explode(decode_block(payload, n)) AS p FROM blk")
      .selectExpr("p.docId", "p.tf", "p.dl")
      .collect().map(r => Codec.P(r.getLong(0), r.getInt(1), r.getInt(2))).toSeq
    assert(got == ps)
  }

  test("GraftExtensions injects the same function list without error") {
    // the extensions path shares GraftFunctions.all with registerAll; a
    // full session-build integration needs a fresh SparkContext (the shared
    // test session pre-exists), so assert the injection contract directly
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    (new graft.plans.GraftExtensions).apply(ext) // must not throw
  }
}
