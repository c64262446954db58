package graft

import org.scalatest.funsuite.AnyFunSuite
import TestKit.spark

/** The driver's smoke contract: SparkEntry.entry returns rows on sf0.001. */
class EntrySpec extends AnyFunSuite {

  test("entry: flagship BM25 top-10 on sf0.001 returns rows") {
    val df = SparkEntry.entry(spark)
    val rows = df.collect()
    assert(rows.nonEmpty && rows.length <= 10)
    assert(df.columns.toSet ==
      Set("rank", "doc_id", "score", "conv_id", "turn_idx", "text"))
    // ranked 1..k with descending rounded scores
    assert(rows.map(_.getAs[Int]("rank")).toSeq == (1 to rows.length))
    val scores = rows.map(_.getAs[Double]("score")).toSeq
    assert(scores == scores.sorted.reverse)
  }

  test("queries and oracleSql cover exactly the same keys") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert(o.subsetOf(q), s"oracles without queries: ${o -- q}")
    // round-1 lesson: a query without an oracle is invisible to the
    // correctness gate — every driver query MUST carry its DuckDB twin
    assert(q.subsetOf(o), s"queries without oracles: ${q -- o}")
  }
}
