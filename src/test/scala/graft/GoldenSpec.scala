package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.index.IndexBuilder
import graft.query.QueryEngine
import TestKit.{spark, OracleBM25, TranscriptGen}

/** Committed golden results (FIXTURES.md §4): the small-tier corpus's
  * top-10 (rank, docId, score) per query, pinned at first generation.
  * Catches semantic drift that a relative oracle comparison cannot (if
  * oracle and engine drifted together, the goldens still scream).
  *
  * Regenerate intentionally with:
  *   sbt "Test/runMain graft.GoldenGen"
  */
class GoldenSpec extends AnyFunSuite {

  test("engine matches committed goldens on the small tier") {
    val stream = getClass.getResourceAsStream("/golden-small.tsv")
    // hard failure, not assume(): a missing golden would silently CANCEL
    // the only absolute drift gate (engine+oracle drifting together)
    assert(stream != null, "golden file missing — run graft.GoldenGen")
    val lines = scala.io.Source.fromInputStream(stream, "UTF-8").getLines().toVector
    val want = lines.filter(_.nonEmpty).map { l =>
      val Array(qid, rank, docId, score) = l.split("\t")
      (qid, rank.toInt, docId.toLong, score)
    }
    val got = GoldenGen.compute(spark)
    assert(got == want, "golden drift — if intentional, regenerate via graft.GoldenGen")
  }
}

/** Generates the golden file content; `main` writes it into the source
  * tree resource dir (run manually, result committed).
  */
object GoldenGen {
  import graft.model.Turn

  def compute(spark: org.apache.spark.sql.SparkSession): Vector[(String, Int, Long, String)] = {
    val cfg = IndexBuilder.Config(docIdPartitions = 8, numShards = 8)
    val turns = TranscriptGen.turns(seed = 42, nConvs = 80)
    val ds = spark.createDataset(turns)(org.apache.spark.sql.Encoders.product[Turn])
    val rel = IndexBuilder.relations(spark, ds,
      java.nio.file.Files.createTempDirectory("graft-docs").toString, cfg)
    val queries = Seq(
      "g1" -> "term0000 term0001",
      "g2" -> "term0250 term0299",
      "g3" -> "世界 café",
      "g4" -> "term0002 term0002 term0002",
      "g5" -> "the term0004")
    val out = queries.flatMap { case (qid, q) =>
      QueryEngine.exhaustiveTopK(spark, rel, q, 10, cfg)
        .collect().zipWithIndex.map { case (r, i) =>
          // score serialized with full round-trip precision
          (qid, i + 1, r.getLong(0), r.getDouble(1).toString)
        }
    }.toVector
    rel.unpersistAll()
    out
  }

  def main(args: Array[String]): Unit = {
    val rows = compute(TestKit.spark)
    val path = java.nio.file.Paths.get("src/test/resources/golden-small.tsv")
    java.nio.file.Files.createDirectories(path.getParent)
    java.nio.file.Files.writeString(path,
      rows.map { case (q, r, d, s) => s"$q\t$r\t$d\t$s" }.mkString("\n"))
    println(s"wrote ${rows.size} golden rows to $path")
    TestKit.spark.stop()
  }
}
