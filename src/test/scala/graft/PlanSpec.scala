package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.index.IndexBuilder
import graft.query.QueryEngine
import TestKit.spark

/** Physical-plan shape assertions (the "would this survive 100x" checks):
  * filters/pruning reach the parquet scan, small sides broadcast, the
  * postings relation stays narrow, top-k plans as TakeOrderedAndProject.
  */
class PlanSpec extends AnyFunSuite {

  private val dir = "/root/testdata/sf0.001"

  private def plan(df: DataFrame): String = df.queryExecution.executedPlan.toString

  test("P1: filter and column pruning reach the parquet scan") {
    val p = plan(graft.operators.Relational.queries("p1_select_prune")(spark, dir))
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThan(l_shipdate"), p)
    assert(p.contains("ReadSchema") &&
      !p.contains("l_quantity"), "scan reads pruned columns:\n" + p)
  }

  test("J3: tiny top-k side is broadcast for decoration") {
    val p = plan(graft.operators.Relational.queries("j3_topk_decorate")(spark, dir))
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("postings relation is narrow over the docId sort (no extra exchange)") {
    import spark.implicits._
    val turns = spark.createDataset(TestKit.TranscriptGen.turns(seed = 5, nConvs = 10))
    val cfg = IndexBuilder.Config(docIdPartitions = 4, numShards = 8)
    // prepare() returns the LAZY (pre-persist) postings plan — the one
    // that actually runs in the production build — so an accidental second
    // shuffle is visible here (a persisted relation would always render as
    // an InMemoryTableScan and hide it)
    val p0 = IndexBuilder.prepare(spark, turns,
      java.nio.file.Files.createTempDirectory("graft-docs").toString, cfg)
    val p = plan(p0.postings)
    assert(!p.contains("Exchange"),
      "postings plan acquired a shuffle before the encode exchange:\n" + p)
  }

  test("exhaustive top-k plans as TakeOrderedAndProject with broadcast stats") {
    import spark.implicits._
    val turns = spark.createDataset(TestKit.TranscriptGen.turns(seed = 6, nConvs = 10))
    val cfg = IndexBuilder.Config(docIdPartitions = 4, numShards = 8)
    val rel = IndexBuilder.relations(spark, turns,
      java.nio.file.Files.createTempDirectory("graft-docs").toString, cfg)
    val p = plan(QueryEngine.exhaustiveTopK(spark, rel, "term0000 term0001", 10, cfg))
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(p.contains("BroadcastHashJoin"), p)
    rel.unpersistAll()
  }

  test("WAND block scan pushes the term predicate to parquet") {
    val idx = SparkEntry.index(spark, dir)
    import spark.implicits._
    val p = plan(idx.blocks.filter($"term".isin("data", "spark")).toDF())
    assert(p.contains("PushedFilters: [In(term"), p)
  }

  test("WAND scoring never reads the positions column (columnar pruning)") {
    // positions are a phrase-only column: the BM25 paths must not pay for
    // them at the parquet scan, or enabling storePositions would tax every
    // query. The index at `dir` IS positional (SparkEntry.cfg).
    val idx = SparkEntry.index(spark, dir)
    val p = plan(QueryEngine.wandTopK(spark, idx.blocks, idx.termStats,
      idx.corpus, "data spark", 10, SparkEntry.cfg))
    // assert on the scan's column list (the ReadSchema string truncates)
    val scanCols = "FileScan parquet \\[[^\\]]*\\]".r.findAllIn(p).toSeq
    assert(scanCols.nonEmpty, p)
    assert(!scanCols.exists(_.contains("positions#")),
      "WAND scan reads the positions column:\n" + p)
  }

  test("conjunctive scan: term predicate pushed, positions column unread, TakeOrderedAndProject finish") {
    val idx = SparkEntry.index(spark, dir)
    val p = plan(QueryEngine.conjunctiveTopK(spark, idx.blocks, idx.termStats,
      idx.corpus, "data spark -join", 10, SparkEntry.cfg))
    assert(p.contains("PushedFilters: [In(term"), p)
    val scanCols = "FileScan parquet \\[[^\\]]*\\]".r.findAllIn(p).toSeq
    assert(scanCols.nonEmpty && !scanCols.exists(_.contains("positions#")),
      "conjunctive scan reads the positions column:\n" + p)
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("lifecycle (deleted) docs view broadcasts the tiny tombstone relation") {
    val idx = SparkEntry.lifecycleIndex(spark, dir)
    assert(idx.tombstoneSet.nonEmpty, "lifecycle fixture deleted nothing — vacuous")
    val p = plan(idx.docs.toDF())
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftAnti"),
      "live docs view must anti-join a BROADCAST tombstone set:\n" + p)
  }

  test("phrase scan pushes the term predicate and reads positions") {
    val idx = SparkEntry.index(spark, dir)
    val p = plan(QueryEngine.phraseMatches(spark, idx.blocks,
      "data spark", SparkEntry.cfg).get)
    assert(p.contains("PushedFilters: [In(term"), p)
    assert("FileScan parquet \\[[^\\]]*\\]".r.findAllIn(p)
      .exists(_.contains("positions#")), p)
  }

  test("batch WAND scans the block table once for the whole query batch") {
    val idx = SparkEntry.index(spark, dir)
    val qs = Seq("b1" -> "data spark", "b2" -> "join stream", "b3" -> "window")
    val p = plan(QueryEngine.wandTopKBatch(spark, idx.blocks, idx.termStats,
      idx.corpus, qs, 10))
    val scans = "Scan parquet".r.findAllMatchIn(p).size
    assert(scans == 1, s"expected ONE shared block scan, got $scans:\n$p")
  }

  test("FWCI composite broadcasts the tiny (field, year) baseline") {
    // the baseline is #fields x #years rows: at corpus scale the fact
    // table must never be shuffle-exchanged twice for the re-join
    val p = plan(graft.operators.Relational.queries("fwci_percentile")(spark, dir))
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), "baseline re-join degraded to SMJ:\n" + p)
  }

  test("embedding-cosine dedup joins on the probe key (no nested-loop pair join)") {
    val p = plan(graft.operators.TrainingData.queries("dedup_embedding_cosine")(spark, dir))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "pair generation degraded to a cross join:\n" + p)
  }

  test("decontamination broadcasts the benchmark shingles (corpus never shuffled on shingles)") {
    val p = plan(graft.operators.TrainingData.queries("decontaminate")(spark, dir))
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"),
      "benchmark overlap degraded to a corpus-wide shingle shuffle:\n" + p)
    // the invariant itself: NO exchange keyed on the corpus's (doc_id, sh)
    // pairs — per-doc shingle dedup must stay in-row (array_distinct), and
    // only the small benchmark side may exchange on sh for its distinct
    assert(!"hashpartitioning\\(doc_id#\\d+, sh#".r.findFirstIn(p).isDefined,
      "corpus shingles were shuffled for the per-doc distinct:\n" + p)
  }

  test("IVF assignment is a partial-aggregable groupBy, not a per-vector window") {
    val p = plan(graft.operators.TrainingData.queries("ann_ivf_topk")(spark, dir))
    assert(!p.contains("Window"), "IVF argmin fell back to a window:\n" + p)
    // positive shape: the argmin IS a map-side partial max over the struct
    assert(p.contains("partial_max") || p.contains("functions=[max("),
      "IVF assignment lost its partial-aggregable max:\n" + p)
  }

  test("doc lookup is a pushed-down parquet point read") {
    val p = plan(SparkEntry.queries("doc_lookup")(spark, dir))
    assert(p.contains("PushedFilters: [IsNotNull(docId), EqualTo(docId,123)"), p)
  }

  test("fielded search pushes the field predicate to the docs parquet") {
    val idx = SparkEntry.index(spark, dir)
    val p = plan(QueryEngine.search(spark, idx.blocks, idx.termStats, idx.corpus,
      "role:user data spark", 10, 1, SparkEntry.cfg, idx.tombstoneSet,
      Some(idx.docs.toDF())))
    assert(p.contains("PushedFilters: [In(term"), p) // block scan stays term-pushed
    assert(p.contains("EqualTo(role,user)"),
      "role predicate did not reach the docs parquet scan:\n" + p)
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("composed search keeps the term-pushed scan and the top-k finish") {
    val idx = SparkEntry.index(spark, dir)
    val p = plan(QueryEngine.search(spark, idx.blocks, idx.termStats, idx.corpus,
      "\"data stream\"~1 spark -join", 10, 1, SparkEntry.cfg, idx.tombstoneSet))
    assert(p.contains("PushedFilters: [In(term"), p)
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    // r6 optimization: the phrase-survivor semi-join is gated on the
    // rarest phrase term's dictionary df (a proven bound on the survivor
    // count) instead of a persist + count() probe — the match relation
    // must appear INSIDE this one plan as a broadcast build side, not as
    // a separately-materialized InMemoryRelation
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftSemi"),
      "df-gated phrase survivor broadcast missing:\n" + p)
    assert(!p.contains("InMemoryTableScan"),
      "composed path regressed to a persisted phrase match set:\n" + p)
  }
}
