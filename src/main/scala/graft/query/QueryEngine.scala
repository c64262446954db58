package graft.query

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Analyzer
import graft.index.{Codec, IndexBuilder, TombstoneSet}
import graft.model._

/** Top-k BM25 query engine. Two exact, rank-identical paths:
  *
  *   - `exhaustiveTopK`: relational scoring over the postings Dataset —
  *     pure built-in operators (broadcast joins + deterministic per-doc
  *     fold), fully inside whole-stage codegen. This is the semantic
  *     baseline every optimized path must match (SURVEY.md §7.3 step 3).
  *
  *   - `wandTopK`: block-max WAND over the encoded posting blocks in a
  *     typed mapPartitions, one document-at-a-time scorer per docId-range
  *     shard, per-shard top-k heap, then a global
  *     orderBy(score desc, docId asc).limit(k) (Spark plans it as
  *     TakeOrderedAndProject, like the reference's final
  *     orderBy/limit, /root/reference/data_processing/Lexical_indexing/
  *     bm25_searcher.py:111). Block-max metadata is an upper bound used
  *     only to SKIP work, never to approximate — exactness is
  *     property-tested against the exhaustive path.
  *
  * Contrast with the reference's scorer, which funneled every document to
  * a single GPU task via repartition(1) (bm25_searcher.py:102-107); here
  * every shard scores independently and in parallel.
  */
object QueryEngine {

  /** Exact BM25 contribution as a Column — the association mirrors
    * Bm25.contribution token for token so both produce bit-identical
    * doubles.
    */
  private def contributionCol(qtf: Column, idf: Column, tf: Column, dl: Column,
      avgdl: Double, p: Bm25Params): Column =
    qtf * idf * (tf * lit(p.k1 + 1.0) /
      (tf + lit(p.k1) * (lit(1.0 - p.b) + lit(p.b) * dl / lit(avgdl))))

  /** Relational top-k: returns (docId, score), exact doubles, already
    * ordered (score desc, docId asc) and limited to k.
    *
    * Plan shape: postings filtered to the (tiny) query-term set → broadcast
    * joins against query weights and term stats → per-doc deterministic
    * fold in ascending term order (collect_list of <=|q| structs +
    * array_sort + aggregate — never more elements than query terms) →
    * TakeOrderedAndProject.
    */
  def exhaustiveTopK(
      spark: SparkSession,
      rel: IndexBuilder.Relations,
      query: String,
      k: Int,
      cfg: IndexBuilder.Config = IndexBuilder.Config()
  ): DataFrame = {
    import spark.implicits._
    val qterms = Analyzer.analyzeQuery(query, cfg.analyzer)
    if (qterms.isEmpty) return emptyScores(spark)
    val qdf = qterms.toDF("term", "qtf")
    val p = cfg.params
    val avgdl = rel.corpus.avgdl

    rel.postings
      .filter($"term".isin(qterms.map(_._1): _*))
      .join(broadcast(qdf), Seq("term"))
      .join(broadcast(rel.termStats.toDF()), Seq("term"))
      .withColumn("contrib",
        contributionCol($"qtf", $"idf", $"tf", $"dl", avgdl, p))
      .groupBy($"docId")
      .agg(collect_list(struct($"term", $"contrib")).as("cs"))
      .select($"docId",
        aggregate(array_sort($"cs"), lit(0.0),
          (acc, x) => acc + x.getField("contrib")).as("score"))
      .orderBy($"score".desc, $"docId".asc)
      .limit(k)
  }

  private def emptyScores(spark: SparkSession): DataFrame = {
    import spark.implicits._
    spark.emptyDataset[(Long, Double)].toDF("docId", "score")
  }

  /** Decorate top-k scores with the originating turn (reference join J3
    * shape, bm25_searcher.py:117-120): the k-row side is broadcast.
    */
  def decorate(topK: DataFrame, docs: Dataset[Doc]): DataFrame = {
    docs.toDF()
      .join(broadcast(topK), Seq("docId"))
      .select(col("docId"), col("score"), col("conv_id"), col("turn_idx"), col("text"))
      .orderBy(col("score").desc, col("docId").asc)
  }

  // ---------------------------------------------------------------- WAND

  /** Query-term state passed to executors: weight = qtf * idf. */
  private[query] final case class QTerm(term: String, weight: Double)

  /** Blocks with the positions column replaced by an empty literal: the
    * typed Dataset[PostingBlock] deserializer would otherwise force the
    * parquet scan to read the phrase-only positions bytes on every BM25
    * query of a positional index (asserted away in PlanSpec).
    */
  private def scoringBlocks(blocks: Dataset[PostingBlock]): Dataset[PostingBlock] = {
    import blocks.sparkSession.implicits._
    blocks.toDF()
      .withColumn("positions", typedLit(Array.emptyByteArray))
      .as[PostingBlock]
  }

  /** Block-max WAND top-k over encoded blocks.
    *
    * @param blocks     the PostingBlock dataset/table (parquet-backed when
    *                   reading a built index; term predicate is pushed to
    *                   the scan)
    * @param termStats  full term-stats relation; only the query's rows are
    *                   collected (<= |q| rows)
    */
  def wandTopK(
      spark: SparkSession,
      blocks: Dataset[PostingBlock],
      termStats: Dataset[TermStat],
      corpus: CorpusStats,
      query: String,
      k: Int,
      cfg: IndexBuilder.Config = IndexBuilder.Config(),
      tombstones: TombstoneSet = TombstoneSet.empty
  ): DataFrame = {
    import spark.implicits._
    val analyzed = Analyzer.analyzeQuery(query, cfg.analyzer)
    if (analyzed.isEmpty) return emptyScores(spark)
    val names = analyzed.map(_._1)
    val idfs: Map[String, Double] = termStats
      .filter($"term".isin(names: _*))
      .collect().map(t => t.term -> t.idf).toMap
    // terms absent from the corpus contribute 0: drop up front
    val qts: Seq[QTerm] = analyzed.collect {
      case (t, qtf) if idfs.contains(t) => QTerm(t, qtf * idfs(t))
    }
    if (qts.isEmpty) return emptyScores(spark)

    val p = cfg.params
    val avgdl = corpus.avgdl
    val kk = k
    val qtsB = spark.sparkContext.broadcast(qts.sortBy(_.term))
    val tsB = tombstones.broadcastVia(spark)

    // one task per core, several shards per task (scorePartition iterates
    // shard groups); HASH partitioning on shardId keeps a shard's blocks
    // together exactly like the former repartitionByRange did, without the
    // RangePartitioner's extra sampling pass over the filtered scan (one
    // whole Spark job per query at serving latency)
    val parts = math.max(1, math.min(cfg.numShards,
      spark.sparkContext.defaultParallelism))
    val candidates = scoringBlocks(blocks)
      .filter($"term".isin(names: _*))
      .repartition(parts, $"shardId")
      .sortWithinPartitions($"shardId", $"term", $"minDocId")
      .mapPartitions { it =>
        WandScorer.scorePartition(it.buffered, qtsB.value, kk, p.k1, p.b, avgdl,
          tsB.value)
      }
      .toDF("docId", "score")

    candidates.orderBy($"score".desc, $"docId".asc).limit(k)
  }

  /** Multi-query WAND: scores a whole query batch in ONE Spark job,
    * amortizing the per-job scheduler floor (BASELINE.md measured p50
    * latency as floor-bound, not scan-bound) and sharing the block scan +
    * block decodes across queries — the serving shape the reference's API
    * implies (/root/reference/api/combined.py:159-224, one request per
    * query against a shared index).
    *
    * Returns (qid, docId, score): per-qid exact top-k, same per-query
    * results as [[wandTopK]] (property-tested).
    */
  def wandTopKBatch(
      spark: SparkSession,
      blocks: Dataset[PostingBlock],
      termStats: Dataset[TermStat],
      corpus: CorpusStats,
      queries: Seq[(String, String)],
      k: Int,
      cfg: IndexBuilder.Config = IndexBuilder.Config(),
      tombstones: TombstoneSet = TombstoneSet.empty
  ): DataFrame = {
    import spark.implicits._
    // a duplicated qid would merge two queries' candidates in the per-qid
    // window finish — reject instead of silently corrupting the top-k
    require(queries.map(_._1).distinct.size == queries.size,
      s"duplicate qids in batch: ${queries.map(_._1)}")
    def empty: DataFrame =
      spark.emptyDataset[(String, Long, Double)].toDF("qid", "docId", "score")
    val analyzed = queries.map { case (id, q) => id -> Analyzer.analyzeQuery(q, cfg.analyzer) }
    val names = analyzed.flatMap(_._2.map(_._1)).distinct
    if (names.isEmpty) return empty
    val idfs: Map[String, Double] = termStats
      .filter($"term".isin(names: _*))
      .collect().map(t => t.term -> t.idf).toMap
    val perQuery: Seq[(String, Seq[QTerm])] = analyzed
      .map { case (id, qs) =>
        id -> qs.collect { case (t, qtf) if idfs.contains(t) => QTerm(t, qtf * idfs(t)) }
          .sortBy(_.term)
      }
      .filter(_._2.nonEmpty)
    if (perQuery.isEmpty) return empty
    val liveNames = perQuery.flatMap(_._2.map(_.term)).distinct

    val p = cfg.params
    val avgdl = corpus.avgdl
    val kk = k
    val qB = spark.sparkContext.broadcast(perQuery)
    val tsB = tombstones.broadcastVia(spark)
    val parts = math.max(1, math.min(cfg.numShards,
      spark.sparkContext.defaultParallelism))
    val candidates = scoringBlocks(blocks)
      .filter($"term".isin(liveNames: _*))
      .repartition(parts, $"shardId")
      .sortWithinPartitions($"shardId", $"term", $"minDocId")
      .mapPartitions { it =>
        WandScorer.scorePartitionBatch(it.buffered, qB.value, kk, p.k1, p.b, avgdl,
          tsB.value)
      }
      .toDF("qid", "docId", "score")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"qid").orderBy($"score".desc, $"docId".asc)
    candidates.withColumn("rn", row_number().over(w))
      .filter($"rn" <= k).drop("rn")
  }

  // --------------------------------------------------- shared scorer glue

  /** Consume ONE shard group from a (shardId, term, minDocId)-sorted block
    * stream: every block of the head shard, keyed by term. The single
    * definition behind all three block scorers (WAND, conjunctive,
    * phrase) — a shard-grouping fix lands everywhere at once.
    */
  private[query] def nextShardGroup(
      it: BufferedIterator[PostingBlock]
  ): scala.collection.mutable.LinkedHashMap[String, scala.collection.mutable.ArrayBuffer[PostingBlock]] = {
    val shard = it.head.shardId
    val byTerm = scala.collection.mutable.LinkedHashMap
      .empty[String, scala.collection.mutable.ArrayBuffer[PostingBlock]]
    while (it.hasNext && it.head.shardId == shard) {
      val blk = it.next()
      byTerm.getOrElseUpdate(blk.term, scala.collection.mutable.ArrayBuffer.empty) += blk
    }
    byTerm
  }

  /** Bounded top-k accumulator under the global tie-break (score desc,
    * docId asc): the evictable worst entry is the smallest score, ties
    * broken toward the larger docId. Shared by the WAND and conjunctive
    * shard scorers so the ranking contract has exactly one definition.
    */
  private[query] final class TopKHeap(k: Int) {
    private val ord: Ordering[(Long, Double)] = new Ordering[(Long, Double)] {
      def compare(a: (Long, Double), b: (Long, Double)): Int = {
        val c = java.lang.Double.compare(b._2, a._2) // smaller score first
        if (c != 0) c else java.lang.Long.compare(a._1, b._1) // larger docId first
      }
    }
    private val heap = scala.collection.mutable.PriorityQueue.empty[(Long, Double)](ord)

    /** Current k-th score — WAND's θ; -inf while the heap is unfilled.
      * Within a shard docIds only grow, so a candidate whose upper bound
      * is <= θ can never displace an entry (equal score loses on docId).
      */
    def theta: Double = if (heap.size < k) Double.NegativeInfinity else heap.head._2

    def offer(docId: Long, score: Double): Unit =
      if (heap.size < k) heap.enqueue((docId, score))
      else {
        val worst = heap.head
        if (score > worst._2 || (score == worst._2 && docId < worst._1)) {
          heap.dequeue(); heap.enqueue((docId, score))
        }
      }

    def drain(): Seq[(Long, Double)] = heap.dequeueAll.reverse
  }

  // --------------------------------------------- conjunctive (boolean AND)

  /** Split a search-box query into (positive text, excluded terms): a
    * whitespace token starting with '-' is an exclusion ("spark join
    * -stream"), everything else is a required term. Both sides go through
    * the ordinary analyzer, so exclusions follow the same case/word-break
    * rules as the index.
    */
  private[graft] def parseBoolean(query: String): (String, Seq[String]) = {
    val (neg, pos) = query.split("\\s+").toSeq.filter(_.nonEmpty)
      .partition(t => t.length > 1 && t.startsWith("-"))
    (pos.mkString(" "), neg.map(_.drop(1)))
  }

  /** Conjunctive (boolean AND) top-k: only documents containing EVERY
    * analyzed query term qualify, ranked by full BM25 over those terms;
    * `-term` tokens exclude documents containing the term. This is the
    * semantics most search boxes apply to plain multi-word queries (the
    * reference UI's free-text search implies it, App.js) — WAND's
    * disjunctive top-k is the recall-oriented complement.
    *
    * Exactness and scale: candidates are intersected per docId-range shard
    * with the same leapfrog skip machinery as the phrase engine (blocks
    * skipped on maxDocId metadata without decoding), so work is bounded by
    * the RAREST required term's postings — never a corpus scan; a required
    * term absent from the corpus short-circuits to an empty result on the
    * driver. The term predicate is pushed to the parquet block scan like
    * every other query path.
    */
  def conjunctiveTopK(
      spark: SparkSession,
      blocks: Dataset[PostingBlock],
      termStats: Dataset[TermStat],
      corpus: CorpusStats,
      query: String,
      k: Int,
      cfg: IndexBuilder.Config = IndexBuilder.Config(),
      tombstones: TombstoneSet = TombstoneSet.empty
  ): DataFrame = {
    import spark.implicits._
    val (posText, negRaw) = parseBoolean(query)
    val analyzed = Analyzer.analyzeQuery(posText, cfg.analyzer)
    if (analyzed.isEmpty) return emptyScores(spark)
    val negTerms = negRaw.flatMap(t => Analyzer.tokenize(t, cfg.analyzer)).distinct
    val allNames = (analyzed.map(_._1) ++ negTerms).distinct
    val idfs: Map[String, Double] = termStats
      .filter($"term".isin(allNames: _*))
      .collect().map(t => t.term -> t.idf).toMap
    // AND semantics: a required term with no postings means no document
    // can match — unlike WAND, absent terms are not dropped
    if (analyzed.exists { case (t, _) => !idfs.contains(t) })
      return emptyScores(spark)
    val qts = analyzed.map { case (t, qtf) => QTerm(t, qtf * idfs(t)) }.sortBy(_.term)
    // an excluded term with no postings excludes nothing
    val excl = negTerms.filter(idfs.contains)
    val scanNames = (qts.map(_.term) ++ excl).distinct

    val p = cfg.params
    val avgdl = corpus.avgdl
    val kk = k
    val qtsB = spark.sparkContext.broadcast(qts)
    val exclB = spark.sparkContext.broadcast(excl)
    val tsB = tombstones.broadcastVia(spark)
    val parts = math.max(1, math.min(cfg.numShards,
      spark.sparkContext.defaultParallelism))
    scoringBlocks(blocks)
      .filter($"term".isin(scanNames: _*))
      .repartition(parts, $"shardId")
      .sortWithinPartitions($"shardId", $"term", $"minDocId")
      .mapPartitions { it =>
        ConjunctiveScorer.scorePartition(it.buffered, qtsB.value, exclB.value,
          kk, p.k1, p.b, avgdl, tsB.value)
      }
      .toDF("docId", "score")
      .orderBy($"score".desc, $"docId".asc)
      .limit(k)
  }

  /** Shared by [[prefixTopK]] and its oracle builder: wildcard tokens
    * (trailing `*`) are split from literal ones BEFORE analysis ('*' is
    * not a word character — the analyzer would silently strip it), and
    * each prefix is analyzed under the same case/word-break rules as a
    * term. Returns (analyzed literal (term, qtf), (prefix, qtf)).
    */
  private[graft] def parsePrefixQuery(query: String,
      cfg: IndexBuilder.Config): (Seq[(String, Int)], Seq[(String, Int)]) = {
    val rawTokens = query.split("\\s+").toSeq.filter(_.nonEmpty)
    val (wild, plain) = rawTokens.partition(t => t.length > 1 && t.endsWith("*"))
    val literal = Analyzer.analyzeQuery(plain.mkString(" "), cfg.analyzer)
    (literal, analyzePrefixStems(wild.map(_.dropRight(1))))
  }

  /** Wildcard stems analyze WITHOUT the stopword filter: Lucene expands a
    * prefix regardless of what it spells, so `the*` must scan the
    * dictionary (which never contains stopwords — the expansion is still
    * exact) instead of silently matching nothing because the stem itself
    * is a stopword. A multi-word-run stem keeps its last run (`foo-bar*`
    * prefixes on `bar`).
    */
  private[graft] def analyzePrefixStems(stems: Seq[String]): Seq[(String, Int)] =
    stems
      .flatMap(t => Analyzer.tokenize(t, Analyzer.noStopwords).lastOption)
      .groupBy(identity).view.mapValues(_.size).toSeq.sortBy(_._1)

  /** Expand trailing-`*` stems against the term dictionary in ONE Spark
    * job — a union of per-prefix capped scans, each with its
    * StringStartsWith predicate pushed to the termstats parquet (round 4
    * issued one collect per wildcard token, paying the scheduler floor per
    * token). The [[PrefixExpansionCap]] applies per prefix in ascending
    * term order, exactly as before.
    */
  private def expandPrefixes(
      spark: SparkSession,
      termStats: Dataset[TermStat],
      prefixes: Seq[(String, Int)]): Seq[(String, Int)] = {
    val byStem = expandStems(spark, termStats, prefixes.map(_._1))
    prefixes.flatMap { case (p, qtf) =>
      byStem.getOrElse(p, Nil).map(_ -> qtf)
    }
  }

  /** The one dictionary scan behind every wildcard expansion: per-stem
    * capped term lists, all stems in ONE job (union of predicate-pushed
    * capped scans). Shared by the single-query paths and [[searchBatch]],
    * which expands every query's stems together.
    */
  private def expandStems(
      spark: SparkSession,
      termStats: Dataset[TermStat],
      stems: Seq[String]): Map[String, Seq[String]] = {
    import spark.implicits._
    if (stems.isEmpty) return Map.empty
    val scans = stems.distinct.map { p =>
      termStats.filter($"term".startsWith(p)).select($"term")
        .orderBy($"term").limit(PrefixExpansionCap)
        .withColumn("pfx", lit(p))
    }
    scans.reduce(_ unionByName _).collect()
      .groupBy(_.getString(1)).view
      .mapValues(_.map(_.getString(0)).toSeq.sorted).toMap
  }

  /** Max dictionary terms a single trailing-`*` token may expand to —
    * Lucene's MaxClauseCount shape. Deterministic: the FIRST cap terms in
    * ascending term order (mirrored in the oracle); beyond it a prefix is
    * too unselective to be a useful query anyway.
    */
  val PrefixExpansionCap = 1024

  /** Prefix/wildcard top-k: query tokens ending in `*` expand against the
    * term dictionary (Lucene MultiTermQuery, SCORING_BOOLEAN rewrite) and
    * the whole query then runs as ordinary disjunctive WAND over the
    * union — an expanded term scores exactly as if the user had typed it,
    * weighted by the wildcard token's occurrence count. The dictionary
    * scan pushes a StringStartsWith predicate to the termstats parquet
    * (never a corpus touch), and the expansion is capped at
    * [[PrefixExpansionCap]] in ascending term order.
    */
  def prefixTopK(
      spark: SparkSession,
      blocks: Dataset[PostingBlock],
      termStats: Dataset[TermStat],
      corpus: CorpusStats,
      query: String,
      k: Int,
      cfg: IndexBuilder.Config = IndexBuilder.Config(),
      tombstones: TombstoneSet = TombstoneSet.empty
  ): DataFrame = {
    import spark.implicits._
    val (literal, prefixes) = parsePrefixQuery(query, cfg)
    if (literal.isEmpty && prefixes.isEmpty) return emptyScores(spark)
    val expanded: Seq[(String, Int)] = expandPrefixes(spark, termStats, prefixes)
    // one weight per distinct term: literal + expansion occurrences sum
    val combined: Seq[(String, Int)] = (literal ++ expanded)
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toSeq.sortBy(_._1)
    if (combined.isEmpty) return emptyScores(spark)
    val q = combined.map { case (t, n) => Seq.fill(n)(t) }.flatten.mkString(" ")
    // delegate to WAND: analyzeQuery over the synthesized token stream
    // reproduces exactly the combined (term, qtf) weights
    wandTopK(spark, blocks, termStats, corpus, q, k, cfg, tombstones)
  }

  /** Minimum-should-match top-k (Lucene BooleanQuery.minimumShouldMatch):
    * documents containing at least `m` of the query's distinct analyzed
    * terms qualify, ranked by BM25 over the terms they contain. m = 1 is
    * disjunctive top-k (rank-identical to [[wandTopK]], property-tested);
    * m = n is conjunctive AND ([[conjunctiveTopK]] without exclusions).
    *
    * A query term absent from the corpus can never match, so it lowers
    * the achievable count: if fewer than m terms have postings the result
    * is empty (Lucene's SHOULD-clause semantics). Per shard the scorer is
    * a document-at-a-time merge over the term cursors — work is bounded
    * by the UNION of the query terms' postings, the same bound WAND has
    * before its skipping; msm < n forfeits WAND pruning because a doc's
    * eligibility depends on its match COUNT, which upper bounds can't
    * prove absent.
    */
  def minShouldMatchTopK(
      spark: SparkSession,
      blocks: Dataset[PostingBlock],
      termStats: Dataset[TermStat],
      corpus: CorpusStats,
      query: String,
      m: Int,
      k: Int,
      cfg: IndexBuilder.Config = IndexBuilder.Config(),
      tombstones: TombstoneSet = TombstoneSet.empty,
      excluded: Seq[String] = Nil
  ): DataFrame = {
    import spark.implicits._
    require(m >= 1, s"minimumShouldMatch must be >= 1, got $m")
    val analyzed = Analyzer.analyzeQuery(query, cfg.analyzer)
    if (analyzed.isEmpty) return emptyScores(spark)
    val negTerms = excluded.flatMap(t => Analyzer.tokenize(t, cfg.analyzer)).distinct
    val allNames = (analyzed.map(_._1) ++ negTerms).distinct
    val idfs: Map[String, Double] = termStats
      .filter($"term".isin(allNames: _*))
      .collect().map(t => t.term -> t.idf).toMap
    val qts = analyzed.collect {
      case (t, qtf) if idfs.contains(t) => QTerm(t, qtf * idfs(t))
    }.sortBy(_.term)
    // fewer live terms than m => no document can reach the threshold
    if (qts.size < m) return emptyScores(spark)
    // an excluded term with no postings excludes nothing
    val excl = negTerms.filter(idfs.contains)
    val scanNames = (qts.map(_.term) ++ excl).distinct

    val p = cfg.params
    val avgdl = corpus.avgdl
    val kk = k
    val mm = m
    val qtsB = spark.sparkContext.broadcast(qts)
    val exclB = spark.sparkContext.broadcast(excl)
    val tsB = tombstones.broadcastVia(spark)
    val parts = math.max(1, math.min(cfg.numShards,
      spark.sparkContext.defaultParallelism))
    scoringBlocks(blocks)
      .filter($"term".isin(scanNames: _*))
      .repartition(parts, $"shardId")
      .sortWithinPartitions($"shardId", $"term", $"minDocId")
      .mapPartitions { it =>
        MsmScorer.scorePartition(it.buffered, qtsB.value, exclB.value, mm, kk,
          p.k1, p.b, avgdl, tsB.value)
      }
      .toDF("docId", "score")
      .orderBy($"score".desc, $"docId".asc)
      .limit(k)
  }

  /** m-of-n doc-at-a-time merge + BM25 scoring per shard. */
  private[query] object MsmScorer {
    import WandScorer.Cursor

    /** Rows must arrive sorted by (shardId, term, minDocId). */
    def scorePartition(
        it: BufferedIterator[PostingBlock],
        qts: Seq[QTerm],
        excluded: Seq[String],
        m: Int,
        k: Int,
        k1: Double, b: Double, avgdl: Double,
        tombstones: TombstoneSet
    ): Iterator[(Long, Double)] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Double)]
      while (it.hasNext) {
        val byTerm = nextShardGroup(it)
        // qts is term-sorted, so iterating cursors in build order pins
        // the ascending-term summation order
        val cursors = qts.flatMap { q =>
          byTerm.get(q.term).map(bs =>
            new Cursor(q.term, q.weight, bs.sortBy(_.minDocId).toArray, k1, b, avgdl))
        }.toArray
        val not = excluded.flatMap(t => byTerm.get(t).map(bs =>
          new Cursor(t, 0.0, bs.sortBy(_.minDocId).toArray, k1, b, avgdl))).toArray
        if (cursors.length >= m) out ++= mergeShard(cursors, not, m, k, tombstones)
      }
      out.iterator
    }

    private def mergeShard(cursors: Array[Cursor], not: Array[Cursor], m: Int,
        k: Int, tombstones: TombstoneSet): Seq[(Long, Double)] = {
      val heap = new TopKHeap(k)
      var liveCount = cursors.count(!_.exhausted)
      while (liveCount >= m) {
        // current minimum docId across live cursors
        var minDoc = Long.MaxValue
        var i = 0
        while (i < cursors.length) {
          if (!cursors(i).exhausted && cursors(i).curDoc < minDoc)
            minDoc = cursors(i).curDoc
          i += 1
        }
        // count + score the cursors sitting on it (ascending term order)
        var dead = tombstones.contains(minDoc)
        var matched = 0
        var score = 0.0
        var j = 0
        while (j < cursors.length) {
          if (!cursors(j).exhausted && cursors(j).curDoc == minDoc) {
            matched += 1
            if (!dead) score += cursors(j).currentContribution()
          }
          j += 1
        }
        // exclusion cursors skip forward lazily: minDoc is monotone within
        // a shard, so each advanceTo is amortized over the merge
        if (!dead && matched >= m) {
          var x = 0
          while (x < not.length && !dead) {
            if (!not(x).exhausted) {
              not(x).advanceTo(minDoc)
              if (!not(x).exhausted && not(x).curDoc == minDoc) dead = true
            }
            x += 1
          }
        }
        if (!dead && matched >= m) heap.offer(minDoc, score)
        var a = 0
        while (a < cursors.length) {
          if (!cursors(a).exhausted && cursors(a).curDoc == minDoc) cursors(a).advance()
          a += 1
        }
        liveCount = cursors.count(!_.exhausted)
      }
      heap.drain()
    }
  }

  /** All-terms-required intersect + BM25 scoring per shard. */
  private[query] object ConjunctiveScorer {
    import WandScorer.Cursor

    /** Rows must arrive sorted by (shardId, term, minDocId). */
    def scorePartition(
        it: BufferedIterator[PostingBlock],
        qts: Seq[QTerm],
        excluded: Seq[String],
        k: Int,
        k1: Double, b: Double, avgdl: Double,
        tombstones: TombstoneSet = TombstoneSet.empty
    ): Iterator[(Long, Double)] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Double)]
      while (it.hasNext) {
        val byTerm = nextShardGroup(it)
        // docId-sharding co-locates a doc's postings: a match needs every
        // required term present in this shard
        if (qts.forall(q => byTerm.contains(q.term))) {
          // qts is term-sorted, so contributions sum in ascending term
          // order — the pinned summation order of every scoring path
          val req = qts.map(q => new Cursor(q.term, q.weight,
            byTerm(q.term).sortBy(_.minDocId).toArray, k1, b, avgdl)).toArray
          val not = excluded.flatMap(t => byTerm.get(t).map(bs =>
            new Cursor(t, 0.0, bs.sortBy(_.minDocId).toArray, k1, b, avgdl))).toArray
          out ++= intersectShard(req, not, k, tombstones)
        }
      }
      out.iterator
    }

    /** Leapfrog intersect over the required cursors; heap top-k under the
      * global tie-break (score desc, docId asc).
      */
    private def intersectShard(req: Array[Cursor], not: Array[Cursor],
        k: Int, tombstones: TombstoneSet): Seq[(Long, Double)] = {
      val heap = new TopKHeap(k)
      var done = false
      while (!done) {
        var target = Long.MinValue
        var i = 0
        while (i < req.length && !done) {
          if (req(i).exhausted) done = true
          else if (req(i).curDoc > target) target = req(i).curDoc
          i += 1
        }
        if (!done) {
          var aligned = true
          var j = 0
          while (j < req.length && !done) {
            if (req(j).curDoc < target) {
              req(j).advanceTo(target)
              if (req(j).exhausted) done = true
              else if (req(j).curDoc != target) aligned = false
            }
            j += 1
          }
          if (!done && aligned) {
            var dropped = tombstones.contains(target)
            var x = 0
            while (x < not.length && !dropped) {
              if (!not(x).exhausted) {
                not(x).advanceTo(target)
                if (!not(x).exhausted && not(x).curDoc == target) dropped = true
              }
              x += 1
            }
            if (!dropped) {
              var score = 0.0
              var m = 0
              while (m < req.length) { score += req(m).currentContribution(); m += 1 }
              heap.offer(target, score)
            }
            var a = 0
            while (a < req.length && !done) {
              req(a).advance()
              if (req(a).exhausted) done = true
              a += 1
            }
          }
        }
      }
      heap.drain()
    }
  }

  // ------------------------------------------------- unified search box

  /** A parsed search-box query: quoted phrases (optional `~slop` suffix),
    * `-`-prefixed exclusions, trailing-`*` prefix wildcards, plain free
    * terms — the one-text-field serving grammar the reference exposes
    * (/root/reference/api/combined.py:159; App.js search box), which
    * round 4 served through seven separate APIs.
    */
  final case class ParsedQuery(
      free: Seq[String],
      phrases: Seq[(String, Int)],
      excluded: Seq[String],
      prefixes: Seq[String],
      fields: Seq[(String, String)] = Nil)

  private val PhraseRe = """"([^"]*)"(?:~(\d+))?""".r
  private val FieldRe = """^([a-z_]+):(.+)$""".r

  /** The transcript schema's column names — what a `field:value` token may
    * name when no docs relation is available to enumerate columns (derived
    * from the Doc case class so it can never drift from the schema).
    * Docs-present calls still accept any column of the passed relation;
    * docs-less calls treat every other colon-bearing token (URLs,
    * 're:deploy') as stray free text, and a token naming a REAL column
    * throws the same pass-the-docs contract error as before — the same
    * query string never silently changes meaning between the two call
    * shapes.
    */
  val MetadataFields: Set[String] =
    org.apache.spark.sql.Encoders.product[graft.model.Doc].schema.fieldNames.toSet

  /** Largest accepted `~slop`: beyond it proximity is effectively "both
    * terms anywhere in the doc" and the per-start chain bound
    * `(n-1)+slop` must not overflow. Oversized (or unparseable) slops
    * clamp here instead of crashing the serving entry point.
    */
  val MaxSlop = 1 << 20

  /** Parse the search-box grammar. Quoted segments become phrases (an
    * empty or blank quote is dropped); of the remaining whitespace tokens,
    * `field:value` (Lucene fielded-term syntax — lowercase field name)
    * filters on a document metadata column, `-tok` excludes, `tok*` is a
    * prefix wildcard, anything else is a free term. A stray unmatched
    * quote is treated as whitespace.
    */
  def parseQuery(query: String): ParsedQuery = {
    val phrases = PhraseRe.findAllMatchIn(query).map { mm =>
      (mm.group(1), Option(mm.group(2))
        .map(s => s.toIntOption.getOrElse(MaxSlop).min(MaxSlop)).getOrElse(0))
    }.filter(_._1.trim.nonEmpty).toSeq
    val rest = PhraseRe.replaceAllIn(query, " ").replace("\"", " ")
    val toks = rest.split("\\s+").toSeq.filter(_.nonEmpty)
    val (fieldToks, rest2) = toks.partition {
      case FieldRe(_, _) => true
      case _ => false
    }
    val fields = fieldToks.collect { case FieldRe(f, v) => (f, v) }
    val (neg, pos) = rest2.partition(t => t.length > 1 && t.startsWith("-"))
    val (wild, plain) = pos.partition(t => t.length > 1 && t.endsWith("*"))
    ParsedQuery(plain, phrases, neg.map(_.drop(1)), wild, fields)
  }

  /** The unified serving entry point: one call accepting the full
    * search-box grammar — `spark join "data stream"~2 dat* -flink` — plus
    * an optional minimum-should-match.
    *
    * Semantics: a document matches iff it contains every quoted phrase
    * (within that phrase's slop), contains none of the excluded terms, and
    * contains at least `minShouldMatch` of the DISTINCT positive terms
    * (free terms + phrase words + wildcard expansions). Ranking is BM25
    * over the positive terms the document contains. One scoring exception,
    * Lucene-faithful: a LONE quoted phrase (nothing else in the box) keeps
    * PhraseQuery scoring — the phrase as a single term (tf = occurrence
    * count, idf over the phrase df) — exactly [[phraseTopK]].
    *
    * Routing (each single-feature query runs the scorer it always had —
    * property-tested identical in SearchSpec):
    *   - plain terms, m=1            → [[wandTopK]] (block-max WAND)
    *   - plain terms, m=n (or -term) → [[conjunctiveTopK]] (leapfrog AND)
    *   - plain terms, 1<m<n          → [[minShouldMatchTopK]]
    *   - `tok*` anywhere             → dictionary expansion (one capped,
    *                                   predicate-pushed scan) into the above
    *   - lone `"phrase"~s`           → [[phraseTopK]]
    *   - `"phrase"` + free terms     → [[phraseFilterRank]]
    *   - any other mix               → [[composedTopK]] (phrase survivors
    *                                   semi-join-prune the term postings;
    *                                   exclusions anti-join; msm on the
    *                                   per-doc distinct-match count)
    *   - `field:value` anywhere      → filter-then-rank through
    *                                   [[composedTopK]]: the doc metadata
    *                                   relation (`docs`, REQUIRED then) is
    *                                   filtered on the named columns —
    *                                   predicate pushed to its parquet —
    *                                   and doc-level-prunes the candidates.
    *                                   Stats stay corpus-wide (Lucene
    *                                   filter semantics, not a sub-corpus
    *                                   rebuild).
    * Every route is bounded by the query terms' postings — never a corpus
    * scan — and the same plan shapes the dedicated APIs are plan-asserted
    * to have.
    *
    * @param docs the live documents view ([[graft.index.IndexStore.Index.docs]]
    *             as a DataFrame) — only needed for `field:value` queries;
    *             being the LIVE view it also carries tombstone filtering
    *             for the fielded path.
    */
  def search(
      spark: SparkSession,
      blocks: Dataset[PostingBlock],
      termStats: Dataset[TermStat],
      corpus: CorpusStats,
      query: String,
      k: Int,
      minShouldMatch: Int = 1,
      cfg: IndexBuilder.Config = IndexBuilder.Config(),
      tombstones: TombstoneSet = TombstoneSet.empty,
      docs: Option[DataFrame] = None
  ): DataFrame = {
    require(minShouldMatch >= 1, s"minShouldMatch must be >= 1, got $minShouldMatch")
    val pq0 = parseQuery(query)
    // forgiveness for accidental colons (Lucene-style search boxes see
    // URLs, 're:deploy', field typos): only tokens naming an ACTUAL doc
    // metadata column act as filters; the rest fall back to plain text
    // ('http://x' searches the terms http/x instead of crashing on an
    // unresolved column)
    // without a docs relation the metadata columns are unknowable, so only
    // the transcript schema's documented filterable fields count as field
    // queries there — a stray 'http://x' or 're:deploy' falls back to free
    // text instead of crashing the docs-less serving path (ADVICE r5: one
    // such token used to throw and fail a whole searchBatch)
    val (knownFields, strayFields) = docs match {
      case Some(d) => pq0.fields.partition { case (f, _) => d.columns.contains(f) }
      case None => pq0.fields.partition { case (f, _) => MetadataFields.contains(f) }
    }
    if (knownFields.nonEmpty && docs.isEmpty)
      throw new IllegalArgumentException(
        s"query [$query] has field predicates ${knownFields.map(f => f._1 + ":" + f._2)} " +
          "— pass the docs relation")
    val pq = pq0.copy(
      free = pq0.free ++ strayFields.map { case (f, v) => s"$f $v" },
      fields = knownFields)
    val fieldFilter: Option[DataFrame] = if (pq.fields.isEmpty) None else {
      val d = docs.get
      Some(pq.fields.foldLeft(d) { case (acc, (f, v)) => acc.filter(col(f) === v) }
        .select(col("docId")))
    }
    val stems = analyzePrefixStems(pq.prefixes.map(_.dropRight(1)))
    val expanded = expandPrefixes(spark, termStats, stems)
    val literal = Analyzer.analyzeQuery(
      (pq.free ++ pq.phrases.map(_._1)).mkString(" "), cfg.analyzer)
    // one weight per distinct positive term; a term typed AND matched by a
    // wildcard sums its occurrences, like prefixTopK
    val positive = (literal ++ expanded)
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toSeq.sortBy(_._1)
    val excl = pq.excluded.flatMap(t => Analyzer.tokenize(t, cfg.analyzer)).distinct
    val m = minShouldMatch
    // a filter-only query ('role:user', no scoring terms) is a match-all
    // under the filter: constant score 0, docId order — Lucene's
    // MatchAllDocsQuery + filter shape, not an empty result. '-term'
    // exclusions still apply ('role:user -spark' = the user turns that
    // don't contain spark), as a doc-level anti-join on the excluded
    // terms' postings. Match-all fires only when the user typed NO
    // positive intent at all: a wildcard that expanded to zero dictionary
    // terms ('role:user zzz*') matches nothing, like Lucene — it must not
    // silently widen to every filtered doc (ADVICE r5).
    if (positive.isEmpty && fieldFilter.nonEmpty && pq.phrases.isEmpty &&
        pq.prefixes.isEmpty) {
      import spark.implicits._
      val base = fieldFilter.get
      val filtered =
        if (excl.isEmpty) base
        else {
          val exclDocs = scoringBlocks(blocks).toDF()
            .filter($"term".isin(excl: _*))
            .select(explode(graft.plans.DecodeBlock($"payload", $"n")).as("pp"))
            .select($"pp.docId".as("docId"))
          base.join(exclDocs, Seq("docId"), "left_anti")
        }
      return filtered.select($"docId", lit(0.0).as("score"))
        .orderBy($"docId".asc).limit(k)
    }
    // more required matches than distinct positive terms is unsatisfiable
    if (positive.isEmpty || m > positive.size) return emptyScores(spark)
    // re-synthesized token stream carrying the exact (term, qtf) weights
    // for the query-text-taking dedicated APIs (analysis is idempotent on
    // analyzed terms)
    def posText = positive.flatMap { case (t, n) => Seq.fill(n)(t) }.mkString(" ")

    if (fieldFilter.nonEmpty) {
      composedTopK(spark, blocks, termStats, corpus, positive, pq.phrases, excl,
        m, k, cfg, tombstones, fieldFilter)
    } else if (pq.phrases.isEmpty) {
      if (excl.isEmpty && m == 1)
        wandTopK(spark, blocks, termStats, corpus, posText, k, cfg, tombstones)
      else if (m == positive.size)
        conjunctiveTopK(spark, blocks, termStats, corpus,
          (posText +: excl.map("-" + _)).mkString(" "), k, cfg, tombstones)
      else
        minShouldMatchTopK(spark, blocks, termStats, corpus, posText, m, k, cfg,
          tombstones, excl)
    } else if (pq.phrases.size == 1 && pq.free.isEmpty && pq.prefixes.isEmpty &&
        excl.isEmpty) {
      // a phrase match contains every phrase word, so any satisfiable m is
      // already met — scoring is the phrase-as-one-term PhraseQuery shape
      phraseTopK(spark, blocks, corpus, pq.phrases.head._1, k, cfg,
        pq.phrases.head._2, tombstones)
    } else if (pq.phrases.size == 1 && pq.phrases.head._2 == 0 &&
        pq.prefixes.isEmpty && excl.isEmpty && m == 1) {
      phraseFilterRank(spark, blocks, termStats, corpus, pq.free.mkString(" "),
        pq.phrases.head._1, k, cfg, tombstones)
    } else {
      composedTopK(spark, blocks, termStats, corpus, positive, pq.phrases, excl,
        m, k, cfg, tombstones)
    }
  }

  /** Batched unified search — a whole request batch through the one
    * search-box grammar in as few jobs as possible: queries that reduce to
    * plain disjunctive WAND after parsing (no phrases / exclusions /
    * fields; wildcards are fine — every query's stems expand in ONE
    * dictionary scan) share a single [[wandTopKBatch]] job (shared block
    * scan + per-shard decode memo, the measured ~3× amortization of the
    * per-job scheduler floor); the rest run their routed plans and union
    * in. Returns (qid, docId, score), per-qid top-k, each qid identical to
    * a [[search]] call with the same text (property-tested).
    *
    * `minShouldMatch` applies to every query in the batch (callers with
    * per-query msm issue those queries separately).
    */
  def searchBatch(
      spark: SparkSession,
      blocks: Dataset[PostingBlock],
      termStats: Dataset[TermStat],
      corpus: CorpusStats,
      queries: Seq[(String, String)],
      k: Int,
      minShouldMatch: Int = 1,
      cfg: IndexBuilder.Config = IndexBuilder.Config(),
      tombstones: TombstoneSet = TombstoneSet.empty,
      docs: Option[DataFrame] = None
  ): DataFrame = {
    import spark.implicits._
    // duplicate qids would silently cross-wire the per-qid stems map and
    // merge two queries' candidates under one window partition
    require(queries.map(_._1).distinct.size == queries.size,
      s"duplicate qids in batch: ${queries.map(_._1)}")
    def empty: DataFrame =
      spark.emptyDataset[(String, Long, Double)].toDF("qid", "docId", "score")
    // stray colon tokens (URLs, field typos) are classified EXACTLY like
    // search() does before routing, so a query that search() would degrade
    // to plain free text stays in the shared WAND batch instead of paying
    // an individual job for a cosmetic token
    val parsed = queries.map { case (qid, q) =>
      val pq0 = parseQuery(q)
      val (knownFields, strayFields) = docs match {
        case Some(d) => pq0.fields.partition { case (f, _) => d.columns.contains(f) }
        case None => pq0.fields.partition { case (f, _) => MetadataFields.contains(f) }
      }
      (qid, q, pq0.copy(
        free = pq0.free ++ strayFields.map { case (f, v) => s"$f $v" },
        fields = knownFields))
    }
    val (plain, other) =
      if (minShouldMatch == 1)
        parsed.partition { case (_, _, pq) =>
          pq.phrases.isEmpty && pq.excluded.isEmpty && pq.fields.isEmpty
        }
      else (Nil, parsed)
    // every plain query's wildcard stems expand in one dictionary scan
    val stems: Map[String, Seq[(String, Int)]] = plain.map { case (qid, _, pq) =>
      qid -> analyzePrefixStems(pq.prefixes.map(_.dropRight(1)))
    }.toMap
    val byStem = expandStems(spark, termStats, stems.values.flatten.map(_._1).toSeq)
    val plainTexts: Seq[(String, String)] = plain.flatMap { case (qid, _, pq) =>
      val expanded = stems(qid).flatMap { case (p, qtf) =>
        byStem.getOrElse(p, Nil).map(_ -> qtf)
      }
      val positive = (Analyzer.analyzeQuery(pq.free.mkString(" "), cfg.analyzer) ++
        expanded).groupBy(_._1).view.mapValues(_.map(_._2).sum).toSeq.sortBy(_._1)
      if (positive.isEmpty) None
      else Some(qid -> positive.flatMap { case (t, n) => Seq.fill(n)(t) }.mkString(" "))
    }
    val batched =
      if (plainTexts.isEmpty) empty
      else wandTopKBatch(spark, blocks, termStats, corpus, plainTexts, k, cfg,
        tombstones)
    other.foldLeft(batched) { case (acc, (qid, q, _)) =>
      acc.unionByName(
        search(spark, blocks, termStats, corpus, q, k, minShouldMatch, cfg,
          tombstones, docs)
          .select(lit(qid).as("qid"), $"docId", $"score"))
    }
  }

  /** The general composed query: every phrase is a filter, exclusions drop
    * candidates, minimum-should-match gates on the per-doc distinct-match
    * count, and ranking is the BM25 fold over the positive terms — the
    * [[phraseFilterRank]] plan generalized.
    *
    * Scale shape: each phrase's survivor relation is bounded by its rarest
    * term and semi-join-prunes the decoded postings (broadcast when that
    * rarest term's dictionary df — a proven upper bound on the survivor
    * count, fetched in the same collect as the idfs — fits the cap, else
    * shuffle); exclusions are a
    * doc-level anti-join against the excluded terms' postings; everything
    * sits on the term-pushed block scan. Tombstones are enforced by the
    * positional matcher inside every phrase filter, or — on the fielded
    * path — by `docFilter` being derived from the LIVE docs view; every
    * call has at least one of the two, so no candidate needs a second
    * check.
    *
    * @param docFilter optional doc-level survivor relation (docId) — the
    *        `field:value` filter-then-rank path. Joined as a plain (AQE-
    *        adaptive) semi-join, never an unconditional broadcast: a field
    *        predicate like role:user keeps a constant FRACTION of the
    *        corpus, unlike a phrase's rarest-term-bounded survivor set.
    */
  private[graft] def composedTopK(
      spark: SparkSession,
      blocks: Dataset[PostingBlock],
      termStats: Dataset[TermStat],
      corpus: CorpusStats,
      positive: Seq[(String, Int)],
      phrases: Seq[(String, Int)],
      excluded: Seq[String],
      m: Int,
      k: Int,
      cfg: IndexBuilder.Config,
      tombstones: TombstoneSet,
      docFilter: Option[DataFrame] = None
  ): DataFrame = {
    import spark.implicits._
    require(phrases.nonEmpty || docFilter.nonEmpty,
      "composedTopK needs a phrase or a doc filter (tombstone enforcement)")
    if (positive.isEmpty) return emptyScores(spark)
    // every phrase must analyze to something or the result is empty
    // (resolve ALL the lazy relations before doing any work — ADVICE r5)
    val lazySets = phrases.map { case (ph, slop) =>
      phraseMatches(spark, blocks, ph, cfg, slop, tombstones)
    }
    if (lazySets.exists(_.isEmpty)) return emptyScores(spark)
    val matchSets = lazySets.map(_.get)
    // ONE stats collect serves the scoring weights AND the join-strategy
    // gate: a phrase's survivor count is bounded by its rarest term's df
    // (every match contains every phrase term), so the dictionary df
    // replaces the round-5 persist + count() probe — the same
    // driver-safety bound on the broadcast with one fewer eager action
    // per phrase, and the match relation now has a single consumer inside
    // the scoring job (no session-cache footprint at all). Slightly more
    // conservative than the measured count in one corner — min-df > cap
    // with an actual survivor set under it takes the shuffle join — which
    // only ever trades a broadcast for the AQE-planned join, never the
    // reverse. The big decoded-postings side still never shuffles on the
    // broadcast path (guide §1.2 step 1 / §3.1).
    val phraseToks = phrases.map { case (ph, _) =>
      Analyzer.tokenize(ph, cfg.analyzer).distinct
    }
    val names = (positive.map(_._1) ++ phraseToks.flatten).distinct
    val stats: Map[String, (Double, Long)] = termStats
      .filter($"term".isin(names: _*))
      .collect().map(t => t.term -> (t.idf, t.df)).toMap
    // a phrase term absent from the dictionary can match nowhere
    if (phraseToks.exists(_.exists(t => !stats.contains(t))))
      return emptyScores(spark)
    val live = positive.filter { case (t, _) => stats.contains(t) }
    if (live.isEmpty || live.size < m) return emptyScores(spark)
    val qdf = broadcast(live.map { case (t, qtf) => (t, qtf, stats(t)._1) }
      .toDF("term", "qtf", "idf"))
    val p = cfg.params
    val post = scoringBlocks(blocks).toDF()
      .filter($"term".isin(live.map(_._1): _*))
      .select($"term", explode(graft.plans.DecodeBlock($"payload", $"n")).as("pp"))
      .select($"term", $"pp.docId".as("docId"), $"pp.tf".as("tf"), $"pp.dl".as("dl"))
    val phrasePruned0 = matchSets.zip(phraseToks).foldLeft(post) { case (acc, (ms, toks)) =>
      val survivors = ms.select($"docId")
      if (toks.map(t => stats(t)._2).min <= PhraseBroadcastCap)
        acc.join(broadcast(survivors), Seq("docId"), "left_semi")
      else acc.join(survivors, Seq("docId"), "left_semi")
    }
    val phrasePruned = docFilter.fold(phrasePruned0)(f =>
      phrasePruned0.join(f.select($"docId"), Seq("docId"), "left_semi"))
    val exclLive = excluded.distinct
    val pruned =
      if (exclLive.isEmpty) phrasePruned
      else {
        val exclDocs = scoringBlocks(blocks).toDF()
          .filter($"term".isin(exclLive: _*))
          .select(explode(graft.plans.DecodeBlock($"payload", $"n")).as("pp"))
          .select($"pp.docId".as("docId"))
        phrasePruned.join(exclDocs, Seq("docId"), "left_anti")
      }
    // cs has at most one entry per distinct positive term (post is keyed
    // by (term, docId); q by term), so size(cs) IS the distinct-match count
    pruned
      .join(qdf, Seq("term"))
      .withColumn("contrib",
        contributionCol($"qtf", $"idf", $"tf", $"dl", corpus.avgdl, p))
      .groupBy($"docId")
      .agg(collect_list(struct($"term", $"contrib")).as("cs"))
      .filter(size($"cs") >= m)
      .select($"docId",
        aggregate(array_sort($"cs"), lit(0.0),
          (acc, x) => acc + x.getField("contrib")).as("score"))
      .orderBy($"score".desc, $"docId".asc)
      .limit(k)
  }

  // --------------------------------------------------------------- phrase

  /** Exact phrase top-k over a POSITIONAL index (built with
    * `cfg.storePositions = true`): documents containing the analyzed
    * phrase's terms at consecutive positions in the filtered token stream,
    * scored as BM25 of the phrase-as-one-term — tf = phrase occurrence
    * count, df = matching-doc count, idf = ln((N+1)/(df+1)). Standard
    * Lucene PhraseQuery semantics under stopword removal ("state of the
    * art" matches where "state art" are adjacent in the filtered stream).
    *
    * `slop > 0` relaxes adjacency to ordered proximity ("a b"~slop): a
    * match is a strictly increasing position chain p_1 < ... < p_n with
    * p_n - p_1 <= (n-1) + slop, and tf = the number of distinct start
    * positions with at least one such chain (the minimal completion is
    * greedy, so existence is exact). slop = 0 degenerates to adjacency.
    *
    * Plan: term-pushed block scan (positions column read ONLY here — BM25
    * paths never project it) → per-shard document-at-a-time positional
    * intersect in mapPartitions (docId-sharding co-locates all of a doc's
    * postings, so no cross-shard coordination; candidates are bounded by
    * the rarest term's postings — never a token-level explode/shuffle) →
    * persisted match relation → global df → score + TakeOrderedAndProject.
    */
  def phraseTopK(
      spark: SparkSession,
      blocks: Dataset[PostingBlock],
      corpus: CorpusStats,
      phrase: String,
      k: Int,
      cfg: IndexBuilder.Config = IndexBuilder.Config(),
      slop: Int = 0,
      tombstones: TombstoneSet = TombstoneSet.empty
  ): DataFrame = {
    import spark.implicits._
    val lazyMatches = phraseMatches(spark, blocks, phrase, cfg, slop, tombstones)
      .getOrElse(return emptyScores(spark))
    // two consumers (df count + scoring): persisted, left to LRU eviction
    // like the other one-shot sweep intermediates (TrainingData note).
    // NOTE (optimization round): folding the count into the scoring plan
    // via a broadcast scalar aggregate was tried and MEASURED SLOWER
    // (+0.09 s/query at sf0.1 — the BroadcastExchange job outweighs a
    // count() on the cached matches), so the explicit count stays.
    val matches = lazyMatches.persist()
    val dfp = matches.count()
    if (dfp == 0) { matches.unpersist(); return emptyScores(spark) }
    val p = cfg.params
    // same association as the term scorer (contributionCol), qtf = 1;
    // StrictMath.log matches Catalyst's log() used for the term idf
    val idf = StrictMath.log((corpus.docCount + 1.0) / (dfp + 1.0))
    matches
      .select($"docId",
        contributionCol(lit(1), lit(idf), $"tfp", $"dl", corpus.avgdl, p).as("score"))
      .orderBy($"score".desc, $"docId".asc)
      .limit(k)
  }

  /** Max phrase-survivor rows the composed paths will broadcast (~32 MB
    * of docIds at 4M — comfortably under broadcast limits); beyond it the
    * semi-join degrades to a shuffle join rather than risking the driver.
    * Gated on the phrase's rarest term's dictionary df (survivors ⊆ the
    * rarest term's postings, so df ≥ the survivor count — driver-safe
    * without a counting job).
    */
  val PhraseBroadcastCap = 4000000L

  /** Mixed quoted + free-term query — the search-box semantics for
    * `spark join "data stream"`: the quoted phrase is a FILTER (docs must
    * contain the exact adjacency), and ranking is full BM25 over ALL the
    * query's terms (phrase words included as regular terms). Exact at any
    * scale: the candidate set is bounded by the phrase's rarest term, the
    * term postings come from the term-pushed block scan, and the phrase
    * survivors prune them with a semi-join before any scoring — no
    * full-corpus work anywhere.
    */
  def phraseFilterRank(
      spark: SparkSession,
      blocks: Dataset[PostingBlock],
      termStats: Dataset[TermStat],
      corpus: CorpusStats,
      freeTerms: String,
      phrase: String,
      k: Int,
      cfg: IndexBuilder.Config = IndexBuilder.Config(),
      tombstones: TombstoneSet = TombstoneSet.empty
  ): DataFrame = {
    // the single-phrase case of the general composed plan — ONE
    // implementation of the decode → df-gated-broadcast semi-join →
    // ascending-term BM25 fold pipeline, so the rank-identity-bearing
    // fold and the PhraseBroadcastCap degrade rule cannot drift between
    // this route and search()'s composed route
    val positive = Analyzer.analyzeQuery(freeTerms + " " + phrase, cfg.analyzer)
    composedTopK(spark, blocks, termStats, corpus, positive,
      Seq((phrase, 0)), Nil, 1, k, cfg, tombstones)
  }

  /** The lazy (un-persisted) phrase match relation (docId, tfp, dl) —
    * exposed separately so plan-shape tests can assert on the actual scan
    * (term pushdown + positions column) before the persist hides it. None
    * when the analyzed phrase is empty.
    */
  private[graft] def phraseMatches(
      spark: SparkSession,
      blocks: Dataset[PostingBlock],
      phrase: String,
      cfg: IndexBuilder.Config,
      slop: Int = 0,
      tombstones: TombstoneSet = TombstoneSet.empty
  ): Option[DataFrame] = {
    import spark.implicits._
    val terms = Analyzer.tokenize(phrase, cfg.analyzer) // order + duplicates matter
    if (terms.isEmpty) return None
    val distinctTerms = terms.distinct
    val termsB = spark.sparkContext.broadcast(terms)
    val tsB = tombstones.broadcastVia(spark)
    val slop0 = slop
    val parts = math.max(1, math.min(cfg.numShards,
      spark.sparkContext.defaultParallelism))
    Some(blocks
      .filter($"term".isin(distinctTerms: _*))
      .repartition(parts, $"shardId")
      .sortWithinPartitions($"shardId", $"term", $"minDocId")
      .mapPartitions { it =>
        PhraseScorer.matchPartition(it.buffered, termsB.value, slop0, tsB.value)
      }
      .toDF("docId", "tfp", "dl"))
  }

  /** Positional intersect: emits (docId, phraseTf, dl) per matching doc. */
  private[query] object PhraseScorer {

    private final class PosCursor(blocks: Array[PostingBlock]) {
      private var bi = 0
      private var decoded: Array[Codec.P] = _
      private var poss: Array[Array[Int]] = _
      private var pi = 0
      var exhausted: Boolean = false
      loadBlock()

      private def loadBlock(): Unit = {
        val b = blocks(bi)
        if (b.positions.isEmpty && b.sumTf > 0)
          throw new IllegalStateException(
            "phrase query requires a positional index (build with storePositions = true)")
        decoded = Codec.decode(b.payload, b.n)
        poss = Codec.decodePositions(b.positions, decoded.map(_.tf))
        pi = 0
      }

      def curDoc: Long = decoded(pi).docId
      def curDl: Int = decoded(pi).dl
      def curPositions: Array[Int] = poss(pi)

      def advance(): Unit = {
        pi += 1
        if (pi >= decoded.length) {
          bi += 1
          if (bi >= blocks.length) { exhausted = true; decoded = null; poss = null }
          else loadBlock()
        }
      }

      /** Skip to the first posting with docId >= target; whole blocks are
        * skipped on maxDocId metadata without decoding. */
      def advanceTo(target: Long): Unit = {
        if (exhausted) return
        if (blocks(bi).maxDocId < target) {
          var nb = bi + 1
          while (nb < blocks.length && blocks(nb).maxDocId < target) nb += 1
          bi = nb
          if (bi >= blocks.length) { exhausted = true; decoded = null; poss = null; return }
          loadBlock()
        }
        while (decoded(pi).docId < target) pi += 1 // maxDocId bound => terminates
      }
    }

    /** Rows must arrive sorted by (shardId, term, minDocId). Shard groups
      * are consumed LAZILY, one at a time: a high-df phrase holds at most
      * one shard's match set in memory, never the whole partition's
      * (the per-shard set is itself bounded by the shard's doc range).
      */
    def matchPartition(
        it: BufferedIterator[PostingBlock],
        terms: Seq[String],
        slop: Int = 0,
        tombstones: TombstoneSet = TombstoneSet.empty
    ): Iterator[(Long, Int, Int)] = {
      val distinctTerms = terms.distinct
      new Iterator[(Long, Int, Int)] {
        private var cur: Iterator[(Long, Int, Int)] = Iterator.empty
        private def refill(): Unit =
          while (!cur.hasNext && it.hasNext) {
            val byTerm = nextShardGroup(it)
            // docId-sharding co-locates a doc's postings: a match needs
            // every distinct phrase term present in this shard
            if (distinctTerms.forall(byTerm.contains)) {
              val cursors = distinctTerms.map(t =>
                t -> new PosCursor(byTerm(t).sortBy(_.minDocId).toArray)).toMap
              cur = intersectShard(cursors, terms, slop, tombstones).iterator
            }
          }
        override def hasNext: Boolean = { refill(); cur.hasNext }
        override def next(): (Long, Int, Int) = { refill(); cur.next() }
      }
    }

    /** Leapfrog docId intersection + (slop-windowed) position count. */
    private def intersectShard(
        cursors: Map[String, PosCursor],
        terms: Seq[String],
        slop: Int,
        tombstones: TombstoneSet = TombstoneSet.empty
    ): Seq[(Long, Int, Int)] = {
      val cs = cursors.values.toArray
      val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Int, Int)]
      var done = false
      while (!done) {
        var target = Long.MinValue
        var i = 0
        while (i < cs.length && !done) {
          if (cs(i).exhausted) done = true
          else if (cs(i).curDoc > target) target = cs(i).curDoc
          i += 1
        }
        if (!done) {
          // advance all cursors to the current max docId
          var aligned = true
          var j = 0
          while (j < cs.length && !done) {
            if (cs(j).curDoc < target) {
              cs(j).advanceTo(target)
              if (cs(j).exhausted) done = true
              else if (cs(j).curDoc != target) aligned = false
            }
            j += 1
          }
          if (!done && aligned) {
            // tombstoned docs never match (they'd distort the phrase df)
            val dead = tombstones.contains(target)
            val tfp = if (dead) 0 else phraseCount(terms, cursors, slop)
            if (tfp > 0) out += ((target, tfp, cs(0).curDl))
            var m = 0
            while (m < cs.length && !done) {
              cs(m).advance()
              if (cs(m).exhausted) done = true
              m += 1
            }
          }
        }
      }
      out.toSeq
    }

    /** # of start positions with a valid occurrence: a strictly increasing
      * chain whose total span is <= (n-1)+slop, completed GREEDILY
      * (smallest position of term j strictly after the previous term's).
      * Greedy minimizes the final position, so a greedy miss proves no
      * chain exists for that start — and at slop = 0 the bound forces
      * every step to exactly 1, i.e. exact adjacency, so one loop serves
      * both semantics with no per-level array allocation.
      */
    private def phraseCount(terms: Seq[String], cursors: Map[String, PosCursor],
        slop: Int): Int = {
      val starts: Array[Int] = cursors(terms.head).curPositions
      if (terms.length == 1) return starts.length
      val bound = terms.length - 1 + slop
      var count = 0
      var s = 0
      while (s < starts.length) {
        val start = starts(s)
        var prev = start
        var ok = true
        var j = 1
        while (j < terms.length && ok) {
          val next = cursors(terms(j)).curPositions
          // smallest position strictly greater than prev
          val ins = java.util.Arrays.binarySearch(next, prev + 1)
          val idx = if (ins >= 0) ins else -ins - 1
          if (idx >= next.length) ok = false
          else { prev = next(idx); if (prev - start > bound) ok = false }
          j += 1
        }
        if (ok) count += 1
        s += 1
      }
      count
    }
  }

  /** Document-at-a-time WAND, one shard at a time within a partition. */
  private[query] object WandScorer {

    final class Cursor(val term: String, val weight: Double,
        blocks: Array[PostingBlock], k1: Double, b: Double, avgdl: Double,
        decodeFn: PostingBlock => Array[Codec.P] = b => Codec.decode(b.payload, b.n)) {
      // blocks are docId-sorted and non-overlapping within (shard, term).
      // Upper bounds derive from (maxTf, minDl) with the CURRENT corpus
      // avgdl: partial() is monotone up in tf, down in dl, so this bounds
      // every posting even after incremental appends moved avgdl.
      private def blockUb(i: Int): Double =
        weight * graft.index.IndexBuilder.partial(
          blocks(i).maxTf, blocks(i).minDl, k1, b, avgdl)
      val globalUb: Double = {
        var m = 0.0
        var i = 0
        while (i < blocks.length) { val u = blockUb(i); if (u > m) m = u; i += 1 }
        m
      }
      private var bi = 0
      private var decoded: Array[Codec.P] = decodeFn(blocks(0))
      private var pi = 0
      var exhausted: Boolean = false

      def curDoc: Long = decoded(pi).docId
      def curBlockUb: Double = blockUb(bi)

      def currentContribution(): Double =
        weight * Bm25.partial(decoded(pi).tf, decoded(pi).dl, k1, b, avgdl)

      def advance(): Unit = {
        pi += 1
        if (pi >= decoded.length) nextBlock()
      }

      /** Skip forward to the first posting with docId >= target. Whole
        * blocks are skipped on maxDocId metadata alone — only the landing
        * block is decoded.
        */
      def advanceTo(target: Long): Unit = {
        if (exhausted) return
        if (blocks(bi).maxDocId >= target) {
          // target lies in the current (already decoded) block
          while (decoded(pi).docId < target) pi += 1 // maxDocId bound => terminates
          return
        }
        var nb = bi + 1
        while (nb < blocks.length && blocks(nb).maxDocId < target) nb += 1
        bi = nb
        if (bi >= blocks.length) { exhausted = true; decoded = null; return }
        decoded = decodeFn(blocks(bi))
        pi = 0
        while (decoded(pi).docId < target) pi += 1
      }

      private def nextBlock(): Unit = {
        bi += 1
        if (bi >= blocks.length) { exhausted = true; decoded = null }
        else { decoded = decodeFn(blocks(bi)); pi = 0 }
      }
    }

    /** Rows must arrive sorted by (shardId, term, minDocId). */
    def scorePartition(
        it: BufferedIterator[PostingBlock],
        qts: Seq[QTerm],
        k: Int,
        k1: Double, b: Double, avgdl: Double,
        tombstones: TombstoneSet = TombstoneSet.empty
    ): Iterator[(Long, Double)] =
      scorePartitionBatch(it, Seq("" -> qts), k, k1, b, avgdl, tombstones)
        .map { case (_, d, s) => (d, s) }

    /** Batch variant: every query scored against each shard group while
      * its blocks are at hand. Decoded blocks are memoized per shard, so a
      * block shared by several queries is decoded once.
      */
    def scorePartitionBatch(
        it: BufferedIterator[PostingBlock],
        queries: Seq[(String, Seq[QTerm])],
        k: Int,
        k1: Double, b: Double, avgdl: Double,
        tombstones: TombstoneSet = TombstoneSet.empty
    ): Iterator[(String, Long, Double)] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[(String, Long, Double)]
      while (it.hasNext) {
        val byTerm = nextShardGroup(it)
        val sortedByTerm: Map[String, Array[PostingBlock]] =
          byTerm.iterator.map { case (t, bs) => t -> bs.sortBy(_.minDocId).toArray }.toMap
        // keyed by (term, minDocId): blockIdx is NOT unique within a
        // (shard, term) after an incremental append (delta blocks restart
        // at 0); minDocId is, because block docId ranges are disjoint
        val memo = scala.collection.mutable.HashMap.empty[(String, Long), Array[Codec.P]]
        val decode: PostingBlock => Array[Codec.P] = blk =>
          memo.getOrElseUpdate((blk.term, blk.minDocId), Codec.decode(blk.payload, blk.n))
        queries.foreach { case (qid, qts) =>
          val cursors = qts.flatMap { qt =>
            sortedByTerm.get(qt.term).map { bs =>
              new Cursor(qt.term, qt.weight, bs, k1, b, avgdl, decode)
            }
          }
          if (cursors.nonEmpty)
            out ++= wandShard(cursors.toArray, k, tombstones)
              .map { case (d, s) => (qid, d, s) }
        }
      }
      out.iterator
    }

    /** Plain WAND pivot selection on global term upper bounds, with a
      * block-max refinement: once a pivot is chosen, the sum of the
      * *current-block* upper bounds must still beat the threshold or the
      * pivot is skipped without decoding/scoring (Ding & Suel's BMW).
      * Threshold semantics respect the global tie-break
      * (score desc, docId asc): within a shard docIds only grow, so a
      * candidate whose upper bound is <= θ can never displace a heap entry.
      */
    private def wandShard(cursors: Array[Cursor], k: Int,
        tombstones: TombstoneSet = TombstoneSet.empty): Seq[(Long, Double)] = {
      val heap = new TopKHeap(k)
      def theta: Double = heap.theta

      val live = scala.collection.mutable.ArrayBuffer(cursors.toIndexedSeq: _*)
      while (live.nonEmpty) {
        val sorted = live.sortBy(_.curDoc)
        // pivot: first position where the prefix upper-bound sum beats theta
        var acc = 0.0
        var pivotIdx = -1
        var i = 0
        while (i < sorted.length && pivotIdx < 0) {
          acc += sorted(i).globalUb
          if (acc > theta) pivotIdx = i
          i += 1
        }
        if (pivotIdx < 0) {
          live.clear() // nothing remaining can beat theta
        } else {
          val pivotDoc = sorted(pivotIdx).curDoc
          // extend the pivot across docId ties: cursors beyond the first
          // index whose prefix UB beats theta can sit at pivotDoc too, and
          // the block-max bound below must cover EVERY cursor positioned at
          // pivotDoc or the skip branch silently drops a doc whose true
          // score (including the tied terms) exceeds theta (Ding & Suel's
          // BMW / Lucene pivot semantics)
          while (pivotIdx + 1 < sorted.length && sorted(pivotIdx + 1).curDoc == pivotDoc)
            pivotIdx += 1
          if (sorted.head.curDoc == pivotDoc) {
            // tombstoned (deleted) docs are skipped exactly like a failed
            // block-max bound: never scored, never a heap slot
            val dead = tombstones.contains(pivotDoc)
            // block-max refinement: tighten with current-block ubs
            var blockAcc = 0.0
            var j = 0
            while (j <= pivotIdx) { blockAcc += sorted(j).curBlockUb; j += 1 }
            if (!dead && blockAcc > theta) {
              // score pivotDoc exactly, ascending term order (cursors were
              // built term-sorted; sortBy on curDoc is stable, but re-sort
              // the matching set by term to pin summation order)
              val matching = sorted.iterator
                .takeWhile(_.curDoc == pivotDoc).toArray.sortBy(_.term)
              var score = 0.0
              var m = 0
              while (m < matching.length) { score += matching(m).currentContribution(); m += 1 }
              heap.offer(pivotDoc, score)
              matching.foreach(_.advance())
            } else {
              // skip: advance every cursor sitting on pivotDoc past it
              sorted.iterator.takeWhile(_.curDoc == pivotDoc)
                .foreach(_.advanceTo(pivotDoc + 1))
            }
          } else {
            // advance a lagging cursor. It MUST be one with curDoc strictly
            // below the pivot (cursors at indices < pivotIdx can already sit
            // AT pivotDoc when docIds tie) — advancing a cursor already at
            // pivotDoc is a no-op and would loop forever. Among the strict
            // predecessors, pick the largest upper bound (advances fastest).
            var limit = 0
            while (limit < pivotIdx && sorted(limit).curDoc < pivotDoc) limit += 1
            var best = 0
            var j = 1
            while (j < limit) {
              if (sorted(j).globalUb > sorted(best).globalUb) best = j
              j += 1
            }
            sorted(best).advanceTo(pivotDoc)
          }
          var li = live.length - 1
          while (li >= 0) { if (live(li).exhausted) live.remove(li); li -= 1 }
        }
      }
      heap.drain()
    }
  }
}
