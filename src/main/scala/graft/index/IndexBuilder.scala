package graft.index

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.functions.Analyzer
import graft.model._

/** Distributed inverted-index build (SURVEY.md §7.3 steps 3-6, 8).
  *
  * Two passes over the corpus (the reference made four:
  * /root/reference/data_processing/Lexical_indexing/bm25_precompute.py
  * runs avg-length, CountVectorizer.fit, IDF.fit and a UDF remap as
  * separate scans — SURVEY.md §3.2):
  *
  *   pass 1 — tokenize (codegen'd Column analyzer) → postings
  *            `Dataset[(term, docId, tf, dl)]` + doc/term/corpus stats;
  *            the postings Dataset is persisted;
  *   pass 2 — shard by docId range, sort-merge shuffle on
  *            (shardId, term, docId), stream-encode 128-posting
  *            delta+varint blocks with block-max metadata in
  *            mapPartitions (typed; never materializes a term's full
  *            list).
  *
  * Sharding = salted repartitioning: head terms (a Zipf head term can
  * appear in a large fraction of 10^12 turns) would hotspot a single
  * reducer if the shuffle key were `term` alone — the reference "solved"
  * skew by funneling everything to one GPU task via repartition(1)
  * (bm25_searcher.py:102-104). Our salt is the docId range shard, so a
  * head term's postings split evenly across all shards, each sub-list
  * stays docId-sorted, and the full list is the concatenation of its
  * shard sub-lists in shard order (no K-way merge needed). Doc-range
  * sharding also makes document-at-a-time WAND exact per shard.
  */
object IndexBuilder {

  final case class Config(
      analyzer: Analyzer.Config = Analyzer.default,
      params: Bm25Params = Bm25Params(),
      numShards: Int = 32,
      blockSize: Int = Codec.BlockSize,
      docIdPartitions: Int = 32
  )

  /** In-memory handle on the relational form of the index (pass-1 output).
    * All members are lazy Spark plans except the collected scalars.
    */
  final case class Relations(
      docs: Dataset[Doc],
      postings: Dataset[PostingDl],
      docStats: DataFrame, // (docId, dl)
      termStats: Dataset[TermStat],
      corpus: CorpusStats
  )

  /** P6 filter: the indexed document set = turns with non-null, non-blank
    * text (reference parity: /root/reference/data_processing/
    * Lexical_indexing/LexicalIndexer.scala:30).
    */
  def indexableTurns(turns: Dataset[Turn]): Dataset[Turn] =
    turns.filter(t => t.text != null && t.text.trim.nonEmpty)

  def relations(spark: SparkSession, turns: Dataset[Turn], cfg: Config = Config()): Relations = {
    import spark.implicits._
    val docs = DocIds
      .assign(spark, indexableTurns(turns), cfg.docIdPartitions)
      .persist(StorageLevel.MEMORY_AND_DISK)

    val toks = docs
      .select($"docId", Analyzer.tokensCol($"text", cfg.analyzer).as("toks"))
      .select($"docId", size($"toks").as("dl"), explode($"toks").as("term"))

    val postings = toks
      .groupBy($"term", $"docId", $"dl")
      .agg(count(lit(1)).cast("int").as("tf"))
      .select($"term", $"docId", $"tf", $"dl")
      .as[PostingDl]
      .persist(StorageLevel.MEMORY_AND_DISK)

    // dl for every doc, including token-less ones (dl = 0).
    val docStats = docs
      .select($"docId", size(Analyzer.tokensCol($"text", cfg.analyzer)).as("dl"))

    val n = docs.count()
    val avgdl = docStats.agg(avg($"dl")).as[Double].first()
    val corpus = CorpusStats(n, avgdl)

    val termStats = postings
      .groupBy($"term")
      .agg(count(lit(1)).as("df"))
      .withColumn("idf", log((lit(n) + 1.0) / ($"df" + 1.0)))
      .as[TermStat]

    Relations(docs, postings, docStats, termStats, corpus)
  }

  /** Pass 2: encoded posting blocks, doc-range sharded.
    * shardId = docId / shardSize; one range partition per shard.
    */
  def encodeBlocks(
      spark: SparkSession,
      rel: Relations,
      cfg: Config = Config()
  ): Dataset[PostingBlock] = {
    import spark.implicits._
    val shardSize = math.max(1L, (rel.corpus.docCount + cfg.numShards - 1) / cfg.numShards)
    val k1 = cfg.params.k1
    val b = cfg.params.b
    val avgdl = rel.corpus.avgdl
    val blockSize = cfg.blockSize

    // hash-repartition on the (shardId, term) GROUP key — never on docId —
    // so a group can never straddle a partition boundary: block boundaries
    // are then a deterministic function of the group's sorted postings
    // (required for resumable / checksum-stable builds). Group size is
    // already bounded by the doc-range sharding (a head term's postings are
    // split across all shards), so hash partitioning cannot hotspot.
    rel.postings
      .withColumn("shardId", (col("docId") / shardSize).cast("int"))
      .repartition(cfg.numShards, $"shardId", $"term")
      .sortWithinPartitions($"shardId", $"term", $"docId")
      .select($"shardId", $"term", $"docId", $"tf", $"dl")
      .as[(Int, String, Long, Int, Int)]
      .mapPartitions { it =>
        new BlockEncodeIterator(it.buffered, blockSize, k1, b, avgdl)
      }
  }

  /** BM25 per-term partial (without idf): tf·(k1+1)/(tf + k1·(1−b+b·dl/avgdl)).
    * Formula /root/reference/data_processing/Lexical_indexing/bm25_kernel.cu:62-64.
    */
  def partial(tf: Int, dl: Int, k1: Double, b: Double, avgdl: Double): Double =
    tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl / avgdl))

  /** Streaming encoder: groups a (shardId, term, docId)-sorted iterator into
    * blocks of <= blockSize postings without materializing a term's full
    * posting list (a head term at 10^12 docs does not fit in one task's
    * heap; a 128-entry block always does).
    */
  private final class BlockEncodeIterator(
      it: BufferedIterator[(Int, String, Long, Int, Int)],
      blockSize: Int,
      k1: Double,
      b: Double,
      avgdl: Double
  ) extends Iterator[PostingBlock] {

    private var curShard = -1
    private var curTerm: String = null
    private var blockIdx = 0

    override def hasNext: Boolean = it.hasNext

    override def next(): PostingBlock = {
      val (shard, term, _, _, _) = it.head
      if (shard != curShard || term != curTerm) {
        curShard = shard; curTerm = term; blockIdx = 0
      }
      val buf = new scala.collection.mutable.ArrayBuffer[Codec.P](blockSize)
      var maxPartial = 0.0
      while (it.hasNext && buf.size < blockSize && {
          val h = it.head; h._1 == shard && h._2 == term
        }) {
        val (_, _, docId, tf, dl) = it.next()
        buf += Codec.P(docId, tf, dl)
        val p = partial(tf, dl, k1, b, avgdl)
        if (p > maxPartial) maxPartial = p
      }
      val block = PostingBlock(
        shardId = shard,
        term = term,
        blockIdx = blockIdx,
        minDocId = buf.head.docId,
        maxDocId = buf.last.docId,
        n = buf.size,
        maxPartial = maxPartial,
        payload = Codec.encode(buf.toSeq)
      )
      blockIdx += 1
      block
    }
  }
}
