package graft.index

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Analyzer
import graft.model._

/** On-disk index layout + snapshot/lineage manifest (SURVEY.md §7.2, §7.6).
  *
  * ```
  * <indexDir>/
  *   manifest.json          committed atomically (tmp + rename); absence of
  *                          "complete": true  =>  build in progress / crashed
  *   docs/                  (docId, conv_id, turn_idx, role, text, tool, ts)
  *   termstats/             (term, df, idf)
  *                          (per-doc lengths live inside the block payloads;
  *                          Relations.docStats derives them on demand)
  *   blocks/shardId=K/      encoded PostingBlock rows (dynamic partitions)
  * ```
  *
  * Resumability (north rule "resumable from snapshot checkpoints with
  * per-partition lineage"): shards are committed one at a time — write the
  * shard's block files, then rewrite the manifest listing it as committed.
  * A crashed build leaves a manifest whose `shards` list is a prefix of the
  * plan; `build` on the same (deterministic) snapshot skips committed
  * shards and encodes only the rest. Blocks are deterministic functions of
  * the sorted postings, so a resumed index is logically byte-identical to
  * an uninterrupted one (checksummed over payload bytes).
  *
  * The reference's nearest analogue was `coalesce(1).write.text` of a JSON
  * stats blob (/root/reference/data_processing/Lexical_indexing/
  * bm25_precompute.py:68-75) with no commit protocol at all.
  */
object IndexStore {

  /** Bumped whenever the on-disk block/manifest schema changes; loaders
    * refuse (and callers rebuild) older layouts. */
  val FormatVersion = 3

  final case class ShardLineage(
      shardId: Int,
      postings: Long,
      blocks: Long,
      payloadBytes: Long,
      checksum: Long
  )

  final case class Manifest(
      snapshotId: String,
      analyzer: String,
      k1: Double,
      b: Double,
      numShards: Int,
      shardSize: Long,
      blockSize: Int,
      docCount: Long,
      avgdl: Double,
      shards: Seq[ShardLineage],
      metrics: Map[String, Double],
      complete: Boolean
  )

  // ------------------------------------------------------------- manifest IO
  // Hand-rolled (flat, fixed-shape) JSON so the manifest has no dependency
  // on whichever Jackson happens to ship with the Spark distribution.

  private def esc(s: String): String =
    s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }

  def writeManifest(dir: String, m: Manifest): Unit = {
    val shards = m.shards
      .map(s => s"""{"shardId":${s.shardId},"postings":${s.postings},"blocks":${s.blocks},"payloadBytes":${s.payloadBytes},"checksum":${s.checksum}}""")
      .mkString("[", ",", "]")
    val metrics = m.metrics.toSeq.sortBy(_._1)
      .map { case (k, v) => s""""${esc(k)}":$v""" }.mkString("{", ",", "}")
    val json =
      s"""{"formatVersion":$FormatVersion,"snapshotId":"${esc(m.snapshotId)}","analyzer":"${esc(m.analyzer)}",
         |"k1":${m.k1},"b":${m.b},"numShards":${m.numShards},"shardSize":${m.shardSize},
         |"blockSize":${m.blockSize},"docCount":${m.docCount},"avgdl":${m.avgdl},
         |"shards":$shards,"metrics":$metrics,"complete":${m.complete}}""".stripMargin
    val tmp = Paths.get(dir, "manifest.json.tmp")
    Files.createDirectories(tmp.getParent)
    Files.writeString(tmp, json)
    Files.move(tmp, Paths.get(dir, "manifest.json"),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  def readManifest(dir: String): Option[Manifest] = {
    val p = Paths.get(dir, "manifest.json")
    if (!Files.exists(p)) return None
    val s = Files.readString(p)
    if (!s.contains(s""""formatVersion":$FormatVersion""")) return None
    def unesc(v: String): String = {
      val sb = new StringBuilder
      var i = 0
      while (i < v.length) {
        val c = v(i)
        if (c == '\\' && i + 1 < v.length) {
          v(i + 1) match {
            case 'u' => sb.append(Integer.parseInt(v.substring(i + 2, i + 6), 16).toChar); i += 6
            case 'n' => sb.append('\n'); i += 2
            case 'r' => sb.append('\r'); i += 2
            case 't' => sb.append('\t'); i += 2
            case o => sb.append(o); i += 2
          }
        } else { sb.append(c); i += 1 }
      }
      sb.toString
    }
    def str(k: String) = s"""\"$k\":\"((?:[^\"\\\\]|\\\\.)*)\"""".r
      .findFirstMatchIn(s).map(m => unesc(m.group(1))).getOrElse("")
    def num(k: String) = s"""\"$k\":(-?[0-9.E+-]+)""".r
      .findFirstMatchIn(s).map(_.group(1)).getOrElse("0")
    val shardRe =
      """\{"shardId":(\d+),"postings":(\d+),"blocks":(\d+),"payloadBytes":(\d+),"checksum":(-?\d+)\}""".r
    val shards = shardRe.findAllMatchIn(s).map { m =>
      ShardLineage(m.group(1).toInt, m.group(2).toLong, m.group(3).toLong,
        m.group(4).toLong, m.group(5).toLong)
    }.toSeq
    val metricsRe = """"metrics":\{([^}]*)\}""".r
    val metrics = metricsRe.findFirstMatchIn(s).map(_.group(1)).getOrElse("")
    val metricMap = """"([^"]+)":(-?[0-9.E+-]+)""".r.findAllMatchIn(metrics)
      .map(m => m.group(1) -> m.group(2).toDouble).toMap
    Some(Manifest(
      snapshotId = str("snapshotId"),
      analyzer = str("analyzer"),
      k1 = num("k1").toDouble,
      b = num("b").toDouble,
      numShards = num("numShards").toDouble.toInt,
      shardSize = num("shardSize").toDouble.toLong,
      blockSize = num("blockSize").toDouble.toInt,
      docCount = num("docCount").toDouble.toLong,
      avgdl = num("avgdl").toDouble,
      shards = shards,
      metrics = metricMap,
      complete = s.contains(""""complete":true""")
    ))
  }

  // ------------------------------------------------------------------ build

  final case class BuildResult(manifest: Manifest, dir: String)

  /** Full (or resumed) build of the on-disk index from a transcripts
    * snapshot.
    *
    * Shards are committed in batches of `commitBatchShards` (one dynamic-
    * partition write job per batch; the manifest is atomically rewritten
    * after each) — the knob trades checkpoint granularity against job
    * overhead. `failAfterShards` injects a crash after N shard commits —
    * used by the resume test only.
    */
  def build(
      spark: SparkSession,
      turns: Dataset[Turn],
      dir: String,
      snapshotId: String,
      cfg: IndexBuilder.Config = IndexBuilder.Config(),
      commitBatchShards: Int = 256,
      failAfterShards: Option[Int] = None
  ): BuildResult = {
    import spark.implicits._
    val t0 = System.nanoTime()
    val existing = readManifest(dir)
    existing.filter(_.complete).foreach { m =>
      if (m.snapshotId == snapshotId) return BuildResult(m, dir)
    }
    val committed: Set[Int] = existing match {
      case Some(m) if m.snapshotId == snapshotId && !m.complete =>
        m.shards.map(_.shardId).toSet
      case _ => Set.empty
    }

    def now() = System.nanoTime()
    val tRel0 = now()
    // pass 1: docIds + docs checkpoint. The postings relation stays LAZY —
    // it streams through the encode shuffle exactly once, uncached: caching
    // the 25N-row postings saturates memory bandwidth long before the CPUs
    // (measured: the 32-thread build was capped at the 8-thread build's
    // bandwidth ceiling). Corpus/term stats are derived from the encoded
    // blocks, which are ~100x smaller.
    val p0 = IndexBuilder.prepare(spark, turns, s"$dir/docs", cfg)
    val n = p0.n
    val shardSize = p0.shardSize
    val relSec = (now() - tRel0) / 1e9

    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    import scala.concurrent.ExecutionContext.Implicits.global

    // fresh build (no committed shards): clear any stale block layout from
    // an older format version or an abandoned different-snapshot build
    if (committed.isEmpty)
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(s"$dir/blocks"))

    val tEnc0 = now()
    val blocks = IndexBuilder.encodePostings(spark, p0.postings, cfg)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // per-shard lineage + corpus token total from ONE aggregate over the
    // encoded blocks (this job also materializes the blocks cache)
    val lineageRows = blocks
      .groupBy($"shardId")
      .agg(
        sum($"n").as("postings"),
        count(lit(1)).as("blocks"),
        sum(length($"payload")).as("payloadBytes"),
        // mask to 32 bits so the sum cannot overflow a long even at
        // trillions of blocks (Spark 4 ANSI mode makes overflow fatal)
        sum(xxhash64($"term", $"payload").bitwiseAND(lit(0xffffffffL))).as("checksum"),
        sum($"sumTf").as("sumTf"))
      .collect()
    val lineage: Map[Int, ShardLineage] = lineageRows
      .map(r => r.getInt(0) -> ShardLineage(r.getInt(0), r.getLong(1),
        r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    val totalTokens = lineageRows.map(_.getLong(5)).sum
    val avgdl = if (n == 0) 0.0 else totalTokens.toDouble / n
    val corpus = CorpusStats(n, avgdl)
    val encodeSec = (now() - tEnc0) / 1e9

    // term stats from the blocks cache (df = Σ block n per term), written
    // CONCURRENTLY with the shard commits below — independent jobs over the
    // same cache
    val tAux0 = now()
    val auxF: Future[Unit] =
      if (committed.isEmpty) Future {
        blocks.groupBy($"term")
          .agg(sum($"n").as("df"))
          .withColumn("idf", log((lit(n) + 1.0) / ($"df" + 1.0)))
          .write.mode("overwrite").parquet(s"$dir/termstats")
      }
      else Future.successful(())

    val tCommit0 = now()
    val allShards = lineage.keys.toSeq.sorted
    var done: Seq[ShardLineage] =
      existing.map(_.shards.filter(s => lineage.contains(s.shardId))).getOrElse(Nil)
    var commitsThisRun = 0

    def partialManifest(complete: Boolean, metrics: Map[String, Double]) = Manifest(
      snapshotId, cfg.analyzer.fingerprint, cfg.params.k1, cfg.params.b,
      cfg.numShards, shardSize, cfg.blockSize, corpus.docCount,
      corpus.avgdl, done.sortBy(_.shardId), metrics, complete)

    val pending = allShards.filterNot(committed.contains)
    pending.grouped(math.max(1, commitBatchShards)).foreach { batch =>
      failAfterShards.foreach { limit =>
        if (commitsThisRun >= limit)
          throw new RuntimeException(s"injected failure after $limit shard commits")
      }
      // clear any partially-committed leftovers of an earlier crashed job
      batch.foreach { s =>
        org.apache.commons.io.FileUtils.deleteQuietly(
          new java.io.File(s"$dir/blocks/shardId=$s"))
      }
      // cluster by shardId first: without this every task writes a file
      // into every shard dir (tasks x shards tiny files — measured as the
      // dominant commit cost and a per-query scan tax afterwards)
      val writeParts = math.max(1, math.min(
        spark.sparkContext.defaultParallelism, batch.size))
      blocks.filter($"shardId".isin(batch: _*))
        .repartition(writeParts, $"shardId")
        .sortWithinPartitions($"shardId", $"term", $"minDocId")
        .write.mode("append").partitionBy("shardId").parquet(s"$dir/blocks")
      done ++= batch.map(lineage)
      commitsThisRun += batch.size
      writeManifest(dir, partialManifest(complete = false, Map.empty))
    }

    Await.result(auxF, Duration.Inf)
    val auxSec = (now() - tAux0) / 1e9
    val buildSec = (System.nanoTime() - t0) / 1e9
    val totalPostings = lineage.values.map(_.postings).sum.toDouble
    val perShard = lineage.values.map(_.postings.toDouble)
    val skewRatio =
      if (perShard.isEmpty) 1.0 else perShard.max / (perShard.sum / perShard.size)
    val metrics = Map(
      "relSec" -> relSec,
      "auxWriteSec" -> auxSec,
      "encodeSec" -> encodeSec,
      "commitSec" -> (now() - tCommit0) / 1e9,
      "buildSec" -> buildSec,
      "turns" -> corpus.docCount.toDouble,
      "turnsPerSec" -> corpus.docCount / buildSec,
      "postings" -> totalPostings,
      "postingsPerSec" -> totalPostings / buildSec,
      "bytesRaw" -> totalPostings * 16, // uncompressed (docId 8B + tf 4B + dl 4B)
      "bytesCompressed" -> lineage.values.map(_.payloadBytes).sum.toDouble,
      "skewRatio" -> skewRatio
    )
    val m = partialManifest(complete = true, metrics)
    writeManifest(dir, m)
    blocks.unpersist()
    BuildResult(m, dir)
  }

  // ---------------------------------------------------------------- append

  /** Incremental snapshot append (SURVEY.md §7.6): new turns become delta
    * postings whose docIds continue the base id space (ids of existing
    * docs never move), encoded into the base's shard grid and unioned with
    * the base blocks — a boundary shard simply gains extra block files
    * whose docId ranges sort after the old ones. Corpus stats and term df
    * are additive; idf is recomputed for the merged N. Block upper-bound
    * metadata is (maxTf, minDl), valid under the shifted avgdl.
    *
    * Not crash-resumable mid-append in this version (the full build is);
    * an interrupted append requires a rebuild.
    */
  def appendSnapshot(
      spark: SparkSession,
      newTurns: Dataset[Turn],
      dir: String,
      snapshotId: String,
      cfg: IndexBuilder.Config = IndexBuilder.Config()
  ): BuildResult = {
    import spark.implicits._
    val base = readManifest(dir)
      .getOrElse(throw new IllegalStateException(s"no manifest at $dir"))
    require(base.complete, s"base index at $dir is incomplete")
    require(base.analyzer == cfg.analyzer.fingerprint,
      s"analyzer mismatch: index=${base.analyzer} cfg=${cfg.analyzer.fingerprint}")

    val deltaDocsDir = s"$dir/docs.delta"
    val rel = IndexBuilder.relations(spark, newTurns, deltaDocsDir, cfg,
      idOffset = base.docCount, fixedShardSize = Some(base.shardSize))

    val blocks = IndexBuilder.encodeBlocks(spark, rel, cfg)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val deltaLineage: Map[Int, ShardLineage] = blocks
      .groupBy($"shardId")
      .agg(sum($"n").as("postings"), count(lit(1)).as("blocks"),
        sum(length($"payload")).as("payloadBytes"),
        sum(xxhash64($"term", $"payload").bitwiseAND(lit(0xffffffffL))).as("checksum"))
      .collect()
      .map(r => r.getInt(0) -> ShardLineage(r.getInt(0), r.getLong(1),
        r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap

    blocks
      .repartition(math.max(1, spark.sparkContext.defaultParallelism), $"shardId")
      .sortWithinPartitions($"shardId", $"term", $"minDocId")
      .write.mode("append").partitionBy("shardId").parquet(s"$dir/blocks")
    rel.docs.write.mode("append").parquet(s"$dir/docs")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(deltaDocsDir))

    // merged corpus stats: token totals are exact integers, so the combined
    // avgdl is exact too
    val nNew = base.docCount + rel.corpus.docCount
    val totTokens = math.round(base.avgdl * base.docCount) +
      math.round(rel.corpus.avgdl * rel.corpus.docCount)
    val avgdlNew = if (nNew == 0) 0.0 else totTokens.toDouble / nNew

    // merged term stats: df is additive; idf recomputed for the merged N.
    // Written to a fresh dir + swap (Spark cannot overwrite its own input).
    val baseTs = spark.read.parquet(s"$dir/termstats").select($"term", $"df")
    val deltaTs = rel.postings.groupBy($"term").agg(count(lit(1)).as("df"))
    val merged = baseTs.unionByName(deltaTs)
      .groupBy($"term").agg(sum($"df").as("df"))
      .withColumn("idf", log((lit(nNew) + 1.0) / ($"df" + 1.0)))
    merged.write.mode("overwrite").parquet(s"$dir/termstats.new")
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(s"$dir/termstats"))
    Files.move(Paths.get(s"$dir/termstats.new"), Paths.get(s"$dir/termstats"))

    val mergedLineage = (base.shards.map(s => s.shardId -> s).toMap.keySet ++ deltaLineage.keySet)
      .toSeq.sorted.map { sid =>
        val b0 = base.shards.find(_.shardId == sid)
        val d = deltaLineage.get(sid)
        ShardLineage(sid,
          b0.map(_.postings).getOrElse(0L) + d.map(_.postings).getOrElse(0L),
          b0.map(_.blocks).getOrElse(0L) + d.map(_.blocks).getOrElse(0L),
          b0.map(_.payloadBytes).getOrElse(0L) + d.map(_.payloadBytes).getOrElse(0L),
          b0.map(_.checksum).getOrElse(0L) + d.map(_.checksum).getOrElse(0L))
      }
    val perShard = mergedLineage.map(_.postings.toDouble)
    val m = Manifest(snapshotId, cfg.analyzer.fingerprint, cfg.params.k1,
      cfg.params.b, base.numShards, base.shardSize, cfg.blockSize,
      nNew, avgdlNew, mergedLineage,
      base.metrics ++ Map(
        "appendedTurns" -> rel.corpus.docCount.toDouble,
        "skewRatio" -> (if (perShard.isEmpty) 1.0
          else perShard.max / (perShard.sum / perShard.size))),
      complete = true)
    writeManifest(dir, m)
    blocks.unpersist()
    rel.unpersistAll()
    BuildResult(m, dir)
  }

  // ------------------------------------------------------------------- load

  final case class Index(
      dir: String,
      manifest: Manifest,
      blocks: Dataset[PostingBlock],
      docs: Dataset[Doc],
      termStats: Dataset[TermStat]
  ) {
    def corpus: CorpusStats = CorpusStats(manifest.docCount, manifest.avgdl)
  }

  def load(spark: SparkSession, dir: String): Index = {
    import spark.implicits._
    val m = readManifest(dir)
      .getOrElse(throw new IllegalStateException(s"no manifest at $dir"))
    require(m.complete, s"index at $dir is incomplete (crashed build?) — resume it first")
    // shardId=K dynamic-partition layout: discovery restores shardId as an
    // int column and prunes shard dirs on shardId predicates for free
    val blocks = spark.read.parquet(s"$dir/blocks")
      .select($"shardId".cast("int").as("shardId"), $"term", $"blockIdx",
        $"minDocId", $"maxDocId", $"n", $"maxTf", $"minDl", $"sumTf", $"payload")
      .as[PostingBlock]
    Index(dir, m,
      blocks,
      spark.read.parquet(s"$dir/docs").as[Doc],
      spark.read.parquet(s"$dir/termstats").as[TermStat])
  }
}
