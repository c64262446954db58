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
  *   docstats/              (docId, dl)
  *   termstats/             (term, df, idf)
  *   blocks/shard-NNNNN/    encoded PostingBlock rows, one dir per shard
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
      s"""{"snapshotId":"${esc(m.snapshotId)}","analyzer":"${esc(m.analyzer)}",
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
    def str(k: String) = s"""\"$k\":\"((?:[^\"\\\\]|\\\\.)*)\"""".r
      .findFirstMatchIn(s).map(_.group(1)).getOrElse("")
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
    * snapshot. `failAfterShards` injects a crash after N shard commits —
    * used by the resume test only.
    */
  def build(
      spark: SparkSession,
      turns: Dataset[Turn],
      dir: String,
      snapshotId: String,
      cfg: IndexBuilder.Config = IndexBuilder.Config(),
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

    val rel = IndexBuilder.relations(spark, turns, cfg)
    val shardSize = math.max(1L, (rel.corpus.docCount + cfg.numShards - 1) / cfg.numShards)

    if (committed.isEmpty) {
      rel.docs.write.mode("overwrite").parquet(s"$dir/docs")
      rel.docStats.write.mode("overwrite").parquet(s"$dir/docstats")
      rel.termStats.write.mode("overwrite").parquet(s"$dir/termstats")
    }

    val blocks = IndexBuilder.encodeBlocks(spark, rel, cfg)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // per-shard lineage from one aggregate over the encoded blocks
    val lineage: Map[Int, ShardLineage] = blocks
      .groupBy($"shardId")
      .agg(
        sum($"n").as("postings"),
        count(lit(1)).as("blocks"),
        sum(length($"payload")).as("payloadBytes"),
        // mask to 32 bits so the sum cannot overflow a long even at
        // trillions of blocks (Spark 4 ANSI mode makes overflow fatal)
        sum(xxhash64($"term", $"payload").bitwiseAND(lit(0xffffffffL))).as("checksum"))
      .collect()
      .map(r => r.getInt(0) -> ShardLineage(r.getInt(0), r.getLong(1),
        r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap

    val allShards = lineage.keys.toSeq.sorted
    var done: Seq[ShardLineage] =
      existing.map(_.shards.filter(s => lineage.contains(s.shardId))).getOrElse(Nil)
    var commitsThisRun = 0

    def partialManifest(complete: Boolean, metrics: Map[String, Double]) = Manifest(
      snapshotId, cfg.analyzer.fingerprint, cfg.params.k1, cfg.params.b,
      cfg.numShards, shardSize, cfg.blockSize, rel.corpus.docCount,
      rel.corpus.avgdl, done.sortBy(_.shardId), metrics, complete)

    allShards.filterNot(committed.contains).foreach { shard =>
      failAfterShards.foreach { limit =>
        if (commitsThisRun >= limit)
          throw new RuntimeException(s"injected failure after $limit shard commits")
      }
      blocks.filter($"shardId" === shard)
        .sortWithinPartitions($"term", $"minDocId")
        .write.mode("overwrite").parquet(f"$dir/blocks/shard-$shard%05d")
      done :+= lineage(shard)
      commitsThisRun += 1
      writeManifest(dir, partialManifest(complete = false, Map.empty))
    }

    val buildSec = (System.nanoTime() - t0) / 1e9
    val totalPostings = lineage.values.map(_.postings).sum.toDouble
    val perShard = lineage.values.map(_.postings.toDouble)
    val skewRatio =
      if (perShard.isEmpty) 1.0 else perShard.max / (perShard.sum / perShard.size)
    val metrics = Map(
      "buildSec" -> buildSec,
      "turns" -> rel.corpus.docCount.toDouble,
      "turnsPerSec" -> rel.corpus.docCount / buildSec,
      "postings" -> totalPostings,
      "postingsPerSec" -> totalPostings / buildSec,
      "bytesRaw" -> totalPostings * 16, // uncompressed (docId 8B + tf 4B + dl 4B)
      "bytesCompressed" -> lineage.values.map(_.payloadBytes).sum.toDouble,
      "skewRatio" -> skewRatio
    )
    val m = partialManifest(complete = true, metrics)
    writeManifest(dir, m)
    blocks.unpersist()
    rel.postings.unpersist()
    rel.docs.unpersist()
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
    val blocks = spark.read
      .option("recursiveFileLookup", "true")
      .parquet(s"$dir/blocks")
      .as[PostingBlock]
    Index(dir, m,
      blocks,
      spark.read.parquet(s"$dir/docs").as[Doc],
      spark.read.parquet(s"$dir/termstats").as[TermStat])
  }
}
