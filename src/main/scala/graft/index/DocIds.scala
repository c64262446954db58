package graft.index

import org.apache.spark.TaskContext
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.storage.StorageLevel

import graft.model.{Doc, Turn}

/** Deterministic dense docID assignment.
  *
  * docID = global rank under the stable total order (conv_id, turn_idx).
  * The reference keyed documents by a pre-existing stable id and, where it
  * minted its own (FAISS insertion position), had to re-link by joining on
  * title (/root/reference/data_processing/semantic_index/
  * create_lookup_table.py:28-34) — the failure mode this module prevents.
  *
  * Scalable two-pass scheme (no global window, no zipWithIndex on a raw
  * RDD):
  *   1. range-shuffle + in-partition sort on (conv_id, turn_idx) and
  *      persist — the persisted layout is what BOTH passes observe, so
  *      range-boundary sampling cannot diverge between them;
  *   2. count rows per partition (tiny job), exclusive prefix-sum on the
  *      driver, broadcast offsets;
  *   3. mapPartitions (typed) assigns offset + local position.
  *
  * The result is invariant to the partition count: range boundaries move,
  * but the global sorted order — hence the rank — does not, as long as
  * (conv_id, turn_idx) is unique (enforced upstream; asserted in tests
  * across 1/8/32 partitions).
  */
object DocIds {

  /** docs plus the total count (already computed by the offsets pass) and
    * the internal sorted cache, which the caller must unpersist once it has
    * materialized its own derivative of `docs`.
    */
  final case class Assigned(docs: Dataset[Doc], count: Long, cache: Dataset[Turn])

  def assign(spark: SparkSession, turns: Dataset[Turn], partitions: Int): Dataset[Doc] =
    assignWithCount(spark, turns, partitions).docs

  /** `idOffset` shifts every assigned id — used by incremental snapshot
    * appends, whose delta docs continue after the base corpus's ids.
    */
  def assignWithCount(spark: SparkSession, turns: Dataset[Turn], partitions: Int,
      idOffset: Long = 0L): Assigned = {
    import spark.implicits._
    val sorted = turns
      .repartitionByRange(partitions, $"conv_id", $"turn_idx")
      .sortWithinPartitions($"conv_id", $"turn_idx")
      .persist(StorageLevel.MEMORY_AND_DISK)

    val counts: Array[(Int, Long)] = sorted
      .mapPartitions { it =>
        var n = 0L
        while (it.hasNext) { it.next(); n += 1 }
        Iterator.single((TaskContext.getPartitionId(), n))
      }
      .collect()

    val offsets: Map[Int, Long] = {
      val byPid = counts.sortBy(_._1)
      var acc = idOffset
      byPid.map { case (pid, n) => val o = (pid, acc); acc += n; o }.toMap
    }
    val bc = spark.sparkContext.broadcast(offsets)

    val docs = sorted.mapPartitions { it =>
      val pid = TaskContext.getPartitionId()
      var next = bc.value.getOrElse(pid, 0L)
      it.map { t =>
        val d = Doc(next, t.conv_id, t.turn_idx, t.role, t.text, t.tool, t.ts)
        next += 1
        d
      }
    }
    Assigned(docs, counts.map(_._2).sum, sorted)
  }
}
