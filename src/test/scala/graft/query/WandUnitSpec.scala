package graft.query

import org.scalatest.funsuite.AnyFunSuite

import graft.index.Codec
import graft.index.Codec.P
import graft.model.PostingBlock
import graft.query.QueryEngine.{QTerm, WandScorer}

/** Direct unit tests of the block-max WAND scorer against a scalar
  * exhaustive oracle over the SAME encoded blocks — no Spark involved, so
  * adversarial block layouts (weak current block, docId ties at the pivot,
  * multi-block lists) can be constructed exactly.
  */
class WandUnitSpec extends AnyFunSuite {

  private val k1 = 1.2
  private val b = 0.75

  private def blk(shard: Int, term: String, idx: Int, ps: Seq[P]): PostingBlock =
    PostingBlock(shard, term, idx, ps.head.docId, ps.last.docId, ps.size,
      ps.map(_.tf).max, ps.map(_.dl).min, ps.map(_.tf.toLong).sum,
      Codec.encode(ps), Array.emptyByteArray)

  /** Scalar exhaustive top-k over decoded blocks (same formula, same
    * tie-break).
    */
  private def exhaustive(blocks: Seq[PostingBlock], qts: Seq[QTerm], k: Int,
      avgdl: Double): Seq[(Long, Double)] = {
    val scores = scala.collection.mutable.Map.empty[Long, Double].withDefaultValue(0.0)
    qts.sortBy(_.term).foreach { qt =>
      blocks.filter(_.term == qt.term).sortBy(b => (b.shardId, b.minDocId)).foreach { blkk =>
        Codec.decode(blkk.payload, blkk.n).foreach { p =>
          scores(p.docId) += qt.weight *
            (p.tf * (k1 + 1.0) / (p.tf + k1 * (1.0 - b + b * p.dl / avgdl)))
        }
      }
    }
    scores.toSeq.sortBy { case (d, s) => (-s, d) }.take(k)
  }

  private def wand(blocks: Seq[PostingBlock], qts: Seq[QTerm], k: Int,
      avgdl: Double): Seq[(Long, Double)] = {
    val sorted = blocks.sortBy(b => (b.shardId, b.term, b.minDocId))
    WandScorer.scorePartition(sorted.iterator.buffered, qts, k, k1, b, avgdl)
      .toSeq.sortBy { case (d, s) => (-s, d) }.take(k)
  }

  test("skip bound covers ALL cursors tied at the pivot (adversarial layout)") {
    // Term a: weak first block (maxTf=1) containing doc 5, strong later
    // block (doc 9, tf=100) that inflates a's GLOBAL upper bound past theta.
    // Term b: doc 5 sits in a strong block (tf=50). After doc 1 sets
    // theta, both cursors tie at doc 5; a prefix-only pivot stops at a
    // (globalUb_a > theta), and a's current-block bound alone is <= theta —
    // an unsound skip would drop doc 5, the true top-1.
    val blocks = Seq(
      blk(0, "a", 0, Seq(P(1, 1, 10), P(5, 1, 10))),
      blk(0, "a", 1, Seq(P(9, 100, 10))),
      blk(0, "b", 0, Seq(P(1, 1, 10))),
      blk(0, "b", 1, Seq(P(5, 50, 10))))
    val qts = Seq(QTerm("a", 1.0), QTerm("b", 1.0))
    val want = exhaustive(blocks, qts, 1, avgdl = 10.0)
    val got = wand(blocks, qts, 1, avgdl = 10.0)
    assert(want.head._1 == 5L, "fixture must make doc 5 the true top-1")
    assert(got == want, s"WAND dropped the tied pivot: got $got want $want")
  }

  test("randomized block layouts: WAND == exhaustive for 300 corpora") {
    val rnd = new scala.util.Random(20260816L)
    (1 to 300).foreach { iter =>
      val nTerms = 2 + rnd.nextInt(3)
      val terms = (0 until nTerms).map(i => s"t$i")
      val nDocs = 3 + rnd.nextInt(20)
      val blockSize = 2 + rnd.nextInt(2)
      val avgdl = 8.0 + rnd.nextInt(5)
      val blocks = terms.flatMap { t =>
        val docIds = (1 to nDocs).filter(_ => rnd.nextDouble() < 0.6).map(_.toLong)
        docIds.grouped(blockSize).zipWithIndex.map { case (ids, bi) =>
          blk(0, t, bi, ids.map(id => P(id, 1 + rnd.nextInt(60), 5 + rnd.nextInt(10))))
        }
      }.filter(_.n > 0)
      if (blocks.nonEmpty) {
        val qts = terms.map(t => QTerm(t, 0.5 + rnd.nextDouble() * 2.0))
        (1 to 3).foreach { k =>
          val want = exhaustive(blocks, qts, k, avgdl)
          val got = wand(blocks, qts, k, avgdl)
          assert(got == want, s"iter=$iter k=$k: got $got want $want")
        }
      }
    }
  }
}
