package graft.operators

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.TestKit.spark
import graft.functions.Analyzer

/** Semantic checks the driver's equality oracle can't express: LSH recall
  * against exact-Jaccard ground truth, SimHash signatures against an
  * independent scalar reimplementation, ANN recall against brute-force
  * cosine, and the quadratic-blowup guards under pathological corpora.
  */
class TrainingDataSpec extends AnyFunSuite {

  import spark.implicits._

  /** Synthetic near-dup corpus: nBase clusters of `copies` mutated copies
    * (~8% token mutation), so true near-dup pairs are known to exist.
    */
  private def nearDupDocs(seed: Long, nBase: Int, copies: Int): DataFrame = {
    val rnd = new scala.util.Random(seed)
    val vocab = (0 until 200).map(i => f"w$i%03d")
    val rows = (0 until nBase).flatMap { b =>
      val base = (0 until 30).map(_ => vocab(rnd.nextInt(vocab.size)))
      (0 until copies).map { c =>
        val txt =
          if (c == 0) base
          else base.map(w =>
            if (rnd.nextDouble() < 0.08) vocab(rnd.nextInt(vocab.size)) else w)
        ((b * copies + c).toLong, txt.mkString(" "))
      }
    }
    rows.toDF("doc_id", "text")
  }

  private def pairSet(df: DataFrame): Set[(Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("minhash-LSH: precision exact (subset of true pairs), recall >= 0.8") {
    val docs = nearDupDocs(1L, 40, 3)
    val exact = pairSet(TrainingData.ngramJaccardPairs(docs))
    val lsh = pairSet(TrainingData.minhashLshPairs(docs))
    assert(exact.size >= 10, s"fixture too sparse: ${exact.size} true pairs")
    assert(lsh.subsetOf(exact), "post-verification must make precision exact")
    val recall = lsh.size.toDouble / exact.size
    info(f"minhash-LSH recall = $recall%.3f over ${exact.size} true pairs")
    // 8 bands x 2 rows: P(candidate | j=0.6) = 1-(1-0.6^2)^8 ~ 0.97
    assert(recall >= 0.8, f"recall $recall%.3f below 0.8")
  }

  // independent scalar SimHash (same spec: md5 hex-digit parity, tf votes)
  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString

  private def scalarSimhashChunks(text: String): Seq[Int] = {
    val tf = Analyzer.tokenize(text, Analyzer.noStopwords)
      .groupBy(identity).view.mapValues(_.size).toMap
    val votes = Array.fill(64)(0L)
    tf.foreach { case (t, w) =>
      val hx = md5hex("0|" + t) + md5hex("1|" + t)
      var i = 0
      while (i < 64) {
        if ("13579bdf".indexOf(hx.charAt(i)) >= 0) votes(i) += w else votes(i) -= w
        i += 1
      }
    }
    (0 until 4).map(c =>
      (0 until 16).map(j => if (votes(16 * c + j) > 0) 1 << j else 0).sum)
  }

  test("simhash signatures match a scalar reimplementation") {
    val docs = nearDupDocs(7L, 10, 2)
    val got = TrainingData.simhashSignatures(docs).collect()
      .map(r => r.getLong(0) -> Seq(r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4)))
      .toMap
    val texts = docs.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got.keySet == texts.keySet)
    texts.foreach { case (id, text) =>
      assert(got(id) == scalarSimhashChunks(text), s"signature mismatch doc $id")
    }
  }

  test("simhash pairs = ALL pairs at Hamming <= 3 (pigeonhole completeness)") {
    val docs = nearDupDocs(11L, 25, 3)
    val sigs = docs.collect().map(r => r.getLong(0) -> scalarSimhashChunks(r.getString(1)))
    val want = (for {
      (ia, sa) <- sigs; (ib, sb) <- sigs if ia < ib
      ham = (0 until 4).map(c => java.lang.Integer.bitCount(sa(c) ^ sb(c))).sum
      if ham <= 3
    } yield (ia, ib)).toSet
    val got = pairSet(TrainingData.simhashPairs(docs))
    assert(got == want, s"got ${got.size} want ${want.size}")
  }

  test("bucket cap bounds pathological duplicate clusters to hub pairs") {
    val docs = (0L until 300L)
      .map(i => (i, "identical boilerplate text shared by every document"))
      .toDF("doc_id", "text")
    val pairs = TrainingData.simhashPairs(docs, cap = 10).collect()
    // 300 identical docs -> every chunk bucket overflows -> hub pairs only:
    // doc 0 linked to each of the other 299 (linear, not 300*299/2)
    assert(pairs.length == 299)
    assert(pairs.forall(_.getLong(0) == 0L))
    assert(pairs.forall(_.getInt(2) == 0))
    val mh = TrainingData.minhashLshPairs(docs, cap = 10).collect()
    assert(mh.length == 299 && mh.forall(_.getLong(0) == 0L))
  }

  test("shingle df cap drops stop-shingles but keeps true near-dups") {
    // every doc opens with the same boilerplate trigram; only docs 0 and 1
    // are true duplicates of each other
    val rows = (0L until 100L).map { i =>
      val uniq = if (i <= 1) "dup dup dup dup dup" // docs 0,1 identical
        else s"u${i}a u${i}b u${i}c u${i}d u${i}e"
      (i, s"aaa bbb ccc $uniq")
    }
    val docs = rows.toDF("doc_id", "text")
    val pairs = pairSet(TrainingData.ngramJaccardPairs(docs, maxDf = 10))
    assert(pairs == Set((0L, 1L)), s"got $pairs")
    val lsh = pairSet(TrainingData.minhashLshPairs(docs, maxDf = 10))
    assert(lsh == Set((0L, 1L)), s"got $lsh")
  }

  // scala-side union-find ground truth for cluster resolution
  private def ufClusters(pairs: Set[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    pairs.flatMap(p => Seq(p._1, p._2)).map(x => x -> find(x)).toMap
  }

  private def clusterMap(df: DataFrame): Map[Long, Long] =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("clusterPairs: chained duplicates collapse to one cluster (path graph)") {
    // A~B~C~...~Z transitive chain — the worst diameter case for naive
    // label propagation; large-star/small-star must converge in log rounds
    val n = 200L
    val chain = (0L until n - 1).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val got = TrainingData.clusterPairs(chain)
    assert(clusterMap(got) == (0L until n).map(_ -> 0L).toMap)
    val kept = got.filter(org.apache.spark.sql.functions.col("keep") === 1)
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(0L), s"only the component min survives, got $kept")
  }

  test("clusterPairs matches union-find on a random pair graph") {
    val rnd = new scala.util.Random(42L)
    val pairs = (0 until 300).map { _ =>
      val a = rnd.nextInt(150).toLong
      val b = rnd.nextInt(150).toLong
      (math.min(a, b), math.max(a, b))
    }.filter(p => p._1 != p._2).toSet
    val df = pairs.toSeq.toDF("id_a", "id_b")
    assert(clusterMap(TrainingData.clusterPairs(df)) == ufClusters(pairs))
  }

  test("keepSet drops exactly the non-canonical cluster members") {
    val docs = (0L until 10L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val pairs = Seq((1L, 3L), (3L, 5L), (7L, 8L)).toDF("id_a", "id_b")
    val clusters = TrainingData.clusterPairs(pairs)
    val kept = TrainingData.keepSet(docs, clusters)
      .collect().map(_.getLong(0)).toSet
    // {1,3,5} keeps 1; {7,8} keeps 7; singletons untouched
    assert(kept == Set(0L, 1L, 2L, 4L, 6L, 7L, 9L))
  }

  test("decontamination flags exactly the docs sharing an n-gram with the benchmark") {
    val bench = Seq(
      (1000L, "the capital of france is paris obviously"),
      (1001L, "alpha beta gamma delta epsilon")).toDF("doc_id", "text")
    val docs = Seq(
      // contains a verbatim benchmark passage → flagged
      (0L, "padding words capital of france is paris more padding"),
      // shares only single words, never 3 consecutive → clean
      (1L, "france alpha paris beta capital gamma"),
      // verbatim copy of the whole second benchmark doc → flagged
      (2L, "alpha beta gamma delta epsilon"),
      // unrelated → clean
      (3L, "completely different content here entirely")).toDF("doc_id", "text")
    val got = TrainingData.contaminationFlags(docs, bench)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.keySet == Set(0L, 2L), s"got $got")
    // doc 2 shares all 3 distinct trigrams of bench doc 1001
    assert(got(2L) == 3L)
  }

  test("ann_lsh_bucket: non-empty + scan-fraction recall floor on random vectors") {
    // the driver's embeddings are STRUCTURELESS random vectors — the worst
    // case for any LSH: cosine neighbors are near-uniform, so expected
    // recall ~ the scanned corpus fraction (probe ring = 5 of 16 buckets).
    // The clustered test below shows the scheme's real behavior.
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val exact = TrainingData.annCosineTopK(emb, 10).collect().map(_.getLong(0)).toSet
    val lsh = TrainingData.annLshTopK(emb, 10).collect().map(_.getLong(0)).toSet
    assert(lsh.nonEmpty, "LSH bucket ring must not be vacuous")
    val recall = (lsh & exact).size.toDouble / exact.size
    info(f"ann-LSH recall@10 on random vectors = $recall%.2f (scan fraction 5/16 = 0.31)")
    assert(recall >= 0.1, f"recall $recall%.2f below even the random floor")
  }

  test("ann_ivf: non-empty on random vectors; high recall on clustered embeddings") {
    // random vectors: recall ~ scanned fraction (probes/centroids = 4/16)
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val exactR = TrainingData.annCosineTopK(emb, 10).collect().map(_.getLong(0)).toSet
    val ivfR = TrainingData.annIvfTopK(emb, 10).collect().map(_.getLong(0)).toSet
    assert(ivfR.nonEmpty, "IVF probe lists must not be vacuous")
    info(f"ann-IVF recall@10 on random vectors = ${(ivfR & exactR).size / 10.0}%.2f (scan fraction 4/16)")
    // clustered regime: same-cluster vectors assign to the same centroid,
    // so probing the query's nearest lists holds nearly all true neighbors
    val rnd = new scala.util.Random(123L)
    val dims = 64
    val centers = (0 until 16).map(_ => Array.fill(dims)(if (rnd.nextBoolean()) 1.0f else -1.0f))
    val rows = (0L until 400L).map { id =>
      val c = centers((id % 16).toInt)
      (id, c.map(x => x + rnd.nextGaussian().toFloat * 0.3f))
    }
    val clustered = rows.toDF("vec_id", "embedding")
    val exact = TrainingData.annCosineTopK(clustered, 10).collect().map(_.getLong(0)).toSet
    val ivf = TrainingData.annIvfTopK(clustered, 10).collect().map(_.getLong(0)).toSet
    val recall = (ivf & exact).size.toDouble / exact.size
    info(f"ann-IVF recall@10 on clustered vectors = $recall%.2f")
    assert(recall >= 0.7, f"clustered IVF recall $recall%.2f below 0.7")
  }

  test("ann_lsh_bucket: high recall on clustered embeddings") {
    // realistic regime: embeddings cluster (the reference's SciBERT vectors
    // do); same-cluster vectors land in the same sign-projection bucket,
    // so the probe ring holds nearly all true neighbors.
    val rnd = new scala.util.Random(99L)
    val dims = 64
    val centers = (0 until 16).map(_ => Array.fill(dims)(if (rnd.nextBoolean()) 1.0f else -1.0f))
    val rows = (0L until 400L).map { id =>
      val c = centers((id % 16).toInt)
      (id, c.map(x => x + rnd.nextGaussian().toFloat * 0.3f))
    }
    val emb = rows.toDF("vec_id", "embedding")
    val exact = TrainingData.annCosineTopK(emb, 10).collect().map(_.getLong(0)).toSet
    val lsh = TrainingData.annLshTopK(emb, 10).collect().map(_.getLong(0)).toSet
    val recall = (lsh & exact).size.toDouble / exact.size
    info(f"ann-LSH recall@10 on clustered vectors = $recall%.2f")
    assert(recall >= 0.7, f"clustered recall $recall%.2f below 0.7")
  }

  test("ann_ivfpq: codes well-formed; rerank recall tracks IVF-flat on clustered vectors") {
    import spark.implicits._
    val rnd = new scala.util.Random(321L)
    val dims = 64
    val centers = (0 until 16).map(_ => Array.fill(dims)(if (rnd.nextBoolean()) 1.0f else -1.0f))
    val rows = (0L until 400L).map { id =>
      val c = centers((id % 16).toInt)
      (id, c.map(x => x + rnd.nextGaussian().toFloat * 0.3f))
    }
    val emb = rows.toDF("vec_id", "embedding")
    // stored form: every vector carries a coarse id and M codes in range
    val codes = TrainingData.pqCodes(emb).collect()
    assert(codes.length == rows.length, "every vector must encode")
    codes.foreach { r =>
      val cs = r.getSeq[Byte](2)
      assert(cs.length == TrainingData.PqSubspaces)
      assert(cs.forall(j => j >= 0 && j < TrainingData.PqCodebookSize),
        s"code out of range: $cs")
      assert(r.getLong(1) >= 1 && r.getLong(1) <= TrainingData.IvfCentroids)
    }
    // the ADC shortlist + exact rerank keeps (almost) the recall of the
    // flat scan over the same probed lists — PQ costs candidates only when
    // the true neighbor falls outside the shortlist
    val exact = TrainingData.annCosineTopK(emb, 10).collect().map(_.getLong(0)).toSet
    val ivf = TrainingData.annIvfTopK(emb, 10).collect().map(_.getLong(0)).toSet
    val pq = TrainingData.annIvfPqTopK(emb, 10).collect().map(_.getLong(0)).toSet
    val recallExact = (pq & exact).size.toDouble / exact.size
    val recallIvf = (pq & ivf).size.toDouble / ivf.size
    info(f"ann-IVFPQ recall@10 vs exact = $recallExact%.2f, vs IVF-flat = $recallIvf%.2f")
    assert(pq.nonEmpty)
    assert(recallIvf >= 0.7, f"IVFPQ lost too much vs IVF-flat: $recallIvf%.2f")
    assert(recallExact >= 0.6, f"IVFPQ recall vs exact too low: $recallExact%.2f")
  }
}
