package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Analyzer

/** Large-scale training-data pipeline operators over the `documents` and
  * `embeddings` tables: deduplication (exact, n-gram Jaccard, MinHash-LSH,
  * SimHash), similarity search (brute-force cosine + LSH-bucketed ANN),
  * and text analysis (language heuristic, quality scoring, token counts,
  * fingerprinting).
  *
  * Everything that is SQL-expressible carries an exact DuckDB oracle;
  * hash-sketch operators (MinHash/SimHash/LSH buckets) use Spark's
  * xxhash64 (no DuckDB twin) and are verified structurally in ScalaTest
  * plus rows-only by the driver. The MinHash-LSH candidates are
  * post-verified with the exact Jaccard the `dedup_ngram_jaccard` oracle
  * pins, so the approximate path can only lose recall, never precision.
  */
object TrainingData {

  private def docs(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/documents.parquet")
  private def emb(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/embeddings.parquet")

  /** Raw token stream (no stopwords) as a Column — shared by shingling,
    * fingerprints and counts so the oracle expression is identical.
    */
  private def toks(c: Column): Column = Analyzer.tokensCol(c, Analyzer.noStopwords)

  /** (doc_id, shingle) distinct 3-gram shingles. */
  private def shingles(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .select(col("doc_id"), toks(col("text")).as("toks"))
      .filter(size(col("toks")) >= 3)
      .select(col("doc_id"), explode(
        expr("transform(sequence(1, size(toks) - 2), i -> array_join(slice(toks, i, 3), ' '))"))
        .as("sh"))
      .distinct()

  private val JaccardThreshold = 0.6

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // exact dedup: hash-groupBy on content
    "dedup_exact" -> ((s, dir) =>
      docs(s, dir).groupBy(md5(col("text")).as("h"))
        .agg(count(lit(1)).as("n"), min(col("doc_id")).as("keep_id"))
        .filter(col("n") > 1)),

    // exact n-gram Jaccard near-dup pairs (oracle for the LSH path).
    // Shingle-inverted-index join: pairs are generated only for docs that
    // SHARE a shingle — never a blind n^2 cross join.
    "dedup_ngram_jaccard" -> ((s, dir) => {
      val sh = shingles(s, dir).persist()
      val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("nsh"))
      val a = sh.select(col("doc_id").as("id_a"), col("sh"))
      val b = sh.select(col("doc_id").as("id_b"), col("sh"))
      val inter = a.join(b, Seq("sh"))
        .filter(col("id_a") < col("id_b"))
        .groupBy(col("id_a"), col("id_b")).agg(count(lit(1)).as("inter"))
      inter
        .join(sizes.select(col("doc_id").as("id_a"), col("nsh").as("na")), Seq("id_a"))
        .join(sizes.select(col("doc_id").as("id_b"), col("nsh").as("nb")), Seq("id_b"))
        .withColumn("jaccard",
          round(col("inter") / (col("na") + col("nb") - col("inter")), 6))
        .filter(col("jaccard") >= JaccardThreshold)
        .select(col("id_a"), col("id_b"), col("jaccard"))
    }),

    // MinHash + LSH banding: 16 hashes, 8 bands of 2 — candidates from
    // band-bucket self-join, post-verified with exact Jaccard (same
    // threshold as the oracle query). xxhash64-based, Spark-only sketch.
    "dedup_minhash_lsh" -> ((s, dir) => {
      val numHashes = 16
      val bands = 8
      val rows = numHashes / bands
      val sh = shingles(s, dir)
      // minhash signature: per doc, min over shingles of xxhash64(seed, sh)
      val sig = sh.groupBy(col("doc_id")).agg(
        array((0 until numHashes).map(i => min(xxhash64(lit(i), col("sh")))): _*)
          .as("sig"))
      val banded = sig.select(col("doc_id"), posexplode(
        expr(s"transform(sequence(0, ${bands - 1}), b -> xxhash64(b, slice(sig, b * $rows + 1, $rows)))"))
        .as(Seq("band", "bucket")))
      val cand = banded.as("x").join(banded.as("y"),
          col("x.band") === col("y.band") && col("x.bucket") === col("y.bucket") &&
            col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("id_a"), col("y.doc_id").as("id_b"))
        .distinct()
      // post-verify candidates with exact Jaccard
      val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("nsh"))
      val a = sh.select(col("doc_id").as("id_a"), col("sh"))
      val b = sh.select(col("doc_id").as("id_b"), col("sh"))
      val inter = a.join(b, Seq("sh")).join(cand, Seq("id_a", "id_b"), "left_semi")
        .groupBy(col("id_a"), col("id_b")).agg(count(lit(1)).as("inter"))
      inter
        .join(sizes.select(col("doc_id").as("id_a"), col("nsh").as("na")), Seq("id_a"))
        .join(sizes.select(col("doc_id").as("id_b"), col("nsh").as("nb")), Seq("id_b"))
        .withColumn("jaccard",
          round(col("inter") / (col("na") + col("nb") - col("inter")), 6))
        .filter(col("jaccard") >= JaccardThreshold)
        .select(col("id_a"), col("id_b"), col("jaccard"))
    }),

    // SimHash near-dup: 64-bit signature from per-token xxhash64 bit votes,
    // pairs within Hamming distance 3 (bucketed by 4 16-bit chunks — a
    // pair at distance <=3 shares at least one exact chunk).
    "dedup_simhash" -> ((s, dir) => {
      val tf = docs(s, dir)
        .select(col("doc_id"), explode(toks(col("text"))).as("term"))
        .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("w"))
        .withColumn("h", xxhash64(col("term")))
      // per-bit weighted votes -> sign -> 64-bit signature
      val bitCols = (0 until 64).map { i =>
        sum(when(shiftright(col("h"), i).bitwiseAND(1) === 1, col("w"))
          .otherwise(-col("w"))).as(s"b$i")
      }
      val sig = tf.groupBy(col("doc_id")).agg(bitCols.head, bitCols.tail: _*)
        .select(col("doc_id"),
          (0 until 64).map(i => when(col(s"b$i") > 0, shiftleft(lit(1L), i)).otherwise(lit(0L)))
            .reduce(_.bitwiseOR(_)).as("sig"))
      val chunked = sig.select(col("doc_id"), col("sig"), explode(array(
        (0 until 4).map(c => struct(lit(c).as("c"),
          shiftright(col("sig"), c * 16).bitwiseAND(0xffffL).as("v"))): _*)).as("ch"))
        .select(col("doc_id"), col("sig"), col("ch.c"), col("ch.v"))
      val pairs = chunked.as("x").join(chunked.as("y"),
          col("x.c") === col("y.c") && col("x.v") === col("y.v") &&
            col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("id_a"), col("y.doc_id").as("id_b"),
          col("x.sig").as("sa"), col("y.sig").as("sb"))
        .distinct()
      pairs
        .withColumn("hamming", bit_count(col("sa").bitwiseXOR(col("sb"))))
        .filter(col("hamming") <= 3)
        .select(col("id_a"), col("id_b"), col("hamming"))
    }),

    // brute-force cosine top-k ANN baseline: query = vec_id 0's embedding
    "ann_cosine_topk" -> ((s, dir) => {
      val e = emb(s, dir)
        .select(col("vec_id"), expr("transform(embedding, x -> cast(x AS DOUBLE))").as("v"))
      val q = e.filter(col("vec_id") === 0).select(col("v").as("qv"))
      e.filter(col("vec_id") > 0)
        .crossJoin(broadcast(q))
        .select(col("vec_id"), round(
          expr("aggregate(zip_with(v, qv, (x, y) -> x * y), 0D, (acc, x) -> acc + x)") /
            (sqrt(expr("aggregate(v, 0D, (acc, x) -> acc + x * x)")) *
              sqrt(expr("aggregate(qv, 0D, (acc, x) -> acc + x * x)"))), 4).as("cos"))
        .orderBy(col("cos").desc, col("vec_id").asc)
        .limit(10)
    }),

    // LSH-bucketed ANN (the 100TB-scale path): 12 sign-random-projection
    // bits from deterministic +-1 hyperplanes; search only the query's
    // bucket. Approximate by design -> verified in ScalaTest for recall
    // against ann_cosine_topk, rows-only here.
    "ann_lsh_bucket" -> ((s, dir) => {
      val planes = 12
      val e = emb(s, dir)
        .select(col("vec_id"), expr("transform(embedding, x -> cast(x AS DOUBLE))").as("v"))
      // hyperplane j element d = +1/-1 from xxhash64(j, d) parity
      val bucketCol = (0 until planes).map { j =>
        val dot = expr(
          s"""aggregate(zip_with(v, sequence(0, size(v) - 1),
             |  (x, d) -> CASE WHEN pmod(xxhash64($j, d), 2) = 0 THEN x ELSE -x END),
             |  0D, (acc, x) -> acc + x)""".stripMargin)
        when(dot >= 0, shiftleft(lit(1), j)).otherwise(lit(0))
      }.reduce((a, b) => a.bitwiseOR(b))
      val withBucket = e.withColumn("bucket", bucketCol)
      val qb = withBucket.filter(col("vec_id") === 0)
        .select(col("v").as("qv"), col("bucket").as("qbucket"))
      withBucket.filter(col("vec_id") > 0)
        .join(broadcast(qb), col("bucket") === col("qbucket"))
        .select(col("vec_id"), round(
          expr("aggregate(zip_with(v, qv, (x, y) -> x * y), 0D, (acc, x) -> acc + x)") /
            (sqrt(expr("aggregate(v, 0D, (acc, x) -> acc + x * x)")) *
              sqrt(expr("aggregate(qv, 0D, (acc, x) -> acc + x * x)"))), 4).as("cos"))
        .orderBy(col("cos").desc, col("vec_id").asc)
        .limit(10)
    }),

    // language-ID heuristic (script classes; deterministic rule, not a model)
    "lang_id" -> ((s, dir) =>
      docs(s, dir).select(col("doc_id"), col("lang"),
        when(col("text").rlike("[\\u4E00-\\u9FFF]"), "cjk")
          .when(col("text").rlike("[\\u00C0-\\u024F]"), "latin-ext")
          .otherwise("en").as("lang_pred"))),

    // quality scoring: token/char counts + stopword & punctuation ratios
    "quality_score" -> ((s, dir) => {
      val stop = Analyzer.englishStopwords.toSeq.sorted
      docs(s, dir)
        .select(col("doc_id"), col("text"), toks(col("text")).as("tk"))
        .select(
          col("doc_id"),
          size(col("tk")).as("n_tokens"),
          length(col("text")).as("n_chars_m"),
          round(size(filter(col("tk"), t => t.isin(stop: _*))) /
            greatest(size(col("tk")).cast("double"), lit(1.0)), 6).as("stop_ratio"),
          round((length(col("text")) -
            length(regexp_replace(col("text"), "\\p{P}", ""))).cast("double") /
            greatest(length(col("text")).cast("double"), lit(1.0)), 6).as("punct_ratio"))
    }),

    // token counting: analyzer tokens + whitespace-word count
    "token_count" -> ((s, dir) =>
      docs(s, dir).select(
        col("doc_id"),
        size(toks(col("text"))).as("n_tokens"),
        size(split(trim(col("text")), "\\s+")).as("n_words"),
        col("n_chars"))),

    // document fingerprint: content hash of the normalized token stream
    "fingerprint" -> ((s, dir) =>
      docs(s, dir).select(
        col("doc_id"),
        md5(concat_ws(" ", toks(col("text")))).as("fp")))
  )

  private val tokSql = "regexp_extract_all(lower(text), '[\\pL\\pN]+')"

  def oracles: Map[String, String] = {
    val stopList = Analyzer.englishStopwords.toSeq
      .filter(_.matches("[\\p{L}\\p{N}]+")).sorted.map(w => s"'$w'").mkString(", ")
    Map(
      "dedup_exact" ->
        """SELECT md5(text) AS h, count(*) AS n, min(doc_id) AS keep_id
          |FROM documents GROUP BY 1 HAVING count(*) > 1""".stripMargin,
      "dedup_ngram_jaccard" ->
        s"""WITH tk AS (SELECT doc_id, $tokSql AS toks FROM documents),
           |sh AS (
           |  SELECT DISTINCT doc_id,
           |    unnest(list_transform(range(1, len(toks) - 1),
           |      i -> array_to_string(toks[i:i+2], ' '))) AS sh
           |  FROM tk WHERE len(toks) >= 3),
           |sizes AS (SELECT doc_id, count(*) AS nsh FROM sh GROUP BY 1),
           |inter AS (
           |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
           |  FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
           |  GROUP BY 1, 2)
           |SELECT i.id_a, i.id_b,
           |  round(i.inter / (sa.nsh + sb.nsh - i.inter), 6) AS jaccard
           |FROM inter i
           |JOIN sizes sa ON i.id_a = sa.doc_id
           |JOIN sizes sb ON i.id_b = sb.doc_id
           |WHERE round(i.inter / (sa.nsh + sb.nsh - i.inter), 6) >= $JaccardThreshold""".stripMargin,
      "ann_cosine_topk" ->
        """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
          |           FROM embeddings),
          |q AS (SELECT v AS qv FROM e WHERE vec_id = 0)
          |SELECT e.vec_id,
          |  round(list_sum(list_transform(range(1, len(e.v) + 1), i -> e.v[i] * q.qv[i])) /
          |    (sqrt(list_sum(list_transform(e.v, x -> x * x))) *
          |     sqrt(list_sum(list_transform(q.qv, x -> x * x)))), 4) AS cos
          |FROM e, q WHERE e.vec_id > 0
          |ORDER BY cos DESC, e.vec_id LIMIT 10""".stripMargin,
      "lang_id" ->
        """SELECT doc_id, lang,
          |CASE WHEN regexp_matches(text, '[\x{4E00}-\x{9FFF}]') THEN 'cjk'
          |     WHEN regexp_matches(text, '[\x{00C0}-\x{024F}]') THEN 'latin-ext'
          |     ELSE 'en' END AS lang_pred
          |FROM documents""".stripMargin,
      "quality_score" ->
        s"""WITH tk AS (SELECT doc_id, text, $tokSql AS toks FROM documents)
           |SELECT doc_id,
           |  len(toks) AS n_tokens,
           |  length(text) AS n_chars_m,
           |  round(len(list_filter(toks, t -> t IN ($stopList))) /
           |    greatest(CAST(len(toks) AS DOUBLE), 1.0), 6) AS stop_ratio,
           |  round(CAST(length(text) - length(regexp_replace(text, '\\pP', '', 'g')) AS DOUBLE) /
           |    greatest(CAST(length(text) AS DOUBLE), 1.0), 6) AS punct_ratio
           |FROM tk""".stripMargin,
      "token_count" ->
        s"""SELECT doc_id, len($tokSql) AS n_tokens,
           |len(regexp_split_to_array(trim(text), '\\s+')) AS n_words, n_chars
           |FROM documents""".stripMargin,
      "fingerprint" ->
        s"SELECT doc_id, md5(array_to_string($tokSql, ' ')) AS fp FROM documents"
    )
  }
}
