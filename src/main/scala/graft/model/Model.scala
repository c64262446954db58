package graft.model

import java.sql.Timestamp

/** Core data model for the transcript full-text index engine.
  *
  * The input table shape is pinned by the north rule (BASELINE.json
  * `input_hint`): one row per conversation turn. A *document* for indexing
  * purposes is one turn; `docId` is a dense long assigned by stable global
  * sort on (conv_id, turn_idx) — never a partition-dependent counter (the
  * reference learned this the hard way and re-linked FAISS positions by
  * joining on title, /root/reference/data_processing/semantic_index/
  * create_lookup_table.py:28-34).
  */
final case class Turn(
    conv_id: String,
    turn_idx: Int,
    role: String,
    text: String,
    tool: String,
    ts: Timestamp
)

/** A turn with its assigned dense document id. */
final case class Doc(
    docId: Long,
    conv_id: String,
    turn_idx: Int,
    role: String,
    text: String,
    tool: String,
    ts: Timestamp
)

/** One inverted-index posting: term t appears tf times in document docId.
  * Replaces the reference's per-doc `map<int,int>` term-frequency maps
  * (/root/reference/data_processing/Lexical_indexing/bm25_precompute.py:86)
  * with a proper row-oriented postings relation.
  */
final case class Posting(term: String, docId: Long, tf: Int)

/** Posting enriched with the doc length (needed by the BM25 norm). */
final case class PostingDl(term: String, docId: Long, tf: Int, dl: Int)

/** Per-document statistics: dl = number of tokens after analysis. */
final case class DocStat(docId: Long, dl: Int)

/** Per-term statistics: df = # docs containing term; idf = ln((N+1)/(df+1))
  * (Spark ML IDF semantics the reference's stats are built from,
  * /root/reference/data_processing/Lexical_indexing/bm25_precompute.py:50-54).
  */
final case class TermStat(term: String, df: Long, idf: Double)

/** Corpus-level scalars. N = number of documents with >=1 token. */
final case class CorpusStats(docCount: Long, avgdl: Double)

/** One encoded posting block (<= blockSize postings of one (shard, term)
  * sub-list, docId-ascending). `payload` is the delta+varint encoding of
  * (docId, tf, dl) triples.
  *
  * `maxTf`/`minDl` are the block-max metadata: BM25's per-term partial
  * tf·(k1+1)/(tf + k1·(1−b+b·dl/avgdl)) is monotone increasing in tf and
  * decreasing in dl, so partial(maxTf, minDl) bounds every posting in the
  * block for ANY avgdl. Storing the corpus-independent pair (instead of a
  * baked-in partial) keeps old blocks' bounds exact after incremental
  * snapshot appends shift avgdl.
  */
final case class PostingBlock(
    shardId: Int,
    term: String,
    blockIdx: Int,
    minDocId: Long,
    maxDocId: Long,
    n: Int,
    maxTf: Int,
    minDl: Int,
    sumTf: Long, // total token occurrences in the block: corpus stats (df,
    // avgdl) are derived from the ~100x-smaller blocks relation instead of
    // caching the raw 25N-row postings
    payload: Array[Byte],
    // varint position lists (Codec.encodePositions) when the index was
    // built with storePositions; empty otherwise. A SEPARATE parquet column
    // so BM25 paths that never project it never read it from disk —
    // positions cost phrase queries only (the columnar .prx analogue).
    positions: Array[Byte]
)

/** A scored query hit, decorated with the turn it came from. */
final case class ScoredDoc(
    docId: Long,
    score: Double,
    conv_id: String,
    turn_idx: Int,
    text: String
)

/** BM25 parameters. Pinned by the north rule: k1=1.2, b=0.75 (the
  * reference searcher used k1=1.5, /root/reference/data_processing/
  * Lexical_indexing/bm25_searcher.py:23-24; BASELINE.json overrides).
  */
final case class Bm25Params(k1: Double = 1.2, b: Double = 0.75)
