package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{Prep, TextAnalysis}

/** PASSAGE-grain lexical index lifecycle (round 20, verdict r19 item 1):
  * the chunk-level index behind `bm25_passage_topk` gets the same
  * delete/update lifecycle the doc-grain index grew in round 19 — because
  * it is literally the same index over derived documents. Each
  * [[Prep.chunkTextsOf]] window becomes an index "document" keyed
  * `pid = doc_id · 1000 + chunk_idx`, and every [[LexStatsStream]] verb
  * (fold, tombstone ceilings, negative-addend stats corrections, sync,
  * compaction, as-of) applies UNCHANGED at the chunk grain. What this
  * object adds is the CASCADE: corpus-level verbs (a doc deleted, a doc
  * edited) arrive keyed by parent doc id, and must resolve to the pid
  * space —
  *
  *  - [[sync]] needs no resolution at all: chunking both corpus snapshots
  *    and diffing at (pid, text) grain IS the cascade. A deleted doc's
  *    pids all land in the removed set; an edited doc re-chunks and the
  *    diff touches exactly the windows whose text shifted (a suffix edit
  *    under win=32/stride=24 leaves every earlier window's pid+text
  *    identical — those rows are never rewritten), including windows that
  *    appear/disappear when the chunk COUNT changes. O(changed docs'
  *    chunks), zero postings scan — the snapshot-diff contract inherited
  *    verbatim.
  *  - [[deleteDocs]] (ids only, no text at hand) resolves the parents'
  *    chunk pids from the RAW postings view in one narrow scan
  *    ([[LexStatsStream.postingDocIds]] + a `pid DIV 1000` semi-join) and
  *    then runs the standard ceiling-tombstone delete — exact tombstones
  *    (only pids that ever existed), never a speculative 1000-row-per-doc
  *    enumeration. RAW, deliberately not live: the tombstone batch must
  *    recommit identical content on a replay, and a live-view resolution
  *    would re-resolve EMPTY after its own first commit and overwrite the
  *    tombstones away (the method's own doc carries the full argument).
  *
  * The pid encoding is guarded, not assumed (round-19 advisory): a
  * document chunking past 1000 windows (≥ ~24k tokens at win=32/
  * stride=24) would silently alias into its neighbor's pid space in both
  * engines; [[chunkDocs]] raises at INDEX-BUILD time instead, inside the
  * distributed projection (no extra pass, no driver aggregate).
  */
object PassageLex {

  /** Parent-doc multiplier: pid = doc_id · PidMult + chunk_idx. Shared
    * with the oracle replicas ([[Prep.bm25PassageSql]]). */
  final val PidMult = 1000L

  private val PidOverflowMsg =
    s"passage pid overflow: chunk_idx >= $PidMult (document longer than " +
    s"~${PidMult * 24} tokens at win=32/stride=24) would alias into the " +
    "next doc_id's pid space - widen PidMult or split the document " +
    "upstream"

  /** Chunk a (doc_id, text) corpus into the index's derived documents:
    * (pid AS doc_id, chunk text). The pid arithmetic fails loud on
    * chunk_idx overflow instead of silently aliasing. */
  def chunkDocs(docs: DataFrame): DataFrame =
    Prep.chunkTextsOf(docs).select(
      (col("doc_id") * PidMult +
        when(col("chunk_idx") >= PidMult, raise_error(lit(PidOverflowMsg)))
          .otherwise(col("chunk_idx"))).as("doc_id"),
      col("text"))

  /** Fold one PARENT-document micro-batch into the chunk index — the
    * chunking is stateless and per-doc, so a doc batch's chunk rows are
    * disjoint from every other batch's and ride
    * [[LexStatsStream.applyBatch]] unchanged. */
  def applyBatch(spark: SparkSession, docBatch: DataFrame, batchId: Long,
                 stateDir: String, autoCompactBatches: Int = 0): Boolean =
    LexStatsStream.applyBatch(spark, chunkDocs(docBatch), batchId, stateDir,
      autoCompactBatches = autoCompactBatches)

  /** Corpus→chunk-index synchronization, ONE maintenance batch: chunk both
    * snapshots and hand the (pid, text) frames to
    * [[LexStatsStream.syncLexCorpus]] — adds/removes/in-place-updates at
    * window grain, old-text stats negation, ceiling tombstones, replay
    * idempotence all inherited. */
  def sync(spark: SparkSession, stateDir: String,
           oldDocs: DataFrame, newDocs: DataFrame, batchId: Long,
           autoCompactBatches: Int = 0): Unit =
    LexStatsStream.syncLexCorpus(spark, stateDir,
      chunkDocs(oldDocs), chunkDocs(newDocs), batchId,
      autoCompactBatches = autoCompactBatches)

  /** DELETE parent documents from the chunk index (ids only — the opt-out
    * shape, no text at hand): resolve each parent's chunk pids from the
    * postings log (the RAW view — [[LexStatsStream.postingDocIds]]
    * explains why resolution from the live view would break replay:
    * after the first commit the live set is empty, and the re-resolved
    * tombstone batch would overwrite its own tombstones away), then the
    * standard ceiling-tombstone delete + negative stats correction. Two
    * postings scans total (resolution + the delete's own
    * hidden-generation scan) — the inverted-index delete cost class.
    * Idempotent per batchId: the raw pid set is stable across replays,
    * so every commit's content re-derives identically. */
  def deleteDocs(spark: SparkSession, stateDir: String, docIds: DataFrame,
                 batchId: Long, ceiling: Option[Long] = None): Unit = {
    val parents = docIds
      .select(col(docIds.columns.head).cast("long").as("parent_id"))
    val pids = LexStatsStream.postingDocIds(spark, stateDir)
      .join(parents, expr(s"doc_id DIV $PidMult") === col("parent_id"),
        "left_semi")
    LexStatsStream.deleteDocs(spark, pids, batchId, stateDir, ceiling)
  }

  /** Passage BM25 top-k served entirely off the maintained chunk index,
    * pid decomposed back to (doc_id, chunk_idx) — the RAG serving read. */
  def bm25Topk(spark: SparkSession, stateDir: String,
               terms: Seq[String] = TextAnalysis.Bm25Terms,
               k: Int = 20): DataFrame =
    LexStatsStream.bm25TopkIndexed(spark, stateDir, terms, k)
      .select(expr(s"CAST(doc_id DIV $PidMult AS BIGINT)").as("doc_id"),
        pmod(col("doc_id"), lit(PidMult)).as("chunk_idx"),
        col("bm25"))
      .orderBy(col("bm25").desc, col("doc_id"), col("chunk_idx"))

  /** Phrase query at PASSAGE grain — the positional postings machinery
    * runs unchanged on chunk pids; the wrapper restores the window
    * decomposition. Grain semantics worth stating: a phrase SPANNING a
    * window boundary is findable at doc grain but not here — the chunk
    * index sees window-local token streams (the win=32/stride=24 overlap
    * exists exactly to bound that loss), and the oracle scans the same
    * chunk texts, so both engines agree by construction. */
  def phraseMatch(spark: SparkSession, stateDir: String,
                  phrase: Seq[String] = TextAnalysis.PhraseTerms): DataFrame =
    LexStatsStream.phraseMatch(spark, stateDir, phrase)
      .select(expr(s"CAST(doc_id DIV $PidMult AS BIGINT)").as("doc_id"),
        pmod(col("doc_id"), lit(PidMult)).as("chunk_idx"),
        col("n_matches"))
      .orderBy(col("doc_id"), col("chunk_idx"))

  /** Proximity (NEAR/k) at passage grain — same grain-blind machinery,
    * same window-local semantics note as [[phraseMatch]]. */
  def proximityMatch(spark: SparkSession, stateDir: String,
                     termA: String = TextAnalysis.PhraseTerms(0),
                     termB: String = TextAnalysis.PhraseTerms(1),
                     maxDist: Int = TextAnalysis.ProximityDist): DataFrame =
    LexStatsStream.proximityMatch(spark, stateDir, termA, termB, maxDist)
      .select(expr(s"CAST(doc_id DIV $PidMult AS BIGINT)").as("doc_id"),
        pmod(col("doc_id"), lit(PidMult)).as("chunk_idx"),
        col("min_dist"))
      .orderBy(col("doc_id"), col("chunk_idx"))

  /** More-like-this at passage grain — "find more context like this
    * WINDOW": the seed is a pid, its top TF-IDF terms elected against the
    * chunk-grain stats (window df, window N), the recommendation ranked
    * over windows with the seed window excluded. The RAG feedback verb:
    * a retrieved passage's neighbors-by-content, index-served. */
  def moreLikeThis(spark: SparkSession, stateDir: String, docs: DataFrame,
                   seedPid: Long = 0L, nTerms: Int = 3,
                   k: Int = 20): DataFrame =
    LexStatsStream.moreLikeThis(spark, stateDir, chunkDocs(docs),
        seedPid, nTerms, k)
      .select(expr(s"CAST(doc_id DIV $PidMult AS BIGINT)").as("doc_id"),
        pmod(col("doc_id"), lit(PidMult)).as("chunk_idx"),
        col("bm25"))
      .orderBy(col("bm25").desc, col("doc_id"), col("chunk_idx"))

  /** Passage BM25 AS IT STOOD at `asOfBatch` — the point-in-time read at
    * chunk grain (round 20): [[LexStatsStream.bm25TopkIndexedAsOf]] applies
    * UNCHANGED to the chunk index (pids are just doc ids to it — batch-
    * bounded postings + stats, tombstones committed ≤ B, refusal below the
    * folded horizon all inherited), and this wrapper only restores the
    * (doc_id, chunk_idx) decomposition. Reproduces yesterday's passage
    * ranking; audits exactly which windows a doc edit re-scored. */
  def bm25TopkAsOf(spark: SparkSession, stateDir: String, asOfBatch: Long,
                   terms: Seq[String] = TextAnalysis.Bm25Terms,
                   k: Int = 20): DataFrame =
    LexStatsStream.bm25TopkIndexedAsOf(spark, stateDir, asOfBatch, terms, k)
      .select(expr(s"CAST(doc_id DIV $PidMult AS BIGINT)").as("doc_id"),
        pmod(col("doc_id"), lit(PidMult)).as("chunk_idx"),
        col("bm25"))
      .orderBy(col("bm25").desc, col("doc_id"), col("chunk_idx"))
}
