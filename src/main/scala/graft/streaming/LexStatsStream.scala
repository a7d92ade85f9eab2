package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import graft.operators.TextAnalysis

/** Maintained lexical index — the inverted-index half of the retrieval
  * stack getting the same streamed maintenance the ANN tiers already have
  * ([[EmbeddingIndexStream]]). Document batches fold TWO state logs:
  *
  *  - `lexstats/batch=<id>` — [[TextAnalysis.lexStatsOf]] partials
  *    (per-term document frequency + ONE corpus row of token/doc totals).
  *    The sums are plain long addition over DISJOINT doc batches, so
  *    [[currentStats]] over the union corpus is BIT-IDENTICAL to the
  *    one-shot batch aggregate (spec-pinned).
  *  - `lexpost/batch=<id>/pbucket=<b>` — [[TextAnalysis.lexPostingsOf]]
  *    POSTING rows (term → doc_id, tf, dl), partitioned by term bucket so
  *    a query's read partition-prunes to its own terms' buckets. Disjoint
  *    doc batches contribute disjoint posting rows — the fold is a plain
  *    union.
  *
  * Serving ladder: [[bm25Topk]] (stats maintained, tf by corpus scan —
  * O(corpus) per query, kept as the migration form) and [[bm25TopkIndexed]]
  * (stats AND tf from the index — O(query-term postings) per query, the
  * scale path: the [[EmbeddingIndexStream]] nprobe-read treatment applied
  * to text). Both route the shared [[TextAnalysis.bm25ScoreExpr]] tree, so
  * served ≡ batch bitwise whenever the maintained state equals the
  * one-shot build (LexStatsStreamSpec pins all folds).
  *
  * Replay safety rides the [[StateLog]] discipline per log (COUNT folding
  * is not idempotent; posting re-union would double tf): each log's
  * `batch=` dir presence short-circuits a replay, compaction watermarks
  * are per-log (`foldmeta` / `foldmeta-lexpost`), interrupted temp-swaps
  * heal on access. A crash between the two logs' commits leaves one
  * committed and one not; the replay re-commits only the missing one.
  *
  * Per-batch cost: one explode→distinct→groupBy over the BATCH for stats
  * (map-side combined to batch-vocabulary rows) + one narrow HOF
  * projection and a bounded repartition-by-bucket for postings + the two
  * commit renames. Auto-compaction bounds both logs' dir counts; the
  * stats fold re-sums per term and the postings fold rewrites one file
  * per bucket — the standard segment-merge of a lexical index.
  */
object LexStatsStream {

  private def log(spark: SparkSession, stateDir: String) =
    new StateLog(spark, stateDir, "lexstats")

  private def postLog(spark: SparkSession, stateDir: String) =
    new StateLog(spark, stateDir, "lexpost", foldmetaName = "foldmeta-lexpost")

  private def emptyStats(spark: SparkSession): DataFrame =
    spark.range(0).select(col("id").cast("string").as("term"),
      col("id").as("df"), col("id").as("dl"), col("id").as("nd"))

  private def emptyPostings(spark: SparkSession): DataFrame =
    spark.range(0).select(col("id").cast("string").as("term"),
      col("id").as("doc_id"), col("id").as("tf"), col("id").as("dl"),
      array().cast("array<int>").as("positions"),
      col("id").cast("int").as("pbucket"))

  /** Accumulated stat rows summed per term — for the union of all folded
    * batches, bit-identical to `TextAnalysis.lexStatsOf` over that union.
    * Vocabulary-sized; serving filters it to the query terms + the corpus
    * row before anything leaves the executors. */
  def currentStats(spark: SparkSession, stateDir: String): DataFrame =
    log(spark, stateDir).read(Seq("term", "df", "dl", "nd"), emptyStats(spark))
      .groupBy("term")
      .agg(sum("df").as("df"), sum("dl").as("dl"), sum("nd").as("nd"))

  /** The query terms' posting rows — partition-pruned to the terms'
    * [[TextAnalysis.termBucket]] dirs (the read opens only those buckets
    * across all batch dirs, the `cluster=` nprobe-read shape). */
  def currentPostings(spark: SparkSession, stateDir: String,
                      terms: Seq[String]): DataFrame =
    readPostings(spark, stateDir, terms,
      Seq("term", "doc_id", "tf", "dl", "pbucket"))

  /** [[currentPostings]] including the POSITIONS column (phrase reads);
    * kept separate so the BM25 path's parquet scan prunes positions away. */
  def currentPostingsWithPositions(spark: SparkSession, stateDir: String,
                                   terms: Seq[String]): DataFrame =
    readPostings(spark, stateDir, terms,
      Seq("term", "doc_id", "tf", "dl", "positions", "pbucket"))

  private def readPostings(spark: SparkSession, stateDir: String,
                           terms: Seq[String], cols: Seq[String]): DataFrame = {
    val buckets = terms.map(TextAnalysis.termBucket).distinct
    postLog(spark, stateDir)
      .read(cols, emptyPostings(spark).select(cols.map(col): _*))
      .filter(col("pbucket").isin(buckets: _*) && col("term").isin(terms: _*))
      .drop("pbucket")
  }

  /** Highest batch id the last STATS compaction folded (−1 when never). */
  def foldedUpto(spark: SparkSession, stateDir: String): Long =
    log(spark, stateDir).foldedUpto()

  /** Fold one document micro-batch into both index logs. Returns true when
    * anything folded, false when the replay guards short-circuited both. */
  def applyBatch(spark: SparkSession, batch: DataFrame, batchId: Long,
                 stateDir: String, autoCompactBatches: Int = 0): Boolean = {
    val lg = log(spark, stateDir)
    val pg = postLog(spark, stateDir)
    val statsNew = !lg.alreadyApplied(batchId)
    val postsNew = !pg.alreadyApplied(batchId)
    if (!statsNew && !postsNew) return false
    if (statsNew) {
      lg.commitBatch(TextAnalysis.lexStatsOf(batch), batchId, coalesce1 = false)
      lg.maybeAutoCompact(autoCompactBatches)(compactStats(spark, stateDir))
    }
    if (postsNew) {
      pg.commitBatch(
        TextAnalysis.lexPostingsOf(batch).repartition(col("pbucket")),
        batchId, coalesce1 = false, partitionByCols = Seq("pbucket"))
      pg.maybeAutoCompact(autoCompactBatches)(compactPostings(spark, stateDir))
    }
    true
  }

  /** Fold the stats batch dirs into one `batch=-1` dir with exact summed
    * stats — the non-idempotent [[StateLog.compact]] discipline
    * (watermark first). */
  def compactStats(spark: SparkSession, stateDir: String): Unit =
    log(spark, stateDir).compact(
      _.groupBy("term").agg(sum("df").as("df"), sum("dl").as("dl"),
        sum("nd").as("nd")))

  /** Fold the posting batch dirs into one `batch=-1` dir, one file per
    * bucket (the union is lossless — disjoint doc batches — but the fold
    * still watermarks: a replay of a folded batch would re-UNION its
    * rows and double tf at read). */
  def compactPostings(spark: SparkSession, stateDir: String): Unit =
    postLog(spark, stateDir).compact(
      _.drop("batch").repartition(col("pbucket")),
      coalesce1 = false, partitionByCols = Seq("pbucket"))

  /** Fold both logs. */
  def compactState(spark: SparkSession, stateDir: String): Unit = {
    compactStats(spark, stateDir)
    compactPostings(spark, stateDir)
  }

  /** BM25 served from the maintained stats, tf by corpus scan — the
    * per-query read path while a corpus table is still at hand. */
  def bm25Topk(spark: SparkSession, stateDir: String, docs: DataFrame,
               terms: Seq[String] = TextAnalysis.Bm25Terms,
               k: Int = 20): DataFrame =
    TextAnalysis.bm25TopkServed(docs, currentStats(spark, stateDir), terms, k)

  /** BM25 served ENTIRELY from the maintained index (stats + postings) —
    * no corpus access; cost is O(postings of the query terms). */
  def bm25TopkIndexed(spark: SparkSession, stateDir: String,
                      terms: Seq[String] = TextAnalysis.Bm25Terms,
                      k: Int = 20): DataFrame =
    TextAnalysis.bm25TopkIndexed(
      currentPostings(spark, stateDir, terms),
      currentStats(spark, stateDir), terms, k)

  /** Phrase query served from the POSITIONAL postings — no corpus access;
    * reads only the phrase terms' buckets. */
  def phraseMatch(spark: SparkSession, stateDir: String,
                  phrase: Seq[String] = TextAnalysis.PhraseTerms): DataFrame =
    TextAnalysis.phraseMatchOf(
      currentPostingsWithPositions(spark, stateDir, phrase), phrase)

  /** Proximity (NEAR/k) query served from the positional postings — no
    * corpus access; reads only the two terms' buckets. */
  def proximityMatch(spark: SparkSession, stateDir: String,
                     termA: String = TextAnalysis.PhraseTerms(0),
                     termB: String = TextAnalysis.PhraseTerms(1),
                     maxDist: Int = TextAnalysis.ProximityDist): DataFrame =
    TextAnalysis.proximityMatchOf(
      currentPostingsWithPositions(spark, stateDir, Seq(termA, termB)),
      termA, termB, maxDist)

  /** Search-result SNIPPETS served off the index: the indexed BM25 top-k
    * chooses the ids (postings only), then ONLY those k rows are read from
    * the row store for the best-window extraction — the serving shape
    * where the corpus-sized table is touched for exactly k point reads. */
  def snippets(spark: SparkSession, stateDir: String, docs: DataFrame,
               terms: Seq[String] = TextAnalysis.Bm25Terms, k: Int = 5,
               window: Int = TextAnalysis.SnippetWindow): DataFrame = {
    // ≤ k ids collected driver-side (bounded by construction) and pushed
    // as an In predicate: the row-store read is a PushedFilters point
    // lookup (row-group stats pruning on a doc_id-sorted layout), not a
    // corpus-wide semi-join — the scale-correct serving plan
    val topIds = bm25TopkIndexed(spark, stateDir, terms, k)
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    TextAnalysis.snippetWindows(
      docs.filter(col("doc_id").isin(topIds: _*)).select("doc_id", "text"),
      terms, window)
  }

  /** Per-facet match counts served off the index: candidate ids from the
    * query terms' postings, one semi-join to a slim dim projection. */
  def facetCounts(spark: SparkSession, stateDir: String, dims: DataFrame,
                  terms: Seq[String] = TextAnalysis.Bm25Terms,
                  facets: Seq[String] = Seq("lang", "source")): DataFrame =
    TextAnalysis.facetCountsOf(
      currentPostings(spark, stateDir, terms).select("doc_id").distinct(),
      dims, facets)

  /** File-source wrapper: document parquet drops → maintained stats +
    * postings under `stateDir`. */
  def runFileStream(spark: SparkSession, inDir: String, stateDir: String,
                    checkpointDir: String, schemaFrom: DataFrame,
                    autoCompactBatches: Int = 16): StreamingQuery =
    spark.readStream
      .schema(schemaFrom.schema)
      .parquet(inDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyBatch(spark, batch, batchId, stateDir,
          autoCompactBatches = autoCompactBatches)
        ()
      }
      .start()
}
