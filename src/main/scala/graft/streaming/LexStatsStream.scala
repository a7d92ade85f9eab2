package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import graft.operators.TextAnalysis

/** Maintained lexical-index statistics — the inverted-index half of the
  * retrieval stack getting the same streamed maintenance the ANN tiers
  * already have ([[EmbeddingIndexStream]]). Document batches fold their
  * [[TextAnalysis.lexStatsOf]] partials (per-term document frequency + ONE
  * corpus row of token/doc totals) into an append-only state log; the sums
  * are plain long addition over DISJOINT doc batches (a new doc can only
  * ADD to df/dl/nd), so [[currentStats]] over the union corpus is
  * BIT-IDENTICAL to the one-shot batch aggregate (spec-pinned), and
  * [[TextAnalysis.bm25TopkServed]] from the maintained stats equals
  * [[TextAnalysis.bm25Topk]] bitwise. This is what a continuously ingesting
  * retrieval service needs: BM25 serving with O(terms) stat lookups and no
  * per-query corpus stats pass, stats fresh after every micro-batch.
  *
  * State: `lexstats/batch=<id>` — the batch's own vocabulary-sized
  * aggregate, deterministic content. COUNT folding is not idempotent, so
  * replay safety rides the [[StateLog]] discipline: the batch dir's
  * presence short-circuits a replay, compaction's `foldmeta` watermark is
  * written BEFORE the swap, interrupted temp-swaps heal on every access.
  *
  * Per-batch cost: one explode→distinct→groupBy over the BATCH (map-side
  * combined to batch-vocabulary rows before the only exchange) + the
  * commit rename. The log grows by vocabulary-sized dirs; auto-compaction
  * bounds the dir count, and the fold re-sums per term — the standard
  * segment-merge of a lexical index, expressed as one groupBy.
  */
object LexStatsStream {

  private def log(spark: SparkSession, stateDir: String) =
    new StateLog(spark, stateDir, "lexstats")

  private def emptyStats(spark: SparkSession): DataFrame =
    spark.range(0).select(col("id").cast("string").as("term"),
      col("id").as("df"), col("id").as("dl"), col("id").as("nd"))

  /** Accumulated stat rows summed per term — for the union of all folded
    * batches, bit-identical to `TextAnalysis.lexStatsOf` over that union.
    * Vocabulary-sized; serving filters it to the query terms + the corpus
    * row before anything leaves the executors. */
  def currentStats(spark: SparkSession, stateDir: String): DataFrame =
    log(spark, stateDir).read(Seq("term", "df", "dl", "nd"), emptyStats(spark))
      .groupBy("term")
      .agg(sum("df").as("df"), sum("dl").as("dl"), sum("nd").as("nd"))

  /** Highest batch id the last compaction folded (−1 when never). */
  def foldedUpto(spark: SparkSession, stateDir: String): Long =
    log(spark, stateDir).foldedUpto()

  /** Fold one document micro-batch's stats. Returns true when the batch
    * folded, false when the replay guards short-circuited it. */
  def applyBatch(spark: SparkSession, batch: DataFrame, batchId: Long,
                 stateDir: String, autoCompactBatches: Int = 0): Boolean = {
    val lg = log(spark, stateDir)
    if (lg.alreadyApplied(batchId)) return false
    lg.commitBatch(TextAnalysis.lexStatsOf(batch), batchId, coalesce1 = false)
    lg.maybeAutoCompact(autoCompactBatches)(compactState(spark, stateDir))
    true
  }

  /** Fold all batch dirs into one `batch=-1` dir with exact summed stats —
    * the non-idempotent [[StateLog.compact]] discipline (watermark first). */
  def compactState(spark: SparkSession, stateDir: String): Unit =
    log(spark, stateDir).compact(
      _.groupBy("term").agg(sum("df").as("df"), sum("dl").as("dl"),
        sum("nd").as("nd")))

  /** BM25 served from the maintained stats — the per-query read path. */
  def bm25Topk(spark: SparkSession, stateDir: String, docs: DataFrame,
               terms: Seq[String] = TextAnalysis.Bm25Terms,
               k: Int = 20): DataFrame =
    TextAnalysis.bm25TopkServed(docs, currentStats(spark, stateDir), terms, k)

  /** File-source wrapper: document parquet drops → maintained stats under
    * `stateDir`. */
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
