package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import graft.operators.HashedModel

/** Incremental hashed-model training — the streaming twin of
  * [[graft.operators.HashedModel.trainModelStack]]. Document batches fold
  * their (bucket, isBigram) → (raw, target) count partials into an
  * append-only state log; the accumulated sums ARE the one training
  * aggregate of the batch operator (plain long sums: additive, commutative,
  * exact), so [[currentStack]] over the union corpus is BIT-IDENTICAL to
  * one-shot `trainModelStack` — same literal weight maps, same scores
  * (spec-pinned), with no arrival-order caveat. This is what a continuously
  * ingesting curator needs: the fastText-shape filter and the CCNet
  * perplexity model retrained per batch at O(K) state, no corpus rescan.
  *
  * Per-batch output (optional) carries the honest streaming caveat shared
  * by CurationStream/SubstringDedupStream: a batch's docs are scored
  * against the model AS OF their batch (corpus-so-far including the batch).
  * Early docs are scored by an early model — re-read [[currentScores]] for
  * the retroactive whole-corpus answer.
  *
  * State: `counts/batch=<id>` — the batch's own ≤ 2·kLm-row aggregate,
  * deterministic content. COUNT folding is not idempotent, so replay
  * safety rides the [[StateLog]] discipline: the counts dir is the batch's
  * LAST commit (out/ writes first) and its presence short-circuits a
  * replay; compaction's `foldmeta` watermark is written BEFORE the swap;
  * interrupted temp-swaps are healed on every state access.
  *
  * Per-batch cost: one O(batch) explode→hash→groupBy aggregate (map-side
  * combined to ≤ 2·kLm rows before the only exchange) + an O(kLm) driver
  * fold + one narrow scoring pass over the batch. The state log is tiny
  * (≤ 2·kLm rows per dir) — auto-compaction bounds the dir COUNT (listing
  * cost), like EmbeddingIndexStream, not the data volume.
  */
object HashedModelStream {

  private def log(spark: SparkSession, stateDir: String) =
    new StateLog(spark, stateDir, "counts")

  private def emptyCounts(spark: SparkSession): DataFrame =
    spark.range(0).select(col("id").cast("int").as("b"), lit(true).as("bg"),
      col("id").as("nr"), col("id").as("nt"))

  /** All accumulated (b, bg, nr, nt) partials — per-batch dirs plus any
    * folded `batch=-1`; sum per (b, bg) for the training totals. */
  private def readState(spark: SparkSession, stateDir: String): DataFrame =
    log(spark, stateDir).read(Seq("b", "bg", "nr", "nt"), emptyCounts(spark))

  /** Highest batch id the last compaction folded into `batch=-1`
    * (−1 when never compacted). */
  def foldedUpto(spark: SparkSession, stateDir: String): Long =
    log(spark, stateDir).foldedUpto()

  private def summedRows(counts: DataFrame): Seq[(Int, Boolean, Long, Long)] =
    counts.groupBy("b", "bg")
      .agg(sum("nr").as("nr"), sum("nt").as("nt"))
      .collect() // ≤ 2·kLm rows — bounded driver state by construction
      .map(r => (r.getInt(0), r.getBoolean(1), r.getLong(2), r.getLong(3))).toSeq

  /** The whole-corpus-so-far model stack from the accumulated counts —
    * for the union of all folded batches, bit-identical to
    * [[HashedModel.trainModelStack]] over that union. */
  def currentStack(spark: SparkSession, stateDir: String,
                   kCls: Int = 128, kLm: Int = 2048, alpha: Double = 0.5,
                   hashFn: Column => Column = xxhash64(_)) =
    HashedModel.stackFromCounts(summedRows(readState(spark, stateDir)),
      kCls, kLm, alpha, hashFn)

  /** Score any doc frame with a trained stack: the classifier triple and
    * the LM perplexity triple, one narrow fused projection (the
    * [[graft.operators.Curation.modelFilter]] scoring shape). */
  def scoreWith(stack: (HashedModel.ClassifierModel, HashedModel.BigramLm),
                docs: DataFrame): DataFrame = {
    val (cls, lm) = stack
    docs.select(col("doc_id"),
        HashedModel.classifierStruct(cls, col("text")).as("c"),
        HashedModel.perplexityStruct(lm, col("text")).as("p"))
      .select(col("doc_id"),
        col("c.n_feats").as("n_feats"), col("c.logodds").as("logodds"),
        col("c.p_target").as("p_target"),
        col("p.n_bigrams").as("n_bigrams"), col("p.avg_logp").as("avg_logp"),
        col("p.ppl").as("ppl"))
  }

  /** [[scoreWith]] under the CURRENT accumulated model — the retroactive
    * whole-corpus read. */
  def currentScores(spark: SparkSession, stateDir: String, docs: DataFrame,
                    kCls: Int = 128, kLm: Int = 2048, alpha: Double = 0.5,
                    hashFn: Column => Column = xxhash64(_)): DataFrame =
    scoreWith(currentStack(spark, stateDir, kCls, kLm, alpha, hashFn), docs)

  /** PR-curve calibration of the STREAM-trained classifier over a labeled
    * frame ([[graft.operators.HashedModel.calibrationOf]] on the folded
    * stack): because the folded count state yields a bit-identical model
    * to one-shot training, this equals batch calibration exactly
    * (spec-pinned) — the continuously-retraining deployment re-reads its
    * operating point from here after every fold. */
  def currentCalibration(spark: SparkSession, stateDir: String, docs: DataFrame,
                         targetLang: String = "en",
                         kCls: Int = 128, kLm: Int = 2048, alpha: Double = 0.5,
                         hashFn: Column => Column = xxhash64(_)): DataFrame =
    HashedModel.calibrationOf(docs, targetLang,
      currentStack(spark, stateDir, kCls, kLm, alpha, hashFn)._1)

  /** Fold one document micro-batch. Returns true when the batch folded,
    * false when the replay guards short-circuited it. */
  def applyBatch(spark: SparkSession, batch: DataFrame, batchId: Long,
                 stateDir: String, outDir: Option[String] = None,
                 targetLang: String = "en",
                 kCls: Int = 128, kLm: Int = 2048, alpha: Double = 0.5,
                 hashFn: Column => Column = xxhash64(_),
                 autoCompactBatches: Int = 0): Boolean = {
    val lg = log(spark, stateDir)
    if (lg.alreadyApplied(batchId)) return false

    val own = HashedModel.stackCounts(batch, targetLang, kLm, hashFn)
      .localCheckpoint(true) // read for the scoring output AND written as state
    outDir.foreach { o =>
      // out/ first: the counts dir below is the commit marker, so a crash
      // between the two replays into a deterministic out/ overwrite (state
      // unchanged because batch=<id> was never written). Scored against
      // the corpus-so-far INCLUDING this batch: state + own, summed.
      val stack = HashedModel.stackFromCounts(
        summedRows(readState(spark, stateDir).unionByName(own)),
        kCls, kLm, alpha, hashFn)
      scoreWith(stack, batch)
        .withColumn("batch", lit(batchId))
        .coalesce(1)
        .write.mode("overwrite").parquet(s"$o/batch=$batchId")
    }
    lg.commitBatch(own, batchId, coalesce1 = false)
    StateLog.release(own)
    lg.maybeAutoCompact(autoCompactBatches)(compactState(spark, stateDir))
    true
  }

  /** Fold all batch dirs into one `batch=-1` dir with exact summed counts —
    * the non-idempotent [[StateLog.compact]] discipline (watermark first,
    * temp-swapped, then the one-rename dir swap; every crash window either
    * redoes a deterministic fold or is healed on the next state access). */
  def compactState(spark: SparkSession, stateDir: String): Unit =
    log(spark, stateDir).compact(
      _.groupBy("b", "bg").agg(sum("nr").as("nr"), sum("nt").as("nt")))

  /** File-source wrapper: document parquet drops → per-batch scored docs
    * under `outDir`, count state under `stateDir`. */
  def runFileStream(spark: SparkSession, inDir: String, stateDir: String,
                    outDir: String, checkpointDir: String, schemaFrom: DataFrame,
                    autoCompactBatches: Int = 16): StreamingQuery =
    spark.readStream
      .schema(schemaFrom.schema)
      .parquet(inDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyBatch(spark, batch, batchId, stateDir, Some(outDir),
          autoCompactBatches = autoCompactBatches)
        ()
      }
      .start()
}
