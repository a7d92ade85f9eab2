package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import graft.operators.Behavior

/** Continuous cohort-retention monitoring — the streaming twin of
  * [[graft.operators.Behavior.retention]]. Ingest batches fold their
  * distinct (user_id, week) activity pairs into an append-only state log;
  * [[currentRetention]] computes the matrix over the deduplicated log and,
  * over the union of all folded batches, equals the one-shot batch
  * retention EXACTLY (RetentionStreamSpec) — including cohort REVISION: a
  * user's earliest week can arrive in any batch, and cohort = min over the
  * whole folded set, so late history re-ages its cohort instead of
  * corrupting it.
  *
  * Unlike the count-state streams (SubstringDedupStream / ProfileStream /
  * BpeStream), the state here is a SET and set union is idempotent — a
  * replayed batch re-adds pairs the distinct-on-read fold already has, so
  * replays (even replays of batches already compacted into `batch=-1`)
  * are harmless by construction, not by watermark. The batch-dir
  * short-circuit exists purely to skip redundant work, and compaction
  * needs no foldmeta watermark: it is a lossless distinct fold landing in
  * `batch=-1` (never a foreachBatch target — the OverlapStream lesson)
  * behind the [[StateLog]] temp-swap + heal discipline.
  *
  * Per-batch cost: one distinct over the batch + one appended state dir —
  * O(batch) regardless of accumulated corpus size. State size: the
  * corpus's distinct (user, week) pairs — users × calendar weeks at most,
  * the same bound that makes the batch operator's exchange flat
  * (STRESS.md round-14 sweep: 0.0 MB shuffle growth at 64×).
  */
object RetentionStream {

  private def log(spark: SparkSession, stateDir: String) =
    new StateLog(spark, stateDir, "uw")

  private def emptyState(spark: SparkSession): DataFrame =
    spark.range(0).select(col("id").as("user_id"),
      to_date(lit("2024-01-01")).as("wk"))

  /** Deduplicated (user_id, wk) activity pairs folded so far. */
  def readState(spark: SparkSession, stateDir: String): DataFrame =
    log(spark, stateDir).read(Seq("user_id", "wk"), emptyState(spark)).distinct()

  /** Fold one micro-batch of events. Returns false when the batch dir
    * already exists (replay short-circuit — correctness never depends on
    * it; see scaladoc). */
  def applyBatch(spark: SparkSession, batch: DataFrame, batchId: Long,
                 stateDir: String, autoCompactBatches: Int = 0): Boolean = {
    val lg = log(spark, stateDir)
    if (lg.alreadyApplied(batchId)) return false
    val own = batch
      .select(col("user_id"), to_date(date_trunc("week", col("ts"))).as("wk"))
      .distinct()
    lg.commitBatch(own, batchId)
    lg.maybeAutoCompact(autoCompactBatches)(compactState(spark, stateDir))
    true
  }

  /** The retention matrix of everything folded so far — over the union
    * corpus this is exactly the one-shot [[Behavior.retention]]. */
  def currentRetention(spark: SparkSession, stateDir: String): DataFrame =
    Behavior.retentionOfWeeks(readState(spark, stateDir))

  /** Lossless distinct fold of all batch dirs into `batch=-1` behind the
    * [[StateLog]] temp-swap (+ heal on every public read). Idempotent
    * state ⇒ no fold watermark: a replay of an already-folded batch just
    * rewrites pairs the distinct-on-read drops. */
  def compactState(spark: SparkSession, stateDir: String): Unit =
    log(spark, stateDir).compact(
      _.select("user_id", "wk").distinct(), watermark = false)

  /** File-source wrapper: parquet event drops → folded retention state. */
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
