package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import graft.operators.Monitor

/** Continuous daily-volume anomaly monitoring — the streaming twin of
  * [[graft.operators.Monitor.dailyAnomalies]]. Per-batch per-day event
  * counts are additive, so the folded state over the union of batches
  * equals the one-shot daily counts EXACTLY; [[currentAnomalies]] then
  * replays the trailing-window z-score finish over the folded O(days)
  * calendar-bounded frame. This is the operator's real deployment: volume
  * anomalies matter the day they happen, not at the next corpus rebuild —
  * and because the z-score window is trailing-EXCLUSIVE, a day's verdict
  * can legitimately firm up as its late events arrive, which the additive
  * fold handles by construction (the count just grows; no per-day
  * first-write-wins hazard).
  *
  * Per-batch cost: one narrow day aggregate whose exchange carries
  * ≤ distinct-days-in-batch partial counts per partition — O(batch), flat
  * state (a 100 TB year is still 365 state rows). Counts are NOT
  * idempotent under re-fold, so this rides the [[StateLog]] commit
  * discipline (batch-dir replay guard, foldmeta watermark BEFORE the
  * compaction swap, temp-swap healing).
  */
object AnomalyStream {

  private def log(spark: SparkSession, stateDir: String) =
    new StateLog(spark, stateDir, "day")

  private def emptyState(spark: SparkSession): DataFrame =
    spark.range(0).select(to_date(lit("2024-01-01")).as("day"),
      col("id").as("n_events"))

  def foldedUpto(spark: SparkSession, stateDir: String): Long =
    log(spark, stateDir).foldedUpto()

  /** Fold one micro-batch of events (idempotent per batchId). Returns
    * false when the replay guards short-circuited. */
  def applyBatch(spark: SparkSession, batch: DataFrame, batchId: Long,
                 stateDir: String,
                 autoCompactBatches: Int = 0): Boolean = {
    val lg = log(spark, stateDir)
    if (lg.alreadyApplied(batchId)) return false
    lg.commitBatch(Monitor.dailyState(batch), batchId)
    lg.maybeAutoCompact(autoCompactBatches)(compactState(spark, stateDir))
    true
  }

  private def readState(spark: SparkSession, stateDir: String): DataFrame =
    log(spark, stateDir).read(Seq("day", "n_events"), emptyState(spark))
      .groupBy("day").agg(sum("n_events").as("n_events"))

  /** z-scored daily volumes over everything folded so far — over the
    * union event log this equals the one-shot [[Monitor.dailyAnomalies]]
    * exactly (AnomalyStreamSpec). */
  def currentAnomalies(spark: SparkSession, stateDir: String,
                       lookback: Int = 7, minWindow: Int = 3,
                       threshold: Double = 2.0): DataFrame =
    Monitor.finishAnomalies(readState(spark, stateDir),
      lookback, minWindow, threshold)

  /** Fold all batch dirs into `batch=-1` by count sum (lossless; watermark
    * BEFORE swap — the [[StateLog.compact]] discipline). */
  def compactState(spark: SparkSession, stateDir: String): Unit =
    log(spark, stateDir).compact(
      _.groupBy("day").agg(sum("n_events").as("n_events")))

  /** File-source wrapper: parquet event drops → folded daily-count state. */
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
