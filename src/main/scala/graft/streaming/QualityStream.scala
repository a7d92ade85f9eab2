package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import graft.operators.Quality

/** Continuous data-quality monitoring — the streaming twin of
  * [[graft.operators.Quality.validateTheta]], and how constraint
  * validation actually deploys: the quality report is a dashboard you
  * read CONTINUOUSLY as data arrives, not once per corpus rebuild.
  *
  * Per batch, [[graft.operators.Quality.qualityState]] reduces the batch
  * to one ADDITIVE row per check: violation/row counters (exact sums
  * under any batching) plus, for Unique checks, the KMV θ-sketch retained
  * set — the union of per-batch retained sets IS the retained set of the
  * union (KMV keeps the k smallest distinct hashes), so the folded report
  * equals the one-shot θ-validate over the union corpus BITWISE, not
  * approximately-in-distribution.
  *
  * Contracts (both spec-pinned):
  *  - The CHECK SUITE is code, passed per call like the funnel's stage
  *    definitions — but it must stay FIXED for a state's lifetime
  *    (check_id is positional; editing the list mid-state would misfold).
  *  - RefIntegrity refs must be a FROZEN dimension snapshot (the
  *    DriftStream frozen-grid discipline): per-batch anti-join counts are
  *    additive only against a constant ref side.
  *
  * Counter state is NOT idempotent under re-fold, so this rides the
  * [[StateLog]] commit discipline (batch-dir replay guard, foldmeta
  * watermark BEFORE the compaction swap, temp-swap healing). Per-batch
  * cost: one narrow aggregate pass over the batch; state is O(checks)
  * rows regardless of corpus size.
  */
object QualityStream {

  private val stateCols = Seq("check_id", "n", "viol", "nn", "ks")

  private def log(spark: SparkSession, stateDir: String) =
    new StateLog(spark, stateDir, "st")

  private def emptyState(spark: SparkSession): DataFrame =
    spark.range(0).select(col("id").as("check_id"), col("id").as("n"),
      col("id").as("viol"), col("id").as("nn"),
      array(col("id")).as("ks"))

  def foldedUpto(spark: SparkSession, stateDir: String): Long =
    log(spark, stateDir).foldedUpto()

  /** Fold one micro-batch (idempotent per batchId). Returns false when the
    * replay guards short-circuited. */
  def applyBatch(spark: SparkSession, batch: DataFrame, batchId: Long,
                 stateDir: String, checks: Seq[Quality.Check],
                 refs: Map[String, DataFrame] = Map.empty,
                 thetaK: Int = 1024,
                 autoCompactBatches: Int = 0): Boolean = {
    val lg = log(spark, stateDir)
    if (lg.alreadyApplied(batchId)) return false
    lg.commitBatch(Quality.qualityState(batch, checks, refs, thetaK), batchId)
    lg.maybeAutoCompact(autoCompactBatches)(compactState(spark, stateDir, thetaK))
    true
  }

  private def readState(spark: SparkSession, stateDir: String): DataFrame =
    log(spark, stateDir).read(stateCols, emptyState(spark))

  /** The live quality report over everything folded so far — over the
    * union corpus this equals the one-shot
    * [[graft.operators.Quality.validateTheta]] bitwise (QualityStreamSpec). */
  def currentReport(spark: SparkSession, stateDir: String,
                    checks: Seq[Quality.Check],
                    thetaK: Int = 1024): DataFrame =
    Quality.finishState(readState(spark, stateDir), checks, thetaK)

  /** Fold all batch dirs into `batch=-1` (lossless: counter sums + KMV
    * retained-set union are associative; watermark BEFORE swap — the
    * [[StateLog.compact]] discipline). */
  def compactState(spark: SparkSession, stateDir: String,
                   thetaK: Int = 1024): Unit =
    log(spark, stateDir).compact(raw =>
      Quality.foldState(raw.select(stateCols.map(col): _*), thetaK)
        .select(stateCols.map(col): _*))

  /** File-source wrapper: parquet drops → live constraint report. */
  def runFileStream(spark: SparkSession, inDir: String, stateDir: String,
                    checkpointDir: String, schemaFrom: DataFrame,
                    checks: Seq[Quality.Check],
                    refs: Map[String, DataFrame] = Map.empty,
                    thetaK: Int = 1024,
                    autoCompactBatches: Int = 16): StreamingQuery =
    spark.readStream
      .schema(schemaFrom.schema)
      .parquet(inDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyBatch(spark, batch, batchId, stateDir, checks, refs, thetaK,
          autoCompactBatches = autoCompactBatches)
        ()
      }
      .start()
}
