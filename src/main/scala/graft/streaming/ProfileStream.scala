package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import graft.operators.Profile
import graft.operators.Profile.{ColKind, SketchHash}

/** Continuous data-quality monitoring — the streaming twin of
  * [[graft.operators.Profile.profileTheta]]. Ingest batches fold their
  * per-column profile state (counts, min/max, decimal sums, KMV distinct
  * minima) into an append-only state log; [[currentProfile]] presents the
  * merged state and, over the union of all folded batches, equals the
  * one-shot sketched profile BIT-identically (ProfileStreamSpec): counts
  * and decimal sums are additive, min/max fold, and the union's k smallest
  * distinct hashes are recoverable from per-batch k-minima (the KMV
  * mergeability argument in [[Profile]]).
  *
  * State: `stats/batch=<id>` — one deterministic row per profiled column.
  * Counts are NOT idempotent under re-fold, so this rides the [[StateLog]]
  * commit discipline (batch-dir replay guard, foldmeta watermark BEFORE the
  * compaction swap, temp-swap heal on every entry).
  *
  * Per-batch cost: ONE aggregate over the batch (fixed-size state per
  * column) + one tiny state write — O(batch) regardless of accumulated
  * corpus size; per-batch output snapshots read only the ≤(dirs × cols)
  * state rows.
  */
object ProfileStream {

  private val stateCols = Seq("col_name", "n", "n_nonnull", "min_num",
    "max_num", "sum_num", "min_str", "max_str", "ks")

  private def log(spark: SparkSession, stateDir: String) =
    new StateLog(spark, stateDir, "stats")

  private def emptyState(spark: SparkSession): DataFrame =
    spark.range(0).select(
      col("id").cast("string").as("col_name"),
      col("id").as("n"), col("id").as("n_nonnull"),
      col("id").cast("double").as("min_num"),
      col("id").cast("double").as("max_num"),
      col("id").cast("decimal(28,2)").as("sum_num"),
      col("id").cast("string").as("min_str"),
      col("id").cast("string").as("max_str"),
      array(col("id")).as("ks"))

  /** Accumulated state rows from batches ≤ `uptoBatch` (plus any folded
    * `batch=-1`, which participates in every bounded read — the documented
    * post-compaction snapshot caveat shared with OverlapStream). */
  def readState(spark: SparkSession, stateDir: String,
                uptoBatch: Long = Long.MaxValue): DataFrame =
    log(spark, stateDir).read(stateCols, emptyState(spark), uptoBatch)

  /** Highest batch id folded into `batch=-1` (−1 when never compacted). */
  def foldedUpto(spark: SparkSession, stateDir: String): Long =
    log(spark, stateDir).foldedUpto()

  /** Fold one micro-batch: write its per-column state row set (idempotent
    * per batchId), optionally snapshot the as-of profile. Returns false
    * when the replay guards short-circuited. */
  def applyBatch(spark: SparkSession, batch: DataFrame, batchId: Long,
                 stateDir: String, cols: Seq[(String, ColKind)],
                 outDir: Option[String] = None,
                 k: Int = 256, hash: SketchHash = Profile.H60,
                 autoCompactBatches: Int = 0): Boolean = {
    val lg = log(spark, stateDir)
    if (lg.alreadyApplied(batchId)) return false
    val own = Profile.profileState(batch, cols, k, hash).localCheckpoint(true)
    outDir.foreach { o =>
      // out/ first: the stats dir below is the commit marker (the
      // StateLog ordering) — a crash between the two replays into a
      // deterministic out/ overwrite with state untouched
      Profile.finishProfile(
          readState(spark, stateDir, uptoBatch = batchId).unionByName(own), k, hash)
        .withColumn("batch", lit(batchId))
        .coalesce(1)
        .write.mode("overwrite").parquet(s"$o/batch=$batchId")
    }
    lg.commitBatch(own, batchId)
    StateLog.release(own)
    lg.maybeAutoCompact(autoCompactBatches)(compactState(spark, stateDir, k))
    true
  }

  /** The profile of everything folded so far — over the union corpus this
    * is exactly the one-shot [[Profile.profileTheta]] (spec-pinned). */
  def currentProfile(spark: SparkSession, stateDir: String,
                     k: Int = 256, hash: SketchHash = Profile.H60): DataFrame =
    Profile.finishProfile(readState(spark, stateDir), k, hash)

  /** Fold all batch dirs into `batch=-1` via [[Profile.mergeState]] — the
    * non-idempotent-count compaction discipline (watermark BEFORE swap;
    * see [[StateLog.compact]] for the crash-window argument). */
  def compactState(spark: SparkSession, stateDir: String, k: Int = 256): Unit =
    log(spark, stateDir).compact(raw =>
      Profile.mergeState(raw.select(stateCols.map(col): _*), k))

  /** File-source wrapper: parquet drops → profile state + per-batch
    * as-of profile snapshots. */
  def runFileStream(spark: SparkSession, inDir: String, stateDir: String,
                    outDir: String, checkpointDir: String, schemaFrom: DataFrame,
                    cols: Seq[(String, ColKind)], k: Int = 256,
                    hash: SketchHash = Profile.H60,
                    autoCompactBatches: Int = 16): StreamingQuery =
    spark.readStream
      .schema(schemaFrom.schema)
      .parquet(inDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyBatch(spark, batch, batchId, stateDir, cols, Some(outDir),
          k = k, hash = hash, autoCompactBatches = autoCompactBatches)
        ()
      }
      .start()
}
