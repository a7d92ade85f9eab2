package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import graft.functions.FsUtils
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
  * idempotent under re-fold, so this uses the package commit discipline
  * verbatim (batch-dir replay guard, foldmeta watermark BEFORE the
  * compaction swap, temp-swap healing).
  */
object AnomalyStream {

  private def dayPath(stateDir: String) = s"$stateDir/day"
  private def foldmetaPath(stateDir: String) = s"$stateDir/foldmeta"

  private def emptyState(spark: SparkSession): DataFrame =
    spark.range(0).select(to_date(lit("2024-01-01")).as("day"),
      col("id").as("n_events"))

  private def recoverSwaps(spark: SparkSession, stateDir: String): Unit = {
    val fs = FsUtils.fs(spark, stateDir)
    for (p <- Seq(dayPath(stateDir), foldmetaPath(stateDir))) {
      val out = new org.apache.hadoop.fs.Path(p)
      val tmp = new org.apache.hadoop.fs.Path(p + ".tmp")
      if (!fs.exists(out) && fs.exists(tmp)) FsUtils.renameOrThrow(fs, tmp, out)
    }
  }

  def foldedUpto(spark: SparkSession, stateDir: String): Long = {
    recoverSwaps(spark, stateDir)
    val p = foldmetaPath(stateDir)
    if (!FsUtils.fs(spark, p).exists(new org.apache.hadoop.fs.Path(p))) -1L
    else spark.read.parquet(p).agg(max("folded_upto")).head().getLong(0)
  }

  /** Fold one micro-batch of events (idempotent per batchId). Returns
    * false when the replay guards short-circuited. */
  def applyBatch(spark: SparkSession, batch: DataFrame, batchId: Long,
                 stateDir: String,
                 autoCompactBatches: Int = 0): Boolean = {
    recoverSwaps(spark, stateDir)
    val fs = FsUtils.fs(spark, stateDir)
    val dst = new org.apache.hadoop.fs.Path(s"${dayPath(stateDir)}/batch=$batchId")
    if (fs.exists(dst) || batchId <= foldedUpto(spark, stateDir)) return false
    val own = Monitor.dailyState(batch)
    val tmp = new org.apache.hadoop.fs.Path(s"${dayPath(stateDir)}.tmp-batch-$batchId")
    own.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    fs.mkdirs(new org.apache.hadoop.fs.Path(dayPath(stateDir)))
    FsUtils.renameOrThrow(fs, tmp, dst)
    spark.catalog.refreshByPath(dayPath(stateDir))
    if (autoCompactBatches > 0) {
      val dirs = fs.listStatus(new org.apache.hadoop.fs.Path(dayPath(stateDir)))
        .count(_.getPath.getName.startsWith("batch="))
      if (dirs > autoCompactBatches) compactState(spark, stateDir)
    }
    true
  }

  private def readState(spark: SparkSession, stateDir: String): DataFrame = {
    recoverSwaps(spark, stateDir)
    val path = dayPath(stateDir)
    if (!FsUtils.fs(spark, path).exists(new org.apache.hadoop.fs.Path(path)))
      emptyState(spark)
    else
      try spark.read.parquet(path)
        .groupBy("day").agg(sum("n_events").as("n_events"))
      catch {
        case e: org.apache.spark.sql.AnalysisException
            if e.getMessage.contains("UNABLE_TO_INFER_SCHEMA") => emptyState(spark)
      }
  }

  /** z-scored daily volumes over everything folded so far — over the
    * union event log this equals the one-shot [[Monitor.dailyAnomalies]]
    * exactly (AnomalyStreamSpec). */
  def currentAnomalies(spark: SparkSession, stateDir: String,
                       lookback: Int = 7, minWindow: Int = 3,
                       threshold: Double = 2.0): DataFrame =
    Monitor.finishAnomalies(readState(spark, stateDir),
      lookback, minWindow, threshold)

  /** Fold all batch dirs into `batch=-1` by count sum (lossless; watermark
    * BEFORE swap — the package compaction discipline). */
  def compactState(spark: SparkSession, stateDir: String): Unit = {
    recoverSwaps(spark, stateDir)
    val fs = FsUtils.fs(spark, stateDir)
    val dPath = new org.apache.hadoop.fs.Path(dayPath(stateDir))
    if (!fs.exists(dPath)) return
    val maxBatch = fs.listStatus(dPath)
      .map(_.getPath.getName).filter(_.startsWith("batch="))
      .map(_.stripPrefix("batch=").toLong)
      .foldLeft(-1L)(math.max)
    if (maxBatch < 0) return
    val folded = spark.read.parquet(dPath.toString)
      .groupBy("day").agg(sum("n_events").as("n_events"))
      .localCheckpoint(true)
    val metaTmp = new org.apache.hadoop.fs.Path(foldmetaPath(stateDir) + ".tmp")
    val metaOut = new org.apache.hadoop.fs.Path(foldmetaPath(stateDir))
    import spark.implicits._
    Seq(maxBatch).toDF("folded_upto")
      .coalesce(1).write.mode("overwrite").parquet(metaTmp.toString)
    FsUtils.replaceDir(fs, metaTmp, metaOut)
    val tmp = new org.apache.hadoop.fs.Path(dayPath(stateDir) + ".tmp")
    folded.coalesce(1).write.mode("overwrite").parquet(s"$tmp/batch=-1")
    FsUtils.replaceDir(fs, tmp, dPath)
    spark.catalog.refreshByPath(dayPath(stateDir))
    org.apache.spark.sql.graft.DatasetInternals.checkpointedRdd(folded)
      .foreach(_.unpersist(blocking = false))
  }

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
