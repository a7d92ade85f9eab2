package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import graft.functions.FsUtils
import graft.operators.Monitor

/** Continuous per-source drift monitoring — the streaming twin of
  * [[graft.operators.Monitor.sourceDrift]]. Per-batch binned
  * (source, bucket) counts are additive, so the folded state over the
  * union of batches equals the one-shot counts EXACTLY — provided every
  * batch bins into the SAME grid. The grid is therefore elected ONCE at
  * deployment and PERSISTED with the state (the [[HistogramStream]]
  * frozen-grid contract; re-deriving min/max per batch would re-bucket
  * history and break the fold). [[currentDrift]] then runs the PSI finish
  * over the folded ≤ sources×nBuckets matrix — this is the deployment the
  * batch operator approximates: drift is a question you ask CONTINUOUSLY
  * as sources evolve, not once per corpus rebuild.
  *
  * Values drifting OUTSIDE the frozen grid clamp into the edge buckets,
  * and a source doing so diverges from the rest of the corpus in exactly
  * those buckets — the clamp FEEDS the PSI signal rather than hiding it.
  *
  * Per-batch cost: one narrow bucketing pass whose aggregate exchange
  * carries ≤ sources × nBuckets partial counts per partition — O(batch),
  * flat state. Counts are NOT idempotent under re-fold, so this uses the
  * package commit discipline verbatim (batch-dir replay guard, foldmeta
  * watermark BEFORE the compaction swap, temp-swap healing).
  */
object DriftStream {

  private def cntPath(stateDir: String) = s"$stateDir/cnt"
  private def gridPath(stateDir: String) = s"$stateDir/grid"
  private def foldmetaPath(stateDir: String) = s"$stateDir/foldmeta"

  private def emptyState(spark: SparkSession): DataFrame =
    spark.range(0).select(col("id").cast("string").as("source"),
      col("id").as("bucket"), col("id").as("cnt"))

  private def recoverSwaps(spark: SparkSession, stateDir: String): Unit = {
    val fs = FsUtils.fs(spark, stateDir)
    for (p <- Seq(cntPath(stateDir), gridPath(stateDir), foldmetaPath(stateDir))) {
      val out = new org.apache.hadoop.fs.Path(p)
      val tmp = new org.apache.hadoop.fs.Path(p + ".tmp")
      if (!fs.exists(out) && fs.exists(tmp)) FsUtils.renameOrThrow(fs, tmp, out)
    }
  }

  /** Persist the elected grid + column binding (first deployment only — an
    * existing grid is authoritative and silently wins: the fold's
    * correctness depends on every batch using the grid the STATE was built
    * with). Returns the active (valueCol, sourceCol, grid, nBuckets). */
  def ensureGrid(spark: SparkSession, stateDir: String,
                 grid: Option[(Double, Double)], nBuckets: Int,
                 valueCol: String = "n_chars",
                 sourceCol: String = "source"): (String, String, Option[(Double, Double)], Int) = {
    recoverSwaps(spark, stateDir)
    val fs = FsUtils.fs(spark, stateDir)
    val out = new org.apache.hadoop.fs.Path(gridPath(stateDir))
    if (!fs.exists(out)) {
      import spark.implicits._
      val tmp = new org.apache.hadoop.fs.Path(gridPath(stateDir) + ".tmp-init")
      Seq((valueCol, sourceCol, grid.map(_._1), grid.map(_._2), nBuckets))
        .toDF("value_col", "source_col", "mn", "mx", "k")
        .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      fs.mkdirs(out.getParent)
      FsUtils.renameOrThrow(fs, tmp, out)
    }
    activeGrid(spark, stateDir)
  }

  /** The persisted column binding + grid + bucket count. */
  def activeGrid(spark: SparkSession,
                 stateDir: String): (String, String, Option[(Double, Double)], Int) = {
    recoverSwaps(spark, stateDir)
    val r = spark.read.parquet(gridPath(stateDir))
      .select("value_col", "source_col", "mn", "mx", "k").head()
    (r.getString(0), r.getString(1),
      if (r.isNullAt(2)) None else Some((r.getDouble(2), r.getDouble(3))),
      r.getInt(4))
  }

  def foldedUpto(spark: SparkSession, stateDir: String): Long = {
    recoverSwaps(spark, stateDir)
    val p = foldmetaPath(stateDir)
    if (!FsUtils.fs(spark, p).exists(new org.apache.hadoop.fs.Path(p))) -1L
    else spark.read.parquet(p).agg(max("folded_upto")).head().getLong(0)
  }

  /** Fold one micro-batch under the persisted grid (idempotent per
    * batchId). Returns false when the replay guards short-circuited. */
  def applyBatch(spark: SparkSession, batch: DataFrame, batchId: Long,
                 stateDir: String,
                 autoCompactBatches: Int = 0): Boolean = {
    recoverSwaps(spark, stateDir)
    val fs = FsUtils.fs(spark, stateDir)
    val dst = new org.apache.hadoop.fs.Path(s"${cntPath(stateDir)}/batch=$batchId")
    if (fs.exists(dst) || batchId <= foldedUpto(spark, stateDir)) return false
    val (vCol, sCol, grid, k) = activeGrid(spark, stateDir)
    val own = Monitor.driftState(batch, grid, k, vCol, sCol)
    val tmp = new org.apache.hadoop.fs.Path(s"${cntPath(stateDir)}.tmp-batch-$batchId")
    own.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    fs.mkdirs(new org.apache.hadoop.fs.Path(cntPath(stateDir)))
    FsUtils.renameOrThrow(fs, tmp, dst)
    spark.catalog.refreshByPath(cntPath(stateDir))
    if (autoCompactBatches > 0) {
      val dirs = fs.listStatus(new org.apache.hadoop.fs.Path(cntPath(stateDir)))
        .count(_.getPath.getName.startsWith("batch="))
      if (dirs > autoCompactBatches) compactState(spark, stateDir)
    }
    true
  }

  private def readState(spark: SparkSession, stateDir: String): DataFrame = {
    recoverSwaps(spark, stateDir)
    val path = cntPath(stateDir)
    if (!FsUtils.fs(spark, path).exists(new org.apache.hadoop.fs.Path(path)))
      emptyState(spark)
    else
      try spark.read.parquet(path)
        .groupBy("source", "bucket").agg(sum("cnt").as("cnt"))
      catch {
        case e: org.apache.spark.sql.AnalysisException
            if e.getMessage.contains("UNABLE_TO_INFER_SCHEMA") => emptyState(spark)
      }
  }

  /** PSI per source over everything folded so far — over the union corpus
    * (grid fixed to its min/max) this equals the one-shot
    * [[Monitor.sourceDrift]] exactly (DriftStreamSpec). */
  def currentDrift(spark: SparkSession, stateDir: String): DataFrame = {
    val (_, _, _, k) = activeGrid(spark, stateDir)
    Monitor.finishDrift(readState(spark, stateDir), k)
  }

  /** Fold all batch dirs into `batch=-1` by count sum (lossless; watermark
    * BEFORE swap — the package compaction discipline). */
  def compactState(spark: SparkSession, stateDir: String): Unit = {
    recoverSwaps(spark, stateDir)
    val fs = FsUtils.fs(spark, stateDir)
    val cPath = new org.apache.hadoop.fs.Path(cntPath(stateDir))
    if (!fs.exists(cPath)) return
    val maxBatch = fs.listStatus(cPath)
      .map(_.getPath.getName).filter(_.startsWith("batch="))
      .map(_.stripPrefix("batch=").toLong)
      .foldLeft(-1L)(math.max)
    if (maxBatch < 0) return
    val folded = spark.read.parquet(cPath.toString)
      .groupBy("source", "bucket").agg(sum("cnt").as("cnt"))
      .localCheckpoint(true)
    val metaTmp = new org.apache.hadoop.fs.Path(foldmetaPath(stateDir) + ".tmp")
    val metaOut = new org.apache.hadoop.fs.Path(foldmetaPath(stateDir))
    import spark.implicits._
    Seq(maxBatch).toDF("folded_upto")
      .coalesce(1).write.mode("overwrite").parquet(metaTmp.toString)
    FsUtils.replaceDir(fs, metaTmp, metaOut)
    val tmp = new org.apache.hadoop.fs.Path(cntPath(stateDir) + ".tmp")
    folded.coalesce(1).write.mode("overwrite").parquet(s"$tmp/batch=-1")
    FsUtils.replaceDir(fs, tmp, cPath)
    spark.catalog.refreshByPath(cntPath(stateDir))
    org.apache.spark.sql.graft.DatasetInternals.checkpointedRdd(folded)
      .foreach(_.unpersist(blocking = false))
  }

  /** File-source wrapper: parquet document drops → folded drift state. The
    * grid must already be persisted via [[ensureGrid]]. */
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
