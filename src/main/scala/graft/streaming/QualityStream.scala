package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import graft.functions.FsUtils
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
  * Counter state is NOT idempotent under re-fold, so this uses the
  * package commit discipline verbatim (batch-dir replay guard, foldmeta
  * watermark BEFORE the compaction swap, temp-swap healing). Per-batch
  * cost: one narrow aggregate pass over the batch; state is O(checks)
  * rows regardless of corpus size.
  */
object QualityStream {

  private def stPath(stateDir: String) = s"$stateDir/st"
  private def foldmetaPath(stateDir: String) = s"$stateDir/foldmeta"

  private def emptyState(spark: SparkSession): DataFrame =
    spark.range(0).select(col("id").as("check_id"), col("id").as("n"),
      col("id").as("viol"), col("id").as("nn"),
      array(col("id")).as("ks"))

  private def recoverSwaps(spark: SparkSession, stateDir: String): Unit = {
    val fs = FsUtils.fs(spark, stateDir)
    for (p <- Seq(stPath(stateDir), foldmetaPath(stateDir))) {
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

  /** Fold one micro-batch (idempotent per batchId). Returns false when the
    * replay guards short-circuited. */
  def applyBatch(spark: SparkSession, batch: DataFrame, batchId: Long,
                 stateDir: String, checks: Seq[Quality.Check],
                 refs: Map[String, DataFrame] = Map.empty,
                 thetaK: Int = 1024,
                 autoCompactBatches: Int = 0): Boolean = {
    recoverSwaps(spark, stateDir)
    val fs = FsUtils.fs(spark, stateDir)
    val dst = new org.apache.hadoop.fs.Path(s"${stPath(stateDir)}/batch=$batchId")
    if (fs.exists(dst) || batchId <= foldedUpto(spark, stateDir)) return false
    val own = Quality.qualityState(batch, checks, refs, thetaK)
    val tmp = new org.apache.hadoop.fs.Path(s"${stPath(stateDir)}.tmp-batch-$batchId")
    own.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    fs.mkdirs(new org.apache.hadoop.fs.Path(stPath(stateDir)))
    FsUtils.renameOrThrow(fs, tmp, dst)
    spark.catalog.refreshByPath(stPath(stateDir))
    if (autoCompactBatches > 0) {
      val dirs = fs.listStatus(new org.apache.hadoop.fs.Path(stPath(stateDir)))
        .count(_.getPath.getName.startsWith("batch="))
      if (dirs > autoCompactBatches) compactState(spark, stateDir, thetaK)
    }
    true
  }

  private def readState(spark: SparkSession, stateDir: String): DataFrame = {
    recoverSwaps(spark, stateDir)
    val path = stPath(stateDir)
    if (!FsUtils.fs(spark, path).exists(new org.apache.hadoop.fs.Path(path)))
      emptyState(spark)
    else
      try spark.read.parquet(path)
        .select("check_id", "n", "viol", "nn", "ks")
      catch {
        case e: org.apache.spark.sql.AnalysisException
            if e.getMessage.contains("UNABLE_TO_INFER_SCHEMA") => emptyState(spark)
      }
  }

  /** The live quality report over everything folded so far — over the
    * union corpus this equals the one-shot
    * [[graft.operators.Quality.validateTheta]] bitwise (QualityStreamSpec). */
  def currentReport(spark: SparkSession, stateDir: String,
                    checks: Seq[Quality.Check],
                    thetaK: Int = 1024): DataFrame =
    Quality.finishState(readState(spark, stateDir), checks, thetaK)

  /** Fold all batch dirs into `batch=-1` (lossless: counter sums + KMV
    * retained-set union are associative; watermark BEFORE swap — the
    * package compaction discipline). */
  def compactState(spark: SparkSession, stateDir: String,
                   thetaK: Int = 1024): Unit = {
    recoverSwaps(spark, stateDir)
    val fs = FsUtils.fs(spark, stateDir)
    val cPath = new org.apache.hadoop.fs.Path(stPath(stateDir))
    if (!fs.exists(cPath)) return
    val maxBatch = fs.listStatus(cPath)
      .map(_.getPath.getName).filter(_.startsWith("batch="))
      .map(_.stripPrefix("batch=").toLong)
      .foldLeft(-1L)(math.max)
    if (maxBatch < 0) return
    val folded = Quality.foldState(
        spark.read.parquet(cPath.toString)
          .select("check_id", "n", "viol", "nn", "ks"), thetaK)
      .select("check_id", "n", "viol", "nn", "ks")
      .localCheckpoint(true)
    val metaTmp = new org.apache.hadoop.fs.Path(foldmetaPath(stateDir) + ".tmp")
    val metaOut = new org.apache.hadoop.fs.Path(foldmetaPath(stateDir))
    import spark.implicits._
    Seq(maxBatch).toDF("folded_upto")
      .coalesce(1).write.mode("overwrite").parquet(metaTmp.toString)
    FsUtils.replaceDir(fs, metaTmp, metaOut)
    val tmp = new org.apache.hadoop.fs.Path(stPath(stateDir) + ".tmp")
    folded.coalesce(1).write.mode("overwrite").parquet(s"$tmp/batch=-1")
    FsUtils.replaceDir(fs, tmp, cPath)
    spark.catalog.refreshByPath(stPath(stateDir))
    org.apache.spark.sql.graft.DatasetInternals.checkpointedRdd(folded)
      .foreach(_.unpersist(blocking = false))
  }

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
