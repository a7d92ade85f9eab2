package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import graft.functions.FsUtils
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
  * Counts are NOT idempotent under re-fold, so this uses the
  * [[SubstringDedupStream]] commit discipline verbatim: the batch dir's
  * presence short-circuits replays; [[compactState]] folds into `batch=-1`
  * behind a `foldmeta` watermark written BEFORE the swap; every public
  * entry point heals interrupted temp-swaps first.
  *
  * Per-batch cost: ONE aggregate over the batch (fixed-size state per
  * column) + one tiny state write — O(batch) regardless of accumulated
  * corpus size; per-batch output snapshots read only the ≤(dirs × cols)
  * state rows.
  */
object ProfileStream {

  private def statsPath(stateDir: String) = s"$stateDir/stats"
  private def foldmetaPath(stateDir: String) = s"$stateDir/foldmeta"

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

  /** Heal interrupted temp-swaps (the package-wide single-writer crash
    * window: delete(dst) happened, rename didn't). */
  private def recoverSwaps(spark: SparkSession, stateDir: String): Unit = {
    val fs = FsUtils.fs(spark, stateDir)
    for (p <- Seq(statsPath(stateDir), foldmetaPath(stateDir))) {
      val out = new org.apache.hadoop.fs.Path(p)
      val tmp = new org.apache.hadoop.fs.Path(p + ".tmp")
      if (!fs.exists(out) && fs.exists(tmp)) FsUtils.renameOrThrow(fs, tmp, out)
    }
  }

  /** Accumulated state rows from batches ≤ `uptoBatch` (plus any folded
    * `batch=-1`, which participates in every bounded read — the documented
    * post-compaction snapshot caveat shared with OverlapStream). */
  def readState(spark: SparkSession, stateDir: String,
                uptoBatch: Long = Long.MaxValue): DataFrame = {
    recoverSwaps(spark, stateDir)
    val path = statsPath(stateDir)
    if (!FsUtils.fs(spark, path).exists(new org.apache.hadoop.fs.Path(path)))
      emptyState(spark)
    else
      try spark.read.parquet(path).filter(col("batch") <= uptoBatch)
        .select("col_name", "n", "n_nonnull", "min_num", "max_num",
          "sum_num", "min_str", "max_str", "ks")
      catch {
        case e: org.apache.spark.sql.AnalysisException
            if e.getMessage.contains("UNABLE_TO_INFER_SCHEMA") => emptyState(spark)
      }
  }

  /** Highest batch id folded into `batch=-1` (−1 when never compacted). */
  def foldedUpto(spark: SparkSession, stateDir: String): Long = {
    recoverSwaps(spark, stateDir)
    val p = foldmetaPath(stateDir)
    if (!FsUtils.fs(spark, p).exists(new org.apache.hadoop.fs.Path(p))) -1L
    else spark.read.parquet(p).agg(max("folded_upto")).head().getLong(0)
  }

  /** Fold one micro-batch: write its per-column state row set (idempotent
    * per batchId), optionally snapshot the as-of profile. Returns false
    * when the replay guards short-circuited. */
  def applyBatch(spark: SparkSession, batch: DataFrame, batchId: Long,
                 stateDir: String, cols: Seq[(String, ColKind)],
                 outDir: Option[String] = None,
                 k: Int = 256, hash: SketchHash = Profile.H60,
                 autoCompactBatches: Int = 0): Boolean = {
    recoverSwaps(spark, stateDir)
    val fs = FsUtils.fs(spark, stateDir)
    val dst = new org.apache.hadoop.fs.Path(s"${statsPath(stateDir)}/batch=$batchId")
    if (fs.exists(dst) || batchId <= foldedUpto(spark, stateDir)) return false
    val own = Profile.profileState(batch, cols, k, hash).localCheckpoint(true)
    outDir.foreach { o =>
      // out/ first: the stats dir below is the commit marker (the
      // SubstringDedupStream ordering) — a crash between the two replays
      // into a deterministic out/ overwrite with state untouched
      Profile.finishProfile(
          readState(spark, stateDir, uptoBatch = batchId).unionByName(own), k, hash)
        .withColumn("batch", lit(batchId))
        .coalesce(1)
        .write.mode("overwrite").parquet(s"$o/batch=$batchId")
    }
    val tmp = new org.apache.hadoop.fs.Path(s"${statsPath(stateDir)}.tmp-batch-$batchId")
    own.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    fs.mkdirs(new org.apache.hadoop.fs.Path(statsPath(stateDir)))
    FsUtils.renameOrThrow(fs, tmp, dst)
    spark.catalog.refreshByPath(statsPath(stateDir))
    org.apache.spark.sql.graft.DatasetInternals.checkpointedRdd(own)
      .foreach(_.unpersist(blocking = false))
    if (autoCompactBatches > 0) {
      val dirs = fs.listStatus(new org.apache.hadoop.fs.Path(statsPath(stateDir)))
        .count(_.getPath.getName.startsWith("batch="))
      if (dirs > autoCompactBatches) compactState(spark, stateDir, k)
    }
    true
  }

  /** The profile of everything folded so far — over the union corpus this
    * is exactly the one-shot [[Profile.profileTheta]] (spec-pinned). */
  def currentProfile(spark: SparkSession, stateDir: String,
                     k: Int = 256, hash: SketchHash = Profile.H60): DataFrame =
    Profile.finishProfile(readState(spark, stateDir), k, hash)

  /** Fold all batch dirs into `batch=-1` via [[Profile.mergeState]] — the
    * non-idempotent-count compaction discipline (watermark BEFORE swap;
    * see SubstringDedupStream for the crash-window argument). */
  def compactState(spark: SparkSession, stateDir: String, k: Int = 256): Unit = {
    recoverSwaps(spark, stateDir)
    val fs = FsUtils.fs(spark, stateDir)
    val sPath = new org.apache.hadoop.fs.Path(statsPath(stateDir))
    if (!fs.exists(sPath)) return
    val maxBatch = fs.listStatus(sPath)
      .map(_.getPath.getName).filter(_.startsWith("batch="))
      .map(_.stripPrefix("batch=").toLong)
      .foldLeft(-1L)(math.max)
    if (maxBatch < 0) return
    val folded = Profile.mergeState(
        spark.read.parquet(sPath.toString)
          .select("col_name", "n", "n_nonnull", "min_num", "max_num",
            "sum_num", "min_str", "max_str", "ks"), k)
      .localCheckpoint(true)
    val metaTmp = new org.apache.hadoop.fs.Path(foldmetaPath(stateDir) + ".tmp")
    val metaOut = new org.apache.hadoop.fs.Path(foldmetaPath(stateDir))
    import spark.implicits._
    Seq(maxBatch).toDF("folded_upto")
      .coalesce(1).write.mode("overwrite").parquet(metaTmp.toString)
    FsUtils.replaceDir(fs, metaTmp, metaOut)
    val tmp = new org.apache.hadoop.fs.Path(statsPath(stateDir) + ".tmp")
    folded.coalesce(1).write.mode("overwrite").parquet(s"$tmp/batch=-1")
    FsUtils.replaceDir(fs, tmp, sPath)
    spark.catalog.refreshByPath(statsPath(stateDir))
    org.apache.spark.sql.graft.DatasetInternals.checkpointedRdd(folded)
      .foreach(_.unpersist(blocking = false))
  }

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
