package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.FsUtils

/** The package-wide parquet state-log commit discipline, extracted from the
  * streams that grew it hand-copied (ProfileStream, SubstringDedupStream,
  * BpeStream, HashedModelStream, HistogramStream, DriftStream,
  * AnomalyStream, QualityStream, RetentionStream — see each stream's
  * scaladoc for the per-operator replay argument). One instance manages one
  * append-only log of per-batch state dirs under `stateDir/logName`:
  *
  *  - `batch=<id>` dirs accumulate one deterministic state write per
  *    micro-batch; the dir's presence is the batch's commit marker, so its
  *    existence short-circuits an at-least-once replay entirely
  *    ([[alreadyApplied]]).
  *  - [[compact]] folds all batch dirs into `batch=-1` — a dir no
  *    foreachBatch id can ever target. For NON-idempotent state (counts),
  *    a `foldmeta` watermark (folded-through batch id) is temp-swapped into
  *    place BEFORE the log swap, so a replay of an already-folded batch is
  *    skipped via the watermark even though its dir is gone; for lossless
  *    idempotent folds the caller disables the watermark.
  *  - every crash window is covered: a crash between the watermark and the
  *    log swap leaves un-folded dirs whose re-fold is deterministic; a
  *    crash INSIDE a temp-swap (after delete(dst), before rename) leaves
  *    `dst.tmp` as the sole copy, and [[recoverSwaps]] — called on entry by
  *    every public reader/writer — completes the rename.
  *
  * Single-writer discipline is the package contract: one driver folds a
  * given `stateDir`, exactly as Structured Streaming runs one foreachBatch
  * at a time per query. Readers on other sessions see either the old or the
  * new state (rename atomicity), never a torn mix.
  */
final class StateLog(
    spark: SparkSession,
    val stateDir: String,
    logName: String,
    sidecarNames: Seq[String] = Nil,
    foldmetaName: String = "foldmeta") {

  val logPath: String = s"$stateDir/$logName"
  // per-log watermark name: two logs sharing one stateDir (LexStatsStream's
  // stats + postings) must not share a fold watermark, or compacting one
  // would mark the other's batches as folded
  private val foldmetaPath: String = s"$stateDir/$foldmetaName"
  private def fs = FsUtils.fs(spark, stateDir)

  def sidecarPath(name: String): String = s"$stateDir/$name"

  /** Heal interrupted temp-swaps for the log, the foldmeta sidecar, and any
    * registered sidecar dirs (the crash window: delete(dst) happened, rename
    * didn't — `dst.tmp` is the sole surviving copy). */
  def recoverSwaps(): Unit =
    StateLog.healSwaps(spark, (logPath +: foldmetaPath +: sidecarNames.map(sidecarPath)): _*)

  /** Highest batch id folded into `batch=-1` (−1 when never compacted). */
  def foldedUpto(): Long = {
    recoverSwaps()
    if (!fs.exists(new Path(foldmetaPath))) -1L
    else spark.read.parquet(foldmetaPath).agg(max("folded_upto")).head().getLong(0)
  }

  /** The replay guard: the batch dir survived a prior delivery, or the
    * batch was already folded into `batch=-1` (watermark). */
  def alreadyApplied(batchId: Long): Boolean = {
    recoverSwaps()
    fs.exists(new Path(s"$logPath/batch=$batchId")) || batchId <= foldedUpto()
  }

  /** Accumulated state rows (batch dirs plus any folded `batch=-1`)
    * projected to `cols`; batches bounded by `uptoBatch` when given (−1
    * participates in every bounded read — the documented post-compaction
    * snapshot caveat). `empty` serves both the missing-dir and the
    * mkdirs'ed-but-nothing-committed crash windows. */
  def read(cols: Seq[String], empty: => DataFrame,
           uptoBatch: Long = Long.MaxValue): DataFrame = {
    recoverSwaps()
    if (!fs.exists(new Path(logPath))) empty
    else
      try {
        val raw = spark.read.parquet(logPath)
        val bounded =
          if (uptoBatch == Long.MaxValue) raw else raw.filter(col("batch") <= uptoBatch)
        bounded.select(cols.map(col): _*)
      } catch {
        case e: org.apache.spark.sql.AnalysisException
            if e.getMessage.contains("UNABLE_TO_INFER_SCHEMA") => empty
      }
  }

  /** The raw accumulated log frame UNPROJECTED (partition `batch` column
    * included, plus whatever data columns the writes carried) — for readers
    * that must branch on column presence (the LexStatsStream src_batch
    * degrade path). Same missing-dir / empty-dir handling as [[read]]. */
  def readAll(empty: => DataFrame): DataFrame = {
    recoverSwaps()
    if (!fs.exists(new Path(logPath))) empty
    else
      try spark.read.parquet(logPath)
      catch {
        case e: org.apache.spark.sql.AnalysisException
            if e.getMessage.contains("UNABLE_TO_INFER_SCHEMA") => empty
      }
  }

  /** Commit one batch's own state rows: write to a batch-scoped temp dir,
    * then rename into `batch=<id>` — the rename IS the batch's commit
    * point, so every preceding step replays deterministically.
    * `partitionByCols` writes the batch dir partitioned (the postings-log
    * shape: readers partition-prune inside every batch dir). */
  def commitBatch(own: DataFrame, batchId: Long, coalesce1: Boolean = true,
                  partitionByCols: Seq[String] = Nil): Unit = {
    val f = fs
    val tmp = new Path(s"$logPath.tmp-batch-$batchId")
    val w = (if (coalesce1) own.coalesce(1) else own).write.mode("overwrite")
    (if (partitionByCols.nonEmpty) w.partitionBy(partitionByCols: _*) else w)
      .parquet(tmp.toString)
    f.mkdirs(new Path(logPath))
    FsUtils.renameOrThrow(f, tmp, new Path(s"$logPath/batch=$batchId"))
    spark.catalog.refreshByPath(logPath)
  }

  /** Number of `batch=*` dirs in the log (the listing-cost metric the
    * auto-compaction trigger bounds). */
  def batchDirCount(): Int = {
    val lp = new Path(logPath)
    if (!fs.exists(lp)) 0
    else fs.listStatus(lp).count(_.getPath.getName.startsWith("batch="))
  }

  /** Highest non-negative batch id present (−1 when only `batch=-1` or
    * nothing is left — nothing to fold). */
  def maxBatchId(): Long = {
    val lp = new Path(logPath)
    if (!fs.exists(lp)) -1L
    else fs.listStatus(lp)
      .map(_.getPath.getName).filter(_.startsWith("batch="))
      .map(_.stripPrefix("batch=").toLong)
      .foldLeft(-1L)(math.max)
  }

  /** Run `doCompact` when the batch-dir count exceeds `limit` (0 = never). */
  def maybeAutoCompact(limit: Int)(doCompact: => Unit): Unit =
    if (limit > 0 && batchDirCount() > limit) doCompact

  /** Fold all batch dirs into one `batch=-1` dir. `fold` maps the raw
    * accumulated log frame (batch partition column included) to the folded
    * rows and MUST be deterministic. Commit order for non-idempotent state
    * (`watermark = true`):
    *  1. foldmeta (folded_upto = max folded id) via temp-swap — from this
    *     instant any replay of a folded batch is skipped;
    *  2. the whole log dir is swapped for {batch=-1} in one rename.
    * A crash between 1 and 2 leaves the un-folded dirs in place — reads
    * still fold to the same state, the watermark is merely early, and the
    * next compaction redoes the (deterministic) fold. Lossless idempotent
    * folds (distinct / min) pass `watermark = false` and rely on `batch=-1`
    * being un-targetable by replays. `skipAboveWatermark` (StateHistoryStream
    * shape) refuses to fold while a batch dir above the given applied
    * watermark exists — folding an uncommitted append would let its replay
    * re-append absorbed rows. */
  /** @param beforeSwap hook invoked with the fully-written tmp dir path
    *   just before the rename — for sidecar files that must travel INSIDE
    *   the same atomic swap as the folded data (e.g. the postings log's
    *   `.bucketmeta`: a bucket count arriving in a separate commit would
    *   open a window where readers prune the new layout with the old
    *   hash — silent misses, not an error). */
  /** @param force run the fold even when only `batch=-1` remains (no new
    *   batch dirs) — for LAYOUT rewrites of already-compacted state (the
    *   postings rebucket); the watermark write is skipped in that case
    *   (nothing new folded, nothing to fence). */
  def compact(fold: DataFrame => DataFrame, coalesce1: Boolean = true,
              watermark: Boolean = true,
              skipAboveWatermark: Option[Long] = None,
              partitionByCols: Seq[String] = Nil,
              beforeSwap: String => Unit = _ => (),
              force: Boolean = false): Unit = {
    recoverSwaps()
    val f = fs
    val lp = new Path(logPath)
    if (!f.exists(lp)) return
    val maxBatch = maxBatchId()
    if (maxBatch < 0 && !force) return
    if (skipAboveWatermark.exists(applied => maxBatch > applied)) return
    val folded = fold(spark.read.parquet(logPath))
      .localCheckpoint(true) // materialize BEFORE the swap deletes sources
    if (watermark && maxBatch >= 0) {
      import spark.implicits._
      StateLog.swapWrite(spark, foldmetaPath, Seq(maxBatch).toDF("folded_upto"))
    }
    val tmp = new Path(logPath + ".tmp")
    val w = (if (coalesce1) folded.coalesce(1) else folded)
      .write.mode("overwrite")
    (if (partitionByCols.nonEmpty) w.partitionBy(partitionByCols: _*) else w)
      .parquet(s"$tmp/batch=-1")
    beforeSwap(tmp.toString)
    FsUtils.replaceDir(f, tmp, lp)
    spark.catalog.refreshByPath(logPath)
    org.apache.spark.sql.graft.DatasetInternals.checkpointedRdd(folded)
      .foreach(_.unpersist(blocking = false))
  }
}

object StateLog {

  /** Complete any interrupted temp-swap at the given paths: `replaceDir`'s
    * crash window between delete(dst) and rename leaves dst missing and
    * `dst.tmp` as the sole surviving copy — without this heal a crash
    * inside a compaction swap would silently zero accumulated state (and an
    * already-committed watermark would suppress the replays that could
    * rebuild it). */
  def healSwaps(spark: SparkSession, paths: String*): Unit =
    paths.foreach { p =>
      val f = FsUtils.fs(spark, p)
      val out = new Path(p)
      val tmp = new Path(p + ".tmp")
      if (!f.exists(out) && f.exists(tmp)) FsUtils.renameOrThrow(f, tmp, out)
    }

  /** Temp-swap a whole dir into place: write `df` to `path.tmp`, then
    * delete-and-rename over `path` — the single-rename MV rewrite every
    * keyed-state stream shares. Crash inside the swap is healed by
    * [[healSwaps]] on the next access. */
  def swapWrite(spark: SparkSession, path: String, df: DataFrame,
                coalesce1: Boolean = true): Unit = {
    val f = FsUtils.fs(spark, path)
    val tmp = new Path(path + ".tmp")
    (if (coalesce1) df.coalesce(1) else df)
      .write.mode("overwrite").parquet(tmp.toString)
    FsUtils.replaceDir(f, tmp, new Path(path))
    spark.catalog.refreshByPath(path)
  }

  /** Unpersist a localCheckpoint'ed frame's backing RDD (the per-batch
    * cached-block hygiene every fold shares). */
  def release(df: DataFrame): Unit =
    org.apache.spark.sql.graft.DatasetInternals.checkpointedRdd(df)
      .foreach(_.unpersist(blocking = false))
}
