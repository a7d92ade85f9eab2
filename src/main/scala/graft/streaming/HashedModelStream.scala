package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import graft.functions.FsUtils
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
  * safety uses the [[SubstringDedupStream]] discipline verbatim:
  *  - the counts dir is the batch's LAST commit (out/ writes first): its
  *    presence short-circuits a replay entirely;
  *  - [[compactState]] folds batch dirs into `batch=-1` and records the
  *    folded-through id in a `foldmeta` sidecar WRITTEN BEFORE the swap,
  *    so a replay of an already-folded batch is skipped via the watermark
  *    even though its dir is gone;
  *  - interrupted temp-swaps are healed by [[recoverSwaps]] on every
  *    state access.
  *
  * Per-batch cost: one O(batch) explode→hash→groupBy aggregate (map-side
  * combined to ≤ 2·kLm rows before the only exchange) + an O(kLm) driver
  * fold + one narrow scoring pass over the batch. The state log is tiny
  * (≤ 2·kLm rows per dir) — auto-compaction bounds the dir COUNT (listing
  * cost), like EmbeddingIndexStream, not the data volume.
  */
object HashedModelStream {

  private def countsPath(stateDir: String) = s"$stateDir/counts"
  private def foldmetaPath(stateDir: String) = s"$stateDir/foldmeta"

  private def emptyCounts(spark: SparkSession): DataFrame =
    spark.range(0).select(col("id").cast("int").as("b"), lit(true).as("bg"),
      col("id").as("nr"), col("id").as("nt"))

  /** Complete any interrupted temp-swap — see
    * [[SubstringDedupStream.recoverSwaps]] (same crash window, same heal). */
  private def recoverSwaps(spark: SparkSession, stateDir: String): Unit = {
    val fs = FsUtils.fs(spark, stateDir)
    for (p <- Seq(countsPath(stateDir), foldmetaPath(stateDir))) {
      val out = new org.apache.hadoop.fs.Path(p)
      val tmp = new org.apache.hadoop.fs.Path(p + ".tmp")
      if (!fs.exists(out) && fs.exists(tmp)) FsUtils.renameOrThrow(fs, tmp, out)
    }
  }

  /** All accumulated (b, bg, nr, nt) partials — per-batch dirs plus any
    * folded `batch=-1`; sum per (b, bg) for the training totals. */
  private def readState(spark: SparkSession, stateDir: String): DataFrame = {
    recoverSwaps(spark, stateDir)
    val path = countsPath(stateDir)
    if (!FsUtils.fs(spark, path).exists(new org.apache.hadoop.fs.Path(path)))
      emptyCounts(spark)
    else
      try spark.read.parquet(path).select("b", "bg", "nr", "nt")
      catch { // dir mkdirs'ed but no batch committed yet (crash window)
        case e: org.apache.spark.sql.AnalysisException
            if e.getMessage.contains("UNABLE_TO_INFER_SCHEMA") => emptyCounts(spark)
      }
  }

  /** Highest batch id the last compaction folded into `batch=-1`
    * (−1 when never compacted). */
  def foldedUpto(spark: SparkSession, stateDir: String): Long = {
    recoverSwaps(spark, stateDir)
    val p = foldmetaPath(stateDir)
    if (!FsUtils.fs(spark, p).exists(new org.apache.hadoop.fs.Path(p))) -1L
    else spark.read.parquet(p).agg(max("folded_upto")).head().getLong(0)
  }

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
    recoverSwaps(spark, stateDir)
    val fs = FsUtils.fs(spark, stateDir)
    val dst = new org.apache.hadoop.fs.Path(s"${countsPath(stateDir)}/batch=$batchId")
    if (fs.exists(dst) || batchId <= foldedUpto(spark, stateDir)) return false

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
    val tmp = new org.apache.hadoop.fs.Path(s"${countsPath(stateDir)}.tmp-batch-$batchId")
    own.write.mode("overwrite").parquet(tmp.toString)
    fs.mkdirs(new org.apache.hadoop.fs.Path(countsPath(stateDir)))
    FsUtils.renameOrThrow(fs, tmp, dst)
    spark.catalog.refreshByPath(countsPath(stateDir))
    org.apache.spark.sql.graft.DatasetInternals.checkpointedRdd(own)
      .foreach(_.unpersist(blocking = false))
    if (autoCompactBatches > 0) {
      val dirs = fs.listStatus(new org.apache.hadoop.fs.Path(countsPath(stateDir)))
        .count(_.getPath.getName.startsWith("batch="))
      if (dirs > autoCompactBatches) compactState(spark, stateDir)
    }
    true
  }

  /** Fold all batch dirs into one `batch=-1` dir with exact summed counts.
    * Commit order identical to [[SubstringDedupStream.compactState]] —
    * watermark first (temp-swapped), then the one-rename dir swap; every
    * crash window either redoes a deterministic fold or is healed by
    * [[recoverSwaps]]. */
  def compactState(spark: SparkSession, stateDir: String): Unit = {
    recoverSwaps(spark, stateDir)
    val fs = FsUtils.fs(spark, stateDir)
    val cPath = new org.apache.hadoop.fs.Path(countsPath(stateDir))
    if (!fs.exists(cPath)) return
    val maxBatch = fs.listStatus(cPath)
      .map(_.getPath.getName).filter(_.startsWith("batch="))
      .map(_.stripPrefix("batch=").toLong)
      .foldLeft(-1L)(math.max)
    if (maxBatch < 0) return // only batch=-1 left — nothing to fold
    val folded = spark.read.parquet(cPath.toString)
      .groupBy("b", "bg").agg(sum("nr").as("nr"), sum("nt").as("nt"))
      .localCheckpoint(true) // materialize BEFORE the swap deletes sources
    val metaTmp = new org.apache.hadoop.fs.Path(foldmetaPath(stateDir) + ".tmp")
    val metaOut = new org.apache.hadoop.fs.Path(foldmetaPath(stateDir))
    import spark.implicits._
    Seq(maxBatch).toDF("folded_upto")
      .coalesce(1).write.mode("overwrite").parquet(metaTmp.toString)
    FsUtils.replaceDir(fs, metaTmp, metaOut)
    val tmp = new org.apache.hadoop.fs.Path(countsPath(stateDir) + ".tmp")
    folded.coalesce(1).write.mode("overwrite").parquet(s"$tmp/batch=-1")
    FsUtils.replaceDir(fs, tmp, cPath)
    spark.catalog.refreshByPath(countsPath(stateDir))
    org.apache.spark.sql.graft.DatasetInternals.checkpointedRdd(folded)
      .foreach(_.unpersist(blocking = false))
  }

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
