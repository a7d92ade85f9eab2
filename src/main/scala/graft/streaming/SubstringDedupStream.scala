package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import graft.functions.FsUtils
import graft.operators.SubstringDedup

/** Incremental repeated-substring detection — the streaming twin of
  * [[graft.operators.SubstringDedup.repeatedSpans]]. Document batches fold
  * their L-gram COUNTS into an append-only state log; each batch emits the
  * span report of its OWN docs against the corpus-so-far (its grams
  * included), and [[currentSpans]] re-reports any doc frame against the
  * full accumulated counts — for the union corpus that read is EXACTLY the
  * batch operator's answer (spec-pinned), with no arrival-order caveat:
  * count accumulation is commutative.
  *
  * Per-batch incremental output carries the honest streaming caveat: a doc
  * is scored against the corpus AS OF ITS BATCH — a span whose duplicate
  * arrives later is flagged on the LATER doc only (first-arrival-wins, the
  * CurationStream precedent). Curators re-read [[currentSpans]] when they
  * need the retroactive answer.
  *
  * State: `grams/batch=<id>` — the batch's own (gh, cnt) aggregate,
  * deterministic content. Unlike OverlapStream's min-fold, COUNT folding is
  * NOT idempotent, so replay safety needs the ComponentsStream commit
  * discipline plus a fold watermark:
  *  - the grams dir is the batch's LAST commit (out/ writes first): its
  *    presence short-circuits a replay entirely;
  *  - [[compactState]] folds batch dirs into `batch=-1` (a dir no
  *    foreachBatch id can target) and records the folded-through id in a
  *    `foldmeta` sidecar WRITTEN BEFORE the swap — a replay of a folded
  *    batch is skipped via the watermark even though its dir is gone
  *    (without it the replay would re-append counts the fold already
  *    absorbed: the OverlapStream `batch=-1` lesson, sharpened for
  *    non-idempotent state).
  *
  * Per-batch cost: O(batch) gram aggregate + ONE narrow scan of the state
  * log semi-joined against the batch's (broadcast) gram-hash set — counts
  * are aggregated only for grams the batch actually contains, so the state
  * is never shuffled (the ComponentsStream storedOf pattern). Auto-compact
  * on dir COUNT bounds the log listing, like EmbeddingIndexStream.
  */
object SubstringDedupStream {

  private def gramsPath(stateDir: String) = s"$stateDir/grams"
  private def foldmetaPath(stateDir: String) = s"$stateDir/foldmeta"

  private def emptyCounts(spark: SparkSession): DataFrame =
    spark.range(0).select(col("id").as("gh"), col("id").as("cnt"))

  /** Complete any interrupted temp-swap (the ComponentsStream readStateOr
    * heal, applied to BOTH state tables): `replaceDir`'s crash window
    * between delete(dst) and rename leaves dst missing and `dst.tmp` as
    * the sole surviving copy — without this preamble a crash inside
    * [[compactState]]'s grams swap would silently zero all accumulated
    * counts (and the already-committed watermark would suppress the
    * replays that could rebuild them). Called on entry by every public
    * state reader/writer; single-writer discipline is the package
    * contract, as everywhere in this package. */
  private def recoverSwaps(spark: SparkSession, stateDir: String): Unit = {
    val fs = FsUtils.fs(spark, stateDir)
    for (p <- Seq(gramsPath(stateDir), foldmetaPath(stateDir))) {
      val out = new org.apache.hadoop.fs.Path(p)
      val tmp = new org.apache.hadoop.fs.Path(p + ".tmp")
      if (!fs.exists(out) && fs.exists(tmp)) FsUtils.renameOrThrow(fs, tmp, out)
    }
  }

  /** All accumulated (gh, cnt) rows — per-batch partials plus any folded
    * `batch=-1` dir; sum per gh for totals. */
  private def readState(spark: SparkSession, stateDir: String): DataFrame = {
    recoverSwaps(spark, stateDir)
    val path = gramsPath(stateDir)
    if (!FsUtils.fs(spark, path).exists(new org.apache.hadoop.fs.Path(path)))
      emptyCounts(spark)
    else
      try spark.read.parquet(path).select("gh", "cnt")
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

  /** Fold one document micro-batch. Returns true when the batch folded,
    * false when the replay guards short-circuited it. */
  def applyBatch(spark: SparkSession, batch: DataFrame, batchId: Long,
                 stateDir: String, outDir: Option[String] = None,
                 L: Int = 5,
                 hashFn: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
                   xxhash64(_),
                 autoCompactBatches: Int = 0): Boolean = {
    recoverSwaps(spark, stateDir)
    val fs = FsUtils.fs(spark, stateDir)
    val dst = new org.apache.hadoop.fs.Path(s"${gramsPath(stateDir)}/batch=$batchId")
    if (fs.exists(dst) || batchId <= foldedUpto(spark, stateDir)) return false

    val own = SubstringDedup.gramStream(batch, "text", "doc_id", L, hashFn)
      .groupBy("gh").agg(count(lit(1)).as("cnt"))
      .localCheckpoint(true) // read for the report AND written as state
    // duplicated-against-corpus-so-far: totals computed ONLY for the
    // batch's own gram hashes — the state log is scanned narrowly and
    // semi-joined by the (small, broadcast) batch hash set, never shuffled
    val batchHashes = own.select("gh")
    val totals = readState(spark, stateDir)
      .join(broadcast(batchHashes), Seq("gh"), "left_semi")
      .select(col("gh"), col("cnt"))
      .unionByName(own)
      .groupBy("gh").agg(sum("cnt").as("total"))
    val dup = totals.filter(col("total") > 1).select("gh")
    outDir.foreach { o =>
      // out/ first: the grams dir below is the commit marker, so a crash
      // between the two replays into a deterministic out/ overwrite (state
      // unchanged because batch=<id> was never written)
      SubstringDedup.spansAgainst(batch, dup, "text", "doc_id", L, hashFn,
          "n_dup_spans", "covered_tokens", "dup_ratio")
        .withColumn("batch", lit(batchId))
        .coalesce(1)
        .write.mode("overwrite").parquet(s"$o/batch=$batchId")
    }
    val tmp = new org.apache.hadoop.fs.Path(s"${gramsPath(stateDir)}.tmp-batch-$batchId")
    own.write.mode("overwrite").parquet(tmp.toString)
    fs.mkdirs(new org.apache.hadoop.fs.Path(gramsPath(stateDir)))
    FsUtils.renameOrThrow(fs, tmp, dst)
    spark.catalog.refreshByPath(gramsPath(stateDir))
    org.apache.spark.sql.graft.DatasetInternals.checkpointedRdd(own)
      .foreach(_.unpersist(blocking = false))
    if (autoCompactBatches > 0) {
      val dirs = fs.listStatus(new org.apache.hadoop.fs.Path(gramsPath(stateDir)))
        .count(_.getPath.getName.startsWith("batch="))
      if (dirs > autoCompactBatches) compactState(spark, stateDir)
    }
    true
  }

  /** Span report of ANY doc frame against the CURRENT accumulated counts.
    * Called with the union of all folded docs this equals
    * [[SubstringDedup.repeatedSpans]] over that union exactly. */
  def currentSpans(spark: SparkSession, stateDir: String, docs: DataFrame,
                   L: Int = 5,
                   hashFn: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
                     xxhash64(_)): DataFrame = {
    val dup = readState(spark, stateDir)
      .groupBy("gh").agg(sum("cnt").as("total"))
      .filter(col("total") > 1).select("gh")
    SubstringDedup.spansAgainst(docs, dup, "text", "doc_id", L, hashFn,
      "n_dup_spans", "covered_tokens", "dup_ratio")
  }

  /** Fold all batch dirs into one `batch=-1` dir with exact summed counts.
    * Commit order (crash-safe for NON-idempotent count state):
    *  1. foldmeta (folded_upto = max folded id) via temp-swap — from this
    *     instant any replay of a folded batch is skipped;
    *  2. the whole grams dir is swapped for {batch=-1} in one rename.
    * A crash between 1 and 2 leaves the un-folded dirs in place — reads
    * still sum to the same totals, the watermark is merely early, and the
    * next compaction redoes the (deterministic) fold. A crash INSIDE
    * either swap (after delete, before rename) leaves the `.tmp` dir as
    * the only copy — [[recoverSwaps]] completes the rename on the next
    * state access, so the accumulated counts are never lost. */
  def compactState(spark: SparkSession, stateDir: String): Unit = {
    recoverSwaps(spark, stateDir)
    val fs = FsUtils.fs(spark, stateDir)
    val gPath = new org.apache.hadoop.fs.Path(gramsPath(stateDir))
    if (!fs.exists(gPath)) return
    val maxBatch = fs.listStatus(gPath)
      .map(_.getPath.getName).filter(_.startsWith("batch="))
      .map(_.stripPrefix("batch=").toLong)
      .foldLeft(-1L)(math.max)
    if (maxBatch < 0) return // only batch=-1 left — nothing to fold
    val folded = spark.read.parquet(gPath.toString)
      .groupBy("gh").agg(sum("cnt").as("cnt"))
      .localCheckpoint(true) // materialize BEFORE the swap deletes sources
    val metaTmp = new org.apache.hadoop.fs.Path(foldmetaPath(stateDir) + ".tmp")
    val metaOut = new org.apache.hadoop.fs.Path(foldmetaPath(stateDir))
    import spark.implicits._
    Seq(maxBatch).toDF("folded_upto")
      .coalesce(1).write.mode("overwrite").parquet(metaTmp.toString)
    FsUtils.replaceDir(fs, metaTmp, metaOut)
    val tmp = new org.apache.hadoop.fs.Path(gramsPath(stateDir) + ".tmp")
    folded.coalesce(1).write.mode("overwrite").parquet(s"$tmp/batch=-1")
    FsUtils.replaceDir(fs, tmp, gPath)
    spark.catalog.refreshByPath(gramsPath(stateDir))
    org.apache.spark.sql.graft.DatasetInternals.checkpointedRdd(folded)
      .foreach(_.unpersist(blocking = false))
  }

  /** File-source wrapper: document parquet drops → per-batch incremental
    * span reports under `outDir`, gram-count state under `stateDir`. */
  def runFileStream(spark: SparkSession, inDir: String, stateDir: String,
                    outDir: String, checkpointDir: String, schemaFrom: DataFrame,
                    L: Int = 5, autoCompactBatches: Int = 16): StreamingQuery =
    spark.readStream
      .schema(schemaFrom.schema)
      .parquet(inDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyBatch(spark, batch, batchId, stateDir, Some(outDir),
          L = L, autoCompactBatches = autoCompactBatches)
        ()
      }
      .start()
}
