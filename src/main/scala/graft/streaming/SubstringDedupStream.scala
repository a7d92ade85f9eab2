package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
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
  * NOT idempotent, so replay safety rides the [[StateLog]] discipline:
  * the grams dir is the batch's LAST commit (out/ writes first) and its
  * presence short-circuits a replay; compaction's `foldmeta` watermark is
  * written BEFORE the swap so a replay of a folded batch is skipped even
  * though its dir is gone (the OverlapStream `batch=-1` lesson, sharpened
  * for non-idempotent state).
  *
  * Per-batch cost: O(batch) gram aggregate + ONE narrow scan of the state
  * log semi-joined against the batch's (broadcast) gram-hash set — counts
  * are aggregated only for grams the batch actually contains, so the state
  * is never shuffled (the ComponentsStream storedOf pattern). Auto-compact
  * on dir COUNT bounds the log listing, like EmbeddingIndexStream.
  */
object SubstringDedupStream {

  private def log(spark: SparkSession, stateDir: String) =
    new StateLog(spark, stateDir, "grams")

  private def emptyCounts(spark: SparkSession): DataFrame =
    spark.range(0).select(col("id").as("gh"), col("id").as("cnt"))

  /** All accumulated (gh, cnt) rows — per-batch partials plus any folded
    * `batch=-1`; sum per gh for totals. */
  private def readState(spark: SparkSession, stateDir: String): DataFrame =
    log(spark, stateDir).read(Seq("gh", "cnt"), emptyCounts(spark))

  /** Highest batch id the last compaction folded into `batch=-1`
    * (−1 when never compacted). */
  def foldedUpto(spark: SparkSession, stateDir: String): Long =
    log(spark, stateDir).foldedUpto()

  /** Fold one document micro-batch. Returns true when the batch folded,
    * false when the replay guards short-circuited it. */
  def applyBatch(spark: SparkSession, batch: DataFrame, batchId: Long,
                 stateDir: String, outDir: Option[String] = None,
                 L: Int = 5,
                 hashFn: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
                   xxhash64(_),
                 autoCompactBatches: Int = 0): Boolean = {
    val lg = log(spark, stateDir)
    if (lg.alreadyApplied(batchId)) return false

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
    lg.commitBatch(own, batchId, coalesce1 = false)
    StateLog.release(own)
    lg.maybeAutoCompact(autoCompactBatches)(compactState(spark, stateDir))
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

  /** Fold all batch dirs into one `batch=-1` dir with exact summed counts —
    * the non-idempotent [[StateLog.compact]] discipline (watermark BEFORE
    * the one-rename swap; every crash window either redoes a deterministic
    * fold or is healed on the next state access). */
  def compactState(spark: SparkSession, stateDir: String): Unit =
    log(spark, stateDir).compact(
      _.groupBy("gh").agg(sum("cnt").as("cnt")))

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
