package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import graft.operators.Dedup
import graft.functions.TextFunctions._
import graft.functions.FsUtils

/** Incremental corpus curation — [[graft.operators.Curation.curate]] as a
  * stateful streaming pass. At 100 TB you cannot re-curate the corpus per
  * delivery; new documents must be judged against compact state, not
  * against the corpus:
  *
  *  - exact dedup state: APPEND-ONLY log of content hashes ever seen with
  *    the first owning doc id — O(batch) rows written per batch;
  *  - near-dup state: APPEND-ONLY log of `(band_idx, band_key, doc_id)`
  *    rows — the election `min(doc_id)` per bucket is computed read-side
  *    over the log restricted (semi-join) to the batch's own bucket keys,
  *    so a batch never shuffles or rewrites the accumulated state. The log
  *    grows O(docs·bands); [[compactState]] folds it to one row per bucket
  *    (run it like any table-maintenance pass — cf.
  *    [[graft.operators.Layout.compactPartitions]]).
  *
  * A new doc is kept iff (a) its content hash is unseen, (b) the minimum
  * over its buckets' (log ∪ batch) elections is its own id, and (c) it
  * passes the stateless quality/language gates.
  *
  * Commit order per batch: curated rows land in `outDir/batch=<id>` via
  * temp-swap FIRST, state appends second. Replay after a crash is safe at
  * every boundary: before the output rename the state is untouched and the
  * batch recomputes identically; after it, the existing `batch=<id>` dir is
  * detected and skipped while the idempotent state appends re-run (an
  * already-appended batch contributes nothing new — its hashes are no
  * longer "fresh"). The one non-ideal window: a crash between the hash
  * append and the bucket append loses the batch's band rows, which can
  * only OVER-keep later near-dups, never drop kept rows.
  *
  * Consistency contract (CurationStreamSpec): when docs arrive in id order
  * — the backfill/replay case — the accumulated output row set EQUALS the
  * batch `Curation.curate` over the union of all batches. Out-of-order
  * arrival degrades to first-arrival-wins: the stream may KEEP a doc the
  * batch pass would have dropped (a smaller id arriving later cannot
  * retract an emitted row), and for EXACT duplicates the first-arrived
  * copy stands in for the batch's min-id copy (same content, possibly a
  * different doc_id). The near-dup stage alone never drops a batch-kept
  * doc under ANY batch split: a doc that is the global minimum of all its
  * buckets is also the minimum among every earlier-or-equal subset.
  */
object CurationStream {

  private val Bands = 8
  private val NumPerm = 64

  /** Band rows (doc_id, band_idx, band_key) via the SAME
    * [[Dedup.lshBands]] the batch path uses (word-level signatures, 64
    * perms, 8 bands) — the state log carries the identical narrow long
    * keys the batch election derives per run. `hashFn` must match the one
    * used to build any pre-existing state (bucket keys are hash-specific).
    */
  private def bandRows(docs: DataFrame,
                       hashFn: org.apache.spark.sql.Column => org.apache.spark.sql.Column): DataFrame =
    Dedup.lshBands(
      Dedup.minhashSignatures(docs, "text", "doc_id",
        numPerm = NumPerm, shingleK = 1, hashFn = hashFn),
      "doc_id", NumPerm, Bands)

  /** Read a state table, recovering a compaction orphan (`path.tmp` left by
    * a crash between [[compactState]]'s delete and rename) first. */
  private def readStateOr(spark: SparkSession, path: String, like: DataFrame): DataFrame = {
    StateLog.healSwaps(spark, path)
    if (FsUtils.fs(spark, path).exists(new org.apache.hadoop.fs.Path(path)))
      spark.read.parquet(path)
    else like.limit(0)
  }

  /** Temp-swap overwrite for [[compactState]] (the compacted table is
    * derived from the files the swap deletes — tmp is written first, while
    * they still exist; [[StateLog.swapWrite]]'s refresh also evicts the
    * session-shared FileStatusCache entries for the deleted files). */
  private def swapWrite(spark: SparkSession, df: DataFrame, path: String): Unit =
    StateLog.swapWrite(spark, path, df, coalesce1 = false)

  /** Curate one batch of documents against (and appending to) the state
    * under `stateDir`; returns the kept curated rows (same schema as the
    * batch pipeline's output). With `outDir` set, rows land in
    * `outDir/batch=<batchId>` idempotently (replays skip an existing dir).
    */
  def curateBatch(spark: SparkSession, batch: DataFrame, stateDir: String,
                  batchId: Long,
                  outDir: Option[String] = None,
                  minQuality: Double = 0.3, lang: String = "en",
                  hashFn: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
                    org.apache.spark.sql.functions.xxhash64(_),
                  autoCompactBytes: Long = 0L): DataFrame = {
    val hashesPath = s"$stateDir/hashes"
    val bucketsPath = s"$stateDir/buckets"

    // --- exact dedup against state + within batch -------------------------
    val withHash = batch.withColumn("content_hash", md5(col("text")))
    val hashState = readStateOr(spark, hashesPath,
      withHash.select(col("content_hash"), col("doc_id").as("owner_id")))
    val batchFirst = withHash.groupBy("content_hash")
      .agg(min("doc_id").as("doc_id"))
    val freshHashes = batchFirst
      .join(hashState.select("content_hash"), Seq("content_hash"), "left_anti")
      .localCheckpoint(true) // referenced by exactKept AND the state append
    val exactKept = batch.join(freshHashes.select("doc_id"), Seq("doc_id"), "left_semi")
      .localCheckpoint(true) // referenced by batchBands AND the gate stage

    // --- near-dup election against (log ∪ batch), batch's buckets only ----
    // pinned: the signature subtree is the batch's dominant cost and is
    // otherwise re-executed for batchKeys, newMins, keepIds AND the append
    val batchBands = bandRows(exactKept, hashFn).localCheckpoint(true)
    val bucketLog = readStateOr(spark, bucketsPath, batchBands)
    val batchKeys = batchBands.select("band_idx", "band_key").distinct()
    val relevantLog = bucketLog.join(batchKeys, Seq("band_idx", "band_key"), "left_semi")
    val newMins = relevantLog.unionByName(batchBands)
      .groupBy("band_idx", "band_key")
      .agg(min("doc_id").as("bucket_min"))
    val keepIds = batchBands.join(newMins, Seq("band_idx", "band_key"))
      .groupBy("doc_id")
      .agg(min("bucket_min").as("rep_id"))
      .filter(col("rep_id") === col("doc_id"))
      .select("doc_id")

    // --- stateless gates + stats (identical to the batch pipeline) --------
    val curated = exactKept
      .join(keepIds, Seq("doc_id"), "left_semi")
      .withColumn("quality", qualityScore(col("text")))
      .withColumn("lang_pred", langIdHeuristic(col("text")))
      .filter(col("quality") >= minQuality && col("lang_pred") === lang)
      .select(
        col("doc_id"),
        col("lang_pred"),
        col("quality"),
        length(col("text")).cast("long").as("char_len"),
        wsTokenCount(col("text")).as("ws_tokens"),
        reTokenCount(col("text")).as("re_tokens"))

    // pin the result before any state mutation (the caller may collect it
    // after the appends; the plan must not see post-batch state)
    val result = curated.localCheckpoint(true)

    // --- commit: output FIRST (idempotent), state appends second ----------
    outDir.foreach { d =>
      val fs = FsUtils.fs(spark, d)
      val dst = new org.apache.hadoop.fs.Path(s"$d/batch=$batchId")
      if (!fs.exists(dst)) {
        val tmp = new org.apache.hadoop.fs.Path(s"$d.tmp-batch-$batchId")
        result.write.mode("overwrite").parquet(tmp.toString)
        fs.mkdirs(new org.apache.hadoop.fs.Path(d))
        FsUtils.renameOrThrow(fs, tmp, dst)
      }
    }
    freshHashes.select(col("content_hash"), col("doc_id").as("owner_id"))
      .write.mode("append").parquet(hashesPath)
    batchBands.write.mode("append").parquet(bucketsPath)

    // retention policy (round 7): the band log otherwise grows every batch
    // until someone remembers to compact. When the log's BYTE size (a
    // driver-side listing, no data read) crosses the threshold, fold it
    // inline. Bytes, not file count: small appends coalesce to one file
    // each (AQE), so a file-count trigger scales with batch CADENCE while
    // the read cost it guards scales with accumulated ROWS — bytes track
    // rows under any file layout (StreamStress measured 1 file/batch at
    // toy batches vs shuffle.partitions-many at production ones).
    // Crash-safe at every point: compaction's temp-swap + the orphan heal
    // in readStateOr cover a crash mid-fold, and a crash BEFORE the fold
    // just leaves the log for the next batch's trigger.
    if (autoCompactBytes > 0 && logBytes(spark, bucketsPath) > autoCompactBytes)
      compactState(spark, stateDir)
    result
  }

  /** Total data-file bytes of a state log — the compaction trigger metric
    * (shared implementation: [[FsUtils.dataBytes]]). */
  private def logBytes(spark: SparkSession, path: String): Long =
    FsUtils.dataBytes(FsUtils.fs(spark, path), new org.apache.hadoop.fs.Path(path))

  /** Fold the append-only state logs: one row per content hash / per
    * bucket. Read cost of [[curateBatch]] grows with the log until this
    * runs; output is byte-equivalent state (CurationStreamSpec). */
  def compactState(spark: SparkSession, stateDir: String): Unit = {
    val hashesPath = s"$stateDir/hashes"
    val bucketsPath = s"$stateDir/buckets"
    val fs = FsUtils.fs(spark, hashesPath)
    if (fs.exists(new org.apache.hadoop.fs.Path(hashesPath)))
      swapWrite(spark,
        spark.read.parquet(hashesPath)
          .groupBy("content_hash").agg(min("owner_id").as("owner_id")),
        hashesPath)
    if (fs.exists(new org.apache.hadoop.fs.Path(bucketsPath)))
      swapWrite(spark,
        spark.read.parquet(bucketsPath)
          .groupBy("band_idx", "band_key").agg(min("doc_id").as("doc_id")),
        bucketsPath)
  }

  /** File-source streaming wrapper: document parquet drops in `inDir` →
    * per-micro-batch incremental curation into `outDir` with state under
    * `stateDir`. */
  def runFileStream(spark: SparkSession, inDir: String, stateDir: String,
                    outDir: String, checkpointDir: String,
                    schemaFrom: DataFrame,
                    hashFn: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
                      org.apache.spark.sql.functions.xxhash64(_),
                    autoCompactBytes: Long = 64L << 20): StreamingQuery =
    spark.readStream
      .schema(schemaFrom.schema)
      .parquet(inDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        curateBatch(spark, batch, stateDir, batchId, Some(outDir), hashFn = hashFn,
          autoCompactBytes = autoCompactBytes)
        ()
      }
      .start()
}
