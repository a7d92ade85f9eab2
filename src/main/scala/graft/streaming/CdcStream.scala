package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import graft.operators.Prep

/** Incremental content-defined-chunk dedup index — the streaming twin of
  * `cdcChunksFast + groupBy(chunk_hash).count` (the dedup-store view: which
  * chunks recur across the corpus so far). This is how a CDC store actually
  * deploys: chunks accumulate as crawls land, and "is this chunk already
  * stored" is a question asked per INGEST, not per corpus rebuild.
  *
  * Document batches fold their (chunk_hash, cnt) aggregate into a
  * [[StateLog]]; chunk-count accumulation is commutative, so
  * [[currentCounts]] over the union of all folded batches equals the
  * one-shot count over the union EXACTLY, any batching, any arrival order
  * (CdcStreamSpec). [[currentDupChunks]] is the dedup signal (count > 1);
  * [[dedupRatio]] the monitoring scalar (fraction of chunk occurrences
  * that are redundant — what a dedup store would NOT have to write).
  *
  * First stream written ON the extracted [[StateLog]] rather than migrated
  * to it (round 15): the whole commit discipline — batch-dir replay guard,
  * foldmeta watermark before the compaction swap, temp-swap heal — is the
  * helper's contract; this file only owns the chunking and the fold.
  *
  * Per-batch cost: one narrow codegen chunking pass (CdcCuts boundary scan,
  * xxhash64 chunk ids — the production path, 25× the HOF gate form at 64×,
  * STRESS.md) + one map-side-combinable count aggregate + one tiny state
  * write — O(batch) regardless of accumulated corpus size. State: one
  * (hash, cnt) row per distinct chunk, fixed-width, no text retained.
  */
object CdcStream {

  private def log(spark: SparkSession, stateDir: String) =
    new StateLog(spark, stateDir, "chunks")

  private def emptyCounts(spark: SparkSession): DataFrame =
    spark.range(0).select(col("id").as("chunk_hash"), col("id").as("cnt"))

  /** Accumulated (chunk_hash, cnt) partials — batch dirs plus any folded
    * `batch=-1`; summed per hash. */
  def currentCounts(spark: SparkSession, stateDir: String): DataFrame =
    log(spark, stateDir).read(Seq("chunk_hash", "cnt"), emptyCounts(spark))
      .groupBy("chunk_hash").agg(sum("cnt").as("cnt"))

  /** Highest batch id folded into `batch=-1` (−1 when never compacted). */
  def foldedUpto(spark: SparkSession, stateDir: String): Long =
    log(spark, stateDir).foldedUpto()

  /** Fold one document micro-batch (idempotent per batchId). Returns false
    * when the replay guards short-circuited. */
  def applyBatch(spark: SparkSession, batch: DataFrame, batchId: Long,
                 stateDir: String, win: Int = 8, divisor: Int = 64,
                 autoCompactBatches: Int = 0): Boolean = {
    val lg = log(spark, stateDir)
    if (lg.alreadyApplied(batchId)) return false
    val own = Prep.cdcChunksFast(batch, win = win, divisor = divisor)
      .groupBy("chunk_hash").agg(count(lit(1)).as("cnt"))
    lg.commitBatch(own, batchId)
    lg.maybeAutoCompact(autoCompactBatches)(compactState(spark, stateDir))
    true
  }

  /** Chunk hashes seen more than once so far — the dedup-store signal. */
  def currentDupChunks(spark: SparkSession, stateDir: String): DataFrame =
    currentCounts(spark, stateDir).filter(col("cnt") > 1)

  /** Fraction of chunk OCCURRENCES that are redundant copies (a dedup
    * store would keep one per distinct hash): sum(cnt−1) / sum(cnt) over
    * the folded state. One bounded aggregate over the state log. */
  def dedupRatio(spark: SparkSession, stateDir: String): Double = {
    val r = currentCounts(spark, stateDir)
      .agg(sum(col("cnt") - 1).cast("double").as("dup"),
        sum("cnt").cast("double").as("tot")).head()
    if (r.isNullAt(1) || r.getDouble(1) == 0.0) 0.0
    else r.getDouble(0) / r.getDouble(1)
  }

  /** Fold all batch dirs into `batch=-1` by count sum — the non-idempotent
    * [[StateLog.compact]] discipline (watermark BEFORE the swap). */
  def compactState(spark: SparkSession, stateDir: String): Unit =
    log(spark, stateDir).compact(
      _.groupBy("chunk_hash").agg(sum("cnt").as("cnt")))

  /** File-source wrapper: document parquet drops → folded chunk counts. */
  def runFileStream(spark: SparkSession, inDir: String, stateDir: String,
                    checkpointDir: String, schemaFrom: DataFrame,
                    win: Int = 8, divisor: Int = 64,
                    autoCompactBatches: Int = 16): StreamingQuery =
    spark.readStream
      .schema(schemaFrom.schema)
      .parquet(inDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyBatch(spark, batch, batchId, stateDir, win, divisor,
          autoCompactBatches = autoCompactBatches)
        ()
      }
      .start()
}
