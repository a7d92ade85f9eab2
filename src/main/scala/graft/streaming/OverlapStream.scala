package graft.streaming

import org.apache.spark.sql.{AnalysisException, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import graft.operators.CorpusOverlap

/** Streaming cross-source overlap monitoring: document batches (new crawl
  * drops) fold into per-source MinHash signatures; the pairwise overlap
  * matrix is re-derived per batch from signatures alone — sources × numPerm
  * longs of state, NEVER a corpus rescan. The monitoring shape a curation
  * service wants: "did yesterday's crawl make src7 collapse into src3?"
  * answered continuously at O(batch) cost.
  *
  * Why this streams so cleanly: the elementwise-min signature fold
  * ([[CorpusOverlap.mergeSignatures]]) is associative, commutative, and
  * IDEMPOTENT — any batch arrival order and any replay merge to exactly the
  * whole-corpus signature (OverlapStreamSpec pins stream ≡ batch equality).
  * Contrast with the relabel bookkeeping ComponentsStream needs: min-fold
  * state is self-healing, so there is no compaction debt to manage — though
  * [[compactState]] exists to fold the per-batch dirs once their count (not
  * size) grows, since each batch adds sources × numPerm longs forever.
  *
  * State: `sigs/batch=<id>` — the batch's OWN per-source signatures,
  * idempotent overwrite per batch ([[DecontamStream]] pattern: a replayed
  * batch rewrites deterministic content over itself). Output:
  * `out/batch=<id>` — the estimate matrix as of that batch (monotone
  * estimates: a source pair's signature can only gain shared minima as both
  * sides grow... or diverge as one grows alone; per-batch snapshots keep
  * the trajectory).
  */
object OverlapStream {

  /** Signature state accumulated by batches ≤ `uptoBatch`, merged to one
    * row per source — the bound keeps replays byte-identical even after
    * later batches landed ([[DecontamStream.benchState]] pattern). */
  def mergedState(spark: SparkSession, stateDir: String,
      uptoBatch: Long = Long.MaxValue): DataFrame = {
    val path = s"$stateDir/sigs"
    val empty = spark.range(0)
      .select(col("id").cast("string").as("slice"),
        lit(null).cast("array<bigint>").as("sig"))
    if (!graft.functions.FsUtils.fs(spark, path)
        .exists(new org.apache.hadoop.fs.Path(path))) empty
    else
      try CorpusOverlap.mergeSignatures(
        spark.read.parquet(path).filter(col("batch") <= uptoBatch)
          .select(col("slice"), col("sig")))
      catch {
        case e: AnalysisException
            if e.getMessage.contains("UNABLE_TO_INFER_SCHEMA") => empty
      }
  }

  /** Fold one document micro-batch: write the batch's own signatures, then
    * snapshot the estimate matrix from state ≤ this batch. Idempotent per
    * batchId. */
  def applyBatch(spark: SparkSession, batch: DataFrame, batchId: Long,
      stateDir: String, outDir: String, numPerm: Int = 128,
      stateWriteParts: Int = 1): Unit = {
    CorpusOverlap.sliceSignatures(
        CorpusOverlap.sliceVocab(batch, "text", "source"), numPerm)
      .coalesce(stateWriteParts)
      .write.mode("overwrite").parquet(s"$stateDir/sigs/batch=$batchId")
    spark.catalog.refreshByPath(s"$stateDir/sigs")
    CorpusOverlap.estimateFromSignatures(
        mergedState(spark, stateDir, uptoBatch = batchId), numPerm)
      .coalesce(stateWriteParts)
      .write.mode("overwrite").parquet(s"$outDir/batch=$batchId")
  }

  /** Fold the per-batch signature dirs into one when their COUNT grows
    * (each batch adds sources × numPerm longs — bytes are never the
    * problem, file/dir listing is). The compacted merge lands in
    * `batch=-1`: a dir NO replay can ever target (foreachBatch ids are
    * ≥ 0), so a post-compaction replay of batch b overwrites only its own
    * `batch=b` with content the min-fold has already absorbed — harmless
    * duplication, never state loss. (Writing into `batch=<maxId>` instead
    * would be destroyed by a replay of maxId — Structured Streaming
    * re-executes the last batch after a crash-before-checkpoint as a
    * matter of course.) Crash-safe: the merge (which includes any prior
    * `batch=-1`) is localCheckpointed BEFORE the overwrite so the write
    * never reads its own target, and a crash between write and deletes
    * leaves extra dirs whose re-merge is idempotent (min of mins).
    *
    * Post-compaction caveat: `batch=-1` participates in every
    * `uptoBatch`-bounded read (−1 ≤ everything), so a replayed batch's
    * OUTPUT snapshot reflects the compacted state — a superset of what its
    * first delivery saw — rather than the exact prefix. The merged
    * signature itself is unaffected (idempotent fold); compaction trades
    * prefix-exact replay snapshots for a bounded dir count.
    */
  def compactState(spark: SparkSession, stateDir: String): Unit = {
    val path = s"$stateDir/sigs"
    val fs = graft.functions.FsUtils.fs(spark, path)
    val base = new org.apache.hadoop.fs.Path(path)
    if (!fs.exists(base)) return
    val dirs = fs.listStatus(base).filter(_.isDirectory)
      .map(_.getPath).filter(_.getName.startsWith("batch="))
    if (dirs.length <= 1) return
    val merged = CorpusOverlap.mergeSignatures(
      spark.read.parquet(path).select("slice", "sig")).localCheckpoint()
    merged.coalesce(1).write.mode("overwrite").parquet(s"$path/batch=-1")
    dirs.filter(_.getName != "batch=-1").foreach(fs.delete(_, true))
    spark.catalog.refreshByPath(path)
  }

  /** File-source wrapper: document parquet drops → signature state +
    * per-batch overlap snapshots. */
  def run(spark: SparkSession, inDir: String, stateDir: String, outDir: String,
      checkpointDir: String, schemaFrom: DataFrame,
      numPerm: Int = 128): StreamingQuery =
    spark.readStream
      .schema(schemaFrom.schema)
      .parquet(inDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyBatch(spark, batch, batchId, stateDir, outDir, numPerm)
      }
      .start()
}
