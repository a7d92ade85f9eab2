package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import graft.operators.Dedup
import graft.functions.TextFunctions._

/** Incremental corpus curation — [[graft.operators.Curation.curate]] as a
  * stateful streaming pass. At 100 TB you cannot re-curate the corpus per
  * delivery; new documents must be judged against compact state, not
  * against the corpus:
  *
  *  - exact dedup state: the set of content hashes ever seen, with the
  *    first (minimum) owning doc id — O(distinct docs) narrow rows;
  *  - near-dup state: per LSH bucket `(band_idx, band_key) → min doc id`
  *    over ALL docs ever seen — O(docs × bands) narrow rows, the SAME
  *    election table the batch [[Dedup.lshDedupKeep]] derives per run.
  *
  * A new doc is kept iff (a) its content hash is unseen, and (b) the
  * minimum over its buckets' (state ∪ batch) elections is its own id, and
  * (c) it passes the stateless quality/language gates. Kept rows append to
  * `outDir`; state merges via groupBy-min (map-side combinable, same
  * hot-bucket posture as the batch path).
  *
  * Consistency contract (CurationStreamSpec): when docs arrive in id order
  * — the backfill/replay case — the accumulated output row set EQUALS the
  * batch `Curation.curate` over the union of all batches. Out-of-order
  * arrival degrades to first-arrival-wins per bucket: the stream may KEEP a
  * doc the batch pass would have dropped (a smaller id arriving later
  * cannot retract an emitted row) but never drops one the batch pass keeps.
  */
object CurationStream {

  private val Bands = 8
  private val NumPerm = 64

  /** Band rows (doc_id, band_idx, band_key) via the SAME
    * [[Dedup.lshBands]] the batch path uses (h60 word-level signatures, 64
    * perms, 8 bands) — the state tables carry the identical narrow long
    * keys the batch election derives per run. */
  private def bandRows(docs: DataFrame): DataFrame =
    Dedup.lshBands(
      Dedup.minhashSignatures(docs, "text", "doc_id",
        numPerm = NumPerm, shingleK = 1, hashFn = graft.functions.Hashing.h60),
      "doc_id", NumPerm, Bands)

  private def readStateOr(spark: SparkSession, path: String, like: DataFrame): DataFrame = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(path), spark.sparkContext.hadoopConfiguration)
    if (fs.exists(new org.apache.hadoop.fs.Path(path))) spark.read.parquet(path)
    else like.limit(0)
  }

  /** Temp-swap overwrite (the state tables are read by the merge that
    * rewrites them — same pattern as the events sink). */
  private def swapWrite(spark: SparkSession, df: DataFrame, path: String): Unit = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(path), spark.sparkContext.hadoopConfiguration)
    val tmp = new org.apache.hadoop.fs.Path(path + ".tmp")
    val out = new org.apache.hadoop.fs.Path(path)
    df.write.mode("overwrite").parquet(tmp.toString)
    fs.delete(out, true)
    fs.rename(tmp, out)
    // the session-shared FileStatusCache still lists the deleted files —
    // the next batch's read would fail with FILE_NOT_EXIST without this
    spark.catalog.refreshByPath(path)
  }

  /** Curate one batch of documents against (and updating) the state under
    * `stateDir`; returns the kept curated rows (same schema as the batch
    * pipeline's output). Driver-visible side effects: `stateDir/hashes`,
    * `stateDir/buckets` rewritten, kept rows appended to `outDir` when set.
    */
  def curateBatch(spark: SparkSession, batch: DataFrame, stateDir: String,
                  outDir: Option[String] = None,
                  minQuality: Double = 0.3, lang: String = "en"): DataFrame = {
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
    val exactKept = batch.join(freshHashes.select("doc_id"), Seq("doc_id"), "left_semi")

    // --- near-dup election against state ∪ batch --------------------------
    val batchBands = bandRows(exactKept)
    val bucketState = readStateOr(spark, bucketsPath,
      batchBands.select(col("band_idx"), col("band_key"), col("doc_id").as("bucket_min")))
    val unioned = batchBands
      .select(col("band_idx"), col("band_key"), col("doc_id").as("bucket_min"))
      .unionByName(bucketState)
    val newMins = unioned.groupBy("band_idx", "band_key")
      .agg(min("bucket_min").as("bucket_min"))
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

    // materialize + cut lineage BEFORE the state swap: the plan reads the
    // pre-swap state files, which the swap below deletes
    val result = curated.localCheckpoint(true)

    // --- state updates (groupBy-min merges, temp-swap writes) -------------
    // both new state tables are checkpointed BEFORE either swap: newMins'
    // lineage reaches the hashes state (via exactKept), which the first
    // swap deletes — writing from lineage would re-read deleted files
    val newHashState = hashState
      .unionByName(freshHashes.select(col("content_hash"), col("doc_id").as("owner_id")))
      .groupBy("content_hash").agg(min("owner_id").as("owner_id"))
      .localCheckpoint(true)
    val newMinsM = newMins.localCheckpoint(true)
    swapWrite(spark, newHashState, hashesPath)
    swapWrite(spark, newMinsM, bucketsPath)

    outDir.foreach(d => result.write.mode("append").parquet(d))
    result
  }

  /** File-source streaming wrapper: document parquet drops in `inDir` →
    * per-micro-batch incremental curation into `outDir` with state under
    * `stateDir`. */
  def runFileStream(spark: SparkSession, inDir: String, stateDir: String,
                    outDir: String, checkpointDir: String,
                    schemaFrom: DataFrame): StreamingQuery =
    spark.readStream
      .schema(schemaFrom.schema)
      .parquet(inDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        curateBatch(spark, batch, stateDir, Some(outDir))
        ()
      }
      .start()
}
