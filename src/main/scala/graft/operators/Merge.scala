package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Set-oriented upsert — the reference's per-row
  * `INSERT ... ON CONFLICT (tenant_id, shopify_*_id) DO UPDATE` loop
  * (`services/dataIngestion.js:31-44,50-64`) re-expressed as ONE distributed
  * merge (SURVEY.md §2.1 S4). No Delta/Iceberg jar ships with the image, so
  * this is the parquet-pure pattern: dedup the batch, anti-join the target,
  * union.
  *
  * Scale notes: both sides shuffle once on the natural key (the anti-join);
  * with a bucketed/partitioned target the anti-join co-locates and the
  * rewrite touches only affected partitions. Last-write-wins within a batch
  * is a window dedup, i.e. map-side combinable and skew-tolerant.
  */
object Merge {

  /** Keep exactly one row per key from `batch`, the one with the highest
    * `versionCol`. Mirrors ON CONFLICT last-write-wins applied in batch
    * order (exact-tie picks are arbitrary, as they are in the reference's
    * row loop). Implemented as `max_by` aggregation, not a window: the
    * aggregate partial-combines map-side, so a hot key with millions of
    * duplicate versions shrinks before the shuffle instead of funneling
    * into one window task.
    */
  def latestPerKey(batch: DataFrame, keys: Seq[String], versionCol: String): DataFrame = {
    val valueCols = batch.columns.filterNot(keys.contains)
    batch.groupBy(keys.map(col): _*)
      .agg(max_by(struct(valueCols.map(col): _*), col(versionCol)).as("__best"))
      .select(keys.map(col) ++ valueCols.map(c => col(s"__best.`$c`").as(c)): _*)
  }

  /** Upsert `incoming` into `existing` on `keys`: rows of `existing` whose
    * key appears in `incoming` are replaced; new keys are appended. Both
    * inputs may carry duplicates on the key — `incoming` is deduped to the
    * highest `versionCol` first (ON CONFLICT semantics).
    *
    * Idempotent: upsert(upsert(t, b), b) == upsert(t, b)  (MergeSpec).
    */
  def upsert(existing: DataFrame, incoming: DataFrame,
             keys: Seq[String], versionCol: String): DataFrame = {
    val deduped = latestPerKey(incoming, keys, versionCol)
    val kept = existing.join(deduped.select(keys.map(col): _*), keys, "left_anti")
    kept.unionByName(deduped)
  }
}
