package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bounded-memory all-pairs verification inside LSH buckets — the round-3
  * scale-killer fix. The naive bucket verify collects a whole bucket into ONE
  * aggregation buffer (`collect_list`) and runs its O(|bucket|²) pair
  * triangle in ONE task: a mega-bucket (degenerate corpus, adversarial key)
  * means an unbounded buffer and a straggler task that sinks the stage.
  *
  * Fix: triangle-split. Each bucket of size n is cut into
  * m = ⌈n / cap⌉ hash-cells; the pair triangle {(i,j) : i<j} is covered by
  * sub-tasks keyed (ca, cb), ca ≤ cb < m — the diagonal task (c,c) verifies
  * within-cell pairs, a cross task (a,b) verifies only a×b pairs (the
  * `crossOnly` flag of [[org.apache.spark.sql.graft.CosinePairsBounded]] /
  * [[org.apache.spark.sql.graft.JaccardPairsBounded]] skips within-cell
  * pairs there, so every pair is computed EXACTLY once across sub-tasks).
  * Per-task state is two cells ≈ 2·cap elements regardless of bucket size;
  * the m-way replication cost (each element joins m sub-tasks) only applies
  * to buckets that exceeded the cap — for a normal bucket m = 1 and the plan
  * degenerates to the original single collect_list.
  *
  * Cost note: bounding requires knowing bucket sizes BEFORE grouping. Sizes
  * come from a `count(*) over (partition by bucket)` window — one extra
  * shuffle of the bucketed rows, but the (expensive) upstream that produced
  * them (minhash signatures, hyperplane projections) still runs ONCE (a
  * count-aggregate + self-join would recompute that whole branch). The
  * window buffers one bucket per group and SPILLS (ExternalAppendOnlyUnsafe-
  * RowArray) — disk-bounded, unlike a collect_list buffer; the explicit
  * repartition then spreads a mega-bucket's sub-tasks across the cluster
  * (without it the sub-buckets would aggregate exchange-free inside the one
  * task that owns the bucket, re-concentrating memory and compute).
  * Listing pairs in a degenerate mega-bucket stays inherently O(bucket²) in
  * COMPUTE (it must — the pairs exist), but no longer in per-task memory.
  * The linear-cost production dedup path remains [[Dedup.lshDedupKeep]].
  */
object BucketedPairs {

  /** Group `bucketed` (one row per bucket-element) into bounded sub-buckets.
    *
    * Input: `keyCols` identify the bucket, `idCol` the element (used as the
    * deterministic cell hash), `payloadCol` what the verifier needs.
    * Output: one row per sub-task with `xs` =
    * `array<struct<id, p, cell>>` (≤ ~2·cap elements) and `cross` =
    * whether the sub-task is off-diagonal (verify cross-cell pairs only).
    *
    * Two size-discovery strategies (identical output, different cost shape):
    *  - [[boundedSubBucketsWindow]] (default): `count(*) over (partition by
    *    bucket)` — the upstream that produced the bucketed rows (minhash
    *    signatures, hyperplane projections) runs ONCE; costs one sort+shuffle
    *    of the bucketed rows plus an explicit redistribution. The window
    *    group buffer spills (ExternalAppendOnlyUnsafeRowArray) — disk-
    *    bounded even on a mega-bucket.
    *  - [[boundedSubBucketsCountJoin]]: a narrow count aggregate joined
    *    back. The counts side is O(buckets) tiny rows (AQE broadcasts it),
    *    but referencing `bucketed` twice RECOMPUTES its upstream branch —
    *    only competitive when that branch is a bare scan.
    * Measured at sf0.1 (local[32], 7 reps each) the window variant wins on
    * both registered audit pipelines (emb 0.78s vs 1.08s, minhash 0.54s vs
    * 0.75s median — ProbePerf), and its one-upstream-pass shape is also the
    * right one at 100 TB, so it is the default.
    */
  def boundedSubBuckets(bucketed: DataFrame, keyCols: Seq[String],
                        idCol: Column, payloadCol: Column, cap: Int): DataFrame =
    boundedSubBucketsWindow(bucketed, keyCols, idCol, payloadCol, cap)

  /** See [[boundedSubBuckets]]: narrow count-aggregate + join-back sizing. */
  def boundedSubBucketsCountJoin(bucketed: DataFrame, keyCols: Seq[String],
                                 idCol: Column, payloadCol: Column, cap: Int): DataFrame = {
    require(cap > 0, "cap must be positive")
    val keys = keyCols.map(col)
    // O(buckets) narrow rows; map-side partial agg shrinks the shuffle
    val counts = bucketed.groupBy(keys: _*).agg(count(lit(1)).as("__n"))
    regroup(bucketed.join(counts, keyCols), keys, idCol, payloadCol, cap)
  }

  /** See [[boundedSubBuckets]]: single-pass window-count sizing. */
  def boundedSubBucketsWindow(bucketed: DataFrame, keyCols: Seq[String],
                              idCol: Column, payloadCol: Column, cap: Int): DataFrame = {
    require(cap > 0, "cap must be positive")
    val keys = keyCols.map(col)
    val w = org.apache.spark.sql.expressions.Window.partitionBy(keys: _*)
    regroup(bucketed.withColumn("__n", count(lit(1)).over(w)), keys,
      idCol, payloadCol, cap)
  }

  /** Shared tail: cell assignment, triangle-split explode, sub-task group.
    *
    * The explicit `repartition(subKeys)` is the load-bearing spread: any
    * upstream that is already partitioned by `keys` (the window's exchange,
    * a sort-merge count join) satisfies the groupBy's clustering
    * requirement by the SUBSET rule, so without it every sub-task of a
    * bucket would aggregate exchange-free inside the one bucket-owner task
    * — re-concentrating exactly the memory the split exists to spread. When
    * the upstream is NOT keys-partitioned (broadcast count join), this
    * exchange simply replaces the one the groupBy would have inserted —
    * same shuffle count either way.
    */
  private def regroup(withN: DataFrame, keys: Seq[Column], idCol: Column,
                      payloadCol: Column, cap: Int): DataFrame = {
    val subKeys = keys :+ col("__t.ca").as("__ca") :+ col("__t.cb").as("__cb")
    withN
      .withColumn("__m", ceil(col("__n") / lit(cap.toDouble)).cast("int"))
      .withColumn("__cell", pmod(xxhash64(idCol), col("__m").cast("long")).cast("int"))
      // element with cell c joins sub-tasks (min(c,o), max(c,o)) ∀ o < m:
      // its diagonal plus every cross task that needs its cell
      .select((keys :+ idCol.as("__id") :+ payloadCol.as("__p") :+ col("__cell") :+
        explode(transform(sequence(lit(0), col("__m") - 1),
          o => struct(least(col("__cell"), o).as("ca"),
                      greatest(col("__cell"), o).as("cb")))).as("__t")): _*)
      .repartition(subKeys: _*)
      .groupBy(subKeys: _*)
      .agg(collect_list(struct(col("__id").as("id"), col("__p").as("p"),
        col("__cell").as("cell"))).as("xs"))
      .filter(size(col("xs")) >= 2)
      .withColumn("cross", col("__ca") < col("__cb"))
  }
}
