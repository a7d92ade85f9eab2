package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components over the near-duplicate pair graph —
  * the clustering tail of a corpus dedup pass (reference scope: dedup is a
  * charter extension; the pair audits are `Dedup.nearDuplicatePairs` /
  * `simhashNearDupPairs`). The keep-filters (`Dedup.lshDedupKeep` family)
  * are greedy single-pass approximations; TRANSITIVE duplicate clusters
  * ("A~B, B~C ⇒ {A,B,C} even when A≁C directly") need the components of
  * the pair graph, and a 100 TB corpus needs them without ever holding a
  * component on one machine.
  *
  * Algorithm: alternating large-star / small-star (Kiveris, Lattanzi,
  * Mirrokni, Rastogi, Vassilvitskii — "Connected Components in MapReduce
  * and Beyond", SoCC'14). Both steps are plain groupBy-min + join —
  * map-side-combinable aggregates, no windows, no driver-side graph — and
  * the edge set provably converges to star graphs (every node → its
  * component's minimum id) in O(log²·) rounds, in practice 2-4 on dedup
  * graphs (near-cliques). Each round is two narrow shuffles of (long, long)
  * rows; `localCheckpoint` cuts the exponential lineage (on a real cluster
  * with reliable storage, `checkpoint` to the checkpoint dir instead).
  */
object Components {

  /** Connected components of the undirected graph given as a pair list.
    * Returns one row per NON-ROOT node: (id, component) where component is
    * the minimum node id of its component. Roots (component minima) and
    * singletons are absent — callers left-join and `coalesce(component, id)`.
    *
    * Deterministic: the fixpoint is unique (star graphs rooted at component
    * minima) regardless of partitioning or iteration interleaving.
    */
  def connectedComponents(pairs: DataFrame, aCol: String, bCol: String,
                          maxIter: Int = 25,
                          shareExchange: Boolean = true): DataFrame =
    connectedComponentsWithRounds(pairs, aCol, bCol, maxIter, shareExchange)._1

  /** [[connectedComponents]] plus the number of star rounds the call took
    * to converge — returned PER CALL (no shared mutable diagnostic: a
    * JVM-global would race concurrent invocations and report whichever call
    * finished last). Round count is a function of graph STRUCTURE
    * (diameter), not volume: amplifying a corpus k× must not grow it —
    * ScaleBench and ComponentsSpec pin that.
    *
    * @param checkpointEvery materialize (localCheckpoint) the edge set every
    *   k-th round instead of every round. MEASURED-REJECTED lever — keep 1:
    *   un-materialized rounds re-execute under the next action (each action
    *   is a fresh AQE query; shuffle reuse does not cross actions), so k=2
    *   nearly DOUBLES wall-clock at 16M edges (356 vs 185 s; eager-ckpt
    *   form 371 vs 200 s — PLANS.md "CC constant"). Kept as the A/B
    *   harness knob that documents the rejection.
    * @param numPartitions shuffle width for the per-round exchanges; 0 =
    *   session default. MEASURED-REJECTED at local[32]/16M edges: wider
    *   shuffles cost more in task scheduling than the ~800 MB spill they
    *   remove (64 parts +14%, 128 parts +74% wall-clock vs the spilling
    *   32). On a real cluster, size it so edges×16B/parts fits executor
    *   memory — the knob exists for that, not for local mode.
    *
    *   MEMORY FLOOR (measured, local single-JVM): per-round working state is
    *   the doubled edge list in join/aggregate buffers plus the round's
    *   eager checkpoint — ≈ edges × 16 B × ~4 (both directions, build +
    *   probe + cached round) PER CONCURRENTLY-RESIDENT copy, and with 32
    *   concurrent tasks the observed end-to-end floor is ≈ 0.5 GB heap per
    *   1M edges: 16M edges runs in the 8 GB sbt fork, 64M OOMs it in every
    *   width config tried and needs ~32 GB (PLANS.md "CC constant",
    *   round-7 addendum). Size executor memory (or numPartitions, which
    *   divides the per-task share) against that floor before scaling the
    *   edge count. */
  def connectedComponentsWithRounds(pairs: DataFrame, aCol: String, bCol: String,
                                    maxIter: Int = 25,
                                    shareExchange: Boolean = true,
                                    checkpointEvery: Int = 1,
                                    numPartitions: Int = 0): (DataFrame, Int) = {
    // canonical directed form (u, v): u > v, deduped, self-loops dropped.
    // EAGER checkpoint, deliberately: the lazy form (signature aggregate as
    // the materializing action — one job/round instead of two) measured 7%
    // faster at 16M edges but OOMs a 64M-edge run at the default 8g driver
    // in every width config tried — the whole two-star pipeline, the cache
    // write, AND the aggregate peak in ONE job. Measured-REVERTED; the A/B
    // and the OOM evidence are in PLANS.md "CC constant".
    var edges = pairs
      .select(col(aCol).cast("long").as("x"), col(bCol).cast("long").as("y"))
      .filter(col("x") =!= col("y"))
      .select(greatest(col("x"), col("y")).as("u"),
              least(col("x"), col("y")).as("v"))
      .distinct()
      .localCheckpoint()

    // convergence = the edge SET is stable; compare (count, hash-xor)
    // signatures instead of a full except() — one cheap agg over the
    // already-checkpointed frame per round. XOR, not SUM: summing random
    // 64-bit hashes overflows under ANSI mode (Spark 4 default); xor is
    // equally order/partitioning-insensitive and cannot overflow.
    def signature(e: DataFrame): (Long, Long) = {
      val r = e.agg(count(lit(1)),
        coalesce(bit_xor(xxhash64(col("u"), col("v"))), lit(0L))).head()
      (r.getLong(0), r.getLong(1))
    }

    var sig = signature(edges)
    // Self-tuning width (numPartitions = 0): the initial signature already
    // paid for an exact edge count, so derive the per-round shuffle width
    // from it — max(session width, edges / 1M). Below ~32M edges this IS
    // the session default (the measured-fastest config at 16M); above it,
    // the width grows so each task's join/aggregate working set stays
    // bounded: without this, 64M edges OOM a heap that round-6 code
    // survived (the large-star distinct removal moved the un-deduped
    // intermediate out of an exchange and into per-task join state).
    val sessionWidth = pairs.sparkSession.sessionState.conf.numShufflePartitions
    val width =
      if (numPartitions > 0) numPartitions
      else math.max(sessionWidth, (sig._1 / 1000000L).toInt)
    // the newest materialized checkpoint; superseded ones unpersist as soon
    // as a newer one lands (see below)
    var lastCkpt = org.apache.spark.sql.graft.DatasetInternals.checkpointedRdd(edges)
    var it = 0
    var converged = false
    while (!converged && it < maxIter) {
      // shareExchange: repartition on u makes ONE exchange feed dedupe,
      // groupBy-min AND the join-back — HashPartitioning(u) satisfies the
      // distinct's ClusteredDistribution(u, v) (u ⊆ keys) and both star
      // consumers, and ReusedExchange dedupes the two identical branches
      // (the electKeep pattern, Dedup.scala). Trade-off: the groupBy loses
      // its pre-shuffle partial aggregate, but the probe branch ships the
      // full row set over the same keys anyway, so net exchanges per star
      // step drop ~3 → 1. Escape hatch kept for plans where AQE reuse
      // can't fire.
      // un-numbered repartition stays AQE-coalescible (the measured-fastest
      // 16M shape); an explicit width pins the exchange, so only use it
      // when the derived width actually differs from the session default.
      // The width applies on BOTH shareExchange paths: the escape hatch
      // opts out of exchange REUSE, not of OOM sizing — numPartitions (and
      // the self-tuned large-graph width) must hold either way. A
      // numPartitions equal to the session default is indistinguishable
      // from the default and takes the un-numbered branch.
      def keyedOn(df: DataFrame): DataFrame =
        if (width != sessionWidth) df.repartition(width, col("u"))
        else if (shareExchange) df.repartition(col("u"))
        else df
      // large-star: every neighbor v > u links to min(Γ(u) ∪ {u}); each
      // undirected edge is emitted by exactly one of its two directions
      val both = keyedOn(edges.select(col("u"), col("v"))
        .union(edges.select(col("v").as("u"), col("u").as("v"))))
      val nbrMin = both.groupBy("u").agg(min("v").as("mn"))
      // NO distinct here: large-star duplicates ((v, least) emitted via two
      // different u's) are harmless to its consumers — groupBy-min absorbs
      // them and the join-back's extra rows wash out in ss's distinct — so
      // the full dedup aggregate per round bought nothing (same fixpoint,
      // same rounds; the A/B is in PLANS.md "CC constant")
      val ls = keyedOn(both.join(nbrMin, "u")
        .filter(col("v") > col("u"))
        .select(col("v").as("u"), least(col("u"), col("mn")).as("v")))
      // small-star: u and all smaller neighbors link to min(Γ⁻(u) ∪ {u})
      // (= min(Γ⁻(u)) since every v < u); drop the root's self-loop
      val mins = ls.groupBy("u").agg(min("v").as("m"))
      val ssPlan = keyedOn(ls.join(mins, "u")
        .select(col("v"), col("m"))
        .union(mins.select(col("u").as("v"), col("m")))
        .filter(col("v") =!= col("m"))
        .select(col("v").as("u"), col("m").as("v")))
        .distinct()
      val ss = if ((it + 1) % checkpointEvery == 0) ssPlan.localCheckpoint()
               else ssPlan
      val next = signature(ss)
      // a superseded checkpoint's blocks are dead the moment a NEWER one
      // materializes (every later round reads that one) — without this
      // unpersist the block manager holds ALL k rounds' working sets at
      // once and a 64M-edge run OOMs around round 13 regardless of shuffle
      // width (PLANS.md "CC constant" round-7 addendum). Keyed on the
      // newest checkpoint, not the previous frame: with checkpointEvery>1
      // the intermediate plan frames still read the older checkpoint.
      val newCkpt = org.apache.spark.sql.graft.DatasetInternals.checkpointedRdd(ss)
      if (newCkpt.isDefined) {
        lastCkpt.foreach(_.unpersist(blocking = false))
        lastCkpt = newCkpt
      }
      converged = next == sig
      sig = next
      edges = ss
      it += 1
    }
    require(converged, s"connectedComponents: no fixpoint after $maxIter rounds")
    // at the fixpoint every edge is (member, component-min)
    (edges.select(col("u").as("id"), col("v").as("component")), it)
  }

  /** Every node of `nodes` labeled with its duplicate-cluster id: the
    * component minimum for paired nodes, itself for singletons. */
  def componentLabels(nodes: DataFrame, idCol: String,
                      pairs: DataFrame, aCol: String, bCol: String): DataFrame = {
    val labels = connectedComponents(pairs, aCol, bCol)
    nodes.select(col(idCol))
      .join(labels, nodes(idCol) === labels("id"), "left")
      .select(col(idCol),
        coalesce(col("component"), col(idCol)).as("component"))
  }
}
