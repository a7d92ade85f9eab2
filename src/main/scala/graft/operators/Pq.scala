package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.ExprUtils.bindOnce
import graft.functions.VectorFunctions.{cosine, dot}

/** Product quantization (Jégou, Douze, Schmid 2011) for the ANN index: the
  * embedding is split into `m` subvectors, each encoded as its nearest
  * codeword in a per-subspace codebook of ≤ 256 centroids, so a 64-dim
  * float32 vector (256 B) stores as m=8 codes of 8 bits — ONE BIGINT,
  * 32× smaller. This completes the engine's index-compression ladder:
  * exact float (1×) → int8 max-abs ([[Similarity.buildIndexQuantized]],
  * 4×) → PQ (32×). At 100 TB the exact index is tens of TB and even the
  * int8 one strains hot storage; the PQ index of the same corpus is
  * hundreds of GB.
  *
  * Spark-first shape, reusing the IVF machinery wholesale:
  *  - TRAINING ([[trainCodebooks]]): deterministic Lloyd per subspace over
  *    a BOUNDED sample — the sampleN hash-least DISTINCT subvectors (no
  *    RNG, task-retry/rerun stable; the first ks of the sample are the
  *    seeds). ONE bounded action per subspace (TakeOrderedAndProject over
  *    the partial-distinct exchange: partition-local heaps, the driver
  *    merges numPartitions×sampleN rows); the Lloyd iterations then run
  *    driver-side over the O(sampleN·sub) sample in fixed order. This is
  *    the 100 TB posture — every production PQ trainer fits on a bounded
  *    sample; full-corpus k-means per subspace (m×(1+iters) corpus scans)
  *    is the wrong offline plan at any scale. Encoding/assignment stay
  *    full-corpus. Cached per (corpus key, shape) like
  *    [[Similarity.trainedCentroids]].
  *  - ENCODE ([[encodePacked]]): m codegen argmins + bit-packing — a
  *    narrow projection, no shuffle.
  *  - INDEX ([[buildIndexPq]]): same cluster-partitioned layout as every
  *    other IVF index (coarse assignment runs on FULL-precision vectors,
  *    so inverted-list membership is identical to the exact index and
  *    partition pruning serves the same nprobe read).
  *  - QUERY ([[ivfTopKPqRerank]]): partition-pruned PQ read → decode-then-
  *    cosine pool ranking ([[org.apache.spark.sql.graft.PqDecode]]) →
  *    exact rerank of the ≤ poolMult·k pool rows against the exact index
  *    (the [[Similarity.ivfTopKQuantizedRerank]] two-stage shape: exact
  *    scores at PQ read volume). Decode-then-dot is the DEFAULT (PQ's win
  *    here is I/O — 8-byte rows); the classical LUT-ADC scorer
  *    ([[ivfTopKPqRawAdc]], per-query lookup tables on the broadcast probe
  *    side) is the compute-bound alternative: m table reads per candidate
  *    instead of decode + dim-wide cosine.
  *
  * Cosine contract: vectors are unit-normalized BEFORE encoding (cosine is
  * scale-invariant, and codebooks trained on raw magnitudes would spend
  * their 256 cells modeling scale instead of direction). Zero-norm vectors
  * are unindexable for cosine and are excluded at build, matching the
  * "similar to NOTHING" rule everywhere else.
  */
object Pq {

  /** Trained PQ model: `books(s)` = subspace s's codewords flattened
    * (ks·sub doubles, ks ≤ 256 — the shape
    * [[org.apache.spark.sql.graft.PqDecode]] reads). */
  final case class Codebooks(sub: Int, books: Array[Array[Double]]) {
    def m: Int = books.length
    def dim: Int = m * sub
  }

  /** v / ‖v‖ — callers guarantee ‖v‖ > 0. */
  private def unit(v: Column): Column =
    bindOnce(sqrt(dot(v, v))) { n => transform(v, x => x / n) }

  private def nearestCode(sv: Column, book: Array[Array[Double]]): Column = {
    import org.apache.spark.sql.graft.{ColumnBridge, NearestCentroid}
    ColumnBridge.column(NearestCentroid(
      ColumnBridge.expression(sv), book, Array.tabulate(book.length)(identity)))
  }

  /** Deterministic per-subspace codebooks over the UNIT-normalized corpus,
    * trained on the sampleN hash-least distinct subvectors per subspace
    * (sampleN/ks = 64 points per cell at the defaults — the usual
    * Lloyd-fit band). Fewer than `ks` distinct subvectors yields a smaller
    * codebook (degenerate corpora still train); a cell that loses all
    * members keeps its previous codeword (standard empty-cell handling,
    * deterministic).
    */
  def trainCodebooks(embeddings: DataFrame, dim: Int = 64, m: Int = 8,
                     ks: Int = 256, iters: Int = 3,
                     sampleN: Int = 16384): Codebooks = {
    require(dim % m == 0, s"dim $dim not divisible into $m subspaces")
    require(m <= 8 && ks <= 256, "packed codes: ≤ 8 sub-codes of ≤ 8 bits")
    val sub = dim / m
    // cached: sampling runs m bounded actions over this frame — without
    // the cache each one re-reads the corpus and re-runs the zero-norm
    // filter + normalization (m redundant full scans)
    val vn = embeddings.select(col("embedding").cast("array<double>").as("v"))
      .filter(dot(col("v"), col("v")) > 0.0)
      .select(unit(col("v")).as("vn"))
      .cache()
    try trainFromNormalized(vn, m, sub, ks, iters, sampleN)
    finally { vn.unpersist(blocking = false); () }
  }

  private def trainFromNormalized(vn: DataFrame, m: Int, sub: Int,
                                  ks: Int, iters: Int, sampleN: Int): Codebooks = {
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration.Duration
    // a DEDICATED pool for the m blocking collect() actions: parking m
    // threads on the shared global pool could starve unrelated library
    // code in the same JVM (the classic blocking-on-global smell)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.min(m, Runtime.getRuntime.availableProcessors.max(1)))
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutorService(pool)
    val n = math.max(sampleN, ks)
    // one independent bounded job + local Lloyd per subspace; subspaces run
    // concurrently (Spark actions are thread-safe, each future fills its
    // own slot, each book is internally deterministic)
    val books = try Await.result(Future.sequence((0 until m).map { s => Future {
      val sv = vn.select(slice(col("vn"), s * sub + 1, sub).as("sv"))
      // sample: the n hash-least DISTINCT subvectors — deterministic under
      // any partitioning (secondary sort on the array breaks the
      // negligible hash-collision tie deterministically too), and a
      // TakeOrderedAndProject over the partial-distinct exchange: the
      // shuffle carries only per-partition-distinct rows, the sort is
      // partition-local top-n heaps. The first ks of the sample are
      // exactly the seeds the full-corpus trainer used.
      val sample: Array[Array[Double]] = sv.distinct()
        .orderBy(xxhash64(col("sv")), col("sv")).limit(n)
        .collect().map(_.getSeq[Double](0).toArray)
      lloydLocal(sample, sample.take(ks).map(_.clone()), iters).flatten
    }}), Duration.Inf).toArray
    finally pool.shutdown()
    Codebooks(sub, books)
  }

  /** Driver-side Lloyd over the bounded sample: fixed iteration order makes
    * plain double sums partition-independent (the distributed trainer
    * needed a decimal dance for the same guarantee), so the codebook is a
    * pure function of the sample. Ties assign to the LOWEST codeword index
    * — the [[org.apache.spark.sql.graft.NearestCentroid]] contract the
    * encode path and PqSpec's roundtrip recompute both use. */
  private def lloydLocal(sample: Array[Array[Double]],
                         seeds: Array[Array[Double]],
                         iters: Int): Array[Array[Double]] = {
    val sub = if (sample.isEmpty) 0 else sample(0).length
    var cents = seeds
    for (_ <- 1 to iters) {
      val k = cents.length
      val sums = Array.ofDim[Double](k, sub)
      val counts = new Array[Long](k)
      var i = 0
      while (i < sample.length) {
        val p = sample(i)
        var best = 0
        var bestD = Double.PositiveInfinity
        var j = 0
        while (j < k) {
          val c = cents(j)
          var d = 0.0
          var t = 0
          while (t < sub) { val diff = c(t) - p(t); d += diff * diff; t += 1 }
          if (d < bestD) { bestD = d; best = j }
          j += 1
        }
        val srow = sums(best)
        var t = 0
        while (t < sub) { srow(t) += p(t); t += 1 }
        counts(best) += 1
        i += 1
      }
      cents = Array.tabulate(k) { j =>
        if (counts(j) == 0L) cents(j)
        else {
          val c = new Array[Double](sub)
          var t = 0
          while (t < sub) { c(t) = sums(j)(t) / counts(j); t += 1 }
          c
        }
      }
    }
    cents
  }

  /** Session cache: train once per (corpus key, shape), reuse across
    * queries — the offline-training production shape. */
  private val bookCache =
    new scala.collection.concurrent.TrieMap[(String, Int, Int, Int, Int, Int), Codebooks]
  def trainedCodebooks(embeddings: DataFrame, cacheKey: String, dim: Int = 64,
                       m: Int = 8, ks: Int = 256, iters: Int = 3,
                       sampleN: Int = 16384): Codebooks =
    bookCache.getOrElseUpdate((cacheKey, dim, m, ks, iters, sampleN),
      trainCodebooks(embeddings, dim, m, ks, iters, sampleN))

  /** Drop the session caches (Bench fresh-cost mode) — next call retrains. */
  def clearSessionCache(): Unit = { bookCache.clear(); residualCache.clear() }

  /** Pack a unit vector's m sub-codes into one BIGINT (sub-code s in bits
    * [8s, 8s+8)). m codegen argmins + shifts — narrow, no shuffle. */
  def encodePacked(vn: Column, cb: Codebooks): Column =
    cb.books.indices.map { s =>
      val book = cb.books(s).grouped(cb.sub).toArray
      shiftleft(nearestCode(slice(vn, s * cb.sub + 1, cb.sub), book).cast("long"),
        8 * s)
    }.reduce(_ + _) // disjoint bit ranges: + ≡ bitwise OR

  /** Decode a packed code column back to its codeword vector. */
  def decodePacked(code: Column, cb: Codebooks): Column = {
    import org.apache.spark.sql.graft.{ColumnBridge, PqDecode}
    ColumnBridge.column(PqDecode(ColumnBridge.expression(code), cb.books, cb.sub))
  }

  /** Persist a trained model — m tiny rows of (subspace, sub, flat
    * codewords) — so streams and queries never retrain (the
    * [[Similarity.saveCentroids]] contract). */
  def saveCodebooks(spark: SparkSession, cb: Codebooks, path: String): Unit = {
    import spark.implicits._
    cb.books.zipWithIndex.map { case (flat, s) => (s, cb.sub, flat.toSeq) }
      .toSeq.toDF("subspace", "sub", "flat")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  def loadCodebooks(spark: SparkSession, path: String): Codebooks = {
    val rows = spark.read.parquet(path).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Double](2).toArray))
      .sortBy(_._1)
    require(rows.nonEmpty,
      s"no PQ codebooks at $path — run saveCodebooks before starting readers")
    Codebooks(rows.head._2, rows.map(_._3))
  }

  /** The PQ index row shape from an assigned full-precision frame — shared
    * by [[buildIndexPq]], [[appendAssignedPq]] and the streaming
    * triple-write ([[graft.streaming.EmbeddingIndexStream]]) so every path
    * produces byte-identical codes. Zero-norm vectors excluded
    * (unindexable for cosine). */
  private[graft] def pqFromAssigned(assigned: DataFrame, cb: Codebooks): DataFrame =
    assigned
      .filter(dot(col("v"), col("v")) > 0.0)
      .withColumn("code", encodePacked(unit(col("v")), cb))
      .select(col("vec_id"), col("code"), col("cluster"))

  /** Cluster-partitioned PQ index: (vec_id, code BIGINT) per inverted
    * list. Coarse assignment on FULL-precision vectors (list membership ≡
    * exact index). `encodedGen` stamps the dir with the quantizer
    * generation the codes encode against ([[IndexGen]] — pass
    * `IndexGen.quantizerGen(exactDir)` when rebuilding after a recluster;
    * the default 0 is the never-reclustered state). */
  def buildIndexPq(embeddings: DataFrame, cents: Seq[(Int, Seq[Double])],
                   cb: Codebooks, path: String, encodedGen: Long = 0L): Unit = {
    pqFromAssigned(Similarity.assign(embeddings, cents), cb)
      .repartition(col("cluster"))
      .write.mode("overwrite").partitionBy("cluster").parquet(path)
    // stamp AFTER the write: the overwrite deletes the dir (marker
    // included), and a crash before this line reads as gen 0 — fail-closed
    IndexGen.setEncodedGen(embeddings.sparkSession, path, encodedGen)
  }

  /** Incremental maintenance — [[Similarity.appendAssignedQuantized]]'s
    * twin for PQ layouts: assign the batch's full-precision vectors
    * against the persisted coarse quantizer, encode against the persisted
    * codebooks, append to the inverted-list table. O(batch) per batch; the
    * codebooks are never retrained online (re-train offline when drift
    * warrants, then rebuild — same contract as the coarse quantizer).
    */
  def appendAssignedPq(newEmbeddings: DataFrame, cents: Seq[(Int, Seq[Double])],
                       cb: Codebooks, indexPath: String): Unit =
    pqFromAssigned(Similarity.assign(newEmbeddings, cents), cb)
      .repartition(col("cluster")) // one file per touched cluster per batch
      .write.mode("append").partitionBy("cluster").parquet(indexPath)

  /** Candidate scoping for the quantized-tier reads (round 17): the
    * filter/delete composition the exact tier already has
    * ([[Similarity.ivfTopKFiltered]], tombstone anti-joins) applied to the
    * PQ/ADC/residual candidate reads — WITHOUT it, a tombstoned vector
    * stays retrievable through the compressed tiers, and a metadata filter
    * can only compose with the exact tier.
    *
    * All three scoping steps sit on the candidate side after partition
    * pruning and BELOW the per-probe top-k window, so k fills from the
    * eligible pool (score-then-filter UNDER-fills k whenever the global
    * top-k contains an excluded id — the classic filtered-ANN bug, and the
    * same pin the exact tier carries).
    *
    * @param allowed  keep only these ids (first column, metadata filter) —
    *                 broadcast or shuffled semi-join, Catalyst's choice
    * @param excluded drop these ids outright (ceiling-less tombstone set)
    *                 — anti-join
    * @param excludedCeilings drop GENERATIONS hidden by batch-ceiling
    *                 tombstones: a (vec_id, ts_batch) frame; candidate
    *                 rows survive when un-tombstoned or ingested after
    *                 the ceiling (`src_batch > ts_batch` — requires the
    *                 streamed layout's src_batch column). The in-place
    *                 update path ([[graft.streaming.EmbeddingIndexStream
    *                 .syncWithCorpus]]) hides superseded code generations
    *                 through exactly this scope.
    * @param dedupIds resolve duplicate rows per vec_id first — on a
    *                 src_batch-carrying layout, LAST-WRITER-WINS (a
    *                 re-ingested id serves its newest generation); else
    *                 dropDuplicates. Either way the streamed-index
    *                 compaction crash window (swap done, source-dir
    *                 deletes pending) cannot give one vector two k slots
    */
  final case class CandidateScope(allowed: Option[DataFrame] = None,
                                  excluded: Option[DataFrame] = None,
                                  dedupIds: Boolean = false,
                                  excludedCeilings: Option[DataFrame] = None)

  private def idCol(df: DataFrame): DataFrame =
    df.select(col(df.columns.head).cast("long").as("vec_id")).distinct()

  private[graft] def applyScope(cands: DataFrame, scope: CandidateScope): DataFrame = {
    var out = cands
    // ceiling exclusion BEFORE the per-id resolution: with an updated id
    // both the hidden old generation and the live new one are present,
    // and resolving first could elect the hidden row. A layout WITHOUT
    // ingest provenance (offline-built dirs carry no src_batch) degrades
    // to id-level exclusion — exact for plain deletes, conservative for
    // update-tombstones (an offline rebuild holds only live generations;
    // retire stale tombstones via clearTombstones after rebuilding).
    scope.excludedCeilings.foreach { c0 =>
      // defensive per-id collapse: the join below is only correct for ONE
      // ceiling row per id — a per-tombstone frame (an id deleted at
      // several ceilings) would both duplicate candidate rows and let a
      // lower-ceiling pairing resurrect a hidden generation (round-18
      // review finding). The frame is tombstone-sized; the extra agg is
      // a no-op on already-grouped input.
      val c = c0.groupBy("vec_id").agg(max("ts_batch").as("ts_batch"))
      out =
        if (out.columns.contains("src_batch"))
          out.join(c, Seq("vec_id"), "left")
            .filter(col("ts_batch").isNull || col("src_batch") > col("ts_batch"))
            .drop("ts_batch")
        else out.join(idCol(c), Seq("vec_id"), "left_anti")
    }
    scope.excluded.foreach(e => out = out.join(idCol(e), Seq("vec_id"), "left_anti"))
    if (scope.dedupIds)
      out = if (out.columns.contains("src_batch")) Similarity.latestIngest(out)
            else out.dropDuplicates("vec_id")
    scope.allowed.foreach(a => out = out.join(idCol(a), Seq("vec_id"), "left_semi"))
    out
  }

  /** Raw PQ ranking (no rerank) — the recall-measurement surface: top-k
    * per probe by decoded-codeword cosine over the probed clusters. */
  def ivfTopKPqRaw(spark: SparkSession, pqPath: String,
                   cents: Seq[(Int, Seq[Double])], cb: Codebooks,
                   queries: Seq[(Long, Seq[Double])],
                   k: Int, nprobe: Int,
                   scope: CandidateScope = CandidateScope()): DataFrame = {
    import spark.implicits._
    // each probe searches its OWN nprobe lists (the cluster equi-join —
    // same IVF semantics as ivfTopKIndexedVectors), not the union of every
    // probe's lists: a union-scoped scan would return candidates an
    // exact-IVF query at the same nprobe never reads. Scoring via the
    // SHARED ivfScoreTail — an earlier inlined copy dropped its NaN guard
    // (zero-norm probes / zero codewords would rank first under desc).
    val withClusters = queries.map { case (id, v) =>
      (id, v, Similarity.nearestClustersLocal(v, cents, nprobe))
    }
    val probes = withClusters.toDF("query_id", "qv", "clusters")
      .select(col("query_id"), col("qv"), explode(col("clusters")).as("cluster"))
    val probed = withClusters.flatMap(_._3).distinct
    val cands = applyScope(spark.read.parquet(pqPath)
        .filter(col("cluster").isin(probed: _*)), scope)
      .select(col("vec_id").as("cand_id"),
        decodePacked(col("code"), cb).as("cv"), col("cluster"))
    Similarity.ivfScoreTail(probes, cands, k)
      .withColumnRenamed("sim", "psim")
  }

  // --- LUT-ADC scoring (asymmetric distance computation) --------------------

  /** Flattened-table offset of each subspace's codewords (books can be
    * smaller than ks on degenerate corpora, so offsets are cumulative). */
  private def adcOffsets(cb: Codebooks): Array[Int] =
    cb.books.map(_.length / cb.sub).scanLeft(0)(_ + _).init

  /** Query-independent codeword norm² table, [[adcOffsets]] layout — the
    * denominator half of the ADC cosine, shipped once as a reference
    * object (O(m·ks) doubles, part of the model like the codebooks). */
  private def nlutOf(cb: Codebooks): Array[Double] =
    cb.books.flatMap { flat =>
      flat.grouped(cb.sub).map(cw => cw.map(x => x * x).sum)
    }

  /** Per-query lookup table: lut[off(s)+j] = ⟨unit(q)ₛ, codeword j of book
    * s⟩ — m·ks dots over the O(k) driver-side model, once per probe. */
  private def lutOf(q: Seq[Double], cb: Codebooks): Array[Double] = {
    val n = math.sqrt(q.map(x => x * x).sum)
    val qn = q.map(_ / n).toArray
    val out = Array.newBuilder[Double]
    var s = 0
    while (s < cb.m) {
      val flat = cb.books(s)
      var j = 0
      while (j * cb.sub < flat.length) {
        var d = 0; var acc = 0.0
        while (d < cb.sub) { acc += qn(s * cb.sub + d) * flat(j * cb.sub + d); d += 1 }
        out += acc
        j += 1
      }
      s += 1
    }
    out.result()
  }

  /** [[ivfTopKPqRaw]] scored via the classical LUT-ADC path
    * ([[org.apache.spark.sql.graft.PqAdcCosine]]) instead of
    * decode-then-cosine: per-query tables ride the broadcast probe side of
    * the same cluster equi-join, and each candidate costs m table reads +
    * adds instead of decoding sub·m doubles and a dim-wide cosine — the
    * compute-bound alternative for when scoring, not I/O, dominates (rerank
    * pools deep enough that the pool stage is CPU-bound). Same candidates,
    * same NaN contract; scores regroup the identical products per subspace,
    * so round(_,4) makes them equal to the decode path's (PqSpec pins set
    * equality, plus a raw-ulp tolerance check).
    */
  def ivfTopKPqRawAdc(spark: SparkSession, pqPath: String,
                      cents: Seq[(Int, Seq[Double])], cb: Codebooks,
                      queries: Seq[(Long, Seq[Double])],
                      k: Int, nprobe: Int,
                      scope: CandidateScope = CandidateScope()): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.graft.{ColumnBridge, PqAdcCosine}
    val withClusters = queries.map { case (id, v) =>
      (id, lutOf(v, cb).toSeq, Similarity.nearestClustersLocal(v, cents, nprobe))
    }
    // lut attached by query_id AFTER the cluster join: carrying it on the
    // exploded probe side would ship nprobe copies of each m·ks-double
    // table through the broadcast relation for nothing
    val probes = withClusters.map { case (id, _, cls) => (id, cls) }
      .toDF("query_id", "clusters")
      .select(col("query_id"), explode(col("clusters")).as("cluster"))
    val luts = withClusters.map { case (id, l, _) => (id, l) }
      .toDF("query_id", "lut")
    val probed = withClusters.flatMap(_._3).distinct
    val cands = applyScope(spark.read.parquet(pqPath)
        .filter(col("cluster").isin(probed: _*)), scope)
      .select(col("vec_id").as("cand_id"), col("code"), col("cluster"))
    val sim = ColumnBridge.column(PqAdcCosine(
      ColumnBridge.expression(col("code")),
      ColumnBridge.expression(col("lut")),
      adcOffsets(cb), nlutOf(cb)))
    // SHARED rankTail (self-pair filter, NaN guard, bounded top-k) — the
    // decode path ranks through the same code, so the two scorers cannot
    // drift (PqSpec pins ADC ≡ decode)
    Similarity.rankTail(
      broadcast(probes).join(cands, Seq("cluster"))
        .join(broadcast(luts), Seq("query_id")),
      k, sim, "psim")
  }

  // --- residual PQ (IVFADC, Jégou §IV-A) ------------------------------------

  /** Per-cluster anchor: the elementwise mean of the cluster's UNIT member
    * vectors, summed in DECIMAL (order-independent, so the anchor table is
    * deterministic under any partitioning — the retired distributed
    * trainer's trick, kept here because this aggregate IS distributed).
    * O(clusters × dim) driver rows, part of the model like the codebooks.
    */
  def clusterAnchors(embeddings: DataFrame,
                     cents: Seq[(Int, Seq[Double])]): Seq[(Int, Seq[Double])] =
    Similarity.assign(embeddings, cents)
      .filter(dot(col("v"), col("v")) > 0.0)
      .select(col("cluster"), posexplode(unit(col("v"))).as(Seq("pos", "x")))
      .groupBy("cluster", "pos")
      .agg((sum(col("x").cast("decimal(27,18)")).cast("double") /
        count(lit(1))).as("mu"))
      .groupBy("cluster")
      .agg(array_sort(collect_list(struct(col("pos"), col("mu")))).as("pm"))
      .select(col("cluster"), transform(col("pm"), p => p.getField("mu")).as("anchor"))
      .collect().toSeq
      .map(r => (r.get(0) match { case n: java.lang.Number => n.intValue },
        r.getSeq[Double](1)))
      .sortBy(_._1)

  /** Codebooks trained on RESIDUALS `unit(v) − anchor(cluster)` — the
    * classical IVFADC refinement: residuals of a clustered corpus occupy a
    * much tighter ball than the unit sphere, so the same 8 bits/subspace
    * quantize finer (PqSpec pins reconstruction error strictly below the
    * plain tier's on the gate corpus). Same bounded-sample Lloyd. */
  def trainCodebooksResidual(embeddings: DataFrame,
                             cents: Seq[(Int, Seq[Double])],
                             anchors: Seq[(Int, Seq[Double])],
                             dim: Int = 64, m: Int = 8, ks: Int = 256,
                             iters: Int = 3, sampleN: Int = 16384): Codebooks = {
    require(dim % m == 0, s"dim $dim not divisible into $m subspaces")
    require(m <= 8 && ks <= 256, "packed codes: ≤ 8 sub-codes of ≤ 8 bits")
    val sub = dim / m
    val rn = residualFrame(embeddings, cents, anchors, dim).select(col("r").as("vn"))
      .cache()
    try trainFromNormalized(rn, m, sub, ks, iters, sampleN)
    finally { rn.unpersist(blocking = false); () }
  }

  /** A cluster with no nonzero-norm member at anchor-training time has no
    * anchor row; a vector later streamed into it must NOT be silently
    * dropped from the residual index (it stays in the exact and plain-PQ
    * tiers, so an inner join here is a permanent recall gap — the
    * anchors-never-retrained-online contract makes it unfixable at query
    * time). A missing anchor coalesces to the ZERO vector: residual =
    * unit(v), i.e. plain-PQ semantics for that cluster, on BOTH the encode
    * and the reconstruct side (so they stay consistent). */
  private def anchorOrZero(dim: Int): Column =
    coalesce(col("anchor"), array_repeat(lit(0.0), dim))

  /** (vec_id, cluster, r = unit(v) − anchor) for indexable vectors —
    * anchors ride a broadcast LEFT equi-join (tiny model-side table;
    * missing anchor ⇒ zero, see [[anchorOrZero]]). */
  private def residualFrame(embeddings: DataFrame,
                            cents: Seq[(Int, Seq[Double])],
                            anchors: Seq[(Int, Seq[Double])],
                            dim: Int): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val adf = anchors.toDF("cluster", "anchor")
    Similarity.assign(embeddings, cents)
      .filter(dot(col("v"), col("v")) > 0.0)
      .join(broadcast(adf), Seq("cluster"), "left")
      .select(col("vec_id"), col("cluster"),
        zip_with(unit(col("v")), anchorOrZero(dim), (a, b) => a - b).as("r"))
  }

  /** Session cache for the residual model (anchors + codebooks) — the
    * trained-once-query-many shape; cleared by [[clearSessionCache]]. */
  private val residualCache = new scala.collection.concurrent.TrieMap[
    String, (Seq[(Int, Seq[Double])], Codebooks)]
  def trainedResidualModel(embeddings: DataFrame, cents: Seq[(Int, Seq[Double])],
                           cacheKey: String): (Seq[(Int, Seq[Double])], Codebooks) =
    residualCache.getOrElseUpdate(cacheKey, {
      val anchors = clusterAnchors(embeddings, cents)
      (anchors, trainCodebooksResidual(embeddings, cents, anchors))
    })

  /** The residual-PQ index row shape from an assigned full-precision frame
    * — shared by [[buildIndexPqResidual]], [[appendAssignedPqResidual]]
    * and the streaming write
    * ([[graft.streaming.EmbeddingIndexStream]]) so every path produces
    * byte-identical codes (the [[pqFromAssigned]] contract). */
  private[graft] def pqrFromAssigned(assigned: DataFrame,
                                     anchors: Seq[(Int, Seq[Double])],
                                     cb: Codebooks): DataFrame = {
    val spark = assigned.sparkSession
    import spark.implicits._
    val adf = anchors.toDF("cluster", "anchor")
    // LEFT join + zero-coalesce: an anchorless cluster encodes plain-PQ
    // residuals instead of silently dropping its vectors (see anchorOrZero)
    assigned.filter(dot(col("v"), col("v")) > 0.0)
      .join(broadcast(adf), Seq("cluster"), "left")
      .withColumn("code",
        encodePacked(zip_with(unit(col("v")), anchorOrZero(cb.dim), (a, b) => a - b), cb))
      .select(col("vec_id"), col("code"), col("cluster"))
  }

  /** Cluster-partitioned residual-PQ index: same row shape and layout as
    * [[buildIndexPq]] (coarse membership identical to the exact index);
    * codes encode the residual. `encodedGen` as in [[buildIndexPq]]. */
  def buildIndexPqResidual(embeddings: DataFrame, cents: Seq[(Int, Seq[Double])],
                           anchors: Seq[(Int, Seq[Double])], cb: Codebooks,
                           path: String, encodedGen: Long = 0L): Unit = {
    pqrFromAssigned(Similarity.assign(embeddings, cents), anchors, cb)
      .repartition(col("cluster"))
      .write.mode("overwrite").partitionBy("cluster").parquet(path)
    IndexGen.setEncodedGen(embeddings.sparkSession, path, encodedGen)
  }

  /** [[appendAssignedPq]]'s residual twin — O(batch) incremental appends
    * against the persisted model (anchors + codebooks never retrained
    * online, the standard coarse-quantizer contract). */
  def appendAssignedPqResidual(newEmbeddings: DataFrame,
                               cents: Seq[(Int, Seq[Double])],
                               anchors: Seq[(Int, Seq[Double])], cb: Codebooks,
                               indexPath: String): Unit =
    pqrFromAssigned(Similarity.assign(newEmbeddings, cents), anchors, cb)
      .repartition(col("cluster"))
      .write.mode("append").partitionBy("cluster").parquet(indexPath)

  /** Raw residual-PQ ranking: candidates reconstruct as
    * `anchor(cluster) + decode(code)` (one zip_with over the broadcast
    * anchor joined by the cluster column the index already carries), then
    * the shared cosine score tail. Same probe-scoped cluster equi-join and
    * NaN contract as every other tier. */
  def ivfTopKPqResidualRaw(spark: SparkSession, pqrPath: String,
                           cents: Seq[(Int, Seq[Double])],
                           anchors: Seq[(Int, Seq[Double])], cb: Codebooks,
                           queries: Seq[(Long, Seq[Double])],
                           k: Int, nprobe: Int,
                           scope: CandidateScope = CandidateScope()): DataFrame = {
    import spark.implicits._
    val withClusters = queries.map { case (id, v) =>
      (id, v, Similarity.nearestClustersLocal(v, cents, nprobe))
    }
    val probes = withClusters.toDF("query_id", "qv", "clusters")
      .select(col("query_id"), col("qv"), explode(col("clusters")).as("cluster"))
    val probed = withClusters.flatMap(_._3).distinct
    val adf = anchors.toDF("cluster", "anchor")
    // LEFT join + zero-coalesce mirrors the encode side: an anchorless
    // cluster's codes reconstruct as the bare decoded codeword
    val cands = applyScope(spark.read.parquet(pqrPath)
        .filter(col("cluster").isin(probed: _*)), scope)
      .join(broadcast(adf), Seq("cluster"), "left")
      .select(col("vec_id").as("cand_id"),
        zip_with(anchorOrZero(cb.dim), decodePacked(col("code"), cb),
          (a, d) => a + d).as("cv"),
        col("cluster"))
    Similarity.ivfScoreTail(probes, cands, k)
      .withColumnRenamed("sim", "psim")
  }

  /** Two-stage residual-PQ retrieval — [[ivfTopKPqRerank]]'s twin: the
    * residual pool chooses the ≤ poolMult·k candidates, the exact index
    * pays the full-precision read. Tighter residual quantization means the
    * pool contains the exact top-k at SMALLER poolMult than plain PQ
    * (measured in PqProbe; the gate still runs the shared pm=40). */
  /** The `scope` applies to the POOL stage (filter/tombstone below the
    * per-probe top-k, so the pool fills from eligible candidates only);
    * the exact rerank restricts to pool ids by construction, so a scoped
    * pool makes the whole two-stage output scoped. */
  def ivfTopKPqResidualRerank(spark: SparkSession, pqrPath: String,
                              exactPath: String, cents: Seq[(Int, Seq[Double])],
                              anchors: Seq[(Int, Seq[Double])], cb: Codebooks,
                              queries: Seq[(Long, Seq[Double])],
                              k: Int, nprobe: Int, poolMult: Int = 4,
                              scope: CandidateScope = CandidateScope(),
                              scopeExact: DataFrame => DataFrame = identity): DataFrame = {
    // generation fence: refuse stale codes against a reclustered quantizer
    IndexGen.requireMatch(spark, pqrPath, exactPath)
    val pool = ivfTopKPqResidualRaw(spark, pqrPath, cents, anchors, cb, queries,
        k * poolMult, nprobe, scope)
      .select(col("query_id"), col("cand_id"))
    Similarity.rerankAgainstExact(spark, exactPath, cents, queries, pool, k,
      nprobe, scopeExact)
  }

  /** Persist the anchor table (clusters × dim tiny rows) — same contract
    * as [[saveCodebooks]]/[[Similarity.saveCentroids]]. */
  def saveAnchors(spark: SparkSession, anchors: Seq[(Int, Seq[Double])],
                  path: String): Unit = {
    import spark.implicits._
    anchors.toDF("cluster", "anchor")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  def loadAnchors(spark: SparkSession, path: String): Seq[(Int, Seq[Double])] =
    spark.read.parquet(path).collect().toSeq
      .map(r => (r.get(0) match { case n: java.lang.Number => n.intValue },
        r.getSeq[Double](1)))
      .sortBy(_._1)

  /** Two-stage PQ retrieval: partition-pruned PQ pool (decode-then-cosine,
    * or LUT-ADC with `adc = true`; top poolMult·k per probe) → exact rerank
    * of the pool against the exact index. Returns exact cosine scores; the
    * PQ stage only chooses WHICH ≤ poolMult·k vectors pay a full-precision
    * read. Recall is governed by (nprobe, poolMult) — measured on the gate
    * corpus in PqSpec and swept to 64× in STRESS.md ("PQ recall curve").
    */
  def ivfTopKPqRerank(spark: SparkSession, pqPath: String, exactPath: String,
                      cents: Seq[(Int, Seq[Double])], cb: Codebooks,
                      queries: Seq[(Long, Seq[Double])],
                      k: Int, nprobe: Int, poolMult: Int = 4,
                      adc: Boolean = false,
                      scope: CandidateScope = CandidateScope()): DataFrame = {
    // generation fence: refuse stale codes against a reclustered quantizer
    IndexGen.requireMatch(spark, pqPath, exactPath)
    // scope applies to the pool stage; the exact rerank restricts to pool
    // ids by construction (see ivfTopKPqResidualRerank's scaladoc)
    val raw =
      if (adc) ivfTopKPqRawAdc(spark, pqPath, cents, cb, queries, k * poolMult,
        nprobe, scope)
      else ivfTopKPqRaw(spark, pqPath, cents, cb, queries, k * poolMult,
        nprobe, scope)
    val pool = raw.select(col("query_id"), col("cand_id"))
    Similarity.rerankAgainstExact(spark, exactPath, cents, queries, pool, k, nprobe)
  }
}
