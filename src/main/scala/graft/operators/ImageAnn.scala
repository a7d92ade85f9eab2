package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Image-feature → ANN composition (round 19, VERDICT r18 item 3): the two
  * halves that already existed — [[Multimodal]]'s real decode kernels and
  * the IVF inverted-list machinery — composed end to end: PNG payloads are
  * DECODED (javax.imageio, the real codec pass), reduced to the grid² dense
  * integer feature vector ([[Multimodal.extractFeatureSums]] — per-cell
  * luminance sums, exact Long arithmetic), and indexed into a
  * cluster-partitioned IVF layout retrieved by squared-L2 distance.
  *
  * Exact-integer IVF: where the text-embedding tiers ([[Similarity]]) rank
  * by rounded cosine, image cell-sum features are exact integers, so EVERY
  * stage here — coarse assignment, probe selection, candidate scoring —
  * is Long arithmetic with (distance, id) tie-breaks. The gate oracle
  * replays the whole pipeline from the PNG synthesis arithmetic alone
  * (pixel hash → luma → cell sums → assignment → probes → top-k) with zero
  * float hazard; the Spark side must genuinely decode the bytes to match.
  *
  * Coarse quantizer: the feature vectors of [[SeedIds]] (fixed, corpus-wide
  * present doc ids) — deterministic, SQL-replayable, and honest: seeding a
  * coarse quantizer from sampled points IS standard IVF practice (k-means
  * iterations refine it; the refined variant is the [[graft.streaming
  * .EmbeddingIndexStream.reclusterIndex]] path, already oracle-gated on the
  * embedding tier — this operator pins the image composition, not Lloyd).
  *
  * Scale shape: identical to the embedding IVF — the decode+index build is
  * one offline corpus pass (embarrassingly parallel mapPartitions, then a
  * bounded repartition into `cluster=` dirs); a query reads ONLY its nprobe
  * clusters' dirs (partition-pruned), scores O(candidates in probed lists),
  * and nothing shuffles but the ≤ k×queries result.
  */
object ImageAnn {

  /** Gate parameters — seed ids ascending (cid = rank), present at every SF. */
  val Grid = 4
  val SeedIds: Seq[Long] = Seq(2L, 5L, 11L, 17L, 23L, 31L, 41L, 47L)
  val QueryIds: Seq[Long] = Seq(0L, 1L, 2L, 3L, 4L)
  val GateK = 3
  val GateNProbe = 3

  /** Dense image feature vectors (doc_id, v: array<long>) for the given doc
    * ids, via the REAL decode kernel — synthesized fixture payloads, like
    * every multimodal gate row. */
  def featuresOf(docs: DataFrame, ids: Option[Seq[Long]] = None,
                 grid: Int = Grid): DataFrame = {
    val scoped = ids.map(s => docs.filter(col("doc_id").isin(s: _*))).getOrElse(docs)
    Multimodal.extractFeatureSums(
      Multimodal.pngMediaFromDocuments(scoped).select("doc_id", "payload"), grid)
  }

  /** Collect ≤ |ids| feature rows driver-side (bounded by construction —
    * the loadCentroids pattern), id-ascending. */
  def collectVecs(features: DataFrame, ids: Seq[Long]): Seq[(Long, Seq[Long])] =
    features.filter(col("doc_id").isin(ids: _*))
      .select("doc_id", "v").collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1))).sortBy(_._1).toSeq

  /** The coarse quantizer: seed docs' feature vectors, cid = ascending rank
    * of the seed id (the SQL replica numbers them identically). */
  def centroidsOf(docs: DataFrame, seedIds: Seq[Long] = SeedIds,
                  grid: Int = Grid): Seq[(Int, Seq[Long])] = {
    val vecs = collectVecs(featuresOf(docs, Some(seedIds), grid), seedIds)
    // structural, not assumed: a missing seed doc would silently re-rank
    // the remaining cids here while the SQL replica keeps literal ranks —
    // an id-space mismatch the gate would report as a hash miss; fail loud
    require(vecs.size == seedIds.size,
      s"seed docs missing from the corpus: got ${vecs.size} of ${seedIds.size}")
    vecs.zipWithIndex.map { case ((_, v), i) => (i, v) }
  }

  /** Exact squared-L2 between an array<long> column and a literal vector. */
  private def l2Expr(v: Column, c: Seq[Long]): Column =
    aggregate(zip_with(v, typedLit(c), (a, b) => (a - b) * (a - b)),
      lit(0L), (acc, x) => acc + x)

  /** Nearest-centroid cluster id as an expression: min over
    * (distance, cid) structs — exact Longs, deterministic ties. */
  private def clusterExpr(cents: Seq[(Int, Seq[Long])]): Column =
    array_min(array(cents.map { case (cid, cv) =>
      struct(l2Expr(col("v"), cv).as("d"), lit(cid).as("cid"))
    }: _*)).getField("cid")

  /** Driver-side probe selection — the same (distance, cid) ordering the
    * assignment expression uses, over k tiny rows. */
  def nearestClusters(qv: Seq[Long], cents: Seq[(Int, Seq[Long])],
                      nprobe: Int): Seq[Int] = {
    def d(c: Seq[Long]): Long =
      qv.lazyZip(c).map((a, b) => (a - b) * (a - b)).sum
    cents.map { case (cid, cv) => (d(cv), cid) }.sorted.take(nprobe).map(_._2)
  }

  /** Offline build: decode → feature → assign → one file per `cluster=` dir
    * (the probed read opens nprobe files). */
  def buildIndex(features: DataFrame, cents: Seq[(Int, Seq[Long])],
                 indexDir: String): Unit =
    features.withColumn("cluster", clusterExpr(cents))
      .repartition(col("cluster"))
      .write.mode("overwrite").partitionBy("cluster")
      .parquet(indexDir)

  /** IVF top-k by exact squared-L2: candidate read partition-pruned to the
    * queries' nprobe clusters, per-query top-k with (dist, doc_id) ties. */
  def topK(spark: SparkSession, indexDir: String,
           cents: Seq[(Int, Seq[Long])], queries: Seq[(Long, Seq[Long])],
           k: Int, nprobe: Int): DataFrame = {
    val (probes, probed) = probeFrames(spark, cents, queries, nprobe)
    val cands = spark.read.parquet(indexDir)
      .filter(col("cluster").isin(probed: _*))
      .select(col("doc_id"), col("v"), col("cluster"))
    scoreTail(probes, cands, k)
  }

  // --- lifecycle (round 20, verdict r19 item 2) ------------------------------
  //
  // The one-shot buildIndex layout was the last lifecycle-less tier: an
  // opted-out image stayed retrievable forever, a replaced image served its
  // stale features. The cure is NOT new machinery — the image tier rides
  // [[graft.streaming.EmbeddingIndexStream]]'s dir discipline VERBATIM
  // (vec_id keying, `batch=<id>/cluster=` layout with per-row src_batch,
  // `.tombstones/` ceiling batches, compactIndex's purge) because that
  // machinery never looks inside the vector column; only the SCORER is
  // image-specific (exact squared-L2 over array<long>), so this object adds
  // just the Long-typed write/read/reseed verbs around it.

  /** Hash salt of the "edited image" fixture: the v2 payload for an updated
    * doc hashes pixels from doc_id + salt at the original dimensions
    * ([[Multimodal.pngMediaFromDocuments]]'s salted overload), exactly
    * replayable by the SQL oracle. */
  final val UpdateSalt = 1000003L

  /** Feature vectors of the SALTED (replaced) payloads — the update
    * fixture's v2 decode, through the same real codec pass. */
  def saltedFeaturesOf(docs: DataFrame, ids: Option[Seq[Long]] = None,
                       grid: Int = Grid): DataFrame = {
    val scoped = ids.map(s => docs.filter(col("doc_id").isin(s: _*))).getOrElse(docs)
    Multimodal.extractFeatureSums(
      Multimodal.pngMediaFromDocuments(scoped, UpdateSalt)
        .select("doc_id", "payload"), grid)
  }

  /** One feature micro-batch into the LIFECYCLE layout: assigned against
    * the frozen quantizer, landed cluster-partitioned inside an idempotent
    * `batch=<id>` dir with per-row src_batch — byte-for-byte the
    * [[graft.streaming.EmbeddingIndexStream.applyBatch]] shape at
    * array<long> type (vec_id = doc_id in this tier). */
  def applyStreamBatch(features: DataFrame, batchId: Long,
                       cents: Seq[(Int, Seq[Long])], indexDir: String): Unit =
    features.select(col("doc_id").as("vec_id"), col("v"))
      .withColumn("cluster", clusterExpr(cents))
      .withColumn("src_batch", lit(batchId))
      .repartition(col("cluster"))
      .write.mode("overwrite").partitionBy("cluster")
      .parquet(s"$indexDir/batch=$batchId")

  /** Shared exact-Long scoring tail: probes (query_id, qv, cluster) ×
    * candidates (doc_id, v, cluster) → per-query top-k by squared-L2 with
    * (dist, doc_id) ties — identical below [[topK]], [[topKLive]] and
    * [[topKAsOf]]; only the candidate READ differs between them. */
  private def scoreTail(probes: DataFrame, cands: DataFrame,
                        k: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("dist"), col("doc_id"))
    probes.join(cands, Seq("cluster"))
      .select(col("query_id"), col("doc_id"),
        aggregate(zip_with(col("qv"), col("v"), (a, b) => (a - b) * (a - b)),
          lit(0L), (acc, x) => acc + x).as("dist"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select("query_id", "doc_id", "dist")
      .orderBy("query_id", "dist", "doc_id")
  }

  private def probeFrames(spark: SparkSession,
                          cents: Seq[(Int, Seq[Long])],
                          queries: Seq[(Long, Seq[Long])],
                          nprobe: Int): (DataFrame, Seq[Int]) = {
    import spark.implicits._
    val probeRows = queries.flatMap { case (qid, qv) =>
      nearestClusters(qv, cents, nprobe).map(c => (qid, qv, c))
    }
    (probeRows.toDF("query_id", "qv", "cluster"),
      probeRows.map(_._3).distinct)
  }

  /** Tombstone-aware IVF top-k over the lifecycle layout: the ceiling
    * exclusion + last-writer resolution (the shared EmbeddingIndexStream
    * helpers — same tombstone dirs, same semantics) composed BELOW the
    * per-query top-k, so k fills from live generations only; scoring stays
    * exact Long squared-L2 with (dist, doc_id) ties. */
  def topKLive(spark: SparkSession, indexDir: String,
               cents: Seq[(Int, Seq[Long])], queries: Seq[(Long, Seq[Long])],
               k: Int, nprobe: Int): DataFrame = {
    import graft.streaming.EmbeddingIndexStream
    val (probes, probed) = probeFrames(spark, cents, queries, nprobe)
    val cands = Similarity.latestIngest(EmbeddingIndexStream.applyCeilings(
        spark.read.parquet(indexDir).drop("batch")
          .filter(col("cluster").isin(probed: _*)),
        EmbeddingIndexStream.tombstoneCeilings(spark, indexDir)))
      .select(col("vec_id").as("doc_id"), col("v"), col("cluster"))
    scoreTail(probes, cands, k)
  }

  /** Point-in-time IVF top-k — [[topKLive]] as of `asOfBatch`, the
    * [[graft.streaming.EmbeddingIndexStream.ivfTopKIndexedAsOf]] semantics
    * at array<long> type: candidates partition-prune on BOTH cluster
    * (nprobe lists) and batch (≤ asOf), the fold-surviving src_batch bound
    * keeps the ingest cut exact, and only tombstones COMMITTED ≤ asOf
    * participate. Shares the embedding tier's compaction caveat verbatim:
    * a purge erases generations below CURRENT tombstones, so size
    * compaction windows to the as-of horizon you need. */
  def topKAsOf(spark: SparkSession, indexDir: String,
               cents: Seq[(Int, Seq[Long])], queries: Seq[(Long, Seq[Long])],
               k: Int, nprobe: Int, asOfBatch: Long): DataFrame = {
    import graft.streaming.EmbeddingIndexStream
    val (probes, probed) = probeFrames(spark, cents, queries, nprobe)
    val cands = Similarity.latestIngest(EmbeddingIndexStream.applyCeilings(
        spark.read.parquet(indexDir)
          .filter(col("cluster").isin(probed: _*) && col("batch") <= asOfBatch)
          .filter(col("src_batch") <= asOfBatch)
          .drop("batch"),
        EmbeddingIndexStream.tombstoneCeilingsAsOf(spark, indexDir, asOfBatch)))
      .select(col("vec_id").as("doc_id"), col("v"), col("cluster"))
    scoreTail(probes, cands, k)
  }

  /** Corpus→index synchronization at array<long> type — the
    * [[graft.streaming.EmbeddingIndexStream.syncWithCorpus]] semantics on
    * feature frames (doc_id, v): ADDED ids append (frozen quantizer),
    * REMOVED ids tombstone at ceiling = batchId, CHANGED ids (a replaced
    * image whose re-decode differs) update in place — fresh vector rides
    * the same append, a ceiling = batchId − 1 tombstone hides every older
    * generation while the new one survives. One `batch=` dir + one
    * tombstone batch, so replaying a sync converges. The production loop:
    * diff the media store's current decode against the served index, one
    * maintenance batch. */
  def syncImageCorpus(spark: SparkSession, indexDir: String,
                      cents: Seq[(Int, Seq[Long])],
                      oldFeats: DataFrame, newFeats: DataFrame,
                      batchId: Long): Unit = {
    import graft.streaming.EmbeddingIndexStream
    val oldIds = oldFeats.select(col("doc_id"))
    val newIds = newFeats.select(col("doc_id"))
    val added = newFeats.join(oldIds, Seq("doc_id"), "left_anti")
    val removed = oldIds.join(newIds, Seq("doc_id"), "left_anti")
    val changed = newFeats.alias("n")
      .join(oldFeats.alias("o"), Seq("doc_id"))
      .filter(col("n.v") =!= col("o.v"))
      .select(col("doc_id"), col("n.v").as("v"))
    applyStreamBatch(added.unionByName(changed), batchId, cents, indexDir)
    EmbeddingIndexStream.tombstoneRows(spark,
      removed.select(col("doc_id").as("vec_id"), lit(batchId).as("ceiling"))
        .unionByName(changed.select(col("doc_id").as("vec_id"),
          lit(batchId - 1L).as("ceiling"))),
      batchId, indexDir)
  }

  /** The index's co-located Long quantizer (dot-dir — the
    * EmbeddingIndexStream.reclusterIndex discipline: one rename carries
    * data + quantizer together). */
  private def quantizerPath(indexDir: String) = s"$indexDir/.quantizer-img"

  def saveCentroids(spark: SparkSession, cents: Seq[(Int, Seq[Long])],
                    path: String): Unit = {
    import spark.implicits._
    cents.toDF("cid", "v").coalesce(1).write.mode("overwrite").parquet(path)
  }

  /** O(K) driver rows — the loadCentroids pattern. */
  def loadCentroids(spark: SparkSession, path: String): Seq[(Int, Seq[Long])] =
    spark.read.parquet(path).select("cid", "v").collect()
      .map(r => (r.getInt(0), r.getSeq[Long](1))).sortBy(_._1).toSeq

  /** The quantizer this index should be queried with: the co-located one
    * once [[reseedIndex]] has run, else the caller's initial seeds. */
  def indexQuantizer(spark: SparkSession, indexDir: String,
                     initial: => Seq[(Int, Seq[Long])]): Seq[(Int, Seq[Long])] = {
    val p = quantizerPath(indexDir)
    if (graft.functions.FsUtils.fs(spark, p)
        .exists(new org.apache.hadoop.fs.Path(p)))
      loadCentroids(spark, p)
    else initial
  }

  /** RESEED the coarse quantizer and atomically re-cluster the image index
    * — the K-GROWTH maintenance verb (round 20): the fixed seed quantizer
    * is this tier's measured scale debt (STRESS r19: serve alpha 0.41 —
    * candidate lists grow linearly when K stays put), and the cure is the
    * recluster the embedding tier already has, in this tier's exact-Long
    * idiom: centroids are SEED DOC VECTORS (more of them as the corpus
    * grows — K ∝ N keeps per-list candidates flat), not float means, so
    * every post-reseed read stays integer-exact and oracle-replayable.
    *
    * Crash safety is the reclusterIndex discipline verbatim: full rewrite
    * into a sibling `.reseed-tmp` + `_RESEED_READY` marker before the
    * swap; a marked tmp with no index dir IS the swap's redo log, an
    * unmarked one is deleted. Tombstones carry into the new dir still
    * ARMED (a replayed ingest batch may rewrite a tombstoned id);
    * src_batch is preserved through the rewrite so those ceilings keep
    * resolving. Requires the maintenance window (no concurrent writer). */
  def reseedIndex(spark: SparkSession, indexDir: String,
                  newCents: Seq[(Int, Seq[Long])]): Unit = {
    import graft.streaming.EmbeddingIndexStream
    val fs = graft.functions.FsUtils.fs(spark, indexDir)
    val base = new org.apache.hadoop.fs.Path(indexDir)
    val tmp = new org.apache.hadoop.fs.Path(base.getParent,
      base.getName + ".reseed-tmp")
    val ready = new org.apache.hadoop.fs.Path(tmp, "_RESEED_READY")
    if (fs.exists(tmp)) {
      if (!fs.exists(base) && fs.exists(ready)) {
        // finish the PREVIOUS reseed's interrupted swap, then FALL
        // THROUGH: the healed install carries the prior call's quantizer,
        // not this call's newCents — returning here would silently skip
        // the requested reseed and a caller querying with newCents would
        // probe the wrong inverted lists (review finding, r20 s2)
        graft.functions.FsUtils.renameOrThrow(fs, tmp, base)
        fs.delete(new org.apache.hadoop.fs.Path(base, "_RESEED_READY"), false)
        spark.catalog.refreshByPath(indexDir)
      } else fs.delete(tmp, true)
    }
    val live = Similarity.latestIngest(EmbeddingIndexStream.applyCeilings(
      spark.read.parquet(indexDir).drop("batch"),
      EmbeddingIndexStream.tombstoneCeilings(spark, indexDir)))
      .select("vec_id", "v", "src_batch")
    live.withColumn("cluster", clusterExpr(newCents))
      .repartition(col("cluster"))
      .write.mode("overwrite").partitionBy("cluster")
      .parquet(new org.apache.hadoop.fs.Path(tmp, "batch=-1").toString)
    saveCentroids(spark, newCents, quantizerPath(tmp.toString))
    // the machinery's raw read, not a hand-rolled parquet load: it heals
    // the UNABLE_TO_INFER_SCHEMA crash window (a tombstoneRows that died
    // between tmp write and swap) and maps the legacy ids-only layout to
    // ceiling = MaxValue (review finding, r20 s2)
    val ts = EmbeddingIndexStream.rawTombstones(spark, indexDir)
    if (!ts.isEmpty) ts.select("vec_id", "ceiling").coalesce(1)
      .write.mode("overwrite").parquet(s"${tmp.toString}/.tombstones/batch=-1")
    fs.create(ready, true).close()
    fs.delete(base, true)
    graft.functions.FsUtils.renameOrThrow(fs, tmp, base)
    fs.delete(new org.apache.hadoop.fs.Path(base, "_RESEED_READY"), false)
    spark.catalog.refreshByPath(indexDir)
  }

  /** The gate row end to end: corpus-wide feature index (built once per
    * session per sf dir — registry-backed, Bench pays the honest fresh
    * cost), query vectors from the REAL decode of the query docs' payloads. */
  def gate(spark: SparkSession, dir: String): DataFrame = {
    val docs = graft.Tables.documentsById(spark, dir)
    val cents = centroidsOf(docs)
    val path = "/tmp/graft-imgann/" + dir.replaceAll("[^A-Za-z0-9.]", "_")
    Similarity.ensureBuilt(path)(buildIndex(featuresOf(docs), cents, path))
    topK(spark, path, cents,
      collectVecs(featuresOf(docs, Some(QueryIds)), QueryIds),
      k = GateK, nprobe = GateNProbe)
  }

  /** The LIVE gate row (round 20): the image tier carried through the full
    * delete/update lifecycle on the SAME churn fixture as the lexical and
    * embedding tiers (doc %10==3 opted out, doc %13==0's image replaced —
    * one corpus event cascading into every index family):
    * batch 0 ingests every doc's v1 features; maintenance batch 1 ingests
    * the updated docs' SALTED (re-decoded) features and commits ONE
    * tombstone batch with per-row ceilings (removed at 1 — hide all;
    * updated at 0 — the fresh generation survives); compaction purges the
    * hidden generations; [[topKLive]] serves with ceilings + last-writer
    * composed below the top-k. Queries are the v2 payload decodes of the
    * query docs (doc 0's REPLACED image queries; doc 3 — deleted — still
    * queries as an external image but can never be retrieved). */
  /** The shared churn-fixture build: batch 0 = every doc's v1 features,
    * batch 1 = the updated docs' SALTED (re-decoded) features + ONE
    * tombstone batch with per-row ceilings (removed at 1 — hide all;
    * updated at 0 — the fresh generation survives), then optionally the
    * compaction purge (the as-of fixture keeps per-batch history). */
  private def buildLiveFixture(spark: SparkSession, docs: DataFrame,
                               cents: Seq[(Int, Seq[Long])], path: String,
                               compact: Boolean): Unit = {
    import graft.streaming.EmbeddingIndexStream
    val f = graft.functions.FsUtils.fs(spark, path)
    f.delete(new org.apache.hadoop.fs.Path(path), true)
    val removed = docs.filter(
      col("doc_id") % TextAnalysis.LexLiveRemoveMod === TextAnalysis.LexLiveRemoveRes)
    val updated = docs.filter(
      col("doc_id") % TextAnalysis.LexLiveEditMod === 0 &&
      col("doc_id") % TextAnalysis.LexLiveRemoveMod =!= TextAnalysis.LexLiveRemoveRes)
    applyStreamBatch(featuresOf(docs), 0L, cents, path)
    applyStreamBatch(saltedFeaturesOf(updated), 1L, cents, path)
    EmbeddingIndexStream.tombstoneRows(spark,
      removed.select(col("doc_id").as("vec_id"), lit(1L).as("ceiling"))
        .unionByName(updated.select(col("doc_id").as("vec_id"),
          lit(0L).as("ceiling"))),
      1L, path)
    if (compact) EmbeddingIndexStream.compactIndex(spark, path)
  }

  /** The live QUERY set: v2 payload decodes of the query docs — doc 0's
    * REPLACED image queries via its salted decode, the others via v1. */
  private def liveQueries(docs: DataFrame): Seq[(Long, Seq[Long])] = {
    val qv1 = QueryIds.filter(_ % TextAnalysis.LexLiveEditMod != 0)
    val qv2 = QueryIds.filter(_ % TextAnalysis.LexLiveEditMod == 0)
    (collectVecs(featuresOf(docs, Some(qv1)), qv1) ++
      collectVecs(saltedFeaturesOf(docs, Some(qv2)), qv2)).sortBy(_._1)
  }

  def gateLive(spark: SparkSession, dir: String): DataFrame = {
    val docs = graft.Tables.documentsById(spark, dir)
    val cents = centroidsOf(docs) // the frozen v1 quantizer
    val path = "/tmp/graft-imgann-live/" + dir.replaceAll("[^A-Za-z0-9.]", "_")
    Similarity.ensureBuilt(path)(
      buildLiveFixture(spark, docs, cents, path, compact = true))
    topKLive(spark, path, cents, liveQueries(docs), k = GateK, nprobe = GateNProbe)
  }

  /** The point-in-time gate row (round 20): ONE result pinning both halves
    * of the as-of contract on an UNCOMPACTED churn fixture — the LIVE view
    * serves the v2 image corpus (replaced rasters re-scored, opted-out docs
    * unretrievable) with v2 queries, while the AS-OF batch-0 view serves
    * the original corpus with the original (v1) queries: the delete and
    * the re-decode are both invisible at that point in time. The oracle is
    * the two full pipeline replicas unioned under a view label. */
  def gateAsof(spark: SparkSession, dir: String): DataFrame = {
    val docs = graft.Tables.documentsById(spark, dir)
    val cents = centroidsOf(docs)
    val path = "/tmp/graft-imgann-asofraw/" + dir.replaceAll("[^A-Za-z0-9.]", "_")
    Similarity.ensureBuilt(path)(
      buildLiveFixture(spark, docs, cents, path, compact = false))
    val live = topKLive(spark, path, cents, liveQueries(docs),
        k = GateK, nprobe = GateNProbe)
      .withColumn("view", lit("live"))
    val asof = topKAsOf(spark, path, cents,
        collectVecs(featuresOf(docs, Some(QueryIds)), QueryIds),
        k = GateK, nprobe = GateNProbe, asOfBatch = 0L)
      .withColumn("view", lit("asof0"))
    live.unionByName(asof)
      .select("view", "query_id", "doc_id", "dist")
      .orderBy(col("view"), col("query_id"), col("dist"), col("doc_id"))
  }

  /** The SYNC gate row (round 20 s2): the same churn event delivered
    * through [[syncImageCorpus]] instead of hand-built batches — old =
    * every doc's v1 decode, new = the live corpus's decode (opted-out docs
    * absent, replaced images salted). The diff must land BITWISE on the
    * [[gateLive]] fixture's state (same appends, same per-row ceilings),
    * which is why the oracle is [[gateLiveSql]] verbatim. */
  def gateSynced(spark: SparkSession, dir: String): DataFrame = {
    import graft.streaming.EmbeddingIndexStream
    val docs = graft.Tables.documentsById(spark, dir)
    val cents = centroidsOf(docs)
    val path = "/tmp/graft-imgann-sync/" + dir.replaceAll("[^A-Za-z0-9.]", "_")
    Similarity.ensureBuilt(path) {
      val f = graft.functions.FsUtils.fs(spark, path)
      f.delete(new org.apache.hadoop.fs.Path(path), true)
      val live = docs.filter(
        col("doc_id") % TextAnalysis.LexLiveRemoveMod =!= TextAnalysis.LexLiveRemoveRes)
      val kept = live.filter(col("doc_id") % TextAnalysis.LexLiveEditMod =!= 0)
      val updated = live.filter(col("doc_id") % TextAnalysis.LexLiveEditMod === 0)
      val oldF = featuresOf(docs)
      val newF = featuresOf(kept).unionByName(saltedFeaturesOf(updated))
      applyStreamBatch(oldF, 0L, cents, path)
      syncImageCorpus(spark, path, cents, oldF, newF, 1L)
      EmbeddingIndexStream.compactIndex(spark, path)
    }
    topKLive(spark, path, cents, liveQueries(docs), k = GateK, nprobe = GateNProbe)
  }

  /** The RESEED gate's grown seed set: 16 corpus doc ids (vs the initial
    * 8), every one outside BOTH churn classes (not removed, not edited) so
    * its live vector IS its v1 decode — the quantizer the verb installs is
    * exactly replayable from either raster generation. Present at every SF
    * (all < 48, the [[SeedIds]] bound). */
  val ReseedIds: Seq[Long] =
    Seq(1L, 2L, 4L, 5L, 6L, 7L, 8L, 9L, 10L, 11L, 12L, 14L, 15L, 16L, 17L, 18L)

  /** The reseed verb gated end to end (round 20): the full churn lifecycle
    * (ingest, re-decode, tombstones, compaction), then [[reseedIndex]]
    * grows the quantizer 8 → 16 seed vectors and atomically re-clusters;
    * the serve resolves the CO-LOCATED quantizer ([[indexQuantizer]]) and
    * must return exactly what a fresh 16-seed IVF over the live image
    * corpus returns — which is what the oracle replays. */
  def gateReseeded(spark: SparkSession, dir: String): DataFrame = {
    val docs = graft.Tables.documentsById(spark, dir)
    val cents = centroidsOf(docs)
    val path = "/tmp/graft-imgann-reseed/" + dir.replaceAll("[^A-Za-z0-9.]", "_")
    Similarity.ensureBuilt(path) {
      buildLiveFixture(spark, docs, cents, path, compact = true)
      reseedIndex(spark, path, centroidsOf(docs, ReseedIds))
    }
    val quant = indexQuantizer(spark, path, cents)
    topKLive(spark, path, quant, liveQueries(docs),
      k = GateK, nprobe = GateNProbe)
  }

  /** [[gateLive]]'s DuckDB replica: the [[gateSql]] chain with a SECOND
    * raster generation — `featl` hashes updated docs' pixels from
    * doc_id + [[UpdateSalt]] (dims unchanged) — centroids still from the
    * v1 features (the frozen quantizer), assignment and candidates
    * restricted to the live set, queries reading their v2 features. */
  def gateLiveSql(k: Int = GateK, nprobe: Int = GateNProbe,
                  seedIds: Seq[Long] = SeedIds,
                  centRel: String = "feat"): String = {
    val seeds = seedIds.mkString(", ")
    val qids = QueryIds.mkString(", ")
    val rm = TextAnalysis.LexLiveRemoveMod
    val rr = TextAnalysis.LexLiveRemoveRes
    val em = TextAnalysis.LexLiveEditMod
    s"""WITH dims AS (
       |  SELECT doc_id, CAST(16 + doc_id % 17 AS BIGINT) AS w,
       |         CAST(8 + doc_id % 13 AS BIGINT) AS h
       |  FROM documents),
       |px AS (
       |  SELECT doc_id, w, h, unnest(range(0, w)) AS x, y
       |  FROM (SELECT doc_id, w, h, unnest(range(0, h)) AS y FROM dims)),
       |pv AS (
       |  SELECT doc_id, w, h, x, y,
       |    (xor(xor(doc_id * 1315423911, x * 2654435761), y * 40503) & 16777215) AS v
       |  FROM px),
       |pvl AS (
       |  SELECT doc_id, w, h, x, y,
       |    (xor(xor(CASE WHEN doc_id % $em = 0 THEN doc_id + $UpdateSalt
       |                  ELSE doc_id END * 1315423911,
       |             x * 2654435761), y * 40503) & 16777215) AS v
       |  FROM px),
       |feat AS (
       |  SELECT doc_id, ((y * $Grid // h) * $Grid + (x * $Grid // w)) AS cell,
       |    CAST(SUM(((v >> 16) & 255) * 299 + ((v >> 8) & 255) * 587 + (v & 255) * 114) AS BIGINT) AS s
       |  FROM pv GROUP BY doc_id, cell),
       |featl AS (
       |  SELECT doc_id, ((y * $Grid // h) * $Grid + (x * $Grid // w)) AS cell,
       |    CAST(SUM(((v >> 16) & 255) * 299 + ((v >> 8) & 255) * 587 + (v & 255) * 114) AS BIGINT) AS s
       |  FROM pvl GROUP BY doc_id, cell),
       |seeds AS (
       |  SELECT sid, CAST(ROW_NUMBER() OVER (ORDER BY sid) - 1 AS BIGINT) AS cid
       |  FROM (SELECT UNNEST([$seeds]) AS sid)),
       |cent AS (SELECT se.cid, f.cell, f.s FROM seeds se JOIN $centRel f ON f.doc_id = se.sid),
       |adist AS (
       |  SELECT f.doc_id, c.cid, SUM((f.s - c.s) * (f.s - c.s)) AS d
       |  FROM featl f JOIN cent c USING (cell) GROUP BY 1, 2),
       |assign AS (
       |  SELECT doc_id, cid AS cluster FROM (
       |    SELECT doc_id, cid,
       |      ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY d, cid) AS rn
       |    FROM adist WHERE doc_id % $rm <> $rr) WHERE rn = 1),
       |qprobe AS (
       |  SELECT doc_id AS query_id, cid AS cluster FROM (
       |    SELECT doc_id, cid,
       |      ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY d, cid) AS rn
       |    FROM adist WHERE doc_id IN ($qids)) WHERE rn <= $nprobe),
       |cand AS (SELECT q.query_id, a.doc_id FROM qprobe q JOIN assign a USING (cluster)),
       |qd AS (
       |  SELECT c.query_id, c.doc_id,
       |    SUM((fq.s - fc.s) * (fq.s - fc.s)) AS dist
       |  FROM cand c
       |  JOIN featl fq ON fq.doc_id = c.query_id
       |  JOIN featl fc ON fc.doc_id = c.doc_id AND fc.cell = fq.cell
       |  GROUP BY 1, 2)
       |SELECT query_id, doc_id, CAST(dist AS BIGINT) AS dist FROM (
       |  SELECT query_id, doc_id, dist,
       |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY dist, doc_id) AS rn
       |  FROM qd) WHERE rn <= $k
       |ORDER BY query_id, dist, doc_id""".stripMargin
  }

  /** [[gateReseeded]]'s replica: [[gateLiveSql]] with the grown seed set
    * and the centroid vectors read from the LIVE raster generation
    * (`featl` — for [[ReseedIds]] the two generations coincide by
    * construction, which is exactly why the verb's install is replayable). */
  def gateReseededSql(k: Int = GateK, nprobe: Int = GateNProbe): String =
    gateLiveSql(k, nprobe, seedIds = ReseedIds, centRel = "featl")

  /** [[gateAsof]]'s replica: ONE statement, both pipeline replays — the
    * shared synthesis prefix (both raster generations, v1 centroids), then
    * the as-of chain (suffix 0: v1 features, every doc a candidate, v1
    * queries — [[gateSql]]'s body) and the live chain (suffix 1:
    * [[gateLiveSql]]'s body) unioned under a view label. */
  def gateAsofSql(k: Int = GateK, nprobe: Int = GateNProbe): String = {
    val seeds = SeedIds.mkString(", ")
    val qids = QueryIds.mkString(", ")
    val rm = TextAnalysis.LexLiveRemoveMod
    val rr = TextAnalysis.LexLiveRemoveRes
    val em = TextAnalysis.LexLiveEditMod
    // featRel = which raster generation scores; liveFilter prunes the
    // candidate set to the live corpus (empty = every doc is a candidate)
    def chain(sfx: String, featRel: String, liveFilter: String) =
      s"""adist$sfx AS (
         |  SELECT f.doc_id, c.cid, SUM((f.s - c.s) * (f.s - c.s)) AS d
         |  FROM $featRel f JOIN cent c USING (cell) GROUP BY 1, 2),
         |assign$sfx AS (
         |  SELECT doc_id, cid AS cluster FROM (
         |    SELECT doc_id, cid,
         |      ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY d, cid) AS rn
         |    FROM adist$sfx$liveFilter) WHERE rn = 1),
         |qprobe$sfx AS (
         |  SELECT doc_id AS query_id, cid AS cluster FROM (
         |    SELECT doc_id, cid,
         |      ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY d, cid) AS rn
         |    FROM adist$sfx WHERE doc_id IN ($qids)) WHERE rn <= $nprobe),
         |cand$sfx AS (SELECT q.query_id, a.doc_id FROM qprobe$sfx q JOIN assign$sfx a USING (cluster)),
         |qd$sfx AS (
         |  SELECT c.query_id, c.doc_id,
         |    SUM((fq.s - fc.s) * (fq.s - fc.s)) AS dist
         |  FROM cand$sfx c
         |  JOIN $featRel fq ON fq.doc_id = c.query_id
         |  JOIN $featRel fc ON fc.doc_id = c.doc_id AND fc.cell = fq.cell
         |  GROUP BY 1, 2)""".stripMargin
    def branch(view: String, sfx: String) =
      s"""(SELECT '$view' AS view, query_id, doc_id, CAST(dist AS BIGINT) AS dist FROM (
         |  SELECT query_id, doc_id, dist,
         |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY dist, doc_id) AS rn
         |  FROM qd$sfx) WHERE rn <= $k)""".stripMargin
    s"""WITH dims AS (
       |  SELECT doc_id, CAST(16 + doc_id % 17 AS BIGINT) AS w,
       |         CAST(8 + doc_id % 13 AS BIGINT) AS h
       |  FROM documents),
       |px AS (
       |  SELECT doc_id, w, h, unnest(range(0, w)) AS x, y
       |  FROM (SELECT doc_id, w, h, unnest(range(0, h)) AS y FROM dims)),
       |pv AS (
       |  SELECT doc_id, w, h, x, y,
       |    (xor(xor(doc_id * 1315423911, x * 2654435761), y * 40503) & 16777215) AS v
       |  FROM px),
       |pvl AS (
       |  SELECT doc_id, w, h, x, y,
       |    (xor(xor(CASE WHEN doc_id % $em = 0 THEN doc_id + $UpdateSalt
       |                  ELSE doc_id END * 1315423911,
       |             x * 2654435761), y * 40503) & 16777215) AS v
       |  FROM px),
       |feat AS (
       |  SELECT doc_id, ((y * $Grid // h) * $Grid + (x * $Grid // w)) AS cell,
       |    CAST(SUM(((v >> 16) & 255) * 299 + ((v >> 8) & 255) * 587 + (v & 255) * 114) AS BIGINT) AS s
       |  FROM pv GROUP BY doc_id, cell),
       |featl AS (
       |  SELECT doc_id, ((y * $Grid // h) * $Grid + (x * $Grid // w)) AS cell,
       |    CAST(SUM(((v >> 16) & 255) * 299 + ((v >> 8) & 255) * 587 + (v & 255) * 114) AS BIGINT) AS s
       |  FROM pvl GROUP BY doc_id, cell),
       |seeds AS (
       |  SELECT sid, CAST(ROW_NUMBER() OVER (ORDER BY sid) - 1 AS BIGINT) AS cid
       |  FROM (SELECT UNNEST([$seeds]) AS sid)),
       |cent AS (SELECT se.cid, f.cell, f.s FROM seeds se JOIN feat f ON f.doc_id = se.sid),
       |${chain("0", "feat", "")},
       |${chain("1", "featl", s" WHERE doc_id % $rm <> $rr")}
       |SELECT view, query_id, doc_id, dist FROM (
       |${branch("asof0", "0")}
       |UNION ALL
       |${branch("live", "1")})
       |ORDER BY view, query_id, dist, doc_id""".stripMargin
  }

  /** DuckDB replica — the ENTIRE pipeline from the synthesis arithmetic:
    * pixel hash → ITU-R 601 luma → grid cell sums (the shared
    * multimodal_cellsums_png core) → seed centroids → nearest-centroid
    * assignment → per-query nprobe probes → exact squared-L2 top-k. Every
    * value BIGINT; ROW_NUMBER ties on (d, cid) / (dist, doc_id) mirror the
    * Spark expressions exactly. */
  def gateSql(k: Int = GateK, nprobe: Int = GateNProbe): String = {
    val seeds = SeedIds.mkString(", ")
    val qids = QueryIds.mkString(", ")
    s"""WITH dims AS (
       |  SELECT doc_id, CAST(16 + doc_id % 17 AS BIGINT) AS w,
       |         CAST(8 + doc_id % 13 AS BIGINT) AS h
       |  FROM documents),
       |px AS (
       |  SELECT doc_id, w, h, unnest(range(0, w)) AS x, y
       |  FROM (SELECT doc_id, w, h, unnest(range(0, h)) AS y FROM dims)),
       |pv AS (
       |  SELECT doc_id, w, h, x, y,
       |    (xor(xor(doc_id * 1315423911, x * 2654435761), y * 40503) & 16777215) AS v
       |  FROM px),
       |feat AS (
       |  SELECT doc_id, ((y * $Grid // h) * $Grid + (x * $Grid // w)) AS cell,
       |    CAST(SUM(((v >> 16) & 255) * 299 + ((v >> 8) & 255) * 587 + (v & 255) * 114) AS BIGINT) AS s
       |  FROM pv GROUP BY doc_id, cell),
       |seeds AS (
       |  SELECT sid, CAST(ROW_NUMBER() OVER (ORDER BY sid) - 1 AS BIGINT) AS cid
       |  FROM (SELECT UNNEST([$seeds]) AS sid)),
       |cent AS (SELECT se.cid, f.cell, f.s FROM seeds se JOIN feat f ON f.doc_id = se.sid),
       |adist AS (
       |  SELECT f.doc_id, c.cid, SUM((f.s - c.s) * (f.s - c.s)) AS d
       |  FROM feat f JOIN cent c USING (cell) GROUP BY 1, 2),
       |assign AS (
       |  SELECT doc_id, cid AS cluster FROM (
       |    SELECT doc_id, cid,
       |      ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY d, cid) AS rn
       |    FROM adist) WHERE rn = 1),
       |qprobe AS (
       |  SELECT doc_id AS query_id, cid AS cluster FROM (
       |    SELECT doc_id, cid,
       |      ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY d, cid) AS rn
       |    FROM adist WHERE doc_id IN ($qids)) WHERE rn <= $nprobe),
       |cand AS (SELECT q.query_id, a.doc_id FROM qprobe q JOIN assign a USING (cluster)),
       |qd AS (
       |  SELECT c.query_id, c.doc_id,
       |    SUM((fq.s - fc.s) * (fq.s - fc.s)) AS dist
       |  FROM cand c
       |  JOIN feat fq ON fq.doc_id = c.query_id
       |  JOIN feat fc ON fc.doc_id = c.doc_id AND fc.cell = fq.cell
       |  GROUP BY 1, 2)
       |SELECT query_id, doc_id, CAST(dist AS BIGINT) AS dist FROM (
       |  SELECT query_id, doc_id, dist,
       |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY dist, doc_id) AS rn
       |  FROM qd) WHERE rn <= $k
       |ORDER BY query_id, dist, doc_id""".stripMargin
  }
}
