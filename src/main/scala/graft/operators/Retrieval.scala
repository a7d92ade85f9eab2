package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Hybrid retrieval: fuse a lexical (BM25) ranked list with a dense (ANN)
  * ranked list per query via Reciprocal Rank Fusion — the production RAG
  * retrieval shape (sparse recall ∪ dense recall → one ranking). RRF
  * (Cormack/Clarke/Buettcher, SIGIR 2009): score(d) = Σ_lists 1/(c + rank_d),
  * c = 60 the published default; rank-only fusion needs no score
  * calibration between retrievers, which is why it is the default fusion
  * everywhere.
  *
  * Scale shape: the fused join runs over the RANKED LISTS (queries × depth
  * rows — broadcast-sized by construction), never the corpus; the heavy
  * work stays in the upstream retrievers, each already audited (BM25: two
  * narrow passes + one broadcast stats row; ANN: partition-pruned
  * inverted-list read). Fusion adds one tiny join + one per-query top-k
  * window regardless of corpus size.
  */
object Retrieval {

  /** RRF dampening constant (the SIGIR-2009 default). Final vals here and
    * below: PortableOracles interpolates them during its object init — see
    * the TextAnalysis.Bm25K1 note on the init-cycle hazard. */
  final val RrfC = 60

  /** Per-retriever candidate depth and fused output size for the gate row. */
  final val HybridL = 10
  final val HybridK = 5

  /** The gate row's per-query lexical term sets — query ids match the dense
    * probe vector ids (documents.doc_id = embeddings.vec_id in the fixture),
    * terms drawn from the fixture vocabulary. Shared with the SQL oracle. */
  val HybridTermSets: Seq[(Long, Seq[String])] = Seq(
    0L -> Seq("join", "hash"),
    1L -> Seq("vector", "scan"),
    2L -> Seq("window", "merge"))

  /** lcm(c+1 .. c+maxRank) — the scaling that makes RRF numerators exact
    * integers: lcm/(c+rank) is a whole number for every rank in [1,maxRank],
    * so the fused score Σ lcm/(c+rank_i) is exact Long arithmetic on both
    * engines (no float rounding hazard in the gate). For (c=60, L=10) this
    * is 142,813,628,717,760 ≈ 1.4e14 — a sum of two terms stays far inside
    * Long. Guarded against overflow for larger depths.
    */
  def rrfLcm(c: Int, maxRank: Int): Long =
    (c + 1 to c + maxRank).map(_.toLong).reduce { (a, b) =>
      val g = java.math.BigInteger.valueOf(a).gcd(java.math.BigInteger.valueOf(b)).longValueExact()
      val l = math.multiplyExact(a / g, b)
      require(l <= Long.MaxValue / (c + maxRank),
        s"rrfLcm($c, $maxRank) would overflow Long — use rrfFuse (double scores)")
      l
    }

  /** Normalize a ranked list to (query_id, doc_id, <rankAs>): accepts either
    * an explicit `rank` column or derives dense ranks from (sim desc, id asc)
    * — callers pass retriever output directly. */
  private def ranked(list: DataFrame, rankAs: String): DataFrame = {
    val idCol = if (list.columns.contains("doc_id")) "doc_id" else "cand_id"
    val base =
      if (list.columns.contains("rank"))
        list.select(col("query_id"), col(idCol).as("doc_id"),
          col("rank").cast("long").as(rankAs))
      else {
        val w = Window.partitionBy("query_id")
          .orderBy(col("sim").desc, col(idCol))
        list.select(col("query_id"), col(idCol).as("doc_id"),
          row_number().over(w).cast("long").as(rankAs))
      }
    base
  }

  /** Standard RRF fusion (double scores, rounded for display): full-outer
    * join of the two ranked lists per (query_id, doc_id), score =
    * Σ 1/(c+rank), per-query top-k with deterministic ties (score desc,
    * doc_id asc). */
  def rrfFuse(lexical: DataFrame, dense: DataFrame, k: Int,
              c: Int = RrfC): DataFrame = {
    val fused = ranked(lexical, "lrank")
      .join(ranked(dense, "drank"), Seq("query_id", "doc_id"), "full_outer")
      .select(col("query_id"), col("doc_id"),
        round(
          coalesce(lit(1.0) / (lit(c.toDouble) + col("lrank")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(c.toDouble) + col("drank")), lit(0.0)),
          6).as("rrf"))
    val w = Window.partitionBy("query_id").orderBy(col("rrf").desc, col("doc_id"))
    fused.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "doc_id", "rrf", "rank")
  }

  /** The per-rank EXACT integer numerators lcm/(c+r) for r in 1..maxRank —
    * computed by Long integer division in Scala (lcm is divisible by every
    * c+r by construction) and interpolated into BOTH engines as literals,
    * so no division of any kind runs at query time (an earlier form
    * divided in Spark doubles, which is exact only while the quotient is
    * representable — this form needs no such argument). */
  def rrfNumerators(c: Int, maxRank: Int): Seq[Long] = {
    val l = rrfLcm(c, maxRank)
    (1 to maxRank).map(r => l / (c + r))
  }

  /** N-list RRF fusion with EXACT scaled-integer scores — the oracle-facing
    * view, generalized to any retriever count (round 18: production hybrid
    * stacks fuse ≥ 3 — lexical + dense-exact + dense-quantized, or several
    * query rewrites): rrf_num = Σ_lists lcm/(c+rank) with the per-rank
    * numerators interpolated as Long literals ([[rrfNumerators]]), so the
    * fused score is pure Long addition on both engines. Ordering is
    * identical to [[rrfFuse]] (1/(c+r) and lcm/(c+r) are order-isomorphic;
    * spec-pinned).
    *
    * Ranks beyond `maxRank` are cut before fusing (maxRank IS the fusion
    * depth — without the cut a deeper input would index past the numerator
    * table). Overflow is guarded: n·lcm/(c+1) must fit a Long.
    *
    * Scale shape: the lists UNION (queries × Σdepths rows — broadcast-sized
    * by construction) into ONE (query, doc) aggregate + one per-query top-k
    * window; the heavy work stays in the upstream retrievers. Fusion cost
    * is a measured constant regardless of corpus size. */
  def rrfFuseExactN(lists: Seq[DataFrame], k: Int, maxRank: Int,
                    c: Int = RrfC): DataFrame = {
    require(lists.nonEmpty, "rrfFuseExactN needs at least one ranked list")
    val nums = rrfNumerators(c, maxRank)
    require(nums.head <= Long.MaxValue / lists.size,
      s"rrfFuseExactN(${lists.size} lists, c=$c, maxRank=$maxRank) could " +
      "overflow Long — use rrfFuse (double scores)")
    val numArr = array(nums.map(lit): _*)
    val contrib = lists.map { l =>
      ranked(l, "rank")
        .filter(col("rank") <= maxRank) // the fusion depth, enforced
        .select(col("query_id"), col("doc_id"),
          element_at(numArr, col("rank").cast("int")).as("num"))
    }.reduce(_ unionByName _)
    val fused = contrib.groupBy("query_id", "doc_id")
      .agg(sum("num").as("rrf_num"))
    val w = Window.partitionBy("query_id").orderBy(col("rrf_num").desc, col("doc_id"))
    fused.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "doc_id", "rrf_num", "rank")
  }

  /** Two-list [[rrfFuseExactN]] — the original gate form, unchanged
    * contract. */
  def rrfFuseExact(lexical: DataFrame, dense: DataFrame, k: Int,
                   maxRank: Int, c: Int = RrfC): DataFrame =
    rrfFuseExactN(Seq(lexical, dense), k, maxRank, c)

  /** Multi-query BM25 ranked lists in ONE corpus pass: term frequencies are
    * computed once for the UNION of all query term sets (one tokenize +
    * one broadcast stats row — the [[TextAnalysis.bm25Topk]] shape), then
    * each query's score sums its own terms and the per-query rank window
    * runs over an exploded (query, doc, score) frame. Zero-score docs drop
    * (a doc matching none of a query's terms is not a candidate). */
  def bm25RankedPerQuery(docs: DataFrame, querySets: Seq[(Long, Seq[String])],
                         l: Int): DataFrame = {
    val terms = querySets.flatMap(_._2).distinct
    val perDoc = docs.select(
      col("doc_id") +: Seq(
        graft.functions.ExprUtils.bindOnce(split(col("text"), " ", -1)) { toks =>
          struct(
            size(toks).cast("double").as("dl") +:
            terms.zipWithIndex.map { case (t, i) =>
              size(filter(toks, x => x === lit(t))).cast("double").as(s"tf$i")
            }: _*)
        }.as("s")): _*)
      .select(col("doc_id") +: col("s.dl").as("dl") +:
        terms.indices.map(i => col(s"s.tf$i").as(s"tf$i")): _*)
    val stats = perDoc.agg(
      count(lit(1)).cast("double").as("n"),
      avg("dl").as("avgdl") +:
      terms.indices.map(i =>
        sum((col(s"tf$i") > 0).cast("double")).as(s"df$i")): _*)
    val tIdx = terms.zipWithIndex.toMap
    // the one shared BM25 expression tree (TextAnalysis.bm25ScoreExpr),
    // summed over this query's own term indices
    def score(qts: Seq[String]) = TextAnalysis.bm25ScoreExpr(
      qts.map(tIdx), i => col(s"tf$i"), col("dl"),
      col("n"), col("avgdl"), i => col(s"df$i"))
    // all query scores in one projection, stacked by explode — one pass
    val qs = querySets.map { case (qid, qts) =>
      struct(lit(qid).as("query_id"), round(score(qts), 4).as("score"))
    }
    val scored = perDoc.crossJoin(broadcast(stats))
      .select(col("doc_id"), explode(array(qs: _*)).as("q"))
      .select(col("q.query_id"), col("doc_id"), col("q.score"))
    val w = Window.partitionBy("query_id").orderBy(col("score").desc, col("doc_id"))
    scored.filter(col("score") > 0.0)
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= l)
      .select("query_id", "doc_id", "rank")
  }

  /** Multi-query BM25 ranked lists served ENTIRELY off a maintained
    * lexical index (round 20, the hybrid stack's live lexical leg):
    * `topkFor` supplies each term set's indexed top-L (the
    * [[graft.streaming.LexStatsStream.bm25TopkIndexed]] reader — stats +
    * tf from the index, the corpus nowhere in the read path), ranks from
    * the deterministic (bm25 desc, doc_id) cut. Because the indexed serve
    * rides the shared score tree, each list is bitwise the corpus-pass
    * list whenever the maintained index equals the one-shot build over
    * the corpus it claims to serve — which is what lets the live-fusion
    * oracle replay pure corpus SQL against a churned index. */
  def bm25RankedPerQueryIndexed(topkFor: (Seq[String], Int) => DataFrame,
                                querySets: Seq[(Long, Seq[String])],
                                l: Int): DataFrame = {
    val lists = querySets.map { case (qid, qts) =>
      topkFor(qts, l).select(lit(qid).as("query_id"), col("doc_id"), col("bm25"))
    }.reduce(_ unionByName _)
    val w = Window.partitionBy("query_id").orderBy(col("bm25").desc, col("doc_id"))
    lists
      // the corpus-pass twin's score > 0 guard, kept here for PARITY (and
      // matching the live oracle's WHERE s > 0): a candidate whose BM25
      // ROUNDS to 0.0000 (near-ubiquitous term, idf ≈ 0) must not enter
      // the ranked list on one side only (review finding, r20 s2)
      .filter(col("bm25") > 0.0)
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= l)
      .select("query_id", "doc_id", "rank")
  }

  /** Per-query PROXIMITY ranked lists off the positional postings (round
    * 19, VERDICT r18 item 7 — proximity as a fusion retriever): each
    * query's term pair ranks its co-occurrence docs by (min token distance
    * asc, doc_id asc), top-L. `postingsFor` supplies the bucket-pruned
    * positional posting rows (the [[graft.streaming.LexStatsStream
    * .currentPostingsWithPositions]] reader), so the retriever never
    * touches the corpus — reads O(two terms' postings) per query, exact
    * integer distances, the maintained-index serving shape. */
  def proximityRankedPerQuery(postingsFor: Seq[String] => DataFrame,
                              querySets: Seq[(Long, Seq[String])],
                              l: Int): DataFrame = {
    val lists = querySets.map { case (qid, qts) =>
      require(qts.size == 2, s"proximity query $qid needs a term pair")
      TextAnalysis.proximityMatchOf(postingsFor(qts), qts(0), qts(1),
          maxDist = Int.MaxValue)
        .select(lit(qid).as("query_id"), col("doc_id"), col("min_dist"))
    }.reduce(_ unionByName _)
    val w = Window.partitionBy("query_id").orderBy(col("min_dist"), col("doc_id"))
    lists.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= l)
      .select("query_id", "doc_id", "rank")
  }

  /** The gate composition: BM25 per-query term sets (lexical) ∪ exact-IVF
    * top-L (dense, same query ids as probe vector ids), fused with exact
    * scaled-integer RRF. */
  def hybridTopkRrf(spark: SparkSession, dir: String): DataFrame = {
    val lex = bm25RankedPerQuery(Tables.documents(spark, dir), HybridTermSets, HybridL)
    val dense = Similarity.ivfTopKCached(Tables.embeddings(spark, dir), dir,
      HybridTermSets.map(_._1), k = HybridL, nprobe = 3)
    rrfFuseExact(lex, dense, HybridK, maxRank = HybridL)
      .orderBy("query_id", "rank")
  }

  /** PASSAGE-grain hybrid retrieval (round 20) — the RAG serving stack's
    * actual read shape: sparse recall (BM25 over the maintained CHUNK
    * index — [[graft.streaming.PassageLex]], stats and tf at window grain,
    * the corpus nowhere in the path) fused with dense recall (stub chunk
    * embeddings keyed on content hash — [[Prep.chunkEmbedExpr]], each
    * query embedding its parent doc's FIRST window) via the exact
    * scaled-integer RRF, ranked at pid grain and decomposed back to
    * (doc_id, chunk_idx). Where [[hybridTopkRrf]] answers "which DOCUMENT",
    * this row answers "which WINDOW do I put in the context" — both legs,
    * the fusion, and the tie-breaks all at the grain a RAG prompt is
    * actually assembled from.
    *
    * Scale shape: the lexical leg reads O(query terms' postings) off the
    * bucket-pruned chunk index; the dense leg is one hash-dedup'd embed +
    * a broadcast of 3 query vectors over the chunk frame (the brute-force
    * baseline tier — the IVF-bucketed variant is the embedding tier's
    * machinery, already gated); fusion stays queries × depth. */
  /** The dense leg alone (package-private for the composition spec):
    * per-query chunk-embedding ranked lists at pid grain — query q's
    * vector is its parent doc's first window's embedding, candidates every
    * chunk but the query window itself, rank by (rounded cosine desc, pid). */
  private[graft] def passageDenseRankedOf(docs: DataFrame,
      queryDocIds: Seq[Long]): DataFrame = {
    import graft.streaming.PassageLex
    import graft.functions.{ExprUtils, VectorFunctions}
    val pe = chunkEmbedPidsOf(docs)
    val queryPids = queryDocIds.map(_ * PassageLex.PidMult)
    // probes from a query-doc-SCOPED embed (identical vectors, pure
    // per-doc function) — the broadcast branch would otherwise re-run
    // the full chunk scan just to find 3 windows (pid derives from an
    // explode, so the filter cannot push below it)
    val probes = chunkEmbedPidsOf(
        docs.filter(col("doc_id").isin(queryDocIds: _*)))
      .filter(col("pid").isin(queryPids: _*))
      .select(expr(s"CAST(pid DIV ${PassageLex.PidMult} AS BIGINT)").as("query_id"),
        col("pid").as("qpid"), col("v").as("qv"))
    val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col("pid"))
    pe.join(broadcast(probes), col("pid") =!= col("qpid"))
      .select(col("query_id"), col("pid"),
        ExprUtils.roundz(VectorFunctions.cosine(col("qv"), col("v")), 4).as("sim"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= HybridL)
      .select(col("query_id"), col("pid").as("doc_id"), col("rank"))
  }

  private[graft] def passageDenseRanked(spark: SparkSession,
                                        dir: String): DataFrame =
    passageDenseRankedOf(Tables.documents(spark, dir),
      HybridTermSets.map(_._1))

  /** Seed docs whose FIRST window's embedding seeds the chunk-embedding
    * coarse quantizer (cid = ascending seed rank — the ImageAnn seeding
    * discipline at chunk grain; present at every SF). */
  final val PassageSeedDocs: Seq[Long] =
    Seq(2L, 5L, 11L, 17L, 23L, 31L, 41L, 47L)

  /** Per-pid chunk embeddings — hash-dedup'd embed (never embed a
    * duplicate window) joined back to the pid space. Frame-based so the
    * scale harness can feed amplified corpora. */
  private[graft] def chunkEmbedPidsOf(docs: DataFrame): DataFrame = {
    import graft.streaming.PassageLex
    import graft.functions.Hashing
    val ch = PassageLex.chunkDocs(docs.select("doc_id", "text"))
      .select(col("doc_id").as("pid"), Hashing.h60(col("text")).as("chunk_hash"))
    val e = ch.select("chunk_hash").distinct()
      .select(col("chunk_hash"), Prep.chunkEmbedExpr(col("chunk_hash")).as("v"))
    ch.join(e, "chunk_hash").select(col("pid"), col("v"))
  }

  private def chunkEmbedPids(spark: SparkSession, dir: String): DataFrame =
    chunkEmbedPidsOf(Tables.documents(spark, dir))

  /** The SCOPED variant: chunk + embed ONLY the named parent docs — the
    * window embedding is a pure per-doc function of the text, so the
    * vectors are identical to the full pass's and a seed/query lookup
    * costs a handful-of-docs scan, not a corpus pass (review finding,
    * r20 s2: the indexed serve was paying two corpus-sized passes just
    * to fetch 3 query vectors and 8 seed vectors). */
  private def chunkEmbedPidsOfDocs(spark: SparkSession, dir: String,
                                   docIds: Seq[Long]): DataFrame =
    chunkEmbedPidsOf(Tables.documents(spark, dir)
      .filter(col("doc_id").isin(docIds: _*)))

  /** The chunk-embedding coarse quantizer: [[PassageSeedDocs]]' first
    * windows' vectors, collected driver-side (8 bounded rows — the
    * loadCentroids pattern), cid = ascending seed-pid rank. Fails loud on
    * a missing seed (the ImageAnn.centroidsOf contract — a silent re-rank
    * would shift every cid under the SQL replica's literal ranks). */
  private[graft] def denseCentroidsOf(pe: DataFrame,
      seedPids: Seq[Long]): Seq[(Int, Seq[Double])] = {
    val rows = pe.filter(col("pid").isin(seedPids: _*))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1))).sortBy(_._1).toSeq
    require(rows.size == seedPids.size,
      s"seed chunks missing from the corpus: got ${rows.size} of ${seedPids.size}")
    rows.zipWithIndex.map { case ((_, v), i) => (i, v) }
  }

  def passageDenseCentroids(spark: SparkSession,
                            dir: String): Seq[(Int, Seq[Double])] = {
    import graft.streaming.PassageLex
    denseCentroidsOf(chunkEmbedPidsOfDocs(spark, dir, PassageSeedDocs),
      PassageSeedDocs.map(_ * PassageLex.PidMult))
  }

  /** Materialize the chunk-embedding IVF index — `cluster=`-partitioned
    * inverted lists keyed vec_id = pid, through the embedding tier's
    * [[Similarity.buildIndex]] (same NearestCentroid assignment, same
    * one-shuffle layout: a dense passage query reads ONLY its nprobe
    * lists at 100 TB instead of brute-forcing every window). */
  private[graft] def buildPassageDenseIndexOf(pe: DataFrame,
      cents: Seq[(Int, Seq[Double])], indexDir: String): Unit =
    Similarity.buildIndex(
      pe.select(col("pid").as("vec_id"), col("v").as("embedding")),
      cents, indexDir)

  /** The co-located chunk quantizer path (dot-dir, '='-free — the
    * ImageAnn/rebucket co-location discipline: the seeds that produced a
    * layout travel WITH it). */
  private def chunkQuantizerPath(indexDir: String) = s"$indexDir/.quantizer-chunk"

  def buildPassageDenseIndex(spark: SparkSession, dir: String,
                             indexDir: String): Unit = {
    val cents = passageDenseCentroids(spark, dir) // seed-doc-scoped lookup
    buildPassageDenseIndexOf(chunkEmbedPids(spark, dir), cents, indexDir)
    Similarity.saveCentroids(spark, cents, chunkQuantizerPath(indexDir))
  }

  /** The quantizer an index dir should be queried with: the co-located
    * one when present (every [[buildPassageDenseIndex]] layout), else
    * recomputed from the seed docs (raw [[buildPassageDenseIndexOf]]
    * layouts — the scale harness's per-factor fixtures carry their own). */
  def passageDenseIndexQuantizer(spark: SparkSession, dir: String,
                                 indexDir: String): Seq[(Int, Seq[Double])] = {
    val p = chunkQuantizerPath(indexDir)
    if (graft.functions.FsUtils.fs(spark, p)
        .exists(new org.apache.hadoop.fs.Path(p)))
      Similarity.loadCentroids(spark, p).sortBy(_._1)
    else passageDenseCentroids(spark, dir)
  }

  /** The dense leg served off the IVF layout: probes resolve their nprobe
    * inverted lists driver-side (O(queries·K) rows), the candidate read
    * partition-prunes to those lists, rank by (rounded cosine desc, pid)
    * with the query window itself excluded — [[passageDenseRanked]]'s
    * contract at the pruned-read cost. */
  /** The pruned serve alone, query vectors already in hand (qpid → first
    * window's embedding — a service carries these client-side; the gate
    * row pays the honest lookup through [[passageDenseRankedIndexed]]). */
  private[graft] def passageDenseTopKIndexed(spark: SparkSession,
      indexDir: String, cents: Seq[(Int, Seq[Double])],
      qvs: Seq[(Long, Seq[Double])], nprobe: Int): DataFrame = {
    import spark.implicits._
    import graft.streaming.PassageLex
    import graft.functions.{ExprUtils, VectorFunctions}
    val probeRows = qvs.flatMap { case (qpid, v) =>
      Similarity.nearestClustersLocal(v, cents, nprobe)
        .map(c => (qpid / PassageLex.PidMult, qpid, v, c))
    }
    val probes = probeRows.toDF("query_id", "qpid", "qv", "cluster")
    val probed = probeRows.map(_._4).distinct
    val cands = spark.read.parquet(indexDir)
      .filter(col("cluster").isin(probed: _*))
      .select(col("vec_id").as("pid"), col("v").as("cv"), col("cluster"))
    val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col("pid"))
    broadcast(probes).join(cands, Seq("cluster"))
      .filter(col("pid") =!= col("qpid"))
      .select(col("query_id"), col("pid"),
        ExprUtils.roundz(VectorFunctions.cosine(col("qv"), col("cv")), 4).as("sim"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= HybridL)
      .select(col("query_id"), col("pid").as("doc_id"), col("rank"))
  }

  private[graft] def passageDenseRankedIndexed(spark: SparkSession, dir: String,
                                               indexDir: String,
                                               nprobe: Int = 3): DataFrame = {
    import graft.streaming.PassageLex
    val queryDocs = HybridTermSets.map(_._1)
    val qpids = queryDocs.map(_ * PassageLex.PidMult)
    // query-doc-scoped lookup (3 docs), co-located quantizer: the serve
    // pays the pruned candidate read, nothing corpus-sized
    val qvs = chunkEmbedPidsOfDocs(spark, dir, queryDocs)
      .filter(col("pid").isin(qpids: _*))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1))).sortBy(_._1).toSeq
    passageDenseTopKIndexed(spark, indexDir,
      passageDenseIndexQuantizer(spark, dir, indexDir), qvs, nprobe)
  }

  private def fusePassage(lex: DataFrame, dense: DataFrame): DataFrame = {
    import graft.streaming.PassageLex
    rrfFuseExact(lex, dense, HybridK, maxRank = HybridL)
      .select(col("query_id"),
        expr(s"CAST(doc_id DIV ${PassageLex.PidMult} AS BIGINT)").as("doc_id"),
        pmod(col("doc_id"), lit(PassageLex.PidMult)).as("chunk_idx"),
        col("rrf_num"), col("rank"))
      .orderBy("query_id", "rank")
  }

  private def passageLexRanked(spark: SparkSession,
                               stateDir: String): DataFrame =
    // batched leg (round 21 opt): one stats lookup + one postings pass for
    // all three query sets instead of a per-set serve composition — see
    // TextAnalysis.bm25RankedPerQueryIndexedBatch (equivalence spec-pinned)
    graft.streaming.LexStatsStream.bm25RankedPerQueryIndexed(
      spark, stateDir, HybridTermSets, HybridL)

  def hybridPassageTopk(spark: SparkSession, dir: String,
                        stateDir: String): DataFrame =
    fusePassage(passageLexRanked(spark, stateDir),
      passageDenseRanked(spark, dir))

  /** [[hybridPassageTopk]] with the dense leg served off the
    * chunk-embedding IVF index instead of the brute-force pass — the
    * SCALE-PATH fusion read: both legs now pruned reads (postings buckets
    * × inverted lists), nothing corpus-sized at query time. The ranked
    * lists may legitimately differ from the brute-force row's (IVF recall
    * is nprobe-bounded); the oracle replays the same restriction. */
  def hybridPassageTopkIndexed(spark: SparkSession, dir: String,
                               stateDir: String, indexDir: String): DataFrame =
    fusePassage(passageLexRanked(spark, stateDir),
      passageDenseRankedIndexed(spark, dir, indexDir))

  /** The LIVE fusion at passage grain: the lexical leg reads the
    * CHURNED + compacted chunk index (a deleted doc's windows cannot
    * surface, an edited doc's re-chunked tail scores fresh), the dense
    * leg embeds the live (v2) corpus — one corpus event cascades into
    * both legs of the RAG serving read. The doc-grain `hybrid_topk_live`
    * proves the stack's lifecycle consistency at document grain; this row
    * proves it at the grain the prompt is assembled from. */
  def hybridPassageTopkLive(spark: SparkSession, dir: String,
                            churnedStateDir: String): DataFrame =
    fusePassage(passageLexRanked(spark, churnedStateDir),
      passageDenseRankedOf(
        TextAnalysis.lexLiveV2Of(Tables.documents(spark, dir)),
        HybridTermSets.map(_._1)))

  // --- MMR diversified re-ranking -------------------------------------------

  /** MMR gate parameters: λ (relevance weight) and the selected count. */
  final val MmrLambda = 0.5
  final val MmrK = 5

  /** Row shape of [[mmrRerank]]. */
  case class MmrRow(query_id: Long, cand_id: Long, mmr: Double, rank: Long)

  /** Maximal Marginal Relevance re-ranking (Carbonell & Goldstein, SIGIR
    * 1998): greedily select k pool candidates maximizing
    * λ·rel(d) − (1−λ)·max_{s∈Selected} sim(d, s) — the diversification
    * pass a retrieval stack runs between candidate generation and serving
    * (near-duplicate hits waste result slots; MMR spends them on coverage).
    * The empty-set penalty is 0 (the first pick is pure relevance); later
    * penalties use the true max, negative cosines included.
    *
    * Scale shape: the greedy loop is inherently sequential PER QUERY but
    * bounded by the pool (≤ L rows), so it runs inside one `cogroup` group
    * per query — distributed over queries, O(L²) work per group, nothing
    * corpus-sized anywhere. The candidate-pair similarity table is built
    * DECLARATIVELY first (pool self-join per query, ≤ queries·L² rows,
    * the proven round(cosine,4) kernel), so the in-group code does only
    * comparisons and max-folds over already-rounded doubles — every float
    * the oracle must reproduce comes out of the shared kernel, none out of
    * ad-hoc Scala arithmetic.
    *
    * `pool`: (query_id, cand_id, rel) with rel the ROUNDED relevance (the
    * retriever's sim). `vectors`: (vec_id, embedding) for the pool ids.
    */
  def mmrRerank(pool: DataFrame, vectors: DataFrame, k: Int = MmrK,
                lambda: Double = MmrLambda): DataFrame = {
    val spark = pool.sparkSession
    import spark.implicits._
    import graft.functions.{ExprUtils, VectorFunctions}
    val v = vectors.select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val withV = pool.select(col("query_id"), col("cand_id"), col("rel"))
      .join(v, col("cand_id") === col("vec_id")).drop("vec_id")
    val a = withV.select(col("query_id"), col("cand_id").as("id_a"), col("v").as("va"))
    val b = withV.select(col("query_id"), col("cand_id").as("id_b"), col("v").as("vb"))
    val psim = a.join(b, Seq("query_id")).filter(col("id_a") =!= col("id_b"))
      .select(col("query_id"), col("id_a"), col("id_b"),
        ExprUtils.roundz(VectorFunctions.cosine(col("va"), col("vb")), 4).as("sim"))
    val poolDs = withV.select(col("query_id"), col("cand_id"), col("rel"))
      .as[(Long, Long, Double)].groupByKey(_._1)
    val simDs = psim.as[(Long, Long, Long, Double)].groupByKey(_._1)
    val oneMinus = 1.0 - lambda
    poolDs.cogroup(simDs) { (q, poolIt, simIt) =>
      // cand-ascending order + strict > in the argmax scan = smallest id
      // wins ties, mirroring the oracle's (score DESC, cand_id ASC) window
      val remaining = poolIt.map(r => (r._2, r._3)).toArray.sortBy(_._1).toBuffer
      val sims = simIt.map(r => ((r._2, r._3), r._4)).toMap
      val maxsim = scala.collection.mutable.Map.empty[Long, Double]
      val out = Seq.newBuilder[MmrRow]
      var rank = 1L
      while (rank <= k && remaining.nonEmpty) {
        var best = -1
        var bestScore = Double.NegativeInfinity
        var i = 0
        while (i < remaining.length) {
          val (c, rel) = remaining(i)
          val score = lambda * rel - oneMinus * maxsim.getOrElse(c, 0.0)
          if (score > bestScore) { best = i; bestScore = score }
          i += 1
        }
        val sel = remaining(best)._1
        out += MmrRow(q, sel, bestScore, rank)
        remaining.remove(best)
        remaining.foreach { case (c, _) =>
          sims.get((c, sel)).foreach { s =>
            maxsim(c) = maxsim.get(c).fold(s)(math.max(_, s))
          }
        }
        rank += 1L
      }
      out.result().iterator
    }.toDF()
      .withColumn("mmr", ExprUtils.roundz(col("mmr"), 6))
      .select("query_id", "cand_id", "mmr", "rank")
  }

  /** The MMR gate composition: exact-IVF top-10 pool (probe ids 0/1/2),
    * diversified to k=5 — rel is the retriever's rounded sim, vectors come
    * from the embeddings table. */
  def mmrRerankGate(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir)
    val pool = Similarity.ivfTopKCached(e, dir,
        HybridTermSets.map(_._1), k = HybridL, nprobe = 3)
      .select(col("query_id"), col("cand_id"), col("sim").as("rel"))
    mmrRerank(pool, e).orderBy("query_id", "rank")
  }

  // --- retrieval-quality evaluation -------------------------------------------

  /** DCG position weights 1/log₂(r+1) for ranks 1..k. */
  def dcgWeights(k: Int): Seq[Double] =
    (1 to k).map(r => 1.0 / (math.log(r + 1.0) / math.log(2.0)))

  /** FIXED-POINT DCG weights (×10⁶, rounded): computed once in Scala and
    * interpolated into BOTH engines as integer literals — no libm log₂
    * runs on either side, and the per-query DCG sum is exact Long
    * arithmetic (double sums of ≥3 terms are summation-order-dependent
    * across engines; integer sums are not). The 1e-6 weight quantization
    * is a documented metric definition, not an approximation of one
    * engine by the other. */
  def dcgWeightsFp(k: Int): Seq[Long] =
    dcgWeights(k).map(w => math.round(w * 1e6))

  /** Retrieval-quality evaluation: score an approximate retriever's top-k
    * against exact ground truth, per query — the measurement loop every
    * ANN deployment runs (is nprobe high enough? did quantization hurt
    * recall?), expressed as a QUERY over the two result sets:
    *
    *  - recall@k = |approx ∩ exact| / k
    *  - MRR      = 1 / rank of the first relevant hit (0 when none)
    *  - nDCG@k   = Σ_hits w(rank) / Σ_{r≤k} w(r), w = [[dcgWeights]]
    *
    * Both inputs are (query_id, cand_id, sim)-ranked frames (rank derived
    * by the retriever's own sim-desc/cand-asc order). The join runs over
    * the RANKED LISTS (queries × k rows), never a corpus. */
  def evalTopk(approx: DataFrame, exact: DataFrame, k: Int): DataFrame = {
    val w = dcgWeightsFp(k)
    val idcg = w.sum
    // bound BOTH sides to rank ≤ k: a retriever list deeper than k would
    // otherwise index past the k-element weight table (null wt silently
    // zeroing nDCG terms) and inflate recall's numerator past 1
    val ranked = ranked2(approx).filter(col("rank") <= k)
    val truth = ranked2(exact).filter(col("rank") <= k)
      .select(col("query_id"), col("doc_id"))
    val hits = ranked.join(truth.withColumn("hit", lit(1)),
        Seq("query_id", "doc_id"), "left")
      .select(col("query_id"), col("rank"),
        coalesce(col("hit"), lit(0)).as("hit"),
        // rank-indexed fixed-point weight — exact Long on both engines
        element_at(array(w.map(lit): _*), col("rank").cast("int")).as("wt"))
    hits.groupBy("query_id")
      .agg(
        sum(col("hit")).cast("long").as("n_hits"),
        round4(sum(col("hit")).cast("double") / lit(k.toDouble)).as("recall"),
        round6(
          coalesce(lit(1.0) / min(when(col("hit") === 1, col("rank"))), lit(0.0))
        ).as("mrr"),
        round4(
          sum(when(col("hit") === 1, col("wt")).otherwise(lit(0L))).cast("double")
            / lit(idcg.toDouble)
        ).as("ndcg"))
      .orderBy("query_id")
  }

  private def round4(c: org.apache.spark.sql.Column) =
    graft.functions.ExprUtils.roundz(c, 4)

  private def round6(c: org.apache.spark.sql.Column) =
    graft.functions.ExprUtils.roundz(c, 6)

  /** [[ranked]] for eval inputs (sim-ranked or pre-ranked). */
  private def ranked2(list: DataFrame): DataFrame = ranked(list, "rank")

  /** The eval gate composition: the IVF retriever (k=3, nprobe=3, probes
    * 0–4 — the ann_ivf_topk query) scored against brute-force exact top-3
    * ground truth. */
  def retrievalEvalGate(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir)
    val probeIds = Seq(0L, 1L, 2L, 3L, 4L)
    val approx = Similarity.ivfTopKCached(e, dir, probeIds, k = 3, nprobe = 3)
    val exact = Similarity.bruteForceTopK(e, probeIds, k = 3)
    evalTopk(approx, exact, k = 3)
  }
}
