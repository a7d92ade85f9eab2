package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.ExprUtils.bindOnce

/** Cross-slice corpus overlap analytics: how much vocabulary do two slices
  * of a corpus share? The question a training-data curator asks before
  * mixing sources ("are these two crawls near-copies?"), before weighting a
  * mixture (diversity across sources), and after splitting (did the split
  * leak one source's idiom into both sides). The reference has no analogue
  * — this is charter surface (LLM-pipeline corpus analytics), same family
  * as `docs_by_source` / `token_freq_by_source` but SET algebra across
  * slices instead of per-slice counts.
  *
  * Unit of overlap: word BIGRAMS, not unigrams. Unigram vocabularies
  * saturate (any two large English corpora share ~all common words —
  * measured 0.97–1.0 Jaccard on the driver corpus); bigram sets keep
  * discriminating power (measured 0.54–0.70 here) and are the cheapest
  * n-gram that does.
  *
  * Scale shape (100 TB posture):
  *  - [[slices]]: explode bigrams → ONE distinct exchange on (slice, gram).
  *    Everything downstream works on the deduplicated vocabulary, which is
  *    sublinear in corpus size (vocabulary growth ~ Heaps' law).
  *  - [[overlapExact]]: pairwise intersections via a gram-keyed equi-join
  *    with partial-aggregated counts — linear in vocab, never in pairs;
  *    slice sizes broadcast (one row per slice).
  *  - [[overlapSketch]]: the exchange-free path — per-slice MinHash
  *    signatures fold map-side to `numPerm` longs per slice (elementwise
  *    min is commutative+associative), so the only shuffled state is
  *    slices × numPerm longs REGARDLESS of corpus size. The estimate is
  *    Broder's matching-component fraction. This is what runs at 100 TB;
  *    the exact matrix is the audit.
  */
object CorpusOverlap {

  /** Adjacent-word bigrams of `text`; a document with fewer than two words
    * contributes nothing (empty array). zip_with over two offset slices —
    * narrow, codegen, no explode until the caller asks.
    */
  def bigrams(text: Column): Column =
    bindOnce(split(text, " ", -1)) { w =>
      zip_with(
        slice(w, lit(1), greatest(size(w) - 1, lit(0))),
        slice(w, lit(2), greatest(size(w) - 1, lit(0))),
        (a, b) => concat(a, lit(" "), b))
    }

  /** Distinct (slice, gram) vocabulary — the one exchange every overlap
    * query shares.
    *
    * The explicit not-null filter is LOAD-BEARING for that sharing: the
    * downstream consumers impose different implied constraints (the
    * intersection join pushes `isnotnull(g)` into its branches, the size
    * aggregate does not need it), and Catalyst pushes each consumer's
    * constraints below the distinct — subtrees that canonicalize
    * differently, which AQE stage reuse then can't merge. Measured on the
    * executed `source_overlap` plan: without this filter 2 corpus scans /
    * 2 reused exchanges; with it 1 scan / 3 reused — every branch of the
    * diamond hangs off ONE exchange (spec-pinned in PlanInvariantsSpec).
    */
  def sliceVocab(docs: DataFrame, textCol: String, sliceCol: String): DataFrame =
    sliceGrams(docs, textCol, sliceCol).distinct()

  /** [[sliceVocab]] WITHOUT the distinct — every bigram occurrence. The
    * MinHash fold ([[sliceSignatures]]) is a min aggregate, and min is
    * idempotent: min over the occurrence multiset ≡ min over the distinct
    * vocabulary, element for element (r20 opt — spec-pinned in
    * OverlapStreamSpec). NOTE: folding occurrences directly was built and
    * then rejected for the serve gate — with [[MinHashFold]] making the
    * fold cheap, hashing the sublinear DISTINCT vocabulary beats hashing
    * every occurrence (ScaleBench overlap_serve_*_vg: 2.39 s vs 24.37 s at
    * 64× vocab growth). Kept as the legality proof and for callers whose
    * input is already near-distinct.
    */
  def sliceGrams(docs: DataFrame, textCol: String, sliceCol: String): DataFrame =
    docs.select(col(sliceCol).as("slice"), explode(bigrams(col(textCol))).as("g"))
      .filter(col("slice").isNotNull && col("g").isNotNull)

  /** Exact pairwise overlap matrix over slices: intersection size, Jaccard,
    * and containment (intersection over the SMALLER side — the asymmetric
    * "is A inside B" signal Jaccard dilutes when sizes differ).
    *
    * COMPLETE over slice pairs: the pair frame comes from the size
    * aggregate's self-join (every slice appears there), and disjoint pairs
    * survive the left join as n_common = 0 / jaccard 0.0. Deriving pairs
    * from the intersection join instead would silently drop exactly the
    * zero-overlap pairs — the ones where a nonzero sketch estimate is the
    * false positive [[overlapSketch]]'s tolerance audit exists to catch.
    */
  def overlapExact(vocab: DataFrame): DataFrame = {
    val sz = vocab.groupBy("slice").agg(count(lit(1)).as("n"))
    val inter = vocab.as("a")
      .join(vocab.as("b"),
        col("a.g") === col("b.g") && col("a.slice") < col("b.slice"))
      .groupBy(col("a.slice").as("slice_a"), col("b.slice").as("slice_b"))
      .agg(count(lit(1)).as("n_common"))
    val pairs = sz.as("x").join(sz.as("y"), col("x.slice") < col("y.slice"))
      .select(col("x.slice").as("slice_a"), col("y.slice").as("slice_b"),
        col("x.n").as("na"), col("y.n").as("nb"))
    pairs.join(broadcast(inter), Seq("slice_a", "slice_b"), "left")
      .select(
        col("slice_a"), col("slice_b"),
        coalesce(col("n_common"), lit(0L)).as("n_common"),
        round(coalesce(col("n_common"), lit(0L)).cast("double") /
          (col("na") + col("nb") - coalesce(col("n_common"), lit(0L))), 4)
          .as("jaccard"),
        round(coalesce(col("n_common"), lit(0L)).cast("double") /
          least(col("na"), col("nb")), 4).as("containment"))
  }

  /** Per-slice MinHash signature over the bigram vocabulary: each
    * (slice, gram) row is hashed ONCE (`pmod(xxhash64(g), 2³²)` — the same
    * base hash [[Dedup.minhashSignature]] uses), and each of the `numPerm`
    * signature components is a declarative `min((aᵢ·h + bᵢ) mod P)`
    * aggregate over that one hash — the single-hash affine MinHash kernel.
    * Min is commutative and associative, so Spark partial-aggregates all
    * `numPerm` components map-side in ONE whole-stage-codegen hash
    * aggregate and the exchange carries slices × numPerm longs, not the
    * vocabulary. (Dedup's [[Dedup.minhashSignature]] mins WITHIN one row's
    * shingle array; this mins ACROSS rows of a group — same permutation
    * family, seeded identically, so the output is bit-identical to folding
    * per-row signatures through [[mergeSignatures]]: the previous
    * formulation, which paid a ×numPerm posexplode plus two extra
    * aggregations — measured 6× slower at sf0.1 — and survives as the
    * equivalence pin in OverlapStreamSpec.)
    */
  def sliceSignatures(vocab: DataFrame, numPerm: Int,
                      hashFn: Column => Column = xxhash64(_)): DataFrame = {
    // r20 opt: ONE imperative fold (org.apache.spark.sql.graft.MinHashFold
    // — primitive long buffer, tight update loop) instead of numPerm
    // declarative min buffers: at numPerm=128 the declarative form's
    // generated update method is large enough that whole-stage codegen ran
    // SLOWER than interpreted (1.92 s vs 1.29 s at 8× corpus; fold ~0.9 s).
    // Bit-identical (spec-pinned below + in OverlapStreamSpec); the
    // declarative form survives as [[sliceSignaturesDeclarative]].
    import org.apache.spark.sql.graft.{ColumnBridge, MinHashFold}
    val perms = Dedup.permutations(numPerm)
    val fold = ColumnBridge.column(
      MinHashFold(
        ColumnBridge.expression(pmod(hashFn(col("g")), lit(1L << 32))),
        perms.map(_._1).toArray, perms.map(_._2).toArray)
        .toAggregateExpression())
    vocab.groupBy("slice").agg(fold.as("sig"))
  }

  /** Reference declarative formulation of [[sliceSignatures]] — kept for
    * the equivalence spec (the minhashSignatureHof precedent). */
  private[graft] def sliceSignaturesDeclarative(vocab: DataFrame, numPerm: Int,
      hashFn: Column => Column = xxhash64(_)): DataFrame = {
    val perms = Dedup.permutations(numPerm)
    val mins = perms.zipWithIndex.map { case ((a, b), i) =>
      min(pmod(lit(a) * col("h") + lit(b), lit(Dedup.MersennePrime))).as(s"m$i")
    }
    vocab.withColumn("h", pmod(hashFn(col("g")), lit(1L << 32)))
      .groupBy("slice")
      .agg(mins.head, mins.tail: _*)
      .select(col("slice"),
        array((0 until numPerm).map(i => col(s"m$i")): _*).as("sig"))
  }

  /** Broder's estimate from a signature table (slice, sig): pairwise
    * fraction of matching components. Slices × slices rows of numPerm longs
    * — driver-free, but tiny enough to broadcast-nested-loop.
    *
    * The denominator is the ACTUAL signature width (and both sides must
    * agree on it): persisted signatures written with a different numPerm
    * than the reader assumes would otherwise null-pad through zip_with and
    * silently mis-scale the estimate instead of erroring.
    */
  def estimateFromSignatures(sigs: DataFrame, numPerm: Int): DataFrame =
    sigs.as("a")
      .join(sigs.as("b"), col("a.slice") < col("b.slice"))
      .select(
        col("a.slice").as("slice_a"), col("b.slice").as("slice_b"),
        (size(filter(zip_with(col("a.sig"), col("b.sig"), (x, y) => x === y),
          m => m)).cast("double") /
          when(size(col("a.sig")) === numPerm && size(col("b.sig")) === numPerm,
            lit(numPerm))
            .otherwise(raise_error(concat(lit(s"signature width != numPerm=$numPerm for slices ("),
              col("a.slice"), lit(", "), col("b.slice"), lit(")"))))).as("est"))

  /** Sketch-estimated overlap matrix with its own exact audit: emits, per
    * slice pair, the exact Jaccard plus whether the MinHash estimate landed
    * within `tol` of it (the `dedup_metrics_approx` gate pattern — the
    * estimate itself is hash-seeded engine arithmetic DuckDB can't
    * replicate, so the PORTABLE claim is the tolerance bound, with exact
    * values carried alongside for the hash compare).
    */
  def overlapSketch(vocab: DataFrame, numPerm: Int, tol: Double): DataFrame = {
    val est = estimateFromSignatures(sliceSignatures(vocab, numPerm), numPerm)
    overlapExact(vocab).as("e")
      .join(est, Seq("slice_a", "slice_b"))
      .select(col("slice_a"), col("slice_b"), col("jaccard"),
        (abs(col("est") - col("jaccard")) <= tol).as(s"est_within_tol"))
  }

  /** Elementwise-min merge of signature rows sharing a slice — the fold
    * that makes signatures INCREMENTAL: min is associative, commutative,
    * and idempotent, so signatures computed over any partition of the
    * corpus into batches (including replayed batches) merge to exactly the
    * whole-corpus signature. [[graft.streaming.OverlapStream]] builds on
    * this. */
  def mergeSignatures(sigs: DataFrame): DataFrame =
    sigs.select(col("slice"), posexplode(col("sig")).as(Seq("pos", "x")))
      .groupBy("slice", "pos").agg(min("x").as("m"))
      .groupBy("slice")
      .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("pm"))
      .select(col("slice"), transform(col("pm"), p => p.getField("m")).as("sig"))

  // --- gate queries ---------------------------------------------------------

  // Tables.fanOut below each gate (r20 opt): the explode + partial-distinct
  // / partial-min map side otherwise runs in the single-row-group scan's
  // ONE task; all consumers are aggregations + a unique-pair final sort,
  // so row order is free to change (oracle hash re-proven)
  // (r20 opt) fanOut measured HURTFUL here (0.66 -> 1.02 s min-of-5): the
  // exact matrix is bounded by the (slice, g) distinct exchange, and a
  // 32-way map side divides the partial-distinct dedup efficiency, growing
  // that exchange; the sketch twins keep fanOut because their md5+perm CPU
  // dominates. Left on the 1-task scan deliberately.
  def sourceOverlap(spark: SparkSession, dir: String): DataFrame =
    overlapExact(sliceVocab(Tables.documents(spark, dir), "text", "source"))
      .orderBy("slice_a", "slice_b")

  def sourceOverlapSketch(spark: SparkSession, dir: String,
                          numPerm: Int = 128, tol: Double = 0.15): DataFrame =
    overlapSketch(sliceVocab(Tables.fanOut(Tables.documents(spark, dir)), "text", "source"),
      numPerm, tol)
      .orderBy("slice_a", "slice_b")


  /** The SERVING form of the sketch — what a 100 TB monitor actually runs:
    * signatures + Broder estimate ONLY, no exact-matrix audit riding the
    * query. On the portable h60 base hash the whole pipeline is
    * DuckDB-replicable (same permutation family interpolated as literals),
    * so unlike the audited gate twin this one's ESTIMATE is hash-compared
    * directly — and the query pays just the vocab scan + the flat
    * slices × numPerm fold. */
  def sourceOverlapSketchServe(spark: SparkSession, dir: String,
                               numPerm: Int = 128): DataFrame =
    // sliceVocab deliberately kept (r20 opt postscript): an occurrence-fold
    // (sliceGrams — legal since min is idempotent, spec-pinned) was built
    // and SWEPT SLOWER once MinHashFold made the fold cheap — dedup-first
    // hashes the sublinear vocabulary (Heaps' law), the occurrence form
    // hashes every token pair (ScaleBench overlap_serve_*_vg, 64×: 2.39 s
    // vs 24.37 s). The scaladoc's original scale argument stands; the r20
    // win here is the fold itself plus fanOut.
    estimateFromSignatures(
        sliceSignatures(sliceVocab(Tables.fanOut(Tables.documents(spark, dir)), "text", "source"),
          numPerm, graft.functions.Hashing.h60),
        numPerm)
      .select(col("slice_a"), col("slice_b"), round(col("est"), 4).as("est"))
      .orderBy("slice_a", "slice_b")

  /** Line-for-line mirror of [[sourceOverlapSketchServe]]: same bigram
    * vocab, h60 % 2^32 base hash, the same (a·h + b) mod P permutation
    * family as SQL literals, per-slice component minima, matching-component
    * fraction. */
  def sourceOverlapSketchServeSql(numPerm: Int = 128): String = {
    val permsLit = Dedup.permutations(numPerm)
      .map { case (a, b) => s"[$a,$b]" }.mkString("[", ",", "]")
    val P = Dedup.MersennePrime
    s"""WITH tok AS (
       |  SELECT doc_id, source, UNNEST(STR_SPLIT(text, ' ')) AS t,
       |         GENERATE_SUBSCRIPTS(STR_SPLIT(text, ' '), 1) AS i
       |  FROM documents),
       |g AS (SELECT DISTINCT a.source AS slice, a.t || ' ' || b.t AS g
       |      FROM tok a JOIN tok b ON a.doc_id = b.doc_id AND b.i = a.i + 1),
       |h AS (SELECT slice, ${graft.functions.Hashing.h60Sql("g")} % 4294967296 AS h FROM g),
       |hs AS (SELECT slice, list(h) AS hl FROM h GROUP BY slice),
       |s AS (SELECT slice, list_transform($permsLit,
       |        pm -> list_min(list_transform(hl, x -> (pm[1] * x + pm[2]) % $P))) AS sig
       |      FROM hs)
       |SELECT a.slice AS slice_a, b.slice AS slice_b,
       |ROUND(CAST(LEN(list_filter(range(1, $numPerm + 1), i -> a.sig[i] = b.sig[i])) AS DOUBLE)
       |      / $numPerm, 4) AS est
       |FROM s a JOIN s b ON a.slice < b.slice
       |ORDER BY 1, 2""".stripMargin
  }

  /** DuckDB mirror: bigrams via an index self-join (positions from
    * GENERATE_SUBSCRIPTS), then the same distinct → intersect → ratio
    * pipeline. */
  val sourceOverlapSql: String =
    """WITH tok AS (
      |  SELECT doc_id, source, UNNEST(STR_SPLIT(text, ' ')) AS t,
      |         GENERATE_SUBSCRIPTS(STR_SPLIT(text, ' '), 1) AS i
      |  FROM documents),
      |g AS (SELECT DISTINCT a.source AS slice, a.t || ' ' || b.t AS g
      |      FROM tok a JOIN tok b ON a.doc_id = b.doc_id AND b.i = a.i + 1),
      |sz AS (SELECT slice, COUNT(*) AS n FROM g GROUP BY slice),
      |p AS (SELECT x.slice AS slice_a, y.slice AS slice_b, x.n AS na, y.n AS nb
      |      FROM sz x JOIN sz y ON x.slice < y.slice),
      |i AS (SELECT a.slice AS slice_a, b.slice AS slice_b, COUNT(*) AS n_common
      |      FROM g a JOIN g b ON a.g = b.g AND a.slice < b.slice GROUP BY 1, 2)
      |SELECT p.slice_a, p.slice_b, COALESCE(i.n_common, 0) AS n_common,
      |ROUND(CAST(COALESCE(i.n_common, 0) AS DOUBLE) / (na + nb - COALESCE(i.n_common, 0)), 4) AS jaccard,
      |ROUND(CAST(COALESCE(i.n_common, 0) AS DOUBLE) / LEAST(na, nb), 4) AS containment
      |FROM p LEFT JOIN i ON p.slice_a = i.slice_a AND p.slice_b = i.slice_b
      |ORDER BY 1, 2""".stripMargin

  /** Oracle for the sketch twin: exact Jaccard + the tolerance claim as a
    * constant TRUE — the driver's hash compare then fails iff any engine
    * estimate strays outside tol. */
  val sourceOverlapSketchSql: String =
    """WITH tok AS (
      |  SELECT doc_id, source, UNNEST(STR_SPLIT(text, ' ')) AS t,
      |         GENERATE_SUBSCRIPTS(STR_SPLIT(text, ' '), 1) AS i
      |  FROM documents),
      |g AS (SELECT DISTINCT a.source AS slice, a.t || ' ' || b.t AS g
      |      FROM tok a JOIN tok b ON a.doc_id = b.doc_id AND b.i = a.i + 1),
      |sz AS (SELECT slice, COUNT(*) AS n FROM g GROUP BY slice),
      |p AS (SELECT x.slice AS slice_a, y.slice AS slice_b, x.n AS na, y.n AS nb
      |      FROM sz x JOIN sz y ON x.slice < y.slice),
      |i AS (SELECT a.slice AS slice_a, b.slice AS slice_b, COUNT(*) AS n_common
      |      FROM g a JOIN g b ON a.g = b.g AND a.slice < b.slice GROUP BY 1, 2)
      |SELECT p.slice_a, p.slice_b,
      |ROUND(CAST(COALESCE(i.n_common, 0) AS DOUBLE) / (na + nb - COALESCE(i.n_common, 0)), 4) AS jaccard,
      |TRUE AS est_within_tol
      |FROM p LEFT JOIN i ON p.slice_a = i.slice_a AND p.slice_b = i.slice_b
      |ORDER BY 1, 2""".stripMargin
}
