package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.Hashing.{h60, h60Sql}
import graft.functions.ExprUtils.{roundz, roundzSql}

/** Hashed-feature statistical models over `documents` — the "model-based
  * filtering" tier of a curation stack (the fastText/classifier-scoring
  * shape of FineWeb-Edu-style quality filters, and CCNet-style LM-perplexity
  * filtering), built on FEATURE HASHING (Weinberger et al. 2009): every
  * gram is bucketed by `h60(gram) mod K`, so model state is O(K) — a fixed
  * few thousand doubles — REGARDLESS of corpus vocabulary. This is the
  * structural answer to the open-vocabulary problem that
  * [[TextAnalysis.cappedVocabStats]] solves by top-k truncation: hashing
  * caps state by construction, with collision noise instead of a floor.
  *
  * Scale shape (both models):
  *  - TRAIN is one explode → hash → groupBy(bucket) aggregate: map-side
  *    combining collapses the token stream to ≤ K rows per partition before
  *    the only shuffle, which carries ≤ K·partitions rows at any corpus
  *    size; driver state is ≤ K rows (the
  *    `Similarity.trainedCentroids` ship-the-small-model contract).
  *  - SCORE is one narrow projection per doc — the bucket weights ride the
  *    plan as an O(K) literal map, no join, no shuffle above the scan.
  *
  * Hash knob: every entry point takes `hashFn` (default [[h60]] so the
  * gate gets an exact DuckDB oracle; production callers pass `xxhash64` —
  * the Dedup convention — for the same plan at a fraction of the per-gram
  * cost, the dominant constant in the perplexity scorer's sweep).
  *
  * Portability (the DSIR/BM25 precedent): bucket counts are exact integers,
  * weights are IEEE divisions of exact operands in fixed order; the only
  * libm calls (`ln`, `exp`) are applied identically per gram and summed
  * left-to-right in gram order on both engines, absorbed by round(_, 4).
  */
object HashedModel {

  /** Scoring features: unigrams + TRUE word bigrams, in document order
    * (the unigram block then the bigram block — the oracle mirrors the
    * same concatenation order so ordered summation matches). The embedded
    * space both identifies a bigram and drops wordShingles' n<2
    * pseudo-gram (`[text]` for single-word docs) — those docs contribute
    * their word exactly once. The same one-space-or-not split is what
    * lets [[trainModelStack]] train classifier AND LM from one stream. */
  def featureArray(textCol: Column): Column =
    concat(split(textCol, " ", -1),
      filter(Dedup.wordShingles(textCol, 2), g => instr(g, " ") > 0))

  /** DuckDB mirror of [[featureArray]]. */
  private val featuresSqlExpr: String = {
    val w = "STR_SPLIT(text, ' ')"
    s"""($w || CASE WHEN LEN($w) >= 2
       | THEN list_transform(range(0, LEN($w) - 1), i -> $w[i+1] || ' ' || $w[i+2])
       | ELSE CAST([] AS VARCHAR[]) END)""".stripMargin.replace("\n", "")
  }

  /** Per-bucket (raw, target) gram counts — ≤ k rows, collected. */
  private[operators] case class BucketStats(
      buckets: Array[Int], nr: Array[Long], nt: Array[Long]) {
    def totalRaw: Double = nr.sum.toDouble
    def totalTgt: Double = nt.sum.toDouble
  }

  private def bucketStats(feats: DataFrame, k: Int,
                          hashFn: Column => Column): BucketStats = {
    val rows = feats
      .select(pmod(hashFn(col("g")), lit(k.toLong)).cast("int").as("b"), col("tgt"))
      .groupBy("b")
      .agg(count(lit(1)).as("nr"), sum(when(col("tgt"), 1L).otherwise(0L)).as("nt"))
      .collect() // ≤ k rows — bounded driver state by construction
      .sortBy(_.getInt(0))
    BucketStats(rows.map(_.getInt(0)), rows.map(_.getLong(1)), rows.map(_.getLong(2)))
  }

  // --- hashed naive-Bayes quality/domain classifier --------------------------

  /** Hashed linear classifier score of each document against the
    * `targetLang` slice: per-bucket multinomial naive-Bayes log-odds
    *
    *   w_b = ln( ((nt_b + α)/(tt + αK)) / ((nr_b + α)/(tr + αK)) )
    *
    * (nt/nr = target/raw gram counts in bucket b; tt/tr their totals), a
    * document's log-odds = MEAN of its grams' bucket weights, probability
    * through the logistic link. This is exactly the trainable half of a
    * fastText-style filter — hashed bag-of-ngrams, linear weights — with
    * closed-form NB weights standing in for SGD (no optimizer in-engine;
    * externally trained weights drop into the same literal-map plan).
    *
    * Collision semantics: grams sharing a bucket share a weight (the
    * documented feature-hashing trade) — the gate's K=128 on a ~31-token
    * vocabulary actually exercises collisions while staying exact, because
    * the oracle replays the SAME buckets.
    */
  def classifierScoresOf(docs: DataFrame, targetLang: String = "en",
                         k: Int = 128, alpha: Double = 0.5,
                         hashFn: Column => Column = h60): DataFrame =
    docs.select(col("doc_id"),
        classifierStruct(trainClassifier(docs, targetLang, k, alpha, hashFn), col("text")).as("s"))
      .select(col("doc_id"), col("s.n_feats").as("n_feats"),
        col("s.logodds").as("logodds"), col("s.p_target").as("p_target"))

  /** Trained classifier as a shippable O(K) literal model — the unit the
    * fused pipeline ([[Curation.modelFilter]]) composes without a join. */
  private[graft] case class ClassifierModel(wm: Column, floorW: Double, k: Int,
                                                hashFn: Column => Column)

  private[graft] def trainClassifier(docs: DataFrame, targetLang: String = "en",
                                         k: Int = 128, alpha: Double = 0.5,
                                         hashFn: Column => Column = h60): ClassifierModel = {
    val feats = docs.select(explode(featureArray(col("text"))).as("g"),
      (col("lang") === targetLang).as("tgt"))
    classifierFromStats(bucketStats(feats, k, hashFn), k, alpha, hashFn)
  }

  private def classifierFromStats(st: BucketStats, k: Int, alpha: Double,
                                  hashFn: Column => Column): ClassifierModel = {
    val (tr, tt) = (st.totalRaw, st.totalTgt)
    val wOf = (nt: Long, nr: Long) =>
      math.log(((nt + alpha) / (tt + alpha * k)) / ((nr + alpha) / (tr + alpha * k)))
    // DENSE weight array, floor pre-filled: bucket ids are 0..K-1 ints, so
    // the per-gram lookup is element_at(array, b+1) — O(1) — where the map
    // form's GetMapValue LINEARLY scans all K keys per gram (measured ~2×
    // on the whole scoring pass at K=2048). One Literal(ArrayData), not a
    // 2K-child CreateMap, so the plan shrinks too. Same weights, same
    // arithmetic — bit-identical scores.
    val dense = Array.fill(k)(wOf(0L, 0L))
    st.buckets.indices.foreach(i => dense(st.buckets(i)) = wOf(st.nt(i), st.nr(i)))
    ClassifierModel(lit(dense), wOf(0L, 0L), k, hashFn) // floor: ln((tr+αK)/(tt+αK))
  }

  /** Train the WHOLE model stack — classifier AND bigram LM — from ONE
    * corpus explode pass: featureArray's gram stream already carries both
    * models' units (unigrams and true bigrams, told apart by the embedded
    * space), and because kCls divides kLm, the classifier's bucket of a
    * gram is recoverable driver-side from the LM's (h mod kCls =
    * (h mod kLm) mod kCls). One groupBy(bucketLm, isBigram) aggregate —
    * ≤ 2·kLm rows — yields the LM's two count tables directly and folds
    * down to the classifier's kCls stats in O(kLm) driver arithmetic.
    * Bit-identical to training each model separately (spec-pinned); at
    * 100 TB this halves the training scans of the fused filter pass. */
  private[graft] def trainModelStack(docs: DataFrame, targetLang: String = "en",
                                     kCls: Int = 128, kLm: Int = 2048,
                                     alpha: Double = 0.5,
                                     hashFn: Column => Column = h60): (ClassifierModel, BigramLm) =
    stackFromCounts(
      stackCounts(docs, targetLang, kLm, hashFn).collect() // ≤ 2·kLm rows
        .map(r => (r.getInt(0), r.getBoolean(1), r.getLong(2), r.getLong(3))).toSeq,
      kCls, kLm, alpha, hashFn)

  /** The model stack's ONE training aggregate: (bucketLm, isBigram) →
    * (raw count, target count) over featureArray's gram stream — ≤ 2·kLm
    * rows, additive and mergeable by construction (plain long sums), which
    * is what makes [[graft.streaming.HashedModelStream]]'s per-batch fold
    * exactly equal whole-corpus training. */
  private[graft] def stackCounts(docs: DataFrame, targetLang: String = "en",
                                 kLm: Int = 2048,
                                 hashFn: Column => Column = h60): DataFrame =
    docs.select(explode(featureArray(col("text"))).as("g"),
        (col("lang") === targetLang).as("tgt"))
      .select(pmod(hashFn(col("g")), lit(kLm.toLong)).cast("int").as("b"),
        (instr(col("g"), " ") > 0).as("bg"), col("tgt"))
      .groupBy("b", "bg")
      .agg(count(lit(1)).as("nr"), sum(when(col("tgt"), 1L).otherwise(0L)).as("nt"))

  /** Driver-side fold of a [[stackCounts]] row set into the two literal
    * models. Pure arithmetic over the counts — the summed-across-batches
    * row set yields bit-identical models to one-shot training (long sums
    * are exact and order-free; both tables sort by bucket). */
  private[graft] def stackFromCounts(rows: Seq[(Int, Boolean, Long, Long)],
                                     kCls: Int = 128, kLm: Int = 2048,
                                     alpha: Double = 0.5,
                                     hashFn: Column => Column = h60): (ClassifierModel, BigramLm) = {
    require(kLm % kCls == 0, s"kCls=$kCls must divide kLm=$kLm for bucket folding")
    def lmTable(isBg: Boolean): Column = {
      // dense count array — same O(1)-lookup form as trainBigramLm
      val dense = Array.fill(kLm)(0.0)
      rows.filter(_._2 == isBg).foreach(r => dense(r._1) = r._3.toDouble)
      lit(dense)
    }
    val lm = BigramLm(lmTable(false), lmTable(true), kLm, alpha, hashFn)
    val folded = scala.collection.mutable.LinkedHashMap[Int, (Long, Long)]()
    rows.foreach { r =>
      val b = r._1 % kCls
      val (nr0, nt0) = folded.getOrElse(b, (0L, 0L))
      folded(b) = (nr0 + r._3, nt0 + r._4)
    }
    val ks = folded.keys.toArray.sorted
    val st = BucketStats(ks, ks.map(folded(_)._1), ks.map(folded(_)._2))
    (classifierFromStats(st, kCls, alpha, hashFn), lm)
  }

  /** The dense double[] behind a `lit(array)` model column — None when the
    * column is not a plain literal (never on the trained paths). */
  private def denseDoubles(c: Column): Option[Array[Double]] = {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    org.apache.spark.sql.graft.ColumnBridge.resolvedExpression(c) match {
      case Literal(ad: ArrayData, ArrayType(DoubleType, _)) =>
        Some(ad.toDoubleArray)
      case _ => None
    }
  }

  /** Per-document scoring struct (n_feats, logodds, p_target) — one narrow
    * expression over `textCol`, fusable into any projection. */
  private[graft] def classifierStruct(m: ClassifierModel, textCol: Column): Column =
    graft.functions.ExprUtils.bindOnce(featureArray(textCol)) { fs =>
      // fused codegen mean (r21 opt): the HOF transform+aggregate pair is
      // CodegenFallback — every gram paid an interpreted eval + boxing
      // around the md5. NbMeanLogOdds is the same sum order / same bucket
      // arithmetic in one tight loop (equivalence spec-pinned); non-h60 or
      // non-literal models keep the HOF formulation.
      val fusedWm =
        if (graft.functions.Hashing.kindOf(m.hashFn).contains("h60"))
          denseDoubles(m.wm)
        else None
      val mean = fusedWm match {
        case Some(wm) =>
          import org.apache.spark.sql.graft.{ColumnBridge, NbMeanLogOdds}
          ColumnBridge.column(NbMeanLogOdds(ColumnBridge.expression(fs), wm, m.k))
        case None => aggregate(
          // dense-array model: floor pre-filled, so the lookup is a plain
          // O(1) element_at — no coalesce, no O(K) map-key scan per gram
          transform(fs, g =>
            element_at(m.wm, pmod(m.hashFn(g), lit(m.k.toLong)).cast("int") + 1)),
          lit(0.0), (a, x) => a + x) / size(fs)
      }
      struct(
        size(fs).cast("long").as("n_feats"),
        roundz(mean, 4).as("logodds"),
        round(lit(1.0) / (lit(1.0) + exp(-mean)), 4).as("p_target"))
    }

  /** Session-scoped train-once registry for the default-parameter model
    * stack — [[Similarity.trainedCentroids]]'s precedent applied to the
    * hashed models: training is one bounded aggregate whose literal models
    * every scoring query reuses ("train offline once, score many" — the
    * production shape), so the four stack consumers (`classifier_score`,
    * `bigram_perplexity`, `model_filter`, `model_filter_scaled`) pay ONE
    * corpus training pass per session instead of one each. Keyed by
    * (dir, params); h60 only — non-default hashFn callers train directly.
    * Same residual limitation as the centroid cache: a mid-JVM corpus
    * change under an unchanged dir is not detected (testdata regeneration
    * happens across JVMs, where the cache is empty). */
  private val stackCache =
    new scala.collection.concurrent.TrieMap[(String, String, Int, Int, Double),
      (ClassifierModel, BigramLm)]
  private[graft] def trainedStack(spark: SparkSession, dir: String,
                                  targetLang: String = "en",
                                  kCls: Int = 128, kLm: Int = 2048,
                                  alpha: Double = 0.5): (ClassifierModel, BigramLm) =
    stackCache.getOrElseUpdate((dir, targetLang, kCls, kLm, alpha),
      trainModelStack(Tables.documentsById(spark, dir), targetLang, kCls, kLm, alpha, h60))

  def classifierScores(spark: SparkSession, dir: String): DataFrame = {
    // bit-identical to classifierScoresOf (stack ≡ separate training,
    // spec-pinned) — but the training aggregate is shared session-wide
    val (cls, _) = trainedStack(spark, dir)
    Tables.documentsById(spark, dir)
      .select(col("doc_id"), classifierStruct(cls, col("text")).as("s"))
      .select(col("doc_id"), col("s.n_feats").as("n_feats"),
        col("s.logodds").as("logodds"), col("s.p_target").as("p_target"))
  }

  /** Line-for-line DuckDB replay: same buckets (h60 % K of the same gram
    * list), same NB smoothing, same gram-order summation. */
  def classifierScoresSql(targetLang: String = "en", k: Int = 128,
                          alpha: Double = 0.5): String =
    s"""WITH f AS (SELECT UNNEST($featuresSqlExpr) AS g, lang = '$targetLang' AS tgt FROM documents),
       |agg AS (SELECT ${h60Sql("g")} % $k AS b, CAST(COUNT(*) AS DOUBLE) AS nr,
       |        CAST(SUM(CASE WHEN tgt THEN 1 ELSE 0 END) AS DOUBLE) AS nt
       |        FROM f GROUP BY 1),
       |c AS (SELECT SUM(nr) AS tr, SUM(nt) AS tt FROM agg),
       |m AS (SELECT MAP(list(b ORDER BY b),
       |        list(LN(((nt + $alpha) / (tt + $alpha * $k)) / ((nr + $alpha) / (tr + $alpha * $k))) ORDER BY b)) AS wm
       |      FROM agg, c),
       |fl AS (SELECT LN((tr + $alpha * $k) / (tt + $alpha * $k)) AS fw FROM c),
       |sc AS (SELECT doc_id,
       |  CAST(LEN($featuresSqlExpr) AS BIGINT) AS n_feats,
       |  list_sum(list_transform($featuresSqlExpr,
       |    x -> COALESCE(wm[${h60Sql("x")} % $k][1], fw)))
       |    / LEN($featuresSqlExpr) AS mean
       |  FROM documents, m, fl)
       |SELECT doc_id, n_feats, ${roundzSql("mean", 4)} AS logodds,
       |ROUND(1.0 / (1.0 + EXP(-mean)), 4) AS p_target
       |FROM sc ORDER BY doc_id""".stripMargin

  // --- filter-threshold calibration (PR curve over the score grid) -----------

  /** Precision/recall/F1 at EVERY candidate classifier threshold — the
    * "pick the filter cutoff" step a FineWeb-Edu-style quality filter runs
    * before deployment (score a labeled slice, read the curve, choose the
    * operating point).
    *
    * Scale shape: scores are already on the 1e-4 grid (`p_target` is
    * rounded), so the corpus collapses to ≤ 10001 rows in ONE map-side-
    * combinable aggregate BEFORE any window — the cumulative TP/FP window
    * then runs over the bounded GRID, never the corpus (same bounded-window
    * contract as the token-frequency top-k). Labels here are the `lang`
    * ground truth the classifier was trained against; production callers
    * score a held-out labeled frame through the same function.
    *
    * Output, one row per distinct score: threshold, tp/fp/fn (counts at
    * "keep iff score ≥ threshold"), prec/rec/f1. F1 uses the integer
    * formulation 2tp/(2tp+fp+fn) — exact operands, one division — rather
    * than composing the two already-rounded ratios.
    */
  def calibrationOf(docs: DataFrame, targetLang: String = "en",
                    cls: ClassifierModel): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val scored = docs.select(
      (col("lang") === targetLang).as("pos"),
      classifierStruct(cls, col("text")).getField("p_target").as("threshold"))
    val buckets = scored.groupBy("threshold").agg(
      sum(when(col("pos"), 1L).otherwise(0L)).as("n_pos"),
      sum(when(!col("pos"), 1L).otherwise(0L)).as("n_neg"))
    val wCum = Window.orderBy(col("threshold").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.orderBy(col("threshold").desc)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    buckets
      .select(col("threshold"),
        sum("n_pos").over(wCum).as("tp"),
        sum("n_neg").over(wCum).as("fp"),
        (sum("n_pos").over(wAll) - sum("n_pos").over(wCum)).as("fn"))
      .select(col("threshold"), col("tp"), col("fp"), col("fn"),
        round(col("tp").cast("double") / (col("tp") + col("fp")), 4).as("prec"),
        round(col("tp").cast("double") / (col("tp") + col("fn")), 4).as("rec"),
        round(lit(2.0) * col("tp") / (lit(2.0) * col("tp") + col("fp") + col("fn")), 4).as("f1"))
      .orderBy("threshold")
  }

  def calibration(spark: SparkSession, dir: String): DataFrame = {
    val (cls, _) = trainedStack(spark, dir)
    calibrationOf(Tables.documents(spark, dir), "en", cls)
  }

  /** Smallest threshold meeting `minPrec` (ties to the smallest, i.e. the
    * highest-recall operating point) — the election a deployment actually
    * ships. Driver-side min over the ≤ grid-size curve. */
  def electThreshold(curve: DataFrame, minPrec: Double): Option[Double] = {
    val rows = curve.filter(col("prec") >= minPrec)
      .agg(min("threshold")).collect()
    if (rows.isEmpty || rows.head.isNullAt(0)) None else Some(rows.head.getDouble(0))
  }

  /** The full train → calibrate → elect → filter composition: score every
    * doc, pick the highest-recall threshold meeting `minPrec` from the
    * calibration curve, and flag keeps — the whole deployment loop of a
    * quality filter in ONE query, with the election replayed by the oracle
    * as a scalar subquery (no recorded literals needed). Output is total
    * (every doc with its keep flag), so an unmeetable precision floor
    * yields keep=false everywhere rather than an empty frame; the
    * null-election comparison is pinned to FALSE on both engines. The
    * default floor 0.7 is corpus-calibrated: this synthetic corpus's
    * fuzzy classifier tops out near base-rate separation (curve read in
    * PLANS round 13 — prec 0.71 keeps 143/500 at recall 0.47; 0.9 would
    * keep 3 docs and gate a degenerate operating point). */
  def calibratedFilter(spark: SparkSession, dir: String,
                       minPrec: Double = 0.7): DataFrame = {
    val (cls, _) = trainedStack(spark, dir)
    val docs = Tables.documentsById(spark, dir)
    val tau = electThreshold(calibrationOf(docs, "en", cls), minPrec)
    docs.select(col("doc_id"),
        classifierStruct(cls, col("text")).getField("p_target").as("p_target"))
      .withColumn("tau", tau.map(lit).getOrElse(lit(null).cast("double")))
      .withColumn("keep", tau.map(t => col("p_target") >= lit(t)).getOrElse(lit(false)))
  }

  def calibratedFilterSql(minPrec: Double = 0.7): String =
    s"""WITH curve AS (${calibrationSql()}),
       |t AS (SELECT MIN(threshold) AS tau FROM curve WHERE prec >= $minPrec),
       |sc AS (${classifierScoresSql()})
       |SELECT sc.doc_id, sc.p_target, t.tau,
       |COALESCE(sc.p_target >= t.tau, FALSE) AS keep
       |FROM sc CROSS JOIN t ORDER BY doc_id""".stripMargin

  /** DuckDB replay: same scored grid (nests [[classifierScoresSql]], whose
    * per-doc p_target is already gate-proven bitwise), same cumulative
    * window over the bounded grid. Outer CASTs keep DuckDB's HUGEINT
    * window sums out of pandas (the events_props_sum lesson). */
  def calibrationSql(targetLang: String = "en"): String =
    s"""WITH sc AS (${classifierScoresSql(targetLang)}),
       |lab AS (SELECT d.lang = '$targetLang' AS pos, sc.p_target AS threshold
       |        FROM sc JOIN documents d USING (doc_id)),
       |b AS (SELECT threshold,
       |        SUM(CASE WHEN pos THEN 1 ELSE 0 END) AS n_pos,
       |        SUM(CASE WHEN NOT pos THEN 1 ELSE 0 END) AS n_neg
       |      FROM lab GROUP BY 1),
       |c AS (SELECT threshold,
       |  SUM(n_pos) OVER (ORDER BY threshold DESC ROWS UNBOUNDED PRECEDING) AS tp,
       |  SUM(n_neg) OVER (ORDER BY threshold DESC ROWS UNBOUNDED PRECEDING) AS fp,
       |  SUM(n_pos) OVER () - SUM(n_pos) OVER (ORDER BY threshold DESC ROWS UNBOUNDED PRECEDING) AS fn
       |  FROM b)
       |SELECT threshold, CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp,
       |CAST(fn AS BIGINT) AS fn,
       |ROUND(CAST(tp AS DOUBLE) / (tp + fp), 4) AS prec,
       |ROUND(CAST(tp AS DOUBLE) / (tp + fn), 4) AS rec,
       |ROUND(2.0 * tp / (2.0 * tp + fp + fn), 4) AS f1
       |FROM c ORDER BY threshold""".stripMargin

  // --- hashed bigram LM perplexity (CCNet-style filter signal) ---------------

  /** Per-document perplexity under an add-α-smoothed HASHED bigram LM
    * trained on the corpus itself (CCNet filters on a reference-corpus LM;
    * the reference corpus here is the whole frame — swapping in a filtered
    * slice is a one-arg change):
    *
    *   p(t_i | t_{i-1}) = (c_bg[h(t_{i-1}·t_i)] + α) / (c_ug[h(t_{i-1})] + αK)
    *   avg_logp = mean over i≥2 of ln p,   ppl = exp(−avg_logp)
    *
    * Both count tables are hashed to K buckets — O(K) state, collisions
    * shared by model and scorer (and oracle), so the signal is exact for
    * the model AS TRAINED. Single-word docs have no bigrams: n_bigrams = 0,
    * avg_logp/ppl NULL on both engines.
    */
  def bigramPerplexityOf(docs: DataFrame, k: Int = 2048,
                         alpha: Double = 0.5,
                         hashFn: Column => Column = h60): DataFrame =
    docs.select(col("doc_id"),
        perplexityStruct(trainBigramLm(docs, k, alpha, hashFn), col("text")).as("s"))
      .select(col("doc_id"), col("s.n_bigrams").as("n_bigrams"),
        col("s.avg_logp").as("avg_logp"), col("s.ppl").as("ppl"))

  /** Trained bigram LM as a shippable O(K) literal model. */
  private[graft] case class BigramLm(ugm: Column, bgm: Column, k: Int, alpha: Double,
                                         hashFn: Column => Column)

  private[graft] def trainBigramLm(docs: DataFrame, k: Int = 2048,
                                       alpha: Double = 0.5,
                                       hashFn: Column => Column = h60): BigramLm = {
    // ONE explode trains both tables: unigrams + TRUE bigrams in one gram
    // stream, told apart by the embedded space (a split token can never
    // contain one, a 2-shingle always does). The space filter also drops
    // wordShingles' n<2 pseudo-gram ([text] for single-word docs), which
    // is NOT a bigram and must not train the model — the oracle's range()
    // formulation never emits it. groupBy (bucket, isBigram) stays ≤ 2K
    // rows: the same bounded-exchange contract as one-table training.
    val rows = docs.select(explode(concat(
        split(col("text"), " ", -1),
        filter(Dedup.wordShingles(col("text"), 2), g => instr(g, " ") > 0))).as("g"))
      .select(pmod(hashFn(col("g")), lit(k.toLong)).cast("int").as("b"),
        (instr(col("g"), " ") > 0).as("bg"))
      .groupBy("b", "bg").agg(count(lit(1)).as("n"))
      .collect() // ≤ 2k rows
    def tableOf(isBg: Boolean): Column = {
      // DENSE count array (absent bucket = 0.0 count, the coalesce the map
      // form spelled out): O(1) element_at per gram instead of an O(K)
      // GetMapValue key scan; an all-zero array covers the degenerate
      // empty-table case (single-word corpus has no bigrams) for free
      val dense = Array.fill(k)(0.0)
      rows.filter(_.getBoolean(1) == isBg)
        .foreach(r => dense(r.getInt(0)) = r.getLong(2).toDouble)
      lit(dense)
    }
    BigramLm(tableOf(false), tableOf(true), k, alpha, hashFn)
  }

  /** Per-document scoring struct (n_bigrams, avg_logp, ppl) — one narrow
    * expression over `textCol`, fusable into any projection. */
  private[graft] def perplexityStruct(m: BigramLm, textCol: Column): Column = {
    val b = (g: Column) => pmod(m.hashFn(g), lit(m.k.toLong)).cast("int")
    // fused codegen average (r21 opt, same rationale as classifierStruct):
    // per bigram the HOF form paid interpreted evals around TWO md5 calls,
    // a concat and two table lookups. BigramAvgLogp is the same gram
    // bytes / buckets / Math.log / sum order (equivalence spec-pinned);
    // non-h60 or non-literal models keep the HOF formulation.
    val fusedTables =
      if (graft.functions.Hashing.kindOf(m.hashFn).contains("h60"))
        denseDoubles(m.ugm).zip(denseDoubles(m.bgm))
      else None
    graft.functions.ExprUtils.bindOnce(split(textCol, " ", -1)) { ws =>
      val n = size(ws) - 1
      val avg = fusedTables match {
        case Some((ugm, bgm)) =>
          import org.apache.spark.sql.graft.{BigramAvgLogp, ColumnBridge}
          ColumnBridge.column(BigramAvgLogp(ColumnBridge.expression(ws),
            ugm, bgm, m.k, m.alpha, m.alpha * m.k))
        case None =>
          // Safe by construction for single-word docs: sequence(1, 0) would
          // produce the DESCENDING [1, 0] and element_at(ws, 0) throws — today
          // only unreachable because every consumer sits under when(n > 0).
          // Guard the index list itself so an unguarded refactor (or
          // subexpression materialization) can't turn it into a runtime crash.
          val lps = transform(
            when(size(ws) >= 2, sequence(lit(1), size(ws) - 1))
              .otherwise(lit(Array.empty[Int])),
            i => log(
              (element_at(m.bgm,
                b(concat_ws(" ", element_at(ws, i), element_at(ws, (i + 1).cast("int")))) + 1)
                + m.alpha) /
              (element_at(m.ugm, b(element_at(ws, i)) + 1)
                + m.alpha * m.k)))
          aggregate(lps, lit(0.0), (a, x) => a + x) / n
      }
      struct(
        n.cast("long").as("n_bigrams"),
        when(n > 0, roundz(avg, 4)).as("avg_logp"),
        when(n > 0, round(exp(-avg), 4)).as("ppl"))
    }
  }

  def bigramPerplexity(spark: SparkSession, dir: String): DataFrame = {
    // shares the session-trained stack — see [[trainedStack]]
    val (_, lm) = trainedStack(spark, dir)
    Tables.documentsById(spark, dir)
      .select(col("doc_id"), perplexityStruct(lm, col("text")).as("s"))
      .select(col("doc_id"), col("s.n_bigrams").as("n_bigrams"),
        col("s.avg_logp").as("avg_logp"), col("s.ppl").as("ppl"))
  }

  def bigramPerplexitySql(k: Int = 2048, alpha: Double = 0.5): String = {
    val w = "STR_SPLIT(text, ' ')"
    val bigrams =
      s"CASE WHEN LEN($w) >= 2 THEN list_transform(range(0, LEN($w) - 1), i -> $w[i+1] || ' ' || $w[i+2]) ELSE CAST([] AS VARCHAR[]) END"
    s"""WITH ug AS (SELECT ${h60Sql("g")} % $k AS b, CAST(COUNT(*) AS DOUBLE) AS n
       |  FROM (SELECT UNNEST($w) AS g FROM documents) GROUP BY 1),
       |bgr AS (SELECT ${h60Sql("g")} % $k AS b, CAST(COUNT(*) AS DOUBLE) AS n
       |  FROM (SELECT UNNEST($bigrams) AS g FROM documents) GROUP BY 1),
       |um AS (SELECT MAP(list(b ORDER BY b), list(n ORDER BY b)) AS m FROM ug),
       |bm AS (SELECT MAP(list(b ORDER BY b), list(n ORDER BY b)) AS m FROM bgr),
       |sc AS (SELECT doc_id, CAST(LEN($w) - 1 AS BIGINT) AS n_bigrams,
       |  list_sum(list_transform(range(1, LEN($w)),
       |    i -> LN((COALESCE(bm.m[${h60Sql(s"$w[i] || ' ' || $w[i+1]")} % $k][1], 0.0) + $alpha)
       |          / (COALESCE(um.m[${h60Sql(s"$w[i]")} % $k][1], 0.0) + $alpha * $k))))
       |    / (LEN($w) - 1) AS avg
       |  FROM documents, um, bm)
       |SELECT doc_id, n_bigrams,
       |CASE WHEN n_bigrams > 0 THEN ${roundzSql("avg", 4)} END AS avg_logp,
       |CASE WHEN n_bigrams > 0 THEN ROUND(EXP(-avg), 4) END AS ppl
       |FROM sc ORDER BY doc_id""".stripMargin
  }
}
