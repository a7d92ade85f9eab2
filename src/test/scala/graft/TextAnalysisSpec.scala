package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions
import graft.operators.TextAnalysis

class TextAnalysisSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  test("occurrences counts non-overlapping literal hits") {
    val r = Seq("a the b the c").toDF("t")
      .select(TextFunctions.occurrences(col("t"), " the ").as("n")).as[Long].head()
    assert(r == 2L)
  }

  test("token counts: whitespace split vs regex runs") {
    val r = Seq("one two  three 4x").toDF("t").select(
      TextFunctions.wsTokenCount(col("t")).as("ws"),
      TextFunctions.reTokenCount(col("t")).as("re")).as[(Long, Long)].head()
    // split on single space keeps the empty token from the double space;
    // regex runs: one, two, three, 4x (digits+letters are one run)
    assert(r == ((5L, 4L)))
  }

  test("langId picks the language with most marker hits") {
    val r = Seq(
      "the cat and the dog of the house",
      "der hund und die katze und der vogel",
      "le chat et la maison et le chien",
      "el gato y los perros y el raton",
      "这是的测试",
      "xyzzy plugh").toDF("t")
      .select(TextFunctions.langIdHeuristic(col("t")).as("l")).as[String].collect()
    assert(r.toSeq == Seq("en", "de", "fr", "es", "zh", "und"))
  }

  test("quality score stays in [0,1] and rewards stopword-rich prose") {
    val r = Seq(
      "the history of the region and the people began a long time ago",
      ",,,,. .. ,,,, !!!").toDF("t")
      .select(TextFunctions.qualityScore(col("t")).as("q")).as[Double].collect()
    assert(r.forall(q => q >= 0.0 && q <= 1.0))
    assert(r(0) > r(1))
  }

  test("token familiarity: literal-map scoring equals the join formulation") {
    val viaMap = TextAnalysis.tokenFamiliarity(spark, Sf0001)
      .as[(Long, Double)].collect().toMap
    // order-insensitive reference: explode + join + per-doc average
    val docs = Tables.documents(spark, Sf0001)
    val tok = docs.select(col("doc_id"), explode(split(col("text"), " ", -1)).as("t"))
    val freq = tok.groupBy("t").agg(count(lit(1)).as("n"))
    val total = freq.agg(sum("n")).as[Long].head().toDouble
    val viaJoin = tok.join(broadcast(freq), "t")
      .groupBy("doc_id")
      .agg((sum(col("n") / lit(total)) / count(lit(1))).as("f"))
      .as[(Long, Double)].collect().toMap
    assert(viaMap.keySet == viaJoin.keySet)
    assert(viaMap.forall { case (id, v) =>
      v > 0.0 && v <= 1.0 && math.abs(v - viaJoin(id)) < 5e-5 })
  }

  test("bm25Topk equals an independent driver-side BM25 over the same corpus") {
    val terms = TextAnalysis.Bm25Terms
    val docs = Tables.documents(spark, Sf0001)
      .select("doc_id", "text").as[(Long, String)].collect()
    // independent recompute, same formula association order as the operator
    val toks = docs.map { case (id, t) => id -> t.split(" ", -1) }
    val n = docs.length.toDouble
    val dls = toks.map(_._2.length.toDouble)
    val avgdl = dls.sum / n
    val dfs = terms.map(t => toks.count(_._2.contains(t)).toDouble)
    val k1 = TextAnalysis.Bm25K1; val b = TextAnalysis.Bm25B
    val expected = toks.map { case (id, tk) =>
      val dl = tk.length.toDouble
      val score = terms.zipWithIndex.map { case (t, i) =>
        val tf = tk.count(_ == t).toDouble
        val idf = math.log((n - dfs(i) + 0.5) / (dfs(i) + 0.5) + 1.0)
        idf * (tf * (k1 + 1.0)) / (tf + k1 * (1.0 - b + b * dl / avgdl))
      }.sum
      (id, math.round(score * 10000.0) / 10000.0) // HALF_UP, like round(_,4)
    }.sortBy { case (id, s) => (-s, id) }.take(20).toSeq
    val got = TextAnalysis.bm25Topk(spark, Sf0001)
      .as[(Long, Double)].collect().toSeq
    assert(got == expected)
    // the rare term's idf dominates: every scored-above-zero leader holds it
    assert(got.head._2 > 0.0)
  }

  test("dsir_weights: target-language docs outscore the rest; deterministic") {
    val w = TextAnalysis.dsirWeights(spark, Sf0001)
      .join(Tables.documents(spark, Sf0001).select("doc_id", "lang"), "doc_id")
      .select(col("lang") === "en", col("logw"))
      .as[(Boolean, Double)].collect()
    val (en, rest) = w.partition(_._1)
    assert(en.nonEmpty && rest.nonEmpty)
    def mean(xs: Array[(Boolean, Double)]) = xs.map(_._2).sum / xs.length
    // the importance weight's whole job: the target slice scores higher
    assert(mean(en) > mean(rest),
      s"en mean ${mean(en)} not above non-en mean ${mean(rest)}")
    // stable under re-partitioning: the stats aggregate's exact long counts
    // and the per-row token-order ln sum must not depend on partition order
    val docs = Tables.documents(spark, Sf0001)
    val a = TextAnalysis.dsirWeightsOf(docs.orderBy("doc_id"))
      .orderBy("doc_id").collect()
    val b = TextAnalysis.dsirWeightsOf(docs.repartition(13))
      .orderBy("doc_id").collect()
    assert(a.sameElements(b))
  }

  test("capped vocab: non-binding cap is bit-identical to the exact path") {
    val docs = Tables.documentsById(spark, Sf0001)
    // k = 10000 >> |vocab| = 31: the floor never fires, v/tr/tt identical,
    // so capped must reproduce the exact path EXACTLY (same doubles)
    val exactD = TextAnalysis.dsirWeightsOf(docs).orderBy("doc_id").collect()
    val cappedD = TextAnalysis.dsirWeightsCappedOf(docs).orderBy("doc_id").collect()
    assert(exactD.sameElements(cappedD))
    val exactF = TextAnalysis.tokenFamiliarity(spark, Sf0001).orderBy("doc_id").collect()
    val cappedF = TextAnalysis.tokenFamiliarityCappedOf(docs).orderBy("doc_id").collect()
    assert(exactF.sameElements(cappedF))
  }

  test("capped vocab: binding cap (k=16 < vocab) floors OOV tokens, matches driver recompute") {
    val docs = Tables.documentsById(spark, Sf0001)
    val alpha = 0.5
    def r4(x: Double): Double =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    // independent driver-side recompute of the top-16 + floor model
    val rows = docs.select("doc_id", "text", "lang").as[(Long, String, String)].collect()
    val toks = rows.flatMap { case (_, t, l) => t.split(" ", -1).map(x => (x, l == "en")) }
    val freq = toks.groupBy(_._1).map { case (t, xs) =>
      (t, xs.length.toLong, xs.count(_._2).toLong) }.toArray
    assert(freq.length > 16, "corpus vocab must exceed the cap for this test")
    val tr = toks.length.toDouble
    val tt = toks.count(_._2).toDouble
    val v = freq.length.toDouble
    val top = freq.sortBy { case (t, nr, _) => (-nr, t) }.take(16)
    val rm = top.map { case (t, nr, nt) =>
      t -> ((nt + alpha) / (tt + alpha * v)) / ((nr + alpha) / (tr + alpha * v)) }.toMap
    val floor = ((0 + alpha) / (tt + alpha * v)) / ((0 + alpha) / (tr + alpha * v))
    val expD = rows.map { case (id, t, _) =>
      val ts = t.split(" ", -1)
      (id, ts.length.toLong, r4(ts.map(x => math.log(rm.getOrElse(x, floor))).sum))
    }.sortBy(_._1).toSeq
    val gotD = TextAnalysis.dsirWeightsCappedOf(docs, k = 16, sketchKOpt = 128)
      .orderBy("doc_id").as[(Long, Long, Double)].collect().toSeq
    assert(gotD == expD)
    // the floor path must actually fire: capped != uncapped on this corpus
    val exactD = TextAnalysis.dsirWeightsOf(docs).orderBy("doc_id")
      .as[(Long, Long, Double)].collect().toSeq
    assert(gotD != exactD)
    // familiarity twin: in-table n/total, OOV at the smoothed-zero floor
    val fm = top.map { case (t, nr, _) => t -> nr / tr }.toMap
    val pf = (0 + alpha) / (tr + alpha * v)
    val expF = rows.map { case (id, t, _) =>
      val ts = t.split(" ", -1)
      (id, r4(ts.map(x => fm.getOrElse(x, pf)).sum / ts.length))
    }.sortBy(_._1).toSeq
    val gotF = TextAnalysis.tokenFamiliarityCappedOf(docs, k = 16, sketchKOpt = 128)
      .orderBy("doc_id").as[(Long, Double)].collect().toSeq
    assert(gotF == expF)
    // partition-order independence of the capped stats + scoring
    val a = TextAnalysis.dsirWeightsCappedOf(docs, k = 16, sketchKOpt = 128)
      .orderBy("doc_id").collect()
    val b = TextAnalysis.dsirWeightsCappedOf(
        Tables.documents(spark, Sf0001).repartition(13), k = 16, sketchKOpt = 128)
      .orderBy("doc_id").collect()
    assert(a.sameElements(b))
  }

  test("cappedVocabStats: bounded size, exact heavy-hitter counts, provable exactness") {
    val docs = Tables.documents(spark, Sf0001)
    val cv = TextAnalysis.cappedVocabStats(docs, col("lang") === "en", k = 16, sketchK = 128)
    assert(cv.tokens.length == 16)
    assert(cv.provablyExact, "MG presence bound must prove the top-16 on this corpus")
    // counts must be the EXACT global counts of those tokens (the MG sketch
    // only selects candidates; the second pass recounts exactly)
    val exact = docs.select(explode(split(col("text"), " ", -1)).as("t"))
      .groupBy("t").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    cv.tokens.zip(cv.nr).foreach { case (t, n) => assert(exact(t) == n) }
    // and they are the true top-16 by (count desc, token asc)
    val trueTop = exact.toArray.sortBy { case (t, n) => (-n, t) }.take(16).map(_._1)
    assert(cv.tokens.sameElements(trueTop))
  }

  test("dsir_weights composes with the weighted race for DSIR selection") {
    // DSIR's selection step: weighted sample proportional to exp(logw) —
    // here just check the composition runs and prefers target-like docs
    val w = TextAnalysis.dsirWeights(spark, Sf0001)
    val docs = Tables.documents(spark, Sf0001).select("doc_id", "lang")
    val top = w.join(docs, "doc_id")
      .orderBy(col("logw").desc, col("doc_id")).limit(50)
    val enFrac = top.filter(col("lang") === "en").count() / 50.0
    val baseFrac = docs.filter(col("lang") === "en").count().toDouble /
      docs.count()
    assert(enFrac > baseFrac,
      s"top-50 en fraction $enFrac not above corpus base rate $baseFrac")
  }

  test("tfidfTopTerms: hand-computed scores, deterministic rank ties, bounded k") {
    import graft.operators.TextAnalysis
    val docs = Seq((1L, "a a b"), (2L, "b c")).toDF("doc_id", "text")
    val got = TextAnalysis.tfidfTopTerms(docs, "text", "doc_id", k = 2)
      .orderBy("doc_id", "rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getLong(3), r.getDouble(4))).toSeq
    // N=2; df: a->1, b->2, c->1; ln(2)=0.6931 (rounded 4)
    val ln2_2 = BigDecimal(2 * math.log(2.0)).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val ln2 = BigDecimal(math.log(2.0)).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got == Seq(
      (1L, 1L, "a", 2L, ln2_2), // tf 2 x ln 2
      (1L, 2L, "b", 1L, 0.0),   // df = N -> idf 0
      (2L, 1L, "c", 1L, ln2),
      (2L, 2L, "b", 1L, 0.0)))
    // k bounds the per-doc row count on the real corpus
    val real = TextAnalysis.tfidfTopTermsGate(spark, Sf0001, k = 3)
    val perDoc = real.groupBy("doc_id").count().agg(max("count")).head().getLong(0)
    assert(perDoc <= 3)
    // determinism across partitionings
    val a = TextAnalysis.tfidfTopTerms(
      Tables.documents(spark, Sf0001).repartition(7), "text", "doc_id", 3)
      .orderBy("doc_id", "rank").collect().toSeq
    val b = TextAnalysis.tfidfTopTerms(
      Tables.documents(spark, Sf0001).coalesce(1), "text", "doc_id", 3)
      .orderBy("doc_id", "rank").collect().toSeq
    assert(a == b)
  }

  test("pmiBigrams: hand-computed PMI, threshold, and k bound") {
    import spark.implicits._
    val docs = Seq((1L, "a b a b a b")).toDF("doc_id", "text")
    val got = TextAnalysis.pmiBigrams(docs, minCount = 1, k = 10).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSeq
    // tokens a×3 b×3 (N=6); bigrams (a,b)×3 (b,a)×2 (M=5)
    def pmi(cab: Long, ca: Long, cb: Long) =
      BigDecimal(math.log(cab.toDouble * 6 * 6 / (5.0 * ca * cb)))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got == Seq(
      ("a", "b", 3L, pmi(3, 3, 3)),
      ("b", "a", 2L, pmi(2, 3, 3))))
    // threshold: minCount=3 drops (b,a)
    assert(TextAnalysis.pmiBigrams(docs, minCount = 3, k = 10).count() == 1)
    // real corpus: k bounds rows, co-occurrence floor respected
    val real = TextAnalysis.pmiBigramsGate(spark, Sf0001).collect()
    assert(real.length <= 50)
    assert(real.forall(_.getLong(2) >= 5))
    // scores arrive sorted desc with the word tie-break
    val keys = real.map(r => (-r.getDouble(3), r.getString(0), r.getString(1)))
    assert(keys.sameElements(keys.sorted))
  }

  test("pmiBigrams is partitioning-independent") {
    val d = Tables.documents(spark, Sf0001)
    val a = TextAnalysis.pmiBigrams(d.repartition(7), minCount = 5, k = 20).collect().toSeq
    val b = TextAnalysis.pmiBigrams(d.coalesce(1), minCount = 5, k = 20).collect().toSeq
    assert(a == b)
  }
}
