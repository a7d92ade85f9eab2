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
}
