package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.HashedModel

class HashedModelSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  test("classifier: deterministic, total, probabilities in (0,1), p = sigmoid(logodds)") {
    val a = HashedModel.classifierScores(spark, Sf0001).collect()
    val b = HashedModel.classifierScores(spark, Sf0001).collect()
    assert(a.sameElements(b))
    val df = HashedModel.classifierScores(spark, Sf0001)
    assert(df.count() == Tables.documents(spark, Sf0001).count())
    df.as[(Long, Long, Double, Double)].collect().foreach { case (_, nf, lo, p) =>
      assert(nf > 0)
      assert(p > 0.0 && p < 1.0)
      // rounded columns are consistent with each other through the link
      assert(math.abs(p - 1.0 / (1.0 + math.exp(-lo))) < 2e-4)
    }
  }

  test("classifier: target-language docs score higher than the rest (model sanity)") {
    val docs = Tables.documents(spark, Sf0001)
    val scored = HashedModel.classifierScoresOf(docs)
      .join(docs.select("doc_id", "lang"), "doc_id")
    val byTgt = scored.groupBy(($"lang" === "en").as("tgt"))
      .agg(avg("p_target").as("m")).as[(Boolean, Double)].collect().toMap
    assert(byTgt(true) > byTgt(false),
      s"en-mean ${byTgt(true)} should exceed non-en mean ${byTgt(false)}")
  }

  test("classifier: partitioning-independent") {
    val docs = Tables.documents(spark, Sf0001)
    val a = HashedModel.classifierScoresOf(docs).orderBy("doc_id").collect()
    val b = HashedModel.classifierScoresOf(docs.repartition(7)).orderBy("doc_id").collect()
    assert(a.sameElements(b))
  }

  test("classifier: driver state and plan stay O(K) under a large synthetic vocabulary") {
    // 20k distinct tokens >> K=32 buckets: the literal weight map must hold
    // at most K entries no matter the vocabulary (the feature-hashing cap)
    val docs = (0 until 500).map { i =>
      (i.toLong, (0 until 40).map(j => s"tok${i * 40 + j}").mkString(" "),
        if (i % 2 == 0) "en" else "de")
    }.toDF("doc_id", "text", "lang")
    val df = HashedModel.classifierScoresOf(docs, k = 32)
    val planLen = df.queryExecution.analyzed.toString.length
    assert(planLen < 200 * 1000, s"plan blew up: $planLen chars")
    assert(df.count() == 500)
  }

  test("bigram LM: single-word docs yield null avg_logp/ppl; others finite") {
    val docs = Seq((0L, "solo", "en"), (1L, "two words", "en"))
      .toDF("doc_id", "text", "lang")
    val r = HashedModel.bigramPerplexityOf(docs).orderBy("doc_id")
      .as[(Long, Long, Option[Double], Option[Double])].collect()
    assert(r(0) == ((0L, 0L, None, None)))
    assert(r(1)._2 == 1L && r(1)._3.isDefined && r(1)._4.exists(_ > 0.0))
  }

  test("bigram LM: frequent-bigram docs score lower perplexity than unseen-bigram docs") {
    val base = (0 until 50).map(i => (i.toLong, "the quick brown fox", "en"))
    val odd = Seq((100L, "zxq wvu tsr qpo", "en"))
    val docs = (base ++ odd).toDF("doc_id", "text", "lang")
    val ppl = HashedModel.bigramPerplexityOf(docs)
      .select("doc_id", "ppl").as[(Long, Double)].collect().toMap
    assert(ppl(0L) < ppl(100L),
      s"frequent ${ppl(0L)} should beat unseen ${ppl(100L)}")
  }

  test("bigram LM: deterministic and partitioning-independent") {
    val docs = Tables.documents(spark, Sf0001)
    val a = HashedModel.bigramPerplexityOf(docs).orderBy("doc_id").collect()
    val b = HashedModel.bigramPerplexityOf(docs.repartition(5)).orderBy("doc_id").collect()
    assert(a.sameElements(b))
  }

  test("hash knob: xxhash64 production variant runs, deterministic, same plan shape") {
    val docs = Tables.documents(spark, Sf0001)
    val a = HashedModel.classifierScoresOf(docs, hashFn = xxhash64(_)).orderBy("doc_id").collect()
    val b = HashedModel.classifierScoresOf(docs, hashFn = xxhash64(_)).orderBy("doc_id").collect()
    assert(a.sameElements(b) && a.nonEmpty)
    val p = HashedModel.bigramPerplexityOf(docs, hashFn = xxhash64(_)).orderBy("doc_id").collect()
    assert(p.length == docs.count())
  }

  test("scoring pass is narrow: no hash exchange in the executed plan") {
    val df = HashedModel.classifierScoresOf(Tables.documents(spark, Sf0001))
    df.collect()
    val s0 = df.queryExecution.executedPlan.toString
    val plan = { val c = s0.indexOf("== Initial Plan =="); if (c >= 0) s0.substring(0, c) else s0 }
    assert(!plan.contains("hashpartitioning"),
      "classifier scoring must be a narrow literal-map pass over the scan")
    val p2 = HashedModel.bigramPerplexityOf(Tables.documents(spark, Sf0001))
    p2.collect()
    val s1 = p2.queryExecution.executedPlan.toString
    val plan2 = { val c = s1.indexOf("== Initial Plan =="); if (c >= 0) s1.substring(0, c) else s1 }
    assert(!plan2.contains("hashpartitioning"),
      "perplexity scoring must be a narrow literal-map pass over the scan")
  }

  test("signed zero: a tiny-negative mean rounds to BITWISE +0.0 (roundz pin)") {
    // The round-11 gate failure: Spark's BigDecimal round already yields
    // +0.0 for round(-1e-9, 4), but DuckDB's IEEE ROUND keeps -0.0 — the
    // driver hash-compares bitwise, so roundz (+ 0.0 on both engines) pins
    // the representation. This fixture pins the engine half; check.py's
    // bitwise compare pins the oracle half.
    import graft.functions.ExprUtils.roundz
    val bits = spark.range(1)
      .select(roundz(lit(-1e-9), 4).as("z"))
      .select(expr("cast(z as double)").as("z"))
      .as[Double].head()
    assert(java.lang.Double.doubleToRawLongBits(bits) == 0L,
      s"expected bitwise +0.0, got ${java.lang.Double.doubleToRawLongBits(bits)}")
    // And through the real scorer: craft a corpus where one doc's mean
    // log-odds is a tiny negative — its logodds must surface as +0.0-or-not,
    // never -0.0, regardless of the unrounded sign.
    val docs = (0 until 8).map(i =>
      (i.toLong, s"alpha beta gamma tok$i", if (i % 2 == 0) "en" else "de"))
      .toDF("doc_id", "text", "lang")
    HashedModel.classifierScoresOf(docs, k = 16)
      .select("logodds").as[Double].collect().foreach { lo =>
        assert(java.lang.Double.doubleToRawLongBits(lo) != java.lang.Double.doubleToRawLongBits(-0.0),
          "classifier logodds must never be -0.0")
      }
  }

  test("bigram LM: gram index list is empty (not [1,0]) for single-word docs") {
    // sequence(1, 0) would produce a DESCENDING [1, 0] and probe word index
    // 0 (INVALID_INDEX_OF_ZERO) — the guard must make the list empty by
    // construction, not rely on the lazy when(n > 0) consumer.
    val docs = Seq((0L, "solo", "en")).toDF("doc_id", "text", "lang")
    val lm = HashedModel.trainBigramLm(docs)
    // Evaluate the struct WITHOUT the n>0 guard path short-circuiting:
    // selecting all fields forces lps construction for the single-word doc.
    val r = docs.select(HashedModel.perplexityStruct(lm, col("text")).as("s"))
      .select("s.*").collect()
    assert(r.length == 1 && r(0).getLong(0) == 0L)
  }

  test("trainModelStack is bit-identical to training each model separately") {
    import org.apache.spark.sql.functions.col
    val docs = Tables.documents(spark, Sf0001)
    val (cls, lm) = HashedModel.trainModelStack(docs)
    val sep = docs.select(col("doc_id"),
        HashedModel.classifierStruct(HashedModel.trainClassifier(docs), col("text")).as("c"),
        HashedModel.perplexityStruct(HashedModel.trainBigramLm(docs), col("text")).as("p"))
      .orderBy("doc_id").collect()
    val stk = docs.select(col("doc_id"),
        HashedModel.classifierStruct(cls, col("text")).as("c"),
        HashedModel.perplexityStruct(lm, col("text")).as("p"))
      .orderBy("doc_id").collect()
    assert(stk.sameElements(sep))
  }

  test("calibration: counts reconcile against a driver-side recompute") {
    import org.apache.spark.sql.functions.col
    val docs = Tables.documents(spark, Sf0001)
    val cls = HashedModel.trainClassifier(docs)
    val scored = docs.select((col("lang") === "en").as("pos"),
        HashedModel.classifierStruct(cls, col("text")).getField("p_target").as("t"))
      .collect().map(r => (r.getBoolean(0), r.getDouble(1)))
    val curve = HashedModel.calibrationOf(docs, "en", cls).collect()
    val totalPos = scored.count(_._1)
    assert(curve.map(_.getDouble(0)).toSeq == scored.map(_._2).distinct.sorted.toSeq)
    curve.foreach { r =>
      val t = r.getDouble(0)
      val tp = scored.count(s => s._1 && s._2 >= t)
      val fp = scored.count(s => !s._1 && s._2 >= t)
      assert(r.getLong(1) == tp && r.getLong(2) == fp && r.getLong(3) == totalPos - tp)
      // monotone sanity: recall non-increasing in threshold
      assert(r.getDouble(5) <= 1.0 && r.getDouble(5) >= 0.0)
    }
    // lowest threshold keeps everything: recall 1, precision = base rate
    val lo = curve.head
    assert(lo.getDouble(5) == 1.0 && lo.getLong(3) == 0L)
  }

  test("calibration: the cumulative window runs over the aggregated grid, not the corpus") {
    val docs = Tables.documents(spark, Sf0001)
    val cls = HashedModel.trainClassifier(docs)
    val plan = HashedModel.calibrationOf(docs, "en", cls)
      .queryExecution.executedPlan.toString
    // the Window's child chain must contain the grid aggregate (i.e. an
    // aggregate BELOW the window) — the corpus never reaches WindowExec
    val wIdx = plan.indexOf("Window")
    assert(wIdx >= 0)
    assert(plan.indexOf("HashAggregate", wIdx) > wIdx,
      s"no aggregate below the window:\n$plan")
  }

  test("electThreshold picks the highest-recall cutoff meeting the precision floor") {
    import spark.implicits._
    val curve = Seq(
      (0.2, 0.50, 1.00), (0.5, 0.80, 0.90), (0.7, 0.92, 0.60), (0.9, 0.99, 0.20))
      .toDF("threshold", "prec", "rec")
    assert(HashedModel.electThreshold(curve, 0.9).contains(0.7))
    assert(HashedModel.electThreshold(curve, 0.999).isEmpty)
    assert(HashedModel.electThreshold(curve, 0.4).contains(0.2))
  }

  test("calibratedFilter: elected tau reproduces the curve's operating point; output is total") {
    import org.apache.spark.sql.functions.col
    val out = HashedModel.calibratedFilter(spark, Sf0001, minPrec = 0.7)
      .collect()
    val docs = Tables.documents(spark, Sf0001)
    assert(out.length == docs.count())
    val cls = HashedModel.trainedStack(spark, Sf0001)._1
    val curve = HashedModel.calibrationOf(docs, "en", cls)
    val tau = HashedModel.electThreshold(curve, 0.7)
    assert(tau.isDefined && out.forall(r => r.getDouble(2) == tau.get))
    out.foreach(r => assert(r.getBoolean(3) == (r.getDouble(1) >= tau.get)))
    // achieved precision of the kept set meets the floor (the election's contract)
    val byId = docs.select("doc_id", "lang").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val kept = out.filter(_.getBoolean(3))
    assert(kept.nonEmpty)
    val prec = kept.count(r => byId(r.getLong(0)) == "en").toDouble / kept.length
    assert(prec >= 0.7)
    // an unmeetable floor keeps nothing but still returns every doc
    val none = HashedModel.calibratedFilter(spark, Sf0001, minPrec = 1.01).collect()
    assert(none.length == out.length && none.forall(!_.getBoolean(3)))
    assert(none.forall(_.isNullAt(2)))
  }
}
