package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.CorpusOverlap

class CorpusOverlapSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  test("bigrams: adjacent pairs; short docs contribute nothing") {
    val rows = Seq("a b c d", "solo", "", "x y")
      .toDF("text")
      .select(CorpusOverlap.bigrams(col("text")).as("g"))
      .as[Seq[String]].collect()
    assert(rows(0) == Seq("a b", "b c", "c d"))
    assert(rows(1).isEmpty)
    assert(rows(2).isEmpty)
    assert(rows(3) == Seq("x y"))
  }

  test("overlapExact: hand-checked jaccard and containment on a toy corpus") {
    // s1 grams: {a b, b c}; s2 grams: {a b, b d}; s3 grams: {z z}
    val docs = Seq(
      ("s1", "a b c"), ("s1", "a b"),
      ("s2", "a b d"),
      ("s3", "z z")).toDF("source", "text")
    val m = CorpusOverlap.overlapExact(
        CorpusOverlap.sliceVocab(docs, "text", "source"))
      .orderBy("slice_a", "slice_b")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4))).toSeq
    // s1 ∩ s2 = {a b}: jaccard 1/3, containment 1/2; s3 DISJOINT from both
    // but still listed (jaccard 0) — a dropped row would hide exactly the
    // pairs where a sketch false positive needs auditing
    assert(m == Seq(
      ("s1", "s2", 1L, 0.3333, 0.5),
      ("s1", "s3", 0L, 0.0, 0.0),
      ("s2", "s3", 0L, 0.0, 0.0)))
  }

  test("sketch matrix is complete too: zero-overlap pairs carry their audit flag") {
    val docs = Seq(("s1", "a b c"), ("s3", "z z")).toDF("source", "text")
    val rows = CorpusOverlap.overlapSketch(
        CorpusOverlap.sliceVocab(docs, "text", "source"), numPerm = 64, tol = 0.15)
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2),
        r.getBoolean(3))).toSeq
    assert(rows == Seq(("s1", "s3", 0.0, true)))
  }

  test("single-hash affine kernel equals folding per-row MinHash signatures") {
    // the previous sliceSignatures formulation: one MinHashSig array per
    // (slice, gram) row, elementwise-min-folded by mergeSignatures. The
    // declarative min((a·h+b) mod P) aggregate must be bit-identical —
    // OverlapStream state persisted by either formulation stays mergeable.
    val vocab = CorpusOverlap.sliceVocab(
      Tables.documents(spark, Sf0001), "text", "source")
    val fast = CorpusOverlap.sliceSignatures(vocab, 64)
      .as[(String, Seq[Long])].collect().toMap
    val folded = CorpusOverlap.mergeSignatures(
        vocab.select(col("slice"),
          graft.operators.Dedup.minhashSignature(array(col("g")),
            graft.operators.Dedup.permutations(64)).as("sig")))
      .as[(String, Seq[Long])].collect().toMap
    assert(fast == folded)
  }

  test("estimateFromSignatures errors on a signature-width mismatch") {
    // persisted state written at one numPerm read back at another must fail
    // loudly, not silently scale the estimate by the null-padded zip
    val sigs = Seq(("s1", Seq(1L, 2L, 3L)), ("s2", Seq(1L, 9L, 3L, 4L)))
      .toDF("slice", "sig")
    val e = intercept[Exception] {
      CorpusOverlap.estimateFromSignatures(sigs, 4).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("signature width")))
  }

  private lazy val nPairs = {
    val s = Tables.documents(spark, Sf0001).select("source").distinct().count()
    (s * (s - 1) / 2).toInt
  }

  test("sketch estimate tracks exact jaccard within tolerance on real data") {
    val out = SparkEntry.queries("source_overlap_sketch")(spark, Sf0001)
    val rows = out.collect()
    assert(rows.length == nPairs) // every source pair shares vocabulary here
    assert(rows.forall(_.getBoolean(3)),
      s"minhash estimate outside tolerance: ${rows.filterNot(_.getBoolean(3)).mkString(";")}")
  }

  test("exact overlap matrix is complete and ratio-consistent on real data") {
    val rows = SparkEntry.queries("source_overlap")(spark, Sf0001).collect()
    assert(rows.length == nPairs)
    rows.foreach { r =>
      val (j, c) = (r.getDouble(3), r.getDouble(4))
      assert(j > 0 && j <= c && c <= 1.0, s"jaccard/containment violated: $r")
    }
  }

  test("serving sketch: complete pair matrix, deterministic, estimates near exact jaccard") {
    import spark.implicits._
    val serve = graft.operators.CorpusOverlap.sourceOverlapSketchServe(spark, Sf0001)
      .as[(String, String, Double)].collect()
    val exact = graft.operators.CorpusOverlap.sourceOverlap(spark, Sf0001)
      .select("slice_a", "slice_b", "jaccard")
      .as[(String, String, Double)].collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(serve.map(r => (r._1, r._2)).toSet == exact.keySet, "pair matrix incomplete")
    serve.foreach { case (a, b, est) =>
      assert(math.abs(est - exact((a, b))) <= 0.2, s"($a,$b): est $est vs ${exact((a, b))}")
    }
    assert(serve.sameElements(
      graft.operators.CorpusOverlap.sourceOverlapSketchServe(spark, Sf0001)
        .as[(String, String, Double)].collect()))
  }
}
