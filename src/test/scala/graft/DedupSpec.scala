package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Dedup

class DedupSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  private def docs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog"),
    (1L, "the quick brown fox jumps over the lazy dog"),          // exact dup of 0
    (2L, "the quick brown fox jumps over the lazy cat"),          // near dup of 0
    (3L, "completely different words about spark and catalyst engines"),
    (4L, "short")
  ).toDF("doc_id", "text")

  test("exactGroups finds exact duplicates, keeps min id") {
    val g = Dedup.exactGroups(docs, "text", "doc_id")
      .orderBy("keep_id").select("keep_id", "dup_count").as[(Long, Long)].collect()
    assert(g.toSeq == Seq((0L, 2L), (2L, 1L), (3L, 1L), (4L, 1L)))
  }

  test("dropExactDuplicates keeps one representative per content") {
    val kept = Dedup.dropExactDuplicates(docs, "text", "doc_id")
      .select("doc_id").as[Long].collect().sorted
    assert(kept.toSeq == Seq(0L, 2L, 3L, 4L))
  }

  test("simhashDedupKeep: exact duplicates collapse to min id; verdicts total and stable") {
    val kept = Dedup.simhashDedupKeep(docs, "text", "doc_id")
    assert(kept.count() == docs.count())
    val v = kept.orderBy("doc_id")
      .select("doc_id", "rep_id", "keep").as[(Long, Long, Boolean)].collect()
    // docs 0 and 1 are exact dups: identical fingerprints share every band
    assert(v(0) == (0L, 0L, true))
    assert(v(1)._1 == 1L && !v(1)._3 && v(1)._2 == 0L)
    // partitioning-independent
    val re = Dedup.simhashDedupKeep(docs.repartition(5), "text", "doc_id")
      .orderBy("doc_id").select("doc_id", "rep_id", "keep").as[(Long, Long, Boolean)].collect()
    assert(v.sameElements(re))
  }

  test("wordShingles produces k-grams; short docs fall back to whole text") {
    val sh = docs.select(col("doc_id"), Dedup.wordShingles(col("text"), 3).as("sh"))
      .filter(col("doc_id") === 0L).select("sh").as[Seq[String]].head()
    assert(sh.head == "the quick brown")
    assert(sh.last == "the lazy dog")
    assert(sh.length == 7) // 9 words -> 7 trigrams
    val short = docs.filter(col("doc_id") === 4L)
      .select(Dedup.wordShingles(col("text"), 3).as("sh")).as[Seq[String]].head()
    assert(short == Seq("short"))
  }

  test("jaccard: identical=1, disjoint=0") {
    val j = spark.range(1).select(
      Dedup.jaccard(array(lit("a"), lit("b")), array(lit("a"), lit("b"))).as("same"),
      Dedup.jaccard(array(lit("a")), array(lit("b"))).as("disj"))
      .as[(Double, Double)].head()
    assert(j == ((1.0, 0.0)))
  }

  test("minhash signature approximates jaccard; identical docs have identical sigs") {
    val sigs = Dedup.minhashSignatures(docs, "text", "doc_id", numPerm = 64, shingleK = 1)
      .select("doc_id", "sig").as[(Long, Seq[Long])].collect().toMap
    assert(sigs(0L) == sigs(1L)) // exact dup -> identical signature
    // near dup (8/10 word jaccard): most minhash coords agree
    val agree01vs2 = sigs(0L).zip(sigs(2L)).count { case (a, b) => a == b }
    assert(agree01vs2 > 32, s"expected >32/64 agreement for near-dups, got $agree01vs2")
    // unrelated doc: few coords agree
    val agree0vs3 = sigs(0L).zip(sigs(3L)).count { case (a, b) => a == b }
    assert(agree0vs3 < 16, s"expected <16/64 agreement for unrelated docs, got $agree0vs3")
  }

  test("nearDuplicatePairs finds planted near-dups and skips unrelated docs") {
    val pairs = Dedup.nearDuplicatePairs(docs, "text", "doc_id",
        threshold = 0.7, numPerm = 64, bands = 16, shingleK = 1)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 1L)))
    assert(pairs.contains((0L, 2L)) && pairs.contains((1L, 2L)))
    assert(!pairs.exists { case (a, b) => b == 3L || a == 3L })
  }

  test("lshCandidatePairs: banding equivalence — every verified pair is a candidate") {
    val docs = Tables.documents(spark, Sf0001).filter(col("doc_id") < 200)
    val sigs = Dedup.minhashSignatures(docs, "text", "doc_id",
      numPerm = 64, shingleK = 1, hashFn = graft.functions.Hashing.h60)
    val cands = Dedup.lshCandidatePairs(sigs, "doc_id", numPerm = 64, bands = 8)
      .as[(Long, Long)].collect().toSet
    val verified = Dedup.nearDuplicatePairs(docs, "text", "doc_id",
        threshold = 0.9, numPerm = 64, bands = 8, shingleK = 1,
        hashFn = graft.functions.Hashing.h60)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(verified.nonEmpty && verified.subsetOf(cands),
      s"${(verified -- cands).size} verified pairs missing from the candidate join")
  }

  test("election shareInput modes are result-identical (plan-only difference)") {
    val docs = Tables.documents(spark, Sf0001)
    def run(share: Boolean) =
      Dedup.simhashDedupKeep(docs, "text", "doc_id", shareInput = share)
        .as[(Long, Long, Boolean)].collect().toSet
    assert(run(true) == run(false))
  }

  test("simhash: identical texts equal; near-dups closer than unrelated") {
    val fp = docs.select(col("doc_id"), Dedup.simhash(col("text")).as("fp"))
      .as[(Long, Long)].collect().toMap
    assert(fp(0L) == fp(1L))
    val near = java.lang.Long.bitCount(fp(0L) ^ fp(2L))
    val far = java.lang.Long.bitCount(fp(0L) ^ fp(3L))
    assert(near < far, s"near=$near far=$far")
  }

  test("winnowing fingerprints: shared substrings yield shared mins; near-dups overlap more") {
    val fp = docs.select(col("doc_id"),
        Dedup.winnowingFingerprint(col("text"), k = 3, w = 2).as("fp"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(fp(0L) == fp(1L)) // exact dup -> identical sketch
    def overlap(a: Seq[Long], b: Seq[Long]) =
      a.toSet.intersect(b.toSet).size.toDouble / a.toSet.union(b.toSet).size
    assert(overlap(fp(0L), fp(2L)) > overlap(fp(0L), fp(3L)),
      "near-dup must share more fingerprints than unrelated docs")
    assert(fp(4L).nonEmpty) // short doc still fingerprints (whole-text shingle)
  }

  test("approx_count_distinct tracks exact distinct within HLL error bounds") {
    val d = Tables.documents(spark, Sf0001)
    val (approx, exact) = d.select(
        approx_count_distinct(md5(col("text"))).as("a"),
        countDistinct(md5(col("text"))).as("e"))
      .as[(Long, Long)].head()
    assert(math.abs(approx - exact).toDouble / exact < 0.1,
      s"approx=$approx exact=$exact")
  }

  test("nearDuplicatePairs: tiny bucketCap (triangle-split engaged) leaves output unchanged") {
    val corpus = Tables.documents(spark, Sf0001).filter(col("doc_id") < 300)
    def pairs(cap: Int) =
      Dedup.nearDuplicatePairs(corpus, "text", "doc_id",
          threshold = 0.9, numPerm = 64, bands = 8, shingleK = 1, bucketCap = cap)
        .as[(Long, Long, Double)].collect().toSet
    val capped = pairs(5) // far below any band-bucket size → every bucket splits
    val uncapped = pairs(Int.MaxValue)
    assert(uncapped.nonEmpty)
    assert(capped == uncapped)
  }

  test("simhashNearDupPairs: tiny bucketCap (triangle-split engaged) leaves output unchanged") {
    val corpus = Tables.documents(spark, Sf0001).filter(col("doc_id") < 300)
    def pairs(cap: Int) =
      Dedup.simhashNearDupPairs(corpus, "text", "doc_id",
          maxDist = 7, bands = 8, bucketCap = cap)
        .as[(Long, Long, Long)].collect().toSet
    val capped = pairs(3)
    val uncapped = pairs(Int.MaxValue)
    assert(uncapped.nonEmpty)
    assert(capped == uncapped)
  }

  test("lshDedupKeep is invariant under input partitioning (distributed determinism)") {
    val docs = Tables.documents(spark, Sf0001)
    def keeps(d: org.apache.spark.sql.DataFrame) =
      Dedup.lshDedupKeep(d, "text", "doc_id", numPerm = 64, bands = 8, shingleK = 1)
        .orderBy("doc_id")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSeq
    val base = keeps(docs)
    assert(keeps(docs.repartition(1)) == base)
    assert(keeps(docs.repartition(17, col("text"))) == base)
  }

  test("hammingDistance column matches JVM popcount") {
    val d = spark.range(1).select(
      Dedup.hammingDistance(lit(0xff00L), lit(0x0ff0L)).as("d")).as[Int].head()
    assert(d == java.lang.Long.bitCount(0xff00L ^ 0x0ff0L))
  }

  test("canonicalize: NFC + case + whitespace variants collapse to one form; idempotent") {
    import graft.functions.TextFunctions.canonicalize
    val variants = Seq(
      "Hello  World",
      "hello world",
      "HELLO\tWORLD",
      " hello world ",
      "hello\nworld")
    val out = variants.toDF("s").select(canonicalize(col("s"))).as[String].collect().toSeq
    assert(out.toSet == Set("hello world"))
    // combining-char variant of the same visual string joins the group
    val nfc = Seq("cafe\u0301 bar", "caf\u00e9 bar")
      .toDF("s").select(canonicalize(col("s"))).as[String].collect().toSeq
    assert(nfc.toSet == Set("caf\u00e9 bar"))
    // case folding is deliberately ASCII-only (engines disagree on full
    // Unicode mappings \u2014 \u00df/\u0130): non-ASCII uppercase survives, pinned here
    val de = Seq("GROSSE Stra\u00dfe", "\u00c9TAPE")
      .toDF("s").select(canonicalize(col("s"))).as[String].collect().toSeq
    assert(de == Seq("grosse stra\u00dfe", "\u00c9tape"))
    // idempotent
    val once = "Hello  World"
    val df1 = Seq(once).toDF("s").select(canonicalize(col("s")).as("c"))
    assert(df1.select(canonicalize(col("c"))).as[String].head() ==
      df1.as[String].head())
  }

  test("canonical dedup undoes the gate perturbation: groups equal exact dedup of the pristine corpus") {
    val pristine = Dedup.exactGroups(Tables.documents(spark, Sf0001), "text", "doc_id")
      .orderBy("keep_id").collect().toSeq
    val canonical = Dedup.canonicalDedupGate(spark, Sf0001).collect().toSeq
    assert(canonical == pristine)
  }
}
