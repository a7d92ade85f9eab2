package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.operators.FreqSketch.MisraGries
import graft.operators.BloomJoin
import org.apache.spark.sql.graft.BloomOps
import org.apache.spark.sql.catalyst.util.GenericArrayData

/** Property-based laws for the bounded sketches — randomized streams and
  * merge trees, scalacheck driven directly (same harness style as
  * MergePropertySpec). These pin the guarantees the spec examples only
  * sample: Misra-Gries error bounds under ANY partitioning, and Bloom
  * no-false-negatives under ANY key set and sizing.
  */
class SketchPropertySpec extends AnyFunSuite with SparkSuite {

  private def check(prop: Prop): Unit = {
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(30), prop)
    assert(r.passed, r.status.toString)
  }

  // token streams over a small alphabet with zipf-ish repetition
  private val streamGen: Gen[List[String]] = for {
    n <- Gen.choose(0, 400)
    s <- Gen.listOfN(n, Gen.frequency(
      (8, Gen.const("heavy")), (4, Gen.const("mid")),
      (3, Gen.oneOf("a", "b", "c")), (2, Gen.choose(0, 50).map("rare" + _))))
  } yield s

  private val kGen: Gen[Int] = Gen.choose(1, 12)
  private val cutsGen: Gen[List[Int]] = Gen.listOf(Gen.choose(0, 400))

  private def runSketch(k: Int, parts: Seq[Seq[String]]): Map[String, Long] = {
    val agg = new MisraGries(k)
    val bufs = parts.map(_.foldLeft(agg.zero)(agg.reduce))
    val fin = agg.finish(if (bufs.isEmpty) agg.zero else bufs.reduce(agg.merge))
    fin.tokens.zip(fin.counts).toMap
  }

  test("Misra-Gries: bounds and heavy-hitter presence under any partitioning") {
    check(Prop.forAll(streamGen, kGen, cutsGen) { (s, k, cuts) =>
      val n = s.length
      val trueCounts = s.groupBy(identity).view.mapValues(_.size.toLong).toMap
      // split the stream at sorted random cut points
      val bounds = (0 +: cuts.map(c => if (n == 0) 0 else c % (n + 1)).sorted :+ n).distinct
      val parts = bounds.zip(bounds.tail).map { case (a, b) => s.slice(a, b) }
      val est = runSketch(k, parts)
      val errOk = est.forall { case (t, e) =>
        e <= trueCounts(t) && e >= trueCounts(t) - n / (k + 1)
      }
      val heavyOk = trueCounts.filter(_._2 > n / (k + 1)).keys
        .forall(est.contains)
      errOk && heavyOk
    })
  }

  test("Misra-Gries: exact when k >= distinct count, any partitioning") {
    check(Prop.forAll(streamGen, cutsGen) { (s, cuts) =>
      val n = s.length
      val trueCounts = s.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val bounds = (0 +: cuts.map(c => if (n == 0) 0 else c % (n + 1)).sorted :+ n).distinct
      val parts = bounds.zip(bounds.tail).map { case (a, b) => s.slice(a, b) }
      runSketch(math.max(trueCounts.size, 1), parts) == trueCounts
    })
  }

  // driver-side bloom model over random key sets and sizings
  private val keysGen: Gen[List[Long]] = Gen.listOf(Gen.choose(Long.MinValue, Long.MaxValue))

  test("Bloom: no false negatives for any key set and sizing") {
    check(Prop.forAll(keysGen, Gen.choose(64, 4096), Gen.choose(1, 8)) { (keys, mRaw, k) =>
      val m = (mRaw / 64) * 64 max 64
      val agg = new BloomJoin.BloomAgg(m, k)
      val bits = keys.foldLeft(agg.zero)(agg.reduce).bits
      val arr = new GenericArrayData(bits)
      keys.forall(h => BloomOps.mightContain(arr, h, k))
    })
  }

  test("Bloom: merge is commutative and equals single-pass build") {
    check(Prop.forAll(keysGen, keysGen, Gen.choose(1, 8)) { (a, b, k) =>
      val agg = new BloomJoin.BloomAgg(1024, k)
      val ab = agg.merge(a.foldLeft(agg.zero)(agg.reduce), b.foldLeft(agg.zero)(agg.reduce))
      val ba = agg.merge(b.foldLeft(agg.zero)(agg.reduce), a.foldLeft(agg.zero)(agg.reduce))
      val one = (a ++ b).foldLeft(agg.zero)(agg.reduce)
      ab.bits.sameElements(ba.bits) && ab.bits.sameElements(one.bits)
    })
  }

  test("greedy packing fold: no multi-doc pack overruns, covers all, order-free of cuts") {
    // reference fold mirrors Sampling.packGreedy's per-group state machine
    def fold(tokens: List[Long], budget: Long): List[Long] = {
      var acc = 0L; var pack = 0L; var first = true
      tokens.map { n =>
        if (first) { first = false; acc = n }
        else if (acc + n > budget) { pack += 1; acc = n }
        else acc += n
        pack
      }
    }
    check(Prop.forAll(Gen.listOf(Gen.choose(1L, 120L)), Gen.choose(50L, 300L)) { (toks, budget) =>
      val packs = fold(toks, budget)
      val grouped = toks.zip(packs).groupBy(_._2).view.mapValues(_.map(_._1))
      grouped.forall { case (_, ts) => ts.length == 1 || ts.sum <= budget } &&
        packs.length == toks.length &&
        (packs.isEmpty || packs.zip(packs.tail).forall { case (x, y) => y - x <= 1 && y >= x })
    })
  }
}
