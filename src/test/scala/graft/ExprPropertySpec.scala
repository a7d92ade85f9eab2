package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.apache.spark.sql.functions._

/** Property-based laws for the round-12 correctness primitives:
  * [[graft.functions.ExprUtils.roundz]]'s signed-zero pin (the driver's
  * hash compare is bitwise, so `-0.0` anywhere in a rounded output is a
  * red gate row) and [[org.apache.spark.sql.graft.TokenRatioLookup]]'s
  * bit-equivalence to the literal-map form it replaced — randomized over
  * values and tables where the example specs only sample.
  */
class ExprPropertySpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  private def check(prop: Prop): Unit = {
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(20), prop)
    assert(r.passed, r.status.toString)
  }

  test("roundz never yields bitwise -0.0, and equals round everywhere else") {
    // batched: one Spark job per scalacheck case would be minutes
    val gen = Gen.listOfN(64, Gen.oneOf(
      Gen.choose(-1e-3, 1e-3),              // the signed-zero danger band
      Gen.choose(-1e6, 1e6),                // bulk values
      Gen.oneOf(-0.0, 0.0, -4.9999e-5, 4.9999e-5, -5.0001e-5)))
    check(Prop.forAll(gen) { xs =>
      val rows = xs.toDF("x").select(
          graft.functions.ExprUtils.roundz(col("x"), 4).as("z"),
          round(col("x"), 4).as("r"))
        .as[(Double, Double)].collect()
      rows.forall { case (z, r) =>
        java.lang.Double.doubleToRawLongBits(z) !=
          java.lang.Double.doubleToRawLongBits(-0.0) &&
        (z == r) // numerically identical to plain round (only -0.0 is remapped)
      }
    })
  }

  test("TokenRatioLookup equals the literal-map form on random tables and probes") {
    import org.apache.spark.sql.graft.{ColumnBridge, TokenRatioLookup}
    val tableGen = for {
      n <- Gen.choose(1, 40)
      toks <- Gen.listOfN(n, Gen.identifier.map(_.take(8))).map(_.distinct)
      ratios <- Gen.listOfN(toks.length, Gen.choose(1e-9, 10.0))
      floor <- Gen.choose(1e-12, 1e-3)
      // probes: mix of hits and guaranteed misses
      probes <- Gen.listOfN(30, Gen.oneOf(
        Gen.oneOf(toks), Gen.identifier.map("zz" + _.take(6))))
    } yield (toks.toArray, ratios.toArray, floor, probes)
    check(Prop.forAll(tableGen) { case (toks, ratios, floor, probes) =>
      val fm = map(toks.indices.flatMap(i => Seq(lit(toks(i)), lit(ratios(i)))): _*)
      val rows = probes.toDF("t").select(
          coalesce(element_at(fm, col("t")), lit(floor)).as("a"),
          ColumnBridge.column(TokenRatioLookup(
            ColumnBridge.expression(col("t")), toks, ratios, floor)).as("b"))
        .as[(Double, Double)].collect()
      rows.forall { case (a, b) =>
        java.lang.Double.doubleToRawLongBits(a) == java.lang.Double.doubleToRawLongBits(b)
      }
    })
  }

  test("Interleave2 laws: bijective on bucket pairs, monotone prefix locality, de-interleavable") {
    import org.apache.spark.sql.graft.Interleave2
    val pairGen = for {
      bits <- Gen.choose(1, 31)
      a <- Gen.choose(0L, (1L << bits) - 1)
      b <- Gen.choose(0L, (1L << bits) - 1)
    } yield (a, b, bits)
    check(Prop.forAll(pairGen) { case (a, b, bits) =>
      val z = Interleave2.zkey(a, b, bits)
      // de-interleave recovers both inputs exactly (bijectivity witness)
      val backA = (0 until bits).foldLeft(0L)((acc, i) => acc | (((z >> (2 * i)) & 1L) << i))
      val backB = (0 until bits).foldLeft(0L)((acc, i) => acc | (((z >> (2 * i + 1)) & 1L) << i))
      z >= 0 && backA == a && backB == b
    })
    // locality: halving both coordinates' top bit halves the key's top bits
    // (same quadrant => same z prefix)
    check(Prop.forAll(Gen.choose(0L, (1L << 16) - 1), Gen.choose(0L, (1L << 16) - 1)) { (a, b) =>
      val z = Interleave2.zkey(a, b, 16)
      val quadrant = ((a >> 15) & 1L) | (((b >> 15) & 1L) << 1)
      (z >> 30) == quadrant
    })
  }

  test("Bpe laws: tokenize is total and concatenation-preserving under random merges") {
    import graft.operators.Bpe
    val wordGen = Gen.listOfN(8, Gen.alphaLowerChar).map(_.mkString)
    val corpusGen = Gen.listOfN(12, Gen.zip(wordGen, Gen.choose(1L, 9L)))
    check(Prop.forAll(corpusGen, Gen.choose(0, 12)) { (wc, nMerges) =>
      val merges = Bpe.trainMerges(wc, nMerges)
      merges.length <= nMerges &&
      wc.forall { case (w, _) =>
        val toks = Bpe.tokenizeWord(w, merges)
        toks.mkString == w && toks.length <= w.length &&
          (w.isEmpty || toks.nonEmpty)
      } &&
      // determinism: retraining from the same table reproduces the merges
      Bpe.trainMerges(wc, nMerges) == merges
    })
  }
}
