package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.FreqSketch
import graft.operators.FreqSketch.{MGBuf, MisraGries}

class FreqSketchSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  /** Run the aggregator by hand over a token stream with a given grouping. */
  private def sketch(agg: MisraGries, parts: Seq[Seq[String]]): Map[String, Long] = {
    val bufs = parts.map(_.foldLeft(agg.zero)(agg.reduce))
    val merged = bufs.reduce(agg.merge)
    val fin = agg.finish(merged)
    fin.tokens.zip(fin.counts).toMap
  }

  private val stream: Seq[String] =
    (Seq.fill(500)("alpha") ++ Seq.fill(300)("beta") ++ Seq.fill(120)("gamma") ++
      (1 to 80).map(i => s"rare$i")).toList

  test("estimates obey true - n/(k+1) <= est <= true; heavy hitters present") {
    val k = 9
    val n = stream.length
    val trueCounts = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
    for (shuffle <- Seq(stream, scala.util.Random.shuffle(stream))) {
      val est = sketch(new MisraGries(k), Seq(shuffle))
      est.foreach { case (t, e) =>
        assert(e <= trueCounts(t) && e >= trueCounts(t) - n / (k + 1), s"$t")
      }
      // every item with true count > n/(k+1) must be present
      trueCounts.filter(_._2 > n / (k + 1)).keys.foreach(t => assert(est.contains(t)))
    }
  }

  test("bounds survive arbitrary merge trees (partitioned input)") {
    val k = 9
    val n = stream.length
    val trueCounts = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
    for (nParts <- Seq(2, 7, 16)) {
      val parts = stream.grouped((n + nParts - 1) / nParts).toSeq
      val est = sketch(new MisraGries(k), parts)
      est.foreach { case (t, e) =>
        assert(e <= trueCounts(t) && e >= trueCounts(t) - n / (k + 1), s"$nParts/$t")
      }
      trueCounts.filter(_._2 > n / (k + 1)).keys.foreach(t => assert(est.contains(t)))
    }
  }

  test("k larger than distinct count degenerates to exact, any partitioning") {
    val k = 128 // stream has 83 distinct tokens
    val trueCounts = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
    for (nParts <- Seq(1, 5, 11)) {
      val parts = stream.grouped((stream.length + nParts - 1) / nParts).toSeq
      assert(sketch(new MisraGries(k), parts) == trueCounts)
    }
  }

  test("tokenFreqSketch at k=128 matches the exact groupBy on real docs") {
    val exact = operators.TextAnalysis.tokenFreq(spark, Sf0001)
      .as[(String, Long)].collect().toSeq
    val sk = FreqSketch.tokenFreqSketch(spark, Sf0001)
      .as[(String, Long)].collect().toSeq
    assert(sk == exact)
  }
}
