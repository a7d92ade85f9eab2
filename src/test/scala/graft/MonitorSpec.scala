package graft

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Monitor

class MonitorSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  // ---- sourceDrift -------------------------------------------------------

  /** Reference PSI, computed independently in plain Scala with the same
    * grid/smoothing conventions — the spec's oracle for hand cases. */
  private def psiRef(rows: Seq[(String, Long)], nBuckets: Int = 16): Map[String, Double] = {
    val vals = rows.map(_._2.toDouble)
    val (mn, mx) = (vals.min, vals.max)
    def bucket(v: Double): Int =
      if (mn == mx) 0
      else math.max(0, math.min(nBuckets - 1,
        math.floor((v - mn) * nBuckets / (mx - mn)).toInt))
    val counts = rows.groupBy { case (s, v) => (s, bucket(v.toDouble)) }
      .map { case (k, g) => k -> g.size.toLong }
    val sources = rows.map(_._1).distinct
    val nS = sources.map(s => s -> rows.count(_._1 == s).toLong).toMap
    val n = rows.size.toLong
    sources.map { s =>
      val psi = (0 until nBuckets).map { b =>
        val c = counts.getOrElse((s, b), 0L).toDouble
        val tot = sources.map(t => counts.getOrElse((t, b), 0L)).sum.toDouble
        val p = (c + 0.5) / (nS(s) + nBuckets * 0.5)
        val q = (tot - c + 0.5) / (n - nS(s) + nBuckets * 0.5)
        (p - q) * math.log(p / q)
      }.sum
      s -> BigDecimal(psi).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    }.toMap
  }

  private def docsDF(rows: Seq[(String, Long)]) =
    rows.zipWithIndex
      .map { case ((s, v), i) => (i.toLong, s, v) }
      .toDF("doc_id", "source", "n_chars")

  test("sourceDrift: hand-computed PSI on a closed two-source corpus") {
    // source a uniform over the low half, source b concentrated high —
    // b must read as drifted, and both must match the plain-Scala replay
    val rows = (0L until 64L).map(v => ("a", v)) ++
      Seq.fill(16)(("b", 60L)) ++ Seq.fill(4)(("b", 2L))
    val out = Monitor.sourceDrift(docsDF(rows)).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    val ref = psiRef(rows)
    assert(out.map(_._1) == Seq("a", "b")) // ordered by source
    assert(out.map(t => t._1 -> t._3).toMap == ref)
    assert(out.find(_._1 == "a").get._2 == 64L)
    assert(out.find(_._1 == "b").get._2 == 20L)
    // the concentrated source is far from its complement
    assert(ref("b") > 0.25)
  }

  test("sourceDrift: identically distributed sources read as stable") {
    // two sources with the SAME distribution: PSI should be near zero
    // (not exactly zero — add-half smoothing with different n_s)
    val base = (0L until 100L)
    val rows = base.map(v => ("a", v)) ++ base.map(v => ("b", v))
    val out = Monitor.sourceDrift(docsDF(rows)).collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(math.abs(out("a")) < 0.01 && math.abs(out("b")) < 0.01)
  }

  test("sourceDrift: zero-filled bins contribute terms (empty-bin source)") {
    // source b occupies ONE bucket; its 15 empty buckets must still
    // contribute (they are where the drift lives) — pinned via the replay
    val rows = (0L until 32L).map(v => ("a", v)) ++ Seq.fill(8)(("b", 31L))
    val out = Monitor.sourceDrift(docsDF(rows)).collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(out == psiRef(rows))
  }

  test("sourceDrift: degenerate single-value column collapses to bucket 0") {
    val rows = Seq(("a", 5L), ("a", 5L), ("b", 5L))
    val out = Monitor.sourceDrift(docsDF(rows)).collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(out == psiRef(rows)) // identical shape: near-zero both
  }

  test("sourceDrift: partitioning independence") {
    val rows = (0L until 200L).map(v => (if (v % 3 == 0) "a" else "b", v % 97))
    val df = docsDF(rows)
    val a = Monitor.sourceDrift(df).collect().toSeq
    val b = Monitor.sourceDrift(df.repartition(7)).collect().toSeq
    assert(a == b)
  }

  // ---- dailyAnomalies ----------------------------------------------------

  private def eventsOn(dayCounts: Seq[(String, Int)]) =
    dayCounts.flatMap { case (d, n) =>
      (0 until n).map(i => (d.hashCode.toLong * 1000 + i, Timestamp.valueOf(s"$d 10:00:00")))
    }.toDF("event_id", "ts")

  test("dailyAnomalies: injected spike is flagged, baseline days are not") {
    val days = (1 to 12).map(d => (f"2024-01-$d%02d", if (d == 10) 60 else 10 + (d % 3)))
    val out = Monitor.dailyAnomalies(eventsOn(days)).collect()
      .map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(2)) null else r.getDouble(2), r.getInt(3)))
    val flagged = out.filter(_._4 == 1).map(_._1).toSeq
    assert(flagged == Seq("2024-01-10"))
    // spike day's z is large and positive
    val z10 = out.find(_._1 == "2024-01-10").get._3.asInstanceOf[Double]
    assert(z10 > 2.0)
    // the day AFTER the spike is judged against a window containing the
    // spike — elevated variance, so an ordinary day must not flag
    assert(out.find(_._1 == "2024-01-11").get._4 == 0)
  }

  test("dailyAnomalies: warm-up days and zero-variance baselines yield null z") {
    // first minWindow days have too little history; a constant series has
    // sd = 0 — both must be null-z, never a division by zero
    val days = (1 to 8).map(d => (f"2024-02-$d%02d", 5))
    val out = Monitor.dailyAnomalies(eventsOn(days)).collect()
    assert(out.forall(r => r.isNullAt(2) && r.getInt(3) == 0))
  }

  test("dailyAnomalies: trailing window excludes the current day") {
    // 3 warm-up days then a spike: the spike's baseline is the 3 quiet
    // days (mean 10), so z = (100-10)/sd of {10,10,10}... sd=0 -> null.
    // Vary the baseline slightly so sd > 0 and check the z sign/magnitude
    val days = Seq(("2024-03-01", 9), ("2024-03-02", 10), ("2024-03-03", 11),
      ("2024-03-04", 100))
    val out = Monitor.dailyAnomalies(eventsOn(days)).collect()
    val z = out.find(_.getString(0) == "2024-03-04").get.getDouble(2)
    // baseline mean 10, sd 1 -> z = 90; had the window included the spike
    // itself the mean/sd would differ wildly
    assert(z == 90.0)
  }

  test("dailyAnomalies: partitioning independence") {
    val days = (1 to 20).map(d => (f"2024-04-$d%02d", 5 + (d * 7) % 13))
    val df = eventsOn(days)
    val a = Monitor.dailyAnomalies(df).collect().toSeq
    val b = Monitor.dailyAnomalies(df.repartition(5)).collect().toSeq
    assert(a == b)
  }
}
