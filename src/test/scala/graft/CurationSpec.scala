package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{Curation, Dedup}
import graft.functions.TextFunctions

class CurationSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  test("curated corpus: no exact dups, all gates hold, subset of keep-filter") {
    val out = Curation.curate(spark, Sf0001, minQuality = 0.3, lang = "en")
    val rows = out.collect()
    assert(rows.nonEmpty, "curation must keep some documents")

    // quality + language gates hold on every surviving row
    assert(rows.forall(_.getAs[Double]("quality") >= 0.3))
    assert(rows.forall(_.getAs[String]("lang_pred") == "en"))

    // survivors are a subset of the exact-dedup winners
    val docs = Tables.documents(spark, Sf0001)
    val exactIds = Dedup.dropExactDuplicates(docs, "text", "doc_id")
      .select("doc_id").as[Long].collect().toSet
    val outIds = rows.map(_.getAs[Long]("doc_id")).toSet
    assert(outIds.subsetOf(exactIds))

    // and of the near-dup keep-filter winners
    val keepIds = Dedup.lshDedupKeep(
        Dedup.dropExactDuplicates(docs, "text", "doc_id"),
        "text", "doc_id", 64, 8, 1)
      .filter(col("keep")).select("doc_id").as[Long].collect().toSet
    assert(outIds.subsetOf(keepIds))

    // stats columns agree with the standalone functions
    val q = docs.filter(col("doc_id").isin(outIds.toSeq.take(5): _*))
      .select(col("doc_id"), TextFunctions.wsTokenCount(col("text")).as("ws"))
      .as[(Long, Long)].collect().toMap
    rows.take(5).foreach { r =>
      val id = r.getAs[Long]("doc_id")
      if (q.contains(id)) assert(r.getAs[Long]("ws_tokens") == q(id))
    }
  }

  test("bestRepKeep: one keeper per cluster, and it is the max-quality member") {
    import spark.implicits._
    val r = Curation.bestRepKeep(spark, Sf0001)
      .as[(Long, Long, Double, Boolean)].collect()
    val byComp = r.groupBy(_._2)
    byComp.foreach { case (_, members) =>
      assert(members.count(_._4) == 1, "exactly one keeper per cluster")
      val keeper = members.find(_._4).get
      val best = members.maxBy(m => (m._3, -m._1))
      assert(keeper == best, s"keeper $keeper is not argmax-quality $best")
    }
    // total: every doc in the slice appears once
    assert(r.map(_._1).distinct.length == r.length)
    // singleton components always keep
    byComp.filter(_._2.length == 1).foreach { case (_, m) => assert(m.head._4) }
    // sanity: the corpus actually has multi-member clusters to elect over
    assert(byComp.exists(_._2.length > 1))
  }

  test("bestRepKeep keeps a (possibly different) member wherever min-id election keeps one") {
    import spark.implicits._
    val docs = Tables.documents(spark, Sf0001).filter(col("doc_id") < 500)
    val pairs = Dedup.nearDuplicatePairs(docs, "text", "doc_id",
      threshold = 0.9, numPerm = 64, bands = 8, shingleK = 1,
      hashFn = graft.functions.Hashing.h60)
    val best = Curation.bestRepKeepOf(docs, pairs)
    // same cluster structure as componentLabels, same number of keepers
    val nClusters = graft.operators.Components
      .componentLabels(docs, "doc_id", pairs, "id_a", "id_b")
      .select("component").distinct().count()
    assert(best.filter(col("keep")).count() == nClusters)
  }

  test("modelFilter: terciles balanced, pass is the stated conjunction, null-ppl in tail") {
    import spark.implicits._
    val r = Curation.modelFilter(spark, Sf0001)
      .as[(Long, Double, Option[Double], Double, Long, Boolean)].collect()
    assert(r.nonEmpty && r.map(_._1).distinct.length == r.length)
    // ntile(3): tercile sizes differ by at most 1
    val sizes = r.groupBy(_._5).view.mapValues(_.length).toMap
    assert(sizes.keySet == Set(1L, 2L, 3L))
    assert(sizes.values.max - sizes.values.min <= 1)
    // pass == stated conjunction, recomputed per row
    r.foreach { case (_, p, _, rep, terc, pass) =>
      assert(pass == (p >= 0.5 && rep <= 0.5 && terc <= 2))
    }
    // null-perplexity docs (if any) rank last -> tercile 3
    r.filter(_._3.isEmpty).foreach { row => assert(row._5 == 3L) }
    // terciles follow ppl order: max ppl of tercile 1 <= min ppl of tercile 3
    val t1 = r.filter(x => x._5 == 1L && x._3.isDefined).map(_._3.get)
    val t3 = r.filter(x => x._5 == 3L && x._3.isDefined).map(_._3.get)
    if (t1.nonEmpty && t3.nonEmpty) assert(t1.max <= t3.min)
    // the filter actually separates: some pass, some fail
    assert(r.exists(_._6) && r.exists(!_._6))
  }

  test("modelFilterScaled: no single-partition window, terciles agree with ntile up to boundary ties") {
    import spark.implicits._
    val scaled = Curation.modelFilterScaled(spark, Sf0001)
    scaled.collect()
    val s0 = scaled.queryExecution.executedPlan.toString
    val plan = { val c = s0.indexOf("== Initial Plan =="); if (c >= 0) s0.substring(0, c) else s0 }
    assert(!plan.contains("SinglePartition"),
      "scaled tercile must not pay a single-partition global window")
    val byId = scaled.select("doc_id", "ppl", "ppl_tercile")
      .as[(Long, Option[Double], Long)].collect().map(r => r._1 -> r).toMap
    val exact = Curation.modelFilter(spark, Sf0001)
      .select("doc_id", "ppl", "ppl_tercile")
      .as[(Long, Option[Double], Long)].collect()
    // boundary values of the exact terciles: ties AT a boundary may differ
    val bounds = exact.filter(_._2.isDefined).groupBy(_._3)
      .map { case (t, rs) => t -> rs.flatMap(_._2).max }
    var mismatch = 0
    exact.foreach { case (id, ppl, t) =>
      val st = byId(id)._3
      if (st != t) {
        mismatch += 1
        // every disagreement must sit ON an exact-tercile boundary value
        assert(ppl.isDefined && bounds.values.exists(b => math.abs(ppl.get - b) < 1e-9),
          s"doc $id: scaled tercile $st vs exact $t off-boundary (ppl=$ppl)")
      }
    }
    assert(mismatch <= exact.length / 10, s"too many boundary mismatches: $mismatch")
    // null-ppl docs land in the tail on both paths
    exact.filter(_._2.isEmpty).foreach { case (id, _, _) => assert(byId(id)._3 == 3L) }
  }

  test("modelFilterScaled oracle interpolates the gate run's own GK boundaries") {
    // Verify's run order (queries first, oracleSql after) is what makes the
    // literal-interpolation oracle sound — pin that a GATE run records
    // boundaries and the SQL carries them as CAST(double) literals, not the
    // fallback — and that non-gate library calls can NOT overwrite them.
    val scaled = Curation.modelFilterScaledGate(spark, Sf0001)
    scaled.collect()
    val sql = Curation.modelFilterScaledSql()
    assert(sql.contains("CAST(") && sql.contains("AS DOUBLE) THEN 1"),
      s"oracle should carry interpolated boundary literals, got: ${sql.take(400)}")
    // a library call over a DIFFERENT frame must not disturb the gate pair
    import spark.implicits._
    val tiny = Seq((0L, "a b c d e f", "en"), (1L, "g h i j k l", "de"))
      .toDF("doc_id", "text", "lang")
    Curation.modelFilterScaledOf(tiny).collect()
    assert(Curation.modelFilterScaledSql() == sql,
      "non-gate modelFilterScaledOf overwrote the gate's oracle boundaries")
  }
}
