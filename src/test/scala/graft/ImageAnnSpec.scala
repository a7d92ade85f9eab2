package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.ImageAnn

/** Image-feature ANN coverage: the exact-integer IVF (decode → cell-sum
  * features → seed-centroid assignment → probed squared-L2 top-k) against a
  * driver-side brute-force replica, the probe-restriction contract, and the
  * partition-pruned candidate read. Decode fidelity itself is pinned by
  * MultimodalSpec (cellSums vs synthesis arithmetic); this spec pins the
  * RETRIEVAL composition.
  */
class ImageAnnSpec extends AnyFunSuite with SparkSuite {

  private def tmp(): String = Files.createTempDirectory("imgann").toString

  private lazy val docs = Tables.documentsById(spark, Sf0001)
  private lazy val cents = ImageAnn.centroidsOf(docs)
  private lazy val feats: Seq[(Long, Seq[Long])] = {
    val f = ImageAnn.featuresOf(docs)
    f.select("doc_id", "v").collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1))).toSeq
  }
  private lazy val idx: String = {
    val p = tmp()
    ImageAnn.buildIndex(ImageAnn.featuresOf(docs), cents, p)
    p
  }

  private def l2(a: Seq[Long], b: Seq[Long]): Long =
    a.lazyZip(b).map((x, y) => (x - y) * (x - y)).sum

  private def queries = feats.filter(f => ImageAnn.QueryIds.contains(f._1))
    .sortBy(_._1)

  test("IVF top-k equals brute force RESTRICTED to the probed clusters " +
       "(exact contract, integer distances)") {
    val out = ImageAnn.topK(spark, idx, cents, queries, k = 3, nprobe = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val assignOf = feats.map { case (id, v) =>
      id -> cents.map { case (cid, cv) => (l2(v, cv), cid) }.min._2
    }.toMap
    val expected = queries.flatMap { case (qid, qv) =>
      val probed = ImageAnn.nearestClusters(qv, cents, 3).toSet
      feats.filter { case (id, _) => probed.contains(assignOf(id)) }
        .map { case (id, v) => (l2(qv, v), id) }
        .sorted.take(3)
        .map { case (d, id) => (qid, id, d) }
    }
    assert(out == expected && out.size == 15)
  }

  test("probing every cluster recovers exact brute-force top-k") {
    val out = ImageAnn.topK(spark, idx, cents, queries, k = 3,
        nprobe = cents.size)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val expected = queries.flatMap { case (qid, qv) =>
      feats.map { case (id, v) => (l2(qv, v), id) }
        .sorted.take(3)
        .map { case (d, id) => (qid, id, d) }
    }
    assert(out == expected)
  }

  test("self-retrieval: a corpus query's own image comes back at distance 0") {
    val out = ImageAnn.topK(spark, idx, cents, queries, k = 1,
        nprobe = cents.size)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    out.foreach { case (qid, id, d) => assert(id == qid && d == 0L) }
  }

  test("candidate read partition-prunes to the probed clusters") {
    val plan = ImageAnn.topK(spark, idx, cents, queries, k = 3, nprobe = 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("cluster"),
      s"expected cluster partition filters in:\n$plan")
  }
}
