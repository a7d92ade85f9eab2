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
}
