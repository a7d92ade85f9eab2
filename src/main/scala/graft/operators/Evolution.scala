package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Corpus snapshot evolution: diff two crawl/ingest generations by content
  * hash. The maintenance primitive behind every incremental 100 TB corpus:
  * before re-running dedup/curation over a new crawl, diff it against the
  * previous snapshot so downstream stages touch only `added`/`changed` docs
  * (the streaming twins consume exactly that delta).
  *
  * Scale shape: one full-outer equi-join on the document key — both sides
  * shuffle by doc_id once (or zero times when the snapshots are bucketed or
  * z-clustered by id, the [[Layout]] path), compare one fixed-width hash
  * per row, then a map-side-combinable (source, status) rollup. No text
  * column crosses the exchange: each side reduces to (doc_id, md5, source)
  * before the join.
  */
object Evolution {

  /** Classify every doc_id across two snapshots: added / removed / changed /
    * unchanged, counted per source. `fp` must be a deterministic content
    * fingerprint column present in both frames. */
  def snapshotDiff(oldSnap: DataFrame, newSnap: DataFrame,
                   idCol: String = "doc_id", srcCol: String = "source",
                   fpCol: String = "fp"): DataFrame = {
    val o = oldSnap.select(col(idCol).as("o_id"), col(fpCol).as("o_fp"),
      col(srcCol).as("o_src"))
    val n = newSnap.select(col(idCol).as("n_id"), col(fpCol).as("n_fp"),
      col(srcCol).as("n_src"))
    o.join(n, col("o_id") === col("n_id"), "full_outer")
      .select(
        coalesce(col("o_src"), col("n_src")).as("source"),
        when(col("o_id").isNull, "added")
          .when(col("n_id").isNull, "removed")
          .when(col("o_fp") =!= col("n_fp"), "changed")
          .otherwise("unchanged").as("status"))
      .groupBy("source", "status").agg(count(lit(1)).as("n"))
      .orderBy("source", "status")
  }

  /** Gate form: v2 is a deterministic "next crawl" derived from the same
    * documents table — doc_id % 7 == 0 dropped (removed), % 5 == 0 of the
    * survivors revised (changed), % 11 == 0 re-ingested under fresh ids
    * (added). Fresh ids are minted by NEGATION (−doc_id − 1): doc_ids are
    * non-negative, so collision with a surviving id is impossible at ANY
    * corpus size (ADVICE r14 — a fixed offset collides once the corpus
    * reaches it, and the oracle replaying the same arithmetic would keep
    * the gate green while the fixture semantics silently broke). The
    * derivation IS the test fixture; `snapshotDiff` itself is
    * snapshot-agnostic. */
  def corpusDiff(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"), col("source"))
    val v2 = docs.filter(col("doc_id") % 7 =!= 0)
      .select(col("doc_id"),
        when(col("doc_id") % 5 === 0, concat(col("text"), lit(" [rev2]")))
          .otherwise(col("text")).as("text"),
        col("source"))
      .unionAll(docs.filter(col("doc_id") % 11 === 0)
        .select((-col("doc_id") - 1L).as("doc_id"),
          concat(col("text"), lit(" [new]")).as("text"), col("source")))
    snapshotDiff(
      docs.withColumn("fp", md5(col("text"))),
      v2.withColumn("fp", md5(col("text"))))
  }

  val corpusDiffSql: String =
    """WITH v2 AS (
      |  SELECT doc_id,
      |         CASE WHEN doc_id % 5 = 0 THEN text || ' [rev2]' ELSE text END AS text,
      |         source
      |  FROM documents WHERE doc_id % 7 <> 0
      |  UNION ALL
      |  SELECT -doc_id - 1, text || ' [new]', source
      |  FROM documents WHERE doc_id % 11 = 0),
      |j AS (
      |  SELECT COALESCE(o.source, n.source) AS source,
      |         CASE WHEN o.doc_id IS NULL THEN 'added'
      |              WHEN n.doc_id IS NULL THEN 'removed'
      |              WHEN MD5(o.text) <> MD5(n.text) THEN 'changed'
      |              ELSE 'unchanged' END AS status
      |  FROM documents o FULL OUTER JOIN v2 n ON o.doc_id = n.doc_id)
      |SELECT source, status, COUNT(*) AS n FROM j
      |GROUP BY source, status ORDER BY source, status""".stripMargin
}
