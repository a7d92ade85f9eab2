package graft.operators

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Grouped top-k as a typed `Aggregator` (SURVEY.md §2.8's reserved
  * "TypedImperativeAggregate for grouped top-k at scale", built on the
  * public Dataset Aggregator API).
  *
  * vs the window formulation (`row_number().over(partitionBy(q).orderBy(…))
  * <= k`): the window must shuffle and SORT every scored row per group; the
  * aggregator's buffer is bounded at k, combines map-side (partial
  * aggregation before the shuffle), and moves only k rows per group across
  * the wire. Same results — `cosine_topk_agg` is checked against the SAME
  * DuckDB oracle as the window-based `cosine_topk`.
  */
object TopK {

  /** One scored candidate. */
  case class Scored(query_id: Long, cand_id: Long, sim: Double)

  /** Keeps the k best (sim desc, cand_id asc as tie-break) per group. */
  class TopKAgg(k: Int) extends Aggregator[Scored, List[(Double, Long)], List[(Double, Long)]] {
    private def better(a: (Double, Long), b: (Double, Long)): Boolean =
      a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)
    private def trim(s: List[(Double, Long)]): List[(Double, Long)] =
      s.sortWith(better).take(k)
    override def zero: List[(Double, Long)] = Nil
    override def reduce(buf: List[(Double, Long)], x: Scored): List[(Double, Long)] =
      trim((x.sim, x.cand_id) :: buf)
    override def merge(a: List[(Double, Long)], b: List[(Double, Long)]): List[(Double, Long)] =
      trim(a ::: b)
    override def finish(r: List[(Double, Long)]): List[(Double, Long)] = trim(r)
    // buffer/output are engine-internal (consumed by a typed flatMap) —
    // kryo keeps the bounded list opaque and cheap
    override def bufferEncoder: Encoder[List[(Double, Long)]] = Encoders.kryo
    override def outputEncoder: Encoder[List[(Double, Long)]] = Encoders.kryo
  }

  /** Exact cosine top-k per probe, aggregator formulation. Identical output
    * contract to [[Similarity.bruteForceTopK]] (same scoring pipeline, same
    * rounding, same tie-breaks).
    */
  def bruteForceTopKAgg(embeddings: DataFrame, probeIds: Seq[Long], k: Int): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val e = embeddings.select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val probes = e.filter(col("vec_id").isin(probeIds: _*))
      .select(col("vec_id").as("query_id"), col("v").as("qv"))
    val scored = e.select(col("vec_id").as("cand_id"), col("v").as("cv"))
      .join(broadcast(probes), col("query_id") =!= col("cand_id"))
      .select(col("query_id"), col("cand_id"),
        round(graft.functions.VectorFunctions.cosine(col("qv"), col("cv")), 4).as("sim"))
      .as[Scored]
    scored.groupByKey(_.query_id)
      .agg(new TopKAgg(k).toColumn.name("topk"))
      .flatMap { case (qid, tk) => tk.map { case (sim, cid) => Scored(qid, cid, sim) } }
      .toDF("query_id", "cand_id", "sim")
  }
}
