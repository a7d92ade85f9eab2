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

  /** Bounded top-k buffer: parallel primitive arrays sorted best-first
    * (sim desc, cand_id asc), length ≤ k. A case class of primitive arrays
    * gets Spark's product encoder (UnsafeArrayData — no kryo, no boxing on
    * the serialization path; the round-3 kryo buffer paid an opaque
    * object-graph round trip per partial-aggregation exchange).
    */
  case class TopKBuf(sims: Array[Double], ids: Array[Long])

  /** Keeps the k best (sim desc, cand_id asc as tie-break) per group. */
  class TopKAgg(k: Int) extends Aggregator[Scored, TopKBuf, TopKBuf] {
    // (s1,i1) ranks strictly better than (s2,i2). Double.compare, not `>`:
    // Spark's sort total-orders doubles with NaN largest (and -0.0 < 0.0),
    // so a NaN sim (zero-norm vector) must rank FIRST here too or the
    // aggregator would silently drop rows the window formulation keeps.
    private def better(s1: Double, i1: Long, s2: Double, i2: Long): Boolean = {
      val c = java.lang.Double.compare(s1, s2)
      c > 0 || (c == 0 && i1 < i2)
    }

    override def zero: TopKBuf = TopKBuf(Array.emptyDoubleArray, Array.emptyLongArray)

    /** O(1) reject for the common at-scale case (buffer full, candidate no
      * better than the current kth); otherwise one O(k) shift-insert. The
      * round-3 version re-sorted the whole buffer on EVERY insert
      * (sortWith.take — O(k log k) boxed comparisons per input row).
      */
    override def reduce(buf: TopKBuf, x: Scored): TopKBuf = {
      val n = buf.sims.length
      if (k == 0) buf
      else if (n == k && !better(x.sim, x.cand_id, buf.sims(n - 1), buf.ids(n - 1))) buf
      else {
        var pos = n
        while (pos > 0 && better(x.sim, x.cand_id, buf.sims(pos - 1), buf.ids(pos - 1))) pos -= 1
        val m = math.min(n + 1, k)
        val sims = new Array[Double](m)
        val ids = new Array[Long](m)
        System.arraycopy(buf.sims, 0, sims, 0, pos)
        System.arraycopy(buf.ids, 0, ids, 0, pos)
        sims(pos) = x.sim; ids(pos) = x.cand_id
        val tail = m - pos - 1
        if (tail > 0) {
          System.arraycopy(buf.sims, pos, sims, pos + 1, tail)
          System.arraycopy(buf.ids, pos, ids, pos + 1, tail)
        }
        TopKBuf(sims, ids)
      }
    }

    /** Two-pointer merge of two sorted buffers, truncated at k — O(k). */
    override def merge(a: TopKBuf, b: TopKBuf): TopKBuf = {
      if (b.sims.isEmpty) return a
      if (a.sims.isEmpty) return b
      val m = math.min(a.sims.length + b.sims.length, k)
      val sims = new Array[Double](m)
      val ids = new Array[Long](m)
      var ia = 0; var ib = 0; var o = 0
      while (o < m) {
        val takeA = ib >= b.sims.length ||
          (ia < a.sims.length && better(a.sims(ia), a.ids(ia), b.sims(ib), b.ids(ib)))
        if (takeA) { sims(o) = a.sims(ia); ids(o) = a.ids(ia); ia += 1 }
        else { sims(o) = b.sims(ib); ids(o) = b.ids(ib); ib += 1 }
        o += 1
      }
      TopKBuf(sims, ids)
    }

    override def finish(r: TopKBuf): TopKBuf = r
    override def bufferEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]
    override def outputEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]
  }

  /** Exact cosine top-k per probe, aggregator formulation. Identical output
    * contract to [[Similarity.bruteForceTopK]] (same scoring pipeline, same
    * rounding, same tie-breaks).
    *
    * The aggregator is mounted via `functions.udaf` on an untyped groupBy —
    * NOT `groupByKey` + typed flatMap: the typed path deserializes every
    * scored row into a case class outside codegen, which cost more than the
    * window sort it was replacing. Here scoring, grouping, and the final
    * unzip stay in whole-stage codegen; only the bounded per-group buffer is
    * object-land.
    */
  def bruteForceTopKAgg(embeddings: DataFrame, probeIds: Seq[Long], k: Int): DataFrame = {
    val e = embeddings.select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val probes = e.filter(col("vec_id").isin(probeIds: _*))
      .select(col("vec_id").as("query_id"), col("v").as("qv"))
    val scored = e.select(col("vec_id").as("cand_id"), col("v").as("cv"))
      .join(broadcast(probes), col("query_id") =!= col("cand_id"))
      .select(col("query_id"), col("cand_id"),
        graft.functions.ExprUtils.roundz(
          graft.functions.VectorFunctions.cosine(col("qv"), col("cv")), 4).as("sim"))
      .filter(!isnan(col("sim"))) // zero-norm candidates rank nowhere (as bruteForceTopK)
    val topk = udaf(new TopKAgg(k), Encoders.product[Scored])
    scored.groupBy(col("query_id"))
      .agg(topk(col("query_id"), col("cand_id"), col("sim")).as("tk"))
      .select(col("query_id"),
        explode(arrays_zip(col("tk.ids"), col("tk.sims"))).as("z"))
      .select(col("query_id"), col("z.ids").as("cand_id"), col("z.sims").as("sim"))
  }
}
