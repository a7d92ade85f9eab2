package graft.operators

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import graft.Tables

/** Misra–Gries frequent-items sketch as a mergeable Spark `Aggregator` —
  * the bounded-memory companion to the exact `token_freq` groupBy. The
  * buffer holds at most k (token, counter) entries regardless of input size,
  * combines map-side, and ships ≤ k entries per partition through the final
  * merge — at 100 TB the exact groupBy shuffles one row per DISTINCT token
  * (vocabulary-sized, possibly billions for raw n-grams), while this sketch
  * shuffles k·partitions rows, period.
  *
  * Guarantees (Misra–Gries '82; merge rule from Agarwal et al., PODS'12):
  * after summarizing n items, every stored estimate e(t) satisfies
  * true(t) - n/(k+1) ≤ e(t) ≤ true(t), and every item with
  * true(t) > n/(k+1) is present. FreqSketchSpec pins both bounds and
  * merge-order independence of the bounds in the lossy (small-k) regime.
  *
  * The gate query runs with k = 128 > |vocabulary| = 31, where Misra–Gries
  * degenerates to the EXACT counts (no decrement ever fires, merge is plain
  * addition — order-independent), so it shares the exact `token_freq`
  * oracle; the lossy regime is spec territory, like the other sketches
  * (HLL, GK quantiles).
  */
object FreqSketch {

  /** Parallel-array sketch buffer (product encoder — UnsafeArrayData). */
  case class MGBuf(tokens: Array[String], counts: Array[Long])

  class MisraGries(k: Int) extends Aggregator[String, MGBuf, MGBuf] {
    require(k > 0)

    override def zero: MGBuf = MGBuf(Array.empty, Array.empty)

    override def reduce(b: MGBuf, t: String): MGBuf = {
      val i = b.tokens.indexOf(t)
      if (i >= 0) { b.counts(i) += 1L; b }
      else if (b.tokens.length < k) MGBuf(b.tokens :+ t, b.counts :+ 1L)
      else {
        // table full and t absent: decrement every counter (the arriving
        // item cancels against one unit of each), drop zeros, discard t
        var j = 0
        while (j < b.counts.length) { b.counts(j) -= 1L; j += 1 }
        val keep = b.counts.indices.filter(b.counts(_) > 0L)
        if (keep.length == b.tokens.length) b
        else MGBuf(keep.map(b.tokens).toArray, keep.map(b.counts).toArray)
      }
    }

    override def merge(a: MGBuf, b: MGBuf): MGBuf = {
      if (b.tokens.isEmpty) return a
      if (a.tokens.isEmpty) return b
      val m = scala.collection.mutable.LinkedHashMap.from(a.tokens.zip(a.counts))
      var i = 0
      while (i < b.tokens.length) {
        m.updateWith(b.tokens(i)) {
          case Some(c) => Some(c + b.counts(i))
          case None => Some(b.counts(i))
        }
        i += 1
      }
      if (m.size <= k) MGBuf(m.keys.toArray, m.values.toArray)
      else {
        // keep the k largest after subtracting the (k+1)-th largest count;
        // preserves the n/(k+1) error bound under arbitrary merge trees
        val sorted = m.toArray.sortBy { case (t, c) => (-c, t) }
        val cut = sorted(k)._2
        val kept = sorted.iterator.map { case (t, c) => (t, c - cut) }
          .filter(_._2 > 0L).toArray
        MGBuf(kept.map(_._1), kept.map(_._2))
      }
    }

    override def finish(r: MGBuf): MGBuf = {
      // deterministic presentation order: estimate desc, token asc
      val idx = r.tokens.indices.sortBy(i => (-r.counts(i), r.tokens(i)))
      MGBuf(idx.map(r.tokens).toArray, idx.map(r.counts).toArray)
    }

    override def bufferEncoder: Encoder[MGBuf] = Encoders.product[MGBuf]
    override def outputEncoder: Encoder[MGBuf] = Encoders.product[MGBuf]
  }

  /** Top tokens by sketched frequency. With the default k = 128 this is
    * exact on the test corpus (31 distinct tokens) — see class doc. */
  def tokenFreqSketch(spark: SparkSession, dir: String, k: Int = 128, topN: Int = 50): DataFrame = {
    val mg = udaf(new MisraGries(k), Encoders.STRING)
    Tables.documents(spark, dir)
      .select(explode(split(col("text"), " ", -1)).as("token"))
      .agg(mg(col("token")).as("sk"))
      .select(explode(arrays_zip(col("sk.tokens"), col("sk.counts"))).as("z"))
      .select(col("z.tokens").as("token"), col("z.counts").as("freq"))
      .orderBy(col("freq").desc, col("token"))
      .limit(topN)
  }

  /** GROUPED frequent items: one bounded sketch per group — the state per
    * group is k entries regardless of group size, and partial buffers
    * combine map-side, so a hot group ships #partitions × k entries, never
    * its token stream. Per-group top-n presentation via row_number over the
    * already-≤k sketch rows (a bounded window input by construction). Exact
    * at k = 128 > per-source vocabulary here, like [[tokenFreqSketch]]. */
  def tokenFreqBySource(spark: SparkSession, dir: String, k: Int = 128, topN: Int = 10): DataFrame = {
    val mg = udaf(new MisraGries(k), Encoders.STRING)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source")).orderBy(col("freq").desc, col("token"))
    Tables.documents(spark, dir)
      .select(col("source"), explode(split(col("text"), " ", -1)).as("token"))
      .groupBy(col("source"))
      .agg(mg(col("token")).as("sk"))
      .select(col("source"), explode(arrays_zip(col("sk.tokens"), col("sk.counts"))).as("z"))
      .select(col("source"), col("z.tokens").as("token"), col("z.counts").as("freq"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= topN)
      .orderBy("source", "rank")
  }

  val tokenFreqBySourceSql: String =
    """SELECT source, token, freq, rank FROM (
      |  SELECT source, token, COUNT(*) AS freq,
      |    ROW_NUMBER() OVER (PARTITION BY source ORDER BY COUNT(*) DESC, token) AS rank
      |  FROM (SELECT source, UNNEST(STR_SPLIT(text, ' ')) AS token FROM documents) t
      |  GROUP BY source, token) r
      |WHERE rank <= 10 ORDER BY source, rank""".stripMargin
}
