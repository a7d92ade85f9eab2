package graft.operators

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Theta sketch (KMV — k-minimum-values) for mergeable distinct-count SET
  * ALGEBRA (round-6 item 7; public algorithm: Beyer et al. SIGMOD'07
  * "On Synopses for Distinct-Value Estimation", Dasgupta et al. "Theta
  * sketch framework"). Where HLL only unions, theta sketches intersect and
  * difference with an error bound, because each sketch RETAINS its k
  * smallest distinct hash values — a uniform sample of the key space below
  * a per-sketch threshold θ:
  *
  *  - estimate  = |{v ∈ ks : v < θ}| / θ           (θ normalized to (0,1])
  *  - A ∩ B     = |{v ∈ ksA ∩ ksB : v < θ∧}| / θ∧   with θ∧ = min(θA, θB)
  *  - A ∪ B     = |{v ∈ ksA ∪ ksB : v < θ∧}| / θ∧
  *
  * Nominal relative error ≈ 1/√(k−2) (~3.1% at the default k=1024); the
  * intersection error grows as overlap shrinks (standard theta caveat).
  *
  * Deterministic by construction: the k smallest DISTINCT values of a fixed
  * input set do not depend on row order or partitioning, so gate queries on
  * a bound over the estimate are stable (same contract as the HLL gate in
  * `custkeys_intersect_approx`).
  *
  * Scale shape: the buffer is a bounded sorted Array[Long] (≤ 8·k bytes),
  * combines map-side (partial aggregation before the exchange), and ships
  * k longs per partition — the 100 TB alternative to shuffling every
  * distinct key. Hash inputs with `xxhash64`; values are compared in the
  * sign-flipped domain (h ^ Long.MinValue) so unsigned order is plain `<`.
  */
object ThetaSketch {

  /** Sorted (ascending, transformed domain) distinct retained values. */
  case class ThetaBuf(ks: Array[Long])

  /** theta_t = exclusive threshold in the transformed domain
    * (Long.MaxValue ⇒ sketch is exact — never overflowed k). */
  case class ThetaRes(theta_t: Long, ks: Array[Long])

  /** Aggregates pre-hashed longs (e.g. `xxhash64(col)`) into a KMV sketch. */
  class ThetaSketchAgg(k: Int) extends Aggregator[Long, ThetaBuf, ThetaRes] {
    require(k >= 8, "theta sketch needs k >= 8")

    override def zero: ThetaBuf = ThetaBuf(Array.emptyLongArray)

    override def reduce(buf: ThetaBuf, h: Long): ThetaBuf = {
      val v = h ^ Long.MinValue // unsigned order -> signed order
      val ks = buf.ks
      val n = ks.length
      // O(log k) reject for the at-scale common case: buffer full and v is
      // no smaller than the current kth minimum (also rejects dup-of-max)
      if (n == k && v >= ks(n - 1)) buf
      else {
        val idx = java.util.Arrays.binarySearch(ks, v)
        if (idx >= 0) buf // already retained
        else {
          val pos = -idx - 1
          val m = math.min(n + 1, k)
          val out = new Array[Long](m)
          System.arraycopy(ks, 0, out, 0, pos)
          out(pos) = v
          System.arraycopy(ks, pos, out, pos + 1, m - pos - 1)
          ThetaBuf(out)
        }
      }
    }

    /** Two-pointer dedup merge of two sorted arrays, truncated at k. */
    override def merge(a: ThetaBuf, b: ThetaBuf): ThetaBuf = {
      if (b.ks.isEmpty) return a
      if (a.ks.isEmpty) return b
      val out = new Array[Long](math.min(a.ks.length + b.ks.length, k))
      var ia = 0; var ib = 0; var o = 0
      while (o < out.length && (ia < a.ks.length || ib < b.ks.length)) {
        val takeA = ib >= b.ks.length || (ia < a.ks.length && a.ks(ia) <= b.ks(ib))
        val v = if (takeA) { ia += 1; a.ks(ia - 1) } else { ib += 1; b.ks(ib - 1) }
        if (o == 0 || out(o - 1) != v) { out(o) = v; o += 1 }
      }
      ThetaBuf(if (o == out.length) out else java.util.Arrays.copyOf(out, o))
    }

    override def finish(r: ThetaBuf): ThetaRes =
      ThetaRes(if (r.ks.length < k) Long.MaxValue else r.ks(r.ks.length - 1), r.ks)

    override def bufferEncoder: Encoder[ThetaBuf] = Encoders.product[ThetaBuf]
    override def outputEncoder: Encoder[ThetaRes] = Encoders.product[ThetaRes]
  }

  /** Column aggregate: theta sketch of `hashedCol` (a long hash column). */
  def sketch(hashedCol: Column, k: Int = 1024): Column =
    udaf(new ThetaSketchAgg(k), Encoders.scalaLong)(hashedCol)

  /** Null-SKIPPING variant for profiling nullable columns: a null hash
    * contributes nothing (the primitive-encoder form would refuse the null
    * at deserialization). Same buffer, same merge, same finish — sketches
    * over the same non-null values are bit-identical to [[ThetaSketchAgg]]. */
  class ThetaSketchAggNullable(k: Int)
      extends Aggregator[java.lang.Long, ThetaBuf, ThetaRes] {
    private val inner = new ThetaSketchAgg(k)
    override def zero: ThetaBuf = inner.zero
    override def reduce(buf: ThetaBuf, h: java.lang.Long): ThetaBuf =
      if (h == null) buf else inner.reduce(buf, h.longValue)
    override def merge(a: ThetaBuf, b: ThetaBuf): ThetaBuf = inner.merge(a, b)
    override def finish(r: ThetaBuf): ThetaRes = inner.finish(r)
    override def bufferEncoder: Encoder[ThetaBuf] = Encoders.product[ThetaBuf]
    override def outputEncoder: Encoder[ThetaRes] = Encoders.product[ThetaRes]
  }

  /** [[sketch]] over a NULLABLE hash column (nulls skipped). */
  def sketchNullable(hashedCol: Column, k: Int = 1024): Column =
    udaf(new ThetaSketchAggNullable(k), Encoders.LONG)(hashedCol)

  /** (transformed θ) → normalized fraction of the hash space in (0, 1]. */
  private def frac(thetaT: Column): Column =
    (thetaT.cast("double") + lit(9.223372036854776e18)) / lit(1.8446744073709552e19)

  private def below(ks: Column, cut: Column): Column =
    size(filter(ks, _ < cut)).cast("double")

  /** Distinct-count estimate of one sketch (exact while it never overflowed
    * k — θ stays 1 and every retained value counts). */
  def estimate(s: Column): Column =
    below(s.getField("ks"), s.getField("theta_t")) / frac(s.getField("theta_t"))

  /** |A ∩ B| estimate from two sketches built with the SAME hash function. */
  def intersectionEstimate(a: Column, b: Column): Column = {
    val cut = least(a.getField("theta_t"), b.getField("theta_t"))
    size(array_intersect(
      filter(a.getField("ks"), _ < cut),
      filter(b.getField("ks"), _ < cut))).cast("double") / frac(cut)
  }

  /** |A ∪ B| estimate from two sketches built with the SAME hash function. */
  def unionEstimate(a: Column, b: Column): Column = {
    val cut = least(a.getField("theta_t"), b.getField("theta_t"))
    size(array_union(
      filter(a.getField("ks"), _ < cut),
      filter(b.getField("ks"), _ < cut))).cast("double") / frac(cut)
  }
}
