package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector primitives over `array<float|double>` embedding columns, built from
  * Spark's higher-order functions (`zip_with` + `aggregate`) so they run
  * inside codegen without UDF boxing. SURVEY.md §2.8 picks HOFs first and
  * reserves a custom Catalyst Expression for when the bench demands it.
  *
  * All math is done in double (the oracle casts to DOUBLE[] too); any value
  * surfaced to a hash-compared query is rounded by the caller.
  */
object VectorFunctions {

  /** Σ aᵢ·bᵢ in double, sequential left-to-right accumulation. Backed by the
    * custom codegen [[org.apache.spark.sql.graft.DotProduct]] expression — bit-identical
    * to the HOF formulation [[dotHof]] it replaced, but a primitive Java loop
    * instead of interpreted per-element eval (HOFs are CodegenFallback).
    */
  def dot(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(org.apache.spark.sql.graft.DotProduct(
      org.apache.spark.sql.graft.ColumnBridge.expression(a.cast("array<double>")),
      org.apache.spark.sql.graft.ColumnBridge.expression(b.cast("array<double>"))))

  /** Reference HOF formulation of [[dot]] — kept for the equivalence spec. */
  def dotHof(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, x) => acc + x)

  /** ‖a‖₂ in double. */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity in double: dot(a,b) / (‖a‖·‖b‖). A zero-norm vector
    * yields NaN rather than an ANSI DIVIDE_BY_ZERO that would kill the whole
    * query (Spark 4 default) — NaN then ranks first under Spark's descending
    * sort total order and is dropped by `>= threshold` filters, matching
    * [[org.apache.spark.sql.graft.CosinePairs]]'s zero-norm skip. */
  def cosine(a: Column, b: Column): Column = {
    val denom = norm(a) * norm(b)
    when(denom === 0.0, lit(Double.NaN)).otherwise(dot(a, b) / denom)
  }

  /** Squared L2 distance (cheaper than sqrt for ANN ranking). */
  def l2Sq(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => {
        val d = x.cast("double") - y.cast("double")
        d * d
      }),
      lit(0.0),
      (acc, x) => acc + x)

  /** Sign bit of the projection of `v` onto a constant hyperplane — one bit
    * of a random-hyperplane (SimHash) LSH signature for cosine distance. The
    * hyperplane is baked in as a literal array so the whole thing is a pure
    * codegen expression evaluated executor-side.
    */
  def hyperplaneBit(v: Column, plane: Array[Double]): Column = {
    val planeCol = array(plane.map(lit): _*)
    when(dot(v, planeCol) >= 0.0, 1L).otherwise(0L)
  }

  /** LSH bucket id for cosine ANN: `planes.length`-bit signature packed into
    * a long. Vectors with the same bucket id are near-duplicate candidates.
    */
  def hyperplaneBucket(v: Column, planes: Seq[Array[Double]]): Column =
    planes.zipWithIndex.map { case (p, i) =>
      hyperplaneBit(v, p) * lit(1L << i)
    }.reduce(_ + _)
}
