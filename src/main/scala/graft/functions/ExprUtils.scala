package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Expression-level helpers shared across operators. */
object ExprUtils {

  /** Evaluate-once binding for an expensive expression: wraps it in a
    * single-element array and pipes it through a `transform` lambda, whose
    * input is evaluated exactly once per row. Without this, Catalyst's
    * CollapseProject inlines a projected column into every downstream
    * reference — an expression referenced N times gets computed N times per
    * row (measured 64× for MinHash band keys, ~6× for from_json payload
    * structs). Works for any element type: array, struct, scalar.
    */
  def bindOnce(expensive: Column)(body: Column => Column): Column =
    element_at(transform(array(expensive), body), 1)

  /** Signed-zero-normalized round. Spark's `round` (BigDecimal-based)
    * returns `+0.0` for a tiny negative input, while engines that round in
    * IEEE doubles (DuckDB's `ROUND`) preserve the sign and return `-0.0` —
    * bitwise different, so any hash-based result compare fails on rounded
    * signed quantities (log-odds, log-probabilities, log-weights, cosines)
    * that land exactly on zero. `x + 0.0` maps `-0.0` to `+0.0` and is the
    * identity elsewhere (IEEE 754), so applying it on BOTH engines pins the
    * representation. Use for every rounded column that can be a tiny
    * negative; pair with [[roundzSql]] in the oracle.
    */
  def roundz(c: Column, scale: Int): Column = round(c, scale) + lit(0.0)

  /** DuckDB-side twin of [[roundz]]: `-0.0 + 0.0 = +0.0`. */
  def roundzSql(e: String, scale: Int): String = s"(ROUND($e, $scale) + 0.0)"
}
