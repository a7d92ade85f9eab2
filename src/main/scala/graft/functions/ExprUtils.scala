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
}
