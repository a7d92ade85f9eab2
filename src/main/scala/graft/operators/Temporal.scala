package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal joins Spark lacks natively (charter §custom-operators: compose
  * existing ops when semantics allow — this is the (a) case, no custom
  * SparkPlan needed).
  *
  * As-of join via the union + running-last-value pattern: tag both sides,
  * union on (key, ts), and carry the most recent right-side payload forward
  * with `last(..., ignoreNulls) OVER (... ROWS UNBOUNDED PRECEDING)`. ONE
  * shuffle on the key, no range cross-product, no per-row subquery — the
  * formulation that survives 100 TB (a range-condition join would explode;
  * a correlated subquery would be O(n) scans).
  */
object Temporal {

  /** For each left row, attach `valueCol` from the latest right row with
    * `right.ts <= left.ts` (inclusive — a right row at the exact timestamp
    * matches) sharing the join key. Right-side ties on (ts) are broken by
    * `rightTieBreak` so results are deterministic.
    *
    * Output: all left columns + `asof_<valueCol>` (null when no right row
    * precedes).
    */
  def asofJoin(left: DataFrame, right: DataFrame, key: String,
               leftTs: String, rightTs: String, valueCol: String,
               rightTieBreak: String): DataFrame = {
    // __tie is only meaningful on the RIGHT side (deterministic winner among
    // equal-ts right rows). Left rows take a constant: __src=1 already sorts
    // them after every right row at equal ts, and left rows carry null __v,
    // so their order among THEMSELVES cannot change any asof value — all
    // left rows at one (key, ts) see the identical prefix of right rows.
    // (A Long.MaxValue sentinel here would couple correctness to
    // rightTieBreak < Long.MaxValue for no benefit.)
    val l = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__src", lit(1))
      .withColumn("__tie", lit(0L))
      .withColumn("__v", lit(null).cast(right.schema(valueCol).dataType))
    val r = right.select(
      col(key),
      col(rightTs).as("__ts"),
      lit(0).as("__src"),
      col(rightTieBreak).cast("long").as("__tie"),
      col(valueCol).as("__v"))
    // align schemas: right side carries nulls for the left payload columns
    val leftCols = left.columns.filterNot(_ == key)
    val rAligned = leftCols.foldLeft(r) { (df, c) =>
      df.withColumn(c, lit(null).cast(left.schema(c).dataType))
    }.select(l.columns.map(col): _*)
    val u = l.unionByName(rAligned)
    // rows frame: right rows (src=0) sort before left rows at equal ts, so
    // an exact-timestamp right row is visible to the left row (>= semantics)
    val w = Window.partitionBy(key).orderBy(col("__ts"), col("__src"), col("__tie"))
      .rowsBetween(Window.unboundedPreceding, 0)
    u.withColumn(s"asof_$valueCol", last(col("__v"), ignoreNulls = true).over(w))
      .filter(col("__src") === 1)
      .drop("__ts", "__src", "__tie", "__v")
  }

  /** Range join: left rows matched to right intervals [startCol, endCol)
    * sharing the key — expressed as an equi-join on the key plus range
    * predicates, so Catalyst plans a hash/sort-merge join on the key with
    * the range as a post-join filter (never a cross product).
    */
  def rangeJoin(left: DataFrame, right: DataFrame, key: String,
                leftTs: String, startCol: String, endCol: String): DataFrame =
    left.join(right,
      left(key) === right(key) &&
        left(leftTs) >= right(startCol) && left(leftTs) < right(endCol))
      .drop(right(key))
}
