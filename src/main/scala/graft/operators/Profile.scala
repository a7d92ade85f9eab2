package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** One-pass data-quality profiler — the "expectations" pass every 100 TB
  * ingest runs before anything else touches the data: per-column row count,
  * null count, distinct count, min/max, and (for numerics) an exact
  * decimal-summed mean.
  *
  * Shape: ONE global aggregate over the table computes every column's stats
  * simultaneously (partial aggregation map-side, so the only exchange
  * carries one fixed-size row per partition), then a literal struct-array
  * explode unpivots the single result row into one output row per column —
  * no per-column scans, no joins, no window.
  *
  * Distinct counts come in two forms:
  *  - [[profile]] (the gate form) uses EXACT `countDistinct`. Spark plans
  *    multiple distinct aggregates via one Expand(#distinct-cols) — the
  *    table is replicated once per profiled column below the aggregate.
  *    That is the honest cost of exactness and fine for dimension-sized
  *    tables or occasional audits.
  *  - [[profileApprox]] (the 100 TB default) swaps `approx_count_distinct`
  *    (HLL++, fixed-size mergeable sketch): NO Expand, a single narrow
  *    pass at any width. ProfileSpec pins the documented relative-error
  *    bound against the exact form.
  *
  * Portability: counts are exact integers; min/max pass source values
  * through untouched (no arithmetic → bitwise equal to the oracle's
  * MIN/MAX of the same parquet values); means sum in DECIMAL(18,2) (exact,
  * order-free) before one double division — the
  * [[Similarity.labelDispersion]] precedent.
  */
object Profile {

  /** How a column participates in the profile. */
  sealed trait ColKind
  /** Numeric: min/max/mean in the `*_num` slots (exact decimal-summed mean). */
  case object NumCol extends ColKind
  /** String: min/max in the `*_str` slots. */
  case object StrCol extends ColKind
  /** Timestamp: min/max formatted `yyyy-MM-dd HH:mm:ss` into the `*_str`
    * slots (string-formatted so both engines hash the same rendering). */
  case object TsCol extends ColKind

  /** Per-column profile of `df`: one output row per profiled column with
    * (col_name, n, n_null, n_distinct, min_num, max_num, avg_num, min_str,
    * max_str). Slots that don't apply to the column's kind are null.
    */
  def profile(df: DataFrame, cols: Seq[(String, ColKind)],
              exactDistinct: Boolean = true): DataFrame = {
    val aggs: Seq[Column] = cols.flatMap { case (c, kind) =>
      val distinct =
        if (exactDistinct) countDistinct(col(c))
        else approx_count_distinct(col(c))
      val base = Seq(
        count(col(c)).as(s"__nn_$c"), // non-null count
        distinct.as(s"__nd_$c"))
      val typed = kind match {
        case NumCol => Seq(
          min(col(c)).cast("double").as(s"__min_$c"),
          max(col(c)).cast("double").as(s"__max_$c"),
          sum(col(c).cast("decimal(18,2)")).as(s"__sum_$c"))
        case StrCol => Seq(
          min(col(c)).as(s"__min_$c"),
          max(col(c)).as(s"__max_$c"))
        case TsCol => Seq(
          date_format(min(col(c)), "yyyy-MM-dd HH:mm:ss").as(s"__min_$c"),
          date_format(max(col(c)), "yyyy-MM-dd HH:mm:ss").as(s"__max_$c"))
      }
      base ++ typed
    }
    val one = df.groupBy().agg(count(lit(1)).as("__n"), aggs: _*)
    val rows = cols.map { case (c, kind) =>
      val (minNum, maxNum, avgNum, minStr, maxStr) = kind match {
        case NumCol => (
          col(s"__min_$c"), col(s"__max_$c"),
          // exact decimal sum → ONE double division; round(_,4) absorbs
          // nothing here (operands exact) but pins the rendering scale
          round(col(s"__sum_$c").cast("double") / col(s"__nn_$c"), 4),
          lit(null).cast("string"), lit(null).cast("string"))
        case StrCol | TsCol => (
          lit(null).cast("double"), lit(null).cast("double"),
          lit(null).cast("double"),
          col(s"__min_$c"), col(s"__max_$c"))
      }
      struct(
        lit(c).as("col_name"),
        col("__n").as("n"),
        (col("__n") - col(s"__nn_$c")).as("n_null"),
        col(s"__nd_$c").as("n_distinct"),
        minNum.as("min_num"), maxNum.as("max_num"), avgNum.as("avg_num"),
        minStr.as("min_str"), maxStr.as("max_str"))
    }
    one.select(explode(array(rows: _*)).as("p")).select("p.*")
      .orderBy("col_name")
  }

  /** The 100 TB variant: approx distinct (no Expand), everything else
    * identical. ProfileSpec pins `n_distinct` within the HLL bound of the
    * exact form. */
  def profileApprox(df: DataFrame, cols: Seq[(String, ColKind)]): DataFrame =
    profile(df, cols, exactDistinct = false)

  /** Column list for the `orders` gate profile. */
  val ordersCols: Seq[(String, ColKind)] = Seq(
    "o_orderkey" -> NumCol,
    "o_custkey" -> NumCol,
    "o_orderstatus" -> StrCol,
    "o_totalprice" -> NumCol,
    "o_orderdate" -> TsCol,
    "o_orderpriority" -> StrCol)

  /** Gate query: exact profile of every `orders` column. */
  def profileOrders(spark: SparkSession, dir: String): DataFrame =
    profile(Tables.orders(spark, dir), ordersCols)

  /** Line-for-line DuckDB mirror: one SELECT per column UNION ALL'd.
    * `COUNT(*) - COUNT(c)` for nulls keeps everything BIGINT (DuckDB's
    * SUM(int) widens to HUGEINT, which pandas renders as float — the
    * events_props_sum lesson). */
  val profileOrdersSql: String = {
    val selects = ordersCols.map { case (c, kind) =>
      val typed = kind match {
        case NumCol =>
          s"""CAST(MIN($c) AS DOUBLE) AS min_num, CAST(MAX($c) AS DOUBLE) AS max_num,
             |ROUND(CAST(SUM(CAST($c AS DECIMAL(18,2))) AS DOUBLE) / COUNT($c), 4) AS avg_num,
             |CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str""".stripMargin
        case StrCol =>
          s"""CAST(NULL AS DOUBLE) AS min_num, CAST(NULL AS DOUBLE) AS max_num,
             |CAST(NULL AS DOUBLE) AS avg_num,
             |MIN($c) AS min_str, MAX($c) AS max_str""".stripMargin
        case TsCol =>
          s"""CAST(NULL AS DOUBLE) AS min_num, CAST(NULL AS DOUBLE) AS max_num,
             |CAST(NULL AS DOUBLE) AS avg_num,
             |STRFTIME(MIN($c), '%Y-%m-%d %H:%M:%S') AS min_str,
             |STRFTIME(MAX($c), '%Y-%m-%d %H:%M:%S') AS max_str""".stripMargin
      }
      s"""SELECT '$c' AS col_name, COUNT(*) AS n,
         |COUNT(*) - COUNT($c) AS n_null,
         |COUNT(DISTINCT $c) AS n_distinct,
         |$typed
         |FROM orders""".stripMargin
    }
    selects.mkString("", "\nUNION ALL\n", "\nORDER BY col_name")
  }
}
