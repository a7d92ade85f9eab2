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
      val base = Seq(count(col(c)).as(s"__nn_$c")) ++ // non-null count
        (if (exactDistinct) Nil
         else Seq(approx_count_distinct(col(c)).as(s"__nd_$c")))
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
    val stats = df.groupBy().agg(count(lit(1)).as("__n"), aggs: _*)
    // Exact distinct rides a SEPARATE aggregate, cross-joined back (two
    // 1-row sides): fused with the min/max aggregates, the string/decimal
    // buffers force SortAggregate for EVERY phase — including the
    // multi-distinct Expand's (gid, col) grouping, i.e. two full sorts of
    // #cols× expanded rows (measured 3.05 → 0.70 s at sf0.1). Split, the
    // distinct aggregate's buffers are long-only, so it plans
    // Expand + HashAggregate; the stats aggregate is keyless (grouping-free
    // SortAggregate needs no sort). Costs a second scan — the documented
    // price of exactness; the approx form stays one fused pass.
    val one =
      if (!exactDistinct) stats
      else stats.crossJoin(df.groupBy().agg(
        countDistinct(col(cols.head._1)).as(s"__nd_${cols.head._1}"),
        cols.tail.map { case (c, _) => countDistinct(col(c)).as(s"__nd_$c") }: _*))
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

  // --- equi-width histograms (round 14) --------------------------------------

  /** Per-column equi-width histogram — the profiler's DISTRIBUTION view
    * (min/max/avg say nothing about shape; the layout advisor's band-width
    * assumption and any skew diagnosis need bucket masses). One tiny
    * min/max aggregate (one row to the driver) fixes the bucket grid, then
    * ONE corpus pass buckets every value — the exchange carries ≤ cols ×
    * nBuckets partial counts per partition (map-side combined), flat at
    * any volume, zero spill risk. Counts are additive ⇒ the state is
    * mergeable exactly like [[profileState]] (a streaming fold needs the
    * grid pinned once up front — document-level min/max drift would
    * re-bucket history, so a streaming histogram freezes its grid at
    * deployment, the standard monitoring trade).
    *
    * Output: (col_name, bucket, lo, hi, cnt), all nBuckets rows per column
    * (zero-filled), ordered. Null values are counted by [[profile]]'s
    * n_null, not bucketed. Bucket index: least(K−1, floor((x − min) · K /
    * (max − min))) in double arithmetic — the same expression the DuckDB
    * oracle evaluates, so the gate compares bitwise. A constant column
    * lands entirely in bucket 0.
    */
  def histogram(df: DataFrame, cols: Seq[String],
                nBuckets: Int = 16): DataFrame = {
    require(cols.nonEmpty && nBuckets >= 1)
    val grid = histogramGrid(df, cols)
    finishHistogram(histogramState(df, grid, nBuckets),
      df.sparkSession, grid, nBuckets)
  }

  /** The grid a histogram buckets into: per-column global min/max (None for
    * an all-null column). ONE tiny aggregate row. A STREAMING fold freezes
    * this at deployment ([[graft.streaming.HistogramStream]]) — re-deriving
    * it per batch would re-bucket history. */
  def histogramGrid(df: DataFrame,
                    cols: Seq[String]): Seq[(String, Option[(Double, Double)])] = {
    val aggs = cols.flatMap(c => Seq(
      min(col(c)).cast("double").as(s"mn_$c"),
      max(col(c)).cast("double").as(s"mx_$c")))
    val stats = df.agg(aggs.head, aggs.tail: _*).head()
    cols.zipWithIndex.map { case (c, j) =>
      val i = j * 2
      c -> (if (stats.isNullAt(i)) None
            else Some((stats.getDouble(i), stats.getDouble(i + 1))))
    }
  }

  /** Additive histogram state of `df` under a FIXED grid: (col_name,
    * bucket, cnt), non-empty buckets only — mergeable by plain count sum.
    * Values OUTSIDE the grid clamp into the edge buckets (impossible when
    * the grid came from this df's own min/max; under a frozen streaming
    * grid, edge-bucket mass growth IS the drift signal). */
  private[graft] def histogramState(df: DataFrame,
      grid: Seq[(String, Option[(Double, Double)])],
      nBuckets: Int): DataFrame = {
    val kD = nBuckets.toDouble
    df.select(explode(array(grid.map { case (c, b0) =>
        val b = b0 match {
          case None => lit(null).cast("long")
          case Some((mn, mx)) if mn == mx =>
            when(col(c).isNull, lit(null).cast("long")).otherwise(lit(0L))
          case Some((mn, mx)) =>
            when(col(c).isNull, lit(null).cast("long")).otherwise(
              greatest(lit(0L), least(lit(nBuckets - 1L),
                floor((col(c).cast("double") - lit(mn)) * lit(kD) / lit(mx - mn)))))
        }
        struct(lit(c).as("col_name"), b.as("bucket"))
      }: _*)).as("e"))
      .select(col("e.col_name"), col("e.bucket"))
      .filter(col("bucket").isNotNull)
      .groupBy("col_name", "bucket").agg(count(lit(1)).as("cnt"))
  }

  /** Zero-filled presentation of histogram state: all nBuckets rows per
    * column with bound columns; lo/hi arithmetic mirrors the oracle's
    * mn + (bucket · (mx − mn)) / K exactly. Grid rows are driver-built
    * literals (≤ cols × nBuckets). */
  private[graft] def finishHistogram(state: DataFrame,
      spark: SparkSession,
      grid: Seq[(String, Option[(Double, Double)])],
      nBuckets: Int): DataFrame = {
    val kD = nBuckets.toDouble
    import spark.implicits._
    val gridDf = grid.flatMap { case (c, b0) =>
      (0 until nBuckets).map { b =>
        val (lo, hi) = b0 match {
          case Some((mn, mx)) =>
            (Some(mn + b.toDouble * (mx - mn) / kD),
             Some(mn + (b + 1).toDouble * (mx - mn) / kD))
          case None => (None, None)
        }
        (c, b.toLong, lo, hi)
      }
    }.toDF("col_name", "bucket", "lo", "hi")
    gridDf.join(state.groupBy("col_name", "bucket").agg(sum("cnt").as("cnt")),
        Seq("col_name", "bucket"), "left")
      .select(col("col_name"), col("bucket"), col("lo"), col("hi"),
        coalesce(col("cnt"), lit(0L)).as("cnt"))
      .orderBy("col_name", "bucket")
  }

  /** Gate query: 16-bucket histograms of the `documents` numeric columns. */
  def histogramDocuments(spark: SparkSession, dir: String): DataFrame =
    histogram(Tables.documents(spark, dir), Seq("doc_id", "n_chars"))

  /** DuckDB replay of [[histogramDocuments]] — same grid, same double
    * arithmetic, zero-filled via a generated (col, bucket) frame. */
  def histogramDocumentsSql(nBuckets: Int = 16): String = {
    val cols = Seq("doc_id", "n_chars")
    val statSel = cols.zipWithIndex.map { case (c, i) =>
      s"CAST(MIN($c) AS DOUBLE) AS mn$i, CAST(MAX($c) AS DOUBLE) AS mx$i"
    }.mkString(", ")
    val entries = cols.zipWithIndex.map { case (c, i) =>
      // GREATEST(0, …) mirrors the Spark-side clamp exactly (ADVICE r14):
      // identical today because this grid is self-derived (no value below
      // mn), but the oracle must stay reusable against a frozen external
      // grid where values can fall below the grid minimum
      s"""SELECT '$c' AS col_name,
         |  CASE WHEN mx$i = mn$i THEN 0
         |       ELSE GREATEST(0, LEAST(${nBuckets - 1}, CAST(FLOOR(
         |         (CAST($c AS DOUBLE) - mn$i) * $nBuckets.0 / (mx$i - mn$i))
         |         AS BIGINT))) END AS bucket
         |FROM documents CROSS JOIN s WHERE $c IS NOT NULL""".stripMargin
    }.mkString("\nUNION ALL\n")
    val names = cols.map(c => s"('$c')").mkString(", ")
    val loCase = cols.zipWithIndex.map { case (c, i) =>
      s"WHEN '$c' THEN mn$i + (g.bucket * (mx$i - mn$i)) / $nBuckets.0"
    }.mkString(" ")
    val hiCase = cols.zipWithIndex.map { case (c, i) =>
      s"WHEN '$c' THEN mn$i + ((g.bucket + 1) * (mx$i - mn$i)) / $nBuckets.0"
    }.mkString(" ")
    s"""WITH s AS (SELECT $statSel FROM documents),
       |u AS ($entries),
       |c AS (SELECT col_name, bucket, COUNT(*) AS cnt FROM u GROUP BY 1, 2),
       |g AS (SELECT col_name, i AS bucket
       |      FROM (VALUES $names) t(col_name)
       |      CROSS JOIN (SELECT UNNEST(range(0, $nBuckets)) AS i))
       |SELECT g.col_name, g.bucket,
       |  CASE g.col_name $loCase END AS lo,
       |  CASE g.col_name $hiCase END AS hi,
       |  COALESCE(c.cnt, 0) AS cnt
       |FROM g CROSS JOIN s
       |LEFT JOIN c ON c.col_name = g.col_name AND c.bucket = g.bucket
       |ORDER BY g.col_name, g.bucket""".stripMargin
  }

  // --- mergeable profile state (the streaming / incremental form) ------------
  //
  // Every stat above except exact n_distinct is a FOLD: counts and decimal
  // sums add, min/max fold, and distinct becomes mergeable as a KMV theta
  // sketch (the k smallest distinct hashes of a union are computable from
  // the per-part k-minima — any value dropped from a part's top-k has k
  // part-local values below it, so it cannot be among the union's k
  // minima). [[profileState]] emits one mergeable row per column;
  // [[mergeState]] folds state rows state-to-state (compaction shape);
  // [[finishProfile]] presents merged state as the profile. Stream-fold ≡
  // one-shot bit-identity is pinned in ProfileStreamSpec.

  /** Hash choice for the distinct sketch: production = `xxhash64` (64-bit
    * domain); gate/portable = [[graft.functions.Hashing.h60]] (60-bit
    * domain, DuckDB-replicable so even the ESTIMATE is hash-compared). */
  case class SketchHash(fn: Column => Column, bits: Int)
  val Xx64: SketchHash = SketchHash(c => xxhash64(c), 64)
  val H60: SketchHash = SketchHash(c => graft.functions.Hashing.h60(c), 60)

  /** One mergeable state row per column: (col_name, n, n_nonnull, typed
    * min/max, decimal sum, sorted retained hash minima `ks` in the
    * sketch's transformed domain). ONE aggregate over `df`, same shape as
    * [[profile]]. Hash input is the column's STRING rendering (portable
    * across engines for integer/string/formatted-timestamp columns — the
    * reason the gate profiles those kinds). */
  def profileState(df: DataFrame, cols: Seq[(String, ColKind)],
                   k: Int = 256, hash: SketchHash = H60): DataFrame = {
    val aggs: Seq[Column] = cols.flatMap { case (c, kind) =>
      val base = Seq(
        count(col(c)).as(s"__nn_$c"),
        ThetaSketch.sketchNullable(hash.fn(col(c).cast("string")), k)
          .getField("ks").as(s"__ks_$c"))
      val typed = kind match {
        case NumCol => Seq(
          min(col(c)).cast("double").as(s"__min_$c"),
          max(col(c)).cast("double").as(s"__max_$c"),
          sum(col(c).cast("decimal(18,2)")).cast("decimal(28,2)").as(s"__sum_$c"))
        case StrCol => Seq(
          min(col(c)).as(s"__min_$c"), max(col(c)).as(s"__max_$c"))
        case TsCol => Seq(
          date_format(min(col(c)), "yyyy-MM-dd HH:mm:ss").as(s"__min_$c"),
          date_format(max(col(c)), "yyyy-MM-dd HH:mm:ss").as(s"__max_$c"))
      }
      base ++ typed
    }
    val one = df.groupBy().agg(count(lit(1)).as("__n"), aggs: _*)
    val rows = cols.map { case (c, kind) =>
      val (minNum, maxNum, sumNum, minStr, maxStr) = kind match {
        case NumCol => (col(s"__min_$c"), col(s"__max_$c"), col(s"__sum_$c"),
          lit(null).cast("string"), lit(null).cast("string"))
        case StrCol | TsCol => (lit(null).cast("double"), lit(null).cast("double"),
          lit(null).cast("decimal(28,2)"), col(s"__min_$c"), col(s"__max_$c"))
      }
      struct(
        lit(c).as("col_name"),
        col("__n").as("n"),
        col(s"__nn_$c").as("n_nonnull"),
        minNum.as("min_num"), maxNum.as("max_num"), sumNum.as("sum_num"),
        minStr.as("min_str"), maxStr.as("max_str"),
        col(s"__ks_$c").as("ks"))
    }
    one.select(explode(array(rows: _*)).as("p")).select("p.*")
  }

  /** Fold state rows state-to-state: one output row per column. The ks
    * merge takes the k smallest of the per-row sorted minima (exact — see
    * the mergeability note above); everything else is a plain fold. */
  def mergeState(state: DataFrame, k: Int): DataFrame =
    state.groupBy("col_name").agg(
      sum("n").as("n"),
      sum("n_nonnull").as("n_nonnull"),
      min("min_num").as("min_num"),
      max("max_num").as("max_num"),
      sum("sum_num").cast("decimal(28,2)").as("sum_num"),
      min("min_str").as("min_str"),
      max("max_str").as("max_str"),
      slice(array_sort(array_distinct(flatten(collect_list("ks")))), 1, k).as("ks"))

  /** Present merged state as the profile, with the sketch's distinct
    * ESTIMATE (exact while distinct < k, else (k−1)/θ): column order and
    * semantics match [[profile]] plus `n_distinct_est`. */
  def finishProfile(state: DataFrame, k: Int, hash: SketchHash = H60): DataFrame = {
    val merged = mergeState(state, k)
    val thetaT = when(size(col("ks")) < k, lit(Long.MaxValue))
      .otherwise(element_at(col("ks"), k))
    // retained values live in the transformed domain (h ^ Long.MinValue);
    // the estimate divides by the fraction of the HASH domain below θ
    val frac = hash.bits match {
      case 64 => (thetaT.cast("double") + lit(9.223372036854776e18)) /
        lit(1.8446744073709552e19)
      case 60 => when(thetaT === Long.MaxValue, lit(1.0))
        .otherwise(thetaT.bitwiseXOR(lit(Long.MinValue)).cast("double") /
          lit(1.152921504606846976e18))
      case b => throw new IllegalArgumentException(s"unsupported hash domain: $b bits")
    }
    merged.select(
        col("col_name"), col("n"),
        (col("n") - col("n_nonnull")).as("n_null"),
        round(size(filter(col("ks"), v => v < thetaT)).cast("double") / frac, 4)
          .as("n_distinct_est"),
        col("min_num"), col("max_num"),
        round(col("sum_num").cast("double") / col("n_nonnull"), 4).as("avg_num"),
        col("min_str"), col("max_str"))
      .orderBy("col_name")
  }

  /** One-shot sketched profile (the batch twin of the streaming fold). */
  def profileTheta(df: DataFrame, cols: Seq[(String, ColKind)],
                   k: Int = 256, hash: SketchHash = H60): DataFrame =
    finishProfile(profileState(df, cols, k, hash), k, hash)

  /** Column list for the `documents` sketched gate profile — integer and
    * string kinds only: their STRING renderings (the sketch's hash input)
    * are engine-portable, so the DuckDB oracle hash-compares even the
    * estimates. Doubles stay on the production xxhash64 path (native-byte
    * hashing; no portable rendering to anchor an oracle to). */
  val documentsCols: Seq[(String, ColKind)] = Seq(
    "doc_id" -> NumCol,
    "lang" -> StrCol,
    "n_chars" -> NumCol,
    "source" -> StrCol,
    "text" -> StrCol)

  /** Gate k: small enough that doc_id/text OVERFLOW the sketch at sf0.01
    * (the θ-estimate path actually fires at the gate), large enough that
    * lang/source stay exact. */
  val GateK = 256

  /** Gate query: sketched profile of `documents` on the portable h60. */
  def profileDocumentsTheta(spark: SparkSession, dir: String): DataFrame =
    profileTheta(Tables.documents(spark, dir), documentsCols, GateK, H60)

  /** DuckDB mirror: per column, the k smallest distinct h60 values of the
    * string rendering replay the KMV rule exactly — θ = the kth minimum
    * (or the full 60-bit domain while exact), estimate = |below θ| / (θ /
    * 2^60). Integers and IEEE divisions only, so the estimate itself is
    * hash-compared. */
  def profileDocumentsThetaSql: String = {
    val k = GateK
    val selects = documentsCols.map { case (c, kind) =>
      val h = graft.functions.Hashing.h60Sql(s"CAST($c AS VARCHAR)")
      val typed = kind match {
        case NumCol =>
          s"""CAST(MIN($c) AS DOUBLE) AS min_num, CAST(MAX($c) AS DOUBLE) AS max_num,
             |ROUND(CAST(SUM(CAST($c AS DECIMAL(18,2))) AS DOUBLE) / COUNT($c), 4) AS avg_num,
             |CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str""".stripMargin
        case _ =>
          s"""CAST(NULL AS DOUBLE) AS min_num, CAST(NULL AS DOUBLE) AS max_num,
             |CAST(NULL AS DOUBLE) AS avg_num,
             |MIN($c) AS min_str, MAX($c) AS max_str""".stripMargin
      }
      s"""SELECT '$c' AS col_name, COUNT(*) AS n,
         |COUNT(*) - COUNT($c) AS n_null,
         |(SELECT ROUND(
         |   CAST(LEN(list_filter(l[1:$k], x -> x < theta)) AS DOUBLE)
         |     / (CAST(theta AS DOUBLE) / 1152921504606846976.0), 4)
         | FROM (SELECT l,
         |         CASE WHEN LEN(l) < $k THEN 1152921504606846976 ELSE l[$k] END AS theta
         |       FROM (SELECT list_sort(list_distinct(list($h))) AS l
         |             FROM documents WHERE $c IS NOT NULL))) AS n_distinct_est,
         |$typed
         |FROM documents""".stripMargin
    }
    selects.mkString("", "\nUNION ALL\n", "\nORDER BY col_name")
  }

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
