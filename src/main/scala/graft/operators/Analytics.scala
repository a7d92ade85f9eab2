package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Batch analytics parity with the reference's five endpoints
  * (`/root/reference/routes/analytics.js` — SURVEY.md §2.2–2.6).
  *
  * Tenant mapping (SURVEY.md §7.0): the reference scopes every query by
  * `tenant_id` from the JWT; the testdata stand-ins are `o_orderpriority`
  * (orders-side tenant, 5 values) and `c_mktsegment` (customer-side tenant,
  * 5 values). Equality filters on them hit parquet row-group stats the way
  * the reference's `idx_*_tenant` B-trees hit heap pages
  * (`migrations/init.sql:16,46,62`).
  *
  * Determinism contract with the DuckDB oracle (SURVEY.md §7.4): every float
  * aggregate is `round(_, 2)`, every `first()`/`LIMIT 1` nondeterminism is
  * replaced by `min()`, and every result carries a total ORDER BY.
  */
object Analytics {
  /** Stand-in for the reference's `WHERE tenant_id = $1` on orders. */
  val OrdersTenant = "1-URGENT"
  /** Stand-in tenant filter on the customers side. */
  val CustomerTenant = "BUILDING"

  // --- A1: GET /api/overview (`routes/analytics.js:33-39`) -----------------
  // Four scalar aggregates over two tables; the reference's `LIMIT 1`
  // currency pick is nondeterministic, so both engine and oracle use min().
  def overview(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
      .filter(col("o_orderpriority") === OrdersTenant)
      .agg(
        count(lit(1)).as("total_orders"),
        round(coalesce(sum("o_totalprice"), lit(0.0)), 2).as("total_revenue"),
        min("o_orderstatus").as("currency"))
    val c = Tables.customer(spark, dir)
      .filter(col("c_mktsegment") === CustomerTenant)
      .agg(count(lit(1)).as("total_customers"))
    // Two 1-row aggregates; the cross join is a trivial broadcast.
    c.crossJoin(o)
  }

  val overviewSql: String =
    s"""SELECT (SELECT COUNT(*) FROM customer WHERE c_mktsegment = '$CustomerTenant') AS total_customers,
       |COUNT(*) AS total_orders,
       |ROUND(COALESCE(SUM(o_totalprice), 0), 2) AS total_revenue,
       |MIN(o_orderstatus) AS currency
       |FROM orders WHERE o_orderpriority = '$OrdersTenant'""".stripMargin

  // --- A2: GET /api/orders-by-date (`routes/analytics.js:54-72`) -----------
  // Hash aggregate on a computed day key; partial (map-side) aggregation is
  // automatic, so the shuffle carries one row per (day) not per order.
  // Day buckets surface as ISO 'yyyy-MM-dd' STRINGS, not DATE: parquet
  // date32 and DuckDB DATE render differently under pandas-style hashing
  // (datetime.date vs datetime64), and ISO strings sort identically to dates.
  def ordersByDate(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .filter(col("o_orderpriority") === OrdersTenant)
      .groupBy(date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date"))
      .agg(
        count(lit(1)).as("order_count"),
        round(sum("o_totalprice"), 2).as("daily_revenue"))
      .orderBy(col("order_date").desc)

  val ordersByDateSql: String =
    s"""SELECT STRFTIME(o_orderdate, '%Y-%m-%d') AS order_date,
       |COUNT(*) AS order_count,
       |ROUND(SUM(o_totalprice), 2) AS daily_revenue
       |FROM orders WHERE o_orderpriority = '$OrdersTenant'
       |GROUP BY STRFTIME(o_orderdate, '%Y-%m-%d')
       |ORDER BY order_date DESC""".stripMargin

  // --- A2 composed variant: dynamic date-range bounds ----------------------
  // The reference appends `created_at >= $2 AND created_at <= $3` ONLY when
  // BOTH bounds are present (`routes/analytics.js:63-67`); a lone bound is
  // ignored. Same dynamic composition here: the predicate is chained onto
  // the plan conditionally, and when present it reaches the parquet scan as
  // a pushed filter (row-group min/max skipping — the created_at B-tree
  // analogue), so the bounded variant reads LESS data, not the same data
  // post-filtered.
  def ordersByDateRange(spark: SparkSession, dir: String,
                        startDate: Option[String],
                        endDate: Option[String]): DataFrame = {
    val base = Tables.orders(spark, dir)
      .filter(col("o_orderpriority") === OrdersTenant)
    val ranged = (startDate, endDate) match {
      case (Some(s), Some(e)) =>
        base.filter(col("o_orderdate") >= lit(s) && col("o_orderdate") <= lit(e))
      case _ => base
    }
    ranged
      .groupBy(date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date"))
      .agg(
        count(lit(1)).as("order_count"),
        round(sum("o_totalprice"), 2).as("daily_revenue"))
      .orderBy(col("order_date").desc)
  }

  /** Registered bounds for the gate run (a full mid-corpus year). */
  val DateRangeStart = "1997-01-01"
  val DateRangeEnd = "1997-12-31"

  val ordersByDateRangeSql: String =
    s"""SELECT STRFTIME(o_orderdate, '%Y-%m-%d') AS order_date,
       |COUNT(*) AS order_count,
       |ROUND(SUM(o_totalprice), 2) AS daily_revenue
       |FROM orders WHERE o_orderpriority = '$OrdersTenant'
       |AND o_orderdate >= DATE '$DateRangeStart' AND o_orderdate <= DATE '$DateRangeEnd'
       |GROUP BY STRFTIME(o_orderdate, '%Y-%m-%d')
       |ORDER BY order_date DESC""".stripMargin

  // --- A3 intended: top customers joined on the real key -------------------
  // The reference's J2 lacks a customer key (orders carry none,
  // `migrations/init.sql:50-60`); the intended semantics join
  // o_custkey = c_custkey. Shuffle hash join on the key; top-5 plans as
  // TakeOrderedAndProject (distributed top-k, no global sort).
  def topCustomersIntended(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val c = Tables.customer(spark, dir)
      .filter(col("c_mktsegment") === CustomerTenant)
    o.join(c, o("o_custkey") === c("c_custkey"))
      .groupBy(col("c_custkey"), col("c_name"))
      .agg(
        count("o_orderkey").as("order_count"),
        round(sum("o_totalprice"), 2).as("total_spent"))
      .orderBy(col("total_spent").desc, col("c_custkey"))
      .limit(5)
  }

  val topCustomersIntendedSql: String =
    s"""SELECT c_custkey, c_name,
       |COUNT(o_orderkey) AS order_count,
       |ROUND(SUM(o_totalprice), 2) AS total_spent
       |FROM orders JOIN customer ON o_custkey = c_custkey
       |WHERE c_mktsegment = '$CustomerTenant'
       |GROUP BY c_custkey, c_name
       |ORDER BY total_spent DESC, c_custkey
       |LIMIT 5""".stripMargin

  // --- A3 faithful: the reference's per-tenant fan-out join ----------------
  // `routes/analytics.js:85-97` joins orders⟕customers on tenant_id ONLY, so
  // every customer of the tenant is credited with every order. Observed
  // semantics = (orders of tenant) × (customers of tenant). Instead of
  // materializing the cross product, aggregate the orders side to ONE row
  // first and broadcast it — the only plan that survives 100 TB. Counts are
  // recovered exactly (per-name multiplicity × order count); the rounded sum
  // matches the oracle because both round to cents on ~1e-15-relative-error
  // doubles.
  def topCustomersFaithful(spark: SparkSession, dir: String): DataFrame = {
    val ordersAgg = Tables.orders(spark, dir)
      .filter(col("o_orderpriority") === OrdersTenant)
      .agg(
        count(lit(1)).as("ord_cnt"),
        coalesce(sum("o_totalprice"), lit(0.0)).as("ord_sum"))
    val custNames = Tables.customer(spark, dir)
      .filter(col("c_mktsegment") === CustomerTenant)
      .groupBy(coalesce(col("c_name"), lit("Unknown")).as("name"))
      .agg(count(lit(1)).as("name_cnt"))
    custNames.crossJoin(broadcast(ordersAgg))
      .select(
        col("name"),
        (col("name_cnt") * col("ord_cnt")).as("order_count"),
        round(col("name_cnt") * col("ord_sum"), 2).as("total_spent"))
      .orderBy(col("total_spent").desc, col("name"))
      .limit(5)
  }

  val topCustomersFaithfulSql: String =
    s"""SELECT COALESCE(c_name, 'Unknown') AS name,
       |COUNT(*) AS order_count,
       |ROUND(SUM(o_totalprice), 2) AS total_spent
       |FROM (SELECT o_totalprice FROM orders WHERE o_orderpriority = '$OrdersTenant') o
       |CROSS JOIN (SELECT c_name FROM customer WHERE c_mktsegment = '$CustomerTenant') c
       |GROUP BY COALESCE(c_name, 'Unknown')
       |ORDER BY total_spent DESC, name
       |LIMIT 5""".stripMargin

  // --- O1: GET /api/orders (`routes/analytics.js:112-123`) -----------------
  // Sort-desc + limit plans as TakeOrderedAndProject: each partition keeps
  // its local top-10, the driver merges — no global sort at any scale.
  def recentOrders(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .filter(col("o_orderpriority") === OrdersTenant)
      .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate")
      .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
      .limit(10)

  val recentOrdersSql: String =
    s"""SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate
       |FROM orders WHERE o_orderpriority = '$OrdersTenant'
       |ORDER BY o_orderdate DESC, o_orderkey DESC
       |LIMIT 10""".stripMargin

  // --- J1: users⋈tenants (`routes/analytics.js:15-20`) ---------------------
  // Point lookup + two dimension joins; nation/region are true dims, so they
  // are explicitly broadcast (Catalyst would pick it anyway under the
  // 10 MB threshold, but at 100 TB being explicit documents intent).
  def customerRegion(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .filter(col("c_custkey") === 42L)
      .join(broadcast(Tables.nation(spark, dir)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(spark, dir)), col("n_regionkey") === col("r_regionkey"))
      .select("c_custkey", "c_name", "n_name", "r_name")

  val customerRegionSql: String =
    """SELECT c_custkey, c_name, n_name, r_name
      |FROM customer
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE c_custkey = 42""".stripMargin

  // --- S3: point lookup by key (`routes/analytics.js:136`) -----------------
  def pointLookup(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .filter(col("c_custkey") === 1L)
      .select("c_custkey", "c_name", "c_acctbal", "c_mktsegment")

  val pointLookupSql: String =
    """SELECT c_custkey, c_name, c_acctbal, c_mktsegment
      |FROM customer WHERE c_custkey = 1""".stripMargin

  // --- multi-level rollup (beyond the reference's flat GROUP BYs) ----------
  // Revenue by (priority, month) with subtotal and grand-total levels in one
  // pass — Catalyst expands the rollup into a single Expand + hash aggregate,
  // not one scan per level. NULL grouping levels are COALESCEd to 'ALL' on
  // both engines so ordering and hashing agree.
  def ordersRollup(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .rollup(col("o_orderpriority"), date_format(col("o_orderdate"), "yyyy-MM").as("month"))
      .agg(count(lit(1)).as("order_count"), round(sum("o_totalprice"), 2).as("revenue"))
      .select(
        coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
        coalesce(col("month"), lit("ALL")).as("month"),
        col("order_count"), col("revenue"))
      .orderBy("priority", "month")

  val ordersRollupSql: String =
    """SELECT COALESCE(o_orderpriority, 'ALL') AS priority,
      |COALESCE(STRFTIME(o_orderdate, '%Y-%m'), 'ALL') AS month,
      |COUNT(*) AS order_count, ROUND(SUM(o_totalprice), 2) AS revenue
      |FROM orders
      |GROUP BY ROLLUP(o_orderpriority, STRFTIME(o_orderdate, '%Y-%m'))
      |ORDER BY priority, month""".stripMargin

  // --- cube (all grouping-set combinations) --------------------------------
  def ordersCube(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .cube(col("o_orderpriority"), col("o_orderstatus"))
      .agg(count(lit(1)).as("order_count"), round(sum("o_totalprice"), 2).as("revenue"))
      .select(
        coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
        coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
        col("order_count"), col("revenue"))
      .orderBy("priority", "status")

  val ordersCubeSql: String =
    """SELECT COALESCE(o_orderpriority, 'ALL') AS priority,
      |COALESCE(o_orderstatus, 'ALL') AS status,
      |COUNT(*) AS order_count, ROUND(SUM(o_totalprice), 2) AS revenue
      |FROM orders GROUP BY CUBE(o_orderpriority, o_orderstatus)
      |ORDER BY priority, status""".stripMargin

  // --- explicit grouping sets (the general form rollup/cube specialize) ----
  // (priority), (status), and grand total in ONE Expand pass — no union of
  // three scans. Uses Dataset.groupingSets (Spark 4 API).
  def ordersGroupingSets(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupingSets(
        Seq(Seq(col("o_orderpriority")), Seq(col("o_orderstatus")), Seq()),
        col("o_orderpriority"), col("o_orderstatus"))
      .agg(count(lit(1)).as("order_count"), round(sum("o_totalprice"), 2).as("revenue"))
      .select(
        coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
        coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
        col("order_count"), col("revenue"))
      .orderBy("priority", "status")

  val ordersGroupingSetsSql: String =
    """SELECT COALESCE(o_orderpriority, 'ALL') AS priority,
      |COALESCE(o_orderstatus, 'ALL') AS status,
      |COUNT(*) AS order_count, ROUND(SUM(o_totalprice), 2) AS revenue
      |FROM orders
      |GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())
      |ORDER BY priority, status""".stripMargin

  // --- pivot (priority rows × status columns) ------------------------------
  // Spark's relational pivot with an explicit value list (one pass, no
  // per-column scans); the oracle spells the same thing as CASE aggregates.
  def ordersPivot(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(col("o_orderpriority").as("priority"))
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(round(coalesce(sum("o_totalprice"), lit(0.0)), 2))
      .withColumnsRenamed(Map("F" -> "rev_f", "O" -> "rev_o", "P" -> "rev_p"))
      .orderBy("priority")

  val ordersPivotSql: String =
    """SELECT o_orderpriority AS priority,
      |ROUND(COALESCE(SUM(CASE WHEN o_orderstatus = 'F' THEN o_totalprice END), 0), 2) AS rev_f,
      |ROUND(COALESCE(SUM(CASE WHEN o_orderstatus = 'O' THEN o_totalprice END), 0), 2) AS rev_o,
      |ROUND(COALESCE(SUM(CASE WHEN o_orderstatus = 'P' THEN o_totalprice END), 0), 2) AS rev_p
      |FROM orders GROUP BY o_orderpriority ORDER BY priority""".stripMargin

  // --- exact quantiles per group -------------------------------------------
  // `percentile` (exact, interpolated) — same definition as QUANTILE_CONT.
  def priceQuantiles(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir) // r20: fanOut A/B'd WORSE (0.92->1.10 s): 32 partial exact-percentile value maps out-cost the parallelism
      .groupBy(col("o_orderpriority").as("priority"))
      .agg(
        round(expr("percentile(o_totalprice, 0.5)"), 2).as("p50"),
        round(expr("percentile(o_totalprice, 0.9)"), 2).as("p90"))
      .orderBy("priority")

  val priceQuantilesSql: String =
    """SELECT o_orderpriority AS priority,
      |ROUND(QUANTILE_CONT(o_totalprice, 0.5), 2) AS p50,
      |ROUND(QUANTILE_CONT(o_totalprice, 0.9), 2) AS p90
      |FROM orders GROUP BY o_orderpriority ORDER BY priority""".stripMargin

  // --- sketched quantiles (the 100 TB companion) ---------------------------
  // approx_percentile (Greenwald-Khanna summaries, fixed-size mergeable
  // state — no per-group sort/materialization like exact percentile). The
  // sketch value is engine-specific, so the gate row carries the EXACT
  // quantiles plus a relative-error-bound boolean — same pattern as
  // dedup_metrics_approx. accuracy=10000 → rank error ≤ 0.01% of the group.
  def priceQuantilesApprox(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir) // r20: fanOut A/B'd WORSE (exact-percentile audit side dominates, see priceQuantiles)
      .groupBy(col("o_orderpriority").as("priority"))
      .agg(
        expr("percentile(o_totalprice, 0.5)").as("e50"),
        expr("percentile(o_totalprice, 0.9)").as("e90"),
        expr("approx_percentile(o_totalprice, 0.5, 10000)").as("a50"),
        expr("approx_percentile(o_totalprice, 0.9, 10000)").as("a90"))
      .select(col("priority"),
        round(col("e50"), 2).as("p50"), round(col("e90"), 2).as("p90"),
        (abs(col("a50") - col("e50")) / col("e50") <= 0.05 &&
         abs(col("a90") - col("e90")) / col("e90") <= 0.05).as("approx_within_5pct"))
      .orderBy("priority")

  val priceQuantilesApproxSql: String =
    """SELECT o_orderpriority AS priority,
      |ROUND(QUANTILE_CONT(o_totalprice, 0.5), 2) AS p50,
      |ROUND(QUANTILE_CONT(o_totalprice, 0.9), 2) AS p90,
      |TRUE AS approx_within_5pct
      |FROM orders GROUP BY o_orderpriority ORDER BY priority""".stripMargin

  // --- set operations (INTERSECT / EXCEPT) ---------------------------------
  // Customers who ordered in both of two years vs only the first: Spark
  // plans INTERSECT/EXCEPT as aggregate + join (left-semi/anti on distinct
  // sets) — no sort-based set algebra needed.
  def custkeysIntersect(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val y1 = o.filter(year(col("o_orderdate")) === 1996).select("o_custkey")
    val y2 = o.filter(year(col("o_orderdate")) === 1997).select("o_custkey")
    y1.intersect(y2).orderBy("o_custkey")
  }

  val custkeysIntersectSql: String =
    """SELECT o_custkey FROM orders WHERE YEAR(o_orderdate) = 1996
      |INTERSECT
      |SELECT o_custkey FROM orders WHERE YEAR(o_orderdate) = 1997
      |ORDER BY o_custkey""".stripMargin

  /** Sketched set algebra — the 100 TB companion to `custkeysIntersect`:
    * |A∩B| estimated by inclusion-exclusion over three HLL++ sketches
    * (E(A) + E(B) - E(A∪B)) in ONE pass with map-side-mergeable state,
    * vs the exact INTERSECT's two distinct shuffles + join. The exact
    * counts ride the same aggregate (|A∩B| = |A|+|B|-|A∪B| exactly), and
    * the gate row asserts the estimate landed within a bound that holds
    * with large margin for rsd=0.02 compounded over three sketches
    * (Spark's HLL is deterministic per dataset, so the boolean is stable —
    * same contract as `dedup_metrics_approx`).
    */
  def custkeysIntersectApprox(spark: SparkSession, dir: String): DataFrame = {
    val a = when(year(col("o_orderdate")) === 1996, col("o_custkey"))
    val b = when(year(col("o_orderdate")) === 1997, col("o_custkey"))
    def base = Tables.orders(spark, dir)
      .filter(year(col("o_orderdate")).isin(1996, 1997)) // r20: fanOut A/B'd WORSE (0.63->1.23 s): Expand x3 partial-distinct dedup efficiency drops 32-way
    // exact distincts and HLL sketches in SEPARATE aggregates: mixed in one
    // agg, Catalyst plans the distincts via Expand and then evaluates the
    // HLLs grouped by the Expand's distinct keys — one rsd=0.02 sketch
    // buffer PER DISTINCT CUSTKEY (measured 2.3 s); split, the sketch agg
    // is a clean single partial/final pass (0.3 s). The exact side is the
    // gate harness — the production 100 TB query is the sketch agg alone.
    val exact = base.agg(
      countDistinct(a).as("n_1996"),
      countDistinct(b).as("n_1997"),
      countDistinct(col("o_custkey")).as("n_union"))
    val approx = base.agg(
      approx_count_distinct(a, 0.02).as("ea"),
      approx_count_distinct(b, 0.02).as("eb"),
      approx_count_distinct(col("o_custkey"), 0.02).as("eu"))
    exact.crossJoin(approx)
      .select(col("n_1996"), col("n_1997"),
        (col("n_1996") + col("n_1997") - col("n_union")).as("n_intersect"),
        (abs((col("ea") + col("eb") - col("eu")) -
            (col("n_1996") + col("n_1997") - col("n_union"))).cast("double")
          <= (col("n_1996") + col("n_1997") - col("n_union")).cast("double") * 0.25)
          .as("approx_within_25pct"))
  }

  val custkeysIntersectApproxSql: String =
    """SELECT CAST(COUNT(DISTINCT CASE WHEN YEAR(o_orderdate) = 1996 THEN o_custkey END) AS BIGINT) AS n_1996,
      |CAST(COUNT(DISTINCT CASE WHEN YEAR(o_orderdate) = 1997 THEN o_custkey END) AS BIGINT) AS n_1997,
      |CAST(COUNT(DISTINCT CASE WHEN YEAR(o_orderdate) = 1996 THEN o_custkey END)
      | + COUNT(DISTINCT CASE WHEN YEAR(o_orderdate) = 1997 THEN o_custkey END)
      | - COUNT(DISTINCT o_custkey) AS BIGINT) AS n_intersect,
      |TRUE AS approx_within_25pct
      |FROM orders WHERE YEAR(o_orderdate) IN (1996, 1997)""".stripMargin

  /** Theta-sketch upgrade of [[custkeysIntersectApprox]]: HLL only unions
    * (the intersect needed inclusion-exclusion across three sketches, whose
    * errors ADD); a theta sketch intersects directly with its own bound.
    * Gate contract is the same — exact counts are the harness, the sketch
    * estimate is asserted within the documented bound (deterministic: the
    * k smallest distinct hashes don't depend on order or partitioning).
    * The production 100 TB query is the two sketch aggregates alone: one
    * pass each, 8 KB mergeable state, no distinct shuffle.
    */
  def custkeysIntersectTheta(spark: SparkSession, dir: String): DataFrame = {
    def base = Tables.orders(spark, dir)
      .filter(year(col("o_orderdate")).isin(1996, 1997))
    val exact = base.agg(
      countDistinct(when(year(col("o_orderdate")) === 1996, col("o_custkey"))).as("n_1996"),
      countDistinct(when(year(col("o_orderdate")) === 1997, col("o_custkey"))).as("n_1997"),
      countDistinct(col("o_custkey")).as("n_union"))
    def yearSketch(y: Int, as: String) =
      base.filter(year(col("o_orderdate")) === y)
        .agg(ThetaSketch.sketch(xxhash64(col("o_custkey"))).as(as))
    val est = ThetaSketch.intersectionEstimate(col("sa"), col("sb"))
    val nInter = (col("n_1996") + col("n_1997") - col("n_union")).cast("double")
    exact.crossJoin(yearSketch(1996, "sa")).crossJoin(yearSketch(1997, "sb"))
      .select(col("n_1996"), col("n_1997"),
        nInter.cast("long").as("n_intersect"),
        (abs(est - nInter) <= nInter * 0.25).as("theta_within_25pct"))
  }

  val custkeysIntersectThetaSql: String =
    """SELECT CAST(COUNT(DISTINCT CASE WHEN YEAR(o_orderdate) = 1996 THEN o_custkey END) AS BIGINT) AS n_1996,
      |CAST(COUNT(DISTINCT CASE WHEN YEAR(o_orderdate) = 1997 THEN o_custkey END) AS BIGINT) AS n_1997,
      |CAST(COUNT(DISTINCT CASE WHEN YEAR(o_orderdate) = 1996 THEN o_custkey END)
      | + COUNT(DISTINCT CASE WHEN YEAR(o_orderdate) = 1997 THEN o_custkey END)
      | - COUNT(DISTINCT o_custkey) AS BIGINT) AS n_intersect,
      |TRUE AS theta_within_25pct
      |FROM orders WHERE YEAR(o_orderdate) IN (1996, 1997)""".stripMargin

  def custkeysExcept(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val y1 = o.filter(year(col("o_orderdate")) === 1996).select("o_custkey")
    val y2 = o.filter(year(col("o_orderdate")) === 1997).select("o_custkey")
    y1.except(y2).orderBy("o_custkey")
  }

  val custkeysExceptSql: String =
    """SELECT o_custkey FROM orders WHERE YEAR(o_orderdate) = 1996
      |EXCEPT
      |SELECT o_custkey FROM orders WHERE YEAR(o_orderdate) = 1997
      |ORDER BY o_custkey""".stripMargin

  // --- analytic window: running revenue per customer -----------------------
  // Cumulative SUM OVER (PARTITION BY ... ORDER BY ...) — the reference has
  // no window functions, but a tenant analytics surface needs running
  // totals; rows-frame cumulative sum shuffles once on the partition key.
  def runningRevenue(spark: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("o_custkey")
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    Tables.orders(spark, dir)
      .filter(col("o_custkey") <= 50)
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
        round(sum(col("o_totalprice")).over(w), 2).as("running_revenue"))
      .orderBy("o_custkey", "o_orderdate", "o_orderkey")
  }

  val runningRevenueSql: String =
    """SELECT o_custkey, o_orderkey, o_orderdate,
      |ROUND(SUM(o_totalprice) OVER (PARTITION BY o_custkey
      |  ORDER BY o_orderdate, o_orderkey ROWS UNBOUNDED PRECEDING), 2) AS running_revenue
      |FROM orders WHERE o_custkey <= 50
      |ORDER BY o_custkey, o_orderdate, o_orderkey""".stripMargin

  // --- analytic window: day-over-day revenue delta (lag) --------------------
  // The reference's daily time-series endpoint upgraded with the comparison
  // column every dashboard wants. Delta is computed on the ROUNDED daily
  // values so both engines subtract identical doubles. Aggregate first, lag
  // over the (tiny) per-day frame — never lag over raw orders.
  def ordersDailyDelta(spark: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("order_date"))
    Tables.orders(spark, dir)
      .filter(col("o_orderpriority") === OrdersTenant)
      .groupBy(date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date"))
      .agg(round(sum("o_totalprice"), 2).as("daily_revenue"))
      .select(col("order_date"), col("daily_revenue"),
        lag(col("daily_revenue"), 1).over(w).as("prev_revenue"))
      .select(col("order_date"), col("daily_revenue"), col("prev_revenue"),
        round(col("daily_revenue") - coalesce(col("prev_revenue"), col("daily_revenue")), 2)
          .as("delta"))
      .orderBy("order_date")
  }

  val ordersDailyDeltaSql: String =
    s"""WITH d AS (SELECT STRFTIME(o_orderdate, '%Y-%m-%d') AS order_date,
       |             ROUND(SUM(o_totalprice), 2) AS daily_revenue
       |           FROM orders WHERE o_orderpriority = '$OrdersTenant' GROUP BY 1),
       |l AS (SELECT *, LAG(daily_revenue, 1) OVER (ORDER BY order_date) AS prev_revenue FROM d)
       |SELECT order_date, daily_revenue, prev_revenue,
       |  ROUND(daily_revenue - COALESCE(prev_revenue, daily_revenue), 2) AS delta
       |FROM l ORDER BY order_date""".stripMargin

  // --- analytic window: customer spend quartiles (ntile) --------------------
  // ntile over a TOTAL order (spent desc, custkey) is deterministic and both
  // engines share the front-loaded-bucket NTILE semantics. Aggregate to one
  // row per customer before ranking — the window sorts customers, not orders.
  def customerQuartiles(spark: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("total_spent").desc, col("o_custkey"))
    Tables.orders(spark, dir)
      .filter(col("o_orderpriority") === OrdersTenant)
      .groupBy(col("o_custkey"))
      .agg(round(sum("o_totalprice"), 2).as("total_spent"))
      .select(col("o_custkey"), col("total_spent"),
        ntile(4).over(w).cast("long").as("quartile"))
      .orderBy("o_custkey")
  }

  val customerQuartilesSql: String =
    s"""SELECT o_custkey, total_spent,
       |  NTILE(4) OVER (ORDER BY total_spent DESC, o_custkey) AS quartile
       |FROM (SELECT o_custkey, ROUND(SUM(o_totalprice), 2) AS total_spent
       |      FROM orders WHERE o_orderpriority = '$OrdersTenant' GROUP BY o_custkey) t
       |ORDER BY o_custkey""".stripMargin

  // --- sketched quartiles (the 100 TB companion of customer_quartiles) -----
  // The exact variant NTILEs over an UNPARTITIONED window: a global sort that
  // funnels every customer through ONE task — the canonical scale-killer. The
  // scale path computes three GK-sketch cut points (fixed-size mergeable
  // state, one narrow agg) and assigns quartiles with a per-row comparison
  // against the broadcast cut row: no window, no global sort, no shuffle
  // beyond the customer rollup. Same gate pattern as price_quantiles_approx:
  // the sketch values are engine-specific, so the gate row carries the EXACT
  // cut points plus Spark-side error/balance booleans the oracle emits TRUE
  // for — a 5% cut-point bound and a bucket-balance bound (each sketch-
  // assigned quartile within max(2%·n, 8) of the ideal n/4; the slack
  // absorbs boundary rows, where the un-interpolated sketch cut may sit one
  // element off the interpolated exact cut).
  //
  // GATE-ONLY CAVEAT: the exact percentile() columns (e25/e50/e75) exist
  // solely so the oracle can verify the sketch — Spark's exact percentile
  // materializes an O(distinct-values) counts map in ONE final aggregation
  // buffer, the very scale-killer this query exists to avoid. The
  // production/scale form is this query MINUS the three percentile()
  // aggregates and the comparison booleans: a25/a50/a75 (GK sketch,
  // fixed-size mergeable state) + the balance check are the whole scale
  // shape. Do not ship the exact columns past the gate.
  def customerQuartilesApprox(spark: SparkSession, dir: String): DataFrame = {
    val totals = Tables.orders(spark, dir)
      .filter(col("o_orderpriority") === OrdersTenant)
      .groupBy(col("o_custkey"))
      .agg(round(sum("o_totalprice"), 2).as("total_spent"))
    val cuts = totals.agg(
      expr("percentile(total_spent, 0.25)").as("e25"),
      expr("percentile(total_spent, 0.5)").as("e50"),
      expr("percentile(total_spent, 0.75)").as("e75"),
      expr("approx_percentile(total_spent, 0.25, 10000)").as("a25"),
      expr("approx_percentile(total_spent, 0.5, 10000)").as("a50"),
      expr("approx_percentile(total_spent, 0.75, 10000)").as("a75"),
      count(lit(1)).as("n"))
    // quartile 1 = top spenders, mirroring the exact variant's DESC ntile
    val assigned = totals.crossJoin(broadcast(cuts))
      .select(col("n"),
        when(col("total_spent") > col("a75"), 1)
          .when(col("total_spent") > col("a50"), 2)
          .when(col("total_spent") > col("a25"), 3)
          .otherwise(4).as("quartile"))
    val balance = assigned.groupBy("quartile")
      .agg(count(lit(1)).as("sz"), first("n").as("n"))
      .agg(max(abs(col("sz") - col("n") / lit(4.0))).as("max_dev"),
           first("n").as("n"))
      .select((col("max_dev") <= greatest(col("n") * 0.02, lit(8.0)))
        .as("quartiles_balanced"))
    cuts.crossJoin(balance).select(
      round(col("e25"), 2).as("p25"), round(col("e50"), 2).as("p50"),
      round(col("e75"), 2).as("p75"), col("n").as("n_customers"),
      (abs(col("a25") - col("e25")) / col("e25") <= 0.05 &&
       abs(col("a50") - col("e50")) / col("e50") <= 0.05 &&
       abs(col("a75") - col("e75")) / col("e75") <= 0.05).as("approx_within_5pct"),
      col("quartiles_balanced"))
  }

  val customerQuartilesApproxSql: String =
    s"""SELECT ROUND(QUANTILE_CONT(total_spent, 0.25), 2) AS p25,
       |  ROUND(QUANTILE_CONT(total_spent, 0.5), 2) AS p50,
       |  ROUND(QUANTILE_CONT(total_spent, 0.75), 2) AS p75,
       |  COUNT(*) AS n_customers,
       |  TRUE AS approx_within_5pct,
       |  TRUE AS quartiles_balanced
       |FROM (SELECT o_custkey, ROUND(SUM(o_totalprice), 2) AS total_spent
       |      FROM orders WHERE o_orderpriority = '$OrdersTenant'
       |      GROUP BY o_custkey) t""".stripMargin

  // --- TPC-H Q1-shaped pricing summary ------------------------------------
  // Not in the reference (it has no lineitem analogue) but the headline
  // large-fact aggregation for the bench: one scan, map-side partial agg,
  // 32-way shuffle of ~6 groups.
  def lineitemPricingSummary(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum("l_quantity"), 2).as("sum_qty"),
        round(sum("l_extendedprice"), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("sum_disc_price"),
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax"))), 2).as("sum_charge"),
        round(avg("l_quantity"), 4).as("avg_qty"),
        round(avg("l_extendedprice"), 4).as("avg_price"),
        round(avg("l_discount"), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  val lineitemPricingSummarySql: String =
    """SELECT l_returnflag, l_linestatus,
      |ROUND(SUM(l_quantity), 2) AS sum_qty,
      |ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
      |ROUND(SUM(l_extendedprice * (1.0 - l_discount)), 2) AS sum_disc_price,
      |ROUND(SUM(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)), 2) AS sum_charge,
      |ROUND(AVG(l_quantity), 4) AS avg_qty,
      |ROUND(AVG(l_extendedprice), 4) AS avg_price,
      |ROUND(AVG(l_discount), 4) AS avg_disc,
      |COUNT(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin
}
