package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Behavioral analytics over the events stream: ordered-sequence funnels
  * and cohort retention — the two reports every product-analytics engine
  * ships over exactly the webhook/event archive the reference ingests
  * (reference: server.js:38-40 + migrations/init.sql:19-29 — events land
  * append-only with user_id/event_type/ts; the reference defers all
  * reporting to SQL).
  *
  * Both operators reduce the corpus to per-user bounded state in ONE
  * map-side-combinable aggregate before anything user-crossing happens, so
  * at 100 TB the only full-volume exchange is the per-user groupBy:
  *  - funnel: per user, the first-step min plus the later steps' candidate
  *    timestamp lists (only the funnel types' timestamps — longs, not
  *    rows). Greedy earliest-after-previous matching then runs inside a
  *    narrow projection (array HOFs), and the final stage counts are a
  *    single flat row.
  *  - retention: per user, the distinct-week set (collect_set — bounded by
  *    the calendar, ~52/year), cohort = its min; the (cohort, offset)
  *    rollup aggregates rows that are already ≤ |weeks| per user.
  *
  * Funnel semantics are the standard greedy scan: stage k is reached at
  * the EARLIEST occurrence of step k strictly after the stage-(k−1)
  * timestamp (first-touch attribution; re-entries don't help, matching the
  * classic definition). A user with clicks before their first view still
  * converts on a later click — `min(filter(ts > prev))`, not
  * `min(ts) > prev`.
  */
object Behavior {

  /** Greedy k-step funnel (default view → click → purchase, any k ≥ 2):
    * per-stage reached-user counts plus conversion from stage 1. Output is
    * one row per stage: (step_idx, step, n_users, conv). The per-user
    * aggregate carries the first step's min plus the later steps' candidate
    * timestamp lists, so the greedy resolution folds over ANY step count
    * inside the same one-exchange plan shape. */
  def funnel(events: DataFrame,
             steps: Seq[String] = Seq("view", "click", "purchase")): DataFrame = {
    require(steps.size >= 2, "a funnel needs at least two steps")
    val k = steps.size
    // one user-keyed aggregate; collect_list drops nulls, so each list holds
    // exactly that step's timestamps (bounded by per-user activity)
    val aggs =
      min(when(col("event_type") === steps.head, col("ts"))).as("s1") +:
        steps.tail.zipWithIndex.map { case (s, i) =>
          collect_list(when(col("event_type") === s, col("ts"))).as(s"l${i + 2}")
        }
    val perUser = events.groupBy("user_id").agg(aggs.head, aggs.tail: _*)
    // greedy earliest-after-previous; null prev ⇒ lambda null ⇒ filtered ⇒
    // array_min(empty) = null, so non-reached stages cascade as nulls
    val staged = (2 to k).foldLeft(perUser) { (df, i) =>
      df.withColumn(s"s$i",
        array_min(filter(col(s"l$i"), t => t > col(s"s${i - 1}"))))
    }
    funnelSummary(staged, steps)
  }

  /** Stage counts + conversion over a per-user (s1 … sk) stage frame —
    * shared with [[graft.streaming.FunnelStream]], whose state IS that
    * frame maintained incrementally. */
  def funnelSummary(staged: DataFrame, steps: Seq[String]): DataFrame = {
    val k = steps.size
    val counts = (1 to k).map(i => count(col(s"s$i")).as(s"n$i"))
    val flat = staged.agg(counts.head, counts.tail: _*)
    val rows = steps.zipWithIndex.map { case (s, i) =>
      val n = i + 1
      s"  ${n}L, '${s.replace("'", "''")}', n$n, round(n$n / nullif(n1, 0), 4)"
    }.mkString(",\n")
    flat.select(expr(
      s"stack($k,\n$rows\n) AS (step_idx, step, n_users, conv)"))
      .orderBy("step_idx")
  }

  def funnelGate(spark: SparkSession, dir: String): DataFrame =
    funnel(Tables.events(spark, dir))

  val funnelSql: String =
    """WITH u AS (
      |  SELECT user_id,
      |    MIN(CASE WHEN event_type = 'view' THEN ts END) AS s1,
      |    COALESCE(LIST(ts) FILTER (WHERE event_type = 'click'), []) AS l2,
      |    COALESCE(LIST(ts) FILTER (WHERE event_type = 'purchase'), []) AS l3
      |  FROM events GROUP BY user_id),
      |t2 AS (SELECT user_id, s1, l3,
      |    list_min(list_filter(l2, t -> s1 IS NOT NULL AND t > s1)) AS s2
      |  FROM u),
      |t3 AS (SELECT user_id, s1, s2,
      |    list_min(list_filter(l3, t -> s2 IS NOT NULL AND t > s2)) AS s3
      |  FROM t2),
      |c AS (SELECT CAST(COUNT(s1) AS BIGINT) AS n1,
      |             CAST(COUNT(s2) AS BIGINT) AS n2,
      |             CAST(COUNT(s3) AS BIGINT) AS n3 FROM t3)
      |SELECT * FROM (
      |  SELECT CAST(1 AS BIGINT) AS step_idx, 'view' AS step, n1 AS n_users,
      |         ROUND(CAST(n1 AS DOUBLE) / NULLIF(n1, 0), 4) AS conv FROM c
      |  UNION ALL SELECT 2, 'click', n2,
      |         ROUND(CAST(n2 AS DOUBLE) / NULLIF(n1, 0), 4) FROM c
      |  UNION ALL SELECT 3, 'purchase', n3,
      |         ROUND(CAST(n3 AS DOUBLE) / NULLIF(n1, 0), 4) FROM c)
      |ORDER BY step_idx""".stripMargin

  /** Weekly cohort retention: users bucketed by the ISO week of their first
    * event; each (cohort_week, week_offset) cell counts distinct users from
    * that cohort active in that week. */
  def retention(events: DataFrame): DataFrame =
    retentionOfWeeks(events
      .select(col("user_id"), to_date(date_trunc("week", col("ts"))).as("wk")))

  /** The matrix over a (user_id, wk DATE) activity frame — shared with the
    * streaming fold ([[graft.streaming.RetentionStream]]), whose state IS
    * this frame accumulated across batches. */
  def retentionOfWeeks(userWeeks: DataFrame): DataFrame = {
    // one exchange: per-user distinct-week set (calendar-bounded), cohort =
    // element 1 of the sorted set; explode back to (user, wk) rows
    val perUser = userWeeks
      .groupBy("user_id")
      .agg(sort_array(collect_set(col("wk"))).as("wks"))
      .select(col("user_id"), element_at(col("wks"), 1).as("cohort"),
        explode(col("wks")).as("wk"))
    perUser
      .groupBy(
        date_format(col("cohort"), "yyyy-MM-dd").as("cohort_week"),
        // both dates are week-truncated Mondays, so the day gap is an exact
        // multiple of 7 — floor is a formality shared with the oracle
        floor(datediff(col("wk"), col("cohort")) / 7).cast("long").as("week_offset"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy("cohort_week", "week_offset")
  }

  def retentionGate(spark: SparkSession, dir: String): DataFrame =
    retention(Tables.events(spark, dir))

  val retentionSql: String =
    """WITH uw AS (
      |  SELECT DISTINCT user_id, DATE_TRUNC('week', ts)::DATE AS wk FROM events),
      |c AS (SELECT user_id, MIN(wk) AS cohort FROM uw GROUP BY user_id)
      |SELECT STRFTIME(cohort, '%Y-%m-%d') AS cohort_week,
      |       CAST(FLOOR(DATEDIFF('day', cohort, wk) / 7.0) AS BIGINT) AS week_offset,
      |       COUNT(*) AS n_users
      |FROM uw JOIN c USING (user_id)
      |GROUP BY 1, 2 ORDER BY cohort_week, week_offset""".stripMargin
}
