package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Temporal state reconstruction over an append-only change log — the
  * SCD-type-2 build every warehouse runs against event streams (Kimball's
  * slowly-changing dimension; the "event sourcing → current state"
  * compaction). The reference stores events append-only and reconstructs
  * nothing (server.js:38-40, migrations/init.sql:19-29); for a
  * training-data pipeline this is
  * the metadata-versioning primitive: "what was this entity's state when
  * the snapshot was taken" is exactly the [[stateAsOf]] read.
  *
  * [[stateHistory]] collapses each key's consecutive identical states into
  * validity intervals [valid_from, valid_to) — half-open, gapless per key,
  * `valid_to` null on the current (open) interval. A→B→A yields THREE
  * intervals (it is a run-length collapse in time order, not a group-by on
  * state — the distinction HistorySpec pins).
  *
  * Scale: ONE hash exchange total. The change-detection lag, the running
  * group sum, the run aggregate, and the interval LEAD all share the
  * user_id hash partitioning (lag/sum share one sort; the group-by's
  * clustering is satisfied by the user partitioning because user_id is a
  * subset of its keys; the LEAD window runs over the already-collapsed
  * runs). Nothing user-crossing happens anywhere — at 100 TB this is a
  * single shuffle of (key, state, ts, tiebreak) rows, narrower than the
  * source table.
  */
object History {

  /** Validity intervals per key: (key, state, valid_from, valid_to,
    * n_events, is_current), one row per maximal run of consecutive equal
    * states in (tsCol, tieCol) order. Deterministic under timestamp ties
    * via `tieCol`; null states form runs like any other value (null-safe
    * change compare). Output ordered (key, run index) — run index rather
    * than valid_from because a zero-duration run (two states at one ts)
    * ties on valid_from. */
  def stateHistory(events: DataFrame, keyCol: String = "user_id",
                   stateCol: String = "state", tsCol: String = "ts",
                   tieCol: String = "event_id"): DataFrame =
    runsOf(events, keyCol, stateCol, tsCol, tieCol)
      .orderBy(col(keyCol), col("grp"))
      .select(col(keyCol), col("state"), col("valid_from"), col("valid_to"),
        col("n_events"), col("is_current"))

  /** The unordered interval frame with its internal run index `grp`
    * (1-based, contiguous per key) — shared by [[stateHistory]],
    * [[stateAsOf]], and the incremental merge of
    * [[graft.streaming.StateHistoryStream]]. */
  private[graft] def runsOf(events: DataFrame, keyCol: String = "user_id",
                     stateCol: String = "state", tsCol: String = "ts",
                     tieCol: String = "event_id"): DataFrame = {
    // the window runs over the post-rename frame (ts_/tie_), so it keeps
    // resolving when the caller's stateCol shadows "ts" or "event_id"
    val byTime = Window.partitionBy(col(keyCol)).orderBy(col("ts_"), col("tie_"))
    val runs = events
      .select(col(keyCol), col(stateCol).as("state"), col(tsCol).as("ts_"),
        col(tieCol).as("tie_"))
      .withColumn("prev", lag(col("state"), 1).over(byTime))
      // null-safe compare PLUS an explicit first-row change: with only the
      // <=> test, a key whose FIRST state is null reads prev(null) <=>
      // state(null) as "no change" and its first run gets grp = 0 — which
      // breaks the 1-based-grp contract StateHistoryStream's per-key merge
      // relies on (grp === 1 is "the batch's first run"). row_number rides
      // the SAME window spec — no extra sort or exchange
      .withColumn("chg", when(row_number().over(byTime) === 1 ||
        !(col("prev") <=> col("state")), 1L).otherwise(0L))
      .withColumn("grp", sum("chg").over(byTime.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(keyCol), col("grp"))
      .agg(min(col("state")).as("state"), min(col("ts_")).as("valid_from"),
        count(lit(1)).as("n_events"))
    val byRun = Window.partitionBy(col(keyCol)).orderBy(col("grp"))
    runs
      .withColumn("valid_to", lead(col("valid_from"), 1).over(byRun))
      .withColumn("is_current", col("valid_to").isNull)
  }

  /** Point-in-time read: each key's state at instant `at` (keys whose
    * first event is later are absent). Half-open intervals make the
    * boundary exact: at a transition instant the NEW state holds, and
    * zero-duration runs (superseded within one timestamp) never match. */
  def stateAsOf(events: DataFrame, at: String, keyCol: String = "user_id",
                stateCol: String = "state", tsCol: String = "ts",
                tieCol: String = "event_id"): DataFrame =
    runsOf(events, keyCol, stateCol, tsCol, tieCol)
      .filter(col("valid_from") <= lit(at).cast("timestamp") &&
        (col("valid_to").isNull || col("valid_to") > lit(at).cast("timestamp")))
      .orderBy(col(keyCol))
      .select(col(keyCol), col("state"), col("valid_from").as("since"),
        col("n_events"))

  // ---- gate forms over the events table ----------------------------------

  /** Mid-corpus instant for the gate's as-of read (events span 2024). */
  val GateAsOf = "2024-02-15 00:00:00"

  def stateHistoryEvents(spark: SparkSession, dir: String): DataFrame =
    stateHistory(Tables.events(spark, dir), stateCol = "event_type")

  def stateAsOfEvents(spark: SparkSession, dir: String): DataFrame =
    stateAsOf(Tables.events(spark, dir), GateAsOf, stateCol = "event_type")

  private val runsCte =
    """WITH o AS (
      |  SELECT user_id, event_type, ts, event_id,
      |    LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev,
      |    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
      |  FROM events),
      |g AS (
      |  SELECT user_id, event_type, ts,
      |    SUM(CASE WHEN rn = 1 OR prev IS DISTINCT FROM event_type THEN 1 ELSE 0 END)
      |      OVER (PARTITION BY user_id ORDER BY ts, event_id) AS grp
      |  FROM o),
      |r AS (
      |  SELECT user_id, grp, MIN(event_type) AS state, MIN(ts) AS valid_from,
      |    COUNT(*) AS n_events
      |  FROM g GROUP BY user_id, grp),
      |iv AS (
      |  SELECT user_id, grp, state, valid_from,
      |    LEAD(valid_from) OVER (PARTITION BY user_id ORDER BY grp) AS valid_to,
      |    n_events
      |  FROM r)""".stripMargin

  val stateHistorySql: String =
    s"""$runsCte
       |SELECT user_id, state, valid_from, valid_to, n_events,
       |  valid_to IS NULL AS is_current
       |FROM iv ORDER BY user_id, grp""".stripMargin

  val stateAsOfSql: String =
    s"""$runsCte
       |SELECT user_id, state, valid_from AS since, n_events
       |FROM iv
       |WHERE valid_from <= TIMESTAMP '$GateAsOf'
       |  AND (valid_to IS NULL OR valid_to > TIMESTAMP '$GateAsOf')
       |ORDER BY user_id""".stripMargin
}
