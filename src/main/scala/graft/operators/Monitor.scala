package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Corpus drift + anomaly monitoring — the watch layer a continuously
  * curating pipeline runs on every snapshot: "did any source's shape move?"
  * and "did today's volume spike?". Closes the loop from the round-13/14
  * profiler tiers (one-pass stats, equi-width histograms) into actionable
  * monitoring, the same way the layout advisor closed profiler → layout.
  *
  * Reference scope: XBoard's dashboards recompute full aggregates per view
  * (server/index.js routes re-run their GROUP BYs on request); it has no
  * distribution-shift or outlier surface at all. Both operators here are
  * charter extensions for the LLM-data-pipeline tier.
  *
  * Scale notes (the part that must survive 100 TB):
  *  - [[sourceDrift]] reduces the corpus in ONE binned aggregate to a
  *    ≤ sources×nBuckets count matrix (the histogram exchange, measured
  *    FLAT for [[Profile.histogram]]); every subsequent window/aggregate
  *    runs on that bounded frame, never on corpus rows — the
  *    bounded-frame contract the calibration GRID established.
  *  - [[dailyAnomalies]] reduces events to O(days) calendar-bounded rows
  *    in one exchange; the trailing window then runs SinglePartition over
  *    that bounded frame (same contract; a 100 TB year is still 365 rows).
  */
object Monitor {

  /** Population-stability-index drift per source: how far each source's
    * distribution of `valueCol` sits from the REST of the corpus, on the
    * corpus-global `nBuckets` equi-width grid (grid and bucket arithmetic
    * identical to [[Profile.histogram]], so a drift alarm and the
    * histogram it points at always agree on binning).
    *
    * PSI = Σ_b (p_b − q_b)·ln(p_b/q_b) with add-half smoothing on counts
    * (p from the source, q from the corpus minus that source — exclusive
    * rest, so one dominant source can't dampen its own alarm). Smoothing
    * keeps every term finite (counts of 0 are the norm in drifted bins)
    * and is deterministic — no epsilon tuning. Conventional read: <0.1
    * stable, 0.1–0.25 moderate, >0.25 shifted.
    *
    * Output: (source, n_docs, psi) ordered by source; psi rounded to 4
    * (the ratio rule). One corpus scan: the stats row for the grid and the
    * binned counts both fold map-side; everything after is the bounded
    * count matrix.
    */
  def sourceDrift(docs: DataFrame, valueCol: String = "n_chars",
                  sourceCol: String = "source",
                  nBuckets: Int = 16): DataFrame = {
    require(nBuckets >= 1)
    val grid = Profile.histogramGrid(docs, Seq(valueCol)).head._2
    finishDrift(driftState(docs, grid, nBuckets, valueCol, sourceCol), nBuckets)
  }

  /** Binned (source, bucket, cnt) counts under a FIXED grid — the additive
    * half of [[sourceDrift]] and the per-batch fold of
    * [[graft.streaming.DriftStream]] (counts are additive, so the folded
    * state over a union of batches equals the one-shot counts exactly,
    * provided every batch bins into the SAME grid — the
    * [[graft.streaming.HistogramStream]] frozen-grid contract). */
  def driftState(docs: DataFrame, grid: Option[(Double, Double)],
                 nBuckets: Int, valueCol: String = "n_chars",
                 sourceCol: String = "source"): DataFrame = {
    val bucket = grid match {
      case None => lit(null).cast("long") // all-null column: no rows bin
      case Some((mn, mx)) if mn == mx => lit(0L)
      case Some((mn, mx)) =>
        greatest(lit(0L), least(lit(nBuckets - 1L),
          floor((col(valueCol).cast("double") - lit(mn)) *
            lit(nBuckets.toDouble) / lit(mx - mn))))
    }
    docs
      .filter(col(valueCol).isNotNull)
      .select(col(sourceCol).as("source"), bucket.as("bucket"))
      .filter(col("bucket").isNotNull)
      .groupBy("source", "bucket").agg(count(lit(1)).as("cnt"))
  }

  /** PSI per source from binned (source, bucket, cnt) counts — the
    * bounded-frame half: everything here runs on the ≤ sources×nBuckets
    * matrix, never corpus rows. */
  def finishDrift(counts: DataFrame, nBuckets: Int): DataFrame = {
    val half = 0.5
    val smooth = nBuckets * half
    // zero-fill WITHOUT a second corpus scan (a second pass is the tfidf
    // trap — Catalyst does not exchange-reuse an aggregated subtree): fold
    // each source's sparse bucket counts into a bounded ≤nBuckets map in
    // the same small-frame pass, then explode the FULL bucket range — a
    // drifted source is exactly one with empty bins, so absent buckets
    // must surface as cnt=0 terms
    val bySource = counts.groupBy("source").agg(
      map_from_entries(collect_list(struct(col("bucket"), col("cnt")))).as("m"),
      sum("cnt").as("n_s"))
    val full = bySource
      .select(col("source"), col("n_s"), col("m"),
        explode(sequence(lit(0L), lit(nBuckets - 1L))).as("bucket"))
      .withColumn("cnt", coalesce(element_at(col("m"), col("bucket")), lit(0L)))
      .drop("m")
    // windows over the bounded sources×nBuckets matrix, never corpus rows
    val p = (col("cnt") + half) / (col("n_s") + smooth)
    val q = (col("tot_b") - col("cnt") + half) / (col("n") - col("n_s") + smooth)
    full
      .withColumn("tot_b", sum("cnt").over(Window.partitionBy("bucket")))
      .withColumn("n", sum("cnt").over(Window.partitionBy()))
      .withColumn("term", (p - q) * log(p / q))
      .groupBy("source")
      .agg(max("n_s").as("n_docs"), round(sum("term"), 4).as("psi"))
      .orderBy("source")
  }

  /** Gate form: drift of the document-length distribution per source. */
  def sourceDriftDocuments(spark: SparkSession, dir: String): DataFrame =
    sourceDrift(Tables.documents(spark, dir))

  /** DuckDB replay of [[sourceDriftDocuments]] — same grid arithmetic as
    * [[Profile.histogramDocumentsSql]], same add-half smoothing, zero-fill
    * via DISTINCT sources × range(nBuckets). */
  def sourceDriftDocumentsSql(nBuckets: Int = 16): String = {
    val k = nBuckets
    s"""WITH s AS (SELECT CAST(MIN(n_chars) AS DOUBLE) AS mn,
       |                  CAST(MAX(n_chars) AS DOUBLE) AS mx FROM documents),
       |b AS (SELECT source,
       |  CASE WHEN mx = mn THEN 0
       |       ELSE GREATEST(0, LEAST(${k - 1}, CAST(FLOOR(
       |         (CAST(n_chars AS DOUBLE) - mn) * $k.0 / (mx - mn))
       |         AS BIGINT))) END AS bucket
       |  FROM documents CROSS JOIN s WHERE n_chars IS NOT NULL),
       |c AS (SELECT source, bucket, COUNT(*) AS cnt FROM b GROUP BY 1, 2),
       |g AS (SELECT src.source, r.bucket
       |      FROM (SELECT DISTINCT source FROM c) src
       |      CROSS JOIN (SELECT UNNEST(range(0, $k)) AS bucket) r),
       |f AS (SELECT g.source, g.bucket, COALESCE(c.cnt, 0) AS cnt
       |      FROM g LEFT JOIN c ON c.source = g.source AND c.bucket = g.bucket),
       |w AS (SELECT source, bucket, cnt,
       |        SUM(cnt) OVER (PARTITION BY bucket) AS tot_b,
       |        SUM(cnt) OVER (PARTITION BY source) AS n_s,
       |        SUM(cnt) OVER () AS n FROM f)
       |SELECT source, CAST(MAX(n_s) AS BIGINT) AS n_docs,
       |  ROUND(SUM(
       |    ((cnt + 0.5) / (n_s + ${k * 0.5}) -
       |     (tot_b - cnt + 0.5) / (n - n_s + ${k * 0.5})) *
       |    LN(((cnt + 0.5) / (n_s + ${k * 0.5})) /
       |       ((tot_b - cnt + 0.5) / (n - n_s + ${k * 0.5})))), 4) AS psi
       |FROM w GROUP BY source ORDER BY source""".stripMargin
  }

  /** Daily-volume anomaly detection: z-score of each day's event count
    * against the trailing `lookback`-day window (EXCLUSIVE of the day
    * itself — a spike must not inflate its own baseline). Days with fewer
    * than `minWindow` trailing observations, or a zero-variance baseline,
    * get a null z (warm-up, not an alarm). The flag tests the ROUNDED z
    * against the threshold so Spark and the oracle decide boundaries on
    * the identical rounded value.
    *
    * One corpus exchange (the day aggregate); the window is SinglePartition
    * over O(days) calendar-bounded rows — the bounded-frame contract.
    */
  def dailyAnomalies(events: DataFrame, lookback: Int = 7,
                     minWindow: Int = 3, threshold: Double = 2.0): DataFrame =
    finishAnomalies(dailyState(events), lookback, minWindow, threshold)

  /** Per-day event counts — the additive half of [[dailyAnomalies]] and
    * the per-batch fold of [[graft.streaming.AnomalyStream]] (day counts
    * sum across batches to the union's day counts exactly). */
  def dailyState(events: DataFrame): DataFrame =
    events
      .select(to_date(col("ts")).as("day"))
      .groupBy("day").agg(count(lit(1)).as("n_events"))

  /** Trailing-window z-scores over the O(days) daily frame — the
    * bounded-frame half of [[dailyAnomalies]]. */
  def finishAnomalies(daily: DataFrame, lookback: Int = 7,
                      minWindow: Int = 3, threshold: Double = 2.0): DataFrame = {
    val w = Window.orderBy("day").rowsBetween(-lookback, -1)
    daily
      .withColumn("m", avg("n_events").over(w))
      .withColumn("sd", stddev_samp("n_events").over(w))
      .withColumn("nw", count("n_events").over(w))
      .withColumn("z",
        when(col("nw") >= minWindow && col("sd") > 0,
          round((col("n_events") - col("m")) / col("sd"), 4)))
      .withColumn("is_anomaly",
        when(col("z").isNotNull && abs(col("z")) >= threshold, 1).otherwise(0))
      .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
        col("n_events"), col("z"), col("is_anomaly"))
      .orderBy("day")
  }

  /** Gate form over the events table. */
  def dailyAnomaliesEvents(spark: SparkSession, dir: String): DataFrame =
    dailyAnomalies(Tables.events(spark, dir))

  /** DuckDB replay of [[dailyAnomaliesEvents]]. */
  def dailyAnomaliesSql(lookback: Int = 7, minWindow: Int = 3,
                        threshold: Double = 2.0): String =
    s"""WITH d AS (SELECT STRFTIME(ts, '%Y-%m-%d') AS day, COUNT(*) AS n_events
       |           FROM events GROUP BY 1),
       |w AS (SELECT day, n_events,
       |        AVG(n_events) OVER win AS m,
       |        STDDEV_SAMP(n_events) OVER win AS sd,
       |        COUNT(n_events) OVER win AS nw
       |      FROM d
       |      WINDOW win AS (ORDER BY day
       |                     ROWS BETWEEN $lookback PRECEDING AND 1 PRECEDING))
       |SELECT day, n_events,
       |  CASE WHEN nw >= $minWindow AND sd > 0
       |       THEN ROUND((n_events - m) / sd, 4) END AS z,
       |  CASE WHEN nw >= $minWindow AND sd > 0
       |        AND ABS(ROUND((n_events - m) / sd, 4)) >= $threshold
       |       THEN 1 ELSE 0 END AS is_anomaly
       |FROM w ORDER BY day""".stripMargin
}
