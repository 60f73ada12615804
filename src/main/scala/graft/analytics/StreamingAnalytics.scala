package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming materialized-view equivalents (ST12): the daily summary MV
  * (`init.sql:195-206`) as a watermarked tumbling-window aggregation —
  * the same GROUP BY shape the batch variant uses, but incremental.
  *
  * State sizing at scale: one state row per (window, status) — bounded
  * by (days-in-watermark × statuses), not by input volume; the
  * watermark expires state past the lateness bound (ST4).
  */
object StreamingAnalytics {

  /** Tumbling-window order/event rollup over a streaming frame. */
  def windowedRollup(stream: DataFrame, tsCol: String, keyCol: String,
      valueCol: String, windowLength: String = "1 day",
      watermark: String = "1 day"): DataFrame =
    stream
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowLength).as("win"), col(keyCol))
      .agg(
        count(lit(1)).as("n"),
        sum(col(valueCol)).as("total"),
        min(col(valueCol)).as("min_value"),
        max(col(valueCol)).as("max_value"))
      .select(
        col("win.start").as("window_start"),
        col(keyCol), col("n"), col("total"), col("min_value"), col("max_value"))

  /** Gap-based sessionization (extended surface; event-stream staple):
    * events of one key belong to one session while consecutive gaps stay
    * UNDER `gap`; a gap ≥ `gap` opens a new session (Spark session
    * windows are [start, last_event + gap) — exclusive end). Works on
    * batch frames directly and on streams with a watermark upstream;
    * state per in-flight session only. */
  def sessionize(df: DataFrame, tsCol: String, keyCol: String,
      valueCol: String, gap: String = "30 minutes"): DataFrame =
    df.groupBy(session_window(col(tsCol), gap).as("sw"), col(keyCol))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col(valueCol).cast(org.apache.spark.sql.types.DecimalType(18, 2)))
          .cast("double").as("total_value"))
      .select(
        col(keyCol),
        date_format(col("sw.start"), "yyyy-MM-dd HH:mm:ss").as("session_start"),
        date_format(col("sw.end"), "yyyy-MM-dd HH:mm:ss").as("session_end"),
        col("n_events"), col("total_value"))

  /** Burst-collapse dedup ("debounce"): within each key, keep an event
    * only when the gap since the PREVIOUS event of that key is at least
    * `minGapMicros` — so a rapid-fire burst (double-clicks, CDC change
    * storms, retry echoes) collapses to its first event. Gap semantics
    * (vs last-KEPT): a maximal chain of sub-gap events is one burst,
    * the same boundary rule as [[sessionize]] — expressible as one
    * `lag` window, no running state. Deterministic: ordering ties on
    * the timestamp break by `idCol`. Returns the kept rows with
    * `gap_us` (null for each key's first event).
    *
    * Scale shape: one shuffle on the key columns, per-key in-partition
    * sort, narrow lag frame — linear at any history length; the same
    * plan runs per-micro-batch over streams (apply after a watermark
    * groupBy or on foreachBatch frames). */
  def debounce(df: DataFrame, keyCols: Seq[String], tsCol: String,
      idCol: String, minGapMicros: Long): DataFrame = {
    require(keyCols.nonEmpty, "keyCols must be non-empty")
    require(minGapMicros > 0, s"minGapMicros must be > 0, got $minGapMicros")
    val tus = graft.analytics.Analytics.tsMicros(df, tsCol)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCols.map(col): _*)
      .orderBy(tus, col(idCol))
    df.withColumn("__gap", tus - lag(tus, 1).over(w))
      .filter(col("__gap").isNull || col("__gap") >= minGapMicros)
      .withColumn("gap_us", col("__gap")).drop("__gap")
  }

  /** Streaming replication-lag observation (ST9): attach an observe()
    * aggregation that reports max commit timestamp per micro-batch; a
    * QueryListener turns it into the lag gauge. */
  def withLagObservation(stream: DataFrame, tsCol: String,
      name: String = "lag_metrics"): DataFrame =
    stream.observe(name,
      max(col(tsCol)).as("max_commit_ts"),
      count(lit(1)).as("batch_rows"))
}
