package graft.observe

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Threshold alert rules evaluated over a metrics snapshot (reference:
  * `src/monitoring/alerts.py:45-322` — 18 rules in 5 groups). Rule
  * evaluation is a trivially small DataFrame job; the value is parity of
  * the rule set, not compute. */
object Alerts {

  final case class Rule(name: String, metricPrefix: String, op: String,
      threshold: Double, severity: String, group: String)

  /** The reference's rule set (alerts.py:45-322), thresholds preserved. */
  val ReferenceRules: Seq[Rule] = Seq(
    Rule("ReplicationLagHigh", "cdc_replication_lag_seconds", ">", 300, "warning", "replication"),
    Rule("ReplicationLagCritical", "cdc_replication_lag_seconds", ">", 900, "critical", "replication"),
    Rule("ErrorRateHigh", "cdc_errors_per_second", ">", 0.1, "warning", "replication"),
    Rule("ThroughputLow", "cdc_throughput_rows_per_sec", "<", 10, "warning", "replication"),
    Rule("AccuracyBelowTarget", "cdc_reconciliation_accuracy_percent", "<", 95, "warning", "reconciliation"),
    Rule("AccuracyCritical", "cdc_reconciliation_accuracy_percent", "<", 90, "critical", "reconciliation"),
    Rule("MissingRecordsHigh", "cdc_missing_records", ">", 1000, "critical", "reconciliation"),
    Rule("MismatchRateHigh", "cdc_mismatches_per_hour", ">", 100, "warning", "reconciliation"),
    Rule("SchemaCompatFailures", "cdc_schema_compat_failures_total", ">", 0, "warning", "schema"),
    Rule("BreakingSchemaChange", "cdc_schema_breaking_changes_total", ">", 0, "critical", "schema"),
    Rule("DlqDepthHigh", "cdc_dlq_depth", ">", 100, "warning", "dlq"),
    Rule("DlqDepthCritical", "cdc_dlq_depth", ">", 1000, "critical", "dlq"),
    Rule("DlqGrowthHigh", "cdc_dlq_growth_per_second", ">", 10, "critical", "dlq"),
    Rule("ConnectorDown", "cdc_connector_health", "<", 1, "critical", "connector"),
    Rule("NoTraffic", "cdc_throughput_rows_per_sec", "<=", 0, "warning", "connector"),
    // rate()-window rules (alerts.py ReconciliationFailure /
    // FrequentSchemaChanges / ConnectorRestartLoop): the Prometheus
    // rate[window] becomes a pre-computed per-window metric here
    Rule("ReconciliationFailure", "cdc_reconciliation_failures_per_hour", ">", 0, "warning", "reconciliation"),
    Rule("FrequentSchemaChanges", "cdc_schema_changes_per_hour", ">", 5, "info", "schema"),
    Rule("ConnectorRestartLoop", "cdc_connector_restarts_per_10min", ">", 1, "warning", "connector"))

  /** Evaluate rules over a `MetricsRegistry.snapshot` DataFrame →
    * (alert, severity, group, metric, value, threshold) for firing rules. */
  def evaluate(snapshot: DataFrame, rules: Seq[Rule] = ReferenceRules): DataFrame = {
    val spark = snapshot.sparkSession
    import spark.implicits._
    val ruleDf = rules.toDF("alert", "metric_prefix", "op", "threshold", "severity", "group")
    snapshot.join(ruleDf,
        snapshot("metric").startsWith(ruleDf("metric_prefix")), "inner")
      .filter(
        (col("op") === ">" && col("value") > col("threshold")) ||
        (col("op") === "<" && col("value") < col("threshold")) ||
        (col("op") === "<=" && col("value") <= col("threshold")) ||
        (col("op") === ">=" && col("value") >= col("threshold")))
      .select("alert", "severity", "group", "metric", "value", "threshold")
  }
}
