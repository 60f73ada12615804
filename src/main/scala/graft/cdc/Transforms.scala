package graft.cdc

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The sink connector's SMT transform chain re-expressed as narrow
  * DataFrame transforms (reference: `docker/kafka-connect/connectors/
  * postgres-sink.json:37-118`). All of these are projections/filters —
  * no shuffle, fully codegen'd, and Catalyst folds the whole chain into
  * one stage with the scan.
  */
object Transforms {

  /** T1 `ExtractNewRecordState` (postgres-sink.json:39-41): unwrap the
    * envelope to the flat after-image + a `__deleted` rewrite marker
    * (delete.handling.mode=rewrite). */
  def unwrap(df: DataFrame, afterCol: String = "after",
      opCol: String = "operation", keep: Seq[String] = Nil): DataFrame = {
    val flat = df.schema(afterCol).dataType match {
      case s: StructType =>
        s.fieldNames.toSeq.map(n => col(s"$afterCol.$n").as(n))
      case _: MapType =>
        Seq(col(afterCol).as("after")) // generic map image stays keyed
      case _ => Seq(col(afterCol))
    }
    df.select(keep.map(col) ++ flat :+
      (col(opCol) === ChangeEvent.Delete).cast(StringType).as("__deleted") :+
      col(opCol): _*)
  }

  /** T2 `Flatten$Value` (postgres-sink.json:43-44): recursively flatten
    * nested structs with a delimiter (`email.value` → `email_value`). */
  def flatten(df: DataFrame, delimiter: String = "_"): DataFrame = {
    def walk(dt: StructType, prefix: String, path: String): Seq[Column] =
      dt.fields.toSeq.flatMap { f =>
        val p = if (path.isEmpty) f.name else s"$path.${f.name}"
        val n = if (prefix.isEmpty) f.name else s"$prefix$delimiter${f.name}"
        f.dataType match {
          case s: StructType => walk(s, n, p)
          case _ => Seq(col(p).as(n))
        }
      }
    df.select(walk(df.schema, "", ""): _*)
  }

  /** T3 `ReplaceField$Value` ×17 (postgres-sink.json:46-92): bulk column
    * renames, as ONE select (17 chained withColumnRenamed would build 17
    * projection nodes for Catalyst to collapse; do it once). */
  def renameFields(df: DataFrame, renames: Map[String, String]): DataFrame =
    df.select(df.columns.toSeq.map(c => col(c).as(renames.getOrElse(c, c))): _*)

  /** The reference's exact rename map: `X_value` → `X` for the 17 columns
    * listed at postgres-sink.json:46-92. */
  val ReferenceRenames: Map[String, String] = Seq(
    "email", "username", "first_name", "last_name", "status", "created_at",
    "updated_at", "name", "description", "price", "stock_quantity",
    "is_active", "category", "total_amount", "shipping_address", "order_date")
    .map(c => s"${c}_value" -> c).toMap

  /** T4 `RegexRouter` (postgres-sink.json:94-96): topic → destination
    * table name via regex group extraction. */
  def routeTable(df: DataFrame, topicCol: String = "topic",
      pattern: String = "scylla-cluster\\.app_data\\.(.*)"): DataFrame =
    df.withColumn("__table", regexp_extract(col(topicCol), pattern, 1))

  /** T5 predicate `TopicNameMatches` (postgres-sink.json:112-114): drop
    * heartbeat topics. */
  def dropHeartbeats(df: DataFrame, topicCol: String = "topic",
      pattern: String = "heartbeat\\..*"): DataFrame =
    df.filter(!col(topicCol).rlike(pattern))

  /** T6 predicate `RecordIsTombstone` (postgres-sink.json:115): null-value
    * tombstones — route out (the delete path handles them). */
  def dropTombstones(df: DataFrame, valueCol: String): DataFrame =
    df.filter(col(valueCol).isNotNull)

  /** T7 correlation id (src/utils/correlation.py:22-31,154-210): keep an
    * existing id if present, else mint a UUIDv4. */
  def withCorrelationId(df: DataFrame, existingCol: Option[String] = None): DataFrame = {
    val id = existingCol match {
      case Some(c) if df.columns.contains(c) => coalesce(col(c), expr("uuid()"))
      case _ => expr("uuid()")
    }
    df.withColumn("correlation_id", id)
  }

  /** Type-fidelity cast (SURVEY §7.4.5): apply a target table's
    * StructType to a generically-typed (string-heavy) routed envelope —
    * UUIDs stay canonical lowercase strings, money becomes
    * DECIMAL(12,2), timestamps parse in the UTC session zone. Columns
    * absent from the schema pass through untouched (CDC metadata etc.);
    * schema columns absent from the frame are NOT invented. */
  def castTo(df: DataFrame, schema: StructType,
      /** lenient: malformed values become NULL (try_cast) for DLQ
        * routing, instead of ANSI mode failing the whole micro-batch on
        * one poison value. */
      lenient: Boolean = false): DataFrame = {
    val target = schema.fields.map(f => f.name -> f.dataType).toMap
    df.select(df.columns.toSeq.map { c =>
      target.get(c) match {
        case Some(dt) if df.schema(c).dataType != dt =>
          (if (lenient) col(c).try_cast(dt) else col(c).cast(dt)).as(c)
        case _ => col(c)
      }
    }: _*)
  }

  /** T8 CDC metadata stamping (init.sql:31-35). */
  def withCdcMeta(df: DataFrame, opCol: String = "operation",
      source: String = "scylla", streamId: Column = lit(null).cast(StringType)): DataFrame =
    df.withColumn("cdc_operation", col(opCol))
      .withColumn("cdc_timestamp", current_timestamp())
      .withColumn("cdc_source", lit(source))
      .withColumn("cdc_stream_id", streamId)
}
