package graft.cdc

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** The CDC replication path as one Structured Streaming job (reference
  * pipeline: SURVEY §3.1; Kafka-Connect original at
  * `docker/kafka-connect/connectors/` JSON configs).
  *
  *   readStream (JSON-envelope source)
  *     → parse PERMISSIVE, corrupt records split to DLQ          (ST6)
  *     → SMT chain: heartbeat-drop, route, unwrap, rename, meta  (T1–T8)
  *     → watermark on commit time, late rows quarantined         (ST4)
  *     → foreachBatch: collapse latest-per-key + idempotent
  *       monotonic MERGE into the per-table warehouse            (W1, ST1/2/7/8)
  *
  * Exactly-once into a non-transactional sink (SURVEY §7.4.1): Structured
  * Streaming checkpoints offsets (ST3); the merge is idempotent (PK-keyed)
  * and monotonic (commit-ts guard), so at-least-once redelivery of a batch
  * converges to the same snapshot.
  *
  * The warehouse here is parquet-snapshot-per-table (local testbed). On a
  * cluster the identical collapse+merge plan targets Delta/Iceberg
  * `MERGE INTO`; only `writeTable` changes.
  */
final class CdcPipeline(
    spark: SparkSession,
    warehouseDir: String,
    checkpointDir: String,
    keysByTable: Map[String, Seq[String]],
    ordCol: String = "commit_timestamp",
    deleteCol: String = "__deleted",
    watermarkDelay: String = "24 hours",
    partialUpdate: Boolean = true,
    /** ST5: merge retry attempts with exponential backoff (reference
      * sink retry config postgres-sink.json:12-13,33-34). */
    maxMergeRetries: Int = 3,
    retryBaseBackoffMs: Long = 100,
    /** > 0 switches the warehouse to bucket-partitioned COPY-ON-WRITE
      * tables ([[graft.util.BucketedTable]]): each merge rewrites only
      * the buckets its keys hash into instead of the whole table — the
      * at-scale layout. 0 keeps the single-snapshot path (simplest for
      * small tables). */
    warehouseBuckets: Int = 0) {

  /** Parse a raw JSON-line envelope stream with a DLQ split: rows that
    * fail schema parse land in `dlq` with error context
    * (data-model.md:173-208); good rows continue. PERMISSIVE mode keeps
    * the corrupt payload in `_corrupt_record`. */
  def parseWithDlq(raw: DataFrame, schema: StructType): (DataFrame, DataFrame) = {
    val withCorrupt = schema.add("_corrupt_record", "string")
    val parsed = raw.select(
      from_json(col("value"), withCorrupt, Map("mode" -> "PERMISSIVE",
        "columnNameOfCorruptRecord" -> "_corrupt_record")).as("r"))
      .select("r.*")
    val good = parsed.filter(col("_corrupt_record").isNull).drop("_corrupt_record")
    val dlq = parsed.filter(col("_corrupt_record").isNotNull)
      .select(
        col("_corrupt_record").as("original_payload"),
        lit("ParseError").as("error_class"),
        lit("malformed change-event JSON").as("error_message"),
        current_timestamp().as("failed_at"),
        lit(0).as("retry_count"),
        lit(null).cast("string").as("source_topic"),
        lit(null).cast("string").as("correlation_id"))
    (good, dlq)
  }

  def tablePath(table: String): String = s"$warehouseDir/$table"

  /** Reads recover from a crash mid-swap (see AtomicSnapshot): the
    * snapshot is never lost, at most the in-flight batch is — and the
    * checkpoint replays that batch into an idempotent merge. */
  def readTable(table: String): Option[DataFrame] =
    if (warehouseBuckets > 0)
      graft.util.BucketedTable.read(spark, tablePath(table))
    else graft.util.AtomicSnapshot.read(spark, tablePath(table))

  private def writeTable(table: String, df: DataFrame): Unit =
    graft.util.AtomicSnapshot.write(df, tablePath(table))

  /** ST11 backpressure analog of `max.queue.size`: bound files per
    * micro-batch. Convenience reader for JSON-line envelope streams. */
  def readJsonStream(inputDir: String, maxFilesPerTrigger: Int = 0): DataFrame = {
    import org.apache.spark.sql.types.{StringType, StructField, StructType}
    val base = spark.readStream
      .schema(StructType(Seq(StructField("value", StringType))))
    val bounded = if (maxFilesPerTrigger > 0)
      base.option("maxFilesPerTrigger", maxFilesPerTrigger) else base
    bounded.text(inputDir).toDF("value")
  }

  /** S1 Kafka ingest wiring. The sandbox has no Kafka broker or
    * spark-sql-kafka jar, so this is the documented, compile-checked
    * option mapping from the reference's connector config
    * (scylla-source.json:20-31, postgres-sink topics/offsets) onto
    * Structured Streaming's kafka source; `readKafkaStream` yields the
    * SAME single-`value`-column envelope frame as [[readJsonStream]],
    * so the whole downstream pipeline is source-agnostic.
    *
    *  - subscribePattern  ← topic.prefix + table regex routing (T4)
    *  - startingOffsets   ← snapshot.mode initial → "earliest"
    *  - maxOffsetsPerTrigger ← max.batch.size/max.queue.size
    *    backpressure (ST11, same knob readJsonStream exposes as
    *    maxFilesPerTrigger)
    *  - failOnDataLoss=false ← errors.tolerance=all */
  def kafkaSourceOptions(bootstrapServers: String, topicPattern: String,
      startingOffsets: String = "earliest",
      maxOffsetsPerTrigger: Long = 0L): Map[String, String] = {
    val base = Map(
      "kafka.bootstrap.servers" -> bootstrapServers,
      "subscribePattern" -> topicPattern,
      "startingOffsets" -> startingOffsets,
      "failOnDataLoss" -> "false")
    if (maxOffsetsPerTrigger > 0)
      base + ("maxOffsetsPerTrigger" -> maxOffsetsPerTrigger.toString)
    else base
  }

  /** Kafka-backed envelope stream (value bytes → one string column,
    * interface-identical to [[readJsonStream]]). Requires the
    * spark-sql-kafka package at runtime. */
  def readKafkaStream(bootstrapServers: String, topicPattern: String,
      startingOffsets: String = "earliest",
      maxOffsetsPerTrigger: Long = 0L): DataFrame =
    spark.readStream.format("kafka")
      .options(kafkaSourceOptions(bootstrapServers, topicPattern,
        startingOffsets, maxOffsetsPerTrigger))
      .load()
      .selectExpr("CAST(value AS STRING) AS value")

  /** ST5: retry with exponential backoff around the merge body — the
    * stream restarts from checkpoint on final failure, so the merge's
    * idempotence makes retries safe. */
  private[cdc] def withRetry[T](what: String)(body: => T): T = {
    var attempt = 0
    var lastErr: Throwable = null
    while (attempt <= maxMergeRetries) {
      try return body
      catch {
        case e: Throwable =>
          lastErr = e
          attempt += 1
          if (attempt <= maxMergeRetries)
            Thread.sleep(retryBaseBackoffMs * (1L << (attempt - 1)))
      }
    }
    throw new RuntimeException(s"$what failed after $maxMergeRetries retries", lastErr)
  }

  /** Lateness bound in microseconds, parsed with Spark's own interval
    * parser so every string `withWatermark` accepts works here too
    * ("24 hours", "1 week", "500 milliseconds", ...). Month-based
    * intervals are rejected (no fixed length). */
  private val latenessMicros: Long = {
    val iv = org.apache.spark.sql.catalyst.util.IntervalUtils.stringToInterval(
      org.apache.spark.unsafe.types.UTF8String.fromString(watermarkDelay))
    require(iv.months == 0,
      s"watermarkDelay '$watermarkDelay': month-based delays are ambiguous")
    iv.days * 86400000000L + iv.microseconds
  }

  /** Persistent cross-batch high-water mark (max commit ts seen BEFORE
    * the current batch): real watermark semantics — a backfill's first
    * giant batch quarantines nothing, later batches quarantine rows
    * older than (seen-so-far − delay). Stored as one tiny text file. */
  private def hwmPath = Paths.get(s"$checkpointDir/_hwm")

  private def readHwm(): Option[Long] =
    if (Files.exists(hwmPath)) Some(Files.readString(hwmPath).trim.toLong) else None

  private def writeHwm(v: Long): Unit = {
    val tmp = Paths.get(s"$checkpointDir/_hwm.tmp")
    Files.writeString(tmp, v.toString)
    Files.move(tmp, hwmPath, java.nio.file.StandardCopyOption.REPLACE_EXISTING,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
  }

  /** The per-micro-batch merge body (ST1/ST2/ST7/ST8). Public so batch
    * backfills (S2 snapshot mode) reuse the same path.
    *
    * ST4 late-row quarantine: rows whose commit timestamp lags the
    * batch's high-water mark by more than `watermarkDelay` append to
    * `warehouseDir/_late` INSTEAD of merging — the reference's 24 h
    * CDC-TTL staleness bound, with quarantine rather than silent
    * application (spec.md:134 FR-015). */
  def mergeMicroBatch(batch: DataFrame, batchId: Long): Unit = withRetry(s"merge batch $batchId") {
    // (no early `return` here: NonLocalReturnControl would be caught by
    // the retry wrapper and misread as a failure)
    val bounds =
      if (batch.isEmpty) null
      else batch.agg(max(col(ordCol))).head()
    val batchMax = if (bounds == null || bounds.isNullAt(0)) None
      else Some(bounds.getLong(0))
    // lateness is judged against the PRE-batch high-water mark; rows with
    // a NULL commit ts are unprocessable by an ordering-based merge and
    // quarantine too (they'd otherwise vanish in the comparisons)
    val prevHwm = readHwm()
    val lateCond = prevHwm match {
      case Some(hwm) =>
        col(ordCol).isNull || col(ordCol) < lit(hwm - latenessMicros)
      case None => col(ordCol).isNull
    }
    val current = batch.filter(!coalesce(lateCond, lit(true)))
    val late = batch.filter(coalesce(lateCond, lit(true)))
    if (!late.isEmpty)
      // one directory per batch id, overwritten on retry/replay — the
      // quarantine write stays idempotent under at-least-once delivery
      late.write.mode("overwrite").parquet(s"$warehouseDir/_late/batch_$batchId")
    val tables =
      if (current.isEmpty) Array.empty[String]
      else current.select("__table").distinct().collect().map(_.getString(0))
    tables.foreach { table =>
      keysByTable.get(table).foreach { keys =>
        val updates = current.filter(col("__table") === table).drop("__table")
        val partialCols =
          if (partialUpdate) updates.columns.filterNot(c => keys.contains(c) ||
            c == ordCol || c == deleteCol).toSeq
          else Seq.empty
        if (warehouseBuckets > 0)
          // COW path: rewrites only the buckets this batch's keys touch
          graft.util.BucketedTable.merge(spark, tablePath(table), updates,
            keys, ordCol, deleteCol, partialCols, warehouseBuckets)
        else {
          val merged = readTable(table) match {
            case Some(target) =>
              Upsert.mergeBatch(target, updates, keys, ordCol, deleteCol, partialCols)
            case None =>
              Upsert.collapseBatch(updates, keys, col(ordCol), deleteCol, partialCols)
                .drop(deleteCol)
          }
          writeTable(table, merged)
        }
      }
    }
    // advance the high-water mark only after the batch fully merged
    val newHwm: Option[Long] =
      (prevHwm.toList ::: batchMax.toList).reduceOption(_ max _)
    newHwm.foreach(v => writeHwm(v))
  }

  /** V1–V6 as a pre-merge gate (SURVEY §7.4.4): a Spark stream fixes its
    * schema at start, so an envelope-schema change must pass the compat
    * check and register BEFORE the stream starts — incompatible changes
    * block with the issue list (the reference's registry
    * block-and-alert flow, data-model.md:547-565) instead of silently
    * corrupting the sink. */
  def gateSchema(store: graft.schemaevo.SchemaStore, subject: String,
      avroSchemaJson: String): Unit =
    store.register(subject, avroSchemaJson) match {
      case Left(issues) => throw new IllegalStateException(
        s"schema change for '$subject' blocked: ${issues.mkString("; ")}")
      case Right(_) => ()
    }

  /** Wire the full streaming pipeline onto a raw JSON-line stream.
    * Returns the started query; DLQ rows append to `warehouseDir/_dlq`.
    * When `schemaGate` is given, the envelope's Avro schema must pass
    * the registry compat check first. */
  def start(raw: DataFrame, envelopeSchema: StructType,
      trigger: Trigger = Trigger.AvailableNow(),
      schemaGate: Option[(graft.schemaevo.SchemaStore, String, String)] = None)
      : StreamingQuery = {
    schemaGate.foreach { case (store, subject, avroJson) =>
      gateSchema(store, subject, avroJson)
    }
    val (good, dlq) = parseWithDlq(raw, envelopeSchema)
    // fire-and-forget DLQ append (separate sink path, ST6)
    dlq.writeStream
      .format("parquet")
      .option("path", s"$warehouseDir/_dlq")
      .option("checkpointLocation", s"$checkpointDir/_dlq")
      .outputMode("append")
      .trigger(trigger)
      .start()

    val transformed = Transforms.routeTable(
      Transforms.dropHeartbeats(good, "topic"), "topic")
      .withColumn(deleteCol, (col("operation") === ChangeEvent.Delete).cast("string"))
      .withColumn("commit_ts", timestamp_micros(col(ordCol)))
      .withWatermark("commit_ts", watermarkDelay)
      .drop("topic", "operation", "commit_ts")

    transformed.writeStream
      .option("checkpointLocation", s"$checkpointDir/merge")
      .trigger(trigger)
      .foreachBatch { (b: DataFrame, id: Long) => mergeMicroBatch(b, id) }
      .start()
  }
}
