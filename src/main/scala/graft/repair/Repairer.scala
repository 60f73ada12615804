package graft.repair

import java.time.{Instant, LocalDateTime, ZoneOffset}
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Repair-action generation: discrepancy rows → idempotent repair SQL
  * (reference: `src/reconciliation/repairer.py`).
  *
  * Pure string builders — no Spark dependency in the formatting path, so
  * they run executor-side inside `foreachPartition` for large repair sets
  * (the reference collects everything into driver memory; we only collect
  * when the caller asks for a driver-side plan).
  *
  * Safety: identifiers are always quoted with `"` doubling, string
  * literals `'` doubled (repairer.py:32-68,514-516; FR-021 injection
  * prevention, spec.md:146).
  */
object Repairer {

  final case class RepairAction(
      actionType: String, // DELETE | INSERT | UPDATE
      tableName: String,
      sql: String,
      key: String,
      dryRun: Boolean)

  /** Execution order: deletes first, then inserts, then updates
    * (repairer.py:70-145 orchestration). */
  val ActionOrder: Map[String, Int] = Map("DELETE" -> 0, "INSERT" -> 1, "UPDATE" -> 2)

  // ---- identifier / literal formatting (repairer.py:32-68,485-559) -----

  /** Fixed-width timestamp literal form accepted by every target
    * dialect (see the formatValue timestamp cases). */
  private val TsFormat =
    java.time.format.DateTimeFormatter.ofPattern("uuuu-MM-dd HH:mm:ss.SSSSSS")

  /** Always-quote, `"` doubled (repairer.py:32-49). */
  def quoteIdentifier(name: String): String =
    "\"" + name.replace("\"", "\"\"") + "\""

  def quoteQualified(schema: String, table: String): String =
    s"${quoteIdentifier(schema)}.${quoteIdentifier(table)}"

  /** SQL literal for a Scala/Spark value (repairer.py:485-559):
    * NULL, escaped strings, TRUE/FALSE, numerics passthrough, ISO
    * timestamps, `\x` bytea hex, JSON for collections. */
  def formatValue(v: Any): String = v match {
    case null => "NULL"
    case None => "NULL"
    case Some(x) => formatValue(x)
    case s: String => "'" + s.replace("'", "''") + "'"
    case b: Boolean => if (b) "TRUE" else "FALSE"
    case d: java.math.BigDecimal => d.toPlainString
    case d: BigDecimal => d.underlying.toPlainString
    // non-finite floats: bare NaN/Infinity is not valid SQL — Postgres
    // and DuckDB both require the quoted spelling ('NaN'::float8 etc.),
    // which implicit-casts on insert (proven by FormatValueLiveSpec)
    case d: java.lang.Double if d.isNaN || d.isInfinite =>
      "'" + (if (d.isNaN) "NaN" else if (d > 0) "Infinity" else "-Infinity") + "'"
    case f: java.lang.Float if f.isNaN || f.isInfinite =>
      "'" + (if (f.isNaN) "NaN" else if (f > 0) "Infinity" else "-Infinity") + "'"
    case n: java.lang.Number => n.toString
    // ALWAYS full seconds + 6-digit micros: LocalDateTime.toString drops
    // trailing zero components, and its midnight form 'yyyy-MM-dd HH:mm'
    // is a timestamp SYNTAX ERROR in DuckDB (caught live by
    // FormatValueLiveSpec); the fixed-width form parses everywhere
    case t: java.sql.Timestamp =>
      "'" + t.toInstant.atOffset(ZoneOffset.UTC).toLocalDateTime.format(TsFormat) + "'"
    case i: Instant =>
      "'" + i.atOffset(ZoneOffset.UTC).toLocalDateTime.format(TsFormat) + "'"
    case d: java.sql.Date => s"'$d'"
    case d: java.time.LocalDate => s"'$d'"
    case d: java.time.Duration => // INTERVAL from seconds (repairer.py:537-540)
      s"INTERVAL '${d.getSeconds} seconds'"
    case bytes: Array[Byte] => // \x hex bytea (repairer.py:543-546)
      "'\\x" + bytes.map("%02x".format(_)).mkString + "'"
    // scala.collection.* (not the immutable aliases): Spark Row.get
    // returns mutable.ArraySeq / mutable Map for array/map columns
    case m: scala.collection.Map[_, _] => // JSON for collections (repairer.py:549-551)
      "'" + toJson(m).replace("'", "''") + "'"
    case seq: scala.collection.Seq[_] =>
      "'" + toJson(seq).replace("'", "''") + "'"
    case u: java.util.UUID => s"'${u.toString.toLowerCase}'"
    case other =>
      throw new IllegalArgumentException(
        s"Cannot format value of type ${other.getClass.getName}")
  }

  private def toJson(v: Any): String = v match {
    case m: scala.collection.Map[_, _] =>
      m.map { case (k, x) => s""""${jsonEscape(k.toString)}": ${toJson(x)}""" }
        .mkString("{", ", ", "}")
    case s: scala.collection.Seq[_] => s.map(toJson).mkString("[", ", ", "]")
    case null => "null"
    case s: String => "\"" + jsonEscape(s) + "\""
    case b: Boolean => b.toString
    case n: java.lang.Number => n.toString
    case other => "\"" + jsonEscape(other.toString) + "\""
  }

  private def jsonEscape(s: String): String =
    s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }

  // ---- statement builders (repairer.py:242-461) ------------------------

  def generateInsertSql(schema: String, table: String,
      columns: Seq[String], values: Seq[Any]): String = {
    require(columns.nonEmpty && columns.length == values.length)
    val cols = columns.map(quoteIdentifier).mkString(", ")
    val vals = values.map(formatValue).mkString(", ")
    s"INSERT INTO ${quoteQualified(schema, table)} ($cols) VALUES ($vals)"
  }

  /** Multi-row batch variant (repairer.py:379-430). */
  def generateInsertBatchSql(schema: String, table: String,
      columns: Seq[String], rows: Seq[Seq[Any]]): String = {
    require(rows.nonEmpty)
    val cols = columns.map(quoteIdentifier).mkString(", ")
    val vals = rows.map(_.map(formatValue).mkString("(", ", ", ")")).mkString(", ")
    s"INSERT INTO ${quoteQualified(schema, table)} ($cols) VALUES $vals"
  }

  def whereClause(key: Map[String, Any]): String =
    key.toSeq.sortBy(_._1)
      .map { case (k, v) =>
        if (v == null || v == None) s"${quoteIdentifier(k)} IS NULL"
        else s"${quoteIdentifier(k)} = ${formatValue(v)}"
      }
      .mkString(" AND ")

  def generateDeleteSql(schema: String, table: String, key: Map[String, Any]): String = {
    require(key.nonEmpty, "DELETE requires a key")
    s"DELETE FROM ${quoteQualified(schema, table)} WHERE ${whereClause(key)}"
  }

  /** SET only the differing fields; fall back to all non-key fields when
    * no diff list is given (repairer.py:319-377). */
  def generateUpdateSql(schema: String, table: String, key: Map[String, Any],
      setValues: Map[String, Any]): String = {
    require(key.nonEmpty && setValues.nonEmpty)
    val sets = setValues.toSeq.sortBy(_._1)
      .map { case (k, v) => s"${quoteIdentifier(k)} = ${formatValue(v)}" }
      .mkString(", ")
    s"UPDATE ${quoteQualified(schema, table)} SET $sets WHERE ${whereClause(key)}"
  }

  // ---- orchestration over a discrepancy DataFrame (repairer.py:70-145) --

  /** Build repair actions from a `Differ.findAllDiscrepancies` result.
    * Output DataFrame: (priority, action_type, target_key, repair_sql) —
    * stays distributed; callers `orderBy(priority)` then either collect
    * (small) or `foreachPartition` a JDBC executor (large).
    *
    * `keys` are the key columns; source-side values are in `src_<c>`
    * columns, target-side in `tgt_<c>` (Differ's layout). */
  def generateRepairActions(discrepancies: DataFrame, schema: String,
      table: String, keys: Seq[String], dataCols: Seq[String],
      dryRun: Boolean = true): DataFrame = {
    val spark = discrepancies.sparkSession
    import spark.implicits._
    val keyIdx = keys.zipWithIndex
    val rows = discrepancies.select(
      (col("discrepancy_type") +: keys.map(col)) ++
        dataCols.map(c => col(s"src_$c")) ++ dataCols.map(c => col(s"tgt_$c")): _*)
    val nKeys = keys.length
    val nData = dataCols.length
    rows.map { r =>
      val dtype = r.getString(0)
      val key = keyIdx.map { case (k, i) => k -> r.get(1 + i) }.toMap
      val srcVals = dataCols.zipWithIndex.map { case (c, i) => c -> r.get(1 + nKeys + i) }
      val tgtVals = dataCols.zipWithIndex.map { case (c, i) => c -> r.get(1 + nKeys + nData + i) }
      dtype match {
        case "missing_in_target" =>
          (ActionOrder("INSERT"), "INSERT", whereClause(key),
            generateInsertSql(schema, table,
              keys ++ dataCols, keys.map(key) ++ srcVals.map(_._2)))
        case "extra_in_target" =>
          (ActionOrder("DELETE"), "DELETE", whereClause(key),
            generateDeleteSql(schema, table, key))
        case "mismatch" =>
          val differing = srcVals.zip(tgtVals).collect {
            case ((c, s), (_, t)) if s != t => c -> s
          }.toMap
          val sets = if (differing.nonEmpty) differing else srcVals.toMap
          (ActionOrder("UPDATE"), "UPDATE", whereClause(key),
            generateUpdateSql(schema, table, key, sets))
        case other =>
          (99, "NOOP", whereClause(key), s"-- no action for $other")
      }
    }.toDF("priority", "action_type", "target_key", "repair_sql")
      .filter($"action_type" =!= "NOOP")
      .withColumn("dry_run", lit(dryRun))
  }

  /** Execute repair actions (reference execute_repairs,
    * `scripts/reconcile.py:490-522`): runs each statement through the
    * caller-supplied executor (a JDBC statement runner in production),
    * executor-side via foreachPartition. DELETE→INSERT→UPDATE ordering
    * is enforced as sequential PHASES — one Spark job per priority level
    * — because partitions of a single job run concurrently (a
    * same-job sort orders rows within a partition, not across the
    * cluster). Within a phase, statements are independent (distinct
    * keys) and parallelize freely. Returns (executed, failed) counts. */
  def executeRepairs(actions: DataFrame,
      executor: String => Unit): (Long, Long) = {
    val sc = actions.sparkSession.sparkContext
    val executed = sc.longAccumulator("repairs_executed")
    val failed = sc.longAccumulator("repairs_failed")
    val priorities = actions.select("priority").distinct()
      .collect().map(_.getInt(0)).sorted
    priorities.foreach { p =>
      actions.filter(col("priority") === p)
        .sortWithinPartitions(col("target_key"))
        .select(col("repair_sql"))
        .foreachPartition { (rows: Iterator[Row]) =>
          rows.foreach { r =>
            try { executor(r.getString(0)); executed.add(1) }
            catch { case _: Exception => failed.add(1) }
          }
        }
    }
    (executed.value, failed.value)
  }

  /** JDBC flavor of [[executeRepairs]]: ONE connection per partition
    * (50k statements must not mean 50k TCP+auth handshakes); a partition
    * whose connection cannot open counts all its statements as failed
    * instead of failing the job. */
  def executeRepairsJdbc(actions: DataFrame, jdbcUrl: String): (Long, Long) = {
    val sc = actions.sparkSession.sparkContext
    val executed = sc.longAccumulator("repairs_executed")
    val failed = sc.longAccumulator("repairs_failed")
    val priorities = actions.select("priority").distinct()
      .collect().map(_.getInt(0)).sorted
    priorities.foreach { p =>
      actions.filter(col("priority") === p)
        .sortWithinPartitions(col("target_key"))
        .select(col("repair_sql"))
        .foreachPartition { (rows: Iterator[Row]) =>
          val conn =
            try java.sql.DriverManager.getConnection(jdbcUrl)
            catch { case _: Exception => null }
          if (conn == null) rows.foreach(_ => failed.add(1))
          else try {
            val st = conn.createStatement()
            try rows.foreach { r =>
              try { st.execute(r.getString(0)); executed.add(1) }
              catch { case _: Exception => failed.add(1) }
            } finally st.close()
          } finally conn.close()
        }
    }
    (executed.value, failed.value)
  }
}
