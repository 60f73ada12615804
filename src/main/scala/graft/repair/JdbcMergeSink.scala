package graft.repair

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** JDBC upsert-sink statement generation (reference: the Confluent JDBC
  * sink's `insert.mode=upsert`, `pk.mode=record_key`,
  * `delete.enabled=true` semantics, `postgres-sink.json:22-34`).
  *
  * Emits PostgreSQL `INSERT ... ON CONFLICT (pk) DO UPDATE` statements
  * with the engine's three merge guarantees compiled in:
  *   - partial-update coalesce: `SET c = COALESCE(EXCLUDED.c, t.c)` (ST7)
  *   - monotonic guard: `WHERE t.<ord> <= EXCLUDED.<ord>` (ST2)
  *   - deletes as `DELETE ... WHERE pk = ...` for `__deleted` rows (ST8)
  * All identifiers/literals go through [[Repairer]]'s injection-safe
  * formatters. Statements are generated executor-side from a collapsed
  * micro-batch and executed via `Repairer.executeRepairs` with a JDBC
  * statement runner — the `foreachBatch` body for a real Postgres sink.
  */
object JdbcMergeSink {

  import Repairer.{quoteIdentifier => q, quoteQualified, formatValue}

  /** One upsert statement for a non-deleted row. */
  def upsertSql(schema: String, table: String, keys: Seq[String],
      ordCol: String, row: Map[String, Any],
      partialUpdateCols: Set[String] = Set.empty): String = {
    val cols = row.keys.toSeq.sorted
    val colList = cols.map(q).mkString(", ")
    val valList = cols.map(c => formatValue(row(c))).mkString(", ")
    val target = quoteQualified(schema, table)
    val sets = cols.filterNot(keys.contains).map { c =>
      if (partialUpdateCols.contains(c))
        s"${q(c)} = COALESCE(EXCLUDED.${q(c)}, $target.${q(c)})"
      else s"${q(c)} = EXCLUDED.${q(c)}"
    }.mkString(", ")
    val conflict = keys.map(q).mkString(", ")
    s"INSERT INTO $target ($colList) VALUES ($valList) " +
      s"ON CONFLICT ($conflict) DO UPDATE SET $sets " +
      s"WHERE $target.${q(ordCol)} <= EXCLUDED.${q(ordCol)}"
  }

  /** Statements for a collapsed micro-batch (latest-per-key, delete
    * markers kept): DELETEs for `__deleted='true'` rows, upserts
    * otherwise. Returns a DataFrame (action_type, sql) that stays
    * distributed until execution. */
  def batchStatements(collapsed: DataFrame, schema: String, table: String,
      keys: Seq[String], ordCol: String, deleteCol: String = "__deleted",
      partialUpdateCols: Set[String] = Set.empty): DataFrame = {
    val spark = collapsed.sparkSession
    import spark.implicits._
    val cols = collapsed.columns.filterNot(_ == deleteCol).toSeq
    val keyIdx = keys.map(k => cols.indexOf(k))
    collapsed.select((cols.map(col) :+ col(deleteCol)): _*).map { r =>
      val deleted = !r.isNullAt(cols.length) && r.getString(cols.length) == "true"
      if (deleted) {
        val key = keys.zip(keyIdx.map(r.get)).toMap
        ("DELETE", Repairer.generateDeleteSql(schema, table, key))
      } else {
        val row = cols.zipWithIndex.map { case (c, i) => c -> r.get(i) }.toMap
        ("UPSERT", upsertSql(schema, table, keys, ordCol, row, partialUpdateCols))
      }
    }.toDF("action_type", "sql")
  }
}
