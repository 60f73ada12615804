package graft.reconcile

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.compare.Comparer
import graft.compare.Comparer.CompareOptions

/** Source-vs-target reconciliation core (reference:
  * `src/reconciliation/differ.py`).
  *
  * The reference builds driver-memory hash indexes (differ.py:548-584) and
  * iterates rows in Python, with batched/streaming/iterator variants
  * (differ.py:215-473) purely to survive memory pressure. On Spark the whole
  * family collapses into ONE distributed join per operation:
  *
  *   - missing/extra  → `left_anti` joins (differ.py:32-86)
  *   - mismatches     → inner join + tolerant-equality filter (differ.py:88-174)
  *   - everything     → a single full-outer join with a discrepancy-type
  *                      column (differ.py:176-385)
  *
  * Scale design: each operation is exactly one shuffle on the key columns
  * (Catalyst picks sort-merge or broadcast; AQE splits skewed partitions).
  * Nothing is ever collected to the driver — the batched/streaming
  * reference variants exist only because Python wasn't distributed; here
  * partitioned execution + spill subsume them. `iter_discrepancies`
  * (differ.py:387-473) maps to `toLocalIterator()` on the result.
  */
object Differ {

  /** Discrepancy-type labels (differ.py:176-213). */
  val MissingInTarget = "missing_in_target"
  val ExtraInTarget   = "extra_in_target"
  val Mismatch        = "mismatch"
  val Match           = "match"

  /** Pre-flight: the reference raises on NULL keys (differ.py:565-571).
    * Returns rows whose key is (partly) NULL so callers can quarantine. */
  def nullKeyRows(df: DataFrame, keys: Seq[String]): DataFrame =
    df.filter(keys.map(col(_).isNull).reduce(_ || _))

  /** Rows in source whose key is absent from target (differ.py:32-59). */
  def findMissingInTarget(src: DataFrame, tgt: DataFrame, keys: Seq[String]): DataFrame =
    src.join(tgt, keys, "left_anti")

  /** Rows in target whose key is absent from source (differ.py:61-86). */
  def findExtraInTarget(src: DataFrame, tgt: DataFrame, keys: Seq[String]): DataFrame =
    tgt.join(src, keys, "left_anti")

  private def prefixed(df: DataFrame, prefix: String, keys: Seq[String]): DataFrame = {
    val nonKey = df.columns.filterNot(keys.contains)
    df.select(keys.map(col) ++ nonKey.map(c => col(c).as(s"$prefix$c")): _*)
  }

  private def commonNonKey(src: DataFrame, tgt: DataFrame, keys: Seq[String],
      opts: CompareOptions): Seq[org.apache.spark.sql.types.StructField] =
    Comparer.commonFields(src.schema, tgt.schema, opts)
      .filterNot(f => keys.contains(f.name))

  /** Tolerant-equality predicate over prefixed common non-key columns. */
  private def eqExpr(src: DataFrame, tgt: DataFrame, keys: Seq[String],
      opts: CompareOptions): Column =
    commonNonKey(src, tgt, keys, opts)
      .map(f => Comparer.valuesEqual(col(s"src_${f.name}"), col(s"tgt_${f.name}"), f.dataType, opts))
      .reduceOption(_ && _).getOrElse(lit(true))

  /** Keys present on both sides whose rows differ, with both images
    * (differ.py:88-127). Output: keys, src_*, tgt_* columns. */
  def findMismatches(src: DataFrame, tgt: DataFrame, keys: Seq[String],
      opts: CompareOptions = CompareOptions()): DataFrame = {
    val joined = prefixed(src, "src_", keys).join(prefixed(tgt, "tgt_", keys), keys, "inner")
    joined.filter(!eqExpr(src, tgt, keys, opts))
  }

  /** Mismatches + exploded per-field differences (differ.py:129-174;
    * per-field kernel comparer.py:96-165). One output row per differing
    * field: keys, field, src_value, tgt_value. */
  def findMismatchesDetailed(src: DataFrame, tgt: DataFrame, keys: Seq[String],
      opts: CompareOptions = CompareOptions()): DataFrame = {
    val diffs = Comparer.diffFields(src.schema, tgt.schema,
      n => col(s"src_$n"), n => col(s"tgt_$n"),
      opts.copy(ignoreFields = opts.ignoreFields ++ keys))
    findMismatches(src, tgt, keys, opts)
      .withColumn("diff", explode(diffs))
      .select(keys.map(col) :+ col("diff.field").as("field")
        :+ col("diff.src_value").as("src_value")
        :+ col("diff.tgt_value").as("tgt_value"): _*)
  }

  /** All discrepancies in one pass: a single full-outer join with a
    * discrepancy_type column (differ.py:176-213; the batched/streaming
    * variants differ.py:215-385 are subsumed by partitioned execution).
    * Output: keys, discrepancy_type, src_*, tgt_*. */
  def findAllDiscrepancies(src: DataFrame, tgt: DataFrame, keys: Seq[String],
      opts: CompareOptions = CompareOptions(), includeMatches: Boolean = false): DataFrame = {
    val s = prefixed(src, "src_", keys).withColumn("__src_present", lit(true))
    val t = prefixed(tgt, "tgt_", keys).withColumn("__tgt_present", lit(true))
    val joined = s.join(t, keys, "full_outer")
    val dtype = when(col("__tgt_present").isNull, MissingInTarget)
      .when(col("__src_present").isNull, ExtraInTarget)
      .when(!eqExpr(src, tgt, keys, opts), Mismatch)
      .otherwise(Match)
    val out = joined.withColumn("discrepancy_type", dtype)
      .drop("__src_present", "__tgt_present")
    if (includeMatches) out else out.filter(col("discrepancy_type") =!= Match)
  }

  /** Counts by discrepancy type (differ.py:475-514). */
  def discrepancySummary(src: DataFrame, tgt: DataFrame, keys: Seq[String],
      opts: CompareOptions = CompareOptions()): DataFrame =
    findAllDiscrepancies(src, tgt, keys, opts, includeMatches = true)
      .groupBy(col("discrepancy_type")).agg(count(lit(1)).as("n"))

  /** (source − missing − mismatch) / source × 100, 2dp (differ.py:615-641). */
  def matchPercentage(src: DataFrame, tgt: DataFrame, keys: Seq[String],
      opts: CompareOptions = CompareOptions()): DataFrame = {
    val d = findAllDiscrepancies(src, tgt, keys, opts, includeMatches = true)
    d.agg(
      round(
        sum(when(col("discrepancy_type") === Match, 1L).otherwise(0L)).cast("double") /
          sum(when(col("discrepancy_type") =!= ExtraInTarget, 1L).otherwise(0L)) * 100.0,
        2).as("match_pct"))
  }

  /** Keys occurring more than once (differ.py:516-546). */
  def findDuplicates(df: DataFrame, keys: Seq[String]): DataFrame =
    df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("n"))
      .filter(col("n") > 1)

  /** Incremental consumption of a discrepancy result (differ.py:387-473
    * `iter_discrepancies`): partition-at-a-time iterator on the driver —
    * bounded memory, streams results as partitions complete. */
  def iterDiscrepancies(src: DataFrame, tgt: DataFrame, keys: Seq[String],
      opts: CompareOptions = CompareOptions()): Iterator[org.apache.spark.sql.Row] = {
    import scala.jdk.CollectionConverters._
    findAllDiscrepancies(src, tgt, keys, opts).toLocalIterator().asScala
  }

  /** Point lookup (differ.py:586-613) — predicate pushes to the scan. */
  def getRowByKey(df: DataFrame, key: Map[String, Any]): DataFrame =
    key.foldLeft(df) { case (d, (k, v)) => d.filter(col(k) === lit(v)) }

  /** Data-level schema diff (differ.py:643-683): field names only in
    * source / only in target / common, as one small DataFrame. */
  def schemaDiff(src: DataFrame, tgt: DataFrame): DataFrame = {
    val spark = src.sparkSession
    import spark.implicits._
    val s = src.schema.fieldNames.toSet
    val t = tgt.schema.fieldNames.toSet
    ((s -- t).toSeq.sorted.map(("only_in_source", _)) ++
      (t -- s).toSeq.sorted.map(("only_in_target", _)) ++
      (s & t).toSeq.sorted.map(("common", _)))
      .toDF("category", "field")
  }
}
