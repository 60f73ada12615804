package graft.compare

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Tolerant row-equality kernel, re-expressed as generated Catalyst Column
  * expressions (reference: `src/reconciliation/comparer.py:30-292`).
  *
  * The reference walks Python dicts row-at-a-time; here the same per-type
  * rules are compiled once per schema into a single boolean expression tree
  * that stays inside WholeStageCodegen — no UDFs, fully distributed, and
  * Catalyst can push/fold it. At 100 TB this is the difference between a
  * codegen'd tight loop and a per-row interpreter.
  *
  * Per-value rules (comparer.py:231-292 `_values_equal`):
  *   - NULL == NULL (null-safe equality `<=>`)
  *   - float/double: abs(a-b) < tolerance (default 1e-4, comparer.py:27)
  *   - Decimal: compare numerically ignoring trailing zeros (cast to a
  *     common wide scale first, comparer.py:209-211)
  *   - UUID-vs-string: canonical lowercase string compare (comparer.py:205)
  *   - naive timestamps assumed UTC (session TZ pinned UTC project-wide)
  *   - arrays: ordered element compare; maps: keyed compare — Spark's
  *     native `<=>` already has those semantics.
  */
object Comparer {

  val DefaultFloatTolerance = 1e-4

  final case class CompareOptions(
      floatTolerance: Double = DefaultFloatTolerance,
      ignoreFields: Set[String] = Set.empty,
      /** compare string fields case-insensitively (reference's
        * case_insensitive key option, differ.py:724-726) */
      caseInsensitiveStrings: Boolean = false)

  /** Null-safe tolerant equality between two columns of the same type. */
  def valuesEqual(a: Column, b: Column, dt: DataType,
      opts: CompareOptions = CompareOptions()): Column = dt match {
    case DoubleType | FloatType =>
      // native codegen'd expression; semantics identical to
      // (a IS NULL AND b IS NULL) OR (both non-null AND |a-b| < tol)
      graft.functions.TolerantEquals.tolerantEquals(
        a.cast(DoubleType), b.cast(DoubleType), opts.floatTolerance)
    case d: DecimalType =>
      // trailing-zero-insensitive numeric compare via common wide scale.
      // Widen scale only as far as precision headroom allows: shrinking
      // integer-digit capacity would overflow large values to NULL, and
      // two DISTINCT overflowed values would then compare equal via
      // NULL <=> NULL.
      val extraScale = math.min(6, 38 - d.precision)
      val wide = DecimalType(d.precision + extraScale,
        math.min(d.scale + extraScale, d.precision + extraScale))
      a.cast(wide) <=> b.cast(wide)
    case StringType if opts.caseInsensitiveStrings => lower(a) <=> lower(b)
    case _ => a <=> b // null-safe; covers timestamps, arrays, maps, structs
  }

  /** Fields shared by both schemas, minus ignores — the reference compares
    * only common fields (comparer.py:49-56). */
  def commonFields(src: StructType, tgt: StructType,
      opts: CompareOptions = CompareOptions()): Seq[StructField] = {
    val tgtNames = tgt.fields.map(_.name).toSet
    src.fields.toSeq.filter(f =>
      tgtNames.contains(f.name) && !opts.ignoreFields.contains(f.name))
  }

  /** One boolean Column: tolerant equality over all common non-ignored
    * fields, with `srcCol`/`tgtCol` resolving a field name to its column on
    * each side (lets callers prefix/qualify joined columns). */
  def rowsEqual(src: StructType, tgt: StructType,
      srcCol: String => Column, tgtCol: String => Column,
      opts: CompareOptions = CompareOptions()): Column =
    commonFields(src, tgt, opts)
      .map(f => valuesEqual(srcCol(f.name), tgtCol(f.name), f.dataType, opts))
      .reduceOption(_ && _)
      .getOrElse(lit(true))

  /** Per-field diff as array<struct<field,src_value,tgt_value>> keeping only
    * differing fields (reference compare_rows_detailed / get_differing_fields,
    * comparer.py:96-165). Values stringified for a uniform diff payload. */
  def diffFields(src: StructType, tgt: StructType,
      srcCol: String => Column, tgtCol: String => Column,
      opts: CompareOptions = CompareOptions()): Column = {
    val diffs = commonFields(src, tgt, opts).map { f =>
      val eq = valuesEqual(srcCol(f.name), tgtCol(f.name), f.dataType, opts)
      when(!eq, struct(
        lit(f.name).as("field"),
        srcCol(f.name).cast(StringType).as("src_value"),
        tgtCol(f.name).cast(StringType).as("tgt_value")))
    }
    if (diffs.isEmpty) array()
    else filter(array(diffs: _*), _.isNotNull)
  }

  /** Canonicalization select: UUID strings lowercased, decimals rescaled,
    * (timestamps already UTC via session TZ). Reference normalize_row,
    * comparer.py:167-229. */
  def normalized(schema: StructType, col: String => Column): Seq[Column] =
    schema.fields.toSeq.map { f =>
      val c = f.dataType match {
        case StringType if f.name.toLowerCase.endsWith("id") ||
            f.name.toLowerCase.contains("uuid") => lower(trim(col(f.name)))
        case d: DecimalType => col(f.name).cast(d)
        case _ => col(f.name)
      }
      c.as(f.name)
    }
}
