package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — for every left row, the single most recent right row
  * at-or-before it (per key): the point-in-time lookup relational
  * engines bolt on as a special operator (DuckDB `ASOF JOIN`, kdb
  * `aj`) and Spark does not ship.
  *
  * NOT implemented as a range join: `l JOIN r ON l.key = r.key AND
  * r.ts <= l.ts` + argmax explodes to every (left, earlier-right)
  * pair before pruning — quadratic per key in history length, the
  * classic at-scale trap. Instead the UNION + carry-forward
  * formulation: tag both sides, union them, and run ONE window per
  * key ordered by (ts, side, right-id), carrying the last-seen right
  * id forward; left rows then read their match off the carried
  * column. Cost: one shuffle on the key and one in-partition sort of
  * |L|+|R| NARROW rows (key, ts, two ids — the payload never enters
  * the window; join it back afterwards if needed), linear in the
  * data at any history length.
  *
  * Determinism contract (both engines must agree): the match is the
  * right row with the greatest `(ts, idCol)` such that `ts <=`
  * (inclusive, the default) or `<` (strict) the left row's ts — ties
  * on ts resolve to the larger right id. Unmatched left rows keep a
  * null match (left-outer semantics, like DuckDB's `ASOF LEFT JOIN`).
  * `toleranceMicros` nulls out matches older than the window, as in
  * pandas `merge_asof(tolerance=...)`. */
object AsofJoin {

  /** Returns one row per left row: `(keyCol, <leftIdCol>, <rightIdCol>
    * as matched id — null when no as-of match>, lag_us = left ts −
    * matched ts)`. Timestamps are compared as epoch-micro longs
    * ([[Analytics.eventFunnel]]'s convention): timestamp columns
    * convert exactly, long columns pass through. */
  def asofJoin(left: DataFrame, right: DataFrame, keyCol: String,
      leftTs: String, rightTs: String, leftId: String, rightId: String,
      inclusive: Boolean = true,
      toleranceMicros: Long = Long.MaxValue): DataFrame = {
    require(toleranceMicros >= 0, s"tolerance must be >= 0, got $toleranceMicros")
    // the id columns ride through the window as longs; a lossy cast
    // (string/decimal ids -> null) would silently hide every right row
    // from the carry-forward, so reject non-integral ids loudly —
    // same fail-fast contract as the tolerance check above
    import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
    def requireIntegralId(df: DataFrame, c: String, side: String): Unit = {
      val dt = df.schema(c).dataType
      require(Seq(ByteType, ShortType, IntegerType, LongType).contains(dt),
        s"$side id column '$c' must be an integral type (it is carried " +
          s"through the as-of window as a long); got $dt. Map string ids " +
          "to a surrogate long (e.g. hash or monotonically_increasing_id) " +
          "before the join.")
    }
    requireIntegralId(left, leftId, "left")
    requireIntegralId(right, rightId, "right")
    def micros(df: DataFrame, c: String): Column =
      df.schema(c).dataType match {
        case org.apache.spark.sql.types.LongType => col(c)
        case _ => unix_micros(col(c)
          .cast(org.apache.spark.sql.types.TimestampType))
      }
    // side ordinal places right rows before (inclusive) or after
    // (strict) left rows at equal timestamps — the whole <=-vs-<
    // distinction is this one integer
    val rSide = if (inclusive) 0 else 2
    val r = right.select(col(keyCol).as("__k"),
      micros(right, rightTs).as("__t"), lit(rSide).as("__side"),
      col(rightId).cast("long").as("__rid"),
      lit(null).cast("long").as("__lid"))
    val l = left.select(col(keyCol).as("__k"),
      micros(left, leftTs).as("__t"), lit(1).as("__side"),
      lit(null).cast("long").as("__rid"),
      col(leftId).cast("long").as("__lid"))
    val w = Window.partitionBy("__k")
      .orderBy(col("__t"), col("__side"), col("__rid").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    r.unionByName(l)
      .withColumn("__m", last(col("__rid"), ignoreNulls = true).over(w))
      .withColumn("__mt",
        last(when(col("__rid").isNotNull, col("__t")), ignoreNulls = true)
          .over(w))
      .filter(col("__side") === 1)
      .select(col("__k").as(keyCol), col("__lid").as(leftId),
        when(col("__t") - col("__mt") <= toleranceMicros, col("__m"))
          .as(s"matched_$rightId"),
        when(col("__t") - col("__mt") <= toleranceMicros,
          col("__t") - col("__mt")).as("lag_us"))
  }
}
