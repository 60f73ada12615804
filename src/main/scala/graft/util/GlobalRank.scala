package graft.util

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The engine's signature scale trick, in one tested home: global
  * ordered ranks and prefix sums WITHOUT a single-partition window.
  * Every variant decomposes the same way — partition the total order
  * (by Spark's range repartitioner or by a caller-supplied
  * order-aligned bucket column), bring ONE ROW PER PARTITION/BUCKET
  * back to the driver (counts and/or sums — bounded by the partition
  * count, never the data), prefix-scan those into base offsets on the
  * driver, broadcast the offsets back, and run each partition's
  * internal window in parallel. The result is bit-identical to the
  * textbook global window at any parallelism.
  *
  * Two families:
  *
  *  - [[withGlobalRank]] / [[withGlobalRankAndPrefix]]: the engine
  *    picks the partitioning (`repartitionByRange` over the sort
  *    keys — Spark's distributed-sort layout). The sort key must be a
  *    TOTAL order (add a unique id tiebreak) or ranks at boundary
  *    duplicates would depend on sampled range boundaries. Used by
  *    the exact-quantile/median/MAD/Pareto family.
  *  - [[bucketedRank]] / [[bucketedPrefix]]: the CALLER supplies a
  *    bounded integral bucket column that is ORDER-ALIGNED with the
  *    sort (every row of bucket b precedes every row of bucket b+1
  *    in the intended total order — fixed-span time/id/coin ranges,
  *    token-length blocks). Used when the bucketing itself carries
  *    meaning (sweep-line instants, shard coins, SNM length blocks)
  *    or the caller already materialized the bucketed frame.
  *
  * Materialization discipline: the range variants `localCheckpoint`
  * internally (they read the repartitioned frame twice — per-partition
  * stats, then the rank pass). The bucketed variants do NOT — every
  * current caller already holds a checkpointed upstream frame, and a
  * second checkpoint would double-materialize; they read `df` twice,
  * so pass a materialized (or cheap-to-recompute) frame. */
private[graft] object GlobalRank {

  /** Total-order global rank: range repartition by the sort key,
    * per-partition row numbers under a partition-id window, driver-side
    * prefix offsets over the per-partition counts (bounded: one row per
    * partition). Returns the frame plus `rankCol` (1-based) and the
    * total row count. */
  def withGlobalRank(df: DataFrame,
      sortCols: Seq[Column], rankCol: String): (DataFrame, Long) = {
    val spark = df.sparkSession
    import spark.implicits._
    val ranged = df.repartitionByRange(sortCols: _*)
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint() // read twice: partition counts + the rank pass
    val counts = ranged.groupBy("__pid").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val n = counts.map(_._2).sum
    val offs = counts.map(_._1)
      .zip(counts.scanLeft(0L)((a, c) => a + c._2).init)
    val offDf = offs.toSeq.toDF("__pid", "__off")
    val w = Window.partitionBy("__pid").orderBy(sortCols: _*)
    val out = ranged
      .withColumn("__rn", row_number().over(w))
      .join(broadcast(offDf), "__pid")
      .withColumn(rankCol, col("__off") + col("__rn"))
      .drop("__pid", "__off", "__rn")
    (out, n)
  }

  /** [[withGlobalRank]] plus a running (prefix-inclusive) sum of
    * `valueCol` over the same total order, same decomposition: range
    * repartition, per-partition (count, sum) to the driver, broadcast
    * base offsets, per-partition windows. Returns the frame with
    * `rankCol` and `cumCol` plus `(n, total)`. */
  def withGlobalRankAndPrefix(df: DataFrame,
      sortCols: Seq[Column], valueCol: String, rankCol: String,
      cumCol: String): (DataFrame, Long, Long) = {
    val spark = df.sparkSession
    import spark.implicits._
    val ranged = df.repartitionByRange(sortCols: _*)
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint() // read twice: partition totals + the rank pass
    val parts = ranged.groupBy("__pid")
      .agg(count(lit(1)).as("n"), sum(col(valueCol)).as("s"))
      .collect().map { r =>
        // fail loud, not NPE: a partition whose values are ALL null
        // sums to null, and a silent 0 would corrupt every downstream
        // offset
        require(!r.isNullAt(2), s"withGlobalRankAndPrefix: '$valueCol' " +
          "contains nulls (a partition sum is null) — filter or " +
          "validate upstream")
        (r.getInt(0), r.getLong(1), r.getLong(2))
      }
      .sortBy(_._1)
    val n = parts.map(_._2).sum
    val total = parts.map(_._3).sum
    val offs = parts.map(_._1)
      .zip(parts.scanLeft((0L, 0L)) { case ((cn, cs), p) =>
        (cn + p._2, cs + p._3)
      }.init)
      .map { case (pid, (cn, cs)) => (pid, cn, cs) }
    val offDf = offs.toSeq.toDF("__pid", "__offn", "__offs")
    val w = Window.partitionBy("__pid").orderBy(sortCols: _*)
    val cumW = w.rowsBetween(Window.unboundedPreceding, 0)
    val out = ranged
      .withColumn("__rn", row_number().over(w))
      .withColumn("__cs", sum(col(valueCol)).over(cumW))
      .join(broadcast(offDf), "__pid")
      .withColumn(rankCol, col("__offn") + col("__rn"))
      .withColumn(cumCol, col("__offs") + col("__cs"))
      .drop("__pid", "__offn", "__offs", "__rn", "__cs")
    (out, n, total)
  }

  /** Per-GROUP 1-based local ranks WITHOUT per-group windows: one
    * [[withGlobalRank]] pass over the `(groupCols, sortCols)` total
    * order, per-group (min rank, count) as a group-bounded BROADCAST,
    * local rank = global rank − the group's offset. This is the
    * exact-quantile/median pick stage shared by the median/IQR/
    * winsorize/panel family — a per-group window over the raw fact
    * would serialize every hot group into one sort task. Returns the
    * frame plus `rankCol` (1-based within group) and `countCol` (the
    * group size on every row). `sortCols` must totalize WITHIN groups
    * (unique id tiebreak). Callers that read the result more than once
    * should `localCheckpoint` it (the rank window otherwise recomputes
    * from the internally materialized ranged frame — cheap but not
    * free). */
  def withGroupLocalRank(df: DataFrame, groupCols: Seq[String],
      sortCols: Seq[Column], rankCol: String,
      countCol: String): DataFrame = {
    val (ranked, _) = withGlobalRank(df,
      groupCols.map(col) ++ sortCols, "__ggr")
    val offs = ranked.groupBy(groupCols.map(col): _*)
      .agg(min(col("__ggr")).as("__goff"), count(lit(1)).as(countCol))
    ranked.join(broadcast(offs), groupCols)
      .withColumn(rankCol, col("__ggr") - col("__goff") + 1)
      .drop("__ggr", "__goff")
  }

  /** Per-bucket stats to the driver in bucket order — the one collect
    * every bucketed variant shares (bounded: one row per distinct
    * bucket value). */
  private def bucketStats(df: DataFrame, bucketCol: String,
      aggs: Seq[Column]): Array[org.apache.spark.sql.Row] =
    df.groupBy(col(bucketCol).cast("long").as("__gb"))
      .agg(aggs.head, aggs.tail: _*)
      .orderBy("__gb").collect()

  /** Global 1-based rank over an ORDER-ALIGNED bucketing: per-bucket
    * counts to the driver, prefix offsets, broadcast, per-bucket
    * `row_number` — never a global sort. The bucket column must be
    * integral and aligned with `(bucket, orderCols)` as the intended
    * total order. Reads `df` twice (see the object doc's
    * materialization discipline). */
  def bucketedRank(df: DataFrame, bucketCol: String,
      orderCols: Seq[Column], rankCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val counts = bucketStats(df, bucketCol, Seq(count(lit(1)).as("c")))
      .map(r => r.getLong(0) -> r.getLong(1))
    val offs = counts.map(_._1)
      .zip(counts.scanLeft(0L)((a, c) => a + c._2).init)
    val offDf = broadcast(offs.toSeq.toDF("__gb", "__off"))
    val w = Window.partitionBy(col(bucketCol)).orderBy(orderCols: _*)
    df.join(offDf, col(bucketCol).cast("long") === col("__gb"))
      .withColumn(rankCol, col("__off") + row_number().over(w))
      .drop("__gb", "__off")
  }

  /** Global running sum of `valueCol` over an ORDER-ALIGNED bucketing:
    * per-bucket totals to the driver, prefix bases, broadcast,
    * per-bucket cumulative windows. `inclusive` selects the frame —
    * `[-∞, 0]` (each row's cum includes its own value) or `[-∞, -1]`
    * (the row's START offset; 0 for each bucket's first row). Returns
    * the frame plus the grand total, which must fit in 64 bits (the
    * base offsets are longs) — fails loud otherwise. Reads `df` twice
    * (see the object doc's materialization discipline). */
  def bucketedPrefix(df: DataFrame, bucketCol: String,
      orderCols: Seq[Column], valueCol: String, cumCol: String,
      inclusive: Boolean = true): (DataFrame, Long) = {
    val spark = df.sparkSession
    import spark.implicits._
    val totals = bucketStats(df, bucketCol,
        Seq(sum(col(valueCol)).as("t")))
      .map { r =>
        require(!r.isNullAt(1), s"bucketedPrefix: '$valueCol' contains " +
          "nulls (a bucket total is null) — filter or validate upstream")
        r.getLong(0) -> r.getLong(1)
      }
    val total = totals.map(t => BigInt(t._2)).sum
    require(total.isValidLong,
      s"global prefix total $total overflows 64-bit — rescale the fixed point")
    val bases = totals.scanLeft(0L)((acc, bt) => acc + bt._2).init
    val baseDf = broadcast(totals.map(_._1).zip(bases).toSeq
      .toDF("__gb", "__base"))
    val w0 = Window.partitionBy(col(bucketCol)).orderBy(orderCols: _*)
    val win =
      if (inclusive) w0.rowsBetween(Window.unboundedPreceding, 0)
      else w0.rowsBetween(Window.unboundedPreceding, -1)
    val out = df.join(baseDf, col(bucketCol).cast("long") === col("__gb"))
      .withColumn(cumCol,
        col("__base") + coalesce(sum(col(valueCol)).over(win), lit(0L)))
      .drop("__gb", "__base")
    (out, total.toLong)
  }
}
