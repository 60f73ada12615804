package graft.util

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table helpers for co-located joins (SURVEY §4 partitioning
  * row; the brief's third join strategy next to broadcast and salting).
  *
  * Two tables bucketed by the same keys into the same bucket count join
  * WITHOUT a shuffle exchange — at 100 TB this converts the dominant
  * repeated fact-fact join (e.g. orders ⋈ lineitem on orderkey, or the
  * reconcile full-outer) from two full-network shuffles per run into
  * zero, paying one bucketed write up front. The BucketedJoinSpec plan
  * audit asserts the exchange-free property.
  */
object Bucketing {

  /** Write a bucketed (and sorted-within-buckets) table into the session
    * catalog. `numBuckets` should be sized so a bucket's share of the
    * largest joining table fits an executor's memory (e.g. 100 TB fact /
    * 4096 buckets ≈ 25 GB per bucket pre-filter). */
  def writeBucketed(df: DataFrame, table: String, keys: Seq[String],
      numBuckets: Int, sortByKeys: Boolean = true,
      mode: SaveMode = SaveMode.Overwrite): Unit = {
    val w = df.write.mode(mode)
      .bucketBy(numBuckets, keys.head, keys.tail: _*)
    (if (sortByKeys) w.sortBy(keys.head, keys.tail: _*) else w)
      .format("parquet")
      .saveAsTable(table)
  }

  def read(spark: SparkSession, table: String): DataFrame = spark.table(table)

  /** Co-located equi-join of two same-bucketed tables. The plan this
    * produces must contain no Exchange on either side — asserted in
    * BucketedJoinSpec rather than trusted. */
  def bucketedJoin(spark: SparkSession, leftTable: String, rightTable: String,
      keys: Seq[String], joinType: String = "inner"): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), keys, joinType)
}
