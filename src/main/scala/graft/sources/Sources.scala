package graft.sources

import java.util.Properties
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Batch source helpers (reference: reconcile fetch paths).
  *
  * The reference pages `SELECT ... LIMIT n OFFSET m` through driver
  * memory (`scripts/reconcile.py:295-326`) — an O(pages²) server-side
  * pattern that also serializes everything through one connection. The
  * Spark replacement is a PARTITIONED read: `numPartitions` concurrent
  * range-bounded queries (`WHERE partCol BETWEEN lo AND hi`), each
  * landing on a different executor. No OFFSET, no driver staging.
  */
object Sources {

  /** Partitioned JDBC scan (replaces S7 OFFSET paging). Predicates the
    * caller applies afterwards push down to the remote database. */
  def partitionedJdbc(spark: SparkSession, url: String, table: String,
      partitionColumn: String, lowerBound: Long, upperBound: Long,
      numPartitions: Int, props: Properties = new Properties()): DataFrame =
    spark.read
      .option("partitionColumn", partitionColumn)
      .option("lowerBound", lowerBound)
      .option("upperBound", upperBound)
      .option("numPartitions", numPartitions)
      .jdbc(url, table, props)

  /** Full-table snapshot from the warehouse (S6 analog over parquet). */
  def tableScan(spark: SparkSession, path: String, limit: Option[Int] = None): DataFrame = {
    val df = spark.read.parquet(path)
    limit.fold(df)(df.limit)
  }
}
