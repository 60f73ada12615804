package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Stage-level diagnostics for one heavy query on an arbitrary
  * documents parquet: prints every completed stage's task count and
  * wall time, the result count, and the FINAL adaptive plan (after the
  * action, so exchanges show their actual — possibly AQE-coalesced —
  * partition counts). The tool that answers "which stage serializes"
  * when a scale ratio comes back superlinear.
  *
  *   sbt "runMain graft.QueryDiag <documentsParquet> [query]"
  */
object QueryDiag {
  def main(args: Array[String]): Unit = {
    val docsPath = args.headOption.getOrElse("/tmp/graft_scale/f10/documents.parquet")
    val query = args.lift(1).getOrElse("q36")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft-query-diag")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.coalescePartitions.enabled",
        sys.env.getOrElse("SPARK_GRAFT_AQE_COALESCE", "true"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val ms = (for (a <- si.submissionTime; b <- si.completionTime)
          yield b - a).getOrElse(-1L)
        println(s"[stage] id=${si.stageId} tasks=${si.numTasks} ms=$ms " +
          s"name=${si.name.linesIterator.nextOption().getOrElse("").take(100)}")
      }
    })
    val docs = spark.read.parquet(docsPath)
    val df = query match {
      case "q36" =>
        val idx = text.Dedup.shingleIndex(docs, "doc_id", "text", k = 3)
        println(s"[diag] index rows=${idx.count()}")
        text.Dedup.ngramJaccardPairsFromIndex(idx, threshold = 0.3)
      case "q46" =>
        val idx = text.Dedup.shingleIndex(docs, "doc_id", "text", k = 3)
        println(s"[diag] index rows=${idx.count()}")
        text.Dedup.dedupByPairs(docs, "doc_id",
          text.Dedup.ngramJaccardPairsFromIndex(idx, threshold = 0.8))
      case other => sys.error(s"unknown query '$other' (q36|q46)")
    }
    val t0 = System.nanoTime()
    val n = df.count()
    println(s"[diag] query=$query rows=$n sec=${(System.nanoTime() - t0) / 1e9}")
    df.explain("formatted")
    spark.stop()
  }
}
