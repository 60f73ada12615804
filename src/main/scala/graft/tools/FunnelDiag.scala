package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Per-stage wall-time attribution for the curation funnel: runs the
  * SAME full-funnel configuration the bench times (`curate_funnel_full`)
  * once in a fresh JVM and prints total job milliseconds grouped by the
  * `curate:<stage>` job descriptions CurateCli sets — the measurement
  * that tells the optimization round WHICH of the ~16 stages carries
  * the 10 s wall (optimization guide §1.1/§1.5).
  *
  *   sbt "runMain graft.tools.FunnelDiag [sfDir] [mode]"   mode: full|classic
  */
object FunnelDiag {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val mode = args.lift(1).getOrElse("full")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val jobDesc = scala.collection.concurrent.TrieMap.empty[Int, String]
    val jobStart = scala.collection.concurrent.TrieMap.empty[Int, Long]
    val stageMs = scala.collection.concurrent.TrieMap.empty[String, Long]
    val stageJobs = scala.collection.concurrent.TrieMap.empty[String, Long]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        jobDesc += e.jobId -> Option(
          e.properties.getProperty("spark.job.description")).getOrElse("(none)")
        jobStart += e.jobId -> e.time
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        val d = jobDesc.getOrElse(e.jobId, "(none)")
        val ms = e.time - jobStart.getOrElse(e.jobId, e.time)
        stageMs += d -> (stageMs.getOrElse(d, 0L) + ms)
        stageJobs += d -> (stageJobs.getOrElse(d, 0L) + 1L)
      }
    })

    val docs = graft.OrganicCorpus.seedBoilerplate(
      graft.Tables.documents(spark, sfDir))
    val runs = sys.env.get("FUNNEL_DIAG_RUNS").flatMap(_.toIntOption).getOrElse(3)
    (1 to runs).foreach { pass =>
      stageMs.clear(); stageJobs.clear()
      val t0 = System.nanoTime()
      val r =
        if (mode == "classic")
          graft.ops.CurateCli.curate(docs, "doc_id", "text")
        else
          graft.ops.CurateCli.curate(docs, "doc_id", "text",
            graft.ops.CurateCli.Config(mixDefaultPpm = 900000L,
              minQualityPctPpm = 50000L, minCharEntropyFp = 2600000L,
              containmentThreshold = 0.8, minNovelty = 0.05,
              piiScrub = true, maxRepetitionRatio = 0.9,
              gopherRules = true, lineDedupMinDf = 2,
              exciseSpanK = 8,
              nfcNormalize = true,
              auditPhrases = Seq(
                Seq("table", "scan", "merge"),
                Seq("batch", "stream", "spark")),
              budgetTokens = 2000000L,
              packBudget = 512, packBuckets = 8),
            evalDocs = Some(docs.filter(col("doc_id") % 37 === 0)))
      val wall = (System.nanoTime() - t0) / 1e9
      r.unpersist()
      Thread.sleep(500) // listener bus drain
      println(f"%nFUNNEL $mode pass $pass wall ${wall}%.2f s — per-stage job time:")
      stageMs.toSeq.sortBy(-_._2).foreach { case (d, ms) =>
        println(f"  ${ms / 1000.0}%7.2f s  ${stageJobs(d)}%3d jobs  $d")
      }
      val tracked = stageMs.values.sum / 1000.0
      println(f"  tracked job time ${tracked}%.2f s of ${wall}%.2f s wall " +
        "(gap = driver-side planning/checkpoint bookkeeping)")
    }
    spark.stop()
  }
}
