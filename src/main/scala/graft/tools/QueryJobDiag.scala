package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Job-level timing for ONE declared query: runs `<query>.count()` a few
  * times and prints every Spark job's wall ms with its first-stage call
  * site — the "which internal checkpoint/action is the expensive one"
  * view that `explain` can't give for query APIs that materialize
  * internal indexes eagerly.
  *
  *   sbt "runMain graft.tools.QueryJobDiag <query> [sfDir] [runs]"
  */
object QueryJobDiag {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse(sys.error("query name required"))
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val runs = args.lift(2).flatMap(_.toIntOption).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val jobs = scala.collection.concurrent.TrieMap.empty[Int, (Long, String)]
    val done = scala.collection.mutable.ArrayBuffer.empty[(Int, Long, String)]
    val stages = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, Long, String)]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        val site = e.stageInfos.lastOption.map(_.name).getOrElse("?")
        jobs += e.jobId -> (e.time, site)
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit =
        jobs.get(e.jobId).foreach { case (t0, site) =>
          done.synchronized { done += ((e.jobId, e.time - t0, site)) }
        }
      override def onStageCompleted(
          e: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val si = e.stageInfo
        val ms = (for (a <- si.submissionTime; b <- si.completionTime)
          yield b - a).getOrElse(-1L)
        stages.synchronized {
          stages += ((si.stageId, si.numTasks, ms,
            si.name.linesIterator.nextOption().getOrElse("").take(60)))
        }
      }
    })

    (1 to runs).foreach { pass =>
      done.synchronized(done.clear()); stages.synchronized(stages.clear())
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, sfDir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300)
      println(f"%n$name pass $pass wall ${wall}%.2f s — jobs:")
      done.synchronized(done.toSeq).sortBy(_._1).foreach { case (id, ms, site) =>
        println(f"  job $id%3d ${ms / 1000.0}%7.3f s  ${site.take(90)}")
      }
      println("  stages (tasks, ms):")
      stages.synchronized(stages.toSeq).sortBy(_._1).foreach {
        case (id, tasks, ms, nm) =>
          if (ms >= 100)
            println(f"  stage $id%4d tasks=$tasks%3d ${ms / 1000.0}%7.3f s  $nm")
      }
      graft.SparkEntry.sweepTransientStorage(spark)
    }
    spark.stop()
  }
}
