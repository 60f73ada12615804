package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev diagnostic: print the executed plan of named SparkEntry queries. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.drop(1).foreach { name =>
      println(s"========== $name ==========")
      println(graft.SparkEntry.queries.toMap.apply(name)(spark, sfDir)
        .queryExecution.executedPlan.toString())
    }
    spark.stop()
  }
}
