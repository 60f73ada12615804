package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Parquet → JSON-lines staging utility — the bridge between the
  * warehouse tables and the streaming launchers' file-source inputs
  * ([[SessionCensusCli]], [[CurateStreamCli]], [[CdcReplicateCli]]),
  * for demos, backfills and replay drills:
  *
  *   runMain graft.ops.JsonStage \
  *     --input <parquet path> --output <dir of JSON lines> \
  *     [--select c1,c2,...]   project before serializing \
  *     [--order-by <col>]     range-partition + sort so files are
  *                            chronological \
  *     [--parts 8]            output file count
  *
  * Two details matter for a faithful replay and are easy to get wrong
  * by hand:
  *
  *  1. CHRONOLOGICAL arrival: with `--order-by`, rows are
  *     range-partitioned and sorted on the column, so part-00000 holds
  *     the earliest ranges. A randomly-split corpus would let the
  *     first micro-batch drag the watermark to the frontier and every
  *     later file would arrive "late" — a replay that measures drop
  *     policy, not the operator.
  *  2. MTIME ordering: Spark's file source breaks same-batch ties by
  *     MODIFICATION time — i.e. write-task completion order,
  *     nondeterministic and unrelated to the range order. The staged
  *     parts get strictly-increasing mtimes stamped in part order, so
  *     the stream really arrives in `--order-by` order.
  */
object JsonStage {

  /** The staging body (testable seam): project, serialize, range-order,
    * write, stamp mtimes. Returns the staged part-file count. */
  def stage(spark: SparkSession, input: String, output: String,
      orderBy: String = "", select: Seq[String] = Nil,
      parts: Int = 8): Int = {
    require(parts >= 1, s"parts must be >= 1, got $parts")
    val df0 = spark.read.parquet(input)
    val df = if (select.nonEmpty) df0.select(select.map(col): _*) else df0
    val json = to_json(struct(df.columns.map(col): _*)).as("value")
    val staged =
      if (orderBy.nonEmpty)
        df.select(json, col(orderBy).as("__ord"))
          .repartitionByRange(parts, col("__ord"))
          .sortWithinPartitions("__ord")
          .select("value")
      else df.select(json).repartition(parts)
    staged.write.mode("overwrite").text(output)
    // strictly-increasing mtimes in part order (see the scaladoc); the
    // base sits an hour back so files staged later (an incremental
    // drop-in) naturally sort after these
    val partFiles = Option(new java.io.File(output).listFiles())
      .getOrElse(Array.empty[java.io.File])
      .filter(_.getName.startsWith("part-")).sortBy(_.getName)
    partFiles.zipWithIndex.foreach { case (f, idx) =>
      f.setLastModified(System.currentTimeMillis() - 3600000L + idx * 1000L)
    }
    partFiles.length
  }

  def main(args: Array[String]): Unit = {
    var input = ""; var output = ""; var orderBy = ""
    var select = Seq.empty[String]; var parts = 8
    var i = 0
    while (i < args.length) {
      args(i) match {
        case "--input" => input = args(i + 1); i += 2
        case "--output" => output = args(i + 1); i += 2
        case "--order-by" => orderBy = args(i + 1); i += 2
        case "--select" =>
          select = args(i + 1).split(",").map(_.trim).filter(_.nonEmpty).toSeq
          i += 2
        case "--parts" => parts = args(i + 1).toInt; i += 2
        case other =>
          System.err.println(s"[config] unknown flag '$other'"); sys.exit(10)
      }
    }
    if (input.isEmpty || output.isEmpty || parts < 1) {
      System.err.println("[config] --input and --output required, --parts >= 1")
      sys.exit(10)
    }
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[8]"))
      .appName("graft-json-stage")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val n = stage(spark, input, output, orderBy, select, parts)
    println(s"""{"staged_files": $n, "output": "$output"}""")
    spark.stop()
  }
}
