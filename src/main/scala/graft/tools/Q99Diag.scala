package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase-level breakdown of the q99 tf-idf cosine pipeline: replays
  * each internal relation of [[graft.text.TextAnalysis.tfidfCosinePairs]]
  * (topM=5, t=0.8 — the q99 parameters) with a count+time per phase, so
  * the 6-second job the bench sees decomposes into (prefix rows, full
  * rows, join fan-out, distinct candidates, verified pairs).
  *
  *   sbt "runMain graft.tools.Q99Diag [sfDir]"
  */
object Q99Diag {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.text.TextAnalysis.tokens

    val topM = 5; val threshold = 0.8
    val tPpm = math.floor(threshold * 1000000).toLong
    def t[A](name: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      println(f"  ${(System.nanoTime() - t0) / 1e9}%7.2f s  $name = $r")
      r
    }
    val df = graft.Tables.documents(spark, sfDir)
    val perDoc = df.filter(col("text").isNotNull)
      .select(col("doc_id").as("__id"), explode(tokens(col("text"))).as("token"))
      .filter(col("token") =!= "")
      .groupBy("token", "__id").agg(count(lit(1)).as("tf"))
      .localCheckpoint()
    t("perDoc rows")(perDoc.count())
    val dfTab = perDoc.groupBy("token").agg(count(lit(1)).as("df"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("__id")
      .orderBy((col("tf").cast("double") / col("df")).desc, col("token"))
    val docsArr = perDoc.join(dfTab, "token")
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= topM)
      .select(col("__id"), col("df"), col("token"),
        expr("tf * 1000000L DIV df").as("w"))
      .groupBy("__id")
      .agg(array_sort(collect_list(struct(col("df"), col("token"), col("w"))))
        .as("__arr"))
      .withColumn("__n2", aggregate(col("__arr"), lit(0L),
        (a, e) => a + e.getField("w") * e.getField("w")))
      .filter(col("__n2") > 0)
      .localCheckpoint()
    t("docsArr rows")(docsArr.count())
    val wPos = org.apache.spark.sql.expressions.Window
      .partitionBy("__id").orderBy("pos")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val positions = docsArr
      .select(col("__id"), col("__n2"), posexplode(col("__arr")).as(Seq("pos", "e")))
      .withColumn("__rsq", col("__n2").cast("double") -
        coalesce(sum(col("e.w").cast("double") * col("e.w")).over(wPos), lit(0.0)))
      .select(col("__id"), col("e").getField("token").as("token"),
        col("__rsq"), col("__n2"))
    t("positions rows")(positions.count())
    val prefixes = positions
      .filter(col("__rsq") * lit(1.0e12) >=
        lit(tPpm.toDouble * tPpm) * col("__n2").cast("double") * lit(1.0 - 1.0e-9))
      .localCheckpoint()
    t("prefix rows")(prefixes.count())
    val full = positions.select(col("__id").as("__idf"),
      col("token"), col("__rsq").as("__rsqf"), col("__n2").as("__n2f"))
    val joined = prefixes.join(full, "token")
      .filter(col("__id") =!= col("__idf"))
    t("join fan-out rows")(joined.count())
    val surviving = joined
      .filter(col("__rsq") * col("__rsqf") * lit(1.0e12) >=
        lit(tPpm.toDouble * tPpm) * col("__n2").cast("double") *
          col("__n2f").cast("double") * lit(1.0 - 1.0e-9))
    t("post-positional rows")(surviving.count())
    val cands = surviving
      .select(least(col("__id"), col("__idf")).as("id_a"),
        greatest(col("__id"), col("__idf")).as("id_b"))
      .distinct().localCheckpoint()
    t("distinct candidate pairs")(cands.count())
    val sideA = docsArr.select(col("__id").as("id_a"),
      col("__arr").as("__aa"), col("__n2").as("n2_a"))
    val sideB = docsArr.select(col("__id").as("id_b"),
      map_from_entries(transform(col("__arr"),
        e => struct(e.getField("token"), e.getField("w")))).as("__mb"),
      col("__n2").as("n2_b"))
    val verified = cands.join(sideA, Seq("id_a")).join(sideB, Seq("id_b"))
      .withColumn("dp", aggregate(col("__aa"), lit(0L),
        (a, e) => a + e.getField("w") *
          coalesce(element_at(col("__mb"), e.getField("token")), lit(0L))))
      .withColumn("cosine", col("dp").cast("double") /
        (sqrt(col("n2_a").cast("double")) * sqrt(col("n2_b").cast("double"))))
      .filter(col("cosine") >= threshold)
    t("verified pairs")(verified.count())
    t("verified pairs (2nd)")(verified.count())
    // token df distribution among the top-M lists (who causes fan-out?)
    println("  hottest top-M tokens (df within docsArr):")
    positions.groupBy("token").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc).limit(10).collect()
      .foreach(r => println(s"    ${r.getString(0).take(30)} -> ${r.getLong(1)}"))
    spark.stop()
  }
}
