import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object Q90Diag {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.1"
    def t[A](name: String)(b: => A): A = {
      val t0 = System.nanoTime(); val r = b
      println(f"STAGE $name ${(System.nanoTime()-t0)/1e9}%.2f s"); r
    }
    val docs = graft.Tables.documents(spark, d)
    val queries = docs.filter(col("doc_id") % 97 === 0)
    // current formulation, twice (warm)
    for (i <- 1 to 2) t(s"join-formulation run$i") {
      println(graft.text.Retrieval.bm25BatchTopK(docs, "doc_id", "text",
        queries, "doc_id", "text", 3).count())
    }
    // broadcast formulation
    import graft.text.{TextAnalysis}
    def lfp(c: org.apache.spark.sql.Column) = floor(log(c.cast("double")) * lit(1000000L)).cast("long")
    def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
    def floorDiv(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      ((a - pmod(a, b)) / b).cast("decimal(38,0)")
    for (i <- 1 to 2) t(s"broadcast-formulation run$i") {
      val postings = docs.filter(col("text").isNotNull)
        .select(col("doc_id").as("__id"), explode(TextAnalysis.tokens(col("text"))).as("token"))
        .filter(col("token") =!= "")
        .groupBy("token", "__id").agg(count(lit(1)).as("tf"))
        .localCheckpoint()
      val dl = postings.groupBy("__id").agg(sum("tf").as("__dl"))
      val tot = dl.agg(count(lit(1)).as("__n"), sum("__dl").as("__t"))
      val dfT = postings.groupBy("token").agg(count(lit(1)).as("__df"))
      val scoredPostings = postings.join(dfT, "token").join(dl, "__id")
        .crossJoin(broadcast(tot))
        .select(col("token"), col("__id"), {
          val idfFp = lfp(lit(2L) * col("__n") + lit(2L)) - lfp(lit(2L) * col("__df") + lit(1L))
          val num = dec(lit(22L)) * dec(col("tf")) * dec(col("__t")) * dec(lit(1000000L))
          val den = dec(lit(10L)) * dec(col("__t")) * dec(col("tf")) +
            dec(lit(3L)) * dec(col("__t")) + dec(lit(9L)) * dec(col("__dl")) * dec(col("__n"))
          floorDiv(dec(idfFp) * floorDiv(num, den), dec(lit(1000000L))).cast("long").as("__s")
        })
      val docMaps = scoredPostings.groupBy("__id")
        .agg(map_from_entries(collect_list(struct(col("token"), col("__s")))).as("__sm"))
      val qTerms = queries.filter(col("text").isNotNull)
        .select(col("doc_id").as("__qid"), explode(TextAnalysis.tokens(col("text"))).as("token"))
        .filter(col("token") =!= "").distinct()
      val qB = qTerms.groupBy("__qid").agg(collect_list(col("token")).as("__qt"))
        .agg(collect_list(struct(col("__qid"), col("__qt"))).as("__qs"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("__qid").orderBy(col("score_fp").desc, col("__id"))
      val r = docMaps.crossJoin(broadcast(qB))
        .select(col("__id"), col("__sm"), explode(col("__qs")).as("__q"))
        .select(col("__q").getField("__qid").as("__qid"), col("__id"),
          aggregate(col("__q").getField("__qt"), lit(0L),
            (a, tk) => a + coalesce(element_at(col("__sm"), tk), lit(0L))).as("score_fp"))
        .filter(col("score_fp") > 0L)
        .withColumn("__rn", row_number().over(w)).filter(col("__rn") <= 3)
      println(r.count())
    }
    spark.stop()
  }
}
