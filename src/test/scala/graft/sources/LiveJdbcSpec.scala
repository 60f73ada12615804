package graft.sources

import java.sql.DriverManager

import graft.SparkSpec

/** S7/ST5 against a LIVE database (DuckDB over JDBC — the same engine
  * the driver's oracle uses): the partitioned reader must return exactly
  * what a plain read returns, split across genuinely parallel range
  * queries (reference behavior: the OFFSET-paged fetch in
  * `scripts/reconcile.py:295-326`, replaced here by range partitions). */
class LiveJdbcSpec extends SparkSpec {
  import spark.implicits._

  private def withDb[T](f: String => T): T = {
    assume(
      try { Class.forName("org.duckdb.DuckDBDriver"); true }
      catch { case _: ClassNotFoundException => false },
      "DuckDB JDBC driver not on the test classpath (see build.sbt unmanagedJars)")
    val dbFile = java.nio.file.Files.createTempDirectory("livejdbc")
      .resolve("t.db").toString
    val url = s"jdbc:duckdb:$dbFile"
    val conn = DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      st.execute("CREATE TABLE items(id BIGINT PRIMARY KEY, name VARCHAR, val DOUBLE)")
      (0 until 100).foreach(i =>
        st.execute(s"INSERT INTO items VALUES ($i, 'n$i', ${i * 1.5})"))
      st.close()
    } finally conn.close()
    f(url)
  }

  test("partitionedJdbc: 4 range partitions, same rows as a plain read") {
    withDb { url =>
      val part = Sources.partitionedJdbc(spark, url, "items",
        partitionColumn = "id", lowerBound = 0L, upperBound = 100L,
        numPartitions = 4)
      assert(part.rdd.getNumPartitions == 4, "reader must issue 4 range queries")
      // DuckDB's JDBC driver surfaces BIGINT as DECIMAL(20,0); normalize
      def norm(df: org.apache.spark.sql.DataFrame) =
        df.select($"id".cast("long"), $"name", $"val")
          .as[(Long, String, Double)].collect().sortBy(_._1).toSeq
      val got = norm(part)
      val plain = norm(spark.read.jdbc(url, "items", new java.util.Properties()))
      assert(got == plain && got.size == 100)
      assert(got(3) == (3L, "n3", 4.5))
    }
  }

  test("partitionedJdbc pushes caller predicates down to the database") {
    withDb { url =>
      val filtered = Sources.partitionedJdbc(spark, url, "items",
        "id", 0L, 100L, 4).filter($"id" < 10)
      val plan = filtered.queryExecution.executedPlan.toString
      assert(plan.contains("PushedFilters") && plan.contains("LessThan"),
        s"filter must reach the JDBC scan:\n$plan")
      assert(filtered.count() == 10)
    }
  }
}
