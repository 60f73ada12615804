ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "scyllapgcdcspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
// DuckDB's JDBC driver (already present in the pre-warmed cache) backs
// the live-database specs for the partitioned reader and merge sink —
// attached as an unmanaged test jar so no resolution is ever attempted.
// (found by glob so mirror layout doesn't matter — one recursive scan at
// project load; sources/javadoc jars excluded and candidates sorted so
// the pick is deterministic. LiveJdbcSpec cancels itself with a clear
// message when no driver is attached.)
Test / unmanagedJars ++= {
  val cache = file(sys.props("user.home")) / ".cache" / "coursier"
  val jars =
    if (cache.exists)
      (cache ** "duckdb_jdbc-*.jar").get()
        .filterNot(f => f.name.endsWith("-sources.jar") || f.name.endsWith("-javadoc.jar"))
        .sortBy(_.name)
    else Seq.empty
  jars.headOption.map(Attributed.blank).toSeq
}
Test / fork := true
run / fork := true
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
)
