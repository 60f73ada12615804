package graft.util

import java.nio.file.{Files, Path, Paths}

import graft.SparkSpec
import graft.cdc.Upsert
import org.apache.spark.sql.functions._

class BucketedTableSpec extends SparkSpec {
  import spark.implicits._

  private val N = 8

  private def tmp(): String =
    Files.createTempDirectory("bucketed").resolve("t").toString

  private def initial = (0L until 200L)
    .map(i => (i, s"name$i", i * 1.0, 100L)).toDF("id", "name", "value", "seq")

  private def fileState(dest: String): Map[String, Long] = {
    val root = Paths.get(dest)
    val out = scala.collection.mutable.Map[String, Long]()
    Files.walk(root).forEach { p: Path =>
      if (Files.isRegularFile(p))
        out += (root.relativize(p).toString -> Files.getLastModifiedTime(p).toMillis)
    }
    out.toMap
  }

  test("COW merge == full-merge reference; untouched bucket files not rewritten") {
    val dest = tmp()
    BucketedTable.writeFull(initial, dest, Seq("id"), N)
    val before = fileState(dest)

    // updates touching two specific keys (update key 5, delete key 6,
    // insert key 900)
    val updates = Seq(
      (5L, Some("updated"), Some(5.5), 200L, "false"),
      (6L, None: Option[String], None: Option[Double], 200L, "true"),
      (900L, Some("new"), Some(9.0), 200L, "false")
    ).toDF("id", "name", "value", "seq", "__deleted")
    BucketedTable.merge(spark, dest, updates, Seq("id"), "seq", "__deleted",
      partialUpdateCols = Seq("name", "value"), n = N)

    // reference: the same kernel applied to the WHOLE table
    val expected = Upsert.mergeBatch(initial, updates, Seq("id"), "seq",
      "__deleted", Seq("name", "value"))
      .select("id", "name", "value", "seq").as[(Long, String, Double, Long)]
      .collect().toSet
    val got = BucketedTable.read(spark, dest).get
      .select("id", "name", "value", "seq").as[(Long, String, Double, Long)]
      .collect().toSet
    assert(got == expected)
    assert(!got.exists(_._1 == 6L) && got.exists(_._1 == 900L))

    // copy-on-write: only the buckets of keys {5, 6, 900} were rewritten
    val touched = Seq(5L, 6L, 900L).map(id =>
      spark.range(1).select(pmod(xxhash64(lit(id)), lit(N)).cast("int"))
        .head().getInt(0)).toSet
    val after = fileState(dest)
    val untouchedBefore = before.filter { case (p, _) =>
      !touched.exists(b => p.startsWith(s"__bucket=$b/")) }
    val untouchedAfter = after.filter { case (p, _) =>
      !touched.exists(b => p.startsWith(s"__bucket=$b/")) }
    assert(untouchedBefore == untouchedAfter,
      "untouched bucket directories must keep their exact files")
    assert(untouchedBefore.nonEmpty, "test needs untouched buckets to be meaningful")
  }

  test("deleting every key of a bucket removes its directory; reads stay consistent") {
    val dest = tmp()
    // 3 keys that all share bucket b, plus others
    val all = (0L until 50L)
    val bOf = all.map(id => id ->
      spark.range(1).select(pmod(xxhash64(lit(id)), lit(N)).cast("int")).head().getInt(0)).toMap
    val (bucket, members) = bOf.groupBy(_._2).view.mapValues(_.keys.toSeq).toMap
      .minBy { case (_, ids) => ids.size }
    val df = all.map(i => (i, s"n$i", 100L)).toDF("id", "name", "seq")
    BucketedTable.writeFull(df, dest, Seq("id"), N)
    val deletes = members.map(id => (id, None: Option[String], 200L, "true"))
      .toDF("id", "name", "seq", "__deleted")
    BucketedTable.merge(spark, dest, deletes, Seq("id"), "seq", "__deleted",
      Seq.empty, N)
    assert(!Files.exists(Paths.get(dest, s"__bucket=$bucket")),
      "fully-emptied bucket directory should disappear")
    val ids = BucketedTable.read(spark, dest).get.select("id").as[Long].collect().toSet
    assert(ids == all.toSet -- members)
  }

  test("recover rolls back a bucket whose swap crashed between moves") {
    val dest = tmp()
    BucketedTable.writeFull(initial, dest, Seq("id"), N)
    val whole = BucketedTable.read(spark, dest).get.count()
    // simulate the crash window: bucket moved to backup, dest dir missing
    val b = 3
    val backupRoot = Paths.get(s"${dest}__oldb")
    Files.createDirectories(backupRoot)
    Files.move(Paths.get(dest, s"__bucket=$b"), backupRoot.resolve(s"__bucket=$b"))
    assert(!Files.exists(Paths.get(dest, s"__bucket=$b")))
    val recovered = BucketedTable.read(spark, dest).get.count()
    assert(recovered == whole, "read must transparently restore the bucket")
    assert(!Files.exists(backupRoot), "backup root cleaned after recovery")
  }
}
