package graft.reconcile

import graft.SparkSpec
import graft.compare.Comparer.CompareOptions
import org.apache.spark.sql.functions._

/** Mirrors the reference's unit coverage in tests/unit/test_differ.py:
  * missing/extra/mismatch detection, composite keys, ignore-fields,
  * duplicates, null-key handling. */
class DifferSpec extends SparkSpec {
  import spark.implicits._

  private def src = Seq(
    (1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0), (4L, "d", 40.0)
  ).toDF("id", "name", "amount")

  private def tgt = Seq(
    (1L, "a", 10.0),          // match
    (2L, "b", 20.5),          // mismatch (amount)
    (3L, "x", 30.0),          // mismatch (name)
    (5L, "e", 50.0)           // extra
  ).toDF("id", "name", "amount")         // id=4 missing

  test("findMissingInTarget finds source-only keys") {
    val got = Differ.findMissingInTarget(src, tgt, Seq("id")).select("id").as[Long].collect()
    assert(got.toSet == Set(4L))
  }

  test("findExtraInTarget finds target-only keys") {
    val got = Differ.findExtraInTarget(src, tgt, Seq("id")).select("id").as[Long].collect()
    assert(got.toSet == Set(5L))
  }

  test("findMismatches flags differing rows, tolerant on floats") {
    val got = Differ.findMismatches(src, tgt, Seq("id")).select("id").as[Long].collect()
    assert(got.toSet == Set(2L, 3L))
  }

  test("float tolerance suppresses sub-threshold differences") {
    val t2 = tgt.withColumn("amount",
      when($"id" === 2L, lit(20.500000001)).otherwise($"amount"))
    val loose = Differ.findMismatches(src, t2, Seq("id"),
      CompareOptions(floatTolerance = 1.0)).select("id").as[Long].collect()
    assert(loose.toSet == Set(3L)) // amount diff 0.5 < 1.0; name diff remains
  }

  test("ignoreFields drops a column from comparison") {
    val got = Differ.findMismatches(src, tgt, Seq("id"),
      CompareOptions(ignoreFields = Set("name"))).select("id").as[Long].collect()
    assert(got.toSet == Set(2L))
  }

  test("findAllDiscrepancies labels all three kinds in one pass") {
    val got = Differ.findAllDiscrepancies(src, tgt, Seq("id"))
      .select("id", "discrepancy_type").as[(Long, String)].collect().toMap
    assert(got == Map(4L -> "missing_in_target", 5L -> "extra_in_target",
      2L -> "mismatch", 3L -> "mismatch"))
  }

  test("discrepancySummary counts by type including matches") {
    val got = Differ.discrepancySummary(src, tgt, Seq("id"))
      .as[(String, Long)].collect().toMap
    assert(got == Map("match" -> 1L, "mismatch" -> 2L,
      "missing_in_target" -> 1L, "extra_in_target" -> 1L))
  }

  test("matchPercentage = matched / source-side rows") {
    val got = Differ.matchPercentage(src, tgt, Seq("id")).as[Double].head()
    assert(got == 25.0) // 1 match of 4 source keys
  }

  test("composite keys") {
    val s = Seq((1L, 1L, "x"), (1L, 2L, "y")).toDF("k1", "k2", "v")
    val t = Seq((1L, 1L, "x")).toDF("k1", "k2", "v")
    val missing = Differ.findMissingInTarget(s, t, Seq("k1", "k2"))
    assert(missing.count() == 1 && missing.select("k2").as[Long].head() == 2L)
  }

  test("findMismatchesDetailed explodes per-field differences") {
    val got = Differ.findMismatchesDetailed(src, tgt, Seq("id"))
      .select("id", "field").as[(Long, String)].collect().toSet
    assert(got == Set((2L, "amount"), (3L, "name")))
  }

  test("J9 iterDiscrepancies streams the same rows findAllDiscrepancies returns") {
    val src = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v")
    val tgt = Seq((1L, "a"), (2L, "CHANGED"), (4L, "d")).toDF("id", "v")
    val it = Differ.iterDiscrepancies(src, tgt, Seq("id"))
    assert(it.isInstanceOf[Iterator[_]]) // lazily consumed, not collected
    val streamed = it.map(_.toString).toSeq.sorted
    val collected = Differ.findAllDiscrepancies(src, tgt, Seq("id"))
      .collect().map(_.toString).toSeq.sorted
    assert(streamed == collected && streamed.size == 3)
  }

  test("nullKeyRows isolates rows the reference would raise on") {
    val s = Seq((Some(1L), "a"), (None, "b")).toDF("id", "v")
    assert(Differ.nullKeyRows(s, Seq("id")).count() == 1)
  }

  test("findDuplicates reports keys with count > 1") {
    val s = Seq((1L, "a"), (1L, "b"), (2L, "c")).toDF("id", "v")
    val got = Differ.findDuplicates(s, Seq("id")).as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 2L))
  }

  test("schemaDiff categorizes fields") {
    val s = Seq((1L, "a")).toDF("id", "only_src")
    val t = Seq((1L, 2.0)).toDF("id", "only_tgt")
    val got = Differ.schemaDiff(s, t).as[(String, String)].collect().toSet
    assert(got == Set(("only_in_source", "only_src"),
      ("only_in_target", "only_tgt"), ("common", "id")))
  }
}
