package graft

/** Contract checks the driver relies on (SURVEY §acceptance):
  * every query runs on sf0.001, oracle keys ⊆ query keys, entry()>0. */
class SparkEntrySpec extends SparkSpec {

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracleSql key has a queries entry") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  test("every query is oracle-checked (full-coverage invariant since r2)") {
    // the correctness gate only verifies queries that carry oracle SQL —
    // a new query without one silently downgrades to a rows-only check;
    // this pins the 100%-oracle invariant the round verdicts grade
    val unchecked = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(unchecked.isEmpty, s"query without oracle: $unchecked")
  }

  test("all queries execute at sf0.001") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, sf).count()
      withClue(name)(assert(n >= 0))
    }
  }
}
