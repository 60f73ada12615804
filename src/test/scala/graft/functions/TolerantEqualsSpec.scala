package graft.functions

import graft.SparkSpec
import graft.functions.TolerantEquals.tolerantEquals
import org.apache.spark.sql.functions._

class TolerantEqualsSpec extends SparkSpec {
  import spark.implicits._

  private def eval(l: Option[Double], r: Option[Double], tol: Double): Boolean =
    Seq((l, r)).toDF("l", "r")
      .select(tolerantEquals($"l", $"r", tol).as("e"))
      .head().getBoolean(0)

  test("semantics: within-tolerance, beyond, null pairs") {
    assert(eval(Some(1.0), Some(1.00005), 1e-4))
    assert(!eval(Some(1.0), Some(1.001), 1e-4))
    assert(eval(None, None, 1e-4))       // NULL ≈ NULL
    assert(!eval(Some(1.0), None, 1e-4)) // one-sided NULL
    assert(!eval(None, Some(1.0), 1e-4))
  }

  test("matches the composed-expression semantics on a data sweep") {
    val df = spark.range(2000).select(
      when($"id" % 7 === 0, lit(null)).otherwise(($"id" % 100) / 10.0).as("l"),
      when($"id" % 11 === 0, lit(null)).otherwise(($"id" % 100) / 10.0 + ($"id" % 3) * 1e-5).as("r"))
    val composed = (col("l").isNull && col("r").isNull) ||
      (col("l").isNotNull && col("r").isNotNull && abs(col("l") - col("r")) < lit(1e-4))
    val diff = df.select(
      tolerantEquals($"l", $"r", 1e-4).as("native"), composed.as("composed"))
      .filter($"native" =!= $"composed")
    assert(diff.count() == 0)
  }

  test("interpreted eval path (no codegen) agrees") {
    // constant folding exercises eval(); WholeStageCodegen exercised via
    // the DataFrame sweep above and the whole oracle gate (Comparer uses
    // this expression for every double compare)
    import org.apache.spark.sql.catalyst.expressions.Literal
    val e = TolerantEquals(Literal(2.0), Literal(2.00001), Literal(1e-4))
    assert(e.eval(null) == true)
    val e2 = TolerantEquals(Literal(2.0), Literal(3.0), Literal(1e-4))
    assert(e2.eval(null) == false)
  }

  test("SQL registration: tolerant_equals usable from spark.sql") {
    TolerantEquals.register(spark)
    val got = spark.sql(
      "SELECT tolerant_equals(CAST(1.0 AS DOUBLE), CAST(1.00005 AS DOUBLE), CAST(0.0001 AS DOUBLE)) AS e")
      .head().getBoolean(0)
    assert(got)
  }

  test("type check rejects non-double inputs") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    val bad = TolerantEquals(Literal("x"), Literal(1.0), Literal(1e-4))
    assert(!bad.checkInputDataTypes().isSuccess)
  }
}
