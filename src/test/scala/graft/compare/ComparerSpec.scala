package graft.compare

import graft.SparkSpec
import graft.compare.Comparer.CompareOptions
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Mirrors tests/unit/test_comparer.py: NULL==NULL, float tolerance,
  * decimal trailing zeros, case handling. */
class ComparerSpec extends SparkSpec {
  import spark.implicits._

  private def eval1(c: org.apache.spark.sql.Column): Boolean =
    spark.range(1).select(c.as("r")).head().getBoolean(0)

  test("NULL == NULL is equal (null-safe)") {
    assert(eval1(Comparer.valuesEqual(lit(null).cast(StringType),
      lit(null).cast(StringType), StringType)))
    assert(!eval1(Comparer.valuesEqual(lit("x"), lit(null).cast(StringType), StringType)))
  }

  test("float tolerance: |a-b| < 1e-4 equal, beyond not") {
    assert(eval1(Comparer.valuesEqual(lit(1.00001), lit(1.000019), DoubleType)))
    assert(!eval1(Comparer.valuesEqual(lit(1.0), lit(1.001), DoubleType)))
  }

  test("decimal trailing zeros are insignificant") {
    val a = lit("1.50").cast(DecimalType(10, 2))
    val b = lit("1.5").cast(DecimalType(10, 4))
    assert(eval1(Comparer.valuesEqual(a, b, DecimalType(10, 2))))
  }

  test("case-insensitive string option") {
    val opts = CompareOptions(caseInsensitiveStrings = true)
    assert(eval1(Comparer.valuesEqual(lit("ABC"), lit("abc"), StringType, opts)))
    assert(!eval1(Comparer.valuesEqual(lit("ABC"), lit("abc"), StringType)))
  }

  test("arrays compare ordered, maps by key (native semantics)") {
    assert(eval1(Comparer.valuesEqual(array(lit(1), lit(2)), array(lit(1), lit(2)),
      ArrayType(IntegerType))))
    assert(!eval1(Comparer.valuesEqual(array(lit(2), lit(1)), array(lit(1), lit(2)),
      ArrayType(IntegerType))))
  }

  test("rowsEqual composes over common fields only") {
    val s = StructType(Seq(StructField("a", LongType), StructField("b", StringType),
      StructField("srcOnly", StringType)))
    val t = StructType(Seq(StructField("a", LongType), StructField("b", StringType)))
    val df = Seq((1L, "x", "ignored", 1L, "x")).toDF("sa", "sb", "sonly", "ta", "tb")
    val eq = Comparer.rowsEqual(s, t,
      n => col(if (n == "a") "sa" else if (n == "b") "sb" else "sonly"),
      n => col(if (n == "a") "ta" else "tb"))
    assert(df.select(eq.as("r")).head().getBoolean(0))
  }

  test("diffFields reports only differing fields with stringified values") {
    val sch = StructType(Seq(StructField("a", LongType), StructField("b", StringType)))
    val df = Seq((1L, "x", 1L, "y")).toDF("sa", "sb", "ta", "tb")
    val diffs = Comparer.diffFields(sch, sch,
      n => col("s" + n), n => col("t" + n))
    val got = df.select(explode(diffs).as("d")).select("d.field", "d.src_value", "d.tgt_value")
      .as[(String, String, String)].collect()
    assert(got.toSeq == Seq(("b", "x", "y")))
  }
}
