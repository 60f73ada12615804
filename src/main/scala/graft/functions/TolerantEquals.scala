package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{AbstractDataType, BooleanType, DataType, DoubleType}

/** Native Catalyst expression for the comparer's tolerant float equality
  * (reference semantics `comparer.py:265-267`; SURVEY §2.12 flags this as
  * the one kernel worth a custom Expression once codegen matters).
  *
  * Semantics — exactly the Column composition in
  * [[graft.compare.Comparer.valuesEqual]]:
  *   NULL ≈ NULL → true;  one NULL → false;  else |l − r| < tolerance.
  * Never null-valued itself, which is why this overrides `eval`/
  * `doGenCode` directly instead of using nullSafeEval (the default
  * TernaryExpression null handling would return NULL on NULL input).
  *
  * The generated code is three child evals + one branch-free boolean —
  * it fuses into the surrounding WholeStageCodegen, where the composed
  * five-node expression tree previously produced five codegen segments.
  */
case class TolerantEquals(left: Expression, right: Expression,
    tolerance: Expression) extends TernaryExpression {

  override def first: Expression = left
  override def second: Expression = right
  override def third: Expression = tolerance

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = false
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = children.forall(_.dataType == DoubleType)
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"tolerant_equals expects (double, double, double), got " +
        children.map(_.dataType.simpleString).mkString(", "))
  }

  override def eval(input: InternalRow): Any = {
    val l = left.eval(input)
    val r = right.eval(input)
    if (l == null && r == null) true
    else if (l == null || r == null) false
    else {
      val tol = tolerance.eval(input)
      tol != null &&
        math.abs(l.asInstanceOf[Double] - r.asInstanceOf[Double]) <
          tol.asInstanceOf[Double]
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val l = left.genCode(ctx)
    val r = right.genCode(ctx)
    val t = tolerance.genCode(ctx)
    val code =
      code"""
        |${l.code}
        |${r.code}
        |${t.code}
        |final boolean ${ev.value} =
        |  (${l.isNull} && ${r.isNull}) ||
        |  (!${l.isNull} && !${r.isNull} && !${t.isNull} &&
        |   java.lang.Math.abs(${l.value} - ${r.value}) < ${t.value});
      """.stripMargin
    ev.copy(code = code, isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): TolerantEquals =
    copy(left = newFirst, right = newSecond, tolerance = newThird)
}

object TolerantEquals {

  /** Column-level entry point. */
  def tolerantEquals(l: Column, r: Column, tolerance: Double): Column = {
    import org.apache.spark.sql.GraftColumnBridge.{toColumn, toExpr}
    toColumn(TolerantEquals(toExpr(l), toExpr(r),
      toExpr(org.apache.spark.sql.functions.lit(tolerance))))
  }

  /** Register `tolerant_equals(l, r, tol)` for SQL use; on a cluster this
    * lives in a SparkSessionExtensions (see [[GraftExtensions]]). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "tolerant_equals",
      exprs => TolerantEquals(exprs(0), exprs(1), exprs(2)),
      "scala_udf")
}

/** Session extension installing the engine's SQL functions:
  * `SparkSession.builder().withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.functions.GraftExtensions`. */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(e: org.apache.spark.sql.SparkSessionExtensions): Unit =
    e.injectFunction(
      (org.apache.spark.sql.catalyst.FunctionIdentifier("tolerant_equals"),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          classOf[TolerantEquals].getName, "tolerant_equals"),
        (exprs: Seq[Expression]) => TolerantEquals(exprs(0), exprs(1), exprs(2))))
}
