package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** `might_contain_long(h)`: probabilistic membership of a 64-bit hash in
  * a pre-built [[BloomFilter]] — the scan-local prefilter that lets a
  * new ingest batch test itself against a HISTORY corpus without
  * joining it (see [[graft.text.Dedup.dedupAgainstHistory]]).
  *
  * The filter rides inside the expression (Java-serializable, one copy
  * per plan ship, referenced via `addReferenceObj` in codegen — the
  * same transport Spark's injected runtime bloom filters use), so the
  * membership test stays inside whole-stage codegen: no UDF, no
  * per-row boxing. May return false positives at the filter's
  * configured fpp, NEVER false negatives — callers that need exactness
  * follow with an exact confirm join on the survivors. */
case class BloomMightContainLong(child: Expression, bloom: BloomFilter)
    extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "might_contain_long"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"might_contain_long expects bigint, got ${other.simpleString}")
  }

  override def nullSafeEval(h: Any): Any =
    bloom.mightContainLong(h.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomFilter", bloom,
      classOf[BloomFilter].getName)
    defineCodeGen(ctx, ev, c => s"$ref.mightContainLong($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContainLong =
    copy(child = newChild)
}

object BloomExpressions {
  import org.apache.spark.sql.GraftColumnBridge.{toColumn, toExpr}

  def mightContainLong(h: Column, bloom: BloomFilter): Column =
    toColumn(BloomMightContainLong(toExpr(h), bloom))
}
