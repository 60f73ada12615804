package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Kernel behind [[NfcNormalize]] — one static entry point shared by
  * interpreted eval and generated code, so the two paths cannot
  * diverge. */
object UnicodeKernels {
  /** NFC-normalize a UTF8String. Fast path: `Normalizer.isNormalized`
    * is a cheap scan (quick-check properties) that avoids BOTH the
    * java.lang.String round-trip and the re-encode for the
    * overwhelmingly-common already-normalized document — the kernel's
    * cost on clean corpora is one quick-check pass, no allocation. */
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str,
        java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}

/** Unicode NFC normalization as a native codegen expression — the
  * curation scrub that makes canonically-equivalent text BYTE-equal
  * (composed `é` vs `e` + COMBINING ACUTE), so exact dedup, shingle
  * hashes, and phrase audits stop seeing two spellings of the same
  * document as different. Spark ships no normalization builtin; a Scala
  * UDF would break whole-stage codegen on the hottest column in the
  * funnel — this fuses like the [[PolyHash62]] family. NULL in → NULL
  * out. The oracle replays it through DuckDB's `nfc_normalize`. */
case class NfcNormalize(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"nfc_normalize expects string, got ${child.dataType.simpleString}")

  override def nullSafeEval(input: Any): Any =
    UnicodeKernels.nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.UnicodeKernels.nfc($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object UnicodeExpressions {
  import org.apache.spark.sql.GraftColumnBridge.{toColumn, toExpr}

  def nfcNormalize(c: Column): Column = toColumn(NfcNormalize(toExpr(c)))
}
