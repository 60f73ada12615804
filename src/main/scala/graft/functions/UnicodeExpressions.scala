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

object StripKernels {
  /** Length of the strippable byte run starting at `i`, or 0.
    * Strippable: C0 controls except TAB/LF/CR, DEL, and the zero-width
    * code points U+200B..U+200D (`E2 80 8B..8D`) and U+FEFF
    * (`EF BB BF`). UTF-8 lead/continuation ranges are disjoint, so the
    * 3-byte matches can never start inside another code point. */
  private def runLen(b: Array[Byte], i: Int): Int = {
    val c = b(i) & 0xFF
    if (c < 0x20) {
      if (c == 0x09 || c == 0x0A || c == 0x0D) 0 else 1
    } else if (c == 0x7F) 1
    else if (c == 0xE2 && i + 2 < b.length && (b(i + 1) & 0xFF) == 0x80 && {
      val t = b(i + 2) & 0xFF; t >= 0x8B && t <= 0x8D }) 3
    else if (c == 0xEF && i + 2 < b.length && (b(i + 1) & 0xFF) == 0xBB &&
      (b(i + 2) & 0xFF) == 0xBF) 3
    else 0
  }

  /** Remove control/zero-width bytes. Fast path: a clean string is
    * detected in one scan and returned as-is, no allocation. */
  def strip(s: UTF8String): UTF8String = {
    val b = s.getBytes
    var i = 0
    var found = false
    while (i < b.length && !found) {
      val r = runLen(b, i)
      if (r > 0) found = true else i += 1
    }
    if (!found) return s
    val out = new Array[Byte](b.length)
    var n = 0
    i = 0
    while (i < b.length) {
      val r = runLen(b, i)
      if (r > 0) i += r
      else { out(n) = b(i); n += 1; i += 1 }
    }
    UTF8String.fromBytes(out, 0, n)
  }
}

/** Control/zero-width scrub as a native codegen expression — removes
  * the characters that corrupt exact dedup and tokenization without
  * being visible: C0 controls (except tab/newline/CR), DEL, zero-width
  * space/joiner/non-joiner (U+200B–U+200D), and the BOM/zero-width
  * no-break space (U+FEFF). One byte-level pass, no regex engine, no
  * java.lang.String round-trip; clean strings return unchanged with no
  * allocation. NULL in → NULL out. The oracle replays it through
  * DuckDB's RE2 `regexp_replace` over the same character class. */
case class StripControl(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "strip_control"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"strip_control expects string, got ${child.dataType.simpleString}")

  override def nullSafeEval(input: Any): Any =
    StripKernels.strip(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.StripKernels.strip($c)")

  override protected def withNewChildInternal(newChild: Expression): StripControl =
    copy(child = newChild)
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

  def stripControl(c: Column): Column = toColumn(StripControl(toExpr(c)))
}
