package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Cross-engine-computable text hashes.
  *
  * xxhash64/murmur3 are Spark-specific, which makes any operator that
  * EMITS hash-derived values (simhash sketches, winnowing fingerprints)
  * unverifiable by an external oracle. These kernels use a polynomial
  * rolling hash over Unicode code points — integer arithmetic any SQL
  * engine reproduces exactly:
  *
  *   h_B(s) = fold(cp → acc·B + cp mod 2³¹−1)   over code points of s
  *   combined62(s) = h_257(s) + (h_263(s) << 31)   ∈ [0, 2⁶²)
  *
  * (two independent bases; 62 bits keeps the value a non-negative
  * BIGINT in engines without unsigned 64-bit). This is also the hash
  * family the winnowing paper itself assumes — per-k-gram rolling
  * hashes — rather than a black-box 64-bit mixer.
  */
object TextHashes {
  final val Mod: Long = 2147483647L // 2^31 − 1
  final val BaseA: Long = 257L
  final val BaseB: Long = 263L

  /** h_B over code points (exact integer arithmetic, no overflow:
    * acc < 2³¹, acc·263 + cp < 2⁴⁰). */
  def poly(s: UTF8String, base: Long): Long = {
    val str = s.toString
    var acc = 0L
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      acc = (acc * base + cp) % Mod
      i += Character.charCount(cp)
    }
    acc
  }

  def combined62(s: UTF8String): Long = {
    // both bases folded in ONE pass over one materialized string (this
    // runs per token in the sketch hot path)
    val str = s.toString
    var a = 0L
    var b = 0L
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      a = (a * BaseA + cp) % Mod
      b = (b * BaseB + cp) % Mod
      i += Character.charCount(cp)
    }
    a + (b << 31)
  }

  /** 62-bit SimHash over a token array: per-token combined62 hash,
    * per-bit ±1 vote with multiplicity, bit set iff vote > 0. */
  def simhash(tokens: ArrayData): Long = {
    val votes = new Array[Int](62)
    val n = tokens.numElements()
    var t = 0
    while (t < n) {
      if (!tokens.isNullAt(t)) {
        val h = combined62(tokens.getUTF8String(t))
        var i = 0
        while (i < 62) {
          if (((h >>> i) & 1L) == 1L) votes(i) += 1 else votes(i) -= 1
          i += 1
        }
      }
      t += 1
    }
    var sh = 0L
    var i = 0
    while (i < 62) {
      if (votes(i) > 0) sh |= 1L << i
      i += 1
    }
    sh
  }
}

/** combined62(string) as a Catalyst expression (usable inside
  * higher-order-function lambdas, e.g. `transform(grams, g => ...)`). */
case class PolyHash62(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "poly_hash62"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"poly_hash62 expects string, got ${child.dataType.simpleString}")

  override def nullSafeEval(input: Any): Any =
    TextHashes.combined62(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHashes.combined62($c)")

  override protected def withNewChildInternal(newChild: Expression): PolyHash62 =
    copy(child = newChild)
}

/** 62-bit SimHash of an array<string> token column — one fused loop
  * (tokens × 62 bit-votes) instead of the interpreted nested-HOF
  * formulation, and engine-reproducible per [[TextHashes]]. */
case class SimHash62(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash62"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash62 expects array<string>, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    TextHashes.simhash(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHashes.simhash($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash62 =
    copy(child = newChild)
}

object TextHashExpressions {
  import org.apache.spark.sql.GraftColumnBridge.{toColumn, toExpr}

  def polyHash62(c: Column): Column = toColumn(PolyHash62(toExpr(c)))
  def simhash62(tokens: Column): Column = toColumn(SimHash62(toExpr(tokens)))
}
