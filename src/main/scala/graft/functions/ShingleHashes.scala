package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** k-gram shingle hashes as one fused loop — bit-identical to the HOF
  * formulation previously in `graft.text.Dedup.shingleHashes`:
  *
  *   th(i)  = xxhash64(token_i)                  (seed 42)
  *   out(i) = xxhash64(th(i+1), ..., th(i+k))    (chained fold)
  *   short  = xxhash64(concat_ws(NUL, th))       (< k tokens: the
  *            NUL-joined decimal strings of the token hashes)
  *
  * The HOF version evaluates interpreted per (position x k) with an
  * expression-node dispatch per hash; this computes per-token hashes
  * once and slides the window in a tight loop. Values are unchanged, so
  * downstream joins, minhash signatures and oracles are unaffected
  * (equivalence pinned by TextSpec). */
/** `distinct = true` dedups INSIDE the kernel (sort + linear dedup per
  * row, order not preserved — callers treat the result as a set):
  * consumers needing set semantics then explode an already-unique array
  * instead of paying a corpus-wide `distinct()` SHUFFLE after the
  * explode — at scale that shuffle is the size of the exploded corpus. */
case class ShingleHashes(child: Expression, k: Int,
    distinct: Boolean = false) extends UnaryExpression {
  require(k >= 1, s"shingle size must be >= 1, got $k")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"shingle_hashes expects array<string>, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(
      ShingleHashes.compute(input.asInstanceOf[ArrayData], k, distinct))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.functions.ShingleHashes.compute($c, $k, $distinct))")

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}

object ShingleHashes {
  private final val Seed = 42L

  def compute(tokens: ArrayData, k: Int, distinct: Boolean): Array[Long] = {
    val raw = computeAll(tokens, k)
    if (!distinct || raw.length <= 1) raw
    else {
      java.util.Arrays.sort(raw)
      var w = 1
      var i = 1
      while (i < raw.length) {
        if (raw(i) != raw(w - 1)) { raw(w) = raw(i); w += 1 }
        i += 1
      }
      if (w == raw.length) raw else java.util.Arrays.copyOf(raw, w)
    }
  }

  private def computeAll(tokens: ArrayData, k: Int): Array[Long] = {
    val n = tokens.numElements()
    // per-token hashes once (xxhash64 skips null children -> bare seed)
    val th = new Array[Long](n)
    var i = 0
    while (i < n) {
      th(i) =
        if (tokens.isNullAt(i)) Seed
        else XXH64.hashUTF8String(tokens.getUTF8String(i), Seed)
      i += 1
    }
    if (n >= k) {
      val out = new Array[Long](n - k + 1)
      i = 0
      while (i <= n - k) {
        var acc = Seed
        var j = 0
        while (j < k) { acc = XXH64.hashLong(th(i + j), acc); j += 1 }
        out(i) = acc
        i += 1
      }
      out
    } else {
      // short doc, HOF parity: xxhash64 of the token-hash decimal
      // strings joined by the NUL separator
      val sb = new java.lang.StringBuilder
      i = 0
      while (i < n) {
        if (i > 0) sb.append('\u0000')
        sb.append(th(i))
        i += 1
      }
      Array(XXH64.hashUTF8String(UTF8String.fromString(sb.toString), Seed))
    }
  }

  def shingleHashes(tokens: Column, k: Int, distinct: Boolean = false): Column = {
    import org.apache.spark.sql.GraftColumnBridge.{toColumn, toExpr}
    toColumn(ShingleHashes(toExpr(tokens), k, distinct))
  }
}
