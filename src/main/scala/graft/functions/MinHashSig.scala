package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** MinHash signature kernel: for each of `numHashes` seeds s, the
  * minimum over the input shingle hashes h of xxhash64(s, h).
  *
  * Bit-identical to the HOF formulation
  * `aggregate(hashes, [MaxValue]*, (acc,h) => zip_with(acc, mix(h), least))`
  * with mix replicating Spark's `xxhash64(lit(s), h)` fold exactly:
  * XXH64.hashLong(h, XXH64.hashInt(s, 42)). The HOF form is interpreted
  * per (shingle × seed) — 32 Catalyst node evaluations per shingle was
  * ~18% of the whole benchmark; this is one fused loop with the
  * loop-invariant per-seed inner hash precomputed. */
case class MinHashSig(child: Expression, numHashes: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig expects array<bigint>, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(
      MinHashSig.compute(input.asInstanceOf[ArrayData], numHashes))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.functions.MinHashSig.compute($c, $numHashes))")

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object MinHashSig {

  /** Per-seed inner hashes XXH64.hashInt(s, 42) are input-independent;
    * cache per signature width. */
  private val seedCache =
    new java.util.concurrent.ConcurrentHashMap[Int, Array[Long]]()

  private def seeds(numHashes: Int): Array[Long] =
    seedCache.computeIfAbsent(numHashes, n =>
      Array.tabulate(n)(s => XXH64.hashInt(s, 42L)))

  def compute(hashes: ArrayData, numHashes: Int): Array[Long] = {
    val sd = seeds(numHashes)
    val acc = Array.fill(numHashes)(Long.MaxValue)
    val n = hashes.numElements()
    var i = 0
    while (i < n) {
      // null element: Spark's xxhash64 skips null children, so
      // xxhash64(lit(s), null) is the accumulated seed hash itself —
      // replicated here to stay bit-compatible with the HOF form
      val isNull = hashes.isNullAt(i)
      val h = if (isNull) 0L else hashes.getLong(i)
      var s = 0
      while (s < numHashes) {
        val m = if (isNull) sd(s) else XXH64.hashLong(h, sd(s))
        if (m < acc(s)) acc(s) = m
        s += 1
      }
      i += 1
    }
    acc
  }

  def minhashSig(hashes: Column, numHashes: Int): Column = {
    import org.apache.spark.sql.GraftColumnBridge.{toColumn, toExpr}
    toColumn(MinHashSig(toExpr(hashes), numHashes))
  }
}
