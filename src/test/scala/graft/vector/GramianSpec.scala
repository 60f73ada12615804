package graft.vector

import graft.SparkSpec
import org.apache.spark.sql.functions._

class GramianSpec extends SparkSpec {
  import spark.implicits._

  private val vecs = Seq(
    (1L, Seq(1.0f, 0.5f, -0.25f)),
    (2L, Seq(0.0f, 2.0f, 1.0f)),
    (3L, Seq(-1.0f, 0.0f, 0.5f)))

  private def localGramFp: Map[(Int, Int), Long] = {
    val fp = vecs.map(_._2.map(x => math.floor(x.toDouble * 1e6).toLong))
    (for {
      i <- 0 until 3; j <- i until 3
    } yield (i + 1, j + 1) -> fp.map(v => v(i) * v(j)).sum).toMap
  }

  test("gramianFp matches the locally computed upper triangle") {
    val df = vecs.toDF("vec_id", "embedding")
    val got = Gramian.gramianFp(df, "embedding")
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(got == localGramFp)
  }

  test("gramianFp is flush-boundary invariant (partials are exact partial sums)") {
    val df = vecs.toDF("vec_id", "embedding").repartition(2)
    val a = Gramian.gramianFp(df, "embedding", flushEvery = 1)
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(a == localGramFp)
  }

  test("gram column is gram_fp / 1e12") {
    val r = Gramian.gramianFp(vecs.toDF("vec_id", "embedding"), "embedding")
      .filter(col("dim_i") === 1 && col("dim_j") === 1).head()
    assert(r.getDouble(3) == r.getLong(2).toDouble / 1.0e12)
  }

  test("powerIterationStep equals the local mirrored matrix-vector product") {
    val gram = Gramian.gramianFp(vecs.toDF("vec_id", "embedding"), "embedding")
    val v = Seq(1000000L, -500000L, 250000L) // micros
    val got = Gramian.powerIterationStep(gram, v)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val g = localGramFp
    def at(i: Int, j: Int): Long = if (i <= j) g((i, j)) else g((j, i))
    val want = (1 to 3).map { i =>
      val s = (1 to 3).map(j => BigInt(at(i, j)) * BigInt(v(j - 1))).sum
      // floor division by 10^12 (exact decimal path in the engine)
      val den = BigInt(10).pow(12)
      val fl = (s - s.mod(den)) / den
      i -> fl.toLong
    }.toMap
    assert(got == want)
  }

  test("momentsFp matches the locally computed Xᵀy, any partitioning") {
    val labeled = vecs.zip(Seq(2.0, -1.0, 0.5))
      .map { case ((id, v), y) => (id, v, y) }
    val df = labeled.toDF("vec_id", "embedding", "label")
    val want = (0 until 3).map { i =>
      (i + 1) -> labeled.map { case (_, v, y) =>
        math.floor(v(i).toDouble * 1e6).toLong * math.floor(y * 1e6).toLong
      }.sum
    }.toMap
    for (parts <- Seq(1, 3)) {
      val got = Gramian.momentsFp(df.repartition(parts), "embedding", "label")
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      assert(got == want, s"mismatch at $parts partitions")
    }
  }

  test("momentsFp: per-row products past 2^63 do not wrap (decimal widening)") {
    // xf·yf = 1e6 · 9.3e12 = 9.3e18 > Long.MaxValue (~9.22e18): a
    // long×long product would wrap silently; the DECIMAL(38,0)
    // widening keeps each product — and the cross-sign sum — exact
    val df = Seq(
      (1L, Seq(1.0f), 9300000.0), // product +9.3e18
      (2L, Seq(1.0f), -9200000.0) // product -9.2e18; sum 1e17 fits long
    ).toDF("vec_id", "embedding", "label")
    val want = (BigInt(1000000L) * BigInt(9300000000000L) +
      BigInt(1000000L) * BigInt(-9200000000000L)).toLong
    assert(want == 100000000000000000L)
    for (parts <- Seq(1, 2)) {
      val got = Gramian.momentsFp(df.repartition(parts), "embedding", "label")
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      assert(got == Map(1 -> want), s"mismatch at $parts partitions")
    }
  }

  test("dimStatsFp: exact per-dim count/sum/sum-of-squares, any partitioning") {
    val df = vecs.toDF("vec_id", "embedding")
    val want = (0 until 3).map { i =>
      val xs = vecs.map { case (_, v) =>
        math.floor(v(i).toDouble * 1e6).toLong
      }
      (i + 1, xs.size.toLong, xs.sum,
        xs.map(x => BigInt(x) * BigInt(x)).sum.toString)
    }
    for (parts <- Seq(1, 3)) {
      val got = Gramian.dimStatsFp(df.repartition(parts), "embedding")
        .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
          r.getDecimal(3).toBigInteger.toString))
      assert(got.toSeq == want, s"mismatch at $parts partitions")
    }
  }

  test("powerIteration equals an exact BigInt replay of the same algorithm") {
    val df = vecs.toDF("vec_id", "embedding")
    val gram = Gramian.gramianFp(df, "embedding")
    // local replay: mirrored gram·v with nonneg-remainder floor by 1e12,
    // then integer renormalization — exactly the engine's contract
    def replay(iters: Int): Seq[Long] = {
      val g = localGramFp
      def cell(i: Int, j: Int): BigInt =
        BigInt(g.getOrElse((math.min(i, j), math.max(i, j)), 0L))
      var v: Seq[Long] = (1 to 3).map(j => 1000000L + j)
      val m = BigInt("1000000000000")
      for (_ <- 1 to iters) {
        val raw = (1 to 3).map { i =>
          val s = (1 to 3).map(j => cell(i, j) * BigInt(v(j - 1))).sum
          ((s - ((s % m + m) % m)) / m).toLong
        }
        val scale = math.max(raw.map(math.abs).max / 1000000L, 1L)
        v = raw.map(x => Math.floorDiv(x, scale))
      }
      v
    }
    for (iters <- Seq(1, 3, 5)) {
      val got = Gramian.powerIteration(gram, d = 3, iterations = iters)
      assert(got == replay(iters), s"divergence at $iters iterations")
      // renormalization keeps the iterate in the micro frame
      assert(got.map(math.abs).max >= 500000L &&
        got.map(math.abs).max <= 2000000L, s"scale drifted: $got")
    }
    // the fixture's spectrum peaks on dim 2 (G22 = 4.25 dominates) —
    // the iterate must point there
    val v5 = Gramian.powerIteration(gram, d = 3, iterations = 5)
    assert(v5.map(math.abs).zipWithIndex.maxBy(_._1)._2 == 1,
      s"dominant component must be dim 2: $v5")
  }

  test("projectFp matches local BigInt dot, flooring negative sums") {
    val v = Seq(2000000L, -3000001L) // non-multiple lane forces flooring
    val fixtures = Seq(
      (1L, Seq(1.0f, 0.5f)),  // dot = 2e12 − 1500000500000 → floor 499999
      (2L, Seq(-1.0f, 0.0f)), // dot = −2e12 → −2000000 exact
      (3L, Seq(0.0f, 0.1f)))  // xf = 100000 (0.1f rounds UP in float);
                              // dot = −300000100000 → floor −300001
    val got = Gramian.projectFp(fixtures.toDF("vec_id", "embedding"),
        "vec_id", "embedding", v)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def local(emb: Seq[Float]): Long = {
      val dot = emb.zip(v).map { case (x, w) =>
        BigInt(math.floor(x.toDouble * 1e6).toLong) * BigInt(w)
      }.sum
      val m = BigInt(1000000)
      ((dot - ((dot % m + m) % m)) / m).toLong
    }
    assert(got == fixtures.map { case (id, e) => id -> local(e) }.toMap)
    assert(got(1L) == 499999L)
    assert(got(2L) == -2000000L)
    assert(got(3L) == -300001L) // negative non-multiple floors DOWN
  }

  test("ridgeSolve recovers generating weights from gramian + moments (λ=0)") {
    // y = X·w exactly, well-conditioned X → normal equations return w
    val w = Array(0.5, -1.25, 2.0)
    val xs = Seq(
      Seq(1.0f, 0.0f, 0.0f), Seq(0.0f, 1.0f, 0.0f), Seq(0.0f, 0.0f, 1.0f),
      Seq(1.0f, 1.0f, 0.0f), Seq(0.0f, 1.0f, 1.0f), Seq(1.0f, 0.5f, -0.5f))
    val rows = xs.zipWithIndex.map { case (x, i) =>
      val y = x.zip(w).map { case (xi, wi) => xi * wi }.sum
      (i.toLong, x, y)
    }
    val df = rows.toDF("vec_id", "embedding", "label")
    val gram = Gramian.gramianFp(df, "embedding")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getDouble(3))).toSeq
    val mom = Gramian.momentsFp(df, "embedding", "label")
      .collect().map(r => (r.getInt(0), r.getDouble(2))).toSeq
    val got = Gramian.ridgeSolve(gram, mom, lambda = 0.0)
    got.zip(w).foreach { case (g, e) =>
      assert(math.abs(g - e) < 1e-4, s"got ${got.toSeq}, want ${w.toSeq}")
    }
  }

  test("ridgeSolve: λ shrinks the solution; singular system without λ fails loudly") {
    // duplicate-direction data: XᵀX is rank-1 → λ=0 must refuse,
    // λ>0 must return the (unique) regularized solution
    val xs = Seq(Seq(1.0f, 1.0f), Seq(2.0f, 2.0f), Seq(3.0f, 3.0f))
    val rows = xs.zipWithIndex.map { case (x, i) => (i.toLong, x, x.head * 2.0) }
    val df = rows.toDF("vec_id", "embedding", "label")
    val gram = Gramian.gramianFp(df, "embedding")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getDouble(3))).toSeq
    val mom = Gramian.momentsFp(df, "embedding", "label")
      .collect().map(r => (r.getInt(0), r.getDouble(2))).toSeq
    intercept[IllegalArgumentException] {
      Gramian.ridgeSolve(gram, mom, lambda = 0.0)
    }
    val wr = Gramian.ridgeSolve(gram, mom, lambda = 1.0)
    // symmetric data → symmetric weights, and the fit direction is
    // positive (y grows with x)
    assert(math.abs(wr(0) - wr(1)) < 1e-9 && wr(0) > 0.0)
  }

  test("gramian plan: partial rows feed one hash aggregation") {
    val df = vecs.toDF("vec_id", "embedding")
    val p = Gramian.gramianFp(df, "embedding")
      .queryExecution.executedPlan.toString()
    // one aggregation on (dim_i, dim_j) partials; never a per-row shuffle
    // of the embedding payload before the partial gramian
    assert(p.contains("HashAggregate"))
  }
}
