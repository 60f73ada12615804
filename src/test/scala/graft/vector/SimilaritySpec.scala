package graft.vector

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  test("dot / norm / cosine basics") {
    val r = spark.range(1).select(
      Similarity.dot(typedLit(Seq(1.0, 2.0)), typedLit(Seq(3.0, 4.0))).as("d"),
      Similarity.norm(typedLit(Seq(3.0, 4.0))).as("n"),
      Similarity.cosine(typedLit(Seq(1.0, 0.0)), typedLit(Seq(1.0, 0.0))).as("c")).head()
    assert(r.getDouble(0) == 11.0 && r.getDouble(1) == 5.0 && r.getDouble(2) == 1.0)
  }

  test("brute-force top-k: self is rank 1 with cosine 1.0; k respected") {
    val emb = Tables.embeddings(spark, sf)
    val q = emb.filter($"vec_id" === 0)
      .select($"embedding".cast("array<double>")).head().getSeq[Double](0)
    val top = Similarity.cosineTopK(emb, "vec_id", "embedding", q, 5).collect()
    assert(top.length == 5)
    assert(top.head.getLong(0) == 0L && top.head.getDouble(1) == 1.0)
    val sims = top.map(_.getDouble(1)).toSeq
    assert(sims == sims.sorted.reverse, "descending order")
  }

  test("LSH ANN: self-bucket probe finds the query vector itself") {
    val emb = Tables.embeddings(spark, sf)
    val q = emb.filter($"vec_id" === 0)
      .select($"embedding".cast("array<double>")).head().getSeq[Double](0)
    val idx = Similarity.lshIndex(emb, "vec_id", "embedding", nPlanes = 8, dim = q.length)
    val ann = Similarity.annTopK(idx, "vec_id", "embedding", q, 5, nPlanes = 8)
      .collect()
    assert(ann.nonEmpty && ann.head.getLong(0) == 0L && ann.head.getDouble(1) == 1.0)
  }

  test("LSH ANN recall vs brute force is substantial on self+probe buckets") {
    val emb = Tables.embeddings(spark, sf)
    val q = emb.filter($"vec_id" === 7)
      .select($"embedding".cast("array<double>")).head().getSeq[Double](0)
    val exact = Similarity.cosineTopK(emb, "vec_id", "embedding", q, 10)
      .select("vec_id").as[Long].collect().toSet
    // 2 planes → 4 buckets; multiprobe covers the query bucket + both
    // 1-bit neighbors = 3/4 of the space, so recall should be high even
    // on uniform synthetic vectors (which are LSH's worst case)
    val idx = Similarity.lshIndex(emb, "vec_id", "embedding", nPlanes = 2, dim = q.length)
    val ann = Similarity.annTopK(idx, "vec_id", "embedding", q, 10, nPlanes = 2)
      .select("vec_id").as[Long].collect().toSet
    val recall = (exact & ann).size.toDouble / exact.size
    assert(recall >= 0.5, s"recall $recall too low for 2-plane multiprobe")
  }

  test("hyperplanes are deterministic across calls (index/query agreement)") {
    assert(Similarity.hyperplanes(4, 8, 42L) == Similarity.hyperplanes(4, 8, 42L))
    assert(Similarity.hyperplanes(4, 8, 42L) != Similarity.hyperplanes(4, 8, 43L))
  }

  test("exact near-duplicate pairs: complete vs naive all-pairs, each pair once") {
    val emb = Tables.embeddings(spark, sf)
    val got = Similarity.exactNearDuplicatePairs(emb, "vec_id", "embedding",
      threshold = 0.35, blocks = 5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSeq
    assert(got.distinct.size == got.size, "block join emitted a pair twice")
    assert(got.forall(p => p._1 < p._2))
    // naive reference: unpruned self-join
    val e = emb.select($"vec_id", $"embedding".cast("array<double>").as("emb"))
    val expected = e.toDF("id_a", "emb_a")
      .crossJoin(e.toDF("id_b", "emb_b"))
      .filter($"id_a" < $"id_b")
      .filter(round(Similarity.cosine($"emb_a", $"emb_b"), 6) >= 0.35)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSeq
    assert(got.toSet == expected.toSet,
      s"exact block join missed/extra pairs: got ${got.size}, want ${expected.size}")
  }

  test("sizeBlocks: task-budget formula, clamped to [2, maxBlocks]") {
    // tiny corpora still split the diagonal
    assert(Similarity.sizeBlocks(0L, 576L) == 2)
    assert(Similarity.sizeBlocks(1000L, 576L) == 2)
    // the formula: ceil(2*N*rowBytes / budget)
    assert(Similarity.sizeBlocks(1000000L, 576L,
      taskBudgetBytes = 256L * 1024 * 1024) ==
      math.ceil(2.0 * 1000000L * 576L / (256L * 1024 * 1024)).toInt)
    // monotone in N; capped at maxBlocks for planet-scale inputs
    assert(Similarity.sizeBlocks(100000000L, 576L) >
      Similarity.sizeBlocks(1000000L, 576L))
    assert(Similarity.sizeBlocks(Long.MaxValue / 1000, 576L) == 4096)
    assert(Similarity.sizeBlocks(Long.MaxValue / 1000, 576L, maxBlocks = 64) == 64)
  }

  test("exact near-dup auto-sized blocks produce identical pairs to explicit") {
    val emb = Tables.embeddings(spark, sf)
    val auto = Similarity.exactNearDuplicatePairs(emb, "vec_id", "embedding",
      threshold = 0.35) // blocks unset → sized from count + dim probe
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val explicit = Similarity.exactNearDuplicatePairs(emb, "vec_id", "embedding",
      threshold = 0.35, blocks = 5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(auto == explicit)
  }

  test("banded LSH near-dup: full recall on high-similarity clusters, prunes the rest") {
    import scala.util.Random
    // synthetic: 40 base vectors, each with a near-copy at cosine ≈ 0.99,
    // plus 200 unrelated vectors (the high-sim regime banding is FOR;
    // the embeddings table's 0.35-threshold pairs are exercised by the
    // exact-join test above)
    val rnd = new Random(7)
    def unit(v: Array[Double]) = {
      val n = math.sqrt(v.map(x => x * x).sum); v.map(_ / n)
    }
    val rows = (0 until 40).flatMap { i =>
      val base = unit(Array.fill(64)(rnd.nextGaussian()))
      val noisy = unit(base.zip(Array.fill(64)(rnd.nextGaussian() * 0.05))
        .map { case (x, e) => x + e })
      Seq((i.toLong * 2, base.toSeq), (i.toLong * 2 + 1, noisy.toSeq))
    } ++ (0 until 200).map(i => ((1000 + i).toLong, unit(Array.fill(64)(rnd.nextGaussian())).toSeq))
    val df = rows.toDF("vec_id", "embedding")
    val got = Similarity.bandedNearDuplicatePairs(df, "vec_id", "embedding",
      threshold = 0.9, bands = 16, rowsPerBand = 8)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val expected = Similarity.exactNearDuplicatePairs(df, "vec_id", "embedding",
      threshold = 0.9, blocks = 4)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(expected.size >= 35, s"test data should contain ≥35 true pairs, got ${expected.size}")
    assert(got == expected, s"banded recall ${ (got & expected).size}/${expected.size}")
  }

  test("hardNegatives: near-dup ceiling excludes twins, floor keeps zero, self out") {
    import org.apache.spark.sql.functions.col
    val emb = Seq(
      (0L, Seq(1f, 0f)),   // the query
      (1L, Seq(1f, 0f)),   // exact twin: cos 1.0 > 0.95 ceiling → OUT
      (2L, Seq(0.8f, 0.6f)), // cos 0.8 → rank 1
      (3L, Seq(0f, 1f)),   // cos 0.0 → inclusive floor keeps it, rank 2
      (4L, Seq(-1f, 0f)))  // cos −1 → below floor → OUT
      .toDF("vec_id", "embedding")
    val got = Similarity.hardNegatives(emb, "vec_id", "embedding",
        col("vec_id") === 0, k = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSeq
    assert(got == Seq((0L, 2L, 1L, 0.8), (0L, 3L, 2L, 0.0)))
  }

  test("sourceDispersion: sampled pairs per source, unsampled/single excluded") {
    val emb = Seq(
      (0L, Seq(1.0f, 0.0f)),   // X, sampled
      (4L, Seq(1.0f, 0.0f)),   // X, sampled (twin of 0)
      (8L, Seq(0.0f, 1.0f)),   // X, sampled (orthogonal)
      (5L, Seq(1.0f, 1.0f)),   // X, NOT sampled (5 % 4 != 0)
      (12L, Seq(1.0f, 0.0f)))  // Y, sampled but alone -> absent
      .toDF("vec_id", "embedding")
    val docs = Seq((0L, "X"), (4L, "X"), (8L, "X"), (5L, "X"), (12L, "Y"))
      .toDF("doc_id", "source")
    val got = Similarity.sourceDispersion(emb, "vec_id", "embedding",
        docs, "doc_id", "source")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    // pairs (0,4)=1.0, (0,8)=0.0, (4,8)=0.0 -> mean floor(1e6/3)
    assert(got == Seq(("X", 3L, 333333L)))
  }
}
