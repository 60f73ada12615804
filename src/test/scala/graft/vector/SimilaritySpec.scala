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

  test("near-duplicate pairs: symmetric-free (a<b), all above threshold") {
    val emb = Tables.embeddings(spark, sf)
    val pairs = Similarity.nearDuplicatePairs(emb, "vec_id", "embedding",
      threshold = 0.3, nPlanes = 4, dim = 64).collect()
    assert(pairs.forall(r => r.getLong(0) < r.getLong(1)))
    assert(pairs.forall(_.getDouble(2) >= 0.3))
  }
}
