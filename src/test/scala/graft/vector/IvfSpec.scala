package graft.vector

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class IvfSpec extends SparkSpec {
  import spark.implicits._

  test("IVF: self found at cosine 1.0; nProbe=k degenerates to exact") {
    val emb = Tables.embeddings(spark, sf)
    val q = emb.filter($"vec_id" === 3)
      .select($"embedding".cast("array<double>")).head().getSeq[Double](0)
    val (model, index) = Ivf.buildIndex(emb, "vec_id", "embedding", k = 4)
    assert(model.centroids.length == 4)
    // full probe == brute force
    val full = Ivf.annTopK(model, index, "vec_id", "embedding", q, 10, nProbe = 4)
      .select("vec_id").as[Long].collect().toSeq
    val brute = Similarity.cosineTopK(emb, "vec_id", "embedding", q, 10)
      .select("vec_id").as[Long].collect().toSeq
    assert(full == brute)
    // narrow probe still finds the query vector itself first
    val narrow = Ivf.annTopK(model, index, "vec_id", "embedding", q, 5, nProbe = 1)
      .collect()
    assert(narrow.head.getLong(0) == 3L && narrow.head.getDouble(1) == 1.0)
  }

  test("k-means fit input is bounded by fitCap; index still covers all rows") {
    val emb = Tables.embeddings(spark, sf)
    val feat = emb.select($"vec_id", $"embedding")
      .withColumn("features",
        org.apache.spark.ml.functions.array_to_vector($"embedding"))
    val sampled = Ivf.fitSample(feat, fitCap = 100, seed = 42L).count()
    assert(sampled <= 150, s"fit sample $sampled not bounded by cap 100")
    val (model, index) = Ivf.buildIndex(emb, "vec_id", "embedding", k = 4,
      fitCap = 100)
    assert(model.centroids.length == 4)
    assert(index.count() == emb.count(), "assignment must cover the FULL table")
  }

  test("fixed-centroid quantizer: every row assigned, ties deterministic, probe finds self") {
    val emb = Tables.embeddings(spark, sf)
    val cents = emb.filter($"vec_id" < 8).orderBy($"vec_id")
      .select($"embedding".cast("array<double>"))
      .collect().map(_.getSeq[Double](0).toSeq).toSeq
    val index = Ivf.fixedCentroidIndex(emb, "vec_id", "embedding", cents)
    val cellStats = index.groupBy("cell").count().as[(Int, Long)].collect().toMap
    assert(cellStats.keySet.subsetOf((0 until 8).toSet))
    assert(cellStats.values.sum == emb.count())
    // a centroid's own vector lands in its own cell (cosine 1.0 beats all)
    val own = index.filter($"vec_id" === 2).select("cell").as[Int].head()
    assert(own == 2)
    // probing the query's own cells returns the query itself first
    val q = cents(1)
    val cells = Ivf.nearestCentroidCells(cents, q, nProbe = 2)
    assert(cells.head == 1)
    val top = Ivf.annTopKCells(index, "vec_id", "embedding", q, 5, cells).collect()
    assert(top.head.getLong(0) == 1L && top.head.getDouble(1) == 1.0)
  }

  test("index build is deterministic under the seed") {
    val emb = Tables.embeddings(spark, sf)
    val (_, i1) = Ivf.buildIndex(emb, "vec_id", "embedding", k = 3)
    val (_, i2) = Ivf.buildIndex(emb, "vec_id", "embedding", k = 3)
    val a1 = i1.select("vec_id", "cell").as[(Long, Int)].collect().toMap
    val a2 = i2.select("vec_id", "cell").as[(Long, Int)].collect().toMap
    assert(a1 == a2)
  }

  test("annRecall: boundary query loses cross-cell neighbors at nProbe 1, " +
      "probing every cell equals brute") {
    // two obvious cells; the query sits just on cell 0's side of the
    // boundary while two of its three true neighbors live in cell 1
    val vecs = Seq(
      (0L, Seq(0.71f, 0.70f)), // the query (cell 0 by a whisker)
      (1L, Seq(1.0f, 0.0f)), (2L, Seq(0.95f, 0.31f)), // cell 0
      (3L, Seq(0.70f, 0.714f)), (4L, Seq(0.6f, 0.8f)),
      (5L, Seq(0.0f, 1.0f))) // cell 1
      .toDF("vec_id", "embedding")
    val cents = Seq(Seq(1.0, 0.0), Seq(0.0, 1.0))
    def recall(nProbe: Int) = Ivf.annRecall(vecs, "vec_id", "embedding",
        col("vec_id") === 0, cents, nProbe, k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // self EXCLUDED from both arms: brute top-3 = {3, 4, 2}; cell 0
    // offers only {1, 2} → one hit (2), recall ⌊10⁶/3⌋ — no self-hit
    // floor padding the statistic
    assert(recall(1) == Seq((0L, 1L, 333333L)))
    // probing both cells IS brute force
    assert(recall(2) == Seq((0L, 3L, 1000000L)))
  }
}
