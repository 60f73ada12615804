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

  test("index build is deterministic under the seed") {
    val emb = Tables.embeddings(spark, sf)
    val (_, i1) = Ivf.buildIndex(emb, "vec_id", "embedding", k = 3)
    val (_, i2) = Ivf.buildIndex(emb, "vec_id", "embedding", k = 3)
    val a1 = i1.select("vec_id", "cell").as[(Long, Int)].collect().toMap
    val a2 = i2.select("vec_id", "cell").as[(Long, Int)].collect().toMap
    assert(a1 == a2)
  }
}
