package graft.vector

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class PqSpec extends SparkSpec {
  import spark.implicits._

  // M=2 subspaces of 2 dims; K=2 centroids each — small enough to check
  // every assignment by hand
  private val cb: Pq.Codebooks = Seq(
    Seq(Seq(0.0, 0.0), Seq(10.0, 10.0)),  // subspace 0 (dims 0-1)
    Seq(Seq(0.0, 5.0), Seq(0.0, -5.0)))   // subspace 1 (dims 2-3)

  test("encode: per-subspace argmin, ties to the lower index, columns carried") {
    val vecs = Seq(
      (1L, Seq(1.0, 1.0, 0.0, 4.0), "a"),   // sub0 → 0, sub1 → 0
      (2L, Seq(9.0, 9.0, 0.0, -4.0), "b"),  // sub0 → 1, sub1 → 1
      (3L, Seq(5.0, 5.0, 0.0, 0.0), "c")    // both EXACT ties → lower idx
    ).toDF("vec_id", "embedding", "tag")
    val codes = Pq.encode(vecs, "vec_id", "embedding", cb)
      .select($"vec_id", $"code", $"tag")
      .as[(Long, Seq[Int], String)].collect().map(r => r._1 -> r).toMap
    assert(codes(1L)._2 == Seq(0, 0))
    assert(codes(2L)._2 == Seq(1, 1))
    assert(codes(3L)._2 == Seq(0, 0), "ties must break to the lower index")
    assert(codes(3L)._3 == "c", "non-embedding columns must carry through")
  }

  test("ADC: exact on codebook-resident vectors, hand-checked otherwise") {
    // vectors sitting exactly on codebook points → ADC distance IS the
    // true squared L2 to the query (quantization error zero)
    val vecs = Seq(
      (1L, Seq(0.0, 0.0, 0.0, 5.0)),
      (2L, Seq(10.0, 10.0, 0.0, -5.0))).toDF("vec_id", "embedding")
    val codes = Pq.encode(vecs, "vec_id", "embedding", cb)
    val query = Seq(1.0, 0.0, 0.0, 5.0)
    val r = Pq.adcTopK(codes, "vec_id", cb, query, 2)
      .as[(Long, Double)].collect().toSeq
    // true d²(v1) = 1; d²(v2) = 81+100+0+100 = 281
    assert(r == Seq((1L, 1.0), (2L, 281.0)), s"got $r")
  }

  test("adcTable matches the encode-side fold arithmetic") {
    val t = Pq.adcTable(cb, Seq(1.0, 2.0, 0.0, 5.0))
    assert(t == Seq(Seq(5.0, 145.0), Seq(0.0, 100.0)))
  }

  test("trainCodebooks: shape, determinism, and ADC recall on real embeddings") {
    val emb = Tables.embeddings(spark, sf)
    val a = Pq.trainCodebooks(emb, "embedding", m = 4, k = 4, fitCap = 500L)
    val b = Pq.trainCodebooks(emb, "embedding", m = 4, k = 4, fitCap = 500L)
    assert(a == b, "training must be deterministic under the seed")
    assert(a.length == 4 && a.forall(_.length == 4) &&
      a.forall(_.forall(_.length == 16)))
    // recall sanity: the query vector's own code must rank it near the
    // top among 2000 — PQ is approximate, but self-distance is the
    // minimum of its own quantization cell
    val q = emb.filter($"vec_id" === 7)
      .select($"embedding".cast("array<double>")).head().getSeq[Double](0)
    val codes = Pq.encode(emb, "vec_id", "embedding", a)
    val top = Pq.adcTopK(codes, "vec_id", a, q, 20)
      .select("vec_id").as[Long].collect().toSet
    assert(top.contains(7L), "self must appear in ADC top-20")
  }

  test("written codes table round-trips and is the compressed artifact") {
    val dir = java.nio.file.Files.createTempDirectory("pq")
      .resolve("codes").toString
    val emb = Tables.embeddings(spark, sf).limit(100)
    val written = Pq.encode(emb, "vec_id", "embedding", cb2(emb), Some(dir))
    assert(written.columns.contains("code") &&
      !written.columns.contains("embedding"),
      "codes table must not carry the raw embeddings")
    val back = spark.read.parquet(dir).count()
    assert(back == 100L)
  }

  private def cb2(emb: org.apache.spark.sql.DataFrame): Pq.Codebooks = {
    val rows = emb.orderBy("vec_id").limit(2)
      .select($"embedding".cast("array<double>"))
      .as[Seq[Double]].collect()
    (0 until 4).map(m => rows.map(_.slice(m * 16, m * 16 + 16)).toSeq)
  }
}
