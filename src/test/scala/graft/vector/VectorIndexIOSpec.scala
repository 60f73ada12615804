package graft.vector

import java.nio.file.Files

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Persisted ANN indexes: the probe against a re-read index must prune
  * at the FILE-LISTING level (PartitionFilters on the scan), and return
  * the same results as probing the in-memory index — the property that
  * makes a 100 TB index cheap to query. */
class VectorIndexIOSpec extends SparkSpec {
  import spark.implicits._

  test("LSH index round-trips; probe prunes partitions and matches in-memory results") {
    val emb = Tables.embeddings(spark, sf)
    val q = emb.filter($"vec_id" === 0)
      .select($"embedding".cast("array<double>")).head().getSeq[Double](0)
    val idx = Similarity.lshIndex(emb, "vec_id", "embedding", nPlanes = 8, dim = q.length)
    val path = Files.createTempDirectory("lshidx").resolve("idx").toString
    Similarity.writeLshIndex(idx, path)
    val reread = Similarity.readLshIndex(spark, path)
    val probed = Similarity.annTopK(reread, "vec_id", "embedding", q, 10, nPlanes = 8)
    val plan = probed.queryExecution.executedPlan.toString()
    // a NON-EMPTY partition-filter list (the key alone always prints,
    // as "PartitionFilters: []", even without pruning)
    assert("PartitionFilters: \\[\\S".r.findFirstIn(plan).isDefined &&
      !plan.contains("PartitionFilters: []"),
      s"probe must prune bucket partitions at file listing:\n$plan")
    val inMem = Similarity.annTopK(idx, "vec_id", "embedding", q, 10, nPlanes = 8)
      .as[(Long, Double)].collect().toSeq
    assert(probed.as[(Long, Double)].collect().toSeq == inMem)
  }

  test("buildIndex with a path returns the durable re-read; probes match localCheckpoint") {
    val emb = Tables.embeddings(spark, sf)
    val q = emb.filter($"vec_id" === 0)
      .select($"embedding".cast("array<double>")).head().getSeq[Double](0)
    val path = Files.createTempDirectory("ivfbuild").resolve("idx").toString
    val (mA, ckIdx) = Ivf.buildIndex(emb, "vec_id", "embedding", k = 4)
    val (mB, durIdx) = Ivf.buildIndex(emb, "vec_id", "embedding", k = 4,
      path = Some(path))
    // same seed → same model; the durable index must answer identically
    assert(mA.centroids.map(_.toSeq).toSeq == mB.centroids.map(_.toSeq).toSeq)
    val a = Ivf.annTopK(mA, ckIdx, "vec_id", "embedding", q, 10)
      .as[(Long, Double)].collect().toSeq
    val b = Ivf.annTopK(mB, durIdx, "vec_id", "embedding", q, 10)
      .as[(Long, Double)].collect().toSeq
    assert(a == b && a.nonEmpty)
    // and it IS the written, cell-partitioned artifact
    assert(new java.io.File(path).listFiles()
      .exists(_.getName.startsWith("cell=")), s"cell dirs missing at $path")
  }

  test("IVF index round-trips; probe prunes cell partitions and matches in-memory results") {
    val emb = Tables.embeddings(spark, sf)
    val q = emb.filter($"vec_id" === 0)
      .select($"embedding".cast("array<double>")).head().getSeq[Double](0)
    val cents = emb.filter($"vec_id" < 8).orderBy($"vec_id")
      .select($"embedding".cast("array<double>"))
      .collect().map(_.getSeq[Double](0).toSeq).toSeq
    val index = Ivf.fixedCentroidIndex(emb, "vec_id", "embedding", cents)
    val path = Files.createTempDirectory("ivfidx").resolve("idx").toString
    Ivf.writeIndex(index, path)
    val reread = Ivf.readIndex(spark, path)
    val cells = Ivf.nearestCentroidCells(cents, q, nProbe = 3)
    val probed = Ivf.annTopKCells(reread, "vec_id", "embedding", q, 10, cells)
    val plan = probed.queryExecution.executedPlan.toString()
    assert("PartitionFilters: \\[\\S".r.findFirstIn(plan).isDefined &&
      !plan.contains("PartitionFilters: []"),
      s"probe must prune cell partitions at file listing:\n$plan")
    val inMem = Ivf.annTopKCells(index, "vec_id", "embedding", q, 10, cells)
      .as[(Long, Double)].collect().toSeq
    assert(probed.as[(Long, Double)].collect().toSeq == inMem)
  }
}
