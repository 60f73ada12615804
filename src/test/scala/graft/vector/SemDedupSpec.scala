package graft.vector

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins [[SemDedup]]: within-cell pruning only (cross-cell near-dups are
  * the paper's accepted miss), min-id survivorship, threshold edge, and
  * the cell-key join shape. Vectors are hand-built in two well-separated
  * directions so cluster assignment is unambiguous. */
class SemDedupSpec extends SparkSpec {
  import spark.implicits._

  // centroid 0 points along +x, centroid 1 along +y
  private val cents: Seq[Seq[Double]] = Seq(Seq(1.0, 0.0), Seq(0.0, 1.0))

  private def vecs = Seq(
    // cell 0: 10 and 11 nearly parallel (cos ≈ 0.9999) → 11 drops;
    // 12 at ~45°-ish within-cell but below threshold → kept
    (10L, Array(1.0f, 0.00f)),
    (11L, Array(1.0f, 0.01f)),
    (12L, Array(1.0f, 0.55f)),
    // cell 1: 20 alone → kept
    (20L, Array(0.0f, 1.0f)),
    // 21 is near the 45° boundary, lands in cell 0 (tie → lower index);
    // nearly parallel to 12? cos(12,21) high — check pruning within cell
    (21L, Array(1.0f, 1.0f))
  ).toDF("vec_id", "embedding")

  test("semanticDuplicatePairs finds only within-cell pairs over threshold") {
    val pairs = SemDedup.semanticDuplicatePairs(vecs, "vec_id", "embedding",
      cents, threshold = 0.95)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((10L, 11L)), s"parallel pair missed: $pairs")
    // 12 vs 21: cos = (1 + 0.55)/(sqrt(1.3025)*sqrt(2)) ≈ 0.9601 → pair
    assert(pairs.contains((12L, 21L)), s"got $pairs")
    assert(pairs.size == 2, s"unexpected extra pairs: $pairs")
  }

  test("semDedup keeps min-id survivors with their cell") {
    val kept = SemDedup.semDedup(vecs, "vec_id", "embedding", cents,
      threshold = 0.95).as[(Long, Int)].collect().toMap
    assert(kept.keySet == Set(10L, 12L, 20L), s"got $kept")
    assert(kept(10L) == 0 && kept(12L) == 0 && kept(20L) == 1)
  }

  test("a cross-cell near-parallel pair is NOT pruned (the documented miss)") {
    // x=(0.9, 1.0) lands in cell 1; y=(1.0, 0.9) lands in cell 0 —
    // cos(x,y) ≈ 0.994, but they never meet in a cell
    val df = Seq(
      (1L, Array(0.9f, 1.0f)),
      (2L, Array(1.0f, 0.9f))
    ).toDF("vec_id", "embedding")
    val kept = SemDedup.semDedup(df, "vec_id", "embedding", cents,
      threshold = 0.9).as[(Long, Int)].collect().toMap
    assert(kept.keySet == Set(1L, 2L),
      s"cross-cell pair must survive (straddles the boundary): $kept")
  }

  test("pair join shuffles on the cell key (no cartesian)") {
    val plan = SemDedup.semanticDuplicatePairs(vecs, "vec_id", "embedding",
      cents, threshold = 0.5).queryExecution.executedPlan.toString()
    assert(!plan.contains("Cartesian"), s"cartesian in plan:\n$plan")
  }
}
