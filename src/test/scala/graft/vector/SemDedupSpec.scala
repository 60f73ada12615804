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

  test("nProbe=2 recovers the boundary pair: recall meets the exact all-pairs baseline") {
    // three centroids so multi-probe is NOT trivially all-pairs; the
    // straddler pair probes {+x, +y} and meets in a shared cell
    val cents3: Seq[Seq[Double]] =
      Seq(Seq(1.0, 0.0), Seq(0.0, 1.0), Seq(-1.0, 0.0))
    val df = Seq(
      (1L, Array(0.9f, 1.0f)), (2L, Array(1.0f, 0.9f)), // boundary straddlers
      (10L, Array(1.0f, 0.0f)), (11L, Array(1.0f, 0.01f)), // same-cell dup
      (20L, Array(0.0f, 1.0f)), (30L, Array(-1.0f, 0.05f))
    ).toDF("vec_id", "embedding")
    def pairSet(nProbe: Int) = SemDedup.semanticDuplicatePairs(
      df, "vec_id", "embedding", cents3, threshold = 0.95, nProbe = nProbe)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSeq
    val exact = Similarity.exactNearDuplicatePairs(
      df, "vec_id", "embedding", threshold = 0.95, blocks = 2)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val single = pairSet(1)
    val multiRows = pairSet(2)
    val multi = multiRows.toSet
    assert(multiRows.size == multi.size,
      s"cross-probe duplicate pair rows must dedupe: $multiRows")
    assert(single.toSet.subsetOf(multi))
    assert(!single.toSet.contains((1L, 2L)),
      "fixture broken: single-probe should miss the straddler pair")
    // THE verdict criterion: multi-probe recall ≥ the exact baseline
    // on this fixture (and never a false pair — cosines are true)
    assert(multi == exact,
      s"nProbe=2 must match exact all-pairs here: $multi vs $exact")
  }

  test("semDedup nProbe=2 prunes the boundary dup that nProbe=1 keeps; cells stay primary") {
    val df = Seq(
      (1L, Array(0.9f, 1.0f)),
      (2L, Array(1.0f, 0.9f))
    ).toDF("vec_id", "embedding")
    val kept = SemDedup.semDedup(df, "vec_id", "embedding", cents,
      threshold = 0.9, nProbe = 2).as[(Long, Int)].collect().toMap
    // survivor is min-id 1; its reported cell is the PRIMARY assignment
    // (cell 1 — (0.9, 1.0) is nearer +y), not a probe cell
    assert(kept == Map(1L -> 1), s"got $kept")
  }

  test("pair join shuffles on the cell key (no cartesian)") {
    val plan = SemDedup.semanticDuplicatePairs(vecs, "vec_id", "embedding",
      cents, threshold = 0.5).queryExecution.executedPlan.toString()
    assert(!plan.contains("Cartesian"), s"cartesian in plan:\n$plan")
  }
}
