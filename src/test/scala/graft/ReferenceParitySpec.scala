package graft

import org.apache.spark.sql.functions._
import graft.algo.{LabelPropagation, SemiSyncLP}
import graft.graph.GraphOps
import graft.measures.Measures
import graft.sources.GraphReaders

/** End-to-end quality-envelope parity on the REFERENCE'S OWN datasets
  * (the `.net` files under `/root/reference/datasets/converted`, published
  * results in the `.tst` files under `tests/results`): read the Pajek
  * file with the engine's reader,
  * run LP to convergence, and assert communities/modularity land inside
  * the envelope the reference publishes across its schedules
  * (seq/par × sync/async/semisync — the reference tie-breaks at random,
  * so its own runs span an envelope rather than a point):
  *
  *   karate   (34 n / 156 slots):  2-5 communities, Q in [0.12, 0.46]
  *   football (115 n / 1226 slots): 9-13 communities, Q in [0.50, 0.62]
  *
  * Runs use the deterministic HASHED tie-break (`tieBreakSeed`): the
  * engine's default pinned-min-label tie-break is biased toward low-label
  * flooding, which on tie-heavy small graphs collapses communities the
  * reference's random choice preserves (karate sync lands at Q=0.03 under
  * min-label vs 0.17 hashed vs the reference's published 0.174-0.277).
  * Hashed mode is the unbiased, reproducible stand-in for the reference's
  * `rand()` tie-break — correctness of the update rule itself is gated
  * separately (min-label mode vs the DuckDB oracle, `g_lp_t3`).
  *
  * Skipped (not failed) when the reference checkout isn't present.
  */
class ReferenceParitySpec extends GraftSuite {

  private val datasets = "/root/reference/datasets/converted"

  private def envelope(file: String, comLo: Long, comHi: Long,
                       qLo: Double, qHi: Double): Unit = {
    assume(new java.io.File(s"$datasets/$file").isFile,
      s"reference dataset $file not present")
    val (weighted, _) = GraphReaders.readPajekNet(spark, s"$datasets/$file")
    val edges = GraphOps.prepareForGather(
      weighted.select(col("src"), col("dst")), 8)
    val n = GraphOps.vertices(edges).count()

    val sync = LabelPropagation.run(edges, n, symmetric = true,
      tieBreakSeed = Some(1L)).labels
    val cSync = Measures.communityCount(sync)
    val qSync = Measures.modularity(edges, sync)
    info(s"$file sync: $cSync communities, Q=$qSync")
    assert(cSync >= comLo && cSync <= comHi,
      s"$file sync communities $cSync outside [$comLo, $comHi]")
    assert(qSync >= qLo && qSync <= qHi,
      s"$file sync modularity $qSync outside [$qLo, $qHi]")

    val (semi, _) = SemiSyncLP.run(edges, n, tieBreakSeed = Some(1L))
    val cSemi = Measures.communityCount(semi)
    val qSemi = Measures.modularity(edges, semi)
    info(s"$file semisync: $cSemi communities, Q=$qSemi")
    assert(cSemi >= comLo && cSemi <= comHi,
      s"$file semisync communities $cSemi outside [$comLo, $comHi]")
    assert(qSemi >= qLo && qSemi <= qHi,
      s"$file semisync modularity $qSemi outside [$qLo, $qHi]")
    edges.unpersist(blocking = false)
  }

  test("karate.net lands in the reference's published envelope") {
    envelope("karate.net", 2, 5, 0.12, 0.46)
  }

  /** VERDICT r4 task 5: the reference's headline is community QUALITY, so
    * the multi-level algorithm must match the canonical published figure
    * (Louvain karate Q ≈ 0.42, Blondel et al. 2008), not just beat the
    * degenerate sync collapse. Fixed level budget 3; the deterministic
    * alternating-move schedule lands at Q = 0.441 / 4 communities
    * (measured, KarateLouvainProbe) — asserted ≥ 0.40.
    */
  test("karate.net multi-level Louvain reaches the published quality point") {
    assume(new java.io.File(s"$datasets/karate.net").isFile,
      "reference dataset karate.net not present")
    val (weighted, _) = GraphReaders.readPajekNet(spark, s"$datasets/karate.net")
    val edges = GraphOps.prepareForGather(
      weighted.select(col("src"), col("dst")), 8)
    val (assign, _) = graft.algo.Louvain.run(
      edges.withColumn("weight", lit(1L)), maxLevels = 3)
    val q = Measures.modularity(edges, assign.withColumnRenamed("com", "label"))
    val c = assign.select("com").distinct().count()
    info(s"karate.net louvain(3 levels): $c communities, Q=$q")
    assert(q >= 0.40, s"karate multi-level Louvain modularity $q < 0.40")
    assert(c >= 2 && c <= 6, s"karate Louvain communities $c outside [2, 6]")
    edges.unpersist(blocking = false)
  }

  test("football.net lands in the reference's published envelope") {
    envelope("football.net", 9, 13, 0.50, 0.62)
  }

  /** Powergrid (4941 n / 13188 slots) — the reference's LARGEST completed
    * dataset. Guarded by SPARK_GRAFT_SLOW_TESTS (≈4 min): sync LP
    * oscillates on high-diameter graphs in the reference too (seq sync:
    * 935 com Q=0.213; this engine: 841-915 com Q=0.22-0.27), while the
    * Gauss–Seidel schedules reach the good basin — engine semisync lands
    * at 482 com Q=0.795 vs the reference's published 498 com Q=0.804
    * (`tests/results/power02.tst`). Measured numbers recorded in
    * BENCH/BASELINE.md; reproduce with
    * `sbt "runMain graft.tools.QualityProbe 5powergrid.net"`.
    */
  test("5powergrid.net: semisync lands next to the reference's published point") {
    assume(sys.env.contains("SPARK_GRAFT_SLOW_TESTS"),
      "set SPARK_GRAFT_SLOW_TESTS=1 to run (~4 min)")
    assume(new java.io.File(s"$datasets/5powergrid.net").isFile)
    val (weighted, _) = GraphReaders.readPajekNet(spark, s"$datasets/5powergrid.net")
    val edges = GraphOps.prepareForGather(
      weighted.select(col("src"), col("dst")), 8)
    val n = GraphOps.vertices(edges).count()
    val (semi, _) = SemiSyncLP.run(edges, n)
    val c = Measures.communityCount(semi)
    val q = Measures.modularity(edges, semi)
    info(s"powergrid semisync: $c communities, Q=$q")
    assert(c >= 450 && c <= 1050, s"communities $c outside [450, 1050]")
    assert(q >= 0.65 && q <= 0.85, s"modularity $q outside [0.65, 0.85]")
    edges.unpersist(blocking = false)
  }
}
