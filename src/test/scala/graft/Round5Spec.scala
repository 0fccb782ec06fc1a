package graft

import org.apache.spark.sql.functions._
import graft.graph.GraphOps

/** Round-5 guards: the SimRank hub cap, the WL pair-signature
  * equivalence, and the ballSizes2 wedge-budget guard (VERDICT r4 tasks
  * 2-4).
  */
class SimRankCapSpec extends GraftSuite {
  import spark.implicits._
  import graft.algo.SimRank

  // planted hub: vertex 100 cites 20 pages (fan-out 20); two ordinary
  // citers each cite {1, 2}
  private val hubEdges: Seq[(Long, Long)] =
    (1L to 20L).map(v => (100L, v)) ++ Seq((200L, 1L), (200L, 2L),
      (201L, 1L), (201L, 2L))

  test("maxOutDeg prunes the planted hub's pair population") {
    val e = hubEdges.toDF("src", "dst")
    val uncapped = SimRank.simRankT2(e)
    // the hub alone mints C(20,2) canonical pairs
    assert(uncapped.count() >= 190L)
    val capped = SimRank.simRankT2(e, maxOutDeg = 5L)
    // capped semantics == uncapped SimRank on the pre-filtered graph
    val prefiltered = SimRank.simRankT2(
      hubEdges.filterNot(_._1 == 100L).toDF("src", "dst"))
    assert(capped.collect().toSet === prefiltered.collect().toSet)
    // only the ordinary citers' one co-citation pair survives
    assert(capped.count() === 1L)
    val row = capped.first()
    assert((row.getLong(0), row.getLong(1)) === (1L, 2L))
  }

  test("a cap at or above the max out-degree is the identity") {
    val e = hubEdges.toDF("src", "dst")
    assert(SimRank.simRankT2(e, maxOutDeg = 20L).collect().toSet ===
      SimRank.simRankT2(e).collect().toSet)
  }
}

class WlPairSignatureSpec extends GraftSuite {
  import graft.algo.WlRefinement

  /** Group vertex ids by color — the partition is what 1-WL defines;
    * the color STRINGS legitimately differ between signature forms.
    */
  private def partition(df: org.apache.spark.sql.DataFrame): Set[Set[Long]] =
    df.collect().map(r => (r.getLong(0), r.getString(1)))
      .groupBy(_._2).values.map(_.map(_._1).toSet).toSet

  test("pair signature and multiset signature induce identical partitions") {
    val e = edgesDf(undirected(Fixtures.karatePairs))
    for (rounds <- Seq(1, 2, 3)) {
      val pair = partition(WlRefinement.refine(e, rounds))
      val multi = partition(WlRefinement.refine(e, rounds, pairSig = false))
      assert(pair === multi, s"partitions diverge at rounds=$rounds")
    }
  }
}

class BallBudgetSpec extends GraftSuite {

  test("the wedge-budget guard fires on a planted hub before any 2-hop work") {
    // symmetrized 100-leaf star: sum deg^2 = 100^2 + 100 = 10100 wedges
    val star = edgesDf(undirected((1L to 100L).map(v => (0L, v))))
    val ex = intercept[IllegalArgumentException] {
      GraphOps.ballSizes2(star, wedgeBudget = 1000L)
    }
    assert(ex.getMessage.contains("neighborhoodFunctionApprox"))
  }

  test("under budget the exact 2-hop balls are computed") {
    val star = edgesDf(undirected((1L to 100L).map(v => (0L, v))))
    val b = GraphOps.ballSizes2(star, wedgeBudget = 20000L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // every vertex reaches all 101 vertices within 2 hops of a star
    assert(b.size === 101)
    assert(b.values.forall(_ == 101L))
  }
}

class BipartiteCoverageSpec extends GraftSuite {

  test("n_layered reports full coverage on a shallow bipartite component") {
    // 6-cycle: bipartite, one component, everything within the depth cap
    val cyc = edgesDf(undirected(Seq((0L, 1L), (1L, 2L), (2L, 3L),
      (3L, 4L), (4L, 5L), (5L, 0L))))
    val row = graft.algo.Bipartite.check(cyc).first()
    assert(row.getAs[Long]("n_vertices") === 6L)
    assert(row.getAs[Long]("n_layered") === 6L)
    assert(row.getAs[Long]("n_odd_edges") === 0L)
    assert(row.getAs[Long]("bipartite") === 1L)
  }

  test("an odd cycle is flagged with full layer coverage") {
    val tri = edgesDf(undirected(Seq((0L, 1L), (1L, 2L), (2L, 0L))))
    val row = graft.algo.Bipartite.check(tri).first()
    assert(row.getAs[Long]("bipartite") === 0L)
    assert(row.getAs[Long]("n_layered") === 3L)
  }
}
