package graft

import org.apache.spark.sql.functions._
import graft.algo.{Dense, TriangleCount}
import graft.graph.{Compress, GraphOps}

/** Round-4 batch: gamma-gap compression cost, densest-subgraph peel,
  * 4-clique census.
  */
class Round4fSpec extends GraftSuite {

  test("gammaGapCost codes sorted neighbor gaps with exact gamma bits") {
    // 1 -> {3, 5, 6}: gaps 4, 2, 1 -> bits 5 + 3 + 1 = 9
    // 2 -> {0}: gap 0+1=1 -> 1 bit (id 0 stays codable)
    val e = edgesDf(Seq((1L, 3L), (1L, 5L), (1L, 6L), (2L, 0L)))
    val got = Compress.gammaGapCost(e).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got === Map(1L -> ((3L, 9L)), 2L -> ((1L, 1L))))
  }

  test("gammaGapCostReordered keeps per-vertex degree, degree order shrinks a hub-tail graph") {
    // star center 100 with leaves at spread-out ids: natural gaps are
    // large; degree reorder packs leaves into a dense prefix.
    val leaves = Seq(7L, 31L, 90L, 150L, 220L, 287L)
    val star = leaves.flatMap(l => Seq((100L, l), (l, 100L)))
    val e = edgesDf(star)
    val nat = Compress.gammaGapCost(e).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    val re = Compress.gammaGapCostReordered(e, GraphOps.degreeReorder(e))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(nat.keySet === re.keySet)
    // the center's reordered list is {0..5} (leaves get the low ids):
    // gaps 1,1,1,1,1,1 -> 6 bits, strictly below any natural layout
    assert(re(100L) === 6L)
    assert(nat(100L) > re(100L))
  }

  test("peelRounds removes the sparse fringe first, then the dense core") {
    // K4 on {0,1,2,3} + path 0-4-5-6. Round 1: avg-degree rule
    // (deg*7 <= 18) peels {4,5,6}; round 2: the K4 (deg*4 = 12 <= 12).
    val k4 = for { a <- 0L to 3L; b <- 0L to 3L if a < b } yield (a, b)
    val e = edgesDf(undirected(k4 ++ Seq((0L, 4L), (4L, 5L), (5L, 6L))))
    val got = Dense.peelRounds(e, rounds = 4).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(4L -> 1L, 5L -> 1L, 6L -> 1L,
      0L -> 2L, 1L -> 2L, 2L -> 2L, 3L -> 2L))
  }

  test("peelRounds covers every vertex exactly once and survivors get rounds+1") {
    val e = edgesDf(undirected(Seq((0L, 1L), (1L, 2L), (2L, 0L), (2L, 3L))))
    val rows = Dense.peelRounds(e, rounds = 1).collect()
    val ids = rows.map(_.getLong(0)).sorted
    assert(ids === Array(0L, 1L, 2L, 3L))
    val byRound = rows.groupBy(_.getLong(1)).view.mapValues(_.length).toMap
    // n=4, slots=8: rule peels deg*4 <= 8 i.e. deg <= 2 -> {0,1,3};
    // vertex 2 (deg 3) survives round 1 -> peel_round 2
    assert(byRound === Map(1L -> 3, 2L -> 1))
  }

  test("cliqueCensus4 counts K5 and ignores pendant vertices") {
    val k5 = for { a <- 0L to 4L; b <- 0L to 4L if a < b } yield (a, b)
    val e = edgesDf(undirected(k5 :+ (0L, 9L)))
    val r = TriangleCount.cliqueCensus4(e).collect()(0)
    assert(r.getLong(0) === 10L) // C(5,3) triangles
    assert(r.getLong(1) === 5L)  // C(5,4) 4-cliques
  }

  test("cliqueCensus4 is zero on a triangle-free graph") {
    val e = edgesDf(undirected(Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 0L))))
    val r = TriangleCount.cliqueCensus4(e).collect()(0)
    assert(r.getLong(0) === 0L && r.getLong(1) === 0L)
  }

  test("labelMemory records the sync-LP oscillation on a single edge") {
    // K2 oscillates under synchronous min-label LP: vertex 0 holds
    // labels 1,0,1 over three steps; vertex 1 holds 0,1,0.
    val e = edgesDf(undirected(Seq((0L, 1L))))
    val got = graft.algo.LabelPropagation.labelMemory(e, 3, symmetric = true)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got === Map((0L, 1L) -> 2L, (0L, 0L) -> 1L,
      (1L, 0L) -> 2L, (1L, 1L) -> 1L))
  }

  test("labelMemory rounds-held sums to the superstep count per vertex") {
    val e = edgesDf(undirected(Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L),
      (4L, 0L), (1L, 3L))))
    val rows = graft.algo.LabelPropagation.labelMemory(e, 3, symmetric = true)
      .collect()
    val sums = rows.groupBy(_.getLong(0)).view
      .mapValues(_.map(_.getLong(2)).sum).toMap
    assert(sums.values.toSet === Set(3L))
    assert(sums.keySet === Set(0L, 1L, 2L, 3L, 4L))
  }

  test("greedy matching is a matching and maximalizes") {
    val pairs = for { a <- 0L until 20L; b <- 0L until 20L
                      if a < b && (a + b) % 3 == 0 } yield (a, b)
    val e = edgesDf(undirected(pairs))
    val m = graft.algo.Matching.greedyRounds(e, rounds = 10, seed = 7L)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val touched = m.flatMap(p => Seq(p._1, p._2))
    assert(touched.distinct.length === touched.length) // no shared vertex
    // maximal: every input edge has at least one matched endpoint
    val ts = touched.toSet
    assert(pairs.forall(p => ts.contains(p._1) || ts.contains(p._2)))
  }
}
