package graft

import org.apache.spark.sql.functions._

/** Round-5 batch t: Forman curvature, non-backtracking walks,
  * core–periphery fit.
  */
class FormanCurvatureSpec extends GraftSuite {
  import graft.algo.Truss
  import graft.graph.GraphOps

  test("triangle edges curve to +3, path edges to +1") {
    import spark.implicits._
    val tri = GraphOps.symmetrize(
      Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("src", "dst"))
    val r = Truss.formanCurvature(tri).collect()
      .map(x => (x.getLong(0), x.getLong(1)) -> x.getLong(2)).toMap
    // deg 2 + 2, support 1: 4 - 4 + 3 = 3 on every edge
    assert(r.values.toSet === Set(3L))

    val path = GraphOps.symmetrize(
      Seq((1L, 2L), (2L, 3L)).toDF("src", "dst"))
    val p = Truss.formanCurvature(path).collect()
      .map(x => x.getLong(2)).toSet
    // deg 1 + 2, support 0: 4 - 3 = 1
    assert(p === Set(1L))
  }
}

class NonBacktrackingSpec extends GraftSuite {
  import graft.algo.Spectral
  import graft.graph.GraphOps

  test("path graph: echo forbidden, one walk survives each way") {
    import spark.implicits._
    val path = GraphOps.symmetrize(
      Seq((1L, 2L), (2L, 3L)).toDF("src", "dst"))
    val r = Spectral.nonBacktracking(path, iterations = 1).collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    // (1→2) extends only to (2→3); (3→2) only to (2→1): the reversal
    // (2→1)→(1→2) and (2→3)→(3→2) walks are the forbidden echoes
    assert(r === Map(1L -> 1L, 3L -> 1L))
  }

  test("triangle: every directed edge has exactly one extension forever") {
    import spark.implicits._
    val tri = GraphOps.symmetrize(
      Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("src", "dst"))
    val r = Spectral.nonBacktracking(tri, iterations = 4).collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r === Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
  }

  test("maxDeg cap drops hub fan-out before the wedge join") {
    import spark.implicits._
    // star around 9 (degree 3) + a 1-2 edge; cap at 2 removes vertex 9's
    // out-edges, so no walk may pass THROUGH the hub
    val star = GraphOps.symmetrize(
      Seq((9L, 1L), (9L, 2L), (9L, 3L), (1L, 2L)).toDF("src", "dst"))
    val r = Spectral.nonBacktracking(star, iterations = 1, maxDeg = 2L)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    // surviving directed edges: 1→9, 2→9, 3→9, 1→2, 2→1; length-2
    // non-backtracking walks: (2→1)→(1→9), (1→2)→(2→9)
    assert(r === Map(9L -> 2L))
  }
}

class CorePeripherySpec extends GraftSuite {
  import graft.measures.Measures
  import graft.graph.GraphOps

  test("K4 plus pendant: clique is the 2-core, perfect agreement") {
    import spark.implicits._
    val e = GraphOps.symmetrize(Seq(
      (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (4L, 5L)).toDF("src", "dst"))
    val r = Measures.corePeriphery(e, k = 2L, rounds = 3).collect().head
    assert(r.getAs[Long]("n_core") === 4L)
    assert(r.getAs[Long]("n_periph") === 1L)
    assert(r.getAs[Long]("e_cc") === 6L)
    assert(r.getAs[Long]("e_cp") === 1L)
    assert(r.getAs[Long]("e_pp") === 0L)
    // (6 + 0 - 0) * 1e6 / (6 + 0)
    assert(r.getAs[Long]("agreement_e6") === 1000000L)
  }
}
