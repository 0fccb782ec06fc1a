package graft

import org.apache.spark.sql.functions._

/** Round-5 batch al: matching-based vertex cover. */
class VertexCoverSpec extends GraftSuite {
  import graft.algo.Matching
  import graft.graph.GraphOps

  private def assertCovers(edges: org.apache.spark.sql.DataFrame,
                           cover: org.apache.spark.sql.DataFrame): Unit = {
    val uncovered = GraphOps.canonical(edges)
      .join(cover.select(col("id").as("src")), Seq("src"), "left_anti")
      .join(cover.select(col("id").as("dst")), Seq("dst"), "left_anti")
      .count()
    assert(uncovered === 0L, "cover must touch every edge")
  }

  test("vertexCover: covers every edge on the two-clique fixture") {
    val e = edgesDf(undirected(Fixtures.twoCliquesBridge))
    val cover = Matching.vertexCover(e, rounds = 3, seed = 7L)
    assertCovers(e, cover)
    // matched endpoints come in pairs; with empty residual the size is
    // even and <= 2 * a maximum matching (<= n)
    val vias = cover.groupBy("via").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(vias.getOrElse("matched", 0L) % 2 === 0L)
  }

  test("vertexCover: star is covered by few vertices, residual fallback works") {
    // star: one round matches exactly one spoke; remaining spokes are
    // residual-free (their edges touch the matched center)
    val star = edgesDf(undirected((1L to 6L).map(i => (0L, i))))
    val cover = Matching.vertexCover(star, rounds = 1, seed = 7L)
    assertCovers(star, cover)
    assert(cover.count() === 2L) // the matched center + one spoke
    // rounds = 0 is rejected by greedyRounds' require
    intercept[IllegalArgumentException] {
      Matching.vertexCover(star, rounds = 0, seed = 7L)
    }
  }
}
