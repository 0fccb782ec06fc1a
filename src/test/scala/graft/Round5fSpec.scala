package graft

import org.apache.spark.sql.functions._

/** Round-5 batch-12 operators: full truss decomposition. */
class TrussnessSpec extends GraftSuite {
  import spark.implicits._
  import graft.algo.Truss

  private def trussMap(df: org.apache.spark.sql.DataFrame): Map[(Long, Long), Long] =
    df.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap

  test("5-clique / triangle / pendant decompose to trussness 5 / 3 / 2") {
    val clique = for {
      a <- 1L to 5L; b <- 1L to 5L if a < b
    } yield (a, b)
    val tri = Seq((10L, 11L), (11L, 12L), (10L, 12L))
    val pendant = Seq((20L, 21L))
    val e = edgesDf((clique ++ tri ++ pendant).toSeq)
    val m = trussMap(Truss.trussnessFixed(e, maxK = 5, roundsPerK = 2))
    assert(m.size === 14)
    clique.foreach { p => assert(m(p) === 5L, s"clique edge $p") }
    tri.foreach { p => assert(m(p) === 3L, s"triangle edge $p") }
    assert(m((20L, 21L)) === 2L)
  }

  test("a path graph is all trussness 2 (no triangles anywhere)") {
    val e = edgesDf(Seq((1L, 2L), (2L, 3L), (3L, 4L)))
    val m = trussMap(Truss.trussnessFixed(e, maxK = 4, roundsPerK = 1))
    assert(m.values.toSet === Set(2L))
  }

  test("robots filter: longest prefix wins, Allow beats Disallow on ties") {
    import graft.sources.HostGraph
    val frontier = Seq(
      ("a", "/p/15"), ("a", "/p/25"), ("a", "/q"),
      ("b", "/p/15"), ("b", "/x")).toDF("host", "url")
    val rules = Seq(
      ("a", "/", 0L), ("a", "/p/", 1L), ("a", "/p/1", 0L),
      ("b", "/p/1", 0L), ("b", "/x", 1L), ("b", "/x", 0L))
      .toDF("host", "prefix", "allow")
    val m = HostGraph.robotsFilter(frontier, rules).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getString(3))).toMap
    assert(m(("a", "/p/15")) === (0L, "/p/1")) // longest match disallows
    assert(m(("a", "/p/25")) === (1L, "/p/"))  // next-longest allows
    assert(m(("a", "/q")) === (0L, "/"))       // catch-all disallow
    assert(m(("b", "/p/15")) === (0L, "/p/1"))
    assert(m(("b", "/x")) === (1L, "/x"))      // Allow wins the length tie
  }

  test("robots filter: a url with no matching rule defaults to allowed") {
    import graft.sources.HostGraph
    val frontier = Seq(("c", "/p/1")).toDF("host", "url")
    val rules = Seq(("c", "/secret", 0L)).toDF("host", "prefix", "allow")
    val r = HostGraph.robotsFilter(frontier, rules).first()
    assert(r.getLong(2) === 1L && r.getString(3) === "")
  }

  test("change rate counts consecutive fingerprint flips in snap order") {
    import graft.sources.HostGraph
    val snaps = Seq(
      ("/a", 0L, "x"), ("/a", 1L, "x"), ("/a", 2L, "y"), ("/a", 3L, "y"),
      ("/b", 0L, "x"), ("/b", 1L, "y"), ("/b", 2L, "x"),
      ("/c", 0L, "x")).toDF("url", "snap_id", "fingerprint")
    val m = HostGraph.changeRate(snaps).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(m("/a") === (4L, 1L, 333333L))
    assert(m("/b") === (3L, 2L, 1000000L))
    assert(m("/c") === (1L, 0L, 0L)) // single snapshot: no evidence
  }

  test("peeling cascades: a triangle fan loses its bridge level by level") {
    // two triangles sharing edge (1,2): support(1,2)=2, others 1.
    // k=3 keeps all; k=4 (support>=2) round 1 drops the four outer
    // edges, round 2 drops the now-unsupported (1,2) — all trussness 3.
    val e = edgesDf(Seq((1L, 2L), (1L, 3L), (2L, 3L), (1L, 4L), (2L, 4L)))
    val m = trussMap(Truss.trussnessFixed(e, maxK = 4, roundsPerK = 2))
    assert(m.values.toSet === Set(3L))
  }
}

class SmoothEmbeddingsSpec extends GraftSuite {
  import spark.implicits._
  import graft.functions.Similarity

  test("GNN mean layer: exact per-component neighbor sums and counts") {
    val emb = Seq(
      (1L, Array(1.0f, 2.0f)), (2L, Array(3.0f, 4.0f)),
      (3L, Array(5.0f, 6.0f))).toDF("vec_id", "embedding")
    val edges = Seq((1L, 9L), (2L, 9L), (3L, 9L), (1L, 8L)).toDF("src", "dst")
    val m = Similarity.smoothEmbeddings(edges, emb, dims = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    assert(m((9L, 0L)) === (3L, 9000000L))
    assert(m((9L, 1L)) === (3L, 12000000L))
    assert(m((8L, 0L)) === (1L, 1000000L))
    assert(m((8L, 1L)) === (1L, 2000000L))
    assert(m.size === 4) // dst 8 and 9 only — no row for edgeless ids
  }

  test("duplicate edges contribute one message each (multiset mean)") {
    val emb = Seq((1L, Array(2.0f))).toDF("vec_id", "embedding")
    val edges = Seq((1L, 5L), (1L, 5L)).toDF("src", "dst")
    val r = Similarity.smoothEmbeddings(edges, emb, dims = 1).first()
    assert(r.getLong(2) === 2L && r.getLong(3) === 4000000L)
  }
}

class WeightedTriangleSpec extends GraftSuite {
  import graft.algo.TriangleCount

  def wEdges(rows: Seq[(Long, Long, Long)]) = {
    import spark.implicits._
    val half = rows.toDF("src", "dst", "weight")
    half.unionAll(half.select(col("dst").as("src"),
      col("src").as("dst"), col("weight")))
  }

  test("two triangles: bottleneck mins and totals are exact") {
    // {1,2,3} weights 5,1,3 → min 1, sum 9; {3,4,5} weights 2,2,7 → min 2
    val e = wEdges(Seq((1L, 2L, 5L), (2L, 3L, 1L), (1L, 3L, 3L),
      (3L, 4L, 2L), (4L, 5L, 2L), (3L, 5L, 7L)))
    val r = TriangleCount.weightedTriangles(e).first()
    assert(r.getLong(0) === 2L)
    assert(r.getLong(1) === 3L)
    assert(r.getLong(2) === 20L)
  }

  test("a triangle-free weighted graph reports zeros") {
    val e = wEdges(Seq((1L, 2L, 9L), (2L, 3L, 9L)))
    val r = TriangleCount.weightedTriangles(e).first()
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) === ((0L, 0L, 0L)))
  }
}

class PowerLawSpec extends GraftSuite {
  import graft.measures.Measures

  test("Hill alpha on a planted two-scale degree table") {
    // star hub degree 8, leaves degree 1 (below dMin), plus a 4-clique
    // (degrees 3): tail = {8, 3, 3, 3, 3},
    // alpha = 1 + 5 / (ln 4 + 4 ln 1.5)
    val star = (1L to 8L).map(i => (100L, i + 100L))
    val clique = for { a <- 1L to 4L; b <- 1L to 4L if a != b } yield (a, b)
    val e = edgesDf((undirected(star) ++ clique).toSeq)
    val r = Measures.powerLawAlpha(e, dMin = 2L).first()
    assert(r.getLong(0) === 5L)
    val expect = 1.0 + 5.0 / (math.log(4.0) + 4.0 * math.log(1.5))
    assert(r.getLong(2) === math.round(expect * 1000000))
  }

  test("a dMin-regular graph has no tail evidence: alpha_e6 = 0") {
    // 4-cycle: every degree exactly 2 = dMin, ln sum 0
    val e = edgesDf(undirected(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L))))
    val r = Measures.powerLawAlpha(e, dMin = 2L).first()
    assert(r.getLong(0) === 4L && r.getLong(2) === 0L)
  }
}
