package graft

import org.apache.spark.sql.functions._

/** Round-5 batch m: dyad census, structural twins, vocabulary drift,
  * top-k margin (gate-level composition of the existing exact ANN).
  */
class DyadCensusSpec extends GraftSuite {
  import graft.measures.Measures

  test("hand-built mutual/asym/null mix") {
    import spark.implicits._
    // arcs: 1→2 and 2→1 (mutual), 1→3 (asym); n=3 → C(3,2)=3 pairs
    val d = Seq((1L, 2L), (2L, 1L), (1L, 3L)).toDF("src", "dst")
    val r = Measures.dyadCensus(d).collect().head
    assert(r.getLong(0) === 3L)
    assert(r.getLong(1) === 1L) // mutual
    assert(r.getLong(2) === 1L) // asym
    assert(r.getLong(3) === 1L) // null: (2,3)
  }

  test("census identity on a pure one-way star") {
    import spark.implicits._
    val d = Seq((1L, 2L), (1L, 3L), (1L, 4L)).toDF("src", "dst")
    val r = Measures.dyadCensus(d).collect().head
    assert(r.getLong(1) === 0L && r.getLong(2) === 3L)
    assert(r.getLong(1) + r.getLong(2) + r.getLong(3) ===
      r.getLong(0) * (r.getLong(0) - 1) / 2)
  }
}

class StructuralTwinsSpec extends GraftSuite {
  import graft.graph.GraphOps

  test("star leaves are one twin class, the hub is a singleton") {
    val e = edgesDf(undirected(Seq((0L, 1L), (0L, 2L), (0L, 3L))))
    val r = GraphOps.structuralTwins(e).collect()
      .map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2))).toMap
    assert(r(1L) === ((1L, 3L)))
    assert(r(2L) === ((1L, 3L)))
    assert(r(3L) === ((1L, 3L)))
    assert(r(0L)._2 === 1L)
  }

  test("numeric neighbor order, not lexicographic: {2,10} ≠ {10,2} twins") {
    import spark.implicits._
    // v1 and v4 both neighbor exactly {2, 10}: must land in ONE class
    // even though lexicographic sorting of strings would also work here,
    // the signature must sort 2 before 10 numerically on both engines
    val e = Seq((1L, 2L), (1L, 10L), (4L, 10L), (4L, 2L))
      .toDF("src", "dst")
    val r = GraphOps.structuralTwins(e).collect()
      .map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2))).toMap
    assert(r(1L) === ((1L, 2L)) && r(4L) === ((1L, 2L)))
  }
}

class VocabDriftSpec extends GraftSuite {
  import graft.text.TextIndex

  test("identical halves have zero divergence") {
    import spark.implicits._
    val d = Seq((0L, "alpha beta gamma"), (1L, "alpha beta gamma"),
      (2L, "delta"), (3L, "delta")).toDF("doc_id", "text")
    val r = TextIndex.vocabDrift(d).collect().head
    assert(r.getLong(0) === 4L) // alpha beta gamma delta
    assert(r.getLong(1) === 4L && r.getLong(2) === 4L)
    assert(r.getLong(3) === 0L)
  }

  test("disjoint halves approach the ln2 ceiling and stay under it") {
    import spark.implicits._
    val d = Seq((0L, "aa aa aa aa aa aa aa aa"),
      (1L, "bb bb bb bb bb bb bb bb")).toDF("doc_id", "text")
    val r = TextIndex.vocabDrift(d).collect().head
    val js = r.getLong(3) / 1e9
    assert(js > 0.3 && js <= math.log(2.0) + 1e-9)
  }
}
