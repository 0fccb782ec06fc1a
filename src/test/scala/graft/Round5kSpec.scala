package graft

import org.apache.spark.sql.functions._

/** Round-5 batch k: collective influence, graphlet orbit counts, the
  * RA/cosine/LHN link-prediction family, signed triad census, continuous
  * label spreading, and the landmark distance oracle.
  */
class CollectiveInfluenceSpec extends GraftSuite {
  import graft.measures.Measures

  test("hand-computed CI on a star with one rim edge") {
    // 0-{1,2,3} star plus (1,2): deg = 3,2,2,1
    val e = edgesDf(undirected(Seq((0L, 1L), (0L, 2L), (0L, 3L), (1L, 2L))))
    val r = Measures.collectiveInfluence(e).collect()
      .map(x => x.getLong(0) -> x.getLong(2)).toMap
    assert(r === Map(0L -> 4L, 1L -> 3L, 2L -> 3L, 3L -> 0L))
  }

  test("leaves always score zero") {
    val e = edgesDf(undirected(Seq((1L, 2L), (2L, 3L), (3L, 4L))))
    val r = Measures.collectiveInfluence(e).collect()
      .map(x => x.getLong(0) -> x.getLong(2)).toMap
    assert(r(1L) === 0L && r(4L) === 0L)
    // interior of the path: (2−1)·((1−1)+(2−1)) = 1
    assert(r(2L) === 1L && r(3L) === 1L)
  }
}

class OrbitCountsSpec extends GraftSuite {
  import graft.algo.TriangleCount

  test("triangle with a pendant: all four orbits by hand") {
    val e = edgesDf(undirected(Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L))))
    val r = TriangleCount.orbitCounts(e).collect()
      .map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2), x.getLong(3),
        x.getLong(4))).toMap
    assert(r(1L) === ((2L, 1L, 0L, 1L))) // wedge-end 1-3-4
    assert(r(2L) === ((2L, 1L, 0L, 1L)))
    assert(r(3L) === ((3L, 0L, 2L, 1L))) // centers wedges (1,4), (2,4)
    assert(r(4L) === ((1L, 2L, 0L, 0L))) // ends 4-3-1, 4-3-2
  }

  test("orbit identity: 2·Σtri + Σwedge_end = Σ (deg·(nbr deg − 1))") {
    val e = edgesDf(undirected(Fixtures.karatePairs))
    val r = TriangleCount.orbitCounts(e).collect()
    // every 2-path from v either ends a wedge or closes a triangle twice
    r.foreach { x =>
      assert(x.getLong(2) >= 0 && x.getLong(3) >= 0)
    }
    // global wedge accounting: Σ wedge_center = Σ C(deg,2) − 3·triangles
    val wc = r.map(_.getLong(3)).sum
    val cd = r.map(x => x.getLong(1) * (x.getLong(1) - 1) / 2).sum
    val t3 = r.map(_.getLong(4)).sum // each triangle counted at 3 vertices
    assert(wc === cd - t3)
  }
}

class LinkPredExtendedSpec extends GraftSuite {
  import graft.algo.LinkPrediction

  test("4-cycle diagonal: RA, cosine, LHN by hand") {
    import spark.implicits._
    val e = edgesDf(undirected(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L))))
    val pairs = Seq((1L, 3L), (1L, 2L)).toDF("src", "dst")
    val r = LinkPrediction.scoresExtended(e, pairs).collect()
      .map(x => (x.getLong(0), x.getLong(1)) ->
        (x.getLong(2), x.getDouble(3), x.getDouble(4), x.getDouble(5))).toMap
    val (cn, ra, cos, lhn) = r((1L, 3L))
    assert(cn === 2L)
    assert(math.abs(ra - 1.0) < 1e-12) // 1/deg(2) + 1/deg(4) = 1/2 + 1/2
    assert(math.abs(cos - 1.0) < 1e-12) // 2 / √(2·2)
    assert(math.abs(lhn - 0.5) < 1e-12) // 2 / (2·2)
    // adjacent pair shares no neighbors on the 4-cycle
    assert(r((1L, 2L))._1 === 0L)
  }
}

class SignedTriadsSpec extends GraftSuite {
  import graft.algo.TriangleCount

  test("one balanced and one unbalanced triangle") {
    import spark.implicits._
    val pairs = Seq((1L, 2L), (2L, 3L), (1L, 3L), (4L, 5L), (5L, 6L), (4L, 6L))
    val sign = Map((4L, 5L) -> -1) // T2 carries exactly one negative edge
    val rows = pairs.flatMap { case (a, b) =>
      val sg = sign.getOrElse((a, b), 1)
      Seq((a, b, sg), (b, a, sg))
    }
    val signed = rows.toDF("src", "dst", "sign")
    val r = TriangleCount.signedTriads(signed).collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r === Map(0L -> 1L, 1L -> 1L))
  }
}

class LabelSpreadingSpec extends GraftSuite {
  import graft.algo.LabelSpreading

  test("hand-replayed two supersteps on a path, one clamped seed") {
    import spark.implicits._
    val e = edgesDf(undirected(Seq((1L, 2L), (2L, 3L))))
    val seeds = Seq((1L, 0L)).toDF("id", "cls")
    val r = LabelSpreading.run(e, seeds, alpha = 0.5, supersteps = 2)
      .collect().map(x => x.getLong(0) -> x.getDouble(2)).toMap
    // t1: f(1)=0.5, f(2)=0.25; t2: f(1)=0.5·0.25/1+0.5=0.625,
    // f(2)=0.5·0.5/2=0.125, f(3)=0.5·0.25/1=0.125
    assert(math.abs(r(1L) - 0.625) < 1e-12)
    assert(math.abs(r(2L) - 0.125) < 1e-12)
    assert(math.abs(r(3L) - 0.125) < 1e-12)
  }

  test("two competing seeds partition a path's mass by proximity") {
    import spark.implicits._
    val e = edgesDf(undirected(Seq((1L, 2L), (2L, 3L), (3L, 4L))))
    val seeds = Seq((1L, 0L), (4L, 1L)).toDF("id", "cls")
    val r = LabelSpreading.run(e, seeds, alpha = 0.5, supersteps = 3)
      .collect().map(x => (x.getLong(0), x.getLong(1)) -> x.getDouble(2))
      .toMap
    // each end vertex holds more of its own seed's class than the other's
    assert(r((1L, 0L)) > r.getOrElse((1L, 1L), 0.0))
    assert(r((4L, 1L)) > r.getOrElse((4L, 0L), 0.0))
    // symmetry of the construction: mirrored scores match exactly
    assert(math.abs(r((2L, 0L)) - r((3L, 1L))) < 1e-12)
  }
}

class LandmarkDistSpec extends GraftSuite {
  import graft.algo.Centrality

  test("estimates are exact through an on-path landmark, else upper bounds") {
    import spark.implicits._
    val e = edgesDf(undirected(Seq(
      (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))))
    val landmarks = Seq(1L).toDF("id")
    val pairs = Seq((1L, 3L), (2L, 4L), (10L, 11L)).toDF("src", "dst")
    val r = Centrality.landmarkDistances(e, landmarks, pairs).collect()
      .map(x => (x.getLong(0), x.getLong(1)) ->
        (x.getLong(2), if (x.isNullAt(3)) None else Some(x.getLong(3))))
      .toMap
    assert(r((1L, 3L)) === ((1L, Some(2L)))) // landmark IS an endpoint: exact
    assert(r((2L, 4L)) === ((1L, Some(4L)))) // true 2, detour via 1: 1+3
    assert(r((10L, 11L)) === ((0L, None))) // unseen vertices: no estimate
  }

  test("more landmarks can only tighten the bound") {
    import spark.implicits._
    val e = edgesDf(undirected(Seq(
      (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))))
    val pairs = Seq((2L, 4L)).toDF("src", "dst")
    val one = Centrality.landmarkDistances(e, Seq(1L).toDF("id"), pairs)
      .collect().head.getLong(3)
    val two = Centrality.landmarkDistances(e, Seq(1L, 3L).toDF("id"), pairs)
      .collect().head.getLong(3)
    assert(two <= one)
    assert(two === 2L) // landmark 3 sits on the shortest 2–4 path
  }
}
