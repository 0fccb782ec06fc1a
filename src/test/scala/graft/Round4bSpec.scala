package graft

import org.apache.spark.sql.functions._
import graft.algo.{KCore, PageRank, Salsa, Spectral}
import graft.measures.Measures

/** Round-4 late additions: SALSA, Katz, eigenvector power iterate,
  * full coreness decomposition, average neighbor degree, rich club,
  * spam mass. Each operator is validated against an independent dense /
  * sequential oracle, never against itself.
  */
object Round4bOracles {

  /** Dense fixed-iteration SALSA with per-half-step L1 normalization —
    * mirrors [[Salsa.runFixed]]'s schedule on adjacency maps.
    */
  def salsaDense(slots: Seq[(Long, Long)], iters: Int)
      : Map[Long, (Double, Double)] = {
    val nodes = (slots.map(_._1) ++ slots.map(_._2)).distinct.sorted
    val outDeg = slots.groupBy(_._1).view.mapValues(_.size).toMap
    val inDeg = slots.groupBy(_._2).view.mapValues(_.size).toMap
    val n = nodes.size
    var auth = nodes.map(_ -> 1.0 / n).toMap
    var hub = nodes.map(_ -> 1.0 / n).toMap
    for (_ <- 1 to iters) {
      val aRaw = nodes.map { v =>
        v -> slots.filter(_._2 == v).map { case (u, _) => hub(u) / outDeg(u) }.sum
      }.toMap
      val aSum = aRaw.values.sum
      auth = aRaw.view.mapValues(a => if (aSum != 0) a / aSum else a).toMap
      val hRaw = nodes.map { u =>
        u -> slots.filter(_._1 == u).map { case (_, v) => auth(v) / inDeg(v) }.sum
      }.toMap
      val hSum = hRaw.values.sum
      hub = hRaw.view.mapValues(h => if (hSum != 0) h / hSum else h).toMap
    }
    nodes.map(v => v -> (auth(v), hub(v))).toMap
  }

  /** Dense Katz x_k = beta + alpha·Σ_{u→v} x_{k-1}(u). */
  def katzDense(slots: Seq[(Long, Long)], iters: Int, alpha: Double,
                beta: Double): Map[Long, Double] = {
    val nodes = (slots.map(_._1) ++ slots.map(_._2)).distinct
    var x = nodes.map(_ -> beta).toMap
    for (_ <- 1 to iters) {
      x = nodes.map { v =>
        v -> (beta + alpha * slots.filter(_._2 == v).map(e => x(e._1)).sum)
      }.toMap
    }
    x
  }

  /** Dense integer walk counts w_k(v) = Σ_{u→v} w_{k-1}(u), w_0 = 1. */
  def walkCountsDense(slots: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    val nodes = (slots.map(_._1) ++ slots.map(_._2)).distinct
    var w = nodes.map(_ -> 1L).toMap
    for (_ <- 1 to iters) {
      w = nodes.map { v =>
        v -> slots.filter(_._2 == v).map(e => w(e._1)).sum
      }.toMap
    }
    w
  }

  /** Sequential exact coreness via iterated peeling (undirected slots). */
  def corenessBrute(slots: Seq[(Long, Long)]): Map[Long, Long] = {
    val nodes = (slots.map(_._1) ++ slots.map(_._2)).distinct
    val coreness = scala.collection.mutable.Map(nodes.map(_ -> 0L): _*)
    var alive = nodes.toSet
    var k = 1L
    while (alive.nonEmpty) {
      var changed = true
      while (changed && alive.nonEmpty) {
        val deg = alive.map { v =>
          v -> slots.count(e => e._1 == v && alive(e._2))
        }.toMap
        val drop = alive.filter(v => deg(v) < k)
        changed = drop.nonEmpty
        alive = alive -- drop
      }
      alive.foreach(v => coreness(v) = k)
      k += 1
    }
    coreness.toMap
  }
}

class SalsaSpec extends GraftSuite {

  // a directed graph with asymmetric hub/authority structure: 0,1,2 are
  // hubs pointing into authorities 10,11; 11 also points back out
  val directed: Seq[(Long, Long)] = Seq(
    (0L, 10L), (0L, 11L), (1L, 10L), (1L, 11L), (2L, 11L), (11L, 3L),
    (3L, 10L), (4L, 3L))

  test("SALSA matches the dense alternating-walk oracle") {
    val got = Salsa.runFixed(edgesDf(directed), iterations = 3, partitions = 4)
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val want = Round4bOracles.salsaDense(directed, 3)
    assert(got.keySet === want.keySet)
    got.foreach { case (id, (a, h)) =>
      assert(math.abs(a - want(id)._1) < 1e-9, s"auth($id)")
      assert(math.abs(h - want(id)._2) < 1e-9, s"hub($id)")
    }
    // L1 per half-step: scores sum to 1
    assert(math.abs(got.values.map(_._1).sum - 1.0) < 1e-9)
    assert(math.abs(got.values.map(_._2).sum - 1.0) < 1e-9)
  }

  test("SALSA on an empty-flow direction keeps zeros, no NaN") {
    // single edge: after the first authority gather only vertex 1 has
    // mass; no half-step ever divides by a zero sum here, but hub mass
    // for the sink must stay exactly 0, never NaN
    val got = Salsa.runFixed(edgesDf(Seq((0L, 1L))), iterations = 2, partitions = 2)
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(!got.values.exists(v => v._1.isNaN || v._2.isNaN))
    assert(got(1L)._1 === 1.0) // all authority at the sink
    assert(got(0L)._2 === 1.0) // all hubness at the source
  }
}

class SpectralSpec extends GraftSuite {

  val slots: Seq[(Long, Long)] = undirected(Fixtures.karatePairs)

  test("katzFixed matches the dense oracle") {
    val got = Spectral.katzFixed(edgesDf(slots), iterations = 4,
        alpha = 0.02, beta = 1.0, partitions = 4)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val want = Round4bOracles.katzDense(slots, 4, 0.02, 1.0)
    assert(got.keySet === want.keySet)
    got.foreach { case (id, x) =>
      assert(math.abs(x - want(id)) < 1e-9, s"katz($id)") }
  }

  test("katzWalkSums is the exact scaled Katz iterate") {
    val got = Spectral.katzWalkSums(edgesDf(slots), iterations = 3,
        invAlpha = 200L, partitions = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = Round4bOracles.katzDense(slots, 3, 1.0 / 200.0, 1.0)
    got.foreach { case (id, z) =>
      assert(math.abs(z / 8e6 - want(id)) < 1e-9, s"katz z($id)") }
  }

  test("eigenvector walk counts are exact length-k walk tallies") {
    val got = Spectral.eigenvectorWalkCounts(edgesDf(slots), iterations = 3,
        partitions = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Round4bOracles.walkCountsDense(slots, 3))
  }

  test("eigenvectorFixed normalizes to an L1 unit vector") {
    val got = Spectral.eigenvectorFixed(edgesDf(slots), iterations = 3,
      partitions = 4)
    val s = got.agg(sum("score")).first().getDouble(0)
    assert(math.abs(s - 1.0) < 1e-9)
    // ranking agrees with the dense walk-count oracle
    val want = Round4bOracles.walkCountsDense(slots, 3)
    val wantTop = want.toSeq.sortBy(-_._2).take(2).map(_._1).toSet
    val top = got.orderBy(col("score").desc).limit(2)
      .collect().map(_.getLong(0)).toSet
    assert(top === wantTop)
  }
}

class CorenessSpec extends GraftSuite {

  test("convergent coreness equals the sequential peel on karate") {
    val slots = undirected(Fixtures.karatePairs)
    val got = KCore.coreness(edgesDf(slots))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Round4bOracles.corenessBrute(slots))
    // karate's degeneracy is 4
    assert(got.values.max === 4L)
  }

  test("fixed-schedule coreness with ample rounds equals the exact one") {
    val slots = undirected(Fixtures.twoCliquesBridge)
    val exact = Round4bOracles.corenessBrute(slots)
    val got = KCore.corenessFixed(edgesDf(slots), maxK = 5, roundsPerK = 20)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === exact)
    // two 4-cliques: every vertex sits in the 3-core
    assert(got.values.forall(_ === 3L))
  }
}

class NeighborDegreeSpec extends GraftSuite {

  val slots: Seq[(Long, Long)] = undirected(Fixtures.karatePairs)

  test("average neighbor degree matches brute force") {
    val deg = slots.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val want = slots.groupBy(_._1).map { case (v, es) =>
      v -> (es.map(e => deg(e._2)).sum.toDouble / deg(v))
    }
    val got = Measures.avgNeighborDegree(edgesDf(slots))
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(got.keySet === want.keySet)
    got.foreach { case (id, a) =>
      assert(math.abs(a - want(id)) < 1e-9, s"annd($id)") }
  }

  test("rich club matches brute force on karate") {
    val deg = slots.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val got = Measures.richClub(edgesDf(slots), maxK = 16)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    (1 to 16).foreach { k =>
      val club = deg.filter(_._2 > k).keySet
      val ek = slots.count(e => club(e._1) && club(e._2)).toLong
      if (club.size >= 2) {
        val (nk, gek, phi) = got(k.toLong)
        assert(nk === club.size.toLong, s"n_$k")
        assert(gek === ek, s"e_$k")
        val wantPhi = math.round(ek * 1000000.0 / (club.size.toLong * (club.size - 1L)))
        assert(phi === wantPhi, s"phi_$k")
      } else assert(!got.contains(k.toLong), s"k=$k should be filtered")
    }
  }
}

class SpamMassSpec extends GraftSuite {

  test("spam mass composes PageRank and trusted PPR exactly") {
    val slots = undirected(Fixtures.karatePairs)
    val trustedIds = Seq(1L, 34L)
    val e = edgesDf(slots)
    import spark.implicits._
    val trusted = trustedIds.toDF("id")
    val got = PageRank.spamMass(e, trusted, iterations = 5, partitions = 4)
      .collect().map(r => r.getLong(0) ->
        ((r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))).toMap
    val pr = PageRank.runFixed(e, iterations = 5, partitions = 4)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val ppr = PageRank.runPersonalizedFixed(e, trusted, iterations = 5,
        partitions = 4)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    got.foreach { case (id, (rank, trust, sm, rel)) =>
      assert(rank === pr(id), s"rank($id)")
      assert(trust === ppr(id), s"trust($id)")
      assert(math.abs(sm - (rank - trust)) < 1e-15)
      assert(math.abs(rel - (rank - trust) / rank) < 1e-15)
      assert(rank > 0.0)
    }
    // PageRank matches the independent dense oracle too (composition is
    // only as good as its inputs)
    val dense = Oracles.pageRank(slots, 5)
    pr.foreach { case (id, r) => assert(math.abs(r - dense(id)) < 1e-9) }
    // trusted seeds keep most of their rank explained: their relative
    // spam mass is far below the graph maximum
    val rels = got.view.mapValues(_._4).toMap
    assert(trustedIds.map(rels).max < rels.values.max)
  }
}
