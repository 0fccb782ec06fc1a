package graft

import org.apache.spark.sql.functions._
import graft.algo.{CoCitation, StronglyConnected}
import graft.queries.PipelineQueries

/** Round-4 late additions, batch 2: co-citation / bibliographic coupling,
  * SCC condensation + DAG levels, and the webtext repetition /
  * boilerplate statistics. Independent brute-force oracles throughout.
  */
object Round4cOracles {

  /** Brute-force co-citation (shared citers) with the hub cap. */
  def coCitationBrute(edges: Seq[(Long, Long)], maxOutDeg: Int,
                      minCount: Int): Map[(Long, Long), Long] = {
    val e = edges.filter(p => p._1 != p._2).distinct
    val outDeg = e.groupBy(_._1).view.mapValues(_.size).toMap
    val kept = e.filter(p => outDeg(p._1) <= maxOutDeg)
    val byCiter = kept.groupBy(_._1).view.mapValues(_.map(_._2).sorted)
    val counts = scala.collection.mutable.Map.empty[(Long, Long), Long]
    byCiter.values.foreach { outs =>
      for (i <- outs.indices; j <- (i + 1) until outs.size)
        counts((outs(i), outs(j))) = counts.getOrElse((outs(i), outs(j)), 0L) + 1L
    }
    counts.filter(_._2 >= minCount).toMap
  }

  /** Longest-path depth per node of a DAG (memoized DFS). */
  def dagLevelsBrute(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val preds = edges.groupBy(_._2).view.mapValues(_.map(_._1)).toMap
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
    val memo = scala.collection.mutable.Map.empty[Long, Long]
    def lv(v: Long): Long = memo.getOrElseUpdate(v,
      preds.get(v).map(ps => ps.map(lv).max + 1L).getOrElse(0L))
    nodes.map(v => v -> lv(v)).toMap
  }
}

object CoCitationSpecFixtures {
  // citers 0..3; 3 is a hub (out-degree 4, above cap 3); cited 10..13
  val directed: Seq[(Long, Long)] = Seq(
    (0L, 10L), (0L, 11L), (1L, 10L), (1L, 11L), (1L, 12L), (2L, 11L),
    (2L, 12L), (3L, 10L), (3L, 11L), (3L, 12L), (3L, 13L),
    // and some citing structure for coupling: 10..12 each cite 20/21
    (10L, 20L), (10L, 21L), (11L, 20L), (11L, 21L), (12L, 21L))
}

class CoCitationSpec extends GraftSuite {
  val directed: Seq[(Long, Long)] = CoCitationSpecFixtures.directed

  test("co-citation matches the brute-force oracle and applies the hub cap") {
    val got = CoCitation.coCitation(edgesDf(directed), maxOutDeg = 3, minCount = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val want = Round4cOracles.coCitationBrute(directed, maxOutDeg = 3, minCount = 2)
    assert(got === want)
    // the capped hub 3 must not contribute: without the cap (10,13) would
    // appear with n=1 — and (10,11) would be 3, not 2
    assert(got((10L, 11L)) === 2L)
    assert(!got.contains((10L, 13L)))
  }

  test("coupling is co-citation on the transposed graph") {
    val got = CoCitation.coupling(edgesDf(directed), maxInDeg = 3, minCount = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val want = Round4cOracles.coCitationBrute(
      directed.map(p => (p._2, p._1)), maxOutDeg = 3, minCount = 2)
    assert(got === want)
    // 1 and 3 share cited pages 10 and 12; 11 (in-degree 4 > cap) is
    // dropped, which is exactly why (0,1) — sharing only {10, 11} — is out
    assert(got((1L, 3L)) === 2L)
    assert(!got.contains((0L, 1L)))
  }
}

class CondensationSpec extends GraftSuite {

  // two 3-cycles (0-1-2, 10-11-12), a bridge between them, a tail chain
  // 20→21, and an edge from the second cycle into the tail
  val directed: Seq[(Long, Long)] = Seq(
    (0L, 1L), (1L, 2L), (2L, 0L),
    (10L, 11L), (11L, 12L), (12L, 10L),
    (2L, 10L),
    (12L, 20L), (20L, 21L))

  test("condense contracts SCCs to canonical labels with inter-SCC edges") {
    val (labels, compEdges) = StronglyConnected.condense(edgesDf(directed))
    val lab = labelsMap(labels)
    assert(Seq(0L, 1L, 2L).map(lab).toSet === Set(0L))
    assert(Seq(10L, 11L, 12L).map(lab).toSet === Set(10L))
    assert(lab(20L) === 20L && lab(21L) === 21L)
    val ce = compEdges.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(ce === Set((0L, 10L), (10L, 20L), (20L, 21L)))
  }

  test("dagLevels computes longest-path depth and matches the memoized oracle") {
    val (_, compEdges) = StronglyConnected.condense(edgesDf(directed))
    val got = labelsMap(StronglyConnected.dagLevels(compEdges))
    val ce = compEdges.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got === Round4cOracles.dagLevelsBrute(ce))
    assert(got === Map(0L -> 0L, 10L -> 1L, 20L -> 2L, 21L -> 3L))
  }

  test("dagLevels takes the LONGEST path when a short-cut exists") {
    // diamond with a shortcut: 0→1→2→3 and 0→3 — level(3) must be 3
    val ce = edgesDf(Seq((0L, 1L), (1L, 2L), (2L, 3L), (0L, 3L)))
      .select(col("src").as("csrc"), col("dst").as("cdst"))
    val got = labelsMap(StronglyConnected.dagLevels(ce))
    assert(got === Map(0L -> 0L, 1L -> 1L, 2L -> 2L, 3L -> 3L))
  }

  test("dagLevels rejects cyclic input instead of looping") {
    val ce = edgesDf(Seq((0L, 1L), (1L, 0L)))
      .select(col("src").as("csrc"), col("dst").as("cdst"))
    val ex = intercept[IllegalArgumentException] {
      StronglyConnected.dagLevels(ce, maxRounds = 10)
    }
    assert(ex.getMessage.contains("cycle"))
  }
}

class SpanningForestSpec extends GraftSuite {

  /** Kruskal with union-find — the sequential MSF oracle. */
  private def kruskal(edges: Seq[(Long, Long, Long)]): Set[(Long, Long, Long)] = {
    val canon = edges.filter(e => e._1 != e._2)
      .map(e => (math.min(e._1, e._2), math.max(e._1, e._2), e._3))
      .groupBy(e => (e._1, e._2)).map(_._2.minBy(_._3)).toSeq
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    val out = scala.collection.mutable.Set.empty[(Long, Long, Long)]
    canon.sortBy(e => (e._3, e._1, e._2)).foreach { case (a, b, w) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { parent(math.max(ra, rb)) = math.min(ra, rb); out += ((a, b, w)) }
    }
    out.toSet
  }

  private def weighted(pairs: Seq[(Long, Long)]): Seq[(Long, Long, Long)] =
    pairs.map { case (a, b) =>
      val (lo, hi) = (math.min(a, b), math.max(a, b))
      // pseudo-random but unique weights: mix then pack the pair id
      (a, b, (lo * 31 + hi * 17) % 23 * 10000 + lo * 100 + hi)
    }

  private def runBoruvka(edges: Seq[(Long, Long, Long)]): Set[(Long, Long, Long)] = {
    import spark.implicits._
    graft.algo.SpanningForest.boruvka(edges.toDF("src", "dst", "weight"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
  }

  test("Boruvka equals Kruskal on the weighted karate graph") {
    val edges = weighted(Fixtures.karatePairs)
    val got = runBoruvka(edges)
    assert(got === kruskal(edges))
    assert(got.size === 33) // connected, 34 vertices
  }

  test("forest size is V minus component count on a disconnected graph") {
    val edges = weighted(Fixtures.twoCliquesBridge.filterNot(_ == (3L -> 10L)) ++
      Seq((20L, 21L), (21L, 22L)))
    val got = runBoruvka(edges)
    assert(got === kruskal(edges))
    assert(got.size === 11 - 3) // components {0-3}, {10-13}, {20-22}
  }

  test("parallel edges keep the lightest; duplicate-pair weights canonicalize") {
    val edges = Seq((0L, 1L, 50L), (1L, 0L, 10L), (0L, 1L, 30L), (1L, 2L, 20L))
    val got = runBoruvka(edges)
    assert(got === Set((0L, 1L, 10L), (1L, 2L, 20L)))
  }
}

class RedirectsSpec extends GraftSuite {

  /** Brute-force chain follow with a step cap. */
  private def follow(f: Map[Long, Long], u: Long, steps: Int): Long = {
    var cur = u
    var i = 0
    while (i < steps && f.contains(cur)) { cur = f(cur); i += 1 }
    cur
  }

  test("chains resolve to terminals, cycles stay unresolved") {
    // chain 1→2→3→0 (terminal 0), cycle 5↔6, self-contained chain 8→9
    val f = Seq((1L, 2L), (2L, 3L), (3L, 0L), (5L, 6L), (6L, 5L), (8L, 9L))
    val got = graft.algo.Redirects.resolve(edgesDf(f), doublings = 4)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    val fm = f.toMap
    f.map(_._1).foreach { u =>
      assert(got(u)._1 === follow(fm, u, 16), s"target($u)")
    }
    assert(got(1L) === ((0L, true)))
    assert(got(8L) === ((9L, true)))
    assert(!got(5L)._2 && !got(6L)._2)
  }

  test("a chain of length 12 resolves in 4 doublings but not in 3") {
    val chain = (0L until 12L).map(i => i -> (i + 1)) // 12 hops to terminal 12
    val r4 = graft.algo.Redirects.resolve(edgesDf(chain), doublings = 4)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    assert(r4(0L) === ((12L, true)))
    val r3 = graft.algo.Redirects.resolve(edgesDf(chain), doublings = 3)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    assert(r3(0L) === ((8L, false))) // 2^3 steps land mid-chain, still redirecting
    assert(r3(4L) === ((12L, true)))
  }
}

class RelatedTopKSpec extends GraftSuite {

  test("per-page top-k matches the expanded brute-force ranking") {
    val directed = CoCitationSpecFixtures.directed
    val got = CoCitation.relatedTopK(edgesDf(directed), k = 2,
        maxOutDeg = 3, minCount = 2)
      .collect().map(r => (r.getLong(0), r.getLong(3)) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    val pairs = Round4cOracles.coCitationBrute(directed, maxOutDeg = 3, minCount = 2)
    val expanded = pairs.toSeq.flatMap { case ((u, v), n) =>
      Seq((u, v, n), (v, u, n))
    }
    val want = expanded.groupBy(_._1).flatMap { case (page, rows) =>
      rows.sortBy(r => (-r._3, r._2)).take(2).zipWithIndex.map {
        case ((_, rel, n), i) => (page, i + 1L) -> ((rel, n))
      }
    }
    assert(got === want)
  }
}

class RmatSpec extends GraftSuite {

  test("deterministic, bounded, and skewed") {
    val e = graft.sources.Rmat.edges(spark, nEdges = 4000, scale = 8, seed = 7L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val e2 = graft.sources.Rmat.edges(spark, nEdges = 4000, scale = 8, seed = 7L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(e.toSeq === e2.toSeq)
    assert(e.length === 4000)
    assert(e.forall { case (_, s, d) => s >= 0 && s < 256 && d >= 0 && d < 256 })
    // R-MAT's defining property: in-degree skew well above uniform
    val inDeg = e.groupBy(_._3).view.mapValues(_.size).values
    assert(inDeg.max > 4 * (4000 / 256), s"max in-degree ${inDeg.max} not skewed")
    // a different seed moves the draw
    val e3 = graft.sources.Rmat.edges(spark, nEdges = 4000, scale = 8, seed = 8L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(e3.toSeq !== e.toSeq)
  }

  test("generation plan has no exchange — embarrassingly parallel") {
    val plan = graft.sources.Rmat.edges(spark, 1000, 8)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle in:\n$plan")
  }
}

class WebtextStatsSpec extends GraftSuite {

  private def docsDf(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  private def run(name: String, rows: Seq[(Long, String)]) = {
    val dir = java.nio.file.Files.createTempDirectory("graft_wt").toString
    docsDf(rows).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    PipelineQueries.queries(name)(spark, dir)
  }

  test("d_repetition: duplicate 2-gram fraction matches hand counts") {
    val rows = Seq(
      1L -> "a b a b a",       // 2-grams: ab ba ab ba → 4 total, 2 distinct
      2L -> "x y z",           // 2 total, 2 distinct → 0
      3L -> "w")               // no 2-grams → all zeros
    val got = run("d_repetition", rows)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got(1L) === ((4L, 2L, 500000L)))
    assert(got(2L) === ((2L, 2L, 0L)))
    assert(got(3L) === ((0L, 0L, 0L)))
  }

  test("d_boilerplate: corpus-frequent shingles flagged, fraction exact") {
    // the shingle "t u v" appears in 5 docs (df=5 ≥ 5 → boilerplate);
    // every doc also has one unique shingle
    val rows = (1L to 5L).map(i => i -> s"t u v unique$i tail$i extra$i") :+
      (9L -> "only unique shingles here nothing shared")
    val got = run("d_boilerplate", rows)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    (1L to 5L).foreach { i =>
      val (total, boiler) = got(i)
      assert(boiler === 1L, s"doc $i boiler")
      assert(total === 4L, s"doc $i total") // 6 tokens → 4 shingles
    }
    assert(got(9L)._2 === 0L)
  }
}
