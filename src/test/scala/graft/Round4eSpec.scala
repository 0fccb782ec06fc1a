package graft

import org.apache.spark.sql.functions._
import graft.algo.TriangleCount
import graft.measures.Measures

/** Partition-agreement measures (ARI, purity) and per-edge overlap. */
class AriPuritySpec extends GraftSuite {
  import spark.implicits._

  private def df(xs: Seq[(Long, Long)]) = xs.toDF("id", "label")

  test("adjustedRandIndex on the textbook 4-point example is 4/7") {
    // true = [0,0,1,2], pred = [0,0,1,1]:
    // index=1, rowPairs=1, colPairs=2, allPairs=6 → ARI = (6−2)/(9−2)=4/7
    val t = df(Seq((1L, 0L), (2L, 0L), (3L, 1L), (4L, 2L)))
    val p = df(Seq((1L, 0L), (2L, 0L), (3L, 1L), (4L, 1L)))
    assert(math.abs(Measures.adjustedRandIndex(t, p) - 4.0 / 7.0) < 1e-12)
    val r = Measures.pairCounts(t, p).first()
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      === ((1L, 1L, 2L, 6L, 4L)))
    val pur = Measures.purityCounts(t, p).first()
    assert((pur.getLong(0), pur.getLong(1)) === ((3L, 4L)))
  }

  test("ARI is 1 on identical partitions and matches a pair-counting oracle") {
    val rnd = new scala.util.Random(7)
    val n = 60
    val t = df((1 to n).map(i => (i.toLong, rnd.nextInt(4).toLong)))
    val p = df((1 to n).map(i => (i.toLong, rnd.nextInt(5).toLong)))
    assert(Measures.adjustedRandIndex(t, t) === 1.0)

    // independent oracle: Rand pair counting over all C(n,2) vertex pairs
    val tm = t.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val pm = p.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ids = tm.keys.toSeq.sorted
    var a = 0L; var rowP = 0L; var colP = 0L
    for (i <- ids.indices; j <- (i + 1) until ids.size) {
      val (u, v) = (ids(i), ids(j))
      val st = tm(u) == tm(v); val sp = pm(u) == pm(v)
      if (st && sp) a += 1
      if (st) rowP += 1
      if (sp) colP += 1
    }
    val all = ids.size.toLong * (ids.size - 1) / 2
    val expected = (all * a - rowP * colP).toDouble /
      (all * (rowP + colP) / 2 - rowP * colP).toDouble
    assert(math.abs(Measures.adjustedRandIndex(t, p) - expected) < 1e-12)
  }
}

class SimRankSpec extends GraftSuite {

  /** Sequential replay of the exact integer two-iteration SimRank. */
  private def oracle(edges: Seq[(Long, Long)], scale: Long, cNum: Long,
                     cDen: Long): Map[(Long, Long), (Long, Long, Long)] = {
    val e = edges.distinct
    val in = e.groupBy(_._2).view.mapValues(_.map(_._1)).toMap
    val out = e.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val nodes = (e.map(_._1) ++ e.map(_._2)).distinct
    def cn(a: Long, b: Long): Long =
      (in.getOrElse(a, Nil).toSet intersect in.getOrElse(b, Nil).toSet).size.toLong
    def d(v: Long): Long = in.getOrElse(v, Nil).size.toLong
    val s1 = (for {
      a <- nodes; b <- nodes if a != b && d(a) > 0 && d(b) > 0
      c = cn(a, b) if c > 0
    } yield (a, b) -> cNum * scale * c / (cDen * d(a) * d(b))).toMap
    val res = for {
      a <- nodes; b <- nodes if a < b && d(a) > 0 && d(b) > 0
      tOff = (for {
        i <- in(a); j <- in(b) if i != j
      } yield s1.getOrElse((i, j), 0L)).sum
      c = cn(a, b)
      s2 = cNum * (c * scale + tOff) / (cDen * d(a) * d(b))
      if s2 > 0
    } yield (a, b) -> ((c, s1.getOrElse((a, b), 0L), s2))
    res.toMap
  }

  test("simRankT2 replays the sequential exact-integer iteration") {
    // directed graph with hubs, sinks, and shared in-neighbors
    val edges = Seq(
      (1L, 3L), (2L, 3L), (1L, 4L), (2L, 4L), (5L, 4L),
      (3L, 5L), (4L, 5L), (3L, 6L), (4L, 6L), (1L, 6L),
      (6L, 7L), (5L, 7L), (7L, 1L), (7L, 2L), (6L, 2L))
    val got = graft.algo.SimRank.simRankT2(edgesDf(edges)).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    val exp = oracle(edges, 1000000L, 4L, 5L)
    assert(got === exp)
    // spot-check semantics: pages 3 and 4 share in-neighbors {1,2}
    assert(exp((3L, 4L))._1 === 2L)
  }

  test("symmetric pairs agree and diagonal is excluded") {
    val edges = Seq((1L, 2L), (1L, 3L), (4L, 2L), (4L, 3L), (2L, 4L))
    val rows = graft.algo.SimRank.simRankT2(edgesDf(edges)).collect()
    assert(rows.forall(r => r.getLong(0) < r.getLong(1)))
    val exp = oracle(edges, 1000000L, 4L, 5L)
    assert(rows.map(r => (r.getLong(0), r.getLong(1))).toSet === exp.keySet)
  }
}

class Bm25Spec extends GraftSuite {
  import spark.implicits._

  test("scoreTopDfTerms matches a sequential replay of the exact formula") {
    val texts = Seq(
      "data systems process data fast",
      "data lakes store data and more data",
      "systems think in rows",
      "fast fast fast")
    val docsDf = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val toks = texts.map(_.split(" ").toSeq)
    val n = toks.size.toLong
    val total = toks.map(_.size.toLong).sum
    val df = toks.flatMap(_.distinct).groupBy(identity).view.mapValues(_.size.toLong)
    val query = df.toSeq.sortBy { case (t, d) => (-d, t) }.take(3)
    def score(tf: Long, dfT: Long, len: Long): Long =
      math.round(math.log((2 * n + 2).toDouble / (2 * dfT + 1)) *
        ((22 * tf * total).toDouble /
          (10 * tf * total + 3 * total + 9 * len * n)) * 1000000)

    val got = graft.text.Bm25.scoreTopDfTerms(docsDf, 3).collect()
      .map(r => (r.getLong(0), r.getString(1)) -> ((r.getLong(2), r.getLong(3))))
      .toMap
    val exp = (for {
      (ts, i) <- toks.zipWithIndex
      (qt, qdf) <- query
      tf = ts.count(_ == qt) if tf > 0
    } yield (i.toLong, qt) -> ((tf.toLong, score(tf, qdf, ts.size.toLong)))).toMap
    assert(got === exp)
    // saturation sanity: more occurrences score higher, all else equal
    val d1 = got.get((0L, "data")).map(_._2)
    val d2 = got.get((1L, "data")).map(_._2)
    assert(d1.nonEmpty && d2.nonEmpty)
  }

  test("longer documents score lower at equal tf (length normalization)") {
    val docsDf = Seq(
      (1L, "term alpha"),
      (2L, "term alpha beta gamma delta epsilon zeta eta theta")
    ).toDF("doc_id", "text")
    val rows = graft.text.Bm25.scoreTopDfTerms(docsDf, 10)
      .filter(col("term") === "term").collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(rows(1L) > rows(2L))
  }
}

class WlRefinementSpec extends GraftSuite {

  test("WL colors: cycles are color-transitive, bridge endpoints separate") {
    // 6-cycle: vertex-transitive → ONE color class at every depth
    val cyc = undirected((0L to 5L).map(i => (i, (i + 1) % 6)))
    val c = graft.algo.WlRefinement.refine(edgesDf(cyc), 3).collect()
    assert(c.map(_.getString(1)).distinct.length === 1)

    // two cliques + bridge: clique members split from bridge endpoints
    val g = undirected(Fixtures.twoCliquesBridge)
    val hist = graft.algo.WlRefinement.colorHistogram(edgesDf(g), 2)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // 3 roles by symmetry: 2 bridge endpoints, their 6 clique peers... —
    // at depth 2 the non-bridge vertices of each clique are equivalent
    assert(hist.values.toSeq.sorted === Seq(2L, 6L))
  }

  test("WL histogram is isomorphism-invariant across relabeled copies") {
    val g1 = undirected(Fixtures.karatePairs)
    val g2 = undirected(Fixtures.karatePairs.map { case (a, b) =>
      (a * 7 % 1009, b * 7 % 1009) // injective relabel on this id range
    })
    def h(g: Seq[(Long, Long)]) =
      graft.algo.WlRefinement.colorHistogram(edgesDf(g), 2)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(h(g1) === h(g2))
  }
}

class BfsParentsSpec extends GraftSuite {

  test("parents are min-id previous-level neighbors; roots self-parent") {
    val slots = undirected(Fixtures.karatePairs)
    val src = edgesDf(slots).select(col("src").as("id")).distinct()
      .filter(col("id") === 1L)
    val rows = graft.algo.Betweenness.bfsParents(edgesDf(slots), src)
      .collect().map(r => (r.getLong(1), (r.getLong(2), r.getLong(3)))).toMap
    val nbr = slots.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(rows(1L) === ((0L, 1L))) // root
    rows.foreach { case (v, (dist, parent)) =>
      if (v != 1L) {
        assert(nbr(v).contains(parent), s"parent($v) not a neighbor")
        assert(rows(parent)._1 === dist - 1, s"parent($v) wrong level")
        val best = nbr(v).filter(u => rows.get(u).exists(_._1 == dist - 1)).min
        assert(parent === best, s"parent($v) not minimal")
      }
    }
    // BFS tree spans everything the levels reach
    assert(rows.size === 34)
  }
}

class StreamDedupSpec extends GraftSuite {
  import spark.implicits._

  test("cross-batch duplicates are dropped by the state store (2 files, 1 per trigger)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-dedup").toString
    def mk(rows: Seq[(Long, Long, String)], f: String): Unit =
      rows.toDF("user_id", "k0", "ets")
        .select(col("user_id"), col("ets").cast("timestamp").as("ts"),
          concat(lit("{\"k\": "), col("k0"), lit("}")).as("props"))
        .coalesce(1).write.parquet(s"$dir/$f")
    // batch 1: keys (1,10) (2,20); batch 2 repeats (1,10) and adds (3,30)
    mk(Seq((1L, 10L, "2024-01-01 00:00:00"), (2L, 20L, "2024-01-01 00:01:00")), "f1")
    mk(Seq((1L, 10L, "2024-01-01 00:02:00"), (3L, 30L, "2024-01-01 00:03:00")), "f2")
    val flat = new java.io.File(dir)
    // move part files up so the stream dir lists exactly 2 files
    val files = flat.listFiles.filter(_.isDirectory).flatMap(_.listFiles)
      .filter(_.getName.endsWith(".parquet"))
    assert(files.length === 2)
    val streamDir = java.nio.file.Files.createTempDirectory("graft-dedup-s")
    files.zipWithIndex.foreach { case (f, i) =>
      java.nio.file.Files.copy(f.toPath, streamDir.resolve(s"b$i.parquet"))
    }
    val got = graft.streaming.EventStreams
      .runDedupStream(spark, streamDir.toString, "dedup_xbatch",
        maxFilesPerTrigger = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((1L, 10L), (2L, 20L), (3L, 30L)))
  }

  test("stream dedup equals batch DISTINCT on the events fixture") {
    val path = "/root/testdata/sf0.001/events.parquet"
    val got = graft.streaming.EventStreams
      .runDedupStream(spark, path, "dedup_parity")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exp = spark.read.parquet(path)
      .select(col("user_id"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .filter(col("k").isNotNull).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === exp)
  }
}

class NgramLmSpec extends GraftSuite {
  import spark.implicits._

  test("kneserNey matches a sequential exact-fraction replay") {
    val texts = Seq(
      "the cat sat on the mat",
      "the cat ate the fish",
      "a cat sat on a mat",
      "the dog sat on the mat")
    val docsDf = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")

    // sequential oracle
    val big = texts.flatMap(t => t.split(" ").sliding(2).map(a => (a(0), a(1))))
    val c12 = big.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val c1 = big.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val n1p = c12.keys.toSeq.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val nl = c12.keys.toSeq.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val np = c12.size.toLong
    def pE9(w1: String, w2: String): Long =
      ((4 * c12((w1, w2)) - 3) * np + 3 * n1p(w1) * nl(w2)) * 1000000000L /
        (4 * c1(w1) * np)

    val got = graft.text.NgramLm.kneserNey(docsDf, minCount = 1L, topK = 100)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    assert(got.keySet === c12.keySet)
    got.foreach { case ((w1, w2), (c, p)) =>
      assert(c === c12((w1, w2)), s"c12($w1,$w2)")
      assert(p === pE9(w1, w2), s"p($w2|$w1)")
    }
    // interpolated-KN property: over the FULL continuation vocabulary
    // (unseen w2 get pure backoff mass D·n1p/c1·P_cont), each context's
    // probabilities sum to exactly 1
    val vocab = nl.keySet
    c1.keys.foreach { w1 =>
      val s = vocab.toSeq.map { w2 =>
        val seen = c12.getOrElse((w1, w2), 0L)
        val numer = (if (seen > 0) (4 * seen - 3) * np else 0L) +
          3 * n1p(w1) * nl(w2)
        numer.toDouble / (4 * c1(w1) * np)
      }.sum
      assert(math.abs(s - 1.0) < 1e-12, s"p(.|$w1) sums to $s, not 1")
    }
  }

  test("topK ranking is (p desc, w2 asc) and minCount filters rare bigrams") {
    val docsDf = Seq((1L, "x a x a x b x b x c")).toDF("doc_id", "text")
    val rows = graft.text.NgramLm.kneserNey(docsDf, minCount = 2L, topK = 2)
      .filter(col("w1") === "x").collect()
      .map(r => (r.getString(1), r.getLong(4)))
    // c(x,a)=c(x,b)=2, c(x,c)=1 filtered; tie on p → w2 asc
    assert(rows.sortBy(_._2).map(_._1).toSeq === Seq("a", "b"))
  }
}

class TemporalReachSpec extends GraftSuite {
  import spark.implicits._

  test("earliestArrival respects time ordering — late edges cannot feed early ones") {
    // 1 →(t=5) 2 →(t=3) 3: the 2→3 edge departs BEFORE 2 is reachable,
    // so 3 is unreachable; 2 →(t=9) 4 works (9 ≥ 5)
    val te = Seq((1L, 2L, 5L), (2L, 3L, 3L), (2L, 4L, 9L)).toDF("src", "dst", "t")
    val src = Seq(Tuple1(1L)).toDF("id")
    val got = graft.algo.ShortestPaths.earliestArrival(te, src, rounds = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 0L, 2L -> 5L, 4L -> 9L))
  }

  test("earliestArrival picks the minimum over admissible parallel paths") {
    val te = Seq(
      (1L, 2L, 2L), (1L, 2L, 7L),           // parallel contacts, min wins
      (2L, 3L, 4L),                          // admissible via arr(2)=2
      (1L, 3L, 10L)                          // direct but later
    ).toDF("src", "dst", "t")
    val src = Seq(Tuple1(1L)).toDF("id")
    val got = graft.algo.ShortestPaths.earliestArrival(te, src, rounds = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 0L, 2L -> 2L, 3L -> 4L))
  }
}

class DomainMixSpec extends GraftSuite {
  import spark.implicits._

  /** Sequential waterfilling: binary-search-free exact scan. */
  private def tauOf(tokens: Seq[Long], budget: Long): Long = {
    val sorted = tokens.sorted
    var spent = 0L
    sorted.zipWithIndex.foreach { case (t, i) =>
      val rem = sorted.size - i
      val cand = (budget - spent) / rem
      if (t > cand) return cand
      spent += t
    }
    sorted.max
  }

  test("waterfill matches the sequential scan and exhausts the budget") {
    val rnd = new scala.util.Random(11)
    for (trial <- 1 to 8) {
      val ts = (1 to 20).map(i => s"h$i" -> (rnd.nextInt(1000).toLong + 1))
      val total = ts.map(_._2).sum
      val budget = trial match {
        case 1 => 0L
        case 2 => total     // everything funded
        case 3 => total * 2 // slack budget
        case _ => total / (trial - 2)
      }
      val got = graft.text.DomainMix.waterfill(ts.toDF("host", "tokens"), budget)
        .collect().map(r => r.getString(0) ->
          ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
      val tau = tauOf(ts.map(_._2), budget)
      ts.foreach { case (h, t) =>
        val (gt, gTau, gAlloc) = got(h)
        assert(gt === t)
        assert(gTau === tau, s"trial $trial tau")
        assert(gAlloc === math.min(t, tau))
      }
      val allocSum = got.values.map(_._3).sum
      assert(allocSum <= budget || allocSum === total.min(budget) ||
        budget >= total)
      // maximality: raising tau by 1 must exceed the budget (when capped)
      if (tau < ts.map(_._2).max) {
        val plus = ts.map { case (_, t) => math.min(t, tau + 1) }.sum
        assert(plus > budget)
      }
    }
  }
}

class EdgeOverlapSpec extends GraftSuite {

  test("edgeOverlap matches brute-force neighborhoods on karate") {
    val slots = undirected(Fixtures.karatePairs)
    val nbr = slots.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val got = TriangleCount.edgeOverlap(edgesDf(slots)).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    val canon = slots.filter(e => e._1 < e._2)
    assert(got.size === canon.size)
    canon.foreach { case (u, v) =>
      val common = (nbr(u) intersect nbr(v)).size.toLong
      val union = (nbr(u) union nbr(v)).size.toLong - 2 // drop u, v themselves
      val (gc, gu, go) = got((u, v))
      assert(gc === common, s"common($u,$v)")
      assert(gu === union, s"union($u,$v)")
      val exp = if (union == 0) 1.0 else common.toDouble / union
      assert(math.abs(go - exp) < 1e-12, s"overlap($u,$v)")
    }
  }

  test("a bridge edge has overlap 0; a triangle edge in K3 has overlap 1") {
    val bridge = TriangleCount.edgeOverlap(edgesDf(undirected(Seq((1L, 2L)))))
      .first()
    assert(bridge.getLong(2) === 0L && bridge.getDouble(4) === 1.0) // K2: union empty → 1 by convention
    val k3 = TriangleCount
      .edgeOverlap(edgesDf(undirected(Seq((1L, 2L), (2L, 3L), (1L, 3L)))))
      .collect()
    assert(k3.forall(r => r.getLong(2) === 1L && r.getDouble(4) === 1.0))
    val path = TriangleCount
      .edgeOverlap(edgesDf(undirected(Seq((1L, 2L), (2L, 3L)))))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(4))).toMap
    assert(path((1L, 2L)) === 0.0 && path((2L, 3L)) === 0.0)
  }
}
