package graft

import graft.graph.GraphOps
import graft.measures.Measures
import org.apache.spark.sql.functions._

class GraphOpsSpec extends GraftSuite {
  import spark.implicits._

  test("symmetrize stores both directions, dedup'd") {
    val e = edgesDf(Seq((1L, 2L), (1L, 2L), (2L, 3L)))
    val s = GraphOps.symmetrize(e).as[(Long, Long)].collect().toSet
    assert(s === Set((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L)))
  }

  test("canonical keeps one row per unordered pair, drops self loops") {
    val e = edgesDf(Seq((2L, 1L), (1L, 2L), (3L, 3L), (2L, 3L)))
    val c = GraphOps.canonical(e).as[(Long, Long)].collect().toSet
    assert(c === Set((1L, 2L), (2L, 3L)))
  }

  test("degrees match CSR extents semantics") {
    val slots = undirected(Seq((1L, 2L), (1L, 3L)))
    val d = GraphOps.degrees(edgesDf(slots)).as[(Long, Long)].collect().toMap
    assert(d === Map(1L -> 2L, 2L -> 1L, 3L -> 1L))
  }

  test("dictionaryEncode assigns ids in lexicographic name order (std::map parity)") {
    val names = Seq("zeta", "alpha", "mid", "alpha").toDF("name")
    val d = GraphOps.dictionaryEncode(names).as[(String, Long)].collect().toMap
    assert(d === Map("alpha" -> 0L, "mid" -> 1L, "zeta" -> 2L))
  }

  test("scalable dictionary encode equals window form") {
    val names = (1 to 500).map(i => s"n${i % 97}_$i").toDF("name")
    val a = GraphOps.dictionaryEncode(names).as[(String, Long)].collect().toMap
    val b = GraphOps.dictionaryEncodeScalable(names).as[(String, Long)].collect().toMap
    assert(a === b)
  }

  test("degreeReorder puts low-degree vertices first (sorted=1 parity)") {
    // star: hub 0 with 3 leaves
    val slots = undirected(Seq((0L, 1L), (0L, 2L), (0L, 3L)))
    val m = GraphOps.degreeReorder(edgesDf(slots)).as[(Long, Long)].collect().toMap
    assert(m(0L) === 3L) // hub last
    assert(Set(m(1L), m(2L), m(3L)) === Set(0L, 1L, 2L))
  }

  test("adjacency test marks exactly the edge pairs") {
    val slots = undirected(Seq((1L, 2L), (2L, 3L)))
    val pairs = Seq((1L, 2L), (1L, 3L), (3L, 2L)).toDF("src", "dst")
    val got = GraphOps.adjacent(edgesDf(slots), pairs)
      .as[(Long, Long)].collect().toSet
    assert(got === Set((1L, 2L), (3L, 2L)))
  }

  test("permutation is a seeded deterministic reordering of the vertex set") {
    val verts = (0L until 20L).toDF("id")
    val p1 = GraphOps.permutation(verts, 7L).as[Long].collect().toSeq
    val p2 = GraphOps.permutation(verts, 7L).as[Long].collect().toSeq
    val p3 = GraphOps.permutation(verts, 8L).as[Long].collect().toSeq
    assert(p1 === p2)
    assert(p1.sorted === (0L until 20L))
    assert(p1 !== p3)
  }

  test("CSR blocks round-trip to COO") {
    val slots = undirected(Fixtures.twoCliquesBridge)
    val back = GraphOps.cooFromCsr(GraphOps.csrBlocks(edgesDf(slots)))
      .as[(Long, Long)].collect().toSet
    assert(back === slots.toSet)
  }
}

class MeasuresSpec extends GraftSuite {

  test("algebraic modularity equals the reference's naive O(n²) formula") {
    val rnd = new scala.util.Random(3)
    for (_ <- 1 to 4) {
      val n = 5 + rnd.nextInt(15)
      val pairs = (for {
        i <- 0L until n; j <- (i + 1) until n
        if rnd.nextDouble() < 0.3
      } yield (i, j)).toSeq
      if (pairs.nonEmpty) {
        val slots = undirected(pairs)
        val labels = (0L until n).map(i => i -> (i % 3)).toMap
        val labelsDf = {
          import spark.implicits._
          labels.toSeq.toDF("id", "label")
        }
        val got = Measures.modularity(edgesDf(slots), labelsDf)
        val want = Oracles.modularityNaive(slots, labels)
        assert(math.abs(got - want) < 1e-9, s"n=$n")
      }
    }
  }

  test("karate 2-faction modularity matches reference accounting (0.4213)") {
    // The reference's getModularity sums over i≠j only
    // (`community_measures.cu:56`), i.e. textbook Q (0.3715) PLUS the
    // diagonal Σk²/4m² (0.0498) — consistent with its published karate
    // values ~0.4215 (`tests/results/kar01.tst`).
    import spark.implicits._
    val slots = undirected(Fixtures.karatePairs)
    val hi = Set(1L, 2L, 3L, 4L, 5L, 6L, 7L, 8L, 11L, 12L, 13L, 14L, 17L, 18L, 20L, 22L)
    val labels = (1L to 34L).map(i => (i, if (hi(i)) 0L else 1L)).toDF("id", "label")
    val q = Measures.modularity(edgesDf(slots), labels)
    assert(math.abs(q - 0.4213) < 1e-3)
    // cross-check the textbook value by restoring the diagonal term
    val m2 = slots.size.toDouble
    val sumKsq = slots.groupBy(_._1).map(_._2.size.toDouble).map(k => k * k).sum
    assert(math.abs((q - sumKsq / (m2 * m2)) - 0.3715) < 1e-3)
  }

  test("NMI(x, x) = 1 and NMI is in [0,1] vs ground truth") {
    import spark.implicits._
    val labels = (1L to 34L).map(i => (i, i % 4)).toDF("id", "label")
    assert(math.abs(Measures.nmi(labels, labels) - 1.0) < 1e-9)
    val other = (1L to 34L).map(i => (i, i % 3)).toDF("id", "label")
    val v = Measures.nmi(labels, other)
    assert(v >= -1e-9 && v <= 1.0 + 1e-9)
  }

  test("confusion matrix cells are exact") {
    import spark.implicits._
    val t = Seq((1L, 0L), (2L, 0L), (3L, 1L)).toDF("id", "label")
    val p = Seq((1L, 5L), (2L, 6L), (3L, 6L)).toDF("id", "label")
    val cm = Measures.confusionMatrix(t, p).as[(Long, Long, Long)].collect().toSet
    assert(cm === Set((0L, 5L, 1L), (0L, 6L, 1L), (1L, 6L, 1L)))
  }

  test("community count exact") {
    import spark.implicits._
    val labels = Seq((1L, 7L), (2L, 7L), (3L, 9L)).toDF("id", "label")
    assert(Measures.communityCount(labels) === 2L)
  }
}
