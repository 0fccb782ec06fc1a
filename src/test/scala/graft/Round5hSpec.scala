package graft

import org.apache.spark.sql.functions._

/** Round-5 batch-15: graph sharding — balanced LP partitioning, layout
  * audits, vertex-cut baseline.
  */
class PartitionSpec extends GraftSuite {
  import graft.graph.Partition

  // two 4-cliques joined by one bridge (4, 11), symmetrized slots
  private def twoCliques = {
    val a = for { x <- 1L to 4L; y <- 1L to 4L if x != y } yield (x, y)
    val b = for { x <- 11L to 14L; y <- 11L to 14L if x != y } yield (x, y)
    edgesDf((a ++ b ++ Seq((4L, 11L), (11L, 4L))).toSeq)
  }

  test("balanced LP converges to the two cliques under a 1.5x cap") {
    val m = labelsMap(Partition.balancedLp(twoCliques, k = 2, iters = 2,
      capNum = 3L, capDen = 2L))
    val a = (1L to 4L).map(m)
    val b = (11L to 14L).map(m)
    assert(a.toSet.size === 1 && b.toSet.size === 1 && a.head != b.head)
  }

  test("a zero-headroom cap admits no moves: layout stays the hash init") {
    // capNum = capDen gives cap = n/k exactly = the initial sizes
    val m = labelsMap(Partition.balancedLp(twoCliques, k = 2, iters = 2,
      capNum = 1L, capDen = 1L))
    (Seq(1L, 2L, 3L, 4L, 11L, 12L, 13L, 14L)).foreach { id =>
      assert(m(id) === id % 2, s"vertex $id moved despite zero quota")
    }
  }

  test("cutQuality on the converged layout: bridge-only cut, perfect balance") {
    val e = twoCliques
    val assign = Partition.balancedLp(e, k = 2, iters = 2,
      capNum = 3L, capDen = 2L)
    val r = Partition.cutQuality(e, assign).first()
    assert(r.getLong(0) === 8L)    // n_vertices
    assert(r.getLong(1) === 26L)   // 12 + 12 + 2 directed slots
    assert(r.getLong(2) === 2L)    // both bridge slots cross
    assert(r.getLong(3) === 2L * 1000000L / 26L)
    assert(r.getLong(4) === 1000000L) // 4 * 2 / 8
  }

  test("vertex-cut stats: k=1 means one replica per vertex exactly") {
    val r = graft.graph.Partition.vertexCutStats(twoCliques, k = 1).first()
    assert(r.getLong(0) === 1L)
    assert(r.getLong(1) === 8L)
    assert(r.getLong(2) === 8L)
    assert(r.getLong(3) === 1000000L)
  }

  test("vertex-cut replication grows with k but never exceeds degree+1") {
    val r = graft.graph.Partition.vertexCutStats(twoCliques, k = 8).first()
    val rf = r.getLong(3)
    assert(rf >= 1000000L && rf <= 8000000L)
    assert(r.getLong(2) > r.getLong(1)) // some replication at k=8
  }

  test("2D grid layout: every two-clique vertex lands on exactly 3 shards") {
    // rows=cols=2: out-edges span {2(v%2), 2(v%2)+1}, in-edges
    // {v%2, 2+v%2}; both cliques mix parities, so each union is 3
    val r = Partition.grid2dStats(twoCliques, rows = 2, cols = 2).first()
    assert(r.getLong(0) === 4L)
    assert(r.getLong(1) === 8L)
    assert(r.getLong(2) === 24L)
    assert(r.getLong(3) === 3000000L)
  }

  test("quotient graph: label-pair slot counts, self-loops kept") {
    import spark.implicits._
    val e = Seq((1L, 2L), (2L, 1L), (1L, 3L)).toDF("src", "dst")
    val lab = Seq((1L, 10L), (2L, 10L), (3L, 20L)).toDF("id", "label")
    val q = Partition.quotient(e, lab).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(q === Map((10L, 10L) -> 2L, (10L, 20L) -> 1L))
  }
}

class UserEntropySpec extends GraftSuite {
  import spark.implicits._
  import graft.streaming.Funnel

  private def ev(rows: Seq[(Long, String, Long, String)]) =
    rows.toDF("event_id", "ets", "user_id", "event_type")
      .select(col("event_id"), col("ets").cast("timestamp").as("ts"),
        col("user_id"), col("event_type"))

  test("a deterministic a-b loop has zero entropy; a branch has ln 2 bits") {
    val events = ev(Seq(
      (1L, "2024-01-01 00:00:01", 1L, "a"),
      (2L, "2024-01-01 00:00:02", 1L, "b"),
      (3L, "2024-01-01 00:00:03", 1L, "a"),
      (4L, "2024-01-01 00:00:04", 1L, "b"),
      (5L, "2024-01-01 00:00:05", 1L, "a"),
      (6L, "2024-01-01 00:00:01", 2L, "a"),
      (7L, "2024-01-01 00:00:02", 2L, "b"),
      (8L, "2024-01-01 00:00:03", 2L, "a"),
      (9L, "2024-01-01 00:00:04", 2L, "c")))
    val m = Funnel.userEntropy(events).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(m(1L) === (4L, 0L)) // scripted loop: fully predictable
    // user 2: a->b, b->a, a->c; the two a-contexts each carry ln 2
    val t = math.round(math.log(2.0) * 1000000)
    assert(m(2L) === (3L, math.round(2.0 * t / 3.0)))
  }
}

class MirrorSpec extends GraftSuite {
  import spark.implicits._
  import graft.sources.HostGraph

  test("shared fingerprints pair hosts, containment-normalized") {
    val dh = Seq(
      ("A", "f1"), ("A", "f2"), ("A", "f3"),
      ("B", "f1"), ("B", "f2"),
      ("C", "f9")).toDF("host", "fp")
    val got = HostGraph.mirrorPairs(dh).collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    assert(got === Map(("A", "B") -> (2L, 1000000L))) // B fully mirrored
  }

  test("corpus-wide boilerplate fingerprints are capped out of the pairing") {
    val dh = Seq(("A", "f1"), ("B", "f1"), ("C", "f1"), ("A", "f2"),
      ("B", "f2")).toDF("host", "fp")
    val got = HostGraph.mirrorPairs(dh, maxHostsPerFp = 2).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got === Map(("A", "B") -> 1L)) // f1 (3 hosts) dropped, f2 kept
  }
}

class OovSpec extends GraftSuite {
  import spark.implicits._
  import graft.text.TextIndex

  test("OOV rate against a size-1 vocabulary by hand") {
    val docs = Seq((1L, "a a b"), (2L, "a c")).toDF("doc_id", "text")
    val m = TextIndex.oovRate(docs, vocabK = 1).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(m(1L) === (3L, 1L, 333333L))
    assert(m(2L) === (2L, 1L, 500000L))
  }

  test("a vocabulary covering everything gives zero OOV") {
    val docs = Seq((1L, "x y"), (2L, "y")).toDF("doc_id", "text")
    val m = TextIndex.oovRate(docs, vocabK = 10).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(m.values.toSet === Set(0L))
  }
}
