package graft

import org.apache.spark.sql.functions._

/** Round-5 batch ae: circuit rank, snapshot drift, Pareto share, session
  * stats, nearest-centroid confusion, JL distortion audit.
  */
class DriftAndAuditSpec extends GraftSuite {
  import graft.measures.Measures
  import graft.graph.GraphOps
  import graft.algo.ConnectedComponents

  test("circuitRank: 0 on a tree, 1 on triangle + separate edge") {
    val tree = edgesDf(undirected(Seq((0L, 1L), (1L, 2L), (2L, 3L))))
    val r1 = Measures.circuitRank(tree,
      ConnectedComponents.runAlternating(tree)).collect().head
    assert(r1.getAs[Long]("circuit_rank") === 0L)
    val g = edgesDf(undirected(
      Seq((0L, 1L), (1L, 2L), (2L, 0L), (5L, 6L))))
    val r2 = Measures.circuitRank(g,
      ConnectedComponents.runAlternating(g)).collect().head
    assert(r2.getAs[Long]("n_vertices") === 5L)
    assert(r2.getAs[Long]("n_edges") === 4L)
    assert(r2.getAs[Long]("n_components") === 2L)
    assert(r2.getAs[Long]("circuit_rank") === 1L)
  }

  test("snapshotDrift: pair and vertex Jaccard on a hand delta") {
    val oldE = edgesDf(undirected(Seq((1L, 2L), (2L, 3L))))
    val newE = edgesDf(undirected(Seq((1L, 2L), (3L, 4L))))
    val r = GraphOps.snapshotDrift(oldE, newE).collect().head
    assert(r.getAs[Long]("pairs_old") === 2L)
    assert(r.getAs[Long]("pairs_new") === 2L)
    assert(r.getAs[Long]("pairs_common") === 1L)
    assert(r.getAs[Long]("pair_jaccard_e6") === math.round(1e6 / 3))
    assert(r.getAs[Long]("verts_old") === 3L)
    assert(r.getAs[Long]("verts_new") === 4L)
    assert(r.getAs[Long]("verts_common") === 3L)
    assert(r.getAs[Long]("vert_jaccard_e6") === 750000L)
  }

  test("paretoShare: one heavy user owns the top decile") {
    import spark.implicits._
    val ev = (Seq.fill(8)(10L) ++ Seq(20L, 30L)).zipWithIndex
      .map { case (u, i) => (i.toLong, u) }
      .toDF("event_id", "user_id")
    val r = graft.streaming.Funnel.paretoShare(ev).collect().head
    assert(r.getAs[Long]("n_users") === 3L)
    assert(r.getAs[Long]("n_events") === 10L)
    assert(r.getAs[Long]("k_top") === 1L)
    assert(r.getAs[Long]("top_events") === 8L)
    assert(r.getAs[Long]("share_e6") === 800000L)
  }

  test("sessionStats: gap split, bounce count, histogram median") {
    import spark.implicits._
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    val ev = Seq(
      (1L, ts(0L), 7L, "a"), (2L, ts(10L), 7L, "a"),
      (3L, ts(10000L), 7L, "a"))
      .toDF("event_id", "ts", "user_id", "event_type")
    val r = graft.streaming.Funnel.sessionStats(ev).collect().head
    assert(r.getAs[Long]("n_sessions") === 2L)
    assert(r.getAs[Long]("n_bounce") === 1L)
    assert(r.getAs[Long]("events_per_session_e6") === 1500000L)
    // durations {10, 0}: lo -> 0, hi -> 10, doubled median = 10
    assert(r.getAs[Long]("med2_duration_s") === 10L)
    assert(r.getAs[Long]("max_duration_s") === 10L)
  }

  test("nearestCentroid: mislabeled point lands in the off-diagonal") {
    import spark.implicits._
    val emb = Seq(
      (1L, Seq(1.0f, 0.0f), 0),
      (2L, Seq(0.9f, 0.1f), 0),
      (3L, Seq(0.0f, 1.0f), 1),
      (4L, Seq(0.1f, 0.9f), 1),
      (5L, Seq(0.95f, 0.0f), 1)) // label says 1, geometry says 0
      .toDF("vec_id", "embedding", "label")
    val rows = graft.functions.Similarity.nearestCentroid(emb).collect()
      .map(r => (r.getAs[Long]("label"), r.getAs[Long]("pred")) ->
        r.getAs[Long]("n")).toMap
    assert(rows === Map((0L, 0L) -> 2L, (1L, 1L) -> 2L, (1L, 0L) -> 1L))
  }

  test("jlAudit: exact unit ratio on a 1-dim pair, zero-distance guard") {
    import spark.implicits._
    val emb = Seq((1L, Seq(1.0f), 0), (2L, Seq(0.0f), 0))
      .toDF("vec_id", "embedding", "label")
    val r = graft.functions.Similarity.jlAudit(emb, kProj = 2)
      .collect().head
    assert(r.getAs[Long]("d2_full") === 1000000000000L)
    assert(r.getAs[Long]("d2_proj") === 2000000000000L)
    assert(r.getAs[Long]("ratio_e6") === 1000000L)
    val same = Seq((1L, Seq(0.5f), 0), (2L, Seq(0.5f), 0))
      .toDF("vec_id", "embedding", "label")
    val r2 = graft.functions.Similarity.jlAudit(same, kProj = 2)
      .collect().head
    assert(r2.getAs[Long]("d2_full") === 0L)
    assert(r2.getAs[Long]("ratio_e6") === 0L)
  }
}
