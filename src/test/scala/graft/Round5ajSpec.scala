package graft

import org.apache.spark.sql.functions._

/** Round-5 batch aj: edge hygiene audit, gap histogram, norm audit. */
class HygieneAuditSpec extends GraftSuite {

  test("edgeAudit: rows, self-loops, multi-edges, sources") {
    import spark.implicits._
    val raw = Seq(
      (1L, 2L), (1L, 2L), // multi-edge
      (2L, 3L),
      (4L, 4L), // self-loop
      (3L, 1L))
      .toDF("src", "dst")
    val r = graft.graph.GraphOps.edgeAudit(raw).collect().head
    assert(r.getAs[Long]("n_rows") === 5L)
    assert(r.getAs[Long]("n_self") === 1L)
    assert(r.getAs[Long]("n_pairs") === 3L)
    assert(r.getAs[Long]("n_multi") === 1L)
    assert(r.getAs[Long]("n_srcs") === 4L)
  }

  test("gapHistogram: power-of-2 buckets with integer log") {
    import spark.implicits._
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    // user 7 gaps: 0 s, 1 s, 4 s -> buckets 0, 1, 2
    val ev = Seq(
      (1L, ts(100L), 7L), (2L, ts(100L), 7L), (3L, ts(101L), 7L),
      (4L, ts(105L), 7L),
      // user 8: single event, no gap
      (5L, ts(0L), 8L))
      .toDF("event_id", "ts", "user_id")
    val rows = graft.streaming.Funnel.gapHistogram(ev).collect()
      .map(r => r.getAs[Long]("bucket") -> r.getAs[Long]("n_gaps")).toMap
    assert(rows === Map(0L -> 1L, 1L -> 1L, 2L -> 1L))
  }

  test("normAudit: zero vectors counted, exact n2 envelope") {
    import spark.implicits._
    val emb = Seq(
      (1L, Seq(1.0f, 0.0f), 0),   // n2 = 1e12
      (2L, Seq(0.0f, 0.0f), 0),   // zero vector
      (3L, Seq(0.5f, 0.5f), 1))   // n2 = 2 * 25e10 = 5e11
      .toDF("vec_id", "embedding", "label")
    val r = graft.functions.Similarity.normAudit(emb).collect().head
    assert(r.getAs[Long]("n_vecs") === 3L)
    assert(r.getAs[Long]("n_zero") === 1L)
    assert(r.getAs[Long]("min_n2") === 0L)
    assert(r.getAs[Long]("max_n2") === 1000000000000L)
  }
}
