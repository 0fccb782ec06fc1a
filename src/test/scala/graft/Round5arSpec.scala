package graft

import org.apache.spark.sql.functions._

/** Round-5 batch ar: directed triads, second-order transitions. */
class DirectedTriadsSpec extends GraftSuite {
  import graft.algo.TriangleCount

  private def dEdges(rows: Seq[(Long, Long)]) = {
    import spark.implicits._
    rows.toDF("src", "dst")
  }

  test("directedTriads: one cycle, one transitive, counted once each") {
    val cyc = dEdges(Seq((1L, 2L), (2L, 3L), (3L, 1L)))
    val r1 = TriangleCount.directedTriads(cyc).collect().head
    assert(r1.getAs[Long]("n_cyclic") === 1L)
    assert(r1.getAs[Long]("n_transitive") === 0L)
    val tr = dEdges(Seq((1L, 2L), (2L, 3L), (1L, 3L)))
    val r2 = TriangleCount.directedTriads(tr).collect().head
    assert(r2.getAs[Long]("n_cyclic") === 0L)
    assert(r2.getAs[Long]("n_transitive") === 1L)
  }

  test("directedTriads: reciprocal triangle counts all orientations") {
    // full bidirectional triangle: 6 directed edges -> 2 cycles
    // (clockwise + counterclockwise) and 6 transitive instances
    val full = dEdges(Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L),
      (3L, 1L), (1L, 3L)))
    val r = TriangleCount.directedTriads(full).collect().head
    assert(r.getAs[Long]("n_cyclic") === 2L)
    assert(r.getAs[Long]("n_transitive") === 6L)
  }

  test("transitions2: exact context counts") {
    import spark.implicits._
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    val ev = Seq(
      (1L, ts(0L), 1L, "a"), (2L, ts(1L), 1L, "b"), (3L, ts(2L), 1L, "c"),
      (4L, ts(3L), 1L, "c"),
      (5L, ts(0L), 2L, "a"), (6L, ts(1L), 2L, "b"), (7L, ts(2L), 2L, "c"))
      .toDF("event_id", "ts", "user_id", "event_type")
    val rows = graft.streaming.Funnel.transitions2(ev).collect()
      .map(r => (r.getAs[String]("p2"), r.getAs[String]("p1"),
        r.getAs[String]("next_type")) -> r.getAs[Long]("n")).toMap
    assert(rows === Map(("a", "b", "c") -> 2L, ("b", "c", "c") -> 1L))
  }
}
