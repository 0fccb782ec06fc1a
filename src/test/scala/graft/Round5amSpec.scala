package graft

import org.apache.spark.sql.functions._

/** Round-5 batch am: preferential-attachment lift. */
class AttachmentLiftSpec extends GraftSuite {
  import graft.graph.GraphOps

  test("attachmentLift: hub-attaching delta lifts above 1e6") {
    // old: star center 0 with spokes 1..4 (deg 4 vs 1); new edge (0,5)
    // attaches to the hub — endpoint 5 is fresh (no old degree), so the
    // only measured endpoint is the hub itself
    val oldE = edgesDf(undirected((1L to 4L).map(i => (0L, i))))
    val newE = edgesDf(undirected((1L to 4L).map(i => (0L, i)) :+ (0L, 5L)))
    val r = GraphOps.attachmentLift(oldE, newE).collect().head
    assert(r.getAs[Long]("n_endpoints") === 1L)
    assert(r.getAs[Long]("sum_deg_endpoints") === 4L)
    // mean endpoint deg 4 vs mean deg 8/5 -> lift = 4 / 1.6 = 2.5
    assert(r.getAs[Long]("mean_endpoint_deg_e6") === 4000000L)
    assert(r.getAs[Long]("mean_deg_e6") === 1600000L)
    assert(r.getAs[Long]("lift_e6") === 2500000L)
  }

  test("attachmentLift: all-fresh endpoints yield the zero guard") {
    val oldE = edgesDf(undirected(Seq((1L, 2L))))
    val newE = edgesDf(undirected(Seq((1L, 2L), (8L, 9L))))
    val r = GraphOps.attachmentLift(oldE, newE).collect().head
    assert(r.getAs[Long]("n_endpoints") === 0L)
    assert(r.getAs[Long]("sum_deg_endpoints") === 0L)
    assert(r.getAs[Long]("lift_e6") === 0L)
  }
}
