package graft

import org.apache.spark.sql.functions._

/** Round-5 batch-11 operators: flow-hierarchy profile, session
  * entry/exit profile, politeness crawl scheduling.
  */
class HierarchySpec extends GraftSuite {
  import spark.implicits._
  import graft.measures.Measures

  test("a directed chain is fully forward under indeg-outdeg scores") {
    // 1→2→3→4: s(1)=-1, s(2)=s(3)=0, s(4)=1 … edge 2→3 is level,
    // the two end edges are forward
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("src", "dst")
    val r = Measures.hierarchy(e).first()
    assert(r.getAs[Long]("n_edges") === 3L)
    assert(r.getAs[Long]("n_forward") === 2L)
    assert(r.getAs[Long]("n_backward") === 0L)
    assert(r.getAs[Long]("n_level") === 1L)
    assert(r.getAs[Long]("forward_e6") === 666666L)
  }

  test("a 3-cycle is all level (every vertex has indeg=outdeg=1)") {
    val e = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("src", "dst")
    val r = Measures.hierarchy(e).first()
    assert(r.getAs[Long]("n_forward") === 0L)
    assert(r.getAs[Long]("n_backward") === 0L)
    assert(r.getAs[Long]("n_level") === 3L)
    assert(r.getAs[Long]("forward_e6") === 0L)
  }

  test("stars point up; an authority linking onward points down") {
    // in-star AND out-star are both forward: the hub of an out-star is a
    // pure emitter and scores BELOW its targets
    val in = Seq((1L, 9L), (2L, 9L), (3L, 9L)).toDF("src", "dst")
    assert(Measures.hierarchy(in).first()
      .getAs[Long]("forward_e6") === 1000000L)
    val out = Seq((9L, 1L), (9L, 2L), (9L, 3L)).toDF("src", "dst")
    assert(Measures.hierarchy(out).first()
      .getAs[Long]("forward_e6") === 1000000L)
    // backward: authority 5 (s=3-1=2) links to leaf 6 (s=1)
    val r = Measures.hierarchy(
      Seq((1L, 5L), (2L, 5L), (3L, 5L), (5L, 6L)).toDF("src", "dst")).first()
    assert(r.getAs[Long]("n_backward") === 1L)
    assert(r.getAs[Long]("n_forward") === 3L)
    assert(r.getAs[Long]("forward_e6") === 750000L)
  }
}

class EntryExitSpec extends GraftSuite {
  import spark.implicits._
  import graft.streaming.Funnel

  private def ev(rows: Seq[(Long, Long, String, Long)]) =
    rows.toDF("user_id", "event_id", "event_type", "sec")
      .select(col("user_id"), col("event_id"), col("event_type"),
        timestamp_seconds(col("sec")).as("ts"))

  test("two sessions of one user: gap break flags entries and exits") {
    // session 1: a(t0) b(t10); session 2 (gap 3600): c(t3700) a(t3710)
    val d = ev(Seq((1L, 1L, "a", 0L), (1L, 2L, "b", 10L),
      (1L, 3L, "c", 3700L), (1L, 4L, "a", 3710L)))
    val m = Funnel.entryExit(d).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(m("a") === ((2L, 1L, 1L))) // opens s1, closes s2
    assert(m("b") === ((1L, 0L, 1L))) // closes s1
    assert(m("c") === ((1L, 1L, 0L))) // opens s2
  }

  test("a single-event session is both entry and exit") {
    val d = ev(Seq((7L, 1L, "x", 100L)))
    val r = Funnel.entryExit(d).first()
    assert(r.getLong(1) === 1L && r.getLong(2) === 1L && r.getLong(3) === 1L)
    assert(r.getAs[Long]("entry_e6") === 1000000L)
  }

  test("same-second tie inside one session orders by event_id") {
    // both at t=0: event_id 1 is the entry, event_id 2 the exit
    val d = ev(Seq((1L, 2L, "late", 0L), (1L, 1L, "early", 0L)))
    val m = Funnel.entryExit(d).collect()
      .map(r => r.getString(0) -> (r.getLong(2), r.getLong(3))).toMap
    assert(m("early") === ((1L, 0L)))
    assert(m("late") === ((0L, 1L)))
  }
}

class PolitenessSpec extends GraftSuite {
  import spark.implicits._
  import graft.sources.HostGraph

  test("slots serialize per host by priority desc, url asc; eta = slot*delay") {
    val fr = Seq(
      ("h1", "/a", 5L), ("h1", "/b", 9L), ("h1", "/c", 9L),
      ("h2", "/z", 1L)).toDF("host", "url", "priority")
    val out = HostGraph.politenessSchedule(fr, delaySec = 10L).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(3), r.getLong(4))).toMap
    assert(out(("h1", "/b")) === ((0L, 0L)))  // priority 9, url /b < /c
    assert(out(("h1", "/c")) === ((1L, 10L)))
    assert(out(("h1", "/a")) === ((2L, 20L)))
    assert(out(("h2", "/z")) === ((0L, 0L)))  // hosts independent
  }

  test("plan shape: one window exchange partitioned by host, no global sort") {
    val fr = Seq(("h1", "/a", 1L)).toDF("host", "url", "priority")
    val plan = HostGraph.politenessSchedule(fr, 10L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("Window"), plan)
    assert(!plan.contains("rangepartitioning"),
      s"global sort exchange found:\n$plan")
  }
}
