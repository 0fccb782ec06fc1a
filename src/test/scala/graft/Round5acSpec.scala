package graft

import org.apache.spark.sql.functions._

/** Round-5 batch ac: funnel step-latency medians. */
class StepLatencySpec extends GraftSuite {
  import graft.streaming.Funnel

  private def ts(s: Long) = new java.sql.Timestamp(
    java.sql.Timestamp.valueOf("2024-03-01 00:00:00").getTime + s * 1000L)

  test("odd count doubles the middle; even count sums the two middles") {
    import spark.implicits._
    // users 1..3 view 10/20/30 s after signup; user 4 never views
    val ev = (1L to 3L).flatMap { u =>
      Seq((u * 10, u, "signup", ts(0)), (u * 10 + 1, u, "view", ts(u * 10)))
    } ++ Seq((99L, 4L, "signup", ts(0)))
    val df = ev.toDF("event_id", "user_id", "event_type", "ts")
    val r = Funnel.stepLatency(df, Seq("signup", "view")).collect()
    assert(r.length === 1)
    assert(r.head.getString(0) === "signup->view")
    assert(r.head.getAs[Long]("n_users") === 3L)
    assert(r.head.getAs[Long]("med2_gap_s") === 40L) // 2 x 20

    val ev4 = ev ++ Seq((100L, 5L, "signup", ts(0)),
      (101L, 5L, "view", ts(40)))
    val r4 = Funnel.stepLatency(
      ev4.toDF("event_id", "user_id", "event_type", "ts"),
      Seq("signup", "view")).collect().head
    assert(r4.getAs[Long]("n_users") === 4L)
    assert(r4.getAs[Long]("med2_gap_s") === 50L) // 20 + 30
  }

  test("later transitions only count users who completed them in order") {
    import spark.implicits._
    // user 1 full path; user 2 clicks BEFORE viewing (out of order)
    val ev = Seq(
      (1L, 1L, "signup", ts(0)), (2L, 1L, "view", ts(5)),
      (3L, 1L, "click", ts(9)),
      (4L, 2L, "signup", ts(0)), (5L, 2L, "click", ts(2)),
      (6L, 2L, "view", ts(3)))
      .toDF("event_id", "user_id", "event_type", "ts")
    val r = Funnel.stepLatency(ev, Seq("signup", "view", "click"))
      .collect().map(x => x.getString(0) ->
        (x.getAs[Long]("n_users"), x.getAs[Long]("med2_gap_s"))).toMap
    assert(r("signup->view") === ((2L, 8L)))  // gaps 5 and 3 -> 5+3
    assert(r("view->click") === ((1L, 8L)))   // only user 1: 2 x 4
  }
}
