package graft

import org.apache.spark.sql.functions._

/** Round-5 batch aw: new-vs-returning DAU, community entropy. */
class GrowthPanelSpec extends GraftSuite {

  test("newVsReturning: first day new, later days returning") {
    import spark.implicits._
    def ts(day: Int, sec: Long) =
      new java.sql.Timestamp((day * 86400L + sec) * 1000L)
    val ev = Seq(
      (1L, ts(0, 10L), 1L), (2L, ts(1, 10L), 1L), // user 1: d0 new, d1 ret
      (3L, ts(1, 20L), 2L),                       // user 2: d1 new
      (4L, ts(1, 30L), 1L))                       // dup day-user, no double count
      .toDF("event_id", "ts", "user_id")
    val rows = graft.streaming.Funnel.newVsReturning(ev).collect()
      .map(r => r.getAs[Long]("day_epoch") / 86400L ->
        (r.getAs[Long]("n_new"), r.getAs[Long]("n_returning"))).toMap
    assert(rows === Map(0L -> ((1L, 0L)), 1L -> ((1L, 1L))))
  }

  test("community-size entropy: balanced split beats a giant blob") {
    def h(sizes: Seq[Long]): Double = {
      val n = sizes.sum.toDouble
      sizes.map { s => -(s / n) * math.log(s / n) }.sum
    }
    assert(h(Seq(5L, 5L)) > h(Seq(9L, 1L)))
    // the e12-rounded per-term contract keeps the comparison exact
    val t1 = Seq(5L, 5L).map(s =>
      math.round(-(s / 10.0) * math.log(s / 10.0) * 1e12)).sum
    val t2 = Seq(9L, 1L).map(s =>
      math.round(-(s / 10.0) * math.log(s / 10.0) * 1e12)).sum
    assert(t1 > t2)
  }
}
