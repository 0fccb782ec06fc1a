package graft

import org.apache.spark.sql.functions._

/** Round-5 batch bc: activity streaks. */
class StreakSpec extends GraftSuite {

  test("streakHistogram: gap breaks the streak, max per user kept") {
    import spark.implicits._
    def ts(day: Int) = new java.sql.Timestamp(day * 86400L * 1000L + 5000L)
    val ev = Seq(
      // user 1: days 0,1,2 then 5 -> max streak 3
      (1L, ts(0), 1L), (2L, ts(1), 1L), (3L, ts(2), 1L), (4L, ts(5), 1L),
      // user 2: days 0, 2, 4 -> max streak 1
      (5L, ts(0), 2L), (6L, ts(2), 2L), (7L, ts(4), 2L),
      // user 3: two events same day -> streak 1, counted once
      (8L, ts(7), 3L), (9L, ts(7), 3L))
      .toDF("event_id", "ts", "user_id")
    val rows = graft.streaming.Funnel.streakHistogram(ev).collect()
      .map(r => r.getAs[Long]("streak_days") -> r.getAs[Long]("n_users"))
      .toMap
    assert(rows === Map(3L -> 1L, 1L -> 2L))
  }
}
