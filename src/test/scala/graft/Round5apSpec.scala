package graft

import org.apache.spark.sql.functions._

/** Round-5 batch ap: behavioral twins. */
class BehaviorTwinsSpec extends GraftSuite {

  test("behaviorTwins: identical sequences group, different order does not") {
    import spark.implicits._
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    val ev = Seq(
      // users 1 and 2: view -> buy (twins)
      (1L, ts(0L), 1L, "view"), (2L, ts(10L), 1L, "buy"),
      (3L, ts(5L), 2L, "view"), (4L, ts(99L), 2L, "buy"),
      // user 3: buy -> view (reversed, not a twin)
      (5L, ts(0L), 3L, "buy"), (6L, ts(10L), 3L, "view"))
      .toDF("event_id", "ts", "user_id", "event_type")
    val rows = graft.streaming.Funnel.behaviorTwins(ev).collect()
    assert(rows.length === 1)
    assert(rows.head.getAs[Long]("n_users") === 2L)
    assert(rows.head.getAs[Long]("canonical_user") === 1L)
  }

  test("behaviorTwins: fingerprint is row-order independent") {
    import spark.implicits._
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    val fwd = Seq(
      (1L, ts(0L), 1L, "a"), (2L, ts(1L), 1L, "b"),
      (3L, ts(0L), 2L, "a"), (4L, ts(1L), 2L, "b"))
      .toDF("event_id", "ts", "user_id", "event_type")
    val rev = fwd.orderBy(col("event_id").desc)
    val s1 = graft.streaming.Funnel.behaviorTwins(fwd).collect()
      .head.getAs[String]("sig")
    val s2 = graft.streaming.Funnel.behaviorTwins(rev).collect()
      .head.getAs[String]("sig")
    assert(s1 === s2)
  }
}
