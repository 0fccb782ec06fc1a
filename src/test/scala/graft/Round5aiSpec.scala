package graft

import org.apache.spark.sql.functions._

/** Round-5 batch ai: windowed funnel, per-source dup mass, peak minutes. */
class WindowedFunnelSpec extends GraftSuite {

  test("funnelWindowed: late step falls outside the window") {
    import spark.implicits._
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    val ev = Seq(
      // user 1: signup then view 10 s later -> stage 2
      (1L, ts(0L), 1L, "signup"), (2L, ts(10L), 1L, "view"),
      // user 2: signup then view 200 s later -> outside the 100 s window
      (3L, ts(0L), 2L, "signup"), (4L, ts(200L), 2L, "view"),
      // user 3: never signs up -> stage 0
      (5L, ts(0L), 3L, "view"))
      .toDF("event_id", "ts", "user_id", "event_type")
    val rows = graft.streaming.Funnel
      .funnelWindowed(ev, Seq("signup", "view"), windowSec = 100L)
      .collect()
      .map(r => r.getAs[Long]("stage") -> r.getAs[Long]("n_users")).toMap
    assert(rows === Map(0L -> 1L, 1L -> 1L, 2L -> 1L))
  }

  test("funnelWindowed: greedy-earliest step choice is window-checked") {
    import spark.implicits._
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    // view at 50 (in window), click only at 400 — within 100 s of the
    // view? no (400 > 50 + 100) -> stage 2
    val ev = Seq(
      (1L, ts(0L), 1L, "signup"), (2L, ts(50L), 1L, "view"),
      (3L, ts(400L), 1L, "click"))
      .toDF("event_id", "ts", "user_id", "event_type")
    val rows = graft.streaming.Funnel
      .funnelWindowed(ev, Seq("signup", "view", "click"), windowSec = 100L)
      .collect()
      .map(r => r.getAs[Long]("stage") -> r.getAs[Long]("n_users")).toMap
    assert(rows === Map(2L -> 1L))
  }

  test("dupRateBySource: exact per-source duplicate fraction") {
    import spark.implicits._
    val docs = Seq(
      (1L, "same", "en", "web", 4L), (2L, "same", "en", "web", 4L),
      (3L, "other", "en", "web", 5L),
      (4L, "unique", "en", "books", 6L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val rows = graft.text.CorpusClean.dupRateBySource(docs).collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("n_distinct"),
          r.getAs[Long]("n_dups"), r.getAs[Long]("dup_rate_e6"))).toMap
    assert(rows("web") === ((3L, 2L, 1L, 333333L)))
    assert(rows("books") === ((1L, 1L, 0L, 0L)))
  }
}
