package graft

import org.apache.spark.sql.functions._

/** Round-5 batch ay: session depth histogram, log length histogram. */
class DepthHistSpec extends GraftSuite {

  test("sessionDepthHist: depths counted per session") {
    import spark.implicits._
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    val ev = Seq(
      (1L, ts(0L), 7L, "a"), (2L, ts(10L), 7L, "a"),   // session of 2
      (3L, ts(10000L), 7L, "a"),                        // session of 1
      (4L, ts(0L), 8L, "a"))                            // session of 1
      .toDF("event_id", "ts", "user_id", "event_type")
    val rows = graft.streaming.Funnel.sessionDepthHist(ev).collect()
      .map(r => r.getAs[Long]("n_ev") -> r.getAs[Long]("n_sessions")).toMap
    assert(rows === Map(2L -> 1L, 1L -> 2L))
  }

  test("lengthHistogram: power-of-2 buckets from binary length") {
    import spark.implicits._
    val docs = Seq(
      (1L, "x", 0L),   // bucket 0
      (2L, "x", 2L),   // bin(3) -> bucket 1
      (3L, "x", 6L),   // bin(7) -> bucket 2
      (4L, "x", 7L))   // bin(8) -> bucket 3
      .toDF("doc_id", "text", "n_chars")
    val rows = graft.text.CorpusClean.lengthHistogram(docs).collect()
      .map(r => r.getAs[Long]("bucket") -> r.getAs[Long]("n_docs")).toMap
    assert(rows === Map(0L -> 1L, 1L -> 1L, 2L -> 1L, 3L -> 1L))
  }
}
