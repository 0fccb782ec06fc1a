package graft

import org.apache.spark.sql.functions._

/** Round-5 batch ao: LP change frontier, first-session conversion,
  * df spectrum.
  */
class FrontierActivationSpec extends GraftSuite {

  test("firstSessionConversion: first-session buyer vs later-session buyer") {
    import spark.implicits._
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    val ev = Seq(
      // user 1 buys in session 1
      (1L, ts(0L), 1L, "view"), (2L, ts(10L), 1L, "purchase"),
      // user 2 buys only in session 2
      (3L, ts(0L), 2L, "view"), (4L, ts(10000L), 2L, "purchase"),
      // user 3 never buys
      (5L, ts(0L), 3L, "view"))
      .toDF("event_id", "ts", "user_id", "event_type")
    val r = graft.streaming.Funnel.firstSessionConversion(ev)
      .collect().head
    assert(r.getAs[Long]("n_users") === 3L)
    assert(r.getAs[Long]("n_buyers") === 2L)
    assert(r.getAs[Long]("n_first_session_buyers") === 1L)
    assert(r.getAs[Long]("first_share_e6") === 500000L)
  }

  test("firstSessionConversion: zero buyers trips the guard") {
    import spark.implicits._
    val ev = Seq((1L, new java.sql.Timestamp(0L), 1L, "view"))
      .toDF("event_id", "ts", "user_id", "event_type")
    val r = graft.streaming.Funnel.firstSessionConversion(ev)
      .collect().head
    assert(r.getAs[Long]("n_buyers") === 0L)
    assert(r.getAs[Long]("first_share_e6") === 0L)
  }

  test("df spectrum: exact histogram on a hand corpus") {
    import spark.implicits._
    val docs = Seq((1L, "a b c"), (2L, "a b"), (3L, "a"))
      .toDF("doc_id", "text")
    val pairs = docs.select(col("doc_id"),
        explode(regexp_extract_all(lower(col("text")),
          lit("[a-z0-9]+"), lit(0))).as("term")).distinct()
    val rows = pairs.groupBy("term").agg(count(lit(1)).as("df"))
      .groupBy("df").agg(count(lit(1)).as("n_terms")).collect()
      .map(r => r.getAs[Long]("df") -> r.getAs[Long]("n_terms")).toMap
    // a: df 3, b: df 2, c: df 1
    assert(rows === Map(3L -> 1L, 2L -> 1L, 1L -> 1L))
  }

  test("LP frontier: changed vertices carry their degree") {
    val e = edgesDf(undirected(Fixtures.twoCliquesBridge))
    val s2 = graft.algo.LabelPropagation.runFixed(e, 2, symmetric = true)
      .select(col("id"), col("label").as("l2"))
    val s3 = graft.algo.LabelPropagation.runFixed(e, 3, symmetric = true)
      .select(col("id"), col("label").as("l3"))
    val deg = e.groupBy(col("src").as("id")).agg(count(lit(1)).as("d"))
    val frontier = s2.join(s3, "id").filter(col("l2") =!= col("l3"))
      .join(deg, "id")
      .groupBy(col("d")).agg(count(lit(1)).as("n_changed"))
    // total changed equals the direct count, however many there are
    val direct = s2.join(s3, "id").filter(col("l2") =!= col("l3")).count()
    val viaHist = frontier.agg(sum(col("n_changed"))).collect()
      .head.getAs[Any](0) match {
        case null => 0L
        case l: Long => l
      }
    assert(viaHist === direct)
  }
}
