package graft

import org.apache.spark.sql.functions._

/** Round-5 batch ag: bucketed edge layout, degree-histogram drift,
  * cross-language dup leakage, session type pairs, label dispersion.
  */
class LayoutAndLeakSpec extends GraftSuite {
  import graft.measures.Measures

  test("bucketed layout: same degrees, exchange-free aggregation plan") {
    val e = edgesDf(undirected(Fixtures.twoCliquesBridge))
    val path = java.nio.file.Files
      .createTempDirectory("graft_bucketed_spec").toString
    graft.graph.Layout.writeBucketed(e, "graft_spec_bucketed", path, 4)
    val back = graft.graph.Layout.readBucketed(spark, "graft_spec_bucketed")
    val bucketedDeg = graft.graph.GraphOps.degrees(back)
    val plainDeg = graft.graph.GraphOps.degrees(e)
    // values identical to the plain path
    assert(bucketedDeg.collect().map(r => r.getLong(0) -> r.getLong(1))
      .toMap === plainDeg.collect().map(r => r.getLong(0) -> r.getLong(1))
      .toMap)
    // the bucketed aggregation never shuffles; the plain one must
    val bPlan = bucketedDeg.queryExecution.executedPlan.toString()
    val pPlan = plainDeg.queryExecution.executedPlan.toString()
    assert(!bPlan.contains("Exchange"), s"unexpected Exchange:\n$bPlan")
    assert(pPlan.contains("Exchange"))
  }

  test("degreeHistDrift: zero on identical snapshots, exact hand delta") {
    val a = edgesDf(undirected(Seq((1L, 2L), (2L, 3L))))
    val same = Measures.degreeHistDrift(a, a).collect().head
    assert(same.getAs[Long]("l1_diff") === 0L)
    assert(same.getAs[Long]("drift_e6") === 0L)
    // b turns the path into a triangle: degrees {1,2,1} -> {2,2,2}
    val b = edgesDf(undirected(Seq((1L, 2L), (2L, 3L), (1L, 3L))))
    val r = Measures.degreeHistDrift(a, b).collect().head
    assert(r.getAs[Long]("n_old") === 3L)
    assert(r.getAs[Long]("n_new") === 3L)
    // hist old {1:2, 2:1}, new {2:3}: |2-0| + |1-3| = 4
    assert(r.getAs[Long]("l1_diff") === 4L)
    assert(r.getAs[Long]("drift_e6") === math.round(4e6 / 6))
  }

  test("crossLangDups: same text under two langs flagged, singles not") {
    import spark.implicits._
    val docs = Seq(
      (1L, "hello world", "en", "web", 11L),
      (2L, "hello world", "fr", "web", 11L),
      (3L, "only once", "en", "web", 9L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val rows = graft.text.CorpusClean.crossLangDups(docs).collect()
    assert(rows.length === 1)
    assert(rows.head.getAs[Long]("n_langs") === 2L)
    assert(rows.head.getAs[Long]("n_docs") === 2L)
    assert(rows.head.getAs[Long]("min_doc_id") === 1L)
  }

  test("sessionTypePairs: pairs within a session, not across sessions") {
    import spark.implicits._
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    val ev = Seq(
      (1L, ts(0L), 7L, "view"), (2L, ts(10L), 7L, "buy"),
      // new session for the same user: search alone
      (3L, ts(10000L), 7L, "search"),
      // another user: view + search together
      (4L, ts(0L), 8L, "view"), (5L, ts(5L), 8L, "search"))
      .toDF("event_id", "ts", "user_id", "event_type")
    val rows = graft.streaming.Funnel.sessionTypePairs(ev).collect()
      .map(r => (r.getAs[String]("type_a"), r.getAs[String]("type_b")) ->
        r.getAs[Long]("n_sessions")).toMap
    assert(rows === Map(("buy", "view") -> 1L, ("search", "view") -> 1L))
  }

  test("labelDispersion: exact mean squared distance to own centroid") {
    import spark.implicits._
    val emb = Seq(
      (1L, Seq(1.0f, 0.0f), 0),
      (2L, Seq(0.0f, 0.0f), 0), // centroid (500000, 0), d2 = 500000^2 each
      (3L, Seq(0.0f, 1.0f), 1)) // centroid = point, d2 = 0
      .toDF("vec_id", "embedding", "label")
    val rows = graft.functions.Similarity.labelDispersion(emb).collect()
      .map(r => r.getAs[Long]("label") ->
        (r.getAs[Long]("n_vecs"), r.getAs[Long]("sum_d2"),
          r.getAs[Long]("mean_d2"))).toMap
    val d2 = 500000L * 500000L
    assert(rows === Map(0L -> ((2L, 2 * d2, d2)), 1L -> ((1L, 0L, 0L))))
  }
}
