package graft

import org.apache.spark.sql.functions._

/** Round-5 batch ah: host link-profile similarity, per-source quality,
  * exact-dup vectors, audience overlap.
  */
class ProfileOverlapSpec extends GraftSuite {

  test("hostLinkSimilarity: shared targets drive the Jaccard, cap drops hubs") {
    import spark.implicits._
    // a and b share t1,t2 of 3 each; c links only the mega-target
    val pairs = Seq(
      ("https://a.example/1", "https://t1.example/x"),
      ("https://a.example/2", "https://t2.example/x"),
      ("https://a.example/3", "https://t3.example/x"),
      ("https://b.example/1", "https://t1.example/x"),
      ("https://b.example/2", "https://t2.example/x"),
      ("https://b.example/3", "https://t4.example/x"),
      ("https://c.example/1", "https://mega.example/x"),
      ("https://a.example/4", "https://mega.example/x"),
      ("https://b.example/4", "https://mega.example/x"))
      .toDF("src_url", "dst_url")
    // cap 2: mega (3 in-hosts) excluded; a,b keep 3 targets each
    val rows = graft.sources.HostGraph.hostLinkSimilarity(pairs, 2L)
      .collect()
      .map(r => (r.getAs[String]("host_a"), r.getAs[String]("host_b")) ->
        (r.getAs[Long]("n_shared"), r.getAs[Long]("jaccard_e6"))).toMap
    assert(rows === Map(("a.example", "b.example") ->
      ((2L, 500000L)))) // 2 shared / (3 + 3 - 2)
  }

  test("sourceQuality: exact per-source means from integer sums") {
    import spark.implicits._
    val docs = Seq(
      (1L, "good clean text here", "en", "web", 20L),
      (2L, "ok", "en", "web", 2L),
      (3L, "autre texte", "fr", "books", 11L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val rows = graft.text.CorpusClean.sourceQuality(docs).collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("n_langs"),
          r.getAs[Long]("mean_chars_e3"))).toMap
    assert(rows("web") === ((2L, 1L, 11000L)))
    assert(rows("books") === ((1L, 1L, 11000L)))
  }

  test("exactDupVectors: identical quantized vectors group, others do not") {
    import spark.implicits._
    val emb = Seq(
      (1L, Seq(0.5f, -0.25f), 0),
      (2L, Seq(0.5f, -0.25f), 1), // dup of 1 (label irrelevant)
      (3L, Seq(0.5f, -0.24f), 0))
      .toDF("vec_id", "embedding", "label")
    val rows = graft.functions.Similarity.exactDupVectors(emb).collect()
    assert(rows.length === 1)
    assert(rows.head.getAs[Long]("n_vecs") === 2L)
    assert(rows.head.getAs[Long]("canonical_id") === 1L)
  }

  test("audienceOverlap: exact Jaccard of type audiences") {
    import spark.implicits._
    val ev = Seq(
      (1L, 10L, "view"), (2L, 11L, "view"), (3L, 12L, "view"),
      (4L, 10L, "buy"), (5L, 11L, "buy"),
      (6L, 10L, "buy")) // repeat event: distinct users still {10,11}
      .toDF("event_id", "user_id", "event_type")
    val r = graft.streaming.Funnel.audienceOverlap(ev).collect()
    assert(r.length === 1)
    assert(r.head.getAs[String]("type_a") === "buy")
    assert(r.head.getAs[String]("type_b") === "view")
    assert(r.head.getAs[Long]("n_common") === 2L)
    // 2 common / (2 + 3 - 2)
    assert(r.head.getAs[Long]("jaccard_e6") === math.round(2e6 / 3))
  }
}
