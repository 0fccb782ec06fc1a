package graft

import org.apache.spark.sql.functions._

/** Round-5 batch ad: DESCRIBE panels (graph / corpus / events /
  * embeddings), degree-Gini, crawl-delta triadic closure, kNN hubness.
  */
class SummaryPanelsSpec extends GraftSuite {
  import graft.measures.Measures
  import graft.graph.GraphOps

  test("graphSummary: two 4-cliques + bridge — counts, envelope, density") {
    val e = edgesDf(undirected(Fixtures.twoCliquesBridge))
    val r = Measures.graphSummary(e).collect().head
    assert(r.getAs[Long]("n_vertices") === 8L)
    assert(r.getAs[Long]("n_slots") === 26L)
    assert(r.getAs[Long]("min_deg") === 3L)
    assert(r.getAs[Long]("max_deg") === 4L)
    assert(r.getAs[Long]("avg_deg_e6") === 3250000L)
    assert(r.getAs[Long]("density_e6") === math.round(26e6 / 56))
  }

  test("degreeGini: 0 on a regular ring, exact star value") {
    val ring = edgesDf(undirected(Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 0L))))
    assert(Measures.degreeGini(ring).collect().head
      .getAs[Long]("gini_e6") === 0L)
    // star K1,4: degrees {4:1, 1:4} -> mad 2*1*4*3 = 24, G = 24/(2*5*8)
    val star = edgesDf(undirected((1L to 4L).map(i => (0L, i))))
    val r = Measures.degreeGini(star).collect().head
    assert(r.getAs[Long]("n_vertices") === 5L)
    assert(r.getAs[Long]("sum_deg") === 8L)
    assert(r.getAs[Long]("mad_num") === 24L)
    assert(r.getAs[Long]("gini_e6") === 300000L)
  }

  test("wedgeClosure: a-c closes the a-b-c wedge, a-d does not") {
    val oldE = edgesDf(undirected(Seq((1L, 2L), (2L, 3L))))
    val newE = edgesDf(undirected(
      Seq((1L, 2L), (2L, 3L), (1L, 3L), (1L, 4L))))
    val r = GraphOps.wedgeClosure(oldE, newE).collect().head
    assert(r.getAs[Long]("n_new") === 2L)
    assert(r.getAs[Long]("n_closing") === 1L)
    assert(r.getAs[Long]("closure_pct_e6") === 500000L)
  }

  test("wedgeClosure: zero new pairs yields 0 pct, not a divide error") {
    val e = edgesDf(undirected(Seq((1L, 2L))))
    val r = GraphOps.wedgeClosure(e, e).collect().head
    assert(r.getAs[Long]("n_new") === 0L)
    assert(r.getAs[Long]("closure_pct_e6") === 0L)
  }

  test("corpusSummary: dup text counted once in n_distinct_texts") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta", "en", "web", 10L),
      (2L, "alpha beta", "en", "books", 10L),
      (3L, "gamma", "fr", "web", 5L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val r = graft.text.CorpusClean.corpusSummary(docs).collect().head
    assert(r.getAs[Long]("n_docs") === 3L)
    assert(r.getAs[Long]("n_langs") === 2L)
    assert(r.getAs[Long]("n_sources") === 2L)
    assert(r.getAs[Long]("n_distinct_texts") === 2L)
    assert(r.getAs[Long]("total_chars") === 25L)
    assert(r.getAs[Long]("max_chars") === 10L)
    assert(r.getAs[Long]("avg_chars_e6") === math.round(25e6 / 3))
  }

  test("eventsSummary: span, per-user mean, heaviest user") {
    import spark.implicits._
    def ts(d: Int) = java.sql.Timestamp.valueOf(f"2024-03-${d}%02d 12:00:00")
    val ev = Seq(
      (1L, ts(1), 10L, "a"), (2L, ts(2), 10L, "b"), (3L, ts(3), 10L, "a"),
      (4L, ts(4), 20L, "c"))
      .toDF("event_id", "ts", "user_id", "event_type")
    val r = graft.streaming.Funnel.eventsSummary(ev).collect().head
    assert(r.getAs[Long]("n_events") === 4L)
    assert(r.getAs[Long]("n_users") === 2L)
    assert(r.getAs[Long]("n_types") === 3L)
    assert(r.getAs[Long]("span_days") === 3L)
    assert(r.getAs[Long]("events_per_user_e6") === 2000000L)
    assert(r.getAs[Long]("max_user_events") === 3L)
  }

  test("embedSummary: dim envelope flags ragged input") {
    import spark.implicits._
    val emb = Seq(
      (1L, Seq(1.0f, 0.0f), 0),
      (2L, Seq(0.5f, 0.5f, 0.1f), 1),
      (3L, Seq(0.0f, 1.0f), 1))
      .toDF("vec_id", "embedding", "label")
    val r = graft.functions.Similarity.embedSummary(emb).collect().head
    assert(r.getAs[Long]("n_vecs") === 3L)
    assert(r.getAs[Long]("dim_min") === 2L)
    assert(r.getAs[Long]("dim_max") === 3L)
    assert(r.getAs[Long]("n_labels") === 2L)
    assert(r.getAs[Long]("n_elems") === 7L)
  }

  test("knnHubness: histogram includes zero-in-degree points, mass sums to n") {
    import spark.implicits._
    // a<-b mutual-ish, c points at b, d points at c; nobody picks d
    val emb = Seq(
      (1L, Seq(1.0f, 0.0f), 0),   // a
      (2L, Seq(1.0f, 0.1f), 0),   // b: top1 = a
      (3L, Seq(0.0f, 1.0f), 0),   // c: top1 = b
      (4L, Seq(-1.0f, 0.0f), 0))  // d: top1 = c (others negative)
      .toDF("vec_id", "embedding", "label")
    val rows = graft.functions.Similarity.knnHubness(emb, k = 1).collect()
      .map(r => r.getAs[Long]("indeg") -> r.getAs[Long]("n_points")).toMap
    assert(rows === Map(0L -> 1L, 1L -> 2L, 2L -> 1L))
    assert(rows.values.sum === 4L)
  }
}
