package graft

import org.apache.spark.sql.functions._

/** Round-5 batch af: TF-IDF doc pairs, centroid margin, LP quality curve,
  * activity power law.
  */
class LexicalAndMarginSpec extends GraftSuite {

  test("tfidfPairs: exact hand cosine, threshold drops weak pairs") {
    import spark.implicits._
    val docs = Seq(
      (1L, "apple banana apple"),
      (2L, "apple banana"),
      (3L, "cherry"),
      (4L, "apple cherry"))
      .toDF("doc_id", "text")
    val rows = graft.text.TextIndex.tfidfPairs(docs).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")) ->
        r.getAs[Long]("cos_e6")).toMap
    // idf2 integers: apple ln(4/3)^2*1e6 = 82761, banana/cherry ln(2)^2*1e6
    val ia = math.round(math.pow(math.log(4.0 / 3), 2) * 1e6)
    val ib = math.round(math.pow(math.log(2.0), 2) * 1e6)
    assert(ia === 82761L && ib === 480453L)
    val n1 = 4 * ia + ib; val n2 = ia + ib; val n3 = ib; val n4 = ia + ib
    val c12 = math.round((2 * ia + ib) * 1e6 /
      (math.sqrt(n1.toDouble) * math.sqrt(n2.toDouble)))
    val c34 = math.round(ib * 1e6 /
      (math.sqrt(n3.toDouble) * math.sqrt(n4.toDouble)))
    assert(rows === Map((1L, 2L) -> c12, (3L, 4L) -> c34))
    // (1,4) shares only apple: cos ~0.24e6, below the 0.3e6 threshold
    assert(!rows.contains((1L, 4L)))
  }

  test("centroidMargin: single-vector labels give full margin, own pred") {
    import spark.implicits._
    val emb = Seq(
      (1L, Seq(1.0f, 0.0f), 0),
      (2L, Seq(0.0f, 1.0f), 1))
      .toDF("vec_id", "embedding", "label")
    val rows = graft.functions.Similarity.centroidMargin(emb).collect()
    assert(rows.length === 2)
    rows.foreach { r =>
      assert(r.getAs[Long]("pred") === r.getAs[Long]("label"))
      assert(r.getAs[Long]("d2_best") === 0L)
      assert(r.getAs[Long]("margin_e6") === 1000000L)
    }
  }

  test("centroidMargin: coincident centroids trip the zero guard") {
    import spark.implicits._
    val emb = Seq(
      (1L, Seq(0.5f, 0.5f), 0),
      (2L, Seq(0.5f, 0.5f), 1))
      .toDF("vec_id", "embedding", "label")
    val rows = graft.functions.Similarity.centroidMargin(emb).collect()
    rows.foreach { r =>
      assert(r.getAs[Long]("d2_second") === 0L)
      assert(r.getAs[Long]("margin_e6") === 0L)
    }
  }

  test("LP quality curve: modularity bounded and non-trivial on cliques") {
    val e = edgesDf(undirected(Fixtures.twoCliquesBridge))
    val qs = (1 to 3).map { t =>
      val lab = graft.algo.LabelPropagation.runFixed(e, t, symmetric = true)
      graft.measures.Measures.modularity(e, lab)
    }
    qs.foreach(q => assert(q >= -1.0 && q <= 1.0))
    // by step 3 the two cliques should carry positive structure
    assert(qs.last > 0.0)
  }
}
