package graft

import org.apache.spark.sql.functions._

/** Round-5 batch an: IVF cell purity, conversion-lag histogram,
  * vocabulary coverage curve.
  */
class CoverageAndPuritySpec extends GraftSuite {

  test("ivfCellPurity: pure and mixed cells scored exactly") {
    import spark.implicits._
    // stride 29 -> centroids are vec 0 and 29; cluster A near 0 carries
    // label 0 except one intruder; cluster B near 29 is pure label 1
    val emb = (Seq(
      (0L, Seq(0.0f, 0.0f), 0), (1L, Seq(0.1f, 0.0f), 0),
      (2L, Seq(0.0f, 0.1f), 0), (3L, Seq(0.1f, 0.1f), 1), // intruder
      (29L, Seq(5.0f, 5.0f), 1), (30L, Seq(5.1f, 5.0f), 1)))
      .toDF("vec_id", "embedding", "label")
    val rows = graft.functions.Similarity.ivfCellPurity(emb).collect()
      .map(r => r.getAs[Long]("cid") ->
        (r.getAs[Long]("n_vectors"), r.getAs[Long]("majority_label"),
          r.getAs[Long]("n_majority"), r.getAs[Long]("purity_e6"))).toMap
    assert(rows(0L) === ((4L, 0L, 3L, 750000L)))
    assert(rows(29L) === ((2L, 1L, 2L, 1000000L)))
  }

  test("vocabCoverage: exact shares at the checkpoints") {
    import spark.implicits._
    // tokens: a x5, b x3, c x2  (total 10)
    val docs = Seq((1L, "a a a b b c"), (2L, "a a b c"))
      .toDF("doc_id", "text")
    val rows = graft.text.TextIndex
      .vocabCoverage(docs, ks = Seq(1, 2, 3)).collect()
      .map(r => r.getAs[Long]("k") ->
        (r.getAs[Long]("covered_tokens"), r.getAs[Long]("coverage_e6")))
      .toMap
    assert(rows === Map(1L -> ((5L, 500000L)), 2L -> ((8L, 800000L)),
      3L -> ((10L, 1000000L))))
  }

  test("conversion-lag bucketing matches the funnel stages pass") {
    import spark.implicits._
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    val ev = Seq(
      (1L, ts(0L), 1L, "signup"), (2L, ts(1L), 1L, "view"),
      (3L, ts(2L), 1L, "click"), (4L, ts(6L), 1L, "purchase"))
      .toDF("event_id", "ts", "user_id", "event_type")
    val st = graft.streaming.Funnel.stages(ev,
      Seq("signup", "view", "click", "purchase"))
    val r = st.filter(col("t_purchase").isNotNull)
      .select((length(bin(col("t_purchase") - col("t_signup") + 1)) - 1)
        .cast("long").as("bucket")).collect()
    // lag 6 s -> floor(log2(7)) = 2
    assert(r.map(_.getLong(0)).toSeq === Seq(2L))
  }
}
