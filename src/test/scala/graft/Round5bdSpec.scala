package graft

import org.apache.spark.sql.functions._

/** Round-5 batch bd: kNN label agreement. */
class KnnAgreementSpec extends GraftSuite {

  test("knnLabelAgreement: tight same-label cluster scores 1, outlier 0") {
    import spark.implicits._
    // three label-0 points clustered; one label-1 point far away whose
    // k=1 neighbor is necessarily label 0
    val emb = Seq(
      (1L, Seq(1.0f, 0.0f), 0),
      (2L, Seq(0.9f, 0.1f), 0),
      (3L, Seq(0.95f, 0.05f), 0),
      (4L, Seq(-1.0f, 0.0f), 1))
      .toDF("vec_id", "embedding", "label")
    val rows = graft.functions.Similarity.knnLabelAgreement(emb, k = 1)
      .collect()
      .map(r => r.getAs[Long]("label") ->
        (r.getAs[Long]("n_points"), r.getAs[Long]("n_pairs"),
          r.getAs[Long]("n_agree"), r.getAs[Long]("agree_e6"))).toMap
    assert(rows(0L) === ((3L, 3L, 3L, 1000000L)))
    assert(rows(1L) === ((1L, 1L, 0L, 0L)))
  }
}
