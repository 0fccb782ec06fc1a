package graft

import org.apache.spark.sql.functions._

/** Round-5 batch bb: intrinsic dimension, abandonment. */
class IntrinsicDimSpec extends GraftSuite {

  test("intrinsicDimension: 1-D line recovers ID near 1") {
    import spark.implicits._
    // points on a line with geometric spacing so mu = d2/d1 is constant:
    // x_i = 2^i -> for interior points d1 = 2^(i-1), d2 = 2^i (squared
    // ratio 4, ln/2 = ln 2). ID = n_used / sum != exactly 1 on a finite
    // sample; assert the estimate lands in a sane [0.5, 2] band.
    val emb = (0 to 7).map(i => (i.toLong, Seq(math.pow(2.0, i).toFloat), 0))
      .toDF("vec_id", "embedding", "label")
    val r = graft.functions.Similarity.intrinsicDimension(emb)
      .collect().head
    assert(r.getAs[Long]("n_degenerate") === 0L)
    val id = r.getAs[Long]("id_e6")
    assert(id > 500000L && id < 2000000L, s"got $id")
  }

  test("intrinsicDimension: exact duplicates flagged degenerate") {
    import spark.implicits._
    val emb = Seq(
      (1L, Seq(1.0f), 0), (2L, Seq(1.0f), 0), (3L, Seq(5.0f), 0))
      .toDF("vec_id", "embedding", "label")
    val r = graft.functions.Similarity.intrinsicDimension(emb)
      .collect().head
    // points 1 and 2 have d1 = 0 -> degenerate; point 3 has d1 = d2 = 16
    // (both dups equally far) -> ln ratio 0 -> kept but contributes 0
    assert(r.getAs[Long]("n_degenerate") === 2L)
    assert(r.getAs[Long]("n_used") === 1L)
    assert(r.getAs[Long]("sum_lnmu_e6") === 0L)
    assert(r.getAs[Long]("id_e6") === 0L) // zero-sum guard
  }
}
