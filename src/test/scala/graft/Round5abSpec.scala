package graft

import org.apache.spark.sql.functions._

/** Round-5 batch ab: k-means++ seeding, filtered ANN. */
class KmeansppSpec extends GraftSuite {
  import graft.functions.Similarity

  private def pad(xs: Double*): Seq[Float] =
    (xs.map(_.toFloat) ++ Seq.fill(64 - xs.length)(0.0f))

  test("farthest-point order and exact integer distances") {
    import spark.implicits._
    val df = Seq(
      (0L, pad(0.0, 0.0)), (1L, pad(1.0, 0.0)),
      (2L, pad(10.0, 0.0)), (3L, pad(0.0, 9.0)))
      .toDF("vec_id", "embedding")
    val r = Similarity.kmeansppSeeds(df, k = 4).collect()
      .map(x => x.getAs[Long]("rank") ->
        ((x.getAs[Long]("vec_id"), x.getAs[Long]("d_e6")))).toMap
    assert(r(1L) === ((0L, 0L)))                 // pinned min id
    assert(r(2L) === ((2L, 100000000000000L)))   // (10e6)^2
    assert(r(3L) === ((3L, 81000000000000L)))    // min to {0,2} = 81e12
    assert(r(4L) === ((1L, 1000000000000L)))     // (1e6)^2
  }

  test("k=1 returns only the pinned seed") {
    import spark.implicits._
    val df = Seq((5L, pad(1.0)), (9L, pad(2.0))).toDF("vec_id", "embedding")
    val r = Similarity.kmeansppSeeds(df, k = 1).collect()
    assert(r.length === 1 && r.head.getAs[Long]("vec_id") === 5L)
  }
}

class FilteredTopKSpec extends GraftSuite {
  import graft.functions.Similarity

  private def pad(xs: Double*): Seq[Float] =
    (xs.map(_.toFloat) ++ Seq.fill(64 - xs.length)(0.0f))

  test("an identical out-of-label vector never appears") {
    import spark.implicits._
    val df = Seq(
      (0L, pad(1.0, 0.0), 1),  // query (vec_id % 50 == 0)
      (1L, pad(0.9, 0.44), 1), // in-label candidate
      (2L, pad(1.0, 0.0), 2),  // perfect cosine but wrong label
      (3L, pad(0.0, 1.0), 1))  // in-label, orthogonal
      .toDF("vec_id", "embedding", "label")
    val r = Similarity.filteredTopK(df, k = 5).collect()
    assert(r.map(_.getAs[Long]("vec_id")).toSet === Set(1L, 3L))
    val rank1 = r.find(_.getAs[Long]("rank") == 1L).get
    assert(rank1.getAs[Long]("vec_id") === 1L)
  }
}
