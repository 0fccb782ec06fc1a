package graft

import org.apache.spark.sql.functions._

/** Round-5 batch as: weighted conductance, centroid gaps. */
class WeightedCutSpec extends GraftSuite {
  import graft.measures.Measures

  test("conductanceWeighted: heavy cut edge dominates the ratio") {
    import spark.implicits._
    // two dyads {1,2} and {3,4}, intra weight 10 each, cut edge w=5
    val raw = Seq((1L, 2L, 10L), (3L, 4L, 10L), (2L, 3L, 5L))
      .toDF("src", "dst", "weight")
    val w = raw.union(raw.select(col("dst").as("src"), col("src").as("dst"),
      col("weight")))
    val lab = Seq((1L, 0L), (2L, 0L), (3L, 1L), (4L, 1L))
      .toDF("id", "label")
    val rows = Measures.conductanceWeighted(w, lab).collect()
      .map(r => r.getAs[Long]("label") ->
        (r.getAs[Long]("cut_w"), r.getAs[Long]("vol_w"),
          r.getAs[Long]("conductance_e6"))).toMap
    // community 0: vol = 2*10 + 5 = 25, cut = 5; total w2 = 50
    assert(rows(0L) === ((5L, 25L, 200000L)))
    assert(rows(1L) === ((5L, 25L, 200000L)))
  }

  test("centroidGaps: exact gap between singleton-label centroids") {
    import spark.implicits._
    val emb = Seq(
      (1L, Seq(1.0f, 0.0f), 0),
      (2L, Seq(0.0f, 1.0f), 1),
      (3L, Seq(0.0f, 0.0f), 2))
      .toDF("vec_id", "embedding", "label")
    val rows = graft.functions.Similarity.centroidGaps(emb).collect()
      .map(r => (r.getAs[Long]("label_a"), r.getAs[Long]("label_b")) ->
        r.getAs[Long]("gap_d2")).toMap
    val m = 1000000L
    assert(rows === Map((0L, 1L) -> 2 * m * m, (0L, 2L) -> m * m,
      (1L, 2L) -> m * m))
  }
}
