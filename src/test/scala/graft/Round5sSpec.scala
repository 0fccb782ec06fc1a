package graft

import org.apache.spark.sql.functions._

/** Round-5 batch s: weighted harmonic and SQ-space recall semantics. */
class WeightedHarmonicSpec extends GraftSuite {
  import graft.algo.ShortestPaths

  test("hand-computed harmonic on the 2-3 weighted path") {
    import spark.implicits._
    val we = Seq(
      (1L, 2L, 2L), (2L, 1L, 2L), (2L, 3L, 3L), (3L, 2L, 3L))
      .toDF("src", "dst", "weight")
    val r = ShortestPaths.weightedHarmonic(we, Seq(1L).toDF("id"), 3)
      .collect().head
    assert(r.getLong(1) === 2L)
    // round(1e9/2) + round(1e9/5) = 500000000 + 200000000
    assert(r.getLong(2) === 700000000L)
  }

  test("an isolated source is absent, not zero-padded") {
    import spark.implicits._
    val we = Seq((1L, 2L, 1L), (2L, 1L, 1L)).toDF("src", "dst", "weight")
    val r = ShortestPaths.weightedHarmonic(we, Seq(9L).toDF("id"), 2)
    assert(r.collect().isEmpty)
  }
}

class SqRecallSpec extends GraftSuite {
  import graft.functions.Similarity

  test("reconstructions preserve per-dim order, so 1-D recall is perfect") {
    import spark.implicits._
    // 1-D points 0, 100, 200: SQ is monotone per dimension, so nearest
    // neighbors in SQ space match exact space exactly
    val v = Seq((0L, Array(0.0f)), (1L, Array(100.0f)), (2L, Array(200.0f)))
      .toDF("vec_id", "embedding")
    val rec = Similarity.sqReconstruct(v).collect()
      .map(x => x.getLong(0) -> x.getLong(3)).toMap
    assert(rec(0L) < rec(1L) && rec(1L) < rec(2L))
  }
}
