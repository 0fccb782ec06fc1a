package graft

import org.apache.spark.sql.functions._

/** Round-5 batch p: PQ ADC search vs exact L2, weighted walks. */
class PqSearchSpec extends GraftSuite {
  import graft.functions.Similarity

  test("a vector that IS a centroid is found at ADC distance 0") {
    import spark.implicits._
    // centStride 37 → vec 0 and 37 are codewords; every vector quantizes
    // exactly onto one of them, so ADC from query 0 to a vector assigned
    // to codeword 0 is 0
    val v = (0L to 40L).map { i =>
      val x = if (i % 37 == 0) i.toFloat else (i % 2).toFloat * 100f
      (i, Array.fill(8)(x))
    }.toDF("vec_id", "embedding")
    val r = Similarity.pqTopK(v, v.filter(col("vec_id") === 0), k = 3,
      blocks = 4, dim = 8)
    val top = r.collect().map(x => x.getLong(1) -> x.getLong(3)).toMap
    // even ids (value 0.0) quantize to codeword 0 (value 0.0) → adist 0
    assert(top.values.min === 0L)
  }

  test("exact L2 top-k ranks by distance then id") {
    import spark.implicits._
    val v = Seq(
      (1L, Array(0.0f)), (2L, Array(1.0f)), (3L, Array(2.0f)),
      (4L, Array(1.0f)))
      .toDF("vec_id", "embedding")
    val r = Similarity.l2TopK(v, v.filter(col("vec_id") === 1), k = 3)
      .collect().map(x => (x.getLong(2), x.getLong(1))).sorted
    // distances: 2→1e6, 4→1e6, 3→4e6; tie broken by id
    assert(r === Seq((1L, 2L), (2L, 4L), (3L, 3L)))
  }

  test("PQ recall against L2 is perfect when codes are lossless") {
    import spark.implicits._
    // every vector equals a codeword (stride 1 over 3 distinct points on
    // one axis) → ADC distance equals true distance → identical top-k
    val v = Seq(
      (0L, Array(0.0f, 0f)), (37L, Array(10.0f, 0f)), (74L, Array(20.0f, 0f)))
      .toDF("vec_id", "embedding")
    val pq = Similarity.pqTopK(v, v, k = 2, blocks = 2, dim = 2)
      .select(col("qid"), col("vec_id"), col("rank"))
    val l2 = Similarity.l2TopK(v, v, k = 2)
      .select(col("qid"), col("vec_id"), col("rank"))
    assert(pq.except(l2).count() === 0 && l2.except(pq).count() === 0)
  }
}

class WeightedWalksSpec extends GraftSuite {
  import graft.algo.RandomWalks

  test("a dominant-weight edge is always taken when it owns the draw range") {
    import spark.implicits._
    // vertex 0 has neighbors 1 (weight 1) and 2 (weight 1): interval
    // [0,1) → 1, [1,2) → 2; the t=1 draw from cur=0, walk=0 is
    // (0·A + 0·B + 1) % 2 = 1 → neighbor 2
    val we = Seq((0L, 1L, 1L), (0L, 2L, 1L), (1L, 0L, 1L), (2L, 0L, 1L))
      .toDF("src", "dst", "weight")
    val starts = Seq(0L).toDF("id")
    val r = RandomWalks.walksWeighted(we, starts, length = 1)
      .filter(col("step") === 1).collect().head
    assert(r.getLong(2) === 2L)
  }

  test("every step lands on a real neighbor and walks have full length") {
    import spark.implicits._
    val pairs = undirected(Fixtures.karatePairs)
    val we = pairs.toDF("src", "dst")
      .withColumn("weight", (col("src") + col("dst")) % 3 + 1)
    val starts = Seq(1L, 5L, 9L).toDF("id")
    val w = RandomWalks.walksWeighted(we, starts, length = 4)
    assert(w.filter(col("step") === 4).count() === 3)
    // each consecutive (cur → next) pair must be an edge
    val a = w.select(col("walk_id"), col("step"), col("vertex"))
    val nxt = a.select(col("walk_id"), (col("step") + 1).as("step"),
      col("vertex").as("prev"))
    val hops = a.join(nxt, Seq("walk_id", "step"))
    val bad = hops.join(we,
        hops("prev") === we("src") && hops("vertex") === we("dst"),
        "left_anti")
    assert(bad.count() === 0)
  }
}
