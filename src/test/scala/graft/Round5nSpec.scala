package graft

import org.apache.spark.sql.functions._

/** Round-5 batch n: VoteRank spreader selection, the deterministic
  * linear-threshold cascade, and the power-iteration dominant direction.
  */
class VoteRankSpec extends GraftSuite {
  import graft.algo.Influence

  test("star with a rim edge: hub first, then discounted rim by id") {
    // 0-{1,2,3} + (1,2): slots 8, n 4 → ⟨k⟩ = 2, δ = 500000
    val e = edgesDf(undirected(Seq((0L, 1L), (0L, 2L), (0L, 3L), (1L, 2L))))
    val r = Influence.voteRank(e, k = 3).collect()
      .map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2))).toMap
    assert(r(1L) === ((0L, 3000000L))) // hub gathers 3 full votes
    // after the hub is selected + its rim discounted, 1 and 2 tie at
    // 500000 (each sees the other's discounted ability) → id asc
    assert(r(2L) === ((1L, 500000L)))
    // round 3: everyone's voters are spent — v2 wins the zero tie by id
    assert(r(3L) === ((2L, 0L)))
  }

  test("selected vertices are never re-selected") {
    val e = edgesDf(undirected(Fixtures.karatePairs))
    val picks = Influence.voteRank(e, k = 5).collect().map(_.getLong(1))
    assert(picks.distinct.length === 5)
  }
}

class LtCascadeSpec extends GraftSuite {
  import graft.algo.Influence

  test("path cascade advances one hop per round at a half threshold") {
    import spark.implicits._
    val e = edgesDf(undirected(Seq((1L, 2L), (2L, 3L))))
    val seeds = Seq(1L).toDF("id")
    val th = Seq((1L, 1L), (2L, 1L), (3L, 1L)).toDF("id", "tnum")
    val r = Influence.ltCascade(e, seeds, th, tden = 2, rounds = 3)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r === Map(1L -> 0L, 2L -> 1L, 3L -> 2L))
  }

  test("a unanimity threshold stops at vertices with an inactive neighbor") {
    import spark.implicits._
    // triangle + pendant: v3 needs ALL neighbors (θ = 1) — 1,2 active is
    // only 2 of deg 3, so 3 never fires, neither does 4 behind it
    val e = edgesDf(undirected(Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L))))
    val seeds = Seq(1L, 2L).toDF("id")
    val th = Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 1L)).toDF("id", "tnum")
    val r = Influence.ltCascade(e, seeds, th, tden = 1, rounds = 3)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r === Map(1L -> 0L, 2L -> 0L))
  }
}

class DominantDirectionSpec extends GraftSuite {
  import graft.functions.Similarity

  test("rank-one spread recovers the planted axis exactly") {
    import spark.implicits._
    // vectors ±(3,1), ±(6,2): C ∝ [[9,3],[3,1]] → dominant axis (3,1)
    val v = Seq(
      (1L, Array(3.0f, 1.0f)), (2L, Array(-3.0f, -1.0f)),
      (3L, Array(6.0f, 2.0f)), (4L, Array(-6.0f, -2.0f)))
      .toDF("vec_id", "embedding")
    val r = Similarity.dominantDirection(v).collect()
      .map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2))).toMap
    assert(r(0L) === ((1000000L, 1000000L)))
    assert(r(1L)._1 === 333333L)
    assert(r(1L)._2 === 333333L) // already converged: rank-one matrix
  }
}
