package graft

import org.apache.spark.sql.functions._

/** Round-5 batch aq: heavy-edge weighted matching. */
class HeavyMatchingSpec extends GraftSuite {
  import graft.algo.Matching

  private def wEdges(rows: Seq[(Long, Long, Long)]) = {
    import spark.implicits._
    val df = rows.toDF("src", "dst", "weight")
    df.union(df.select(col("dst").as("src"), col("src").as("dst"),
      col("weight")))
  }

  test("heavy matching: the heaviest edge wins its neighborhood") {
    // path 1-2-3 with weights 5 and 1: pair (1,2) must match first
    val e = wEdges(Seq((1L, 2L, 5L), (2L, 3L, 1L)))
    val m = Matching.greedyRoundsWeighted(e, rounds = 1, seed = 7L)
      .collect()
    assert(m.length === 1)
    assert((m.head.getAs[Long]("src"), m.head.getAs[Long]("dst")) ===
      ((1L, 2L)))
    assert(m.head.getAs[Long]("weight") === 5L)
  }

  test("heavy matching: later rounds pick up the leftovers") {
    // path 1-2-3-4, weights 1, 9, 1: round 1 matches (2,3); round 2
    // cannot match 1 or 4 (their only partners are gone)
    val e = wEdges(Seq((1L, 2L, 1L), (2L, 3L, 9L), (3L, 4L, 1L)))
    val m = Matching.greedyRoundsWeighted(e, rounds = 2, seed = 7L)
      .collect().map(r => (r.getAs[Long]("src"), r.getAs[Long]("dst"),
        r.getAs[Long]("round")))
    assert(m.toSet === Set((2L, 3L, 1L)))
    // total matched weight beats what the hash-priority matching can
    // guarantee: the heavy edge is in the matching
    val heavy = Matching.greedyRoundsWeighted(e, rounds = 2, seed = 7L)
      .agg(sum(col("weight"))).collect().head.getLong(0)
    assert(heavy === 9L)
  }
}
