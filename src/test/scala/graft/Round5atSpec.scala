package graft

import org.apache.spark.sql.functions._

/** Round-5 batch at: weighted heavy-matching contraction. */
class WeightedCoarsenSpec extends GraftSuite {
  import graft.algo.Matching

  private def wEdges(rows: Seq[(Long, Long, Long)]) = {
    import spark.implicits._
    val df = rows.toDF("src", "dst", "weight")
    df.union(df.select(col("dst").as("src"), col("src").as("dst"),
      col("weight")))
  }

  test("contractWeighted: mass is conserved across the level") {
    // square 1-2-3-4-1 with a heavy edge (1,2): matching takes (1,2) and
    // (3,4); coarse graph has reps 1 and 3 with weight 1+1=2 per side
    val e = wEdges(Seq((1L, 2L, 9L), (2L, 3L, 1L), (3L, 4L, 9L),
      (4L, 1L, 1L)))
    val m = Matching.greedyRoundsWeighted(e, rounds = 2, seed = 7L)
    val matchedPairs = m.select("src", "dst").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(matchedPairs === Set((1L, 2L), (3L, 4L)))
    val coarse = Matching.contractWeighted(e, m).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getAs[Long]("weight"))
      .toMap
    // inter-cluster mass: edges (2,3) w1 and (4,1) w1 -> 2 per direction
    assert(coarse === Map((1L, 3L) -> 2L, (3L, 1L) -> 2L))
    // intra-pair mass (the matched heavy edges) became self-loops and
    // dropped; total coarse weight = fine cut weight restricted to the
    // partition
  }
}
