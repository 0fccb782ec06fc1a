package graft

import org.apache.spark.sql.functions._

/** Round-5 batch r: per-source weighted SSSP / closeness and rolling WAU. */
class WeightedClosenessSpec extends GraftSuite {
  import graft.algo.ShortestPaths

  test("hand-computed weighted path: per-source fields stay separate") {
    import spark.implicits._
    // 1 -2- 2 -3- 3 (undirected, weights 2 and 3), sources {1, 3}
    val we = Seq(
      (1L, 2L, 2L), (2L, 1L, 2L), (2L, 3L, 3L), (3L, 2L, 3L))
      .toDF("src", "dst", "weight")
    val r = ShortestPaths.runFixedPerSource(we, Seq(1L, 3L).toDF("id"), 3)
      .collect().map(x => (x.getLong(0), x.getLong(1)) -> x.getLong(2))
      .toMap
    assert(r((1L, 2L)) === 2L && r((1L, 3L)) === 5L)
    assert(r((3L, 2L)) === 3L && r((3L, 1L)) === 5L)
    // the multi-source runFixed would have merged these minima
  }

  test("closeness: reached, exact distance sum, e9 ratio") {
    import spark.implicits._
    val we = Seq(
      (1L, 2L, 2L), (2L, 1L, 2L), (2L, 3L, 3L), (3L, 2L, 3L))
      .toDF("src", "dst", "weight")
    val r = ShortestPaths.weightedCloseness(we, Seq(1L).toDF("id"), 3)
      .collect().head
    assert(r.getLong(1) === 2L) // reached 2 and 3
    assert(r.getLong(2) === 7L) // 2 + 5
    assert(r.getLong(3) === math.round(2.0 * 1e9 / 7.0))
  }
}

class WauSpec extends GraftSuite {
  test("gate semantics: a user counts for 7 trailing days") {
    import spark.implicits._
    // one event on day 0, one on day 10 (different users)
    val ev = Seq((1L, 1L, 0L), (2L, 2L, 10L * 86400))
      .toDF("event_id", "user_id", "es")
      .select(col("event_id"), col("user_id"),
        col("es").cast("timestamp").as("ts"))
    val du = ev
      .select(col("ts").cast("long").as("t"), col("user_id"))
      .select(expr("t div 86400").as("day"), col("user_id")).distinct()
    val days = du.select(col("day").as("d")).distinct()
    val r = du.join(broadcast(days),
        col("day") <= col("d") && col("day") >= col("d") - 6)
      .groupBy(col("d").as("day"))
      .agg(countDistinct(col("user_id")).as("wau"))
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    // day 0 sees only user 1; day 10 is > 6 days past day 0, so only
    // user 2 — no leakage across the window
    assert(r === Map(0L -> 1L, 10L -> 1L))
  }
}
