package graft

import org.apache.spark.sql.functions._

/** Round-5 batch z: link-prediction precision@k vs the crawl delta. */
class LinkpredEvalSpec extends GraftSuite {
  import graft.algo.LinkPrediction
  import graft.graph.GraphOps

  test("materialized wedge scores hit=1; unmaterialized hit=0") {
    import spark.implicits._
    val old = GraphOps.symmetrize(
      Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("src", "dst"))
    val nw = GraphOps.symmetrize(
      Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 3L)).toDF("src", "dst"))
    val r = LinkpredFixtures.byRank(
      LinkPrediction.evalPrecision(old, nw, k = 2))
    // wedges (1,3) and (2,4), common=1 each; tie broken by src asc
    assert(r(1L) === ((1L, 3L, 1L, 1L)))
    assert(r(2L) === ((2L, 4L, 1L, 0L)))
  }

  test("k bounds the prediction list") {
    import spark.implicits._
    val old = GraphOps.symmetrize(
      Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("src", "dst"))
    val r = LinkPrediction.evalPrecision(old, old, k = 1).collect()
    assert(r.length === 1 && r.head.getAs[Long]("hit") === 0L)
  }

  test("an already-adjacent pair is never predicted") {
    import spark.implicits._
    // triangle: every wedge pair is already an edge -> no candidates
    val tri = GraphOps.symmetrize(
      Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("src", "dst"))
    assert(LinkPrediction.evalPrecision(tri, tri, k = 5).collect().isEmpty)
  }
}

private object LinkpredFixtures {
  def byRank(df: org.apache.spark.sql.DataFrame)
      : Map[Long, (Long, Long, Long, Long)] =
    df.collect().map(x => x.getAs[Long]("rank") ->
      ((x.getAs[Long]("src"), x.getAs[Long]("dst"),
        x.getAs[Long]("common"), x.getAs[Long]("hit")))).toMap
}
