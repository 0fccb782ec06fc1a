package graft

import org.apache.spark.sql.functions._

/** Round-5 batch ak: degree percentiles, language mix. */
class PercentilePanelSpec extends GraftSuite {
  import graft.measures.Measures

  test("degreePercentiles: exact ceil-convention order statistics") {
    // star K1,4 + pendant chain: degrees 0:5, 1..4:1(+1 for 5), 5:2, 6:1
    // keep it simple: star K1,9 -> degrees {9:1, 1:9}, n = 10
    val star = edgesDf(undirected((1L to 9L).map(i => (0L, i))))
    val r = Measures.degreePercentiles(star).collect().head
    assert(r.getAs[Long]("n_vertices") === 10L)
    // cum at d=1 is 9: covers p50 (k=5), p90 (k=9); p99/p999 need cum 10
    assert(r.getAs[Long]("p50") === 1L)
    assert(r.getAs[Long]("p90") === 1L)
    assert(r.getAs[Long]("p99") === 9L)
    assert(r.getAs[Long]("p999") === 9L)
    assert(r.getAs[Long]("max_deg") === 9L)
  }

  test("degreePercentiles: regular graph collapses the panel") {
    val ring = edgesDf(undirected(Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 0L))))
    val r = Measures.degreePercentiles(ring).collect().head
    assert(r.getAs[Long]("p50") === 2L)
    assert(r.getAs[Long]("p999") === 2L)
    assert(r.getAs[Long]("max_deg") === 2L)
  }

  test("butterflies: K2,2 counts one, wedge accounting exact") {
    import spark.implicits._
    // users 1,2 both like items 10,11 -> one butterfly; user 3 adds a
    // lone wedge on (10,12)
    val e = Seq((1L, 10L), (1L, 11L), (2L, 10L), (2L, 11L),
      (3L, 10L), (3L, 12L))
      .toDF("src", "dst")
    val r = graft.algo.TriangleCount.butterflies(e).collect().head
    assert(r.getAs[Long]("butterflies") === 1L)
    // co-pairs: (10,11) c=2, (10,12) c=1, (11,12)? user? none -> 2 pairs
    assert(r.getAs[Long]("n_copairs") === 2L)
    assert(r.getAs[Long]("n_wedges") === 3L)
  }

  test("butterflies: the left-degree cap removes the power user") {
    import spark.implicits._
    val e = (Seq((1L, 10L), (1L, 11L), (2L, 10L), (2L, 11L))
      ++ (10L to 20L).map(i => (9L, i))) // user 9: degree 11 hub
      .toDF("src", "dst")
    val capped = graft.algo.TriangleCount.butterflies(e, maxLeftDeg = 5L)
      .collect().head
    assert(capped.getAs[Long]("butterflies") === 1L)
    val uncapped = graft.algo.TriangleCount.butterflies(e, maxLeftDeg = 100L)
      .collect().head
    // hub adds C(11,2)=55 wedges incl. one more on (10,11) -> c=3 there
    assert(uncapped.getAs[Long]("n_wedges") === 2L + 55L)
    assert(uncapped.getAs[Long]("butterflies") === 3L)
  }

  test("langMix: exact token shares") {
    import spark.implicits._
    val docs = Seq(
      (1L, "one two three", "en", "web", 13L),
      (2L, "quatre cinq", "fr", "web", 11L),
      (3L, "six", "en", "web", 3L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val rows = graft.text.CorpusClean.langMix(docs).collect()
      .map(r => r.getAs[String]("lang") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("n_tokens"),
          r.getAs[Long]("token_share_e6"))).toMap
    assert(rows("en") === ((2L, 4L, math.round(4e6 / 6))))
    assert(rows("fr") === ((1L, 2L, math.round(2e6 / 6))))
  }
}
