package graft

import org.apache.spark.sql.functions._

/** Round-5 batch v: closed walks, sentence dedup, affix templates,
  * CUSUM.
  */
class ClosedWalksSpec extends GraftSuite {
  import graft.algo.Spectral
  import graft.graph.GraphOps

  test("triangle: A^4 diagonal is 6 everywhere (eigenvalue check)") {
    import spark.implicits._
    val tri = GraphOps.symmetrize(
      Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("src", "dst"))
    val r = Spectral.closedWalkCounts(tri).collect()
      .map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2), x.getLong(3)))
      .toMap
    // per vertex: deg 2; 1 triangle -> walks3 = 2; walks4 = 4 + 1 + 1
    assert(r.values.toSet === Set((2L, 2L, 6L)))
  }

  test("path 1-2-3: endpoint walks4 = 2, center = 4") {
    import spark.implicits._
    val path = GraphOps.symmetrize(
      Seq((1L, 2L), (2L, 3L)).toDF("src", "dst"))
    val r = Spectral.closedWalkCounts(path).collect()
      .map(x => x.getLong(0) -> x.getLong(3)).toMap
    assert(r === Map(1L -> 2L, 2L -> 4L, 3L -> 2L))
  }

  test("maxDeg cap removes the hub's wedge population entirely") {
    import spark.implicits._
    val star = GraphOps.symmetrize(
      Seq((9L, 1L), (9L, 2L), (9L, 3L)).toDF("src", "dst"))
    // cap 2 drops vertex 9 (degree 3): no edges survive
    assert(Spectral.closedWalkCounts(star, maxDeg = 2L).collect().isEmpty)
  }
}

class SentenceDedupSpec extends GraftSuite {
  import graft.text.CorpusClean

  test("shared sentence counts as duplicated occurrence in both docs") {
    import spark.implicits._
    val docs = Seq(
      (1L, "Hello world. Unique one."),
      (2L, "Hello world. Other text.")).toDF("doc_id", "text")
    val r = CorpusClean.sentenceDedup(docs).collect()
      .map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2), x.getLong(3)))
      .toMap
    assert(r(1L) === ((2L, 1L, 500000L)))
    assert(r(2L) === ((2L, 1L, 500000L)))
  }

  test("within-doc repetition is not cross-doc duplication") {
    import spark.implicits._
    val docs = Seq((1L, "Same thing. Same thing.")).toDF("doc_id", "text")
    val r = CorpusClean.sentenceDedup(docs).collect().head
    // two occurrences, but the sentence lives in only one doc
    assert(r.getLong(1) === 2L && r.getLong(2) === 0L)
  }
}

class AffixTemplatesSpec extends GraftSuite {
  import graft.text.CorpusClean

  test("a 40-char header shared by 3 docs is mined; pairs are not") {
    import spark.implicits._
    val header = "COOKIE BANNER NOTICE PLEASE ACCEPT TERMS" // 40 chars
    val docs = Seq(
      (1L, header + " body one", "s1"),
      (2L, header + " body two", "s2"),
      (3L, header + " body three", "s1"),
      (4L, "short", "s3"),
      (5L, "another doc entirely different with enough length", "s3"),
      (6L, "another doc entirely different with enough length", "s3"))
      .toDF("doc_id", "text", "source")
    val rows = CorpusClean.affixTemplates(docs, k = 40, minDocs = 3L)
      .collect()
    val pre = rows.filter(_.getString(0) == "prefix")
    assert(pre.length === 1)
    assert(pre.head.getString(1) === header)
    assert(pre.head.getAs[Long]("n_docs") === 3L)
    assert(pre.head.getAs[Long]("n_sources") === 2L)
  }
}

class CusumSpec extends GraftSuite {
  import graft.streaming.Funnel

  test("counts 1,1,4 against mean 2: drift spikes on day 3 only") {
    import spark.implicits._
    def ts(day: Int, i: Int) = new java.sql.Timestamp(
      java.sql.Timestamp.valueOf("2024-03-01 00:00:00").getTime
        + day * 86400000L + i * 1000L)
    val ev = (Seq((1L, ts(0, 0))) ++ Seq((2L, ts(1, 0)))
      ++ (0 until 4).map(i => (10L + i, ts(2, i))))
      .toDF("event_id", "ts")
    val r = Funnel.cusumDaily(ev).collect()
      .map(x => x.getLong(1) -> x.getLong(2)).toList.sortBy(_._1)
    // k = 2000 milli-events; P = -1000, -2000, 0; S = P - min(0, minP)
    val byDay = Funnel.cusumDaily(ev).orderBy("day_epoch").collect()
      .map(x => (x.getLong(1), x.getLong(2)))
    assert(byDay.toSeq === Seq((1L, 0L), (1L, 0L), (4L, 2000L)))
  }
}
