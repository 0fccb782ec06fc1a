package graft

import org.apache.spark.sql.functions._

/** Round-5 batch y: TextRank, Markov entropy rate, DAG path counts. */
class TextRankSpec extends GraftSuite {
  import graft.text.TextIndex

  test("regular triangle graph: 1e9 is an exact fixed point") {
    import spark.implicits._
    val docs = (1L to 3L).map(i => (i, "aa bb cc")).toDF("doc_id", "text")
    val r = TextIndex.textRank(docs, minDf = 2, maxDf = 10, minPairs = 2,
      iters = 3).collect()
    assert(r.length === 3)
    assert(r.forall(_.getAs[Long]("s_e9") === 1000000000L))
  }

  test("star graph: hand-computed two-iteration integer values") {
    import spark.implicits._
    val docs = ((1L to 3L).map(i => (i, "hub leafa"))
      ++ (4L to 6L).map(i => (i, "hub leafb"))).toDF("doc_id", "text")
    val r = TextIndex.textRank(docs, minDf = 3, maxDf = 6, minPairs = 2,
      iters = 2).collect()
      .map(x => x.getString(0) -> x.getAs[Long]("s_e9")).toMap
    assert(r("hub") === 1127500000L)
    assert(r("leafa") === 936250000L)
    assert(r("leafb") === 936250000L)
  }
}

class EntropyRateSpec extends GraftSuite {
  import graft.streaming.Funnel

  private def ts(i: Int) = new java.sql.Timestamp(
    java.sql.Timestamp.valueOf("2024-03-01 00:00:00").getTime + i * 1000L)

  test("deterministic a-b loop: entropy rate exactly 0") {
    import spark.implicits._
    val ev = (0 until 8).map(i =>
      (i.toLong, 1L, if (i % 2 == 0) "a" else "b", ts(i)))
      .toDF("event_id", "user_id", "event_type", "ts")
    assert(Funnel.entropyRate(ev).collect().head.getLong(0) === 0L)
  }

  test("uniform two-state chain: exactly 1 bit per step") {
    import spark.implicits._
    // a->a, a->b, b->b, b->a once each: every row uniform, pi uniform
    val seq = Seq("a", "a", "b", "b", "a")
    val ev = seq.zipWithIndex.map { case (t, i) => (i.toLong, 1L, t, ts(i)) }
      .toDF("event_id", "user_id", "event_type", "ts")
    assert(Funnel.entropyRate(ev).collect().head.getLong(0) === 1000000L)
  }
}

class DagPathsSpec extends GraftSuite {
  import graft.algo.StronglyConnected

  test("diamond + tail: path counts match the hand DP") {
    import spark.implicits._
    val ce = Seq((1L, 2L), (1L, 3L), (2L, 4L), (3L, 4L), (4L, 5L))
      .toDF("csrc", "cdst")
    val r3 = StronglyConnected.dagPathCounts(ce, rounds = 3).collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r3 === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 2L, 5L -> 2L))
    val r2 = StronglyConnected.dagPathCounts(ce, rounds = 2).collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r2(5L) === 0L) // depth 3 unreached within 2 rounds
  }

  test("multiple sources accumulate") {
    import spark.implicits._
    val ce = Seq((1L, 3L), (2L, 3L)).toDF("csrc", "cdst")
    val r = StronglyConnected.dagPathCounts(ce, rounds = 1).collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r === Map(1L -> 1L, 2L -> 1L, 3L -> 2L))
  }
}
