package graft

import org.apache.spark.sql.functions._

/** Plan-shape assertions for the round-5 continuation operators: the
  * properties that decide whether each plan survives a 100× scale-up,
  * asserted on the executed plan so a refactor cannot silently regress
  * them.
  */
class Round5PlanSpec extends GraftSuite {
  import spark.implicits._

  test("charEntropy is a pure scan — zero exchanges, zero explodes") {
    val d = (1L to 40L).map(i => (i, s"some text $i")).toDF("doc_id", "text")
    val ce = graft.text.CorpusClean.charEntropy(d)
    ce.collect()
    val plan = ce.queryExecution.executedPlan.toString()
    assert(!plan.contains("Exchange"),
      s"charEntropy must not shuffle:\n$plan")
    assert(!plan.contains("Generate"),
      s"charEntropy must not explode:\n$plan")
  }

  test("binaryRecall's Hamming ranking windows partition by query") {
    val vecs = (0L until 60L)
      .map(i => (i, Seq.tabulate(64)(j => ((i + j) % 7 - 3).toFloat)))
      .toDF("vec_id", "embedding")
    val plan = graft.functions.Similarity.binaryRecall(vecs, 5)
      .queryExecution.executedPlan.toString()
    val bad = plan.linesIterator.filter(_.contains("Window "))
      .exists(!_.contains("qid"))
    assert(!bad, s"binaryRecall window lost its qid partitioning:\n$plan")
  }

  test("dailyTrend's min-day scalar attaches by broadcast") {
    val ev = (0 until 40).map(i => (i.toLong, "view",
      new java.sql.Timestamp(1709251200000L + i * 3600000L)))
      .toDF("event_id", "event_type", "ts")
    val t = graft.streaming.Funnel.dailyTrend(ev)
    t.collect()
    val plan = t.queryExecution.executedPlan.toString()
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastExchange"),
      s"min-day scalar must broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("sentenceDedup windows/joins stay keyed — no cartesian product") {
    val d = (1L to 30L).map(i => (i, "alpha beta. gamma delta. end"))
      .toDF("doc_id", "text")
    val sd = graft.text.CorpusClean.sentenceDedup(d)
    sd.collect()
    val plan = sd.queryExecution.executedPlan.toString()
    assert(!plan.contains("CartesianProduct"),
      s"sentenceDedup must never go all-pairs:\n$plan")
  }

  test("textRank per-iteration state is joined by key, never cartesian") {
    val d = (1L to 12L).map(i => (i, "aa bb cc")).toDF("doc_id", "text")
    val tr = graft.text.TextIndex.textRank(d, minDf = 2, maxDf = 20,
      minPairs = 2, iters = 2)
    tr.collect()
    val plan = tr.queryExecution.executedPlan.toString()
    assert(!plan.contains("CartesianProduct"),
      s"textRank must stay equi-joined:\n$plan")
  }
}
